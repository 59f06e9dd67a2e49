"""Budgeted hyperparameter sweeps (grids/sweep.py — the role of the
reference's hydra Nevergrad sweeper template,
bm/conf/hydra/sweeper/nevergrad_template.yaml)."""

import json

import numpy as np
import pytest

from brainmagick_tpu.grids import sweep


def test_space_parsing_and_sampling_determinism():
    space = sweep.parse_space({
        "optim.lr": {"lower": 1e-5, "upper": 1e-2, "log": True,
                     "init": 3e-4},
        "simpleconv.depth": {"lower": 2, "upper": 10, "integer": True},
        "optim.loss": ["clip", "mse"],
        "optim.batch_size": {"value": 64},
    })
    trials = sweep.sample_trials(space, budget=6, seed=7)
    assert trials == sweep.sample_trials(space, budget=6, seed=7)
    assert trials != sweep.sample_trials(space, budget=6, seed=8)[0:] \
        or len(trials) == 1
    # init point first: lr init, first choice, fixed value, int midpoint
    assert trials[0] == {"optim.lr": 3e-4, "simpleconv.depth": 6,
                         "optim.loss": "clip", "optim.batch_size": 64}
    for t in trials:
        assert 1e-5 <= t["optim.lr"] <= 1e-2
        assert isinstance(t["simpleconv.depth"], int)
        assert 2 <= t["simpleconv.depth"] <= 10
        assert t["optim.loss"] in ("clip", "mse")
        assert t["optim.batch_size"] == 64
    # distinct trials (dedup)
    keys = [json.dumps(t, sort_keys=True) for t in trials]
    assert len(set(keys)) == len(keys)


def test_objective_from_history():
    history = [
        {"train": {"loss": 3.0}, "valid": {"loss": 2.5}},
        {"train": {"loss": 2.0}, "valid": {"loss": 2.1},
         "test": {"wer": 0.4}},
        {"train": {"loss": 1.5}, "valid": {"loss": 2.3}},
    ]
    assert sweep.objective_from_history(history, "valid.loss") \
        == [2.5, 2.1, 2.3]
    assert sweep.objective_from_history(history, "test.wer") == [0.4]
    assert sweep.objective_from_history(history, "test.missing") is None


def test_sweep_ranking_with_mocked_runner(tmp_path, monkeypatch):
    """Trials rank by the best epoch of the metric; failed trials sort
    last; results CSV written."""
    space = sweep.parse_space({"optim.lr": {"lower": 1e-4, "upper": 1e-2,
                                            "log": True}})
    trials = sweep.sample_trials(space, budget=3, seed=0)

    def fake_run_jobs(jobs, out_dir, workers=1, force=False):
        # pretend lower lr trains better; trial 2 "crashed" (no history)
        for k, job in enumerate(jobs[:2]):
            xp = tmp_path / "xps" / job.sig
            xp.mkdir(parents=True, exist_ok=True)
            loss = float(job.overrides["optim.lr"])
            with open(xp / "history.json", "w") as f:
                json.dump([{"valid": {"loss": loss + 1.0}},
                           {"valid": {"loss": loss}}], f)
        return {job.sig: 0 for job in jobs}

    from brainmagick_tpu.grids import runner
    monkeypatch.setattr(runner, "run_jobs", fake_run_jobs)
    results = sweep.run_sweep(space, budget=3, out_dir=str(tmp_path),
                              metric="valid.loss")
    assert len(results) == 3
    scored = [r for r in results if r["objective"] is not None]
    assert len(scored) == 2
    assert scored[0]["objective"] <= scored[1]["objective"]
    assert scored[0]["objective"] == pytest.approx(
        min(t["optim.lr"] for t in trials[:2]))
    assert results[-1]["objective"] is None
    assert (tmp_path / "sweep_results.csv").exists()


@pytest.mark.slow
def test_sweep_end_to_end_tiny(tmp_cache, tmp_path):
    """A real budget-2 sweep over lr on the fake study through the
    in-process runner path."""
    from test_solver import tiny_args

    base_args = tiny_args(tmp_cache, tmp_path, epochs=1)
    base = dict(
        {"dset.selections": ["fake"], "dset.n_recordings": 2,
         "dset.features": ["MelSpectrum"],
         "dset.features_params": {"MelSpectrum": {"n_mels": 8}},
         "dset.condition": 1.0, "dset.tmin": -0.2, "dset.tmax": 1.0,
         "dset.test_ratio": 0.3, "dset.valid_ratio": 0.2,
         "dset.min_n_blocks_per_split": 1, "optim.loss": "clip",
         "optim.epochs": 1, "optim.batch_size": 8,
         "test.wer_negatives": 50, "test.wer_topx": 3,
         "simpleconv": dict(base_args.simpleconv),
         "cache": str(tmp_cache), "seed": 1234, "num_workers": 2})
    space = sweep.parse_space(
        {"optim.lr": {"lower": 1e-4, "upper": 1e-2, "log": True,
                      "init": 1e-3}})
    out_dir = str(tmp_path / "outputs")
    results = sweep.run_sweep(space, budget=2, base_overrides=base,
                              out_dir=out_dir, metric="valid.loss",
                              seed=3)
    assert len(results) == 2
    assert all(r["objective"] is not None for r in results), results
    assert results[0]["objective"] <= results[1]["objective"]
    assert results[0]["optim.lr"] != results[1]["optim.lr"]
    assert (tmp_path / "outputs" / "sweep_results.csv").exists()
    # resumable: a second run skips both trained trials (done-markers)
    results2 = sweep.run_sweep(space, budget=2, base_overrides=base,
                               out_dir=out_dir, metric="valid.loss",
                               seed=3)
    assert [r["sig"] for r in results2] == [r["sig"] for r in results]
