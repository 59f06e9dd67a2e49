"""Grid/launcher tests."""

import pytest

from brainmagick_tpu.grids import get_grid, list_grids
from brainmagick_tpu.grids.launcher import Launcher


def test_list_grids():
    grids = list_grids()
    assert "nmi.main_table" in grids
    assert "nmi.ablation_final" in grids
    assert len(grids) >= 8


def test_main_table_job_count():
    _, jobs = get_grid("nmi.main_table")
    # 3 seeds x 4 datasets x 5 variants (reference grid shape)
    assert len(jobs) == 60
    sigs = [j.sig for j in jobs]
    assert len(set(sigs)) == 60  # all distinct


def test_ablation_job_count():
    _, jobs = get_grid("nmi.ablation_final")
    # 3 seeds x 4 datasets x 12 XPs
    assert len(jobs) == 144


def test_launcher_bind_and_dedup():
    launcher = Launcher()
    launcher.bind_({"model": "clip_conv"})
    sub = launcher.bind({"dset.selections": ["fake"]}, seed=1)
    job1 = sub()
    job2 = sub()  # identical XP deduped
    assert len(launcher.jobs) == 1
    assert job1.sig == job2.sig
    sub({"optim.lr": 1e-3})
    assert len(launcher.jobs) == 2


def test_job_config_applies_presets():
    launcher = Launcher()
    launcher.bind_({"model": "clip_conv"})
    job = launcher({"dset.selections": ["fake"]})
    cfg = job.to_config()
    assert cfg.optim.loss == "clip"
    assert cfg.simpleconv["merger_pos_dim"] == 2048
    assert cfg.dset.selections == ["fake"]


@pytest.mark.parametrize("name", ["nmi.lr_batch_size", "nmi.nmels",
                                  "nmi.per_subject_gwilliams",
                                  "nmi.per_subject_mous", "nmi.wordlists",
                                  "nmi.fair_compare_meg_eeg"])
def test_all_grids_resolve(name):
    _, jobs = get_grid(name)
    assert len(jobs) >= 3
    for job in jobs[:2]:
        cfg = job.to_config()  # must parse into a valid config
        assert cfg.sig


def test_export_csv(tmp_path):
    from brainmagick_tpu.grids.runner import export_csv
    dest = export_csv("nmi.wordlists", out_dir=str(tmp_path),
                      dest=str(tmp_path / "out.csv"))
    assert dest.exists()
    lines = dest.read_text().splitlines()
    assert len(lines) == 4  # header + 3 seeds


def test_export_html_explorer(tmp_path):
    """HiPlot-role static explorer (bm/grids/_hiplot.py:13-30): one
    self-contained HTML with the grid's rows, metric columns from any
    finished runs, and the interactive parallel-coordinates JS."""
    import json as _json

    from brainmagick_tpu.grids.explore import export_html
    from brainmagick_tpu.grids.runner import get_grid

    _, jobs = get_grid("nmi.wordlists")
    sig = jobs[0].to_config().sig
    xp = tmp_path / "xps" / sig
    xp.mkdir(parents=True)
    (xp / "history.json").write_text(_json.dumps([
        {"train": {"loss": 2.5}, "valid": {"loss": 2.1, "best": 2.1},
         "test": {"wer_vocab": 0.55}}]))

    dest = export_html("nmi.wordlists", out_dir=str(tmp_path),
                       dest=str(tmp_path / "grid.html"))
    page = dest.read_text()
    assert sig in page
    assert "valid.loss" in page           # metric column made it in
    assert "parallel" in page.lower() or "polyline" in page
    assert "<script>" in page and "http" not in page.split("<script>")[1][:200]
    # all three seeds present as data rows
    data = page.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    assert len(_json.loads(data)) == len(jobs)


def test_export_sbatch(tmp_path):
    """SLURM array emitter: one case per PENDING job (done-marker
    resume like runner.run_jobs), per-task logs, real train commands
    (reference role: Dora/submitit arrays, run_eval_probs.py:497-513)."""
    import json as _json

    from brainmagick_tpu.grids.runner import get_grid
    from brainmagick_tpu.grids.slurm import export_sbatch

    _, jobs = get_grid("nmi.wordlists")
    done = tmp_path / "xps" / jobs[0].sig
    done.mkdir(parents=True)
    (done / "done.json").write_text(_json.dumps({"epochs": 2}))

    dest = export_sbatch("nmi.wordlists", out_dir=str(tmp_path),
                         partition="tpu", time="12:00:00")
    script = dest.read_text()
    assert f"#SBATCH --array=0-{len(jobs) - 2}" in script  # one done
    assert "#SBATCH --partition=tpu" in script
    assert "--time=12:00:00" in script
    assert "brainmagick_tpu.train" in script
    assert jobs[0].sig not in script  # completed job excluded
    # every pending job contributes one case line (+1 for the *) guard)
    assert script.count(";;") == (len(jobs) - 1) + 1


def test_simple_grid_searcher():
    from brainmagick_tpu.grids.launcher import SimpleGridSearcher

    launcher = Launcher()
    searcher = SimpleGridSearcher()
    searcher.define_grid_param({"optim.lr": [1e-4, 3e-4],
                                "optim.batch_size": [32, 64]})  # zipped
    searcher.define_grid_param({"dset.n_subjects": [4, None]})  # crossed
    jobs = searcher.grid_search(launcher)
    assert len(jobs) == 4
    overrides = [j.overrides for j in jobs]
    assert {"optim.lr": 1e-4, "optim.batch_size": 32,
            "dset.n_subjects": 4} in overrides
    # None drops the key
    assert {"optim.lr": 3e-4, "optim.batch_size": 64} in overrides


@pytest.mark.slow
def test_run_jobs_parallel_overlap(tmp_path, monkeypatch):
    """--workers=N overlaps N jobs as subprocesses with per-job logs
    (the reference's submitit array equivalent,
    run_eval_probs.py:497-513)."""
    import sys

    from brainmagick_tpu.grids import runner
    from brainmagick_tpu.grids.launcher import Job

    jobs = [Job(overrides={"optim.lr": lr})
            for lr in (1e-4, 2e-4, 3e-4, 4e-4)]
    # long sleep >> interpreter startup so concurrency shows in the
    # recorded spans even on a 1-core host
    script = ("import time; t0 = time.time(); time.sleep(3.0); "
              "print('span', t0, time.time())")
    monkeypatch.setattr(runner, "_job_command",
                        lambda job, out_dir: [sys.executable, "-c",
                                              script])
    results = runner.run_jobs(jobs, out_dir=str(tmp_path), workers=4)
    assert all(rc == 0 for rc in results.values())

    spans = []
    for sig in results:
        log = tmp_path / "logs" / f"{sig}.log"
        assert log.exists(), "per-job log missing"
        _, start, stop = log.read_text().split()[:3]
        spans.append((float(start), float(stop)))
    # at least one pair of jobs ran concurrently
    spans.sort()
    assert any(a_stop > b_start for (_, a_stop), (b_start, _)
               in zip(spans, spans[1:])), "no overlapping job intervals"


def test_run_jobs_skips_completed(tmp_path, monkeypatch):
    import sys

    from brainmagick_tpu.grids import runner
    from brainmagick_tpu.grids.launcher import Job

    jobs = [Job(overrides={"optim.lr": 1e-4}),
            Job(overrides={"optim.lr": 2e-4})]
    done_sig = jobs[0].sig
    xp_dir = tmp_path / "xps" / done_sig
    xp_dir.mkdir(parents=True)
    (xp_dir / "done.json").write_text('{"epochs": 2}')
    monkeypatch.setattr(runner, "_job_command",
                        lambda job, out_dir: [sys.executable, "-c",
                                              "print('ran')"])
    results = runner.run_jobs(jobs, out_dir=str(tmp_path), workers=2)
    assert results[done_sig] is None               # skipped
    assert results[jobs[1].sig] == 0               # ran
    # --force reruns everything
    results = runner.run_jobs(jobs, out_dir=str(tmp_path), workers=2,
                              force=True)
    assert results[done_sig] == 0


def test_run_jobs_inprocess_honors_job_cache(tmp_path):
    """run_jobs(workers=1) executes jobs in-process via train.run();
    the job's cache override must reach the env singleton exactly as
    the CLI path does. Regression: in-process jobs silently ignored
    `cache=` and ran cache-less against the ambient env (surfaced by a
    rehearsal whose training never touched its workdir cache and
    recomputed every feature)."""
    from brainmagick_tpu.env import env
    from brainmagick_tpu.grids import runner
    from brainmagick_tpu.grids.launcher import Job

    cache = tmp_path / "fake_cache"
    cache.mkdir()
    overrides = {
        "cache": str(cache),
        # keep the process-global persistent compile cache untouched:
        # jax initializes its cache singleton at first use, and a later
        # test pointing the dir elsewhere would not redirect writes
        "parallel.compilation_cache": False,
        "num_workers": 2, "seed": 1234,
        "dset.selections": ["fake"], "dset.n_recordings": 2,
        "dset.features": ["WordLength"],
        "dset.test_ratio": 0.3, "dset.valid_ratio": 0.2,
        "dset.min_n_blocks_per_split": 1,
        "dset.tmin": -0.2, "dset.tmax": 1.0, "dset.condition": 1.0,
        "dset.sample_rate": 120,
        "optim.loss": "mse", "optim.epochs": 1, "optim.batch_size": 8,
        "optim.max_batches": 2,
        "task.type": "decode", "task.offset_meg_ms": 50,
        "test.wer_negatives": 10, "test.wer_topx": 3,
        "simpleconv.hidden": 16, "simpleconv.depth": 1,
        "simpleconv.kernel_size": 3, "simpleconv.merger": False,
        "simpleconv.initial_linear": 8, "simpleconv.subject_layers": False,
        "eval_every": 8,
    }
    job = Job(overrides=overrides)
    with env.temporary(cache=None):  # ambient env must not leak in
        results = runner.run_jobs([job], out_dir=str(tmp_path / "out"),
                                  workers=1)
    assert results[job.sig] == 0
    assert (tmp_path / "out" / "xps" / job.sig / "done.json").exists()
    # the JOB's cache dir was populated (studies/feature tracks/...)
    assert any(cache.iterdir()), \
        "in-process job ignored its cache= override"


def test_rehearsal_extra_overrides_env_hook(monkeypatch):
    """BM_REHEARSAL_EXTRA binds JSON overrides into the rehearsal grid
    (variant studies, e.g. the bf16-vs-fp32 estimate A/B) without
    editing the grid; absent, the default job is untouched."""
    from brainmagick_tpu.grids import runner

    monkeypatch.delenv("BM_REHEARSAL_EXTRA", raising=False)
    _, jobs = runner.get_grid("rehearsal")
    base = jobs[0].to_config()
    assert base.simpleconv["output_dtype"] == "bfloat16"

    monkeypatch.setenv(
        "BM_REHEARSAL_EXTRA",
        '{"simpleconv.output_dtype": null, "clip.compute_dtype": null}')
    _, jobs = runner.get_grid("rehearsal")
    cfg = jobs[0].to_config()
    assert cfg.simpleconv["output_dtype"] is None
    assert cfg.clip.compute_dtype is None
    assert cfg.simpleconv["dtype"] == "bfloat16"  # convs stay bf16
    assert cfg.sig != base.sig  # variant gets its own XP
