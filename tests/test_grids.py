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
