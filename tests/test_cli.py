"""End-to-end subprocess training test (mirrors bm/test_play.py's
subprocess `python -m bm.train` strategy, SURVEY.md §4.4)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.slow
def test_train_cli_subprocess(tmp_path):
    cache = tmp_path / "fake_cache"
    cache.mkdir()
    out_dir = tmp_path / "outputs"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    args = [
        sys.executable, "-m", "brainmagick_tpu.train",
        'dset.selections=["fake"]', "dset.n_recordings=2",
        'dset.features=["WordLength"]', "dset.condition=1.0",
        "dset.tmin=-0.2", "dset.tmax=1.0", "dset.test_ratio=0.3",
        "dset.valid_ratio=0.2", "dset.min_n_blocks_per_split=1",
        "optim.loss=mse", "optim.epochs=1", "optim.batch_size=8",
        f"cache={cache}", f"out_dir={out_dir}", "num_workers=1",
        "early_stop_patience=2",
    ]
    # the subprocess must force the cpu platform itself (sitecustomize
    # pins axon); train.py handles JAX_PLATFORMS if jax isn't loaded yet
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import runpy, sys; sys.argv = ['train'] + sys.argv[1:];"
            "runpy.run_module('brainmagick_tpu.train', run_name='__main__')")
    proc = subprocess.run(
        [sys.executable, "-c", code] + args[3:],
        env=env, cwd=str(Path(__file__).parent.parent),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]

    xps = list((out_dir / "xps").iterdir())
    assert len(xps) == 1, proc.stderr[-2000:]
    xp = xps[0]
    assert (xp / "checkpoint.pkl").exists()
    history = json.loads((xp / "history.json").read_text())
    assert len(history) == 1
    assert "train" in history[0] and "valid" in history[0]
    import numpy as np
    assert np.isfinite(history[0]["train"]["loss"])
