"""Preprocessing-throughput benchmark: resample + highpass GB/s on the
accelerator and native epoch-gather GB/s on the host.

The reference preprocesses whole raws on CPU through julius and calls it
"extremely slow" (README.md:99); BASELINE.md sets a >=10x target. The
reference pipeline has no measured number — this script sets ours.

Prints one JSON line per metric (bench.py stays the single-line driver
entry; this is the auxiliary perf harness).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from brainmagick_tpu.native import batch_gather_epochs
    from brainmagick_tpu.ops import dsp

    # -- device resample+highpass: one hour of 273ch MEG @1200Hz ----------
    C, SR_IN, SR_OUT, SECONDS = 273, 1200, 120, 600  # 10 min chunks
    rng = np.random.RandomState(0)
    data = rng.randn(C, SR_IN * SECONDS).astype(np.float32)
    x = jnp.asarray(data)

    def preprocess(x):
        y = dsp.resample(x, SR_IN, SR_OUT)
        return dsp.highpass_filter(y, 0.5 / SR_OUT)

    y = preprocess(x)
    _ = float(y[0, 0])  # sync (block_until_ready unreliable on relay)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        y = preprocess(x)
    _ = float(y[0, 0])
    dt = (time.perf_counter() - t0) / n_iter
    gbps = data.nbytes / dt / 1e9
    print(json.dumps({
        "metric": "preprocess_resample_highpass",
        "value": round(gbps, 2), "unit": "GB/s",
        "detail": f"{C}ch x {SECONDS}s @{SR_IN}->{SR_OUT}Hz "
                  f"in {dt * 1e3:.0f} ms"}))

    # -- host epoch gather: one training batch ----------------------------
    raw = rng.randn(273, 500_000).astype(np.float32)
    starts = rng.randint(0, raw.shape[1] - 361, 256)
    batch_gather_epochs(raw, starts, 361, 280, baseline_len=61)
    t0 = time.perf_counter()
    for _ in range(10):
        out = batch_gather_epochs(raw, starts, 361, 280, baseline_len=61)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({
        "metric": "native_epoch_gather",
        "value": round(out.nbytes / dt / 1e9, 2), "unit": "GB/s",
        "detail": f"256x280x361 batch in {dt * 1e3:.1f} ms"}))


if __name__ == "__main__":
    main()
