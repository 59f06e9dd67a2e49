"""Serving benchmark: inference latency/throughput of the EXPORTED
forward artifact at paper shapes on the local accelerator.

Measures what a serving fleet actually runs — the StableHLO artifact
produced by `serve.export_forward` (fixed batch so XLA specializes),
not the in-process solver. Timing is loop-over-queued-calls with one
final `float()` sync, so relay dispatch latency pipelines away like in
bench.py.

    python scripts/bench_serve.py            # B=256 paper shapes
    BM_BENCH_BATCH=32 python scripts/bench_serve.py

Prints one JSON line: exported-forward samples/s and ms/batch.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench harness: solver builder)


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp
    from brainmagick_tpu import serve
    from brainmagick_tpu.dataset import SegmentBatch

    bench._enable_compile_cache()
    solver, _ = bench.build_solver()
    B = bench.B

    t0 = time.time()
    exported = serve.export_forward(solver, batch_size=B)
    print(f"# export traced in {time.time() - t0:.1f}s", file=sys.stderr)

    ds = solver.datasets.train
    batch = serve.prepare_batch(
        solver, SegmentBatch.collate([ds[i % len(ds)] for i in range(B)]),
        split="train")
    args = [jnp.asarray(np.asarray(getattr(batch, name)))
            for name in serve.ARG_FIELDS]

    t0 = time.time()
    out = exported.call(*args)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"# first call (compile) {time.time() - t0:.1f}s",
          file=sys.stderr)

    # queue K calls, sync once at the end: per-call host dispatch
    # overlaps device execution (same discipline as bench.py)
    best = float("inf")
    for _ in range(3):
        k = 30
        t0 = time.time()
        last = None
        for _ in range(k):
            last = exported.call(*args)
        _ = float(jnp.sum(last[0].astype(jnp.float32)))
        best = min(best, (time.time() - t0) / k)

    print(json.dumps({
        "metric": "exported_forward_samples_per_sec_per_chip",
        "value": round(B / best, 1), "unit": "samples/s",
        "batch": B, "ms_per_batch": round(best * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
