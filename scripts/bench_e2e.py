"""Sustained END-TO-END training throughput at paper shapes.

The headline bench (bench.py) times the shipped jitted step with
device-resident batches. This script measures what a full training
epoch through the real ``Solver._run_one_epoch`` sustains — loader,
host->device transfer, step dispatch, metric accumulation — and
decomposes the gap:

  loader   host-side batch assembly alone (threaded prefetch path)
  h2d      one-batch host->device bandwidth on this link
  staged   real _run_one_epoch with device-pre-staged batches
           (loop + step, no loader/H2D) -> proves the solver loop
           itself sustains the step rate
  e2e      real _run_one_epoch with the real loader + H2D

On the relayed 1-chip dev container the e2e number is bound by the
relay link (~30 MB/s); the script also prints the H2D bandwidth a
production host needs to sustain >=90% of the step rate (PCIe-class).
Reference bottleneck being addressed: bm/dataset.py:349-364 (the
reference's known input-pipeline bound).

Usage: python scripts/bench_e2e.py  [BM_BENCH_TINY/BM_BENCH_BATCH as
in bench.py; BM_E2E_STAGED_BATCHES to size the staged epoch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (shared solver builder + cache aliasing)

STAGED_BATCHES = int(os.environ.get("BM_E2E_STAGED_BATCHES") or 64)


class _StagedBatch:
    """Stands in for a SegmentBatch whose payload already lives in HBM."""

    def __init__(self, arrays, n: int) -> None:
        self._arrays = arrays
        self._n = n

    def __len__(self) -> int:
        return self._n

    def to_device(self, transfer_dtype=None):
        return self._arrays


class _StagedLoader:
    """Loader stand-in yielding the same device-resident batch."""

    def __init__(self, batch: _StagedBatch, pad_weight, n_batches: int):
        self.batch = batch
        self.pad_weight = pad_weight
        self.n_batches = n_batches

    def set_epoch(self, epoch: int) -> None:
        pass

    def __len__(self) -> int:
        return self.n_batches

    def __iter__(self):
        for _ in range(self.n_batches):
            yield self.batch, self.pad_weight


def main() -> None:
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    solver, args = bench.build_solver()
    print(f"# solver built in {time.perf_counter() - t0:.1f}s "
          f"({' '.join(f'{k}={v:.1f}s' for k, v in solver.build_timings.items())})",
          file=sys.stderr, flush=True)
    B = bench.B
    results = {}

    # ---- loader only -----------------------------------------------------
    loader = solver.loaders["train"]
    last = None
    t0 = time.perf_counter()
    n = 0
    for batch, pad_weight in loader:  # cold: includes lazy track renders
        # count PROCESSED rows (incl. pad) — the staged/e2e rates below
        # divide by B * n_batches, so the decomposition must share units
        n += len(pad_weight)
        last = (batch, pad_weight)
    dt_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    passes = max(1, int(round(4.0 / max(dt_cold, 0.25))))
    for _ in range(passes):  # steady state
        for batch, pad_weight in loader:
            last = (batch, pad_weight)
    dt = (time.perf_counter() - t0) / passes
    results["loader_samples_per_sec"] = round(n / dt, 1)
    results["loader_cold_samples_per_sec"] = round(n / dt_cold, 1)
    results["loader_batches"] = len(loader)
    print(f"# loader: {n} samples/epoch; cold {n / dt_cold:,.0f} "
          f"(incl. lazy track render), steady {n / dt:,.0f} samples/s "
          f"(host assembly)", file=sys.stderr, flush=True)

    # ---- H2D bandwidth ---------------------------------------------------
    batch, pad_weight = last
    t0 = time.perf_counter()
    arrays = batch.to_device(args.parallel.transfer_dtype)
    # force completion with a tiny on-device reduction fetched to host
    # (block_until_ready is not a reliable barrier on the relay)
    _ = float(sum(jnp.sum(v.astype(jnp.float32))
                  for k, v in arrays.items() if k == "meg"))
    dt = time.perf_counter() - t0
    nbytes = sum(v.nbytes for v in arrays.values())
    results["h2d_mb_per_batch"] = round(nbytes / 2**20, 1)
    results["h2d_gb_per_sec"] = round(nbytes / dt / 1e9, 3)
    print(f"# h2d: {nbytes / 2**20:.0f} MB batch in {dt:.2f}s "
          f"-> {nbytes / dt / 1e9:.2f} GB/s on this link",
          file=sys.stderr, flush=True)

    # ---- staged epoch (loop + step, no loader/H2D) -------------------------
    pad_w = np.asarray(pad_weight)
    # warmup epoch at the SAME batch count: the epoch-end stacked metric
    # fetch compiles per stack length, and that compile must not land in
    # the timed epoch
    staged = _StagedLoader(_StagedBatch(arrays, B), pad_w, STAGED_BATCHES)
    real_loader = solver.loaders["train"]
    solver.loaders["train"] = staged
    solver._run_one_epoch(training=True)  # compile + warmup
    t0 = time.perf_counter()
    solver._run_one_epoch(training=True)
    dt = time.perf_counter() - t0
    staged_rate = B * STAGED_BATCHES / dt
    results["staged_samples_per_sec"] = round(staged_rate, 1)
    print(f"# staged epoch: {STAGED_BATCHES} steps of {B} in {dt:.2f}s "
          f"-> {staged_rate:,.0f} samples/s (solver loop + step)",
          file=sys.stderr, flush=True)

    # ---- true end-to-end epoch --------------------------------------------
    solver.loaders["train"] = real_loader
    t0 = time.perf_counter()
    solver._run_one_epoch(training=True)
    dt = time.perf_counter() - t0
    n_samples = B * len(real_loader)
    results["e2e_samples_per_sec"] = round(n_samples / dt, 1)
    print(f"# e2e epoch: {n_samples} samples in {dt:.2f}s "
          f"-> {n_samples / dt:,.0f} samples/s (loader + H2D + step)",
          file=sys.stderr, flush=True)

    # ---- production H2D requirement ----------------------------------------
    # step_ms from the staged run; bytes from the bf16-cast batch
    required = nbytes * staged_rate / B
    results["h2d_gb_per_sec_required_for_step_rate"] = round(required / 1e9, 2)
    print(f"# to sustain the staged rate the host link must move "
          f"{required / 1e9:.1f} GB/s (PCIe gen4 x16 ~24 GB/s; "
          f"this relay: {results['h2d_gb_per_sec']} GB/s)",
          file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
