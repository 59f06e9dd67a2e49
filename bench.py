"""Benchmark: SHIPPED train-step throughput on the paper configuration.

Times the solver's own jitted training step — `Solver._build_step(
train=True)` on a fake-study Solver — at the paper's shapes: batch 256,
273 sensors, 361 samples (3s @ 120Hz), 1024-dim wav2vec-shaped targets
(clip_conv_tpu preset: bf16 MXU compute, Pallas normalize/clamp/peak
gather, feature normalization, task wiring, keep/pad-weight accounting,
CLIP loss, grads, adam). Earlier rounds timed a hand-rolled simplified
step (kept as scripts/bench_handrolled.py); the spread between the two
is the cost of the real pipeline's bookkeeping.

The 1024-dim target uses a bench-local Feature (deterministic per-word
unit-normal vectors, the same shape/statistics as the wav2vec embedding
track) so the whole dataset->scaler->solver->step path is the shipped
one without needing wav2vec weights in this container.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md). The baseline is an analytic estimate of the reference's
per-GPU V100 throughput for the same recipe: ~20 GFLOP per sample per
training step at ~30% fp32 utilization of a V100 (14 TFLOP/s)
=> ~200 samples/sec/GPU.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REFERENCE_SAMPLES_PER_SEC = 200.0  # analytic V100 estimate, see docstring

# v5e bf16 peak: 197 TFLOP/s per chip
V5E_BF16_PEAK_FLOPS = 197e12

# Analytic fallback when the backend exposes no cost analysis (see
# scripts/bench_handrolled.py for the derivation)
_ANALYTIC_GFLOP_PER_SAMPLE = 14.4

#: BM_BENCH_TINY=1 shrinks model/batch to smoke-test the harness on CPU
TINY = bool(os.environ.get("BM_BENCH_TINY"))
#: BM_BENCH_BATCH overrides the paper batch for scaling studies (the
#: driver-gated number stays the paper recipe's 256)
B = int(os.environ.get("BM_BENCH_BATCH") or 0) or (8 if TINY else 256)
CHUNK = 2 if TINY else 16


def _enable_compile_cache() -> None:
    import jax
    if os.environ.get("BM_BENCH_CPU"):
        # smoke-test the harness without the TPU relay (this container
        # pre-imports jax pinned to the axon platform, so a plain
        # JAX_PLATFORMS env var set at shell level is too late)
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _make_bench_feature():
    """A 1024-dim word feature shaped like the wav2vec embedding track.

    Deterministic (sha1-seeded per word) so the feature-track/scaler
    caches stay valid across runs; statistics are unit-normal like a
    standardized embedding, so the scaler and CLIP loss see realistic
    values. Defined at module scope with __module__='bench': the
    scaler cache pickles the fitted BatchScaler, which references this
    class — the reference must resolve both when bench.py runs as
    __main__ (the driver) and when another script imports bench
    (scripts/profile_step.py --shipped)."""
    import hashlib

    import numpy as np

    from brainmagick_tpu.features.base import Feature

    class BenchW2VTarget(Feature):
        event_kind = "word"
        dimension = 1024

        def get(self, event):
            seed = int.from_bytes(
                hashlib.sha1(str(event.word).encode()).digest()[:4],
                "little")
            rng = np.random.RandomState(seed)
            return rng.randn(self.dimension).astype(np.float32)

    BenchW2VTarget.__qualname__ = "BenchW2VTarget"
    BenchW2VTarget.__module__ = "bench"
    return BenchW2VTarget


if __name__ == "__main__":
    # `python bench.py` makes this module __main__; pickle resolves the
    # class below as bench.BenchW2VTarget, which would otherwise import
    # a SECOND copy of this file (different class object). Alias first.
    sys.modules.setdefault("bench", sys.modules["__main__"])

BenchW2VTarget = _make_bench_feature()


def build_solver():
    """Fake-study Solver with the clip_conv_tpu paper recipe at paper
    shapes (the fake study's 273 sensors are already padded paper
    width; targets are 1024-dim)."""
    from brainmagick_tpu import train as bm_train
    from brainmagick_tpu.config import MainConfig, apply_preset
    from brainmagick_tpu.env import env

    cache = Path(os.environ.get(
        "BM_BENCH_CACHE",
        os.path.expanduser("~/.cache/bm_bench"))) / "fake_cache"
    cache.mkdir(parents=True, exist_ok=True)

    args = MainConfig()
    apply_preset(args, "clip_conv_tpu")
    args.cache = str(cache)
    args.out_dir = str(cache.parent / "outputs")
    args.num_workers = 2
    args.dset.selections = ["fake"]
    args.dset.n_recordings = 4
    args.dset.features = ["BenchW2VTarget"]
    args.dset.features_params = {}
    args.dset.min_n_blocks_per_split = 1
    # 0.25s stride: the fake study's 4x83s raws must yield >= one full
    # drop_last batch of 256 after split/containment (the default 0.5s
    # stride leaves only 233 train samples); per-step shapes unchanged.
    # Halve again for BM_BENCH_BATCH scaling studies past 256.
    args.dset.condition = 0.25 if B <= 256 else 0.125
    args.optim.batch_size = B
    if TINY:
        args.simpleconv.update(
            hidden=24, depth=2, dilation_period=2, merger_channels=16,
            merger_pos_dim=32, initial_linear=16)
    # paper recipe already set by the preset: batch 256, sr 120,
    # tmin/tmax -0.5/2.5 (T=361), offset_meg_ms 150, bf16 knobs

    overrides = os.environ.get("BM_BENCH_OVERRIDES")
    if overrides:
        # A/B a config knob through the same harness, e.g.
        # BM_BENCH_OVERRIDES="simpleconv={'fused_head': True}"
        from brainmagick_tpu.train import parse_overrides
        args = parse_overrides(overrides.split(";;"), args)

    env_ctx = env.temporary(cache=cache)
    env_ctx.__enter__()
    solver = bm_train.get_solver(args)
    return solver, args


def main() -> None:
    import jax

    _enable_compile_cache()

    import jax.numpy as jnp

    t_build = time.perf_counter()
    solver, args = build_solver()
    breakdown = " ".join(f"{k}={v:.1f}s"
                         for k, v in solver.build_timings.items())
    print(f"# solver built in {time.perf_counter() - t_build:.1f}s "
          f"({breakdown})", file=sys.stderr, flush=True)

    # one full-size train batch, committed to the device once — the
    # timed region must not include host->device transfer (this
    # container's relay moves ~30 MB/s; production hosts stream PCIe)
    loader = solver.loaders["train"]
    batch, pad_weight = next(iter(loader))
    assert len(batch) == B, (len(batch), B)
    arrays = batch.to_device(args.parallel.transfer_dtype)
    pad_w = jnp.asarray(pad_weight)
    na = solver.norm_arrays

    # the SHIPPED step (normalize/clamp/peak gather, task wiring, model,
    # CLIP, grads, adam, keep accounting), CHUNK iterations inside one
    # jitted fori_loop: a single dispatch measures device throughput —
    # per-step python dispatch would bill relay latency to the TPU
    raw_step = solver._build_step(train=True, with_negatives=False,
                                  return_output=False, jit=False)

    def train_chunk(state, arrays, na, pad_w, key):
        def body(i, carry):
            state, _ = carry
            new_state, metrics = raw_step(
                state, arrays, na, pad_w, None, None,
                jax.random.fold_in(key, i))
            return new_state, metrics["loss"]
        loss0 = jnp.zeros((), jnp.float32)
        return jax.lax.fori_loop(0, CHUNK, body, (state, loss0))

    # the solver's own step-compile options (scoped-VMEM cap — measured
    # ~6% on the paper step, doc/perf_playbook.md); BM_BENCH_COMPILER_
    # OPTIONS overrides for A/B sweeps ('{}' for compiler defaults).
    # Shell XLA_FLAGS does NOT reach this container's relayed compile
    # server; PJRT per-compile options do.
    from brainmagick_tpu.parallel import step_compiler_options
    copts_env = os.environ.get("BM_BENCH_COMPILER_OPTIONS")
    copts = (json.loads(copts_env) if copts_env
             else step_compiler_options(args))
    chunk = jax.jit(train_chunk, donate_argnums=(0,),
                    compiler_options=copts or None)

    key = jax.random.PRNGKey(0)
    # compile + warmup. Sync via a host transfer of the scalar loss —
    # on the relayed-TPU backend block_until_ready is not a reliable
    # barrier.
    t_compile = time.perf_counter()
    state, loss = chunk(solver.state, arrays, na, pad_w, key)
    _ = float(loss)
    print(f"# chunk compile+warmup "
          f"{time.perf_counter() - t_compile:.1f}s",
          file=sys.stderr, flush=True)

    # best-of-N repetitions of the timed region: the chip is reached
    # through a shared relay here, and a transient contention window
    # inflates a single aggregate 2-8x (measured 31 -> 267 ms/step on
    # the same HEAD). Min-of-N reports the device's capability; the
    # per-rep times are printed so degraded environments are visible.
    n_chunks = 3
    reps = int(os.environ.get("BM_BENCH_REPS") or 3)
    rep_times = []
    for r in range(reps):
        t0 = time.perf_counter()
        for k in range(n_chunks):
            key = jax.random.fold_in(key, r * n_chunks + k)
            state, loss = chunk(state, arrays, na, pad_w, key)
        _ = float(loss)
        rep_times.append(time.perf_counter() - t0)
    elapsed = min(rep_times)
    n_steps = n_chunks * CHUNK
    print("# rep times (ms/step): "
          + " ".join(f"{1e3 * t / n_steps:.2f}" for t in rep_times),
          file=sys.stderr, flush=True)

    samples_per_sec = B * n_steps / elapsed

    # MFU from the compiler's own flop count. XLA's cost analysis
    # counts a while/fori-loop BODY once (not trip_count times), so the
    # chunk's flop number IS the per-step count (verified: it matches
    # the round-2 single-step cost analysis of the same model, 3869
    # GFLOP, to 0.1%)
    step_flops = None
    try:
        cost = chunk.lower(state, arrays, na, pad_w,
                           key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost["flops"])
    except Exception:
        pass
    flops_source = "xla_cost_analysis"
    if not step_flops or step_flops <= 0:
        step_flops = _ANALYTIC_GFLOP_PER_SAMPLE * 1e9 * B
        flops_source = "analytic_estimate"
    achieved = step_flops * n_steps / elapsed
    mfu = achieved / V5E_BF16_PEAK_FLOPS

    print(json.dumps({
        "metric": "shipped_train_step_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        # the reference publishes NO throughput numbers; this ratio is
        # against the analytic V100 ESTIMATE documented above
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
        "baseline_kind": "estimated",
        "mfu": round(mfu, 3),
        "flops_per_step": round(step_flops / 1e9, 1),
        "flops_unit": "GFLOP",
        "flops_source": flops_source,
        "step_ms": round(1e3 * elapsed / n_steps, 2),
    }))


if __name__ == "__main__":
    main()
