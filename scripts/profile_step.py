"""Profile the flagship train step per-HLO on the chip.

Runs ONE jitted train step (identical setup to bench.py) under
jax.profiler.start_trace, then aggregates the device-side HLO events
from the chrome trace: total device time by HLO category and the top
individual ops with their source JAX op (tf_op), FLOPs and bytes.

Usage: python scripts/profile_step.py [--out /tmp/step_profile.json]

This is how STATUS.md's step decomposition is produced; bench_parts.py
cross-checks the big pieces with wall-clock timing.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_step():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from brainmagick_tpu.losses import ClipLoss
    from brainmagick_tpu.models import SimpleConv
    from brainmagick_tpu.models.common import fourier_emb

    B, C, T, OUT = 256, 273, 361, 1024
    N_SUBJECTS = 32
    OFFSET = 18

    model = SimpleConv(
        in_channels=dict(meg=C), out_channels=OUT, hidden=dict(meg=320),
        depth=10, kernel_size=3, dilation_period=5, skip=True,
        subject_layers=True, subject_dim=0, complex_out=True, glu=2,
        glu_context=1, merger=True, merger_channels=270,
        merger_pos_dim=2048, initial_linear=270, gelu=True,
        batch_norm=True, n_subjects=N_SUBJECTS, dtype="bfloat16",
        output_dtype="bfloat16", bn_conv_bias=False)
    clip = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                    compute_dtype="bfloat16")

    rng = np.random.RandomState(0)
    N_REC = 8
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    features = jnp.asarray(rng.randn(B, OUT, T).astype(np.float32))
    subjects = jnp.asarray(rng.randint(0, N_SUBJECTS, B))
    rec_index = jnp.asarray(rng.randint(0, N_REC, B))
    rec_positions = jnp.asarray(rng.rand(N_REC, C, 2).astype(np.float32))
    positions = rec_positions[rec_index]
    pos_emb = fourier_emb(rec_positions, 2048)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dict(meg=meg), subjects, positions, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, meg, features,
                   subjects, positions, pos_emb, rng):
        meg_in = jnp.clip(meg, -20., 20.)[..., OFFSET:]
        target = features[..., :-OFFSET]

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                dict(meg=meg_in), subjects, positions, train=True,
                pos_emb=pos_emb, rec_index=rec_index,
                rec_positions=rec_positions,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = clip.apply({}, out, target, train=True)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    step = jax.jit(train_step)
    args = (params, batch_stats, opt_state, meg, features, subjects,
            positions, pos_emb, jax.random.PRNGKey(0))
    return step, args


def aggregate(trace_dir: str) -> dict:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/"
                                   "*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    by_cat = collections.Counter()
    by_op = collections.defaultdict(
        lambda: dict(us=0.0, count=0, flops=0, bytes=0, category=""))
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        dur_us = float(args.get("device_duration_ps", 0)) / 1e6
        if dur_us == 0 or "hlo_category" not in args:
            continue
        cat = args["hlo_category"]
        # strip HLO ssa suffixes: fusion.123 -> source jax op if known
        op_key = args.get("tf_op") or e.get("name", "?")
        by_cat[cat] += dur_us
        rec = by_op[op_key]
        rec["us"] += dur_us
        rec["count"] += 1
        rec["flops"] += int(args.get("model_flops", 0) or 0)
        rec["bytes"] += int(args.get("raw_bytes_accessed", 0) or 0)
        rec["category"] = cat
        total_us += dur_us
    top = sorted(by_op.items(), key=lambda kv: -kv[1]["us"])[:60]
    return {
        "total_device_ms": round(total_us / 1e3, 3),
        "by_category_ms": {k: round(v / 1e3, 3)
                           for k, v in by_cat.most_common()},
        "top_ops": [
            {"op": k, "ms": round(v["us"] / 1e3, 3), "count": v["count"],
             "gflop": round(v["flops"] / 1e9, 1),
             "mb": round(v["bytes"] / 1e6, 1),
             "category": v["category"]}
            for k, v in top],
    }


def build_shipped_step():
    """The SHIPPED solver step via bench.py's fake-study harness
    (clip_conv_tpu preset incl. fused_head) — profile what production
    actually runs."""
    import bench
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    solver, cfg = bench.build_solver()
    batch, pad_weight = next(iter(solver.loaders["train"]))
    arrays = batch.to_device(cfg.parallel.transfer_dtype)
    pad_w = jnp.asarray(pad_weight)
    # raw (unjitted) step re-jitted WITHOUT state donation: the profiler
    # calls it twice with the same buffers. Same compile options as the
    # shipped jit (scoped-VMEM cap) so the profile matches production.
    from functools import partial as _partial

    from brainmagick_tpu.parallel import step_compiler_options
    raw = solver._build_step(train=True, with_negatives=False,
                             return_output=False, jit=False)

    @_partial(jax.jit, compiler_options=step_compiler_options(cfg))
    def run(state, arrays, na, pad_w, key):
        new_state, metrics = raw(state, arrays, na, pad_w, None, None,
                                 key)
        return new_state, metrics["loss"]

    return run, (solver.state, arrays, solver.norm_arrays, pad_w,
                 jax.random.PRNGKey(0))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/step_profile.json")
    parser.add_argument("--shipped", action="store_true",
                        help="profile the shipped Solver step (bench.py "
                             "harness) instead of the hand-rolled one")
    args = parser.parse_args()

    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    step, step_args = (build_shipped_step() if args.shipped
                       else build_step())
    out = step(*step_args)          # compile + warm
    _ = float(out[-1])
    trace_dir = tempfile.mkdtemp(prefix="steptrace_")
    jax.profiler.start_trace(trace_dir)
    out = step(*step_args)
    _ = float(out[-1])
    jax.profiler.stop_trace()

    summary = aggregate(trace_dir)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"total_device_ms": summary["total_device_ms"]}))
    print("by_category_ms:")
    for k, v in summary["by_category_ms"].items():
        print(f"  {k:28s} {v:8.3f}")
    print(f"top ops -> {args.out}")
    for rec in summary["top_ops"][:25]:
        print(f"  {rec['ms']:7.3f} ms x{rec['count']:<3d} "
              f"{rec['category'][:18]:18s} {rec['op'][:70]}")


if __name__ == "__main__":
    main()
