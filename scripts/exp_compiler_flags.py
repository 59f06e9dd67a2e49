"""Experiment: XLA TPU compiler-option sweep over the SHIPPED train step.

Round 3 found `xla_tpu_scoped_vmem_limit_kib=65536` worth +8.1%
(doc/perf_playbook.md); this sweeps further per-compile PJRT options on
top of it, through the exact bench.py chunk (solver's own
`_build_step(train=True)` at paper shapes). Unrecognized options fail
the compile — reported as "unsupported" and skipped, so guessing costs
one compile attempt, not a crash.

Usage: python scripts/exp_compiler_flags.py [variant ...]
(no args = all variants; "list" prints the table)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

BASE = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

VARIANTS: dict = {
    "control": dict(BASE),
    "no_vmem_cap": {},
    # refine the VMEM sweep granularity around the 64 MiB optimum
    "vmem56": {"xla_tpu_scoped_vmem_limit_kib": "57344"},
    "vmem72": {"xla_tpu_scoped_vmem_limit_kib": "73728"},
    # let MSA scavenge leftover scoped VMEM for fusion buffers
    "scavenge": {**BASE, "xla_tpu_scavenge_vmem_for_fusions": "true"},
    "no_scavenge": {**BASE, "xla_tpu_scavenge_vmem_for_fusions": "false"},
    # alternate fusion cost model
    "fusion_cost": {**BASE,
                    "xla_tpu_use_bundle_aware_cost_model_for_fusions":
                        "true"},
    # flip reduce+broadcast fusion
    "no_rwb": {**BASE, "xla_tpu_rwb_fusion": "false"},
    # deeper loop fusion nesting
    "nested_fusion": {**BASE,
                      "xla_tpu_enable_multi_level_nested_loop_fusion":
                          "true"},
    # dot+dot fusion off (the step is conv+dot heavy)
    "no_dot_dot": {**BASE, "xla_tpu_dot_dot_fusion": "false"},
    # latency-hiding scheduler (mostly collectives, may reorder DMAs)
    "lhs": {**BASE, "xla_latency_hiding_scheduler_rerun": "2"},
}


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    if sel == ["list"]:
        for k, v in VARIANTS.items():
            print(k, json.dumps(v))
        return
    names = sel or list(VARIANTS)

    import jax
    import jax.numpy as jnp

    import bench

    bench._enable_compile_cache()
    solver, args = bench.build_solver()
    B, CHUNK = bench.B, bench.CHUNK

    loader = solver.loaders["train"]
    batch, pad_weight = next(iter(loader))
    arrays = batch.to_device(args.parallel.transfer_dtype)
    pad_w = jnp.asarray(pad_weight)
    na = solver.norm_arrays
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

    state0 = solver.state
    key = jax.random.PRNGKey(0)
    results = {}
    for name in names:
        copts = VARIANTS[name]
        try:
            chunk = jax.jit(train_chunk, compiler_options=copts or None)
            t_c = time.perf_counter()
            state, loss = chunk(state0, arrays, na, pad_w, key)
            _ = float(loss)
            compile_s = time.perf_counter() - t_c
            n_chunks = 3
            t0 = time.perf_counter()
            for k in range(n_chunks):
                state, loss = chunk(state, arrays, na, pad_w,
                                    jax.random.fold_in(key, k))
            _ = float(loss)
            dt = (time.perf_counter() - t0) / (n_chunks * CHUNK)
            del state, chunk
            results[name] = round(dt * 1e3, 2)
            print(json.dumps({
                "variant": name, "options": copts,
                "step_ms": round(dt * 1e3, 2),
                "samples_per_sec": round(B / dt, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:  # unsupported option / compile failure
            results[name] = None
            print(json.dumps({
                "variant": name, "options": copts,
                "error": str(e).split("\n")[0][:200],
            }), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
