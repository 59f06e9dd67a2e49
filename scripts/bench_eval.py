"""Benchmark: offline segment-retrieval eval scoring rate on the chip.

The reference's offline eval (run_eval_probs.py) costs "up to 30 min
per XP" on one GPU (README.md:238-239): an [N_pred, N_true] CLIP score
matrix over the deduplicated candidate pool dominates. Our eval.py
streams candidates through HBM in 2048-wide blocks and scores 2048-row
pred blocks (the flat GEMM is M-bound: the reference's 64 rows fill
half an MXU tile; 256 rows measured 3.1x that, 2048 rows with
per-block precomputed norms another 3.1x — see the "shipped" tag)
through losses.retrieval_scores, which
flattens the no-grad contraction to a 2D [B, C*T] x [block, C*T] dot
(~1.9x the 3D einsum's rate: t=343 pads to 384 inside the einsum's
contraction; see ops/pallas_matmul.py for the full measurement table
including the hand-blocked Pallas kernel variant).

Data is generated ON DEVICE (this container feeds the chip over an
~30 MB/s HTTP relay; production hosts stream the pool at PCIe rate)
and timed as a loop-carried jitted chunk (single dispatch). Reports
pred-candidate pairs/s for the einsum path and the production
retrieval_scores path (fp32 + bf16-stored pool), plus the projected
scoring time for a full-XP matrix (30k preds x 20k unique candidates —
the reference's wer_negatives=20k scale).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CHUNK = 8


def main() -> None:
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from brainmagick_tpu.losses import ClipLoss, retrieval_scores

    B, BLOCK, F, T = 256, 2048, 1024, 343  # eval.py build_probs shapes
    key = jax.random.PRNGKey(0)
    preds = jax.random.normal(key, (B, F, T), jnp.float32)
    cands = jax.random.normal(jax.random.fold_in(key, 1), (BLOCK, F, T),
                              jnp.float32)
    _ = float(cands.sum())

    def bench(fn, preds, cands, tag):
        def chunk(preds, cands):
            def body(i, carry):
                acc, p = carry
                s = fn(p, cands)
                return (acc + s.sum(),
                        p + (1e-38 * s.sum()).astype(p.dtype))
            acc, _ = jax.lax.fori_loop(
                0, CHUNK, body, (jnp.zeros((), jnp.float32), preds))
            return acc

        copts = os.environ.get("BM_BENCH_COMPILER_OPTIONS")
        jitted = jax.jit(chunk,
                         compiler_options=json.loads(copts) if copts
                         else None)
        out = jitted(preds, cands)
        _ = float(out)  # compile + warm; float() is the relay-safe sync
        t0 = time.perf_counter()
        out = jitted(preds, cands)
        _ = float(out)
        dt = (time.perf_counter() - t0) / CHUNK

        pairs_per_sec = B * BLOCK / dt
        full_pairs = 30_000 * 20_000
        print(json.dumps({
            "metric": f"eval_scoring_pairs_per_sec[{tag}]",
            "value": round(pairs_per_sec / 1e6, 2),
            "unit": "Mpairs/s",
            "block_ms": round(dt * 1e3, 2),
            "projected_full_xp_scoring_s": round(
                full_pairs / pairs_per_sec, 1),
            "reference_full_xp": "up to 30 min per XP (README.md:238)",
        }), flush=True)

    clip32 = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.)
    clip16 = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                      compute_dtype="bfloat16")

    def einsum_path(p, c):
        return clip32.apply({}, p, c, method=clip32.get_scores)

    sel = sys.argv[1:] or ["einsum", "flat32", "flat16", "int8"]
    if "einsum" in sel:
        bench(einsum_path, preds, cands, "einsum_fp32")
    if "flat32" in sel:
        bench(lambda p, c: retrieval_scores(clip32, {}, p, c),
              preds, cands, "retrieval_fp32")
    if "flat16" in sel:
        # like eval.build_probs with clip.compute_dtype=bfloat16: the
        # pool is STORED in bf16 (halves its HBM/stream footprint)
        bench(lambda p, c: retrieval_scores(clip16, {}, p, c),
              preds, cands.astype(jnp.bfloat16), "retrieval_bf16pool")
    if "int8" in sel:
        # test.pool_int8: int8-quantized pool, int8 MXU contraction
        # (quantize on device here — the pool never leaves the chip in
        # this bench; eval.build_probs quantizes host-side)
        from brainmagick_tpu.losses import (_int8_quantize_rows,
                                            retrieval_scores_int8)
        q, _ = _int8_quantize_rows(cands.reshape(BLOCK, -1))
        cands_q = q.reshape(BLOCK, F, T)
        _ = float(cands_q.sum())
        bench(lambda p, c: retrieval_scores_int8(p, c),
              preds, cands_q, "retrieval_int8pool")
    if "shipped" in sel:
        # the wer/eval production call since r3-final: 2048-row pred
        # chunks (the flat GEMM is M-bound: raw 80.6 Mpairs/s at M=256,
        # 151 at M=1024, prenorm 173.5 at M=2048) + candidate norms
        # precomputed once per block (losses.block_inv_norms; the
        # in-call recompute measured 2.2 ms of the 8.7 ms M=256 call)
        from brainmagick_tpu.losses import block_inv_norms
        B_old, B = B, 2048  # bench() reads B at call time for pairs/s
        preds_l = jax.random.normal(jax.random.fold_in(key, 2),
                                    (B, F, T), jnp.float32)
        inv = jax.jit(block_inv_norms)(cands.astype(jnp.bfloat16))
        _ = float(preds_l.sum()) + float(inv.sum())
        bench(lambda p, c: retrieval_scores(clip16, {}, p, c,
                                            inv_norms=inv),
              preds_l, cands.astype(jnp.bfloat16),
              "retrieval_shipped_m2048_prenorm")
        # r3-final+: wer/eval prepare each estimate chunk ONCE
        # (losses.EstimateCache — commit + bf16 cast hoisted out of the
        # per-block scoring call), so the steady-state call sees a
        # bf16 chunk; the in-call astype is then an XLA no-op
        bench(lambda p, c: retrieval_scores(clip16, {}, p, c,
                                            inv_norms=inv),
              preds_l.astype(jnp.bfloat16), cands.astype(jnp.bfloat16),
              "retrieval_shipped_m2048_prenorm_precast")
        B = B_old


if __name__ == "__main__":
    main()
