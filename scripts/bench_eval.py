"""Benchmark: offline segment-retrieval eval scoring rate on the chip.

The reference's offline eval (run_eval_probs.py) costs "up to 30 min
per XP" on one GPU (README.md:238-239): an [N_pred, N_true] CLIP score
matrix over the deduplicated candidate pool dominates. Our eval.py
streams candidates through HBM in 2048-wide blocks (they do not fit
otherwise at wav2vec dims) and scores [batch, C, T] x [block, C, T] on
the MXU — this measures that inner scoring rate, data device-resident
and timed as a loop-carried jitted chunk (single dispatch; this
container's host drives the chip over an HTTP relay, so per-call
timing would bill relay latency to the TPU).

Reports pred-candidate pairs/s (fp32 and bf16 score paths) and the
projected scoring time for a full-XP matrix (30k preds x 20k unique
candidates — the reference's wer_negatives=20k scale).
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
    import numpy as np

    from brainmagick_tpu.losses import ClipLoss

    # eval.py build_probs shapes. Pred-block 256 (not the reference's
    # 64): measured 3.1x more pairs/s — 64 rows fill half an MXU tile
    B, BLOCK, F, T = 256, 2048, 1024, 343
    rng = np.random.RandomState(0)
    preds = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    cands = jnp.asarray(rng.randn(BLOCK, F, T).astype(np.float32))

    for dtype in (None, "bfloat16"):
        clip = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                        compute_dtype=dtype)
        # like eval.build_probs: candidate blocks are STORED in the
        # compute dtype (halves the pool's transfer + HBM footprint;
        # measured: scoring itself is FASTEST in fp32 at these shapes —
        # 17.9 vs 12.0 Mpairs/s — so bf16 is a memory/transfer
        # trade-off, not a compute win)
        cands_t = cands.astype(jnp.bfloat16) if dtype else cands

        def chunk(preds, cands):
            def body(i, carry):
                acc, p = carry
                s = clip.apply({}, p, cands, method=clip.get_scores)
                # loop-carried perturbation (underflows fp32) so XLA
                # cannot hoist the body and time 1 call as CHUNK
                return acc + s.sum(), p + 1e-38 * s.sum()
            acc, _ = jax.lax.fori_loop(
                0, CHUNK, body, (jnp.zeros((), jnp.float32), preds))
            return acc

        jitted = jax.jit(chunk)
        out = jitted(preds, cands_t)
        _ = float(out)  # compile + warm; float() is the relay-safe sync
        t0 = time.perf_counter()
        out = jitted(preds, cands_t)
        _ = float(out)
        dt = (time.perf_counter() - t0) / CHUNK

        pairs_per_sec = B * BLOCK / dt
        full_pairs = 30_000 * 20_000
        print(json.dumps({
            "metric": f"eval_scoring_pairs_per_sec[{dtype or 'float32'}]",
            "value": round(pairs_per_sec / 1e6, 2),
            "unit": "Mpairs/s",
            "block_ms": round(dt * 1e3, 2),
            "projected_full_xp_scoring_s": round(
                full_pairs / pairs_per_sec, 1),
            "reference_full_xp": "up to 30 min per XP (README.md:238)",
        }))


if __name__ == "__main__":
    main()
