"""Decompose the train step: per-part throughput/MFU on the chip.

bench.py reports the full training step; this measures isolated parts
(forward-only, conv-encoder-only fwd+bwd) so the speed-of-light
analysis in STATUS.md rests on measurements instead of estimates.
Prints one JSON line per part.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

V5E_BF16_PEAK_FLOPS = 197e12
CHUNK = 16


def _time_chunk(fn, x, *args) -> float:
    """Seconds per call of fn(x, *args), timed as CHUNK calls inside one
    jitted fori_loop (single dispatch; relay-safe sync via a host
    transfer). The scalar output is fed back into `x` scaled by 1e-38 —
    numerically exact in fp32 (the perturbation underflows the mantissa)
    but it makes every iteration data-depend on the previous one, so
    XLA cannot hoist the body out of the loop and time 1 call as CHUNK
    (loop-invariant code motion would otherwise inflate MFU ~CHUNKx)."""
    import jax
    import jax.numpy as jnp

    def chunk(x, *args):
        def body(i, carry):
            acc, x = carry
            out = fn(x, *args)
            return acc + out, x + 1e-38 * out
        acc, _ = jax.lax.fori_loop(
            0, CHUNK, body, (jnp.zeros((), jnp.float32), x))
        return acc

    jitted = jax.jit(chunk)
    out = jitted(x, *args)
    _ = float(out)  # compile+warm; block_until_ready unreliable on relay
    t0 = time.perf_counter()
    out = jitted(x, *args)
    _ = float(out)
    return (time.perf_counter() - t0) / CHUNK


def _flops(fn, *args) -> float:
    import jax
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return 0.0


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

    from brainmagick_tpu.models import SimpleConv
    from brainmagick_tpu.models.common import ConvSequence

    B, C, T, OUT, H = 256, 273, 343, 1024, 320
    rng = np.random.RandomState(0)

    # -- part 1: full model forward (paper config, eval mode) -------------
    model = SimpleConv(
        in_channels=dict(meg=C), out_channels=OUT, hidden=dict(meg=H),
        depth=10, kernel_size=3, dilation_period=5, skip=True,
        subject_layers=True, subject_dim=0, complex_out=True, glu=2,
        glu_context=1, merger=True, merger_channels=270,
        merger_pos_dim=2048, initial_linear=270, gelu=True,
        batch_norm=True, n_subjects=32, dtype="bfloat16")
    from brainmagick_tpu.models.common import fourier_emb

    N_REC = 8
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    subjects = jnp.asarray(rng.randint(0, 32, B))
    rec_index = jnp.asarray(rng.randint(0, N_REC, B))
    rec_positions = jnp.asarray(rng.rand(N_REC, C, 2).astype(np.float32))
    positions = rec_positions[rec_index]
    pos_emb = fourier_emb(rec_positions, 2048)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           dict(meg=meg), subjects, positions,
                           train=False)

    def fwd(meg):
        # per-recording merger table, like the solver's step
        out = model.apply(variables, dict(meg=meg), subjects, positions,
                          train=False, pos_emb=pos_emb,
                          rec_index=rec_index,
                          rec_positions=rec_positions)
        return out.astype(jnp.float32).sum()

    dt = _time_chunk(fwd, meg)
    fl = _flops(fwd, meg)
    print(json.dumps({
        "metric": "model_forward_ms", "value": round(dt * 1e3, 2),
        "unit": "ms", "gflop": round(fl / 1e9, 1),
        "mfu": round(fl / dt / V5E_BF16_PEAK_FLOPS, 3)}))

    # -- part 2: bare conv encoder fwd+bwd (the FLOP majority) ------------
    # the paper encoder's exact schedule (SimpleConv passes stride=1,
    # dilation 2^k reset every 5 — the ConvSequence DEFAULTS differ)
    channels = (270,) + (H,) * 10
    encoder = ConvSequence(channels, kernel=3, stride=1,
                           dilation_growth=2, dilation_period=5,
                           skip=True, glu=2, glu_context=1,
                           batch_norm=True, dtype="bfloat16")
    x = jnp.asarray(rng.randn(B, T, 270).astype(np.float32))
    enc_vars = encoder.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)

    def enc_step(x, params):
        def loss_fn(p):
            out, _ = encoder.apply(
                {"params": p, "batch_stats": enc_vars["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return out.astype(jnp.float32).sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g).astype(jnp.float32)
                          for g in jax.tree_util.tree_leaves(grads))

    dt = _time_chunk(enc_step, x, enc_vars["params"])
    fl = _flops(enc_step, x, enc_vars["params"])
    print(json.dumps({
        "metric": "conv_encoder_train_ms", "value": round(dt * 1e3, 2),
        "unit": "ms", "gflop": round(fl / 1e9, 1),
        "mfu": round(fl / dt / V5E_BF16_PEAK_FLOPS, 3)}))


if __name__ == "__main__":
    main()
