"""Experiment: dilated-conv lowering variants for the paper encoder.

The per-HLO profile (scripts/profile_step.py) shows the encoder's
backward convs running at 43-67% MFU while the GLU convs reach ~81%.
This measures the full encoder fwd+bwd with the k=3 convs lowered three
ways, on the bench_parts harness (loop-carried fori_loop timing):

  conv    — nn.Conv / conv_general_dilated (baseline)
  dots    — k shifted slices, k separate [B*T,C]x[C,O] dots accumulated
  concat  — slices concatenated to [B,T,k*C], ONE [B*T,kC]x[kC,O] dot
            (k*C = 960 pads to 1024 on the MXU: 94% tile utilization vs
            83% for C=320 -> 384)

Prints one JSON line per variant. The winner is wired into ConvSequence
as `conv_impl` if it beats the baseline.
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
    _ = float(out)
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

    from brainmagick_tpu.models.common import ConvSequence

    B, T, H = 256, 343, 320
    rng = np.random.RandomState(0)
    channels = (270,) + (H,) * 10
    x = jnp.asarray(rng.randn(B, T, 270).astype(np.float32))

    for impl in (sys.argv[1:] or ["conv", "dots", "concat"]):
        encoder = ConvSequence(channels, kernel=3, stride=1,
                               dilation_growth=2, dilation_period=5,
                               skip=True, glu=2, glu_context=1,
                               batch_norm=True, dtype="bfloat16",
                               conv_impl=impl)
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
            "metric": f"conv_encoder_train_ms[{impl}]",
            "value": round(dt * 1e3, 2), "unit": "ms",
            "gflop": round(fl / 1e9, 1),
            "mfu": round(fl / dt / V5E_BF16_PEAK_FLOPS, 3)}))


if __name__ == "__main__":
    main()
