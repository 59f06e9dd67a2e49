"""Measure FusedConvBN (Pallas conv+BN-stats) vs the XLA Conv+BatchNorm
path on the real chip, paper shapes.

Times the full 10-layer encoder stack (dilated k=3 convs, GELU,
residual, GLU/2 — exactly SimpleConv's schedule) fwd+bwd at
[B=256, T=343, C=320] bf16, as one jitted fori_loop chunk with a
loop-carried perturbation (the relay bills per-dispatch latency and XLA
would hoist an unused body). Compare:

    xla    — ConvSequence(fused_conv_bn=False)  (the shipped default)
    fused  — ConvSequence(fused_conv_bn=True)   (Pallas conv+stats)

Usage:  python scripts/exp_conv_bn.py [xla|fused] [chunk=8] [iters=3]
One variant per invocation — a fresh remote compile takes minutes, and
the persistent cache (~/.cache/jax_comp) survives timeouts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

B, T, C = 256, 343, 320
V5E_BF16_PEAK = 197e12


def main() -> None:
    args = [a for a in sys.argv[1:]]
    variant = args[0] if args else "xla"
    kw = dict(a.split("=", 1) for a in args[1:])
    chunk_n = int(kw.get("chunk", 8))
    iters = int(kw.get("iters", 3))

    import jax

    cache_dir = Path("~/.cache/jax_comp").expanduser()
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from brainmagick_tpu.models.common import ConvSequence

    seq = ConvSequence(
        channels=(C,) * 11, kernel=3, stride=1, dilation_growth=2,
        dilation_period=5, skip=True, batch_norm=True, glu=2,
        glu_context=1, activation=jax.nn.gelu, dtype=jnp.bfloat16,
        bn_conv_bias=False, fused_conv_bn=(variant == "fused"))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    variables = seq.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(params, stats, x):
        out, mut = seq.apply({"params": params, "batch_stats": stats},
                             x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6, \
            mut["batch_stats"]

    def step(params, stats, x):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, x)
        # consume the grads so nothing dead-codes away
        gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum * 1e-9, new_stats

    def chunk(params, stats, x):
        def body(i, carry):
            stats, acc = carry
            # loop-carried perturbation: XLA cannot hoist the body
            loss, stats = step(params, stats,
                               x + (1e-30 * acc).astype(x.dtype))
            return stats, acc + loss
        return jax.lax.fori_loop(
            0, chunk_n, body, (stats, jnp.float32(0.)))

    jitted = jax.jit(chunk)
    t0 = time.perf_counter()
    stats1, acc = jitted(params, stats, x)
    _ = float(acc)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        stats1, acc = jitted(params, stats1, x)
    _ = float(acc)
    elapsed = time.perf_counter() - t0
    per_step_ms = 1e3 * elapsed / (iters * chunk_n)

    flops = None
    try:
        cost = jitted.lower(params, stats, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # XLA cost analysis counts the fori_loop body ONCE, so this is
        # already the per-step flop count
        flops = float(cost["flops"])
    except Exception:
        pass
    mfu = (flops / (per_step_ms / 1e3) / V5E_BF16_PEAK
           if flops else None)

    print(json.dumps({
        "variant": variant,
        "per_step_ms": round(per_step_ms, 3),
        "compile_s": round(compile_s, 1),
        "flops_per_step_gflop": round(flops / 1e9, 1) if flops else None,
        "mfu": round(mfu, 3) if mfu else None,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
