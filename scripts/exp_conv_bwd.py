"""Probe the dilation-16/8 conv-backward-input outliers.

Per-HLO profiling (scripts/profile_step.py) shows XLA's
conv-backward-input kernels for the d=16/8 encoder layers running at
43-49% MFU while the forward convs at the same shapes reach ~66%. For
a stride-1 dilated conv, dx is ITSELF a plain dilated conv of dY with
the flipped, transposed kernel — if XLA's forward-conv lowering is
faster than its autodiff-generated backward-input kernel at these
shapes, a custom VJP can route dx through the forward lowering.

Times three expressions of the same dx contraction at the paper layer
shape [B=256, T=343, C=O=320] bf16, one jitted fori_loop chunk each:

    fwd      — the forward conv itself (reference point)
    autodiff — jax.grad of the forward conv w.r.t. x (XLA's bwd kernel)
    flipconv — dx as an explicit forward conv of dY with flip(w)^T

Usage: python scripts/exp_conv_bwd.py [dilation=16] [chunk=32] [iters=3]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

B, T, C, O, K = 256, 343, 320, 320, 3


def main() -> None:
    kw = dict(a.split("=", 1) for a in sys.argv[1:])
    dilation = int(kw.get("dilation", 16))
    chunk_n = int(kw.get("chunk", 32))
    iters = int(kw.get("iters", 3))

    import jax

    cache_dir = Path("~/.cache/jax_comp").expanduser()
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    pad = (K // 2) * dilation
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((0.05 * rng.randn(K, C, O)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    dy = jnp.asarray(rng.randn(B, T, O).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def fwd(x, w):
        # pure bf16 conv, like the flax nn.Conv(dtype=bf16) layers (a
        # preferred_element_type=fp32 output makes the autodiff
        # transpose mix fp32 cotangents with bf16 kernels and fail)
        return lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad, pad)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    def autodiff_dx(x, w, dy):
        _, vjp = jax.vjp(lambda x: fwd(x, w), x)
        return vjp(dy)[0]

    def flipconv_dx(x, w, dy):
        w_flip = jnp.flip(w, axis=0).swapaxes(1, 2)  # [K, O, C]
        return lax.conv_general_dilated(
            dy, w_flip, window_strides=(1,), padding=[(pad, pad)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    variants = {
        "fwd": lambda x, w, dy: fwd(x, w),
        "autodiff": autodiff_dx,
        "flipconv": flipconv_dx,
    }

    # correctness: flipconv == autodiff
    ref = np.asarray(autodiff_dx(x, w, dy), dtype=np.float32)
    got = np.asarray(flipconv_dx(x, w, dy), dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)

    results = {}
    for name, fn in variants.items():
        def chunk(x, w, dy, fn=fn):
            def body(i, carry):
                out = fn(x + (1e-30 * carry[1]).astype(x.dtype), w, dy)
                return out, carry[1] + jnp.sum(
                    out[0, 0].astype(jnp.float32))
            out0 = jnp.zeros_like(fn(x, w, dy))
            return lax.fori_loop(0, chunk_n, body,
                                 (out0, jnp.float32(0.)))

        jitted = jax.jit(chunk)
        _, acc = jitted(x, w, dy)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, acc = jitted(x, w, dy)
        _ = float(acc)
        ms = 1e3 * (time.perf_counter() - t0) / (iters * chunk_n)
        flops = 2 * B * T * C * O * K
        results[name] = dict(
            ms=round(ms, 3),
            mfu=round(flops / (ms / 1e3) / 197e12, 3))
    print(json.dumps({"dilation": dilation, **results}))


if __name__ == "__main__":
    main()
