"""Isolated A/B of the gelu lowering cost on the paper encoder (r4).

Context: pinning gelu to torch's exact erf form (for reference-
checkpoint parity, tests/test_reference_parity.py) regressed the
shipped training step 31.7 -> 58.5 ms. This measures the activation
choice alone on a 10-layer GLU encoder at paper shapes, fwd+bwd.

Measured on a v5e-1 chip (2026-08-18):
    gelu tanh-approx: 23.76 ms
    gelu exact-erf:   35.57 ms
    relu:             23.50 ms

Conclusion: XLA's erf lowering costs ~50% over the tanh polynomial at
these shapes; the clip_conv_tpu recipe ships `gelu_exact=False`
(tanh, ~5e-4 off) and the erf form stays the default for converted
reference checkpoints. See doc/perf_playbook.md.
"""
import functools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

B, C, T, H = 256, 270, 343, 320


class Enc(nn.Module):
    act: object

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(10):
            d = 2 ** (i % 5)
            h = nn.Conv(2 * H, (3,), kernel_dilation=(d,), padding="SAME",
                        dtype=jnp.bfloat16, param_dtype=jnp.float32)(h)
            a, b = jnp.split(h, 2, axis=-1)
            h = self.act(a) * nn.sigmoid(b)
        return h


def bench(act, name):
    m = Enc(act=act)
    x = jnp.zeros((B, T, C), jnp.bfloat16)
    params = jax.jit(m.init, backend="cpu")(jax.random.PRNGKey(0), x)
    params = jax.device_put(params, jax.devices()[0])
    x = jax.device_put(x)

    def loss(p, x):
        return jnp.mean(m.apply(p, x).astype(jnp.float32))

    step = jax.jit(lambda p, x: jax.grad(loss)(p, x))
    g = step(params, x)
    jax.block_until_ready(g)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        g = step(params, x)
    jax.block_until_ready(g)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


if __name__ == "__main__":
    bench(functools.partial(nn.gelu, approximate=True), "gelu tanh-approx")
    bench(functools.partial(nn.gelu, approximate=False), "gelu exact-erf")
    bench(nn.relu, "relu")
