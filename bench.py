"""Benchmark: flagship train-step throughput on the paper configuration.

Runs the FULL jitted training step (normalization + clamp + meg offset +
SimpleConv paper architecture + CLIP loss + grads + adam update) on
synthetic data at the paper's shapes: batch 256, 273 sensors, 361
samples (3s @ 120Hz), wav2vec-dim 1024 targets, and reports
samples/sec/chip.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md). The baseline used here is an analytic estimate of the
reference's per-GPU V100 throughput for the same recipe: ~20 GFLOP per
sample per training step (fwd+bwd of the depth-10/320ch dilated-GLU
stack, merger attention and complex head) at ~30% fp32 utilization of a
V100 (14 TFLOP/s) => ~200 samples/sec/GPU.
"""

from __future__ import annotations

import json
import time

REFERENCE_SAMPLES_PER_SEC = 200.0  # analytic V100 estimate, see docstring


def main() -> None:
    import os

    import jax

    # persistent compilation cache: remote compiles on the relayed TPU
    # take minutes; cache them across runs
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from brainmagick_tpu.losses import ClipLoss
    from brainmagick_tpu.models import SimpleConv

    B, C, T, OUT = 256, 273, 361, 1024
    N_SUBJECTS = 32
    OFFSET = 18  # 150ms @ 120Hz (task.offset_meg_ms)

    model = SimpleConv(
        in_channels=dict(meg=C), out_channels=OUT, hidden=dict(meg=320),
        depth=10, kernel_size=3, dilation_period=5, skip=True,
        subject_layers=True, subject_dim=0, complex_out=True, glu=2,
        glu_context=1, merger=True, merger_channels=270,
        merger_pos_dim=2048, initial_linear=270, gelu=True,
        batch_norm=True, n_subjects=N_SUBJECTS, dtype="bfloat16")
    clip = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.)

    rng = np.random.RandomState(0)
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    features = jnp.asarray(rng.randn(B, OUT, T).astype(np.float32))
    subjects = jnp.asarray(rng.randint(0, N_SUBJECTS, B))
    positions = jnp.asarray(rng.rand(B, C, 2).astype(np.float32))

    # positions are per-recording constants: precompute the merger's
    # fourier embedding once (saves ~2*C*D transcendentals per step)
    from brainmagick_tpu.models.common import fourier_emb
    pos_emb = fourier_emb(positions, 2048)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dict(meg=meg), subjects, positions, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, meg, features,
                   subjects, positions, pos_emb, rng):
        # pos_emb travels as an argument: closing over the [B, C, 2048]
        # table would bake a ~570MB constant into the compiled HLO
        meg_in = jnp.clip(meg, -20., 20.)[..., OFFSET:]
        target = features[..., :-OFFSET]

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                dict(meg=meg_in), subjects, positions, train=True,
                pos_emb=pos_emb,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = clip.apply({}, out, target, train=True)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    key = jax.random.PRNGKey(0)
    # compile + warmup. NOTE: sync via a host transfer of the scalar loss
    # — on this container's relayed-TPU backend block_until_ready is not
    # a reliable barrier.
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, meg, features, subjects,
        positions, pos_emb, key)
    _ = float(loss)

    # calibrate the step time, then time enough steps for ~30s
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, meg, features, subjects,
        positions, pos_emb, key)
    _ = float(loss)
    step_time = time.perf_counter() - t0
    n_steps = max(3, min(30, int(30.0 / max(step_time, 1e-3))))

    t0 = time.perf_counter()
    for k in range(n_steps):
        key = jax.random.fold_in(key, k)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, meg, features, subjects,
            positions, pos_emb, key)
    _ = float(loss)
    elapsed = time.perf_counter() - t0

    samples_per_sec = B * n_steps / elapsed
    print(json.dumps({
        "metric": "train_step_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
