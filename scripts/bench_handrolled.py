"""Hand-rolled train-step benchmark (rounds 1-2 driver gate).

This is the simplified step bench.py used through round 2: synthetic
arrays, `jnp.clip` in place of the solver's per-recording Pallas
normalize/clamp/peak gather, no feature normalization and no
keep/pad-weight accounting. Kept so the delta between this upper bound
and the SHIPPED solver step (the new bench.py, which times
`Solver._build_step(train=True)` on a fake-study solver) stays
measurable — the gap quantifies what the real pipeline's bookkeeping
costs (see STATUS.md).
"""

from __future__ import annotations

import json
import time

REFERENCE_SAMPLES_PER_SEC = 200.0  # analytic V100 estimate, see docstring

# v5e bf16 peak: 197 TFLOP/s per chip
V5E_BF16_PEAK_FLOPS = 197e12

# Analytic fallback when the backend exposes no cost analysis, in GFLOP
# per sample per TRAIN step (fwd+bwd ~= 3x fwd). Forward per sample at
# T~343: dilated conv stack 2*T*H*H*k per layer (5 plain + 5 GLU-doubled
# layers) ~3.2G, merger scores 2*C*O*D/sample-free + mix ~0.4G,
# initial/subject linears ~0.1G, complex head 2*T*(H*2F + 2F*F) ~0.95G,
# clip scores 2*B*F*T ~0.18G => ~4.8 GFLOP fwd, ~14.4 GFLOP train step.
_ANALYTIC_GFLOP_PER_SAMPLE = 14.4


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
        batch_norm=True, n_subjects=N_SUBJECTS, dtype="bfloat16",
        output_dtype="bfloat16",
        # encoder conv biases are cancelled exactly by the BatchNorm
        # that follows them; their gradients cost a full cotangent read
        # per layer (+2% step time measured) — elide them
        bn_conv_bias=False)
    clip = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                    compute_dtype="bfloat16")

    rng = np.random.RandomState(0)
    N_REC = 8  # distinct recordings per batch (solver's real shape)
    meg = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    features = jnp.asarray(rng.randn(B, OUT, T).astype(np.float32))
    subjects = jnp.asarray(rng.randint(0, N_SUBJECTS, B))
    rec_index = jnp.asarray(rng.randint(0, N_REC, B))
    rec_positions = jnp.asarray(rng.rand(N_REC, C, 2).astype(np.float32))
    positions = rec_positions[rec_index]

    # positions are per-recording constants: the merger scores per
    # RECORDING (R softmax rows, no [B, C, 2048] gather) exactly like
    # the solver's train step (solver._pos_emb_table / ChannelMerger)
    from brainmagick_tpu.models.common import fourier_emb
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
        # pos_emb travels as an argument: closing over a large
        # embedding table would bake it into the compiled HLO as a
        # constant (the remote compiler rejects oversized payloads)
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

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    # the timed region runs CHUNK steps inside one jitted fori_loop: a
    # single dispatch measures pure device throughput — on this
    # container the host drives the chip through an HTTP relay, so
    # per-step python dispatch would bill relay latency to the TPU
    # (production hosts dispatch locally at microseconds)
    CHUNK = 16

    def train_chunk(params, batch_stats, opt_state, meg, features,
                    subjects, positions, pos_emb, key):
        def body(i, carry):
            params, batch_stats, opt_state, _ = carry
            return train_step(params, batch_stats, opt_state, meg,
                              features, subjects, positions, pos_emb,
                              jax.random.fold_in(key, i))
        loss0 = jnp.zeros((), jnp.float32)
        return jax.lax.fori_loop(
            0, CHUNK, body, (params, batch_stats, opt_state, loss0))

    chunk = jax.jit(train_chunk, donate_argnums=(0, 1, 2))

    key = jax.random.PRNGKey(0)
    # compile + warmup. NOTE: sync via a host transfer of the scalar loss
    # — on this container's relayed-TPU backend block_until_ready is not
    # a reliable barrier.
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, meg, features, subjects,
        positions, pos_emb, key)
    _ = float(loss)
    params, batch_stats, opt_state, loss = chunk(
        params, batch_stats, opt_state, meg, features, subjects,
        positions, pos_emb, key)
    _ = float(loss)

    n_chunks = 3
    t0 = time.perf_counter()
    for k in range(n_chunks):
        key = jax.random.fold_in(key, k)
        params, batch_stats, opt_state, loss = chunk(
            params, batch_stats, opt_state, meg, features, subjects,
            positions, pos_emb, key)
    _ = float(loss)
    elapsed = time.perf_counter() - t0
    n_steps = n_chunks * CHUNK

    samples_per_sec = B * n_steps / elapsed

    # MFU: prefer the compiler's own flop count; fall back to the
    # analytic estimate (see _ANALYTIC_GFLOP_PER_SAMPLE derivation)
    step_flops = None
    try:
        cost = step.lower(params, batch_stats, opt_state, meg, features,
                          subjects, positions, pos_emb,
                          key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost["flops"])
    except Exception:
        pass
    flops_source = "xla_cost_analysis"
    if not step_flops or step_flops <= 0:
        step_flops = _ANALYTIC_GFLOP_PER_SAMPLE * 1e9 * B
        flops_source = "analytic_estimate"
    achieved = step_flops * n_steps / elapsed
    mfu = achieved / V5E_BF16_PEAK_FLOPS

    print(json.dumps({
        "metric": "train_step_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        # the reference publishes NO throughput numbers; this ratio is
        # against the analytic V100 ESTIMATE documented above
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
        "baseline_kind": "estimated",
        "mfu": round(mfu, 3),
        "flops_per_step": round(step_flops / 1e9, 1),
        "flops_unit": "GFLOP",
        "flops_source": flops_source,
        "step_ms": round(1e3 * elapsed / n_steps, 2),
    }))


if __name__ == "__main__":
    main()
