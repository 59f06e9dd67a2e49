"""Data-parallel training on the virtual 8-device CPU mesh (the
reference has no multi-device tests at all — SURVEY.md §4)."""

import numpy as np
import pytest

from brainmagick_tpu import train as bm_train
from brainmagick_tpu.parallel import make_mesh

from test_solver import tiny_args


@pytest.mark.slow
def test_sharded_training_matches_semantics(tmp_cache, tmp_path):
    import jax
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8  # 1 per device
    solver = bm_train.get_solver(args)
    solver.set_mesh(make_mesh(8))
    best = solver.train()
    assert np.isfinite(best)
    assert len(solver.history) == 1
    assert np.isfinite(solver.history[0]["train"]["loss"])
    # test stage (WER) ran on the mesh-trained weights
    assert "test" in solver.history[0]


@pytest.mark.slow
def test_mesh_equals_single_device_eval(tmp_cache, tmp_path):
    """The sharded eval loss (local negatives per shard of 4) differs
    from global-softmax loss by construction, but both must be finite
    and the forward pass identical for B=4 on 4 devices vs 1 device."""
    import jax

    args = tiny_args(tmp_cache, tmp_path, loss="mse",
                     features=("WordLength",), epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)

    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    import jax.numpy as jnp
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)

    step1 = solver._build_step(False, False, False)
    _, m1 = step1(solver.state, arrays, solver.norm_arrays, pw, None,
                  None, rng)

    solver.set_mesh(make_mesh(4))
    step4 = solver._build_step(False, False, False)
    _, m4 = step4(solver.state, arrays, solver.norm_arrays, pw, None,
                  None, rng)
    # masked MSE is a weighted mean; pmean of per-shard means == global
    # mean when shards have equal weight counts — allow small tolerance
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=0.1)
    assert int(m1["count"]) == int(m4["count"])


@pytest.mark.slow
def test_global_negatives_match_single_device(tmp_cache, tmp_path):
    """parallel.negatives_group_size=0: all_gathered candidates make the
    sharded CLIP loss exactly equal the single-device global softmax."""
    import jax
    import jax.numpy as jnp

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)

    step1 = solver._build_step(False, False, False)
    _, m1 = step1(solver.state, arrays, solver.norm_arrays, pw, None,
                  None, rng)

    solver.args.parallel.negatives_group_size = 0
    solver.set_mesh(make_mesh(4))
    step4 = solver._build_step(False, False, False)
    _, m4 = step4(solver.state, arrays, solver.norm_arrays, pw, None,
                  None, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=2e-3)

    # per-shard (default) negatives give a DIFFERENT (smaller) loss
    solver.args.parallel.negatives_group_size = 1
    solver._jit_cache.clear()
    step_local = solver._build_step(False, False, False)
    _, m_local = step_local(solver.state, arrays, solver.norm_arrays, pw,
                            None, None, rng)
    assert float(m_local["loss"]) < float(m4["loss"])


@pytest.mark.slow
def test_group_negatives_reproduce_smaller_mesh(tmp_cache, tmp_path):
    """parallel.negatives_group_size=k: an 8-device mesh with groups of
    4 must reproduce the 2-device local-pool loss exactly — the VERDICT
    round-1 gap (group sizes between 1 and D silently behaved as 1)."""
    import jax
    import jax.numpy as jnp

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)

    # 2-device mesh, fully local pools: each shard's CLIP softmax runs
    # over its 4 local candidates
    solver.set_mesh(make_mesh(2))
    solver.args.parallel.negatives_group_size = 1
    _, m2 = solver._build_step(False, False, False)(
        solver.state, arrays, solver.norm_arrays, pw, None, None, rng)

    # 8-device mesh, groups of 4: each group's gathered pool is the same
    # 4 candidates -> identical loss
    solver.set_mesh(make_mesh(8))
    solver.args.parallel.negatives_group_size = 4
    _, m8 = solver._build_step(False, False, False)(
        solver.state, arrays, solver.norm_arrays, pw, None, None, rng)
    np.testing.assert_allclose(float(m2["loss"]), float(m8["loss"]),
                               rtol=2e-3)

    # group sizes that do not divide the mesh are rejected, not ignored
    solver.args.parallel.negatives_group_size = 3
    solver._jit_cache.clear()
    with pytest.raises(AssertionError):
        solver._build_step(False, False, False)(
            solver.state, arrays, solver.norm_arrays, pw, None, None, rng)


@pytest.mark.slow
def test_sampled_negatives_replicated_per_shard(tmp_cache, tmp_path):
    """Pool-sampled negatives must be replicated to every shard (each
    reference GPU tops up to the FULL optim.negatives,
    bm/solver.py:363-368) — not split P(axis) over the mesh. With global
    gather + identical extras, the sharded loss must equal the
    single-device loss on batch+extras."""
    import jax
    import jax.numpy as jnp

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)

    # hand-built extra negatives: 6 rows, all valid
    out_t = solver._output_time(arrays["features"].shape[-1])
    out_d = solver._output_dim(arrays["features"].shape[1])
    rs = np.random.RandomState(3)
    negs = jnp.asarray(rs.randn(6, out_d, out_t).astype(np.float32))
    negw = jnp.ones(6, dtype=np.float32)

    _, m1 = solver._build_step(False, True, True)(
        solver.state, arrays, solver.norm_arrays, pw, negs, negw, rng)

    solver.set_mesh(make_mesh(4))
    solver.args.parallel.negatives_group_size = 0
    _, m4 = solver._build_step(False, True, True)(
        solver.state, arrays, solver.norm_arrays, pw, negs, negw, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=2e-3)
    # pooled outputs come back at full global batch for the pool update
    assert m4["output"].shape[0] == 8

    # per-group candidate accounting: a 4-device mesh with groups of 2
    # sees 2*(8/4)=4 in-batch candidates per shard -> top-up of
    # n_neg-4 rows
    solver.args.parallel.negatives_group_size = 2
    assert solver._effective_candidates(8) == 4
    solver.args.parallel.negatives_group_size = 1
    assert solver._effective_candidates(8) == 2
    solver.args.parallel.negatives_group_size = 0
    assert solver._effective_candidates(8) == 8


def test_shard_array_and_replicate_specs(tmp_cache, tmp_path):
    """Input arrays commit to the mesh with the intended shardings (the
    per-host input pipeline entry point, SURVEY.md §2.4)."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from brainmagick_tpu.parallel import (make_mesh, replicate,
                                          shard_array, shard_batch)

    mesh = make_mesh(8)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = shard_array(x, mesh)
    assert sharded.sharding.spec == P("data")
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)

    batch = shard_batch({"meg": x, "subject_index": np.arange(16)}, mesh)
    assert all(v.sharding.spec == P("data") for v in batch.values())

    rep = replicate({"w": np.ones(3)}, mesh)
    assert rep["w"].sharding.spec == P()
    assert len(rep["w"].sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_training_with_negative_pool(tmp_cache, tmp_path):
    """Full mesh training with optim.negatives: pool top-ups replicate
    to every shard through the epoch loop (round-2 wiring)."""
    args = tiny_args(tmp_cache, tmp_path, epochs=2)
    args.optim.batch_size = 8
    args.optim.negatives = 16
    solver = bm_train.get_solver(args)
    solver.set_mesh(make_mesh(4))
    solver.args.parallel.negatives_group_size = 2
    best = solver.train()
    assert np.isfinite(best)
    pool = solver.negative_pool["train"]
    assert pool is not None and len(pool) > 0
    # pooled outputs were gathered at the GLOBAL batch size
    assert pool.shape[1:] == (8, 139)  # (n_mels, T - offset samples)


@pytest.mark.slow
def test_mesh_parallel_test_stage_equals_single_device(tmp_cache,
                                                       tmp_path):
    """VERDICT r2 #1: the whole test stage — forward passes, WER
    scoring, offline-eval prob matrix — runs through the jitted
    mesh-sharded path, and an 8-device mesh reproduces the
    single-device results."""
    from brainmagick_tpu import eval as bm_eval
    from brainmagick_tpu.wer import get_wer

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)

    # forward equality on one batch (test batches carry the extra
    # WordHash channel; the model sees the used features only)
    batch, pad_weight = next(iter(solver.loaders["test"]))
    test_features = solver.datasets.test.datasets[0].features
    feats = test_features.extract_features(
        batch.features, list(solver.used_features.keys()))
    batch = batch.replace(features=feats)
    ref = solver.forward_batch(batch, pad_weight)
    w1 = get_wer(solver)
    data1 = bm_eval.load_test_data(solver)
    probs1 = bm_eval.build_probs(solver, data1["preds"], data1["trues"])

    solver.set_mesh(make_mesh(8))
    got = solver.forward_batch(batch, pad_weight)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g, dtype=np.float64),
                                   np.asarray(r, dtype=np.float64),
                                   atol=2e-5, rtol=2e-5)
    w8 = get_wer(solver)
    data8 = bm_eval.load_test_data(solver)
    probs8 = bm_eval.build_probs(solver, data8["preds"], data8["trues"])

    assert set(w8) == {"wer", "wer_vocab", "wer_n_vocab"}
    for key in w1:
        np.testing.assert_allclose(w8[key], w1[key], atol=1e-4)
    np.testing.assert_allclose(probs8, probs1, atol=1e-4)


@pytest.mark.slow
def test_mesh_parallel_streaming_metrics(tmp_cache, tmp_path):
    """get_test_metrics routes through the sharded forward: mesh ==
    single device for the per-recording correlation metrics."""
    from brainmagick_tpu.play import get_test_metrics

    args = tiny_args(tmp_cache, tmp_path, loss="mse",
                     features=("WordLength",), epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    m1 = get_test_metrics(solver)
    solver.set_mesh(make_mesh(8))
    m8 = get_test_metrics(solver)
    assert set(m1) == set(m8)
    for key in m1:
        np.testing.assert_allclose(m8[key], m1[key], atol=1e-5,
                                   rtol=1e-5)


def test_ring_scores_matches_streamed():
    """Ring-pass scoring (pool sharded + rotated over the ICI ring,
    losses.ring_scores) equals the replicated-block fast path
    (losses.retrieval_scores) exactly — including the internal padding
    when neither rows nor pool divide the mesh."""
    import jax
    from brainmagick_tpu.losses import ClipLoss, retrieval_scores, \
        ring_scores

    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    n, p, c, t = 13, 21, 4, 6  # neither divides 8 -> padding path
    est = rng.randn(n, c, t).astype(np.float32)
    pool = rng.randn(p, c, t).astype(np.float32)

    for cd in (None, "bfloat16"):
        clip = ClipLoss(compute_dtype=cd)
        ref = np.asarray(retrieval_scores(
            clip, {"params": {}},
            est.astype(cd) if cd else est,
            pool.astype(cd) if cd else pool))
        got = np.asarray(ring_scores(mesh, est, pool, cd))[:n, :p]
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_maybe_ring_scores_dispatch():
    """The dispatcher engages only for the qualifying configuration:
    flag on, single-process multi-device mesh, fast-path clip, no
    int8."""
    import types

    from brainmagick_tpu.config import ParallelConfig
    from brainmagick_tpu.losses import ClipLoss, maybe_ring_scores

    rng = np.random.RandomState(1)
    est = rng.randn(6, 3, 4).astype(np.float32)
    pool = rng.randn(9, 3, 4).astype(np.float32)
    clip = ClipLoss()

    def fake_solver(flag, mesh):
        args = types.SimpleNamespace(parallel=ParallelConfig(
            ring_scoring=flag))
        return types.SimpleNamespace(args=args, mesh=mesh)

    mesh = make_mesh(8)
    assert maybe_ring_scores(fake_solver(False, mesh), clip, False,
                             est, pool) is None  # flag off
    assert maybe_ring_scores(fake_solver(True, None), clip, False,
                             est, pool) is None  # no mesh
    assert maybe_ring_scores(fake_solver(True, mesh), clip, True,
                             est, pool) is None  # int8 pool
    trimmed = ClipLoss(tmin=0.0)  # not the fast path
    assert maybe_ring_scores(fake_solver(True, mesh), trimmed, False,
                             est, pool) is None
    out = maybe_ring_scores(fake_solver(True, mesh), clip, False,
                            est, pool)
    assert out is not None and out.shape == (6, 9)


@pytest.mark.slow
def test_ring_scoring_wer_and_probs_match_streamed(tmp_cache, tmp_path):
    """parallel.ring_scoring=True reproduces the streamed WER and
    offline-eval prob matrix on the 8-device mesh."""
    from brainmagick_tpu import eval as bm_eval
    from brainmagick_tpu.wer import get_wer

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    solver.set_mesh(make_mesh(8))

    w_stream = get_wer(solver)
    data = bm_eval.load_test_data(solver)
    probs_stream = bm_eval.build_probs(solver, data["preds"],
                                       data["trues"])

    solver.args.parallel.ring_scoring = True
    w_ring = get_wer(solver)
    probs_ring = bm_eval.build_probs(solver, data["preds"],
                                     data["trues"])

    for key in w_stream:
        np.testing.assert_allclose(w_ring[key], w_stream[key],
                                   atol=1e-5)
    np.testing.assert_allclose(probs_ring, probs_stream, atol=1e-5,
                               rtol=1e-5)


@pytest.mark.slow
def test_ring_negatives_match_all_gather(tmp_cache, tmp_path):
    """parallel.ring_negatives: the ring-gathered CLIP loss (candidate
    blocks rotated over the ICI ring, solver._ring_clip_loss) equals
    the all_gather branch — loss for groups of 4 and global (k=0), and
    GRADIENTS via one adam train step with sampled negatives."""
    import jax
    import jax.numpy as jnp

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 8
    solver = bm_train.get_solver(args)
    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)
    solver.set_mesh(make_mesh(8))

    for k in (4, 0):
        solver.args.parallel.negatives_group_size = k
        solver.args.parallel.ring_negatives = False
        _, m_ag = solver._build_step(False, False, False)(
            solver.state, arrays, solver.norm_arrays, pw, None, None,
            rng)
        solver.args.parallel.ring_negatives = True
        _, m_ring = solver._build_step(False, False, False)(
            solver.state, arrays, solver.norm_arrays, pw, None, None,
            rng)
        np.testing.assert_allclose(float(m_ring["loss"]),
                                   float(m_ag["loss"]), rtol=1e-6)

    # gradient equality with sampled negatives: jax.grad through the
    # sharded eval step (adam-updated params would amplify fp
    # reduction-order noise on near-zero grads into +-2*lr sign flips)
    solver.args.parallel.negatives_group_size = 4
    n_extra = 4
    feat_shape = arrays["features"].shape
    negs = np.random.RandomState(3).randn(
        n_extra, solver._output_dim(feat_shape[1]),
        solver._output_time(feat_shape[-1])).astype(np.float32)
    nw = np.ones(n_extra, dtype=np.float32)
    from brainmagick_tpu.parallel import replicate
    negs_j = replicate(jnp.asarray(negs), solver.mesh)
    nw_j = replicate(jnp.asarray(nw), solver.mesh)

    def grads_and_loss(ring):
        solver.args.parallel.ring_negatives = ring
        step = solver._build_step(False, True, False)

        def loss_of(params):
            state = dict(solver.state)
            state["params"] = params
            _, metrics = step(state, dict(arrays), solver.norm_arrays,
                              pw, negs_j, nw_j, rng)
            return metrics["loss"]

        loss, grads = jax.value_and_grad(loss_of)(solver.state["params"])
        return float(loss), jax.tree_util.tree_map(np.asarray, grads)

    l_ag, g_ag = grads_and_loss(False)
    l_ring, g_ring = grads_and_loss(True)
    np.testing.assert_allclose(l_ring, l_ag, rtol=1e-6)
    flat_ag = jax.tree_util.tree_leaves_with_path(g_ag)
    flat_ring = dict(jax.tree_util.tree_leaves_with_path(g_ring))
    assert flat_ag and len(flat_ag) == len(flat_ring)
    for path, leaf in flat_ag:
        np.testing.assert_allclose(
            flat_ring[path], leaf, atol=1e-6, rtol=1e-4,
            err_msg=str(path))


@pytest.mark.slow
def test_v5e8_paper_preset_reproduces_reference_pools(tmp_cache,
                                                      tmp_path):
    """The clip_conv_v5e8_paper preset's group structure (8 chips,
    groups of 4, ring-gathered) rebuilds the reference's two
    half-global contrastive pools (global 256 on 2 GPUs,
    /root/reference/README.md:139-143) — verified at the preset's
    group geometry on the CPU mesh: 8 devices x groups-of-4 ==
    2 devices x local pools, with ring_negatives on."""
    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.config import MainConfig, apply_preset

    preset = apply_preset(MainConfig(), "clip_conv_v5e8_paper")
    assert preset.optim.batch_size == 256
    assert preset.parallel.negatives_group_size == 4
    assert preset.parallel.ring_negatives
    weak = apply_preset(MainConfig(), "clip_conv_v5e8")
    assert weak.optim.batch_size == 2048
    assert weak.parallel.negatives_group_size == 1

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    args.optim.batch_size = 32  # local 4/chip on 8 devices, like 32/chip
    args.parallel.ring_negatives = preset.parallel.ring_negatives
    solver = bm_train.get_solver(args)
    batch, pad_weight = next(iter(solver.loaders["valid"]))
    arrays = batch.to_device()
    pw = jnp.asarray(pad_weight)
    rng = jax.random.PRNGKey(0)

    # the reference geometry: 2 devices, each a half-global local pool
    solver.set_mesh(make_mesh(2))
    solver.args.parallel.negatives_group_size = 1
    _, m2 = solver._build_step(False, False, False)(
        solver.state, arrays, solver.norm_arrays, pw, None, None, rng)

    # the preset geometry: 8 devices, ring-gathered groups of 4
    solver.set_mesh(make_mesh(8))
    solver.args.parallel.negatives_group_size = \
        preset.parallel.negatives_group_size
    _, m8 = solver._build_step(False, False, False)(
        solver.state, arrays, solver.norm_arrays, pw, None, None, rng)
    np.testing.assert_allclose(float(m2["loss"]), float(m8["loss"]),
                               rtol=2e-3)


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Persistent-compile-cache wiring: directory resolution order and
    actual cache writes on a jitted compile (min_compile_time=0 so the
    instant CPU compile qualifies)."""
    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.env import env
    from brainmagick_tpu.parallel import enable_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    # the persistent cache is a lazily-initialized process singleton:
    # if an earlier test compiled with a cache dir set, changing the
    # config dir would not redirect writes — reset it first
    from jax._src import compilation_cache as _cc
    if hasattr(_cc, "reset_cache"):
        _cc.reset_cache()
    try:
        # resolution: explicit arg wins
        explicit = enable_compilation_cache(tmp_path / "explicit")
        assert explicit == tmp_path / "explicit" and explicit.is_dir()
        # resolution: BM_TPU_XLA_CACHE env var
        monkeypatch.setenv("BM_TPU_XLA_CACHE", str(tmp_path / "envvar"))
        assert enable_compilation_cache() == tmp_path / "envvar"
        monkeypatch.delenv("BM_TPU_XLA_CACHE")
        # resolution: next to the data caches
        with env.temporary(cache=tmp_path / "datacache"):
            assert enable_compilation_cache() == \
                tmp_path / "datacache" / "xla"

        target = enable_compilation_cache(tmp_path / "xla",
                                          min_compile_time_secs=0.0)

        @jax.jit
        def f(x):
            return jnp.sin(x) * 2.0 + jnp.tanh(x)

        f(jnp.arange(8, dtype=jnp.float32)).block_until_ready()
        assert any(target.iterdir()), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_compilation_cache_config_knob():
    from brainmagick_tpu.config import MainConfig
    assert MainConfig().parallel.compilation_cache is True
