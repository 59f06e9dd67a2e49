"""Offline segment-retrieval eval test (run_eval_probs.py parity)."""

import numpy as np
import pandas as pd
import pytest

from brainmagick_tpu import eval as bm_eval
from brainmagick_tpu import train as bm_train

from test_solver import tiny_args


@pytest.mark.slow
def test_run_eval(tmp_cache, tmp_path):
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    solver.train()

    out_dir = tmp_path / "eval_out"
    df = bm_eval.run_eval(solver, out_dir, probs_batch_size=16)
    assert list(df.index) == [1, 5, 10]
    assert ((df.acc_segment >= 0) & (df.acc_segment <= 1)).all()
    # top-k accuracy is monotonic in k
    assert df.acc_segment.loc[10] >= df.acc_segment.loc[1]
    assert (out_dir / "probs_segment.npy").exists()
    assert (out_dir / "acc.csv").exists()
    # config + negative-pool metadata artifacts
    # (run_eval_probs.py:327-329, :370-383)
    import yaml
    with open(out_dir / "solver_config.yaml") as f:
        saved_cfg = yaml.safe_load(f)
    assert saved_cfg["optim"]["loss"] == "clip"
    assert saved_cfg["dset"]["selections"] == ["fake"]
    stats = pd.read_csv(out_dir / "negative_stats.csv", index_col=0)
    for key in ("n_test_samples", "n_test_vocab", "n_test_segments",
                "n_neg_samples", "n_neg_segments"):
        assert int(stats.loc[key].iloc[0]) >= 1, key
    probs = np.load(out_dir / "probs_segment.npy")
    # rows are probability distributions over candidate segments
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-3)
    meta = pd.read_csv(out_dir / "metadata.csv")
    assert len(meta) == probs.shape[0]
    # candidates are deduplicated by segment hash
    vocab = np.load(out_dir / "vocab_segment.npy")
    assert len(np.unique(vocab)) == len(vocab)
    assert probs.shape[1] == len(vocab)


def test_accuracy_from_probs():
    probs = np.array([[0.6, 0.3, 0.1],
                      [0.1, 0.8, 0.1],
                      [0.2, 0.3, 0.5]])
    vocab = np.array([10, 20, 30])
    targets = np.array([10, 30, 30])
    assert bm_eval.accuracy_from_probs(probs, targets, vocab, topk=1) \
        == pytest.approx(2 / 3)
    assert bm_eval.accuracy_from_probs(probs, targets, vocab, topk=2) \
        == pytest.approx(1.0)


def test_build_probs_streaming_is_exact():
    """The group-streamed, block-padded score matrix equals the naive
    [N_pred, N_true] computation (norm-scaled scores + row softmax),
    including the tail block that is zero-padded on device."""
    import types

    from brainmagick_tpu.config import MainConfig
    from brainmagick_tpu.losses import ClipLoss

    rng = np.random.RandomState(0)
    F, T = 6, 11
    preds = rng.randn(7, F, T).astype(np.float32)
    trues = rng.randn(5, F, T).astype(np.float32)  # < one 2048 block

    args = MainConfig()
    clip = ClipLoss(dset_tmin=args.dset.tmin,
                    dset_sample_rate=args.dset.sample_rate)
    solver = types.SimpleNamespace(
        args=args, clip_loss=clip, state={"params": {}})
    probs = bm_eval.build_probs(solver, preds, trues, batch_size=3)

    flat_p = preds.reshape(len(preds), -1)
    flat_t = trues.reshape(len(trues), -1)
    inv = 1 / (1e-8 + np.linalg.norm(flat_t, axis=1))
    scores = (flat_p @ flat_t.T) * inv[None, :]
    scores -= scores.max(axis=1, keepdims=True)
    want = np.exp(scores)
    want /= want.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(probs, want, rtol=1e-4, atol=1e-5)


def test_estimate_cache_prepared_scoring_matches():
    """EstimateCache-prepared chunks (bf16 cast / int8 pair) score
    identically to the in-call prep, and cache hits return the same
    device value; over-budget chunks are prepared but not retained."""
    import jax.numpy as jnp

    from brainmagick_tpu.losses import (ClipLoss, EstimateCache,
                                        block_inv_norms,
                                        retrieval_scores,
                                        retrieval_scores_int8)
    rng = np.random.RandomState(0)
    est = rng.randn(8, 4, 10).astype(np.float32)
    cand = rng.randn(6, 4, 10).astype(np.float32)
    clip16 = ClipLoss(dset_tmin=-0.5, dset_sample_rate=120.,
                      compute_dtype="bfloat16")

    block16 = jnp.asarray(cand).astype(jnp.bfloat16)
    inv = block_inv_norms(block16)
    direct = retrieval_scores(clip16, {}, jnp.asarray(est), block16,
                              inv_norms=inv)
    cache = EstimateCache(clip16, use_int8=False, row_sharding=None)
    prep = cache.get(0, lambda: est)
    assert prep.dtype == jnp.bfloat16
    cached = retrieval_scores(clip16, {}, prep, block16, inv_norms=inv)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(cached))
    # cache hit: the thunk must not be called again
    assert cache.get(0, lambda: 1 / 0) is prep

    # int8: prequantized (e_q, s_e) pair == in-call row quantization
    from brainmagick_tpu.losses import _int8_quantize_rows
    q, _ = _int8_quantize_rows(jnp.asarray(cand).reshape(6, -1))
    cand_q = q.reshape(6, 4, 10)
    direct8 = retrieval_scores_int8(jnp.asarray(est), cand_q)
    cache8 = EstimateCache(clip16, use_int8=True, row_sharding=None)
    prep8 = cache8.get(0, lambda: est)
    assert isinstance(prep8, tuple) and prep8[0].dtype == jnp.int8
    cached8 = retrieval_scores_int8(prep8, cand_q)
    np.testing.assert_array_equal(np.asarray(direct8), np.asarray(cached8))

    # over budget: prepared (cast applied) but not retained
    tiny = EstimateCache(clip16, use_int8=False, row_sharding=None,
                         budget_bytes=1)
    p = tiny.get(0, lambda: est)
    assert p.dtype == jnp.bfloat16
    assert 0 not in tiny._cache
