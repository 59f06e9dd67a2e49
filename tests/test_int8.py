"""int8-quantized retrieval scoring (test.pool_int8 extension).

The reference has no equivalent — this is the TPU-native fast path for
the WER/offline-eval candidate pools (v5e int8 MXU at 2x the bf16 rate,
half the pool stream). Tests pin the quantization math, its agreement
with the fp32 scores, and end-to-end WER/eval parity on the fake study.
"""

import numpy as np
import pytest

from brainmagick_tpu import train as bm_train
from brainmagick_tpu.losses import (ClipLoss, _int8_quantize_rows,
                                    candidate_blocks, int8_retrieval_ok,
                                    own_scores_int8, retrieval_scores,
                                    retrieval_scores_int8)

from test_solver import tiny_args


def test_candidate_blocks_int8_layout():
    rng = np.random.RandomState(0)
    pool = rng.randn(5, 3, 7).astype(np.float32) * 3.0
    blocks = candidate_blocks(pool, compute_dtype=None, block_size=4,
                              int8=True)
    assert len(blocks) == 2
    assert all(b.dtype == np.int8 and b.shape == (4, 3, 7) for b in blocks)
    # per-candidate symmetric: every real row uses the full int8 range
    for bi, lo in enumerate(range(0, 5, 4)):
        real = min(4, 5 - lo)
        q = blocks[bi][:real].reshape(real, -1)
        assert (np.abs(q).max(axis=1) == 127).all()
        # dequantized rows reproduce the original within half a step
        scale = np.abs(pool[lo:lo + real].reshape(real, -1)).max(axis=1) / 127
        np.testing.assert_allclose(q * scale[:, None],
                                   pool[lo:lo + real].reshape(real, -1),
                                   atol=(scale.max() / 2) + 1e-7)
    # zero padding rows stay zero
    assert (blocks[1][1:] == 0).all()


def test_int8_scores_close_to_fp32_and_rank_exact():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    B, F, T = 16, 12, 23
    # candidates = noisy copies of the estimates -> self-retrieval must
    # survive quantization (top-1 exact), plus distractor rows
    est = rng.randn(B, F, T).astype(np.float32)
    cands = np.concatenate(
        [est + 0.05 * rng.randn(B, F, T).astype(np.float32),
         rng.randn(2 * B, F, T).astype(np.float32)])

    clip = ClipLoss(dset_tmin=-0.5, dset_sample_rate=10.)
    assert int8_retrieval_ok(clip)
    params = {"params": {}}
    ref = np.asarray(retrieval_scores(clip, params, jnp.asarray(est),
                                      jnp.asarray(cands)))
    (blk,) = candidate_blocks(cands, None, block_size=len(cands), int8=True)
    got = np.asarray(retrieval_scores_int8(jnp.asarray(est),
                                           jnp.asarray(blk)))
    # zero-mean quantization noise, small against the score spread
    err = np.abs(got - ref)
    assert err.max() < 0.05 * ref.std()
    np.testing.assert_array_equal(got.argmax(axis=1), ref.argmax(axis=1))
    np.testing.assert_array_equal(got.argmax(axis=1), np.arange(B))


def test_own_scores_int8_matches_full_matrix_diagonal():
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    est = jnp.asarray(rng.randn(6, 4, 9).astype(np.float32))
    own = rng.randn(6, 4, 9).astype(np.float32)
    q, _ = _int8_quantize_rows(jnp.asarray(own.reshape(6, -1)))
    full = np.asarray(retrieval_scores_int8(est, q))
    diag = np.asarray(own_scores_int8(est, jnp.asarray(own)))
    np.testing.assert_allclose(diag, np.diagonal(full), rtol=1e-5,
                               atol=1e-6)


def test_int8_k_chunking_no_overflow():
    """A fully-correlated max-magnitude pair would overflow a single
    int32 accumulator at large K; the chunked contraction must not."""
    import jax.numpy as jnp

    K = 300_000  # 127*127*K ~ 4.8e9 > 2^31
    ones = np.ones((1, K), dtype=np.float32)
    got = np.asarray(retrieval_scores_int8(
        jnp.asarray(ones.reshape(1, 1, K)),
        jnp.asarray((127 * ones).astype(np.int8).reshape(1, 1, K))))
    # score = est . q / ||q|| = sum(127)/sqrt(K*127^2) = sqrt(K)
    np.testing.assert_allclose(got[0, 0], np.sqrt(K), rtol=1e-4)


def test_int8_retrieval_ok_gating():
    assert int8_retrieval_ok(ClipLoss(dset_tmin=-0.5, dset_sample_rate=10.))
    assert not int8_retrieval_ok(ClipLoss(pool=True, dset_tmin=-0.5,
                                          dset_sample_rate=10.))
    assert not int8_retrieval_ok(ClipLoss(tmin=0.0, dset_tmin=-0.5,
                                          dset_sample_rate=10.))


def test_build_probs_int8_close_to_fp32():
    import types

    from brainmagick_tpu import eval as bm_eval
    from brainmagick_tpu.config import MainConfig

    rng = np.random.RandomState(3)
    F, T = 6, 11
    preds = rng.randn(7, F, T).astype(np.float32)
    trues = rng.randn(5, F, T).astype(np.float32)

    args = MainConfig()
    clip = ClipLoss(dset_tmin=args.dset.tmin,
                    dset_sample_rate=args.dset.sample_rate)
    solver = types.SimpleNamespace(
        args=args, clip_loss=clip, state={"params": {}})
    ref = bm_eval.build_probs(solver, preds, trues, batch_size=3)
    args.test.pool_int8 = True
    got = bm_eval.build_probs(solver, preds, trues, batch_size=3)
    np.testing.assert_allclose(got, ref, atol=0.02)
    np.testing.assert_array_equal(got.argmax(axis=1), ref.argmax(axis=1))


@pytest.mark.slow
def test_get_wer_int8_matches_fp32(tmp_cache, tmp_path):
    """End-to-end WER on the fake study: the int8 pool path reproduces
    the fp32 metrics within quantization noise."""
    from brainmagick_tpu.wer import get_wer

    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    ref = get_wer(solver)
    solver.args.test.pool_int8 = True
    got = get_wer(solver)
    assert set(got) == set(ref)
    for key in ref:
        assert got[key] == pytest.approx(ref[key], abs=0.05), key
