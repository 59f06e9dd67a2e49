"""Micro-parity tests for the WER machinery and CLIP trim windows."""

import numpy as np
import pytest

from brainmagick_tpu.wer import _lookup_word_hash


def test_word_hash_neighbor_fallback():
    # hash at the check index, neighbors fill zeros (bm/wer.py:56-65)
    wh = np.array([
        [0, 0, 5, 0, 0],   # direct hit at check_at=2
        [0, 7, 0, 0, 0],   # fallback -1
        [0, 0, 0, 9, 0],   # fallback +1
        [3, 0, 0, 0, 0],   # fallback -2
        [0, 0, 0, 0, 4],   # fallback +2
    ])
    out = _lookup_word_hash(wh, check_at=2)
    np.testing.assert_array_equal(out, [5, 7, 9, 3, 4])


def test_word_hash_missing_raises():
    wh = np.zeros((1, 5), dtype=np.int64)
    with pytest.raises(AssertionError):
        _lookup_word_hash(wh, check_at=2)


def test_clip_trim_window():
    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.losses import ClipLoss

    # dset window [-0.5, 2.5] @ 10Hz -> 31 samples; clip window [0, 1]
    # must score only samples 5..15
    clip = ClipLoss(tmin=0.0, tmax=1.0, dset_tmin=-0.5,
                    dset_sample_rate=10.)
    rng = np.random.RandomState(0)
    est = rng.randn(3, 4, 31).astype(np.float32)
    cand = np.array(est)
    # corrupt everything OUTSIDE the scoring window of candidate 0:
    # scores must be unaffected
    cand2 = np.array(cand)
    cand2[0, :, :5] += 100.
    cand2[0, :, 15:] += 100.
    variables = clip.init(jax.random.PRNGKey(0), jnp.asarray(est),
                          jnp.asarray(cand), method=clip.get_scores)
    s1 = clip.apply(variables, jnp.asarray(est), jnp.asarray(cand),
                    method=clip.get_scores)
    s2 = clip.apply(variables, jnp.asarray(est), jnp.asarray(cand2),
                    method=clip.get_scores)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    # corrupting INSIDE the window changes scores
    cand3 = np.array(cand)
    cand3[0, :, 7] += 100.
    s3 = clip.apply(variables, jnp.asarray(est), jnp.asarray(cand3),
                    method=clip.get_scores)
    assert np.abs(np.asarray(s3) - np.asarray(s1)).max() > 1e-3


def test_clip_train_window_differs():
    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.losses import ClipLoss

    clip = ClipLoss(tmin_train=0.0, tmax_train=1.0, dset_tmin=-0.5,
                    dset_sample_rate=10.)
    rng = np.random.RandomState(0)
    est = jnp.asarray(rng.randn(2, 3, 31).astype(np.float32))
    variables = clip.init(jax.random.PRNGKey(0), est, est,
                          method=clip.get_scores)
    eval_loss = clip.apply(variables, est, est)                # full window
    train_loss = clip.apply(variables, est, est, train=True)   # trimmed
    assert not np.isclose(float(eval_loss), float(train_loss))
