"""Tests for utils, cache, env, dsp kernels and the fake study."""

import numpy as np
import pytest

from brainmagick_tpu.utils import Frequency, roundrobin, flatten_dict
from brainmagick_tpu.cache import Cache, MemoryCache, signature


def test_frequency():
    f = Frequency(120.0)
    assert f.to_ind(1.0) == 120
    assert f.to_ind(0.5) == 60
    assert f.to_sec(60) == pytest.approx(0.5)
    arr = f.to_ind(np.array([0.0, 1.0, 2.004]))
    assert arr.tolist() == [0, 120, 240]


def test_roundrobin():
    assert list(roundrobin("ABC", "D", "EF")) == list("ADEBFC")


def test_flatten_dict():
    assert flatten_dict({"a": {"x": 1}, "b": {"y": 2}}) == {"a/x": 1, "b/y": 2}


def test_signature_deterministic():
    assert signature({"b": 2, "a": 1}) == signature({"a": 1, "b": 2})
    assert signature([1, 2]) != signature([2, 1])


def test_cache_roundtrip(tmp_cache):
    calls = []

    def compute(x=1):
        calls.append(x)
        return {"value": x * 2}

    cache = Cache("test", args={"v": 1})
    assert cache.get(compute, x=3) == {"value": 6}
    assert cache.get(compute, x=3) == {"value": 6}
    assert calls == [3]  # second call served from disk


def test_cache_memmap(tmp_cache):
    def compute():
        return np.arange(10, dtype=np.float32)

    cache = Cache("test_mm", args=None, mode="memmap")
    a = cache.get(compute)
    b = cache.get(compute)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(b, np.memmap)


def test_memory_cache():
    calls = []

    def compute(x):
        calls.append(x)
        return x + 1

    mc = MemoryCache("m", args=0)
    assert mc.get(compute, 1) == 2
    assert mc.get(compute, 1) == 2
    assert calls == [1]


class TestDsp:
    def test_resample_sine(self):
        import jax.numpy as jnp
        from brainmagick_tpu.ops import dsp

        sr_in, sr_out = 1200, 120
        t = np.arange(sr_in * 2) / sr_in
        x = np.sin(2 * np.pi * 5.0 * t).astype(np.float32)  # 5 Hz, well below Nyquist
        y = np.asarray(dsp.resample(jnp.asarray(x)[None], sr_in, sr_out))[0]
        assert y.shape[-1] == sr_out * 2
        t_out = np.arange(len(y)) / sr_out
        expected = np.sin(2 * np.pi * 5.0 * t_out)
        # interior matches closely; edges have windowing effects
        sl = slice(10, -10)
        assert np.abs(y[sl] - expected[sl]).max() < 1e-3

    def test_resample_matches_scipy_polyphase(self):
        import jax.numpy as jnp
        from scipy.signal import resample_poly
        from brainmagick_tpu.ops import dsp

        rng = np.random.RandomState(0)
        x = rng.randn(3, 1200 * 3).astype(np.float32)
        # band-limit well below the output Nyquist: near-cutoff behavior
        # legitimately differs between window designs
        from scipy.signal import firwin, lfilter
        fir = firwin(255, 40.0, fs=1200)
        x = lfilter(fir, [1.0], x, axis=-1).astype(np.float32)
        y = np.asarray(dsp.resample(jnp.asarray(x), 1200, 120))
        ref = resample_poly(x, 120, 1200, axis=-1)
        sl = slice(20, -20)
        err = np.abs(y[:, sl] - ref[:, sl]).max()
        assert err < 0.02
        corr = np.corrcoef(y[:, sl].ravel(), ref[:, sl].ravel())[0, 1]
        assert corr > 0.9999

    def test_lowpass_removes_high_freq(self):
        import jax.numpy as jnp
        from brainmagick_tpu.ops import dsp

        sr = 120
        t = np.arange(sr * 4) / sr
        low = np.sin(2 * np.pi * 2.0 * t)
        high = np.sin(2 * np.pi * 40.0 * t)
        x = (low + high).astype(np.float32)
        y = np.asarray(dsp.lowpass_filter(jnp.asarray(x)[None], 10.0 / sr))[0]
        sl = slice(30, -30)
        assert np.abs(y[sl] - low[sl]).max() < 0.05

    def test_highpass_dc_removal(self):
        import jax.numpy as jnp
        from brainmagick_tpu.ops import dsp

        x = np.full((1, 2000), 3.0, dtype=np.float32)
        y = np.asarray(dsp.highpass_filter(jnp.asarray(x), 0.01))
        # julius zero-pads, so the first/last half_size=400 samples dip
        # (bm/studies/api.py:355-356 inherits the same boundary); the
        # interior must cancel exactly
        assert np.abs(y[:, 450:-450]).max() < 1e-3


class TestFakeStudy:
    def test_iter_and_raw(self, tmp_cache):
        from brainmagick_tpu import studies

        recs = list(studies.register["fake"].iter())
        assert len(recs) == 4
        raw = recs[0].raw()
        assert raw.data.shape == (273, 99_999)
        assert raw.sample_rate == 1200
        assert raw.positions.shape == (273, 2)
        assert (raw.positions >= 0).all() and (raw.positions <= 1).all()

    def test_preprocessed_cached(self, tmp_cache):
        from brainmagick_tpu import studies

        rec = next(studies.register["fake"].iter())
        pre = rec.preprocessed(120)
        assert pre.sample_rate == 120
        assert pre.data.shape[0] == 273
        assert abs(pre.data.shape[1] - 10_000) <= 1
        # second load comes from the on-disk memmap
        rec2 = next(studies.register["fake"].iter())
        pre2 = rec2.preprocessed(120)
        np.testing.assert_allclose(np.asarray(pre.data),
                                   np.asarray(pre2.data), atol=1e-6)

    def test_preprocessed_cache_versioned_by_dsp(self, tmp_cache):
        """The on-disk name embeds ops.dsp.DSP_VERSION: a DSP numerics
        change (e.g. the round-4 padding/length switch to julius
        parity) must invalidate stale preprocessed raws, not reuse
        arrays computed with the old convention."""
        from pathlib import Path

        from brainmagick_tpu import studies
        from brainmagick_tpu.ops.dsp import DSP_VERSION

        rec = next(studies.register["fake"].iter())
        rec.preprocessed(120)
        hits = list(Path(tmp_cache).rglob("meg-sr120-*.npy"))
        assert hits, "preprocessed raw was not cached"
        assert all(f"dsp{DSP_VERSION}" in p.name for p in hits), hits

    def test_events(self, tmp_cache):
        from brainmagick_tpu import studies

        rec = next(studies.register["fake"].iter())
        events = rec.events()
        assert {"word", "phoneme", "sound", "block"} <= set(events.kind)
        # cached csv roundtrip
        rec2 = next(studies.register["fake"].iter())
        events2 = rec2.events()
        assert len(events) == len(events2)

    def test_contamination_guard(self, tmp_path):
        # NOTE: the test name must not contain 'fake_cache' — pytest names
        # tmp_path after the test, which would defeat the guard.
        from brainmagick_tpu.env import env
        from brainmagick_tpu.studies.fake import FakeRecording

        bad = tmp_path / "not_fake"
        bad.mkdir()
        with env.temporary(cache=bad):
            with pytest.raises(RuntimeError):
                FakeRecording("0")


def test_plot_events(tmp_cache):
    """Event timeline plot renders (bm/test_events.py plot coverage)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from brainmagick_tpu.studies.fake import make_fake_events

    events = make_fake_events(total_duration=20, seed=1)
    fig, ax = events.event.plot(print_summary=False)
    assert fig is not None and ax is not None
    plt.close(fig)


def test_list_selections():
    from brainmagick_tpu.studies import api

    sels = api.list_selections()
    names = [cls.study_name() for cls, _ in sels]
    assert "gwilliams2022" in names and "schoffelen2019" in names
    assert "fake" not in names and "fakeeeg" not in names


def test_driver_entrypoints_importable():
    """bench.py and __graft_entry__.py must at least import cleanly —
    the driver runs them unattended."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).parent.parent
    for name in ("bench", "__graft_entry__"):
        spec = importlib.util.spec_from_file_location(
            f"_smoke_{name}", root / f"{name}.py")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        assert hasattr(module, "main") or hasattr(module, "entry")


def test_clip_conv_tpu_preset():
    """The TPU-tuned paper preset layers the measured v5e execution
    knobs on top of the reference recipe without touching the
    reference preset itself."""
    from brainmagick_tpu.config import MainConfig, apply_preset

    tpu = MainConfig()
    apply_preset(tpu, "clip_conv_tpu")
    assert tpu.simpleconv["hidden"] == 320          # paper recipe kept
    assert tpu.optim.batch_size == 256
    assert tpu.simpleconv["dtype"] == "bfloat16"
    assert tpu.simpleconv["bn_conv_bias"] is False
    assert tpu.clip.compute_dtype == "bfloat16"
    assert tpu.parallel.transfer_dtype == "bfloat16"
    assert tpu.parallel.assemble_dtype == "bfloat16"

    ref = MainConfig()
    apply_preset(ref, "clip_conv")
    assert ref.simpleconv["bn_conv_bias"] is True
    assert ref.clip.compute_dtype is None
    assert tpu.sig != ref.sig


def test_erf_gelu_tpu_warning(monkeypatch, caplog):
    """The plain paper preset (erf gelu) on a TPU backend emits the
    measured-1.8x cost hint; the tpu preset (tanh gelu) stays silent."""
    import logging
    import types

    import jax
    import numpy as np

    from brainmagick_tpu import train
    from brainmagick_tpu.config import MainConfig, apply_preset

    feats = types.SimpleNamespace(output_dimension=8, dimension=8)
    rec = types.SimpleNamespace(subject_index=0)
    ds = types.SimpleNamespace(
        meg=np.zeros((4, 10), dtype=np.float32),
        recording=rec, features=feats)
    # SimpleNamespace doesn't route dunders; a list subclass gives
    # build_model the train[0] + train.datasets accesses it needs
    class Split(list):
        datasets = [ds]
    datasets = types.SimpleNamespace(train=Split([ds]))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for preset, expect_warn in (("clip_conv", True),
                                ("clip_conv_tpu", False)):
        cfg = MainConfig()
        apply_preset(cfg, preset)
        cfg.simpleconv.update(hidden=8, depth=2, merger_pos_dim=8,
                              initial_linear=8)
        with caplog.at_level(logging.WARNING, logger="brainmagick_tpu.train"):
            caplog.clear()
            train.build_model(cfg, datasets)
        hits = [r for r in caplog.records if "gelu_exact" in r.message]
        assert bool(hits) == expect_warn, preset
