"""Feature layer tests (mirrors bm/features/test_features.py coverage)."""

import numpy as np
import pytest

from brainmagick_tpu.features import FeaturesBuilder
from brainmagick_tpu.studies.fake import make_fake_events
from brainmagick_tpu.utils import Frequency


@pytest.fixture(scope="module")
def fake_events():
    return make_fake_events(total_duration=30, seed=1234)


def make_builder(fake_events, names, tmp=None, **kwargs):
    return FeaturesBuilder(fake_events, names, features_params={},
                           sample_rate=Frequency(120.0), **kwargs)


def test_dimensions(fake_events):
    builder = make_builder(
        fake_events, ["WordLength", "WordFrequency", "Phoneme", "WordHash"])
    assert builder.dimension == 4
    # Phoneme expands to 44 logits in the model output
    assert builder.output_dimension == 3 + 44
    sl = builder.get_slice("Phoneme")
    assert sl == slice(2, 3)
    sl_out = builder.get_slice("Phoneme", model_output=True)
    assert sl_out == slice(2, 46)


def test_render_and_mask(fake_events):
    builder = make_builder(fake_events, ["WordLength"], event_mask=True)
    data, mask, evs = builder(0.0, 10.0)
    assert data.shape == (1, 1200)
    assert mask.shape == (1, 1200)
    assert data.max() > 0  # some word was painted
    assert mask.any() and not mask.all()
    # data is nonzero exactly where words are (length >= 1)
    assert ((data[0] > 0) == mask[0]).mean() > 0.99


def test_every_registered_basic_feature(fake_events):
    names = ["WordPulse", "PhonemePulse", "WordSegment", "Modality",
             "WordLength", "WordIndex", "WordFrequency", "Phoneme",
             "WordHash"]
    builder = make_builder(fake_events, names)
    data, mask, _ = builder(0.0, 20.0)
    assert data.shape[0] == builder.dimension
    for name in names:
        block = data[builder.get_slice(name)]
        assert np.abs(block).max() > 0, f"feature {name} is all zeros"


def test_window_matches_track_slice(fake_events):
    """Per-window painting must equal slicing the full-recording track
    (the precompute fast path)."""
    builder = make_builder(fake_events,
                           ["WordLength", "Phoneme", "WordPulse"],
                           event_mask=True)
    sr = Frequency(120.0)
    full, full_mask, _ = builder(0.0, 30.0)
    for start in [1.0, 5.25, 12.5]:
        stop = start + 3.0
        data, mask, _ = builder(start, stop)
        i0 = sr.to_ind(start)
        np.testing.assert_allclose(
            data, full[:, i0:i0 + data.shape[1]], atol=1e-6)


def test_mel_spectrum(fake_events, tmp_cache):
    builder = make_builder(fake_events, ["MelSpectrum"])
    data, mask, _ = builder(0.0, 10.0)
    assert data.shape == (40, 1200)
    # sound events exist in the first 10s -> non-default values painted
    assert (data > data.min() + 1e-3).any()


def test_mel_matches_torchaudio_semantics():
    """Our JAX mel vs a direct numpy re-implementation of the torchaudio
    formula (centered reflect hann frames, power 2, HTK mel)."""
    from brainmagick_tpu.features.audio import melspectrogram, _mel_filterbank

    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32)
    n_fft, hop, n_mels, sr = 512, 128, 40, 16000
    got = melspectrogram(wav, sr, n_fft, hop, n_mels, normalized=True)

    window = np.hanning(n_fft + 1)[:-1]
    x = np.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)
    spec = np.fft.rfft(x[idx] * window, axis=-1)
    power = np.abs(spec) ** 2 / (window ** 2).sum()
    ref = (power @ _mel_filterbank(sr, n_fft, n_mels)).T
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_pitch_on_sine():
    from brainmagick_tpu.features.audio import compute_yin

    sr = 16000
    t = np.arange(sr) / sr
    f0 = 220.0
    sig = np.sin(2 * np.pi * f0 * t)
    pitches, rates, _, _ = compute_yin(sig, sr, w_len=512, w_step=256,
                                       f0_min=100, f0_max=400)
    pitches = np.asarray(pitches)
    voiced = pitches[pitches > 0]
    assert len(voiced) > 10
    assert np.abs(np.median(voiced) - f0) < 5


def test_word_hash_stable(fake_events):
    from brainmagick_tpu.features.basic import stable_word_hash

    assert stable_word_hash("Hello") == stable_word_hash("hello.")
    assert stable_word_hash("hello") != stable_word_hash("world")


def test_extract_features(fake_events):
    builder = make_builder(fake_events, ["WordLength", "WordIndex",
                                         "WordFrequency"])
    data, _, _ = builder(0.0, 5.0)
    batch = data[None]
    sub = builder.extract_features(batch, ["WordFrequency", "WordLength"])
    np.testing.assert_array_equal(sub[:, 0], batch[:, 2])
    np.testing.assert_array_equal(sub[:, 1], batch[:, 0])


def test_unknown_feature_raises(fake_events):
    with pytest.raises(KeyError):
        make_builder(fake_events, ["NotAFeature"])
