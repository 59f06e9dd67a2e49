"""Parity test: the flax wav2vec 2.0 encoder must match the HF torch
implementation numerically on a randomly initialized small config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _models(do_stable_layer_norm=True, feat_extract_norm="layer",
            scan_layers=False):
    import jax

    from brainmagick_tpu.models.wav2vec2 import (Wav2Vec2Model,
                                                 config_from_hf,
                                                 convert_torch_weights)

    hf_config = transformers.Wav2Vec2Config(
        conv_dim=[16, 16], conv_kernel=[10, 3], conv_stride=[5, 2],
        conv_bias=True, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=do_stable_layer_norm,
        feat_extract_norm=feat_extract_norm,
        hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0)
    torch.manual_seed(0)
    torch_model = transformers.Wav2Vec2Model(hf_config).eval()

    cfg = config_from_hf(hf_config, scan_layers=scan_layers)
    flax_model = Wav2Vec2Model(cfg)
    params = convert_torch_weights(torch_model, scan_layers=scan_layers)
    return torch_model, flax_model, {"params": params}


@pytest.mark.parametrize("stable,norm,scan", [
    (True, "layer", False),
    (False, "group", False),
    # lax.scan over the layers (the precompute path's compile-friendly
    # layout): same numerics, stacked [L] params
    (True, "layer", True),
])
def test_flax_matches_torch(stable, norm, scan):
    import jax.numpy as jnp

    torch_model, flax_model, variables = _models(stable, norm,
                                                 scan_layers=scan)
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 800).astype(np.float32)

    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(wav),
                            output_hidden_states=True)
    last_t = out_t.last_hidden_state.numpy()
    extract_t = out_t.extract_features.numpy()
    hidden_t = [h.numpy() for h in out_t.hidden_states]

    last_j, extract_j, hidden_j = flax_model.apply(
        variables, jnp.asarray(wav))

    np.testing.assert_allclose(np.asarray(extract_j), extract_t,
                               rtol=1e-3, atol=1e-4)
    assert len(hidden_j) == len(hidden_t)
    for k, (hj, ht) in enumerate(zip(hidden_j, hidden_t)):
        np.testing.assert_allclose(np.asarray(hj), ht, rtol=1e-3,
                                   atol=2e-4, err_msg=f"layer {k}")
    np.testing.assert_allclose(np.asarray(last_j), last_t, rtol=1e-3,
                               atol=2e-4)


@pytest.mark.parametrize("stable,norm", [(True, "layer"),
                                         (False, "group")])
def test_layerwise_forward_matches_monolithic(stable, norm):
    """layerwise_forward (3 small executables + host loop) returns
    bit-close results to the monolithic scan program — full collection,
    narrowed collection, and torch end-to-end."""
    import dataclasses

    import jax.numpy as jnp

    from brainmagick_tpu.models.wav2vec2 import (Wav2Vec2Model,
                                                 layerwise_forward)

    torch_model, flax_model, variables = _models(stable, norm,
                                                 scan_layers=True)
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 800).astype(np.float32)
    x = jnp.asarray(wav)
    last_m, extract_m, hidden_m = flax_model.apply(variables, x)

    fwd = layerwise_forward(flax_model, variables)
    last_l, extract_l, hidden_l = fwd(x)
    np.testing.assert_allclose(np.asarray(last_l), np.asarray(last_m),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(extract_l),
                               np.asarray(extract_m),
                               rtol=1e-5, atol=1e-6)
    assert len(hidden_l) == len(hidden_m)
    for k, (hl, hm) in enumerate(zip(hidden_l, hidden_m)):
        np.testing.assert_allclose(np.asarray(hl), np.asarray(hm),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"layer {k}")

    # narrowed collection (the shipped Wav2VecTransformer selection)
    collect = (1, 2)
    cfg_c = dataclasses.replace(flax_model.cfg, collect_layers=collect)
    fwd_c = layerwise_forward(Wav2Vec2Model(cfg_c), variables)
    last_c, _, hidden_c = fwd_c(x)
    np.testing.assert_allclose(np.asarray(last_c), np.asarray(last_m),
                               rtol=1e-5, atol=1e-6)
    assert len(hidden_c) == len(collect)
    for j, idx in enumerate(collect):
        np.testing.assert_allclose(np.asarray(hidden_c[j]),
                                   np.asarray(hidden_m[idx]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"collect[{j}]=layer {idx}")

    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(wav),
                            output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(last_l),
                               out_t.last_hidden_state.numpy(),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("layerwise", [False, True])
def test_wav2vec_feature_jax_backend(tmp_cache, tmp_path, layerwise):
    """Wav2VecTransformer(backend='jax') paints the same features as the
    torch backend (random tiny model) — monolithic and layerwise."""
    import wave

    import numpy as np

    from brainmagick_tpu.features.audio import Wav2VecTransformer
    from brainmagick_tpu.utils import Frequency

    # the full xlsr-random config is too slow on 1 core; share one tiny
    # random torch model between both backends by overriding the model
    # caches
    torch_model, flax_model, variables = _models()
    from brainmagick_tpu.cache import MemoryCache

    feat_t = Wav2VecTransformer(Frequency(120.0), random=True,
                                layers=(1, 2), backend="torch")
    feat_j = Wav2VecTransformer(Frequency(120.0), random=True,
                                layers=(1, 2), backend="jax")
    wav_path = tmp_path / "w.wav"
    sig = (np.sin(np.linspace(0, 700, 8000)) * 20000).astype(np.int16)
    with wave.open(str(wav_path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(sig.tobytes())

    feat_t._model_cache.get = lambda fn, *a, **k: torch_model
    feat_j._model_cache.get = lambda fn, *a, **k: torch_model
    # isolate the jax model/forward MemoryCache keys from other tests
    # (they key on model_name + layer selection)
    feat_j.model_name = "w2vtest-tiny"
    feat_j.jax_layerwise = layerwise

    out_t = feat_t._compute_hidden_states("hidden_states", str(wav_path),
                                          0.0, 0.5, layers=[1, 2])
    out_j = feat_j._compute_hidden_states("hidden_states", str(wav_path),
                                          0.0, 0.5, layers=[1, 2])
    np.testing.assert_allclose(out_j, out_t, rtol=1e-3, atol=2e-4)
    assert MemoryCache  # keep the import referenced


def test_layerwise_env_flag_parsed_as_value(monkeypatch):
    """BM_W2V_LAYERWISE=0 must DISABLE layerwise mode (a presence check
    would make an A/B of 0 vs 1 silently run the same path twice)."""
    from brainmagick_tpu.features.audio import Wav2VecTransformer
    from brainmagick_tpu.utils import Frequency

    feat = Wav2VecTransformer(Frequency(120.0), random=True)
    monkeypatch.setenv("BM_W2V_LAYERWISE", "0")
    assert not feat._layerwise_enabled()
    monkeypatch.setenv("BM_W2V_LAYERWISE", "false")
    assert not feat._layerwise_enabled()
    monkeypatch.setenv("BM_W2V_LAYERWISE", "1")
    assert feat._layerwise_enabled()
    monkeypatch.delenv("BM_W2V_LAYERWISE")
    assert not feat._layerwise_enabled()
    feat.jax_layerwise = True
    assert feat._layerwise_enabled()


def test_random_model_init_is_seeded(monkeypatch):
    """random=True weights must be IDENTICAL in every process/call:
    the hidden-state disk cache is shared across grid-runner training
    subprocesses and eval processes, and per-process unseeded draws
    silently mix features from different random networks on any cache
    miss. Also: seeding must not perturb the global torch RNG stream."""
    from brainmagick_tpu.features.audio import Wav2VecTransformer
    from brainmagick_tpu.utils import Frequency

    tiny = transformers.Wav2Vec2Config(
        conv_dim=[8, 8], conv_kernel=[10, 3], conv_stride=[5, 2],
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    monkeypatch.setattr(transformers.Wav2Vec2Config, "from_pretrained",
                        classmethod(lambda cls, name: tiny))

    feat = Wav2VecTransformer(Frequency(120.0), random=True)
    torch.manual_seed(123)
    m1 = feat._load_model()
    stream1 = torch.randn(4)          # global stream after first load
    torch.manual_seed(999)            # a very different global state
    m2 = feat._load_model()
    for (k1, v1), (k2, v2) in zip(m1.state_dict().items(),
                                  m2.state_dict().items()):
        assert k1 == k2
        assert torch.equal(v1, v2), f"unseeded random init leaks: {k1}"
    # fork_rng restored the global stream: same draws as an unseeded run
    torch.manual_seed(123)
    assert torch.equal(torch.randn(4), stream1)


def test_collect_layers_scan_matches_full():
    """collect_layers under lax.scan (carry accumulator) returns exactly
    the selected hidden states of the full collection — including the
    post-LN final index — with the SAME param tree."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from brainmagick_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                                 Wav2Vec2Model)

    cfg = dataclasses.replace(Wav2Vec2Config.tiny(), scan_layers=True)
    model = Wav2Vec2Model(cfg)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 800).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wav)
    last, extract, hidden = model.apply(variables, wav)
    assert len(hidden) == cfg.num_hidden_layers + 1

    for collect in [(0, 1), (1, 2), (0, 2), (1,), ()]:
        cfg_c = dataclasses.replace(cfg, collect_layers=collect)
        last_c, extract_c, hidden_c = Wav2Vec2Model(cfg_c).apply(
            variables, wav)
        np.testing.assert_allclose(np.asarray(last_c), np.asarray(last),
                                   rtol=1e-5, atol=1e-6)
        assert len(hidden_c) == len(collect)
        for j, idx in enumerate(collect):
            np.testing.assert_allclose(
                np.asarray(hidden_c[j]), np.asarray(hidden[idx]),
                rtol=1e-5, atol=1e-6, err_msg=f"collect {collect}[{j}]")
    # unrolled path honors the selection too
    cfg_u = dataclasses.replace(cfg, scan_layers=False,
                                collect_layers=(0, 2))
    from brainmagick_tpu.models.wav2vec2 import convert_torch_weights
    assert convert_torch_weights  # layout documented elsewhere
    # (params differ in layout between scan/unrolled; just check shape
    # contract on a fresh init)
    model_u = Wav2Vec2Model(cfg_u)
    vu = model_u.init(jax.random.PRNGKey(0), wav)
    _, _, hidden_u = model_u.apply(vu, wav)
    assert len(hidden_u) == 2
