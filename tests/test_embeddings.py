"""Contextual transformer embeddings: full-sequence tokenization with
token->word offset alignment (bm/features/embeddings.py:179-202
semantics), validated against a tiny local HF BERT (no downloads)."""

import numpy as np
import pytest
import torch

from brainmagick_tpu.events import Word
from brainmagick_tpu.features import embeddings as emb
from brainmagick_tpu.utils import Frequency

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "dog", "ran", "a",
         "un", "##believ", "##able", "story", "quick"]


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    """A small randomly-initialized BERT + WordPiece tokenizer built
    from local files only (HF instantiation without hub access)."""
    from transformers import BertConfig, BertModel, BertTokenizerFast

    vocab_file = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    tok = BertTokenizerFast(vocab_file=str(vocab_file),
                            do_lower_case=True)
    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64)
    model = BertModel(config)
    model.eval()
    return tok, model


def _word(word, index, sequence):
    return Word(start=0.0, duration=0.2, modality="audio",
                language="english", word=word, word_index=index,
                word_sequence=sequence)


def _patched(feature_cls, tiny_bert, monkeypatch, **kw):
    feat = feature_cls(Frequency(50), **kw)
    feat.dimension = 16
    monkeypatch.setattr(feat, "_load", lambda: tiny_bert)
    return feat


def test_alignment_matches_reference_algorithm(tiny_bert, monkeypatch):
    """Our get() == the published algorithm computed by hand: embed the
    whole sequence, average layers, sum the word's tokens."""
    tok, model = tiny_bert
    feat = _patched(emb.BertEmbedding, tiny_bert, monkeypatch)
    feat.layers = (1, 2)

    sequence = "the unbelievable story"
    event = _word("unbelievable", 1, sequence)
    got = feat.get(event)

    inputs = tok(sequence, return_offsets_mapping=True,
                 return_tensors="pt", add_special_tokens=True)
    with torch.no_grad():
        out = model(input_ids=inputs["input_ids"],
                    output_hidden_states=True)
    hiddens = torch.stack(out.hidden_states)[:, 0][[1, 2]].mean(0)
    # the word spans chars [4, 16): select its tokens by offsets
    offsets = inputs["offset_mapping"][0]
    mask = (offsets[:, 1] > 4) & (offsets[:, 0] < 16) \
        & (offsets[:, 1] > offsets[:, 0])
    expected = hiddens[mask].sum(0).numpy()
    # multi-token word: un + ##believ + ##able
    assert int(mask.sum()) == 3
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_contextual_embeddings_depend_on_context(tiny_bert, monkeypatch):
    feat = _patched(emb.BertEmbedding, tiny_bert, monkeypatch)
    same_word_a = feat.get(_word("cat", 1, "the cat sat"))
    same_word_b = feat.get(_word("cat", 1, "a cat ran"))
    assert same_word_a.shape == (16,)
    assert not np.allclose(same_word_a, same_word_b), \
        "contextual embeddings must differ across sequences"


def test_non_contextual_uses_embedding_layer(tiny_bert, monkeypatch):
    """XLM-style contextual=False pools the raw embedding layer, so the
    same word embeds identically in any context."""
    feat = _patched(emb.XlmEmbedding, tiny_bert, monkeypatch,
                    contextual=False)
    a = feat.get(_word("cat", 1, "the cat sat"))
    b = feat.get(_word("cat", 1, "a cat ran"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_sum_sqrt_pooling(tiny_bert, monkeypatch):
    """XLM pooling divides the token sum by sqrt(n_tokens)."""
    feat_sum = _patched(emb.BertEmbedding, tiny_bert, monkeypatch)
    feat_sum.layers = None
    feat_norm = _patched(emb.XlmEmbedding, tiny_bert, monkeypatch,
                         contextual=True)
    event = _word("unbelievable", 1, "the unbelievable story")
    np.testing.assert_allclose(feat_norm.get(event),
                               feat_sum.get(event) / np.sqrt(3),
                               rtol=1e-5)


def test_bad_word_index_falls_back_to_sequence(tiny_bert, monkeypatch):
    """A mismatched word_index pools the whole sequence instead of
    crashing (reference logs and uses the full token range)."""
    feat = _patched(emb.BertEmbedding, tiny_bert, monkeypatch)
    got = feat.get(_word("dog", 5, "the cat sat"))
    assert got.shape == (16,)
    assert np.isfinite(got).all()


def test_offline_fallback_is_deterministic(monkeypatch):
    from brainmagick_tpu.cache import MemoryCache

    feat = emb.BertEmbedding(Frequency(50))
    monkeypatch.setattr(feat, "_load", lambda: None)
    # fresh memory cache: other tests may have planted the tiny model
    # under this class's shared cache key
    monkeypatch.setattr(feat, "_model_cache",
                        MemoryCache("test-offline-bert", "model"))
    a = feat.get(_word("cat", 1, "the cat sat"))
    b = feat.get(_word("cat", 0, "cat ran"))
    np.testing.assert_array_equal(a, b)  # hash fallback is per-word
    assert a.shape == (768,)


def test_fallback_refused_for_real_studies(monkeypatch):
    """FeaturesBuilder on a real study + missing model must error out
    loudly instead of silently training on hash embeddings; fake
    studies and an explicit allow_fallback=true keep working."""
    import pandas as pd

    from brainmagick_tpu.cache import MemoryCache
    from brainmagick_tpu.features.base import FeaturesBuilder

    events = pd.DataFrame([dict(
        kind="word", start=0.0, duration=0.2, word="cat", word_index=0,
        word_sequence="cat", modality="audio", language="english")])
    word = _word("cat", 0, "cat")

    def fresh(feat):
        monkeypatch.setattr(feat, "_load", lambda: None, raising=False)
        monkeypatch.setattr(
            feat, "_model_cache",
            MemoryCache("test-guard-bert", "model"), raising=False)
        monkeypatch.setattr(
            feat, "_nlp_cache",
            MemoryCache("test-guard-nlp", "model"), raising=False)
        return feat

    # real study, auto-resolved: refused
    builder = FeaturesBuilder(events, ["BertEmbedding"], None,
                              Frequency(50), study="gwilliams2022")
    with pytest.raises(emb.MissingModelError, match="allow_fallback"):
        fresh(builder["BertEmbedding"]).get(word)

    # fake study: allowed
    builder = FeaturesBuilder(events, ["BertEmbedding"], None,
                              Frequency(50), study="fake")
    out = fresh(builder["BertEmbedding"]).get(word)
    assert out.shape == (768,)

    # real study with the explicit opt-in: allowed
    builder = FeaturesBuilder(
        events, ["BertEmbedding"],
        {"BertEmbedding": {"allow_fallback": True}},
        Frequency(50), study="gwilliams2022")
    out = fresh(builder["BertEmbedding"]).get(word)
    assert out.shape == (768,)

    # spacy-backed features obey the same gate
    for name in ("WordEmbedding", "PartOfSpeech"):
        builder = FeaturesBuilder(events, [name], None, Frequency(50),
                                  study="schoffelen2019")
        feat = fresh(builder[name])
        monkeypatch.setattr(emb, "_try_spacy", lambda lang: None)
        with pytest.raises(emb.MissingModelError, match="spacy"):
            feat.get(word)
