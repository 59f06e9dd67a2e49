"""Word-level embedding features: spacy vectors, POS tags, BERT / XLM-R.

Reference parity: bm/features/embeddings.py:34-253 — same feature surface
and dimensions (WordEmbedding 300, WordEmbeddingSmall 96, PartOfSpeech 21
classes, BertEmbedding 768, XlmEmbedding 1024).

Offline behavior: this container has no spacy models, no HF hub access
and no torch.hub access. Each feature therefore uses its true backend
when the model is available on local disk and otherwise falls back to a
*deterministic hash embedding* (unit-normal vectors seeded by sha1 of the
word) / a rule-based POS tagger — clearly logged, so pipelines stay
runnable end-to-end and cache keys distinguish the two modes.

The fallback is gated: `features_params.<Feature>.allow_fallback`
controls it explicitly; when unset, FeaturesBuilder resolves it per
study — allowed for the synthetic fake studies (and direct library use,
e.g. SentenceFeatures), REFUSED for real studies so a disconnected host
cannot silently train a real XP on hash embeddings.
"""

from __future__ import annotations

import hashlib
import logging
import typing as tp

import numpy as np

from .. import events
from ..cache import MemoryCache
from ..utils import Frequency
from .base import Feature

logger = logging.getLogger(__name__)

# Universal POS tagset (spacy convention), 20 tags + 1 for "no tag"
UPOS_TAGS = ("ADJ", "ADP", "ADV", "AUX", "CCONJ", "DET", "INTJ", "NOUN",
             "NUM", "PART", "PRON", "PROPN", "PUNCT", "SCONJ", "SYM",
             "VERB", "X", "EOL", "SPACE", "OTHER")

_SPACY_MODELS = {"en": "en_core_web_md", "nl": "nl_core_news_md",
                 "english": "en_core_web_md", "dutch": "nl_core_news_md"}


def _try_spacy(lang: str):
    try:
        import spacy
        model = _SPACY_MODELS.get(lang, f"{lang}_core_news_md")
        if spacy.util.is_package(model):
            return spacy.load(model)
    except ImportError:
        pass
    return None


class MissingModelError(RuntimeError):
    """A real study needs an embedding model that is not on local disk
    and the hash-embedding fallback was not explicitly allowed."""


def _check_fallback(feature: "Feature", what: str, instruction: str) -> None:
    """Raise unless this feature may fall back (None = auto, resolved by
    FeaturesBuilder per study; features_params.<name>.allow_fallback
    always wins)."""
    allowed = getattr(feature, "allow_fallback", None)
    if allowed is None:
        allowed = True  # direct library use (no study context)
    if not allowed:
        raise MissingModelError(
            f"{feature.name}: {what} is not available on local disk and "
            f"this is a real study, so the deterministic-fallback path "
            f"is disabled. {instruction} Or opt into the fallback with "
            f"dset.features_params.{feature.name}.allow_fallback=true "
            f"(trains on hash embeddings — not the paper recipe).")


def hash_embedding(word: str, dim: int) -> np.ndarray:
    """Deterministic unit-normal embedding of a word (offline fallback)."""
    seed = int.from_bytes(
        hashlib.sha1(word.lower().encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    vec = rng.randn(dim).astype(np.float32)
    return vec / np.linalg.norm(vec)


class _WordEmbeddingBase(Feature):
    """Shared machinery: per-word vector painted over the word span."""

    event_kind = "word"
    dimension = 300

    def __init__(self, sample_rate: Frequency, lang: str = "auto",
                 allow_fallback: tp.Optional[bool] = None) -> None:
        super().__init__(sample_rate)
        self.lang = lang
        self.allow_fallback = allow_fallback
        self._nlp_cache = MemoryCache("spacy", self.__class__.__name__)
        self._warned = False

    def _embed(self, word: str, language: str) -> np.ndarray:
        nlp = self._nlp_cache.get(_try_spacy, language)
        if nlp is not None:
            vec = nlp(word).vector[:self.dimension]
            if vec.shape[0] == self.dimension and np.any(vec):
                return np.asarray(vec, dtype=np.float32)
            # model present, word out of vocabulary (zero vector):
            # per-word hash stand-in, NOT a missing-model condition
            return hash_embedding(word, self.dimension)
        _check_fallback(
            self, f"the spacy model for lang={language}",
            f"Install it with `python -m spacy download "
            f"{_SPACY_MODELS.get(language, language + '_core_news_md')}`.")
        if not self._warned:
            logger.warning(
                "%s: no spacy model for lang=%s on disk; using "
                "deterministic hash embeddings.", self.name, language)
            self._warned = True
        return hash_embedding(word, self.dimension)

    def get(self, event: events.Word) -> np.ndarray:
        language = self.lang if self.lang != "auto" else (event.language or "en")
        return self._embed(event.word, language)


class WordEmbedding(_WordEmbeddingBase):
    """300-d word vector (spacy md; bm/features/embeddings.py)."""
    dimension = 300


class WordEmbeddingSmall(_WordEmbeddingBase):
    """96-d word vector (spacy sm/md truncation)."""
    dimension = 96


# simple suffix/closed-class heuristics for the offline POS fallback
_CLOSED_CLASS = {
    "en": {"the": "DET", "a": "DET", "an": "DET", "and": "CCONJ",
           "or": "CCONJ", "but": "CCONJ", "in": "ADP", "on": "ADP",
           "at": "ADP", "of": "ADP", "to": "PART", "is": "AUX",
           "are": "AUX", "was": "AUX", "were": "AUX", "be": "AUX",
           "he": "PRON", "she": "PRON", "it": "PRON", "they": "PRON",
           "i": "PRON", "you": "PRON", "we": "PRON", "that": "SCONJ",
           "not": "PART"},
    "nl": {"de": "DET", "het": "DET", "een": "DET", "en": "CCONJ",
           "of": "CCONJ", "maar": "CCONJ", "in": "ADP", "op": "ADP",
           "van": "ADP", "te": "PART", "is": "AUX", "zijn": "AUX",
           "was": "AUX", "hij": "PRON", "zij": "PRON", "ik": "PRON",
           "dat": "SCONJ", "niet": "PART"},
}


def rule_based_pos(word: str, language: str) -> str:
    lang = {"english": "en", "dutch": "nl"}.get(language, language)
    w = word.lower()
    closed = _CLOSED_CLASS.get(lang, _CLOSED_CLASS["en"])
    if w in closed:
        return closed[w]
    if w.isdigit():
        return "NUM"
    if not w.isalpha():
        return "PUNCT" if not any(c.isalnum() for c in w) else "X"
    if lang == "en" and (w.endswith("ing") or w.endswith("ed")):
        return "VERB"
    if lang == "en" and w.endswith("ly"):
        return "ADV"
    if word[:1].isupper():
        return "PROPN"
    return "NOUN"


class PartOfSpeech(Feature):
    """Categorical UPOS tag of each word (21 classes incl. silence)."""
    cardinality = len(UPOS_TAGS) + 1
    event_kind = "word"

    def __init__(self, sample_rate: Frequency, lang: str = "auto",
                 allow_fallback: tp.Optional[bool] = None) -> None:
        super().__init__(sample_rate)
        self.lang = lang
        self.allow_fallback = allow_fallback
        self._nlp_cache = MemoryCache("spacy", "pos")
        self._warned = False

    def get(self, event: events.Word) -> int:
        language = self.lang if self.lang != "auto" else (event.language or "en")
        nlp = self._nlp_cache.get(_try_spacy, language)
        if nlp is not None:
            tag = nlp(event.word)[0].pos_
        else:
            _check_fallback(
                self, f"the spacy model for lang={language}",
                f"Install it with `python -m spacy download "
                f"{_SPACY_MODELS.get(language, language + '_core_news_md')}`.")
            if not self._warned:
                logger.warning("PartOfSpeech: no spacy model on disk; "
                               "using rule-based tagger.")
                self._warned = True
            tag = rule_based_pos(event.word, language)
        idx = UPOS_TAGS.index(tag) if tag in UPOS_TAGS else UPOS_TAGS.index("OTHER")
        return idx + 1  # 0 is reserved for silence


class _ContextualEmbeddingBase(Feature):
    """Transformer word embeddings: the FULL word sequence is run through
    the model once and each word's vector is the combination of the
    tokens whose character offsets fall inside that word — the
    reference's token->word alignment (bm/features/embeddings.py:179-202
    for BERT, :224-253 for XLM). Hash fallback offline."""

    event_kind = "word"
    model_name = ""
    #: hidden-state layers averaged before token pooling; None = last
    layers: tp.Optional[tp.Tuple[int, ...]] = None
    #: "sum" (BERT keeps word-length information) or "sum_sqrt" (XLM
    #: renormalizes multi-token words by sqrt(n_tokens))
    token_pooling = "sum"

    def __init__(self, sample_rate: Frequency, contextual: bool = True,
                 allow_fallback: tp.Optional[bool] = None) -> None:
        super().__init__(sample_rate)
        self.contextual = contextual
        self.allow_fallback = allow_fallback
        self._model_cache = MemoryCache(self.__class__.__name__, "model")
        self._seq_cache: tp.Dict[str, tp.Tuple[np.ndarray, np.ndarray]] = {}
        self._warned = False

    def _load(self):
        import os
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        try:
            from transformers import AutoModel, AutoTokenizer
            tok = AutoTokenizer.from_pretrained(self.model_name)
            model = AutoModel.from_pretrained(self.model_name)
            model.eval()
            return tok, model
        except Exception:  # offline / missing checkpoint
            return None

    def _hiddens(self, sequence: str
                 ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """[n_tokens, D] pooled hidden states + [n_tokens, 2] char
        offsets for one sequence (cached — every word of a sentence
        reuses the same forward pass)."""
        if sequence in self._seq_cache:
            return self._seq_cache[sequence]
        import torch

        tok, model = self._model_cache.get(self._load)
        inputs = tok(sequence, return_offsets_mapping=True,
                     return_tensors="pt", add_special_tokens=True)
        with torch.no_grad():
            out = model(
                input_ids=inputs["input_ids"],
                attention_mask=inputs.get("attention_mask"),
                output_hidden_states=True)
        hs = torch.stack(out.hidden_states)[:, 0]  # [L+1, n_tok, D]
        if not self.contextual:
            pooled = hs[0]          # embedding-layer output (raw)
        elif self.layers is not None:
            idx = [k for k in self.layers if k < hs.shape[0]] or [-1]
            pooled = hs[idx].mean(0)
        else:
            pooled = hs[-1]
        value = (pooled.numpy().astype(np.float32),
                 inputs["offset_mapping"][0].numpy())
        if len(self._seq_cache) > 512:  # bound host memory
            self._seq_cache.clear()
        self._seq_cache[sequence] = value
        return value

    def _word_span(self, event: events.Word
                   ) -> tp.Optional[tp.Tuple[int, int]]:
        """Character span of the event's word inside its sequence, from
        word_index under the space-join convention; None when the index
        does not line up (the reference then pools the whole sequence)."""
        sequence = event.word_sequence or ""
        words = sequence.split(" ")
        wid = int(event.word_index or 0)
        if not (0 <= wid < len(words)) or words[wid] != event.word:
            return None
        char_end = len(" ".join(words[:wid + 1]))
        char_start = char_end - len(event.word)
        if sequence[char_start:char_end] != event.word:
            return None
        return char_start, char_end

    def get(self, event: events.Word) -> np.ndarray:
        if not event.word:
            return np.zeros(self.dimension, dtype=np.float32)
        if self._model_cache.get(self._load) is None:
            _check_fallback(
                self, f"the {self.model_name} checkpoint",
                f"Fetch it once on a connected machine with "
                f"`python -c \"from transformers import AutoModel, "
                f"AutoTokenizer; AutoModel.from_pretrained("
                f"'{self.model_name}'); AutoTokenizer.from_pretrained("
                f"'{self.model_name}')\"`.")
            if not self._warned:
                logger.warning(
                    "%s: checkpoint %s not on local disk; using "
                    "deterministic hash embeddings.", self.name,
                    self.model_name)
                self._warned = True
            return hash_embedding(event.word, self.dimension)
        sequence = event.word_sequence or event.word
        hiddens, offsets = self._hiddens(sequence)
        span = self._word_span(event)
        if span is None:
            logger.info("Bad word_index for word %r in sequence %r",
                        event.word, sequence)
            mask = offsets[:, 1] > offsets[:, 0]  # all non-special
        else:
            char_start, char_end = span
            mask = ((offsets[:, 1] > char_start)
                    & (offsets[:, 0] < char_end)
                    & (offsets[:, 1] > offsets[:, 0]))
        picked = hiddens[mask]
        if not len(picked):
            return np.zeros(self.dimension, dtype=np.float32)
        out = picked.sum(0)
        if self.token_pooling == "sum_sqrt":
            out = out / np.sqrt(len(picked))
        return out.astype(np.float32)


class BertEmbedding(_ContextualEmbeddingBase):
    """Multilingual BERT word embedding, dim 768 — mean of layers
    (8, 9, 10), token vectors summed (keeps word-length information,
    bm/features/embeddings.py:199-202)."""
    dimension = 768
    model_name = "bert-base-multilingual-cased"
    layers = (8, 9, 10)
    token_pooling = "sum"


class XlmEmbedding(_ContextualEmbeddingBase):
    """XLM-R large word embedding, dim 1024 — `contextual` picks the
    final layer vs the raw embedding layer; multi-token words are
    sum/sqrt(n)-pooled (bm/features/embeddings.py:224-253)."""
    dimension = 1024
    model_name = "xlm-roberta-large"
    layers = None
    token_pooling = "sum_sqrt"

    def __init__(self, sample_rate: Frequency, contextual: bool = False,
                 allow_fallback: tp.Optional[bool] = None) -> None:
        super().__init__(sample_rate, contextual=contextual,
                         allow_fallback=allow_fallback)
