"""Events layer tests (mirrors bm/test_events.py coverage)."""

import numpy as np
import pandas as pd
import pytest

from brainmagick_tpu import events as ev
from brainmagick_tpu.studies.fake import make_fake_events


def _word_df():
    rows = []
    t = 0.0
    for seq_id, sentence in enumerate(["the cat sat", "a dog ran fast"]):
        for k, w in enumerate(sentence.split()):
            rows.append(dict(kind="word", start=t, duration=0.2,
                             modality="audio", language="en", word=w,
                             word_index=k, word_sequence=sentence,
                             condition="sentence", sequence_id=seq_id))
            t += 0.3
    return pd.DataFrame(rows)


def test_validate_and_iter():
    df = _word_df().event.validate()
    evs = list(df.event.iter())
    assert all(e.kind == "word" for e in evs)
    assert evs[0].word == "the"
    assert evs[0].stop == pytest.approx(0.2)


def test_negative_duration_rejected():
    df = _word_df()
    df.loc[0, "duration"] = -1.0
    with pytest.raises(ValueError):
        df.event.validate()


def test_extract_sequence_info():
    df = _word_df().drop(columns=["word_index", "word_sequence"])
    out = ev.extract_sequence_info(df)
    first = out[out.sequence_id == 0]
    assert list(first.word_index) == [0, 1, 2]
    assert first.word_sequence.iloc[0] == "the cat sat"


def test_create_blocks_sentence():
    df = _word_df()
    out = ev.create_blocks(df, groupby="sentence")
    blocks = out[out.kind == "block"]
    assert len(blocks) == 2
    # uid is the concatenation of contained words
    assert blocks.iloc[0].uid == "the cat sat"
    assert np.isinf(blocks.iloc[-1].duration)


def test_merge_blocks():
    blocks = pd.DataFrame([
        dict(kind="block", start=float(k), duration=1.0, uid=f"b{k}",
             modality=None, language=None)
        for k in range(6)])
    merged = ev.merge_blocks(blocks, min_block_duration_s=2.5)
    assert len(merged) == 2
    assert merged.iloc[0].uid == "b0,b1,b2"
    assert merged.iloc[0].duration == pytest.approx(3.0)


def test_assign_blocks_deterministic():
    blocks = pd.DataFrame([
        dict(kind="block", start=float(k), duration=1.0, uid=f"block{k}",
             modality=None, language=None)
        for k in range(300)])
    a = ev.assign_blocks(blocks, [0.2, 0.1], seed=12, min_n_blocks_per_split=1)
    b = ev.assign_blocks(blocks, [0.2, 0.1], seed=12, min_n_blocks_per_split=1)
    assert (a.split.values == b.split.values).all()
    counts = a.split.value_counts(normalize=True)
    assert counts[0] == pytest.approx(0.2, abs=0.07)
    assert counts[1] == pytest.approx(0.1, abs=0.06)
    assert counts[2] == pytest.approx(0.7, abs=0.08)
    # a different seed reshuffles
    c = ev.assign_blocks(blocks, [0.2, 0.1], seed=13, min_n_blocks_per_split=1)
    assert (a.split.values != c.split.values).any()


def test_assign_blocks_remove_ratio():
    blocks = pd.DataFrame([
        dict(kind="block", start=float(k), duration=1.0, uid=f"block{k}",
             modality=None, language=None)
        for k in range(400)])
    out = ev.assign_blocks(blocks, [0.2, 0.1], seed=12, remove_ratio=0.3,
                           min_n_blocks_per_split=1)
    assert len(out) < 400
    assert set(out.split.unique()) == {0, 1, 2}


def test_assign_blocks_reference_hash_semantics():
    """The split of a block must be a pure function of (uid, seed), using
    sha256 + random.Random (split determinism is correctness-critical)."""
    import hashlib
    import random

    blocks = pd.DataFrame([dict(kind="block", start=0.0, duration=1.0,
                                uid="myblock", modality=None, language=None)])
    out = ev.assign_blocks(blocks, [0.2, 0.1], seed=12,
                           min_n_blocks_per_split=1)
    hashed = int(hashlib.sha256(b"myblock").hexdigest(), 16)
    score = random.Random(hashed + 12).random()
    expected = int(np.searchsorted(np.cumsum([0.2, 0.1, 0.7]), score,
                                   side="right"))
    assert out.split.iloc[0] == expected


def test_split_wav_as_block():
    wav = dict(kind="sound", start=0.0, duration=10.0, filepath="MOCK_CACHE/x.wav",
               modality=None, language=None, offset=0.0)
    df = pd.DataFrame([wav])
    blocks = [(0.0, 4.0), (4.0, 7.0), (7.0, 12.0)]
    out = ev.split_wav_as_block(df, blocks)
    assert len(out) == 3
    assert out.start.tolist() == pytest.approx([0.0, 4.0, 7.0])
    assert out.duration.tolist() == pytest.approx([4.0, 3.0, 3.0])
    assert out.offset.tolist() == pytest.approx([0.0, 4.0, 7.0])


def test_fake_events_have_blocks():
    df = make_fake_events(total_duration=30, seed=1234)
    kinds = set(df.kind.unique())
    assert {"word", "phoneme", "sound", "block"} <= kinds
    blocks = df[df.kind == "block"]
    assert len(blocks) >= 3
    assert blocks.uid.is_unique


def test_dataslice_overlap():
    ds = ev.DataSlice(start=1.0, duration=2.0, sample_rate=100.0,
                      modality=None, language=None)
    word = ev.Event(start=0.5, duration=1.0, modality=None, language=None)
    ov = ds.overlap(word)
    assert ov.start == 1.0
    assert ov.stop == pytest.approx(1.5)
    sl = ov.slice_in_parent()
    assert sl == slice(0, 50)


def test_assign_blocks_reference_golden_values():
    """Cross-implementation golden check: the reference's own test
    (bm/test_events.py test_assign_blocks) asserts these uids land in
    splits [1, 0] at seed 12 — split determinism must match exactly for
    accuracy comparisons to be meaningful."""
    blocks = pd.DataFrame([
        dict(kind="block", start=0.0, duration=2.0, uid="ceci est",
             modality=None, language=None),
        dict(kind="block", start=2.0, duration=2.0, uid="un test",
             modality=None, language=None)])
    out = ev.assign_blocks(blocks, [0.5], seed=12,
                           min_n_blocks_per_split=1)
    assert out.split.tolist() == [1, 0]
    out2 = ev.assign_blocks(blocks, [0.5], seed=12, remove_ratio=0.2,
                            min_n_blocks_per_split=1)
    assert out2.split.tolist() == [1, 0]
