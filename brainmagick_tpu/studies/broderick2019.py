"""Broderick2019 EEG study adapter (128ch biosemi @128Hz, 19 subjects,
"Natural Speech" audiobook runs).

Reference parity: bm/studies/broderick2019.py — gentle forced-alignment
JSONs give word/phoneme timings; the transcript text is tokenized into
sentences and aligned to the JSON words with Levenshtein matching to
recover sequence ids. The reference tokenizes with spacy; here a
deterministic regex sentence splitter fills that role (spacy model
downloads are unavailable offline). The parsing itself is re-derived
from the gentle JSON schema in vectorized pandas and pinned by
tests/golden/broderick_events.csv.
"""

from __future__ import annotations

import json
import re
import typing as tp

import numpy as np
import pandas as pd

from . import api, utils
from ..events import extract_sequence_info


def get_paths() -> utils.StudyPaths:
    return utils.StudyPaths(Broderick2019Recording.study_name())


def _sentences(text: str) -> tp.List[str]:
    """Greedy sentence split on .!? followed by whitespace+capital."""
    parts = re.split(r"(?<=[.!?])\s+", text.replace("\n", " "))
    return [p.strip() for p in parts if p.strip()]


class _BroderickMetadata:
    """Parses + aligns one run's gentle JSON and transcript."""

    def __init__(self) -> None:
        self._cache: tp.Dict[str, pd.DataFrame] = {}

    def _parse_json(self, run_id: str) -> pd.DataFrame:
        """One tidy frame from gentle's alignment: a leading ``sound``
        row, then each successfully-located word followed by its
        phonemes (onsets cumulated from the word onset). Words gentle
        could not locate in the audio (``case != success``) are
        dropped; words located but not recognized (``<unk>``) are kept
        with ``success=False``."""
        private = get_paths().download / "private"
        align = json.loads((private / f"align{run_id}.json").read_text())
        rows = [dict(start=0, kind="sound",
                     filepath=str(private / f"audio{run_id}.wav"))]
        for w in align["words"]:
            if w["case"] != "success":
                continue
            ok = w["alignedWord"] != "<unk>"
            phones = w["phones"]
            rows.append(dict(
                start=w["start"], end=w["end"], success=ok,
                string=w["word"], aligned=w["alignedWord"], kind="word",
                phone=" ".join(p["phone"] for p in phones)))
            onsets = w["start"] + np.concatenate(
                [[0.0], np.cumsum([p["duration"] for p in phones])])
            rows += [dict(start=s, end=e, success=ok, string=p["phone"],
                          aligned=p["phone"], kind="phoneme",
                          phone=p["phone"])
                     for p, s, e in zip(phones, onsets[:-1], onsets[1:])]
        df = pd.DataFrame(rows)
        df["duration"] = df["end"] - df["start"]
        return df

    def _parse_txt(self, run_id: str) -> pd.DataFrame:
        """Transcript words with their sentence/word coordinates.
        Tokens with no word characters (stand-alone punctuation) are
        dropped *after* word_id assignment, so word_id keeps counting
        raw tokens — the ids only need to be sentence-monotonic."""
        txt = (get_paths().download / "private"
               / f"oldman_run{run_id}.txt").read_text()
        records = [
            (re.sub(r"\W+", "", token), token, word_id, sequence_id, sent)
            for sequence_id, sent in enumerate(_sentences(txt))
            for word_id, token in enumerate(sent.split())]
        df = pd.DataFrame(records, columns=[
            "word", "original_word", "word_id", "sequence_id",
            "sequence_uid"])
        return df[df.word != ""].reset_index(drop=True)

    def __call__(self, run_id: str) -> pd.DataFrame:
        if run_id not in self._cache:
            self._cache[run_id] = self._process(run_id)
        return self._cache[run_id].copy()

    def _process(self, run_id: str) -> pd.DataFrame:
        """Matched word rows get their transcript sentence coordinates;
        every other row (phonemes, fillers, the sound row) inherits the
        nearest preceding match — except rows after the LAST match,
        which stay unresolved. Rows before the first match inherit the
        first match. Pinned by tests/golden/broderick_events.csv."""
        df = self._parse_json(run_id)
        text = self._parse_txt(run_id)
        words = df[df.kind == "word"]
        i, j = utils.match_list(words.string.str.lower(),
                                text.word.str.lower())
        assert len(i) > 450, f"suspiciously few matched words: {len(i)}"

        fields = ["sequence_id", "sequence_uid", "word_id"]
        matched = words.index[i]  # df carries a fresh RangeIndex
        cols = pd.DataFrame(index=df.index, columns=fields, dtype=object)
        cols.loc[matched, fields] = text[fields].to_numpy()[j]
        cols = cols.ffill().bfill()
        cols.iloc[matched.max() + 1:] = np.nan
        for k in ("sequence_id", "word_id"):
            cols[k] = pd.to_numeric(cols[k])
        df[fields] = cols

        df["condition"] = "sentence"
        is_word = df.kind == "word"
        is_phoneme = df.kind == "phoneme"
        df.loc[is_word, "word"] = df.loc[is_word, "string"]
        df.loc[is_phoneme, "phoneme"] = df.loc[is_phoneme, "string"]
        df.loc[is_phoneme, "phoneme_id"] = 0  # gentle gives no ARPAbet id
        return df


class Broderick2019Recording(api.Recording):

    data_url = "https://datadryad.org/stash/dataset/doi:10.5061/dryad.070jc"
    paper_url = "https://pubmed.ncbi.nlm.nih.gov/29478856/"
    doi = "https://doi.org/10.5061/dryad.070jc"
    licence = "CC0 1.0"
    modality = "audio"
    language = "english"
    device = "eeg"
    description = "128ch biosemi EEG, natural speech audiobook listening."
    _metadata = _BroderickMetadata()

    @classmethod
    def iter(cls) -> tp.Iterator["Broderick2019Recording"]:  # type: ignore[override]
        try:
            paths = get_paths()
        except EnvironmentError:
            return
        eeg_root = paths.download / "Natural Speech" / "EEG"
        if not eeg_root.exists():
            return
        subjects = sorted(
            int(f.name.split("Subject")[1]) for f in eeg_root.iterdir()
            if "Subject" in f.name)
        for subject in subjects:
            for run_id in range(1, 21):
                yield cls(subject_uid=str(subject), run_id=str(run_id))

    def __init__(self, subject_uid: str, run_id: str) -> None:
        super().__init__(subject_uid=subject_uid,
                         recording_uid=f"{subject_uid}_run{run_id}")
        self.run_id = run_id

    def _load_raw(self) -> api.RawData:
        from scipy.io import loadmat
        from .fake import grid_positions

        paths = get_paths()
        eeg_fname = (paths.download / "Natural Speech" / "EEG"
                     / f"Subject{self.subject_uid}"
                     / f"Subject{self.subject_uid}_Run{self.run_id}.mat")
        mat = loadmat(str(eeg_fname))
        assert mat["fs"][0][0] == 128
        eeg = np.asarray(mat["eegData"].T, dtype=np.float32) * 1e6
        assert len(eeg) == 128
        ch_names = [f"A{k+1}" for k in range(128)]  # biosemi128 names
        return api.RawData(data=eeg, sample_rate=128.0, ch_names=ch_names,
                           positions=grid_positions(128))

    def _load_events(self) -> pd.DataFrame:
        events = self._metadata(self.run_id)
        events[["language", "modality"]] = self.language, self.modality
        events = extract_sequence_info(events, phoneme=False)
        events = events.event.create_blocks(groupby="sentence")
        return events
