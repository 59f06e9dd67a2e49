"""Broderick2019 EEG study adapter (128ch biosemi @128Hz, 19 subjects,
"Natural Speech" audiobook runs).

Reference parity: bm/studies/broderick2019.py — gentle forced-alignment
JSONs give word/phoneme timings; the transcript text is tokenized into
sentences and aligned to the JSON words with Levenshtein matching to
recover sequence ids. The reference tokenizes with spacy; here a
deterministic regex sentence splitter fills that role (spacy model
downloads are unavailable offline).
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
        folder = get_paths().download
        with open(folder / "private" / f"align{run_id}.json") as f:
            align = json.load(f)
        meta = []
        for entry in align["words"]:
            entry.pop("endOffset", None)
            entry.pop("startOffset", None)
            success = entry.pop("case") == "success"
            if not success:
                continue
            if entry["alignedWord"] == "<unk>":
                success = False
            entry["success"] = success
            txt = entry.pop("word")
            entry["string"] = txt
            phones = entry.pop("phones")
            entry["phone"] = " ".join(k["phone"] for k in phones)
            entry["duration"] = entry["end"] - entry["start"]
            entry["aligned"] = entry.pop("alignedWord")
            entry["kind"] = "word"
            meta.append(entry)
            start = entry["start"]
            for phone in phones:
                phone["start"] = start
                start += phone["duration"]
                phone["end"] = start
                phone["kind"] = "phoneme"
                phone["success"] = success
                phone["aligned"] = phone["phone"]
                phone["string"] = phone["phone"]
                meta.append(phone)
        wav = folder / "private" / f"audio{run_id}.wav"
        sound = dict(start=0, kind="sound", filepath=str(wav))
        df = pd.DataFrame([sound] + meta)
        df["duration"] = df["end"] - df["start"]
        return df

    def _parse_txt(self, run_id: str) -> pd.DataFrame:
        txt_file = get_paths().download / "private" / f"oldman_run{run_id}.txt"
        with open(txt_file) as f:
            txt = f.read()
        rows = []
        for sequence_id, sent in enumerate(_sentences(txt)):
            for word_id, word in enumerate(sent.split()):
                word_ = re.sub(r"\W+", "", word)
                if not word_:
                    continue
                rows.append(dict(word=word_, original_word=word,
                                 word_id=word_id, sequence_id=sequence_id,
                                 sequence_uid=sent))
        return pd.DataFrame(rows)

    def __call__(self, run_id: str) -> pd.DataFrame:
        if run_id not in self._cache:
            self._cache[run_id] = self._process(run_id)
        return self._cache[run_id].copy()

    def _process(self, run_id: str) -> pd.DataFrame:
        df = self._parse_json(run_id)
        text = self._parse_txt(run_id)
        trans_words = df.query('kind=="word"')
        i, j = utils.match_list(trans_words.string.str.lower(),
                                text.word.str.lower())
        assert len(i) > 450

        fields = ("sequence_id", "sequence_uid", "word_id")
        for k in fields:
            df.loc[trans_words.iloc[i].index, k] = text.iloc[j][k].values
        missed = np.setdiff1d(range(len(df)), trans_words.index[i])

        # propagate the sequence of the previous matched word onto
        # phonemes and unmatched words between two matches
        prev = None
        indices: tp.List[tp.Any] = []
        for curr in range(len(df)):
            if curr in missed:
                indices.append(df.index[curr])
            else:
                if indices and prev is not None:
                    for k in fields:
                        df.loc[indices, k] = df.iloc[prev][k]
                    indices = []
                prev = curr

        df["condition"] = "sentence"
        for kind in ("word", "phoneme"):
            idx = df.kind == kind
            df.loc[idx, kind] = df.loc[idx].string
        df.loc[df.kind == "phoneme", "phoneme_id"] = 0  # dummy id
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
