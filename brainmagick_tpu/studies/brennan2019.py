"""Brennan2019 EEG study adapter (60ch @500Hz, 33 good subjects, Alice
audiobook).

Reference parity: bm/studies/brennan2019.py — MATLAB `proc` structs give
per-word trial metadata joined with AliceChapterOne-EEG.csv; `raw` structs
hold the EEG. Implemented with scipy.io.loadmat (no MNE); the sensor
layout is the easycap-M10 montage the reference applies via
`mne.channels.make_standard_montage("easycap-M10")`
(bm/studies/brennan2019.py:242-243), embedded below from its defining
geometry.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import pandas as pd

from . import api, utils
from ..events import extract_sequence_info

SFREQ = 500.0

BAD_SUBJECTS = ["S24", "S26", "S27", "S30", "S32", "S34", "S35", "S36", "S02"]


def get_paths() -> utils.StudyPaths:
    return utils.StudyPaths(Brennan2019Recording.study_name())


# -- easycap-M10 montage -------------------------------------------------------
# The M10 is easycap's 61-site EQUIDISTANT arrangement: one vertex
# electrode plus concentric rings of 6/12/18/24 sites at polar angles of
# 23/46/69/92 degrees (constant ~23deg inter-electrode arc — the
# montage's defining property), numbered ring by ring starting at the
# front (nose) and proceeding clockwise seen from above. Site 29 served
# as the online reference in Brennan2019, so the data channels are named
# "1".."28","30".."61". The dict maps site number -> (theta_deg,
# phi_deg) with phi 90 = front, decreasing clockwise.
_M10_RINGS = ((0.0, 1), (23.0, 6), (46.0, 12), (69.0, 18), (92.0, 24))


def easycap_m10() -> tp.Dict[int, tp.Tuple[float, float]]:
    table: tp.Dict[int, tp.Tuple[float, float]] = {}
    site = 1
    for theta, count in _M10_RINGS:
        for k in range(count):
            table[site] = (theta, 90.0 - k * 360.0 / count)
            site += 1
    return table


def m10_positions(ch_names: tp.Sequence[str]) -> np.ndarray:
    """Normalized 2D layout for channels named by M10 site number
    (azimuthal-equidistant projection from the vertex, the
    mne.find_layout role; x = right, y = front)."""
    table = easycap_m10()
    out = np.full((len(ch_names), 2), api.INVALID_POSITION,
                  dtype=np.float32)
    raw = np.zeros((len(ch_names), 2), dtype=np.float64)
    valid = np.zeros(len(ch_names), dtype=bool)
    for i, name in enumerate(ch_names):
        try:
            theta, phi = table[int(name)]
        except (ValueError, KeyError):
            continue
        raw[i] = (theta * np.cos(np.deg2rad(phi)),
                  theta * np.sin(np.deg2rad(phi)))
        valid[i] = True
    if valid.any():
        lo, hi = raw[valid].min(axis=0), raw[valid].max(axis=0)
        span = np.maximum(hi - lo, 1e-9)
        out[valid] = ((raw[valid] - lo) / span).astype(np.float32)
    return out


def _read_meta(fname) -> pd.DataFrame:
    """Events from the MATLAB proc struct + chapter CSV
    (bm/studies/brennan2019.py:88-170)."""
    from scipy.io import loadmat

    proc = loadmat(fname, squeeze_me=True, chars_as_strings=True,
                   struct_as_record=True, simplify_cells=True)["proc"]
    meta = proc["trl"]
    assert len(meta) == proc["tot_trials"]
    columns = list(proc["varnames"])
    if len(columns) != meta.shape[1]:
        columns = ["start_sample", "stop_sample", "offset"] + columns
        assert len(columns) == meta.shape[1]
    meta = pd.DataFrame(meta, columns=["_" + c for c in columns])
    assert len(meta) == 2129

    paths = get_paths()
    story = pd.read_csv(paths.download / "AliceChapterOne-EEG.csv")
    events = meta.join(story)
    events["kind"] = "word"
    events["condition"] = "sentence"
    events["duration"] = events.offset - events.onset
    events = events.rename(columns=dict(
        Word="word", Position="word_id", Sentence="sequence_id"))
    events["start"] = events["_start_sample"] / SFREQ

    # one sound event per audio segment; wavs can start before EEG onset
    wav_file = paths.download / "audio" / "DownTheRabbitHoleFinal_SoundFile%i.wav"
    sounds = []
    for segment, d in events.groupby("Segment"):
        start = d.iloc[0].start - d.iloc[0].onset
        sounds.append(dict(kind="sound", start=start,
                           filepath=str(wav_file) % segment))
    events = pd.concat([events, pd.DataFrame(sounds)], ignore_index=True)
    events = events.sort_values("start").reset_index()
    keep = ["start", "duration", "kind", "word", "word_id", "sequence_id",
            "condition", "filepath"]
    events = events[keep]
    events[["language", "modality"]] = "english", "audio"
    events = extract_sequence_info(events)
    events = events.event.create_blocks(groupby="sentence")
    return events.event.validate()


def _read_eeg(fname) -> api.RawData:
    """EEG from the MATLAB raw struct (bm/studies/brennan2019.py:173-248).
    Keeps the 60 EEG channels (drops VEOG/AUD), scaled to volts."""
    from scipy.io import loadmat

    mat = loadmat(str(fname), squeeze_me=True, chars_as_strings=True,
                  struct_as_record=True, simplify_cells=True)["raw"]
    sfreq = mat["hdr"]["Fs"]
    assert sfreq == SFREQ and mat["fsample"] == sfreq
    ch_names = list(mat["hdr"]["label"])
    assert ch_names[60] == "VEOG"
    data = np.asarray(mat["trial"], dtype=np.float32)
    assert data.shape[0] == len(ch_names)
    # keep the 60 EEG channels only (reference picks eeg after montage)
    data = data[:60] * 1e-6
    ch_names = ch_names[:60]
    return api.RawData(data=data, sample_rate=float(sfreq), ch_names=ch_names,
                       positions=m10_positions(ch_names))


class Brennan2019Recording(api.Recording):

    data_url = "https://deepblue.lib.umich.edu/data/concern/data_sets/bg257f92t"
    paper_url = ("https://journals.plos.org/plosone/article?id=10.1371/"
                 "journal.pone.0207741")
    doi = "https://doi.org/10.1371/journal.pone.0207741"
    licence = "CC BY 4.0"
    modality = "audio"
    language = "english"
    device = "eeg"
    description = "EEG of Alice in Wonderland (Brennan & Hale 2019), 0.1-200Hz."

    @classmethod
    def iter(cls) -> tp.Iterator["Brennan2019Recording"]:  # type: ignore[override]
        try:
            paths = get_paths()
        except EnvironmentError:
            return
        proc = paths.download / "proc"
        if not proc.exists():
            return
        subjects = sorted(
            f.name.split(".")[0] for f in proc.iterdir()
            if f.name.startswith("S") and f.name.endswith(".mat"))
        for subject in subjects:
            if subject in BAD_SUBJECTS:
                continue
            yield cls(subject_uid=subject)

    def __init__(self, subject_uid: str) -> None:
        super().__init__(subject_uid=subject_uid, recording_uid=subject_uid)

    def _load_raw(self) -> api.RawData:
        return _read_eeg(get_paths().download / f"{self.subject_uid}.mat")

    def _load_events(self) -> pd.DataFrame:
        return _read_meta(get_paths().download / "proc" / f"{self.subject_uid}.mat")
