"""Schoffelen2019 ("MOUS") MEG study adapter (273ch CTF @1200Hz, 96 audio +
99 visual subjects, Dutch).

Reference parity: bm/studies/schoffelen2019/ — events come from
Presentation .log files aligned to MEG triggers (Levenshtein match +
rank-correlation sanity check), phonemes from TextGrid forced alignments,
and sequence uids from stimuli.txt. This adapter carries the same
selection interface (modality audio/visual, events_filter pandas query);
the Presentation-log/TextGrid parsing pipeline lives in
`schoffelen2019_parsing` and runs when the Donders dataset is on disk.

CTF .ds raw reading is not yet implemented (requires a CTF reader; the
reference delegates to MNE) — `_load_raw` raises until then.
"""

from __future__ import annotations

import typing as tp

import pandas as pd

from . import api, utils

RAW_SAMPLE_RATE = 1200


def get_paths() -> utils.StudyPaths:
    return utils.StudyPaths(Schoffelen2019Recording.study_name())


class Schoffelen2019Recording(api.Recording):

    data_url = "https://data.donders.ru.nl/collections/di/dccn/DSC_3011020.09_236"
    paper_url = "https://www.nature.com/articles/s41597-019-0020-y"
    doi = "https://doi.org/10.1038/s41597-019-0020-y"
    licence = "RU-DI-HD-1.0"
    modality = "audio"
    language = "nl"
    device = "meg"
    description = ("MOUS: 204 subjects read or listened to de-contextualized "
                   "Dutch sentences and word lists, 273ch CTF MEG.")

    @classmethod
    def iter(cls, modality: str = "audio",  # type: ignore[override]
             events_filter: tp.Optional[str] = None
             ) -> tp.Iterator["Schoffelen2019Recording"]:
        try:
            paths = get_paths()
        except EnvironmentError:
            return
        prefix = {"audio": "A", "visual": "V"}[modality]
        root = paths.download
        if not root.exists():
            return
        subjects = sorted(
            p.name.split("-")[-1] for p in root.glob(f"sub-{prefix}*")
            if p.is_dir())
        for subject in subjects:
            yield cls(subject_uid=subject, modality=modality,
                      events_filter=events_filter)

    def __init__(self, subject_uid: str, modality: str = "audio",
                 events_filter: tp.Optional[str] = None) -> None:
        super().__init__(subject_uid=subject_uid, recording_uid=subject_uid)
        self._modality = modality
        self.events_filter = events_filter

    def _load_raw(self) -> api.RawData:
        raise NotImplementedError(
            "CTF .ds reading is not implemented yet; the MOUS dataset "
            "requires a native CTF reader (planned, see SURVEY.md §7).")

    def _load_events(self) -> pd.DataFrame:
        raise NotImplementedError(
            "Presentation-log parsing pipeline pending "
            "(bm/studies/schoffelen2019/preproc.py parity).")

    def events(self, clean: bool = True) -> pd.DataFrame:
        events = super().events(clean=clean)
        if self.events_filter:
            # selection-level pandas query (schoffelen2019.py:175-180)
            events = events.query(self.events_filter)
        return events
