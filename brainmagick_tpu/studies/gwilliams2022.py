"""Gwilliams2022 MEG study adapter (208ch, 27 subjects, English stories).

Reference parity: bm/studies/gwilliams2022.py — BIDS layout iterated as
subject x session(2) x story(4); events are stored as MNE annotations
whose descriptions are python dict literals. The headline 41% top-1
segment-retrieval benchmark is computed on this study.

Raw MEG loading requires the on-disk BIDS dataset plus a FIF/KIT reader;
with no dataset configured `iter()` yields nothing (download needs
network egress, which is unavailable here).
"""

from __future__ import annotations

import ast
import typing as tp
from itertools import product
from pathlib import Path

import pandas as pd

from . import api
from . import utils
from ..events import extract_sequence_info

STORIES = ("lw1", "cable_spool_fort", "easy_money", "The_Black_Willow")


class Gwilliams2022Recording(api.Recording):
    data_url = ("https://drive.google.com/drive/u/0/folders/"
                "1u1l4oX_OfammKPT49OlgbAmjGGuaA4qE")
    paper_url = "https://www.biorxiv.org/content/10.1101/2020.04.04.025684v2"
    doi = "https://doi.org/10.1101/2020.04.04.025684"
    licence = ""
    modality = "audio"
    language = "en"
    device = "meg"
    description = "21+ subjects listened to 4 stories, in 2 x 1h identical sessions."

    @classmethod
    def paths(cls) -> utils.StudyPaths:
        return utils.StudyPaths(cls.study_name())

    @classmethod
    def iter(cls) -> tp.Iterator["Gwilliams2022Recording"]:  # type: ignore[override]
        try:
            paths = cls.paths()
        except EnvironmentError:
            return
        subject_file = paths.download / "participants.tsv"
        if not subject_file.exists():
            return
        subjects = pd.read_csv(subject_file, sep="\t")
        subjects = [p.split("-")[1] for p in subjects.participant_id]
        for subject, session, story in product(subjects, ("0", "1"),
                                               (str(k) for k in range(4))):
            bids_dir = (paths.download / f"sub-{subject}" / f"ses-{session}"
                        / "meg")
            stem = f"sub-{subject}_ses-{session}_task-{story}_meg"
            # one recording per existing task file (the reference checks
            # the BIDSPath per story, gwilliams2022.py:76-84)
            if not any((bids_dir / (stem + ext)).exists()
                       for ext in (".fif", ".con", ".ds")):
                continue
            yield cls(subject_uid=subject, session=session, story=story)

    def __init__(self, subject_uid: str, session: str, story: str) -> None:
        super().__init__(
            subject_uid=subject_uid,
            recording_uid=f"{subject_uid}_session{session}_story{story}")
        self.story = story
        self.session = session

    def _bids_stem(self) -> Path:
        paths = self.paths()
        return (paths.download / f"sub-{self.subject_uid}"
                / f"ses-{self.session}" / "meg"
                / f"sub-{self.subject_uid}_ses-{self.session}"
                  f"_task-{self.story}_meg")

    def _load_raw(self) -> api.RawData:
        """Load the raw MEG, dispatching on the on-disk format: the real
        MEG-MASC release ships KIT .con (read natively via studies/kit),
        .fif covers converted/test data, .ds CTF exports (the reference
        lets read_raw_bids dispatch, gwilliams2022.py:96-106)."""
        from .io import FIFFV_MEG_CH, read_fif
        stem = self._bids_stem()
        if stem.with_suffix(".con").exists():
            from .kit import read_kit
            raw = read_kit(stem.with_suffix(".con"))
        elif stem.with_suffix(".ds").exists():
            from .ctf import read_ctf
            raw = read_ctf(stem.with_suffix(".ds"))
        else:
            raw = read_fif(stem.with_suffix(".fif"))
        if raw.ch_kinds is not None:
            # keep MEG data channels only (reference pick_types,
            # gwilliams2022.py:107-108)
            import numpy as np
            keep = np.flatnonzero(np.asarray(raw.ch_kinds) == FIFFV_MEG_CH)
            if len(keep) and len(keep) < raw.n_channels:
                raw = api.RawData(
                    data=np.ascontiguousarray(raw.data[keep]),
                    sample_rate=raw.sample_rate,
                    ch_names=[raw.ch_names[i] for i in keep],
                    positions=raw.positions[keep],
                    ch_kinds=[raw.ch_kinds[i] for i in keep])
        return raw

    def _load_events(self) -> pd.DataFrame:
        """Parse the BIDS events.tsv whose trial_type column carries python
        dict literals (the reference reads the same payload from MNE
        annotations, bm/studies/gwilliams2022.py:111-136)."""
        paths = self.paths()
        events_file = Path(str(self._bids_stem()).replace("_meg", "_events")
                           ).with_suffix(".tsv")
        rows = pd.read_csv(events_file, sep="\t")
        events = []
        for _, row in rows.iterrows():
            event = ast.literal_eval(row["trial_type"])
            event["start"] = float(row["onset"])
            event["duration"] = float(row["duration"])
            if event.get("kind") == "sound":
                stem, _, ext = event["sound"].lower().rsplit(".", 2)
                event["filepath"] = str(paths.download / (stem + "." + ext))
            events.append(event)
        df = pd.DataFrame(events)
        df[["language", "modality"]] = "english", "audio"
        df = extract_sequence_info(df)
        df = df.event.create_blocks(groupby="sentence")
        return df
