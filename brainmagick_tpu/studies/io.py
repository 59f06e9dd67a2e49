"""Raw MEG/EEG file readers (FIF, CTF) — native-format ingestion.

The reference delegates all binary formats to MNE; this module will hold
from-scratch readers. FIF (used by gwilliams2022 BIDS and by the
reference's preprocessed caches) is a tagged binary tree; CTF .ds (MOUS)
is a directory format. Planned per SURVEY.md §7 step 7.
"""

from __future__ import annotations

from pathlib import Path

from .api import RawData


def read_fif(path: Path) -> RawData:
    raise NotImplementedError(
        f"FIF reader not implemented yet (needed for {path}). "
        "Planned: native tagged-tree parser, see SURVEY.md §7.")


def read_ctf(path: Path) -> RawData:
    raise NotImplementedError(
        f"CTF .ds reader not implemented yet (needed for {path}).")
