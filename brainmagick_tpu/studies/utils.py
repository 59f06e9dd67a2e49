"""Shared helpers for study adapters (reference: bm/studies/utils.py)."""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np

from ..env import env


class StudyPaths:
    """Resolves a study's on-disk root from env.studies."""

    def __init__(self, study_name: str) -> None:
        if study_name not in env.studies:
            raise EnvironmentError(
                f"No data path configured for study '{study_name}'. Set "
                f"env.studies['{study_name}'] or BM_TPU_STUDY_"
                f"{study_name.upper()} to the dataset root.")
        self.path = Path(env.studies[study_name])
        self.download = self.path / "download"


def match_list(A: tp.Sequence[tp.Any], B: tp.Sequence[tp.Any]
               ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Align two sequences with Levenshtein edit operations and return the
    index pairs of matched elements.

    Reference: bm/studies/utils.py:24-70 — used to align presentation logs
    with MEG triggers and transcripts with forced alignments. Implemented
    here with a plain O(len(A)*len(B)) DP (no external Levenshtein dep).
    """
    A = [str(a) for a in A]
    B = [str(b) for b in B]
    n, m = len(A), len(B)
    # DP over edit distance, remembering the operation for backtracking
    dist = np.zeros((n + 1, m + 1), dtype=np.int32)
    dist[:, 0] = np.arange(n + 1)
    dist[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        ai = A[i - 1]
        row = dist[i]
        prev = dist[i - 1]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ai != B[j - 1])
            row[j] = min(sub, prev[j] + 1, row[j - 1] + 1)
    # backtrack, collecting positions kept by exact matches
    i, j = n, m
    a_idx: tp.List[int] = []
    b_idx: tp.List[int] = []
    while i > 0 and j > 0:
        sub = dist[i - 1, j - 1] + (A[i - 1] != B[j - 1])
        if sub <= dist[i - 1, j] + 1 and sub <= dist[i, j - 1] + 1:
            if A[i - 1] == B[j - 1]:
                a_idx.append(i - 1)
                b_idx.append(j - 1)
            i, j = i - 1, j - 1
        elif dist[i - 1, j] < dist[i, j - 1]:
            i -= 1
        else:
            j -= 1
    return np.array(a_idx[::-1]), np.array(b_idx[::-1])
