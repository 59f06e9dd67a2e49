"""Visual sanity check of event<->signal alignment: ridge-decode word
frequency / phoneme voicing from the brain signal around word onsets.

Reference parity: bm/studies/visualcheck.py — if the decoding score
peaks shortly after the word onset, events and signal are aligned.
Plain-numpy ridge regression (no sklearn dependency).

Usage: python scripts/visualcheck.py [study=fake] [n_recordings=2]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from brainmagick_tpu import dataset as dset  # noqa: E402
from brainmagick_tpu.features.basic import zipf_frequency  # noqa: E402


def ridge_cv_score(X: np.ndarray, y: np.ndarray, alpha: float = 1e3,
                   n_folds: int = 4, seed: int = 0) -> float:
    """Cross-validated correlation of ridge predictions with y."""
    rng = np.random.RandomState(seed)
    folds = rng.randint(0, n_folds, len(X))
    X = (X - X.mean(0)) / (X.std(0) + 1e-8)
    y = (y - y.mean()) / (y.std() + 1e-8)
    scores = []
    for f in range(n_folds):
        tr, va = folds != f, folds == f
        if tr.sum() < 10 or va.sum() < 3:
            continue
        A = X[tr].T @ X[tr] + alpha * np.eye(X.shape[1])
        w = np.linalg.solve(A, X[tr].T @ y[tr])
        pred = X[va] @ w
        if pred.std() > 1e-9 and y[va].std() > 1e-9:
            scores.append(np.corrcoef(pred, y[va])[0, 1])
    return float(np.mean(scores)) if scores else 0.0


def main() -> None:
    opts = dict(t.split("=", 1) for t in sys.argv[1:])
    study = opts.get("study", "fake")
    n_recordings = int(opts.get("n_recordings", 2))

    recordings = dset._extract_recordings([{"study": study}], n_recordings)
    for recording in recordings:
        recording = dset._preload(recording, sample_rate=120)
        fact = dset.SegmentDataset.Factory(
            condition="word", tmin=-0.2, tmax=0.8, sample_rate=120,
            features=["WordLength"])
        data = fact.apply(recording)
        if data is None:
            print(f"{recording}: no word epochs")
            continue
        n = min(len(data), 400)
        megs, freqs = [], []
        events = recording.events()
        words = events[events.kind == "word"]
        for k in range(n):
            item = data[int(k)]
            megs.append(item.meg)
            start, _ = data._bounds_times(k)
            onset = start - data.tmin
            row = words.iloc[(words.start - onset).abs().argsort().iloc[0]]
            freqs.append(zipf_frequency(str(row.word),
                                        str(row.language or "en")))
        megs = np.stack(megs)  # [N, C, T]
        freqs = np.asarray(freqs)
        print(f"{recording}: decoding word frequency from "
              f"{megs.shape[1]}ch x {megs.shape[2]} samples, N={n}")
        times = np.arange(megs.shape[-1]) / 120.0 - 0.2
        step = max(1, megs.shape[-1] // 20)
        for t_idx in range(0, megs.shape[-1], step):
            score = ridge_cv_score(megs[..., t_idx], freqs)
            bar = "#" * max(0, int(40 * max(score, 0)))
            print(f"  t={times[t_idx]:+.2f}s r={score:+.3f} {bar}")


if __name__ == "__main__":
    main()
