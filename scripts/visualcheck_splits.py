"""Visual check of train/valid/test block splits: renders each
recording's event timeline colored by split assignment into an HTML
report (reference: bm/studies/visualcheck_splits.py, which writes an MNE
html report).

Usage: python scripts/visualcheck_splits.py [study=fake] [n_recordings=2]
       [out=splits_report.html]
"""

from __future__ import annotations

import base64
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from brainmagick_tpu import dataset as dset  # noqa: E402
from brainmagick_tpu.events import assign_blocks  # noqa: E402
from brainmagick_tpu.viz import plot_events  # noqa: E402

SPLIT_COLORS = {0: "#d62728", 1: "#ff7f0e", 2: "#2ca02c"}  # test/valid/train
SPLIT_NAMES = {0: "test", 1: "valid", 2: "train"}


def main() -> None:
    opts = dict(t.split("=", 1) for t in sys.argv[1:])
    study = opts.get("study", "fake")
    n_recordings = int(opts.get("n_recordings", 2))
    out = Path(opts.get("out", "splits_report.html"))

    sections = []
    recordings = dset._extract_recordings([{"study": study}], n_recordings)
    for recording in recordings:
        events = recording.events()
        blocks = events[events.kind == "block"]
        assigned = assign_blocks(blocks, [0.2, 0.1], seed=12,
                                 min_n_blocks_per_split=1)
        fig, ax = plot_events(events, print_summary=False, figsize=(12, 6))
        # overlay split colors on block spans
        import numpy as np
        window_s = 30.0
        t_end = float(events.start.max()) + 1.0
        n_rows = int(np.ceil(t_end / window_s))
        for row in assigned.itertuples():
            dur = row.duration if np.isfinite(row.duration) \
                else t_end - row.start
            start, remaining = row.start, dur
            while remaining > 0:
                line = int(start // window_s)
                x0 = start - line * window_s
                span = min(remaining, window_s - x0)
                ax.axhspan(n_rows - 1 - line, n_rows - line,
                           xmin=x0 / window_s, xmax=(x0 + span) / window_s,
                           color=SPLIT_COLORS[int(row.split)], alpha=0.12)
                start += span
                remaining -= span
        ax.set_title(f"{recording} — blocks colored by split "
                     f"(red=test, orange=valid, green=train)")
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=90, bbox_inches="tight")
        plt.close(fig)
        img = base64.b64encode(buf.getvalue()).decode()
        counts = assigned.split.map(SPLIT_NAMES).value_counts().to_dict()
        sections.append(
            f"<h2>{recording}</h2><p>blocks per split: {counts}</p>"
            f'<img src="data:image/png;base64,{img}"/>')

    out.write_text("<html><body><h1>Split assignment report</h1>"
                   + "\n".join(sections) + "</body></html>")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
