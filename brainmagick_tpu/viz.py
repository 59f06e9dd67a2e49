"""Event-timeline visualization.

Reference parity: bm/viz.py:28-135 — plot events as wrapped rows with
kind-coded colors/heights for visually checking stimulus alignment.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import pandas as pd

KIND_STYLE = {
    "block": dict(color="#bbbbbb", height=1.0),
    "sound": dict(color="#1f77b4", height=0.85),
    "word": dict(color="#2ca02c", height=0.6),
    "multiplewords": dict(color="#17becf", height=0.6),
    "phoneme": dict(color="#ff7f0e", height=0.35),
    "motor": dict(color="#9467bd", height=0.5),
    "special": dict(color="#d62728", height=0.5),
}


def plot_events(events: pd.DataFrame, window_s: float = 30.0,
                ax: tp.Optional[tp.Any] = None, show_desc: bool = True,
                desc_cropping_s: float = 0, desc_fontsize: float = 7,
                figsize: tuple = (10, 10), print_summary: bool = True):
    """Plot events in wrapped rows of `window_s` seconds each."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    if print_summary:
        counts = events.kind.value_counts()
        total = events.start.max() + events[events.duration < np.inf
                                            ].duration.max()
        print(f"{len(events)} events over ~{total:.1f}s: "
              + ", ".join(f"{k}={v}" for k, v in counts.items()))

    t_end = float(events.start.max()) + 1.0
    n_rows = int(np.ceil(t_end / window_s))
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    else:
        fig = ax.figure

    for row in events.itertuples():
        duration = row.duration if np.isfinite(row.duration) else \
            t_end - row.start
        style = KIND_STYLE.get(row.kind, dict(color="#333333", height=0.5))
        start, remaining = row.start, duration
        while remaining > 0:
            line = int(start // window_s)
            x0 = start - line * window_s
            span = min(remaining, window_s - x0)
            y0 = n_rows - 1 - line
            ax.add_patch(Rectangle(
                (x0, y0 + (1 - style["height"]) / 2), span,
                style["height"] * 0.8, alpha=0.4,
                facecolor=style["color"], edgecolor="none"))
            if show_desc and row.kind == "word" and span > desc_cropping_s:
                ax.text(x0, y0 + 0.5, str(getattr(row, "word", "")),
                        fontsize=desc_fontsize, va="center")
            start += span
            remaining -= span

    ax.set_xlim(0, window_s)
    ax.set_ylim(0, n_rows)
    ax.set_xlabel("time within row (s)")
    ax.set_yticks(np.arange(n_rows) + 0.5)
    ax.set_yticklabels([f"{(n_rows - 1 - k) * window_s:.0f}s"
                        for k in range(n_rows)])
    handles = [plt.Rectangle((0, 0), 1, 1, facecolor=s["color"], alpha=0.4)
               for k, s in KIND_STYLE.items() if k in set(events.kind)]
    labels = [k for k in KIND_STYLE if k in set(events.kind)]
    ax.legend(handles, labels, loc="upper right", fontsize=7)
    return fig, ax


def plot_attention_map(weights: np.ndarray, positions: np.ndarray,
                       recording: int = 0, n_outputs: int = 9,
                       figsize: tuple = (9, 9)):
    """Scatter the merger's spatial-attention weights over the 2D sensor
    layout, one panel per virtual output channel (the reference's
    Table-1 notebook visualization; inputs from play.attention_map)."""
    import matplotlib.pyplot as plt

    from .studies.api import invalid_position_mask

    w = weights[recording]           # [O, C]
    pos = positions[recording]       # [C, 2]
    valid = ~invalid_position_mask(pos)
    n = min(n_outputs, w.shape[0])
    side = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(side, side, figsize=figsize)
    axes = np.atleast_1d(axes).ravel()
    for k in range(n):
        ax = axes[k]
        sc = ax.scatter(pos[valid, 0], pos[valid, 1], c=w[k, valid],
                        cmap="viridis", s=24)
        ax.set_title(f"output {k}", fontsize=8)
        ax.set_xticks([])
        ax.set_yticks([])
        fig.colorbar(sc, ax=ax, fraction=0.046)
    for ax in axes[n:]:
        ax.axis("off")
    fig.tight_layout()
    return fig
