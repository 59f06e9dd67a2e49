"""Grid runner: resolve a grid module, list / run its jobs, show the
metric table (replaces `dora grid <name>`).

Usage:
    python -m brainmagick_tpu.grids nmi.main_table            # list jobs
    python -m brainmagick_tpu.grids nmi.main_table --run      # run locally
    python -m brainmagick_tpu.grids nmi.main_table --table    # metric table
"""

from __future__ import annotations

import importlib
import json
import logging
import pkgutil
import sys
import typing as tp
from pathlib import Path

from .launcher import Explorer, Job, Launcher

logger = logging.getLogger(__name__)


def list_grids() -> tp.List[str]:
    from . import nmi
    names = []
    for mod in pkgutil.iter_modules(nmi.__path__):
        names.append(f"nmi.{mod.name}")
    return names


def get_grid(name: str) -> tp.Tuple[Explorer, tp.List[Job]]:
    module = importlib.import_module(f"brainmagick_tpu.grids.{name}")
    explorer = module.explorer
    assert isinstance(explorer, Explorer), \
        f"grid {name} must define an @Explorer-decorated `explorer`"
    launcher = Launcher()
    explorer(launcher)
    return explorer, launcher.jobs


def show_table(name: str, out_dir: str = "./outputs") -> None:
    explorer, jobs = get_grid(name)
    rows = []
    for job in jobs:
        cfg = job.to_config()
        history_path = Path(out_dir) / "xps" / cfg.sig / "history.json"
        if history_path.exists():
            with open(history_path) as f:
                history = json.load(f)
            rows.append(explorer.table_row(cfg.sig, history))
        else:
            rows.append({"sig": cfg.sig, "epoch": "-", "train": "-",
                         "valid": "-", "best": "-"})
    if not rows:
        print("no jobs")
        return
    keys = list(rows[0].keys())
    widths = {k: max(len(k), *(len(str(r.get(k, "-"))) for r in rows))
              for k in keys}
    print("  ".join(k.rjust(widths[k]) for k in keys))
    for row in rows:
        print("  ".join(str(row.get(k, "-")).rjust(widths[k]) for k in keys))


def export_csv(name: str, out_dir: str = "./outputs",
               dest: tp.Optional[str] = None) -> Path:
    """Flat (sig, overrides..., metrics...) CSV for hyperparameter
    explorers like HiPlot (bm/grids/_hiplot.py role)."""
    import csv

    explorer, jobs = get_grid(name)
    rows = []
    for job in jobs:
        cfg = job.to_config()
        row: tp.Dict[str, tp.Any] = {"sig": cfg.sig}
        row.update({k: repr(v) for k, v in job.overrides.items()})
        history_path = Path(out_dir) / "xps" / cfg.sig / "history.json"
        if history_path.exists():
            with open(history_path) as f:
                history = json.load(f)
            stages = explorer.process_history(history)
            for stage, metrics in stages.items():
                for key, val in metrics.items():
                    if isinstance(val, (int, float)):
                        row[f"{stage}.{key}"] = val
        rows.append(row)
    dest_path = Path(dest or (Path(out_dir) / f"grid_{name}.csv"))
    keys: tp.List[str] = []
    for row in rows:
        keys.extend(k for k in row if k not in keys)
    with open(dest_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {dest_path} ({len(rows)} rows)")
    return dest_path


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("available grids:", ", ".join(list_grids()))
        return
    name = argv[0]
    flags = set(argv[1:])
    explorer, jobs = get_grid(name)
    logger.info("Grid %s: %d jobs", name, len(jobs))
    if "--table" in flags:
        show_table(name)
        return
    if "--csv" in flags:
        export_csv(name)
        return
    if "--run" in flags:
        from ..train import run
        for k, job in enumerate(jobs):
            cfg = job.to_config()
            print(f"[{k + 1}/{len(jobs)}] running {cfg.sig} "
                  f"{job.overrides}")
            run(cfg)
        return
    for job in jobs:
        print(job.sig, job.overrides)


if __name__ == "__main__":
    main()
