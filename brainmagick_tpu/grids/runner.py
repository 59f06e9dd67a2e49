"""Grid runner: resolve a grid module, list / run its jobs, show the
metric table (replaces `dora grid <name>`).

Usage:
    python -m brainmagick_tpu.grids nmi.main_table            # list jobs
    python -m brainmagick_tpu.grids nmi.main_table --run      # run locally
    python -m brainmagick_tpu.grids nmi.main_table --run --workers=4
    python -m brainmagick_tpu.grids nmi.main_table --table    # metric table

With --workers=N, N jobs run concurrently as subprocesses with per-job
logs under <out_dir>/logs/<sig>.log — the local equivalent of the
reference's submitit/SLURM job arrays
(/root/reference/scripts/run_eval_probs.py:497-513). Already-completed
XPs (done.json present) are skipped; interrupted runs resume from
their checkpoint; pass --force to rerun completed ones.
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


def _job_command(job: Job, out_dir: str) -> tp.List[str]:
    """Subprocess command line training one grid job."""
    return [sys.executable, "-m", "brainmagick_tpu.train",
            *job.to_tokens(), f"out_dir={out_dir!r}"]


def run_commands_with_logs(commands: tp.Sequence[tp.Tuple[str, tp.List[str]]],
                           log_dir: Path, workers: int
                           ) -> tp.Dict[str, int]:
    """Run (name, argv) subprocesses `workers` at a time, logging each
    to <log_dir>/<name>.log; returns {name: returncode}. Shared by the
    grid runner and the eval fan-out (the local equivalent of the
    reference's submitit/SLURM job arrays). Negative returncodes
    (killed by signal) count as failures."""
    import subprocess
    from concurrent.futures import ThreadPoolExecutor

    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)

    def _one(item: tp.Tuple[str, tp.List[str]]) -> tp.Tuple[str, int]:
        name, argv = item
        log_path = log_dir / f"{name}.log"
        print(f"launching {name} -> {log_path}")
        with open(log_path, "w") as log:
            proc = subprocess.run(argv, stdout=log,
                                  stderr=subprocess.STDOUT)
        status = "done" if proc.returncode == 0 else \
            f"FAILED rc={proc.returncode}"
        print(f"{status} {name}")
        return name, proc.returncode

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        results = dict(pool.map(_one, commands))
    failed = [name for name, rc in results.items() if rc != 0]
    if failed:
        logger.warning("%d/%d jobs failed: %s", len(failed),
                       len(results), ", ".join(failed))
    return results


def run_jobs(jobs: tp.Sequence[Job], out_dir: str = "./outputs",
             workers: int = 1, force: bool = False
             ) -> tp.Dict[str, tp.Optional[int]]:
    """Run grid jobs, `workers` at a time in subprocesses with per-job
    logs. Returns {sig: returncode} — 0 success, nonzero (incl.
    negative = killed by signal) failure, None skipped as already
    trained."""
    out = Path(out_dir)
    results: tp.Dict[str, tp.Optional[int]] = {}
    todo: tp.List[tp.Tuple[str, Job]] = []
    for job in jobs:
        sig = job.sig
        # done.json is written only when train() COMPLETES (incl. early
        # stop); history.json exists after every epoch, so testing it
        # would skip interrupted runs instead of resuming them from
        # their checkpoint
        if not force and (out / "xps" / sig / "done.json").exists():
            print(f"skipping {sig} (already trained; --force to rerun)")
            results[sig] = None
            continue
        todo.append((sig, job))

    if workers <= 1:
        # in-process sequential path (no subprocess/JAX restart cost)
        from ..train import run
        for k, (sig, job) in enumerate(todo):
            print(f"[{k + 1}/{len(todo)}] running {sig} {job.overrides}")
            cfg = job.to_config()
            cfg.out_dir = out_dir
            run(cfg)
            results[sig] = 0
        return results

    commands = [(sig, _job_command(job, out_dir)) for sig, job in todo]
    results.update(run_commands_with_logs(commands, out / "logs",
                                          workers))
    return results


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("available grids:", ", ".join(list_grids()))
        return
    name = argv[0]
    flags = set(argv[1:])
    workers = 1
    out_dir = "./outputs"
    for flag in flags:
        if flag.startswith("--workers="):
            workers = int(flag.split("=", 1)[1])
        elif flag.startswith("--out_dir="):
            out_dir = flag.split("=", 1)[1]
    explorer, jobs = get_grid(name)
    logger.info("Grid %s: %d jobs", name, len(jobs))
    if "--table" in flags:
        show_table(name, out_dir=out_dir)
        return
    if "--csv" in flags:
        export_csv(name, out_dir=out_dir)
        return
    if "--html" in flags:
        from .explore import export_html
        export_html(name, out_dir=out_dir)
        return
    if "--sbatch" in flags:
        from .slurm import export_sbatch
        kwargs: tp.Dict[str, tp.Any] = {}
        for flag in flags:
            for key in ("partition", "time", "cpus_per_task",
                        "gpus_per_task"):
                if flag.startswith(f"--{key}="):
                    val = flag.split("=", 1)[1]
                    kwargs[key] = (int(val) if key.endswith("_per_task")
                                   else val)
        export_sbatch(name, out_dir=out_dir, force="--force" in flags,
                      **kwargs)
        return
    if "--run" in flags:
        run_jobs(jobs, out_dir=out_dir, workers=workers,
                 force="--force" in flags)
        return
    for job in jobs:
        print(job.sig, job.overrides)


if __name__ == "__main__":
    main()
