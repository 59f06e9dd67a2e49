"""Paper-table analysis over offline-eval outputs.

The reference ships this as notebook templates
(/root/reference/notebook_templates/{Table 1,Table 4 Ablation,
Table 4 p_values,Other tables}.ipynb): load each XP's eval artifacts
(probs_segment / vocab_segment / metadata / solver_config), aggregate
top-k segment accuracy per (dataset, variant) across seeds, and compute
paired significance between variants. This is the same analysis as a
tested CLI module.

Usage:
    python scripts/paper_tables.py table grid=nmi.main_table \
        [out_dir=./outputs] [topk=1]
    python scripts/paper_tables.py pvalues grid=nmi.ablation_final \
        [baseline=<variant>] [out_dir=./outputs]
"""

from __future__ import annotations

import json
import sys
import typing as tp
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_eval(sig: str, out_dir: str = "./outputs") -> tp.Dict[str, tp.Any]:
    """One XP's eval artifacts (written by brainmagick_tpu.eval)."""
    import yaml

    eval_dir = Path(out_dir) / "eval" / sig
    out = {
        "sig": sig,
        "probs": np.load(eval_dir / "probs_segment.npy"),
        "vocab": np.load(eval_dir / "vocab_segment.npy"),
        "metadata": pd.read_csv(eval_dir / "metadata.csv"),
        "acc": pd.read_csv(eval_dir / "acc.csv").set_index("topk"),
    }
    with open(eval_dir / "solver_config.yaml") as f:
        out["config"] = yaml.safe_load(f)
    return out


def variant_name(config: tp.Mapping[str, tp.Any]) -> str:
    """Short human label of the XP variant (the notebooks' `name`
    column): which toggles differ from the paper base."""
    simple = config.get("simpleconv", {})
    flags = []
    for key, base in (("merger", True), ("glu", 2),
                      ("initial_linear", 270), ("gelu", True),
                      ("skip", True), ("complex_out", True),
                      ("subject_layers", True)):
        if simple.get(key, base) in (False, 0, None):
            flags.append(f"no_{key}")
    if config.get("norm", {}).get("clip") is False:
        flags.append("no_clamp")
    loss = config.get("optim", {}).get("loss")
    if loss and loss != "clip":
        flags.append(loss)
    feats = config.get("dset", {}).get("features") or []
    main_feats = [f for f in feats if f != "WordHash"]
    if main_feats and main_feats != ["Wav2VecTransformer"]:
        flags.append("+".join(main_feats))
    if config.get("feature_model_name"):
        flags.append(str(config["feature_model_name"]))
    return "base" if not flags else ",".join(flags)


def dataset_name(config: tp.Mapping[str, tp.Any]) -> str:
    sels = config.get("dset", {}).get("selections") or []
    return "-".join(s.get("study", str(s)) if isinstance(s, dict) else
                    str(s) for s in sels)


def _evaluated_sigs(grid: str, out_dir: str) -> tp.List[str]:
    from brainmagick_tpu.grids import get_grid

    _, jobs = get_grid(grid)
    sigs = [job.sig for job in jobs]
    return [s for s in sigs
            if (Path(out_dir) / "eval" / s / "acc.csv").exists()]


def build_table(grid: str, out_dir: str = "./outputs",
                topk: int = 1) -> pd.DataFrame:
    """Mean ± std top-k segment accuracy per (dataset, variant) across
    seeds — the NMI paper's Table-1/2 aggregation."""
    rows = []
    for sig in _evaluated_sigs(grid, out_dir):
        data = load_eval(sig, out_dir)
        rows.append(dict(
            sig=sig,
            dataset=dataset_name(data["config"]),
            variant=variant_name(data["config"]),
            seed=data["config"].get("seed"),
            acc=float(data["acc"].loc[topk, "acc_segment"])))
    if not rows:
        raise SystemExit(f"no evaluated XPs for grid {grid} under "
                         f"{out_dir}/eval — run brainmagick_tpu.eval "
                         f"grid={grid} first")
    df = pd.DataFrame(rows)
    table = df.groupby(["dataset", "variant"]).acc.agg(
        ["mean", "std", "count"]).reset_index()
    table["acc_pct"] = (100 * table["mean"]).round(2)
    table["std_pct"] = (100 * table["std"].fillna(0.0)).round(2)
    return table


def per_sample_hits(data: tp.Mapping[str, tp.Any]) -> np.ndarray:
    """[N] bool: top-1 prediction matches the true segment (the
    notebooks recompute per-sample correctness from probs+vocab)."""
    probs = data["probs"]
    vocab = data["vocab"]
    true_hashes = data["metadata"]["segment_hashes"].to_numpy()
    pred = vocab[np.argmax(probs, axis=1)]
    return pred == true_hashes


def paired_pvalue(hits_a: np.ndarray, hits_b: np.ndarray) -> float:
    """Two-sided McNemar exact test on paired per-sample correctness
    (the discordant-pair binomial — the right paired test for matched
    classification outcomes)."""
    from scipy import stats

    assert hits_a.shape == hits_b.shape
    n01 = int((~hits_a & hits_b).sum())
    n10 = int((hits_a & ~hits_b).sum())
    n = n01 + n10
    if n == 0:
        return 1.0
    return float(stats.binomtest(min(n01, n10), n, 0.5,
                                 alternative="two-sided").pvalue * 1.0)


def build_pvalues(grid: str, out_dir: str = "./outputs",
                  baseline: str = "base") -> pd.DataFrame:
    """Per-dataset paired significance of every variant against the
    baseline variant, samples matched by (seed, sample order) — the
    Table-4 p-values analysis."""
    evals: tp.Dict[tp.Tuple[str, str, tp.Any], np.ndarray] = {}
    accs: tp.Dict[tp.Tuple[str, str, tp.Any], float] = {}
    for sig in _evaluated_sigs(grid, out_dir):
        data = load_eval(sig, out_dir)
        key = (dataset_name(data["config"]),
               variant_name(data["config"]),
               data["config"].get("seed"))
        evals[key] = per_sample_hits(data)
        accs[key] = float(evals[key].mean())

    rows = []
    datasets = {k[0] for k in evals}
    variants = {k[1] for k in evals}
    for dataset in sorted(datasets):
        for variant in sorted(variants - {baseline}):
            pairs = []
            for (ds, var, seed), hits in evals.items():
                base_key = (ds, baseline, seed)
                if ds == dataset and var == variant and base_key in evals:
                    base_hits = evals[base_key]
                    if len(base_hits) == len(hits):
                        pairs.append((base_hits, hits))
            if not pairs:
                continue
            base_all = np.concatenate([p[0] for p in pairs])
            var_all = np.concatenate([p[1] for p in pairs])
            rows.append(dict(
                dataset=dataset, variant=variant,
                acc_base=float(base_all.mean()),
                acc_variant=float(var_all.mean()),
                delta=float(var_all.mean() - base_all.mean()),
                p_value=paired_pvalue(base_all, var_all),
                n_samples=len(base_all), n_seeds=len(pairs)))
    return pd.DataFrame(rows)


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    mode = argv[0]
    kw = dict(t.split("=", 1) for t in argv[1:])
    out_dir = kw.get("out_dir", "./outputs")
    if mode == "table":
        table = build_table(kw["grid"], out_dir,
                            topk=int(kw.get("topk", 1)))
        print(table.to_string(index=False))
        dest = Path(out_dir) / f"table_{kw['grid']}.csv"
        table.to_csv(dest, index=False)
        print(f"wrote {dest}")
    elif mode == "pvalues":
        table = build_pvalues(kw["grid"], out_dir,
                              baseline=kw.get("baseline", "base"))
        print(table.to_string(index=False))
        dest = Path(out_dir) / f"pvalues_{kw['grid']}.csv"
        table.to_csv(dest, index=False)
        print(f"wrote {dest}")
    else:
        raise SystemExit(f"unknown mode {mode!r} (table | pvalues)")


if __name__ == "__main__":
    main()
