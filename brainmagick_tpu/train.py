"""Training entry point: config -> datasets -> model -> Solver.

Reference parity: bm/train.py:28-193 — same assembly: datasets built from
selections, input/output channel counts inferred from the data and task,
n_subjects inferred from the training recordings, model + optional
feature model construction, Adam optimizer, Solver.

CLI: ``python -m brainmagick_tpu.train preset=clip_conv
dset.selections=[fake] optim.epochs=2 ...`` — dotted key=value overrides
over the dataclass config (values parsed as python literals).
"""

from __future__ import annotations

import ast
import dataclasses
import hashlib
import logging
import sys
import time
import typing as tp

import jax
import numpy as np
import optax

from . import dataset as dset
from .config import MainConfig, apply_preset
from .env import env
from .models import ConvRNN, DeepMel, SimpleConv
from .solver import Solver

logger = logging.getLogger(__name__)


def model_hash(params: tp.Any) -> str:
    """Reproducibility fingerprint of a parameter pytree
    (bm/train.py:28-32)."""
    hasher = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(params):
        hasher.update(np.asarray(leaf).tobytes())
    return hasher.hexdigest()


def build_datasets(args: MainConfig) -> dset.Datasets:
    kwargs = dataclasses.asdict(args.dset)
    selections = [args.selections[name] for name in kwargs.pop("selections")]
    kwargs["selections"] = selections
    kwargs["test"] = {k: v for k, v in kwargs.pop("test").items()}
    if args.optim.loss == "clip":
        kwargs["extra_test_features"] = list(
            kwargs.get("extra_test_features") or []) + ["WordHash"]
    return dset.get_datasets(num_workers=args.num_workers, **kwargs)


def build_model(args: MainConfig, datasets: dset.Datasets):
    meg_dimension = datasets.train[0].meg.shape[0]
    used_features = datasets.train.datasets[0].features
    if args.task.type == "decode":
        in_channels = dict(meg=meg_dimension)
        chout = used_features.output_dimension
    elif args.task.type == "encode":
        in_channels = dict(meg=meg_dimension,
                           features=used_features.dimension)
        chout = meg_dimension
    else:
        raise ValueError(f"Unknown task {args.task.type}")

    if args.override_n_subjects_model is not None:
        n_subjects = args.override_n_subjects_model
    else:
        n_subjects = 1 + max(d.recording.subject_index
                             for d in datasets.train.datasets)
    assert n_subjects > 0

    model_chout = chout
    if args.feature_model_name is not None and args.task.type == "decode":
        model_chout = args.feature_model_params["n_out_channels"]

    if args.model_name == "simpleconv":
        kw = dict(args.simpleconv)
        hidden = kw.pop("hidden", 320)
        if not isinstance(hidden, dict):
            hidden = {name: hidden for name in in_channels}
        kw["dilation_period"] = kw.get("dilation_period")
        if (kw.get("gelu") and kw.get("gelu_exact", True)
                and jax.default_backend() == "tpu"):
            # measured on v5e: erf gelu costs ~1.8x the tanh approx on
            # the paper step (58.5 vs ~32 ms — doc/perf_playbook.md);
            # keep erf only for converted reference checkpoints
            logger.warning(
                "simpleconv.gelu_exact=True (erf gelu) on a TPU backend "
                "costs ~1.8x the step time of the tanh approximation "
                "(~5e-4 activation delta). Set simpleconv.gelu_exact="
                "false or use the clip_conv_tpu preset unless you are "
                "loading a converted reference checkpoint.")
        model = SimpleConv(in_channels=in_channels, out_channels=model_chout,
                           hidden=hidden, n_subjects=n_subjects, **kw)
    elif args.model_name == "convrnn":
        kw = dict(args.convrnn)
        hidden = kw.pop("hidden", 256)
        if not isinstance(hidden, dict):
            hidden = {name: hidden for name in in_channels}
        kw["embedding_location"] = tuple(kw.get("embedding_location",
                                                ("lstm",)))
        model = ConvRNN(in_channels=in_channels, out_channels=model_chout,
                        hidden=hidden, n_subjects=n_subjects, **kw)
    else:
        raise ValueError(f"Invalid model {args.model_name}")

    feature_model = None
    if args.feature_model_name is not None:
        if args.feature_model_name == "deep_mel":
            params = dict(args.feature_model_params)
            params.pop("device", None)
            feature_model = DeepMel(n_in_channels=chout, **params)
        else:
            raise ValueError(
                f"Invalid feature model {args.feature_model_name}")
    return model, feature_model


def get_solver(args: MainConfig, training: bool = True) -> Solver:
    t0 = time.perf_counter()
    datasets = build_datasets(args)
    t_datasets = time.perf_counter() - t0
    if args.download_only:
        sys.exit(0)
    model, feature_model = build_model(args, datasets)
    optimizer = None
    if training:
        optargs = args.optim
        if optargs.name == "adam":
            optimizer = optax.adam(optargs.lr, b1=0.9, b2=optargs.beta2)
        else:
            raise ValueError(f"Invalid optimizer {optargs.name}")
    solver = Solver(args=args, datasets=datasets, model=model,
                    feature_model=feature_model, optimizer=optimizer)
    solver.build_timings["datasets"] = t_datasets
    return solver


def run(args: MainConfig) -> float:
    """Train one XP. Pushes the config's cache/study/feature-model
    paths into the env singleton itself (not only in main()): the grid
    runner's in-process path (run_jobs(workers=1)) calls run() directly,
    and without this its jobs silently ignored their `cache=` override
    and ran cache-less against the ambient env (found via a rehearsal
    whose in-process training never touched its workdir cache)."""
    with env.temporary_from_args(args):
        return _run(args)


def _run(args: MainConfig) -> float:
    level = logging.DEBUG if args.verbose else logging.INFO
    logging.basicConfig(level=level,
                        format="%(levelname)s %(name)s: %(message)s")
    if args.parallel.distributed_init:
        # multi-process pods: join the jax.distributed cluster before
        # any backend use (the reference's flashy.distrib.init process
        # boundary, bm/train.py:139); coordinator/process env comes
        # from the launcher (TPU pods auto-detect)
        jax.distributed.initialize()
    if args.parallel.compilation_cache:
        from .parallel import enable_compilation_cache
        enable_compilation_cache()
    solver = get_solver(args)
    if args.parallel.auto_mesh and jax.device_count() > 1:
        if args.optim.batch_size % jax.device_count() == 0:
            from .parallel import make_mesh
            solver.set_mesh(make_mesh())
            logger.info(
                "Data-parallel mesh over %d device(s) across %d "
                "process(es); contrastive negative groups of %d",
                jax.device_count(), jax.process_count(),
                solver._negatives_group_size())
        else:
            logger.warning(
                "auto_mesh: batch_size %d does not divide over %d "
                "devices — training single-device. Set a divisible "
                "optim.batch_size or parallel.auto_mesh=false.",
                args.optim.batch_size, jax.device_count())
    logger.info("Model hash: %s",
                model_hash(solver.state["params"]["model"]))
    if args.show:
        n_params = sum(leaf.size for leaf in jax.tree_util.tree_leaves(
            solver.state["params"]))
        logger.info("Size: %.1f MB", n_params * 4 / 2 ** 20)
        return 0.0
    return solver.train()


def parse_overrides(argv: tp.Sequence[str],
                    args: tp.Optional[MainConfig] = None) -> MainConfig:
    """`a.b.c=value` CLI overrides (values parsed as python literals;
    `preset=name` applies a composed reference config)."""
    args = args or MainConfig()
    for token in argv:
        if "=" not in token:
            raise ValueError(f"Expected key=value, got {token!r}")
        key, raw = token.split("=", 1)
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        if key == "preset":
            apply_preset(args, value)
            continue
        from .config import DELETED
        target: tp.Any = args
        parts = key.split(".")
        for part in parts[:-1]:
            target = target[part] if isinstance(target, dict) \
                else getattr(target, part)
        last = parts[-1]
        if isinstance(target, dict):
            if value == DELETED:
                target.pop(last, None)
            else:
                target[last] = value
        else:
            if not hasattr(target, last):
                raise ValueError(f"Unknown config key {key!r}")
            setattr(target, last, value)
    return args


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> float:
    args = parse_overrides(argv if argv is not None else sys.argv[1:])
    with env.temporary_from_args(args):
        logger.info("XP signature: %s -> %s", args.sig, args.xp_folder)
        return _run(args)


if __name__ == "__main__":
    main()
