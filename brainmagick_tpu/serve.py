"""Serving export: freeze a trained solver's inference forward into a
portable StableHLO artifact.

The reference has no serving story — inference means unpickling the
full torch Solver with its config, datasets and model code
(scripts/run_eval_probs.py:211, bm/play.py:63). The TPU-native
equivalent is `jax.export`: the solver's jitted forward (Pallas/XLA
normalize -> model -> estimate) is traced once with the trained
parameters, batch stats and per-recording scalers baked in as
constants, then serialized. A serving host needs only jax and the
artifact — no model code, no checkpoint, no config, no data pipeline —
and can run it on any exported platform (TPU serving fleets compile
the embedded StableHLO directly; the batch dimension stays symbolic by
default so one artifact serves any batch size).

CLI (defaults: symbolic batch, platforms=tpu,cpu — one artifact for
the serving fleet and local CPU debugging; CLIP solvers also get the
retrieval scorer as <out>_scores.jaxexp):
    python -m brainmagick_tpu.serve sig=<xp_sig> [out=<file>]
        [out_dir=./outputs] [batch_size=N] [platforms=tpu,cpu]
        [scores=true] [selfcheck=true]

Library:
    exp = serve.export_forward(solver)            # symbolic batch
    serve.save_exported(exp, "model.jaxexp")
    exp = serve.load_exported("model.jaxexp")     # serving host
    estimate, output, mask, keep = serve.call_exported(exp, batch)
    scorer = serve.export_scores(solver)          # [B,F,T']x[N,F,T']
    probs = scorer.call(estimate, candidate_bank) # -> [B, N]
"""

from __future__ import annotations

import logging
import sys
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import SegmentBatch

logger = logging.getLogger(__name__)

#: order of the exported function's positional arguments
ARG_FIELDS = SegmentBatch.ARRAY_FIELDS


def _example_split(solver):
    for split in ("test", "valid", "train"):
        ds = getattr(solver.datasets, split)
        if len(ds):
            return split, ds
    raise ValueError("solver has no data to derive input shapes from")


def prepare_batch(solver, batch: SegmentBatch,
                  split: str = "test") -> SegmentBatch:
    """Reduce a dataset batch to the MODEL's feature layout — test
    splits carry extra eval-only channels (e.g. WordHash) that the
    forward does not take (same extraction wer.get_wer does)."""
    ds = getattr(solver.datasets, split)
    builder = ds.datasets[0].features
    used = list(solver.used_features.keys())
    feats = builder.extract_features(np.asarray(batch.features), used)
    return batch.replace(features=np.asarray(feats))


def _example_item(solver) -> SegmentBatch:
    """One unbatched item in the model's feature layout, used only for
    shapes/dtypes (single extraction path: prepare_batch)."""
    split, ds = _example_split(solver)
    batch = prepare_batch(solver, SegmentBatch.collate([ds[0]]),
                          split=split)
    return SegmentBatch(**{
        name: np.asarray(getattr(batch, name))[0] for name in ARG_FIELDS})


def input_specs(solver, batch_size: tp.Optional[int] = None
                ) -> tp.Tuple[jax.ShapeDtypeStruct, ...]:
    """ShapeDtypeStructs for the exported forward's arguments, in
    ARG_FIELDS order. `batch_size=None` uses a symbolic batch dimension
    so one artifact serves any batch size."""
    from jax import export as jexport

    item = _example_item(solver)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    specs = []
    for name in ARG_FIELDS:
        arr = np.asarray(getattr(item, name))
        dtype = arr.dtype
        if name in ("subject_index", "recording_index"):
            # scalar per item -> [B]; keep the dataset's integer dtype
            specs.append(jax.ShapeDtypeStruct((b,), dtype))
        else:
            specs.append(jax.ShapeDtypeStruct((b,) + arr.shape, dtype))
    return tuple(specs)


def export_forward(solver, batch_size: tp.Optional[int] = None,
                   platforms: tp.Optional[tp.Sequence[str]] = None):
    """Export the inference forward as a jax.export.Exported.

    Signature of the exported function (ARG_FIELDS order):
        (meg[B,C,T], features[B,F,T'], features_mask[B,1,T'],
         subject_index[B], recording_index[B], positions[B,C,2])
        -> (estimate, output, mask, keep)

    `features` uses the MODEL's feature layout (what training consumed);
    reduce raw test-split batches with `prepare_batch` first (test
    splits append eval-only channels such as WordHash).

    Parameters, batch stats, per-recording scalers and the (inert at
    inference) RNG key are closed over and serialized as constants.
    `platforms` defaults to the current backend; pass e.g.
    ("tpu", "cpu") for a multi-platform artifact.
    """
    from jax import export as jexport

    params = solver.state["params"]
    batch_stats = solver.state["batch_stats"]
    norm_arrays = solver.norm_arrays
    rng = jax.random.PRNGKey(0)

    def fwd(*args):
        arrays = dict(zip(ARG_FIELDS, args))
        pad_weight = jnp.ones((arrays["meg"].shape[0],),
                              dtype=jnp.float32)
        estimate, output, mask, keep, _, _ = solver._forward(
            params, batch_stats, arrays, norm_arrays, pad_weight, rng,
            train=False)
        return estimate, output, mask, keep > 0.5

    kwargs: tp.Dict[str, tp.Any] = {}
    if platforms is not None:
        kwargs["platforms"] = [p.lower() for p in platforms]
    # the forward's fused Pallas normalize is a Mosaic kernel: it cannot
    # be lowered for non-TPU platforms of a multi-platform artifact, and
    # its grid cannot carry a symbolic batch dim — force the portable
    # XLA composition (identical numerics; the normalize is a negligible
    # slice of inference time) for the export trace only
    prev_impl = getattr(solver, "_norm_impl", "auto")
    solver._norm_impl = "xla"
    try:
        exported = jexport.export(jax.jit(fwd), **kwargs)(
            *input_specs(solver, batch_size))
    finally:
        solver._norm_impl = prev_impl
    return exported


def export_scores(solver,
                  platforms: tp.Optional[tp.Sequence[str]] = None):
    """Export the retrieval scorer — the second half of a deployed
    brain-decoding service (the reference's in-GPU scoring loops,
    bm/wer.py:99 / scripts/run_eval_probs.py:267-307):

        (estimates [B, F, T'], candidates [N, F, T']) -> probs [B, N]

    with the solver's exact CLIP scoring math (trim window, norm
    folding, optional projection/pool/center params) baked in. Both the
    row and candidate dimensions are symbolic, so one artifact scores
    any pool size. Feed it the (estimate, output) arrays produced by
    the exported forward."""
    from jax import export as jexport

    if solver.clip_loss is None:
        raise ValueError("scoring export requires a CLIP solver")
    clip = solver.clip_loss
    loss_params = solver.state["params"]["loss"]

    est_spec, out_spec = _forward_output_specs(solver)
    b, n = jexport.symbolic_shape("b, n")

    def fn(estimates, candidates):
        return clip.apply({"params": loss_params}, estimates, candidates,
                          method=clip.get_probabilities)

    kwargs: tp.Dict[str, tp.Any] = {}
    if platforms is not None:
        kwargs["platforms"] = [p.lower() for p in platforms]
    return jexport.export(jax.jit(fn), **kwargs)(
        jax.ShapeDtypeStruct((b,) + est_spec.shape[1:], est_spec.dtype),
        jax.ShapeDtypeStruct((n,) + out_spec.shape[1:], out_spec.dtype))


def _forward_output_specs(solver):
    """(estimate, output) ShapeDtypeStructs of the inference forward for
    one sample — via eval_shape, no compute."""
    import jax.random as jrandom

    params = solver.state["params"]
    batch_stats = solver.state["batch_stats"]
    norm_arrays = solver.norm_arrays
    rng = jrandom.PRNGKey(0)

    def fwd(*args):
        arrays = dict(zip(ARG_FIELDS, args))
        pad_weight = jnp.ones((arrays["meg"].shape[0],),
                              dtype=jnp.float32)
        estimate, output, *_ = solver._forward(
            params, batch_stats, arrays, norm_arrays, pad_weight, rng,
            train=False)
        return estimate, output

    prev_impl = getattr(solver, "_norm_impl", "auto")
    solver._norm_impl = "xla"
    try:
        est, out = jax.eval_shape(fwd, *input_specs(solver, batch_size=1))
    finally:
        solver._norm_impl = prev_impl
    return est, out


def save_exported(exported, path: tp.Union[str, Path]) -> Path:
    """Serialize to disk (atomic write)."""
    from .utils.misc import write_and_rename

    path = Path(path)
    with write_and_rename(path) as f:
        f.write(exported.serialize())
    return path


def load_exported(path: tp.Union[str, Path]):
    """Deserialize an artifact written by save_exported."""
    from jax import export as jexport

    return jexport.deserialize(bytearray(Path(path).read_bytes()))


def call_exported(exported, batch: SegmentBatch
                  ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Run an (exported or deserialized) forward on a SegmentBatch."""
    args = [jnp.asarray(np.asarray(getattr(batch, name)))
            for name in ARG_FIELDS]
    out = exported.call(*args)
    return tuple(np.asarray(x) for x in out)  # type: ignore[return-value]


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    tokens = dict(t.split("=", 1) for t in
                  (argv if argv is not None else sys.argv[1:]))
    if "sig" not in tokens:
        print(__doc__)
        return
    _cc = tokens.get("parallel.compilation_cache",
                     tokens.get("compilation_cache", "true"))
    if str(_cc).lower() != "false":
        from .parallel import enable_compilation_cache
        enable_compilation_cache()
    from .play import get_solver_from_sig

    out_dir = tokens.get("out_dir", "./outputs")
    solver = get_solver_from_sig(tokens["sig"], out_dir=out_dir,
                                 training=False)
    batch_size = (int(tokens["batch_size"])
                  if "batch_size" in tokens else None)
    # default to a multi-platform artifact: the TPU serving fleet and
    # local CPU debugging run the same file (tested in test_serve.py)
    platforms = tokens.get("platforms", "tpu,cpu").split(",")
    exported = export_forward(solver, batch_size=batch_size,
                              platforms=platforms)
    out = Path(tokens.get(
        "out", Path(out_dir) / "xps" / tokens["sig"] / "model.jaxexp"))
    save_exported(exported, out)
    logger.info("Exported %s (platforms=%s, batch=%s) -> %s (%.1f MB)",
                tokens["sig"], exported.platforms,
                batch_size if batch_size is not None else "symbolic",
                out, out.stat().st_size / 1e6)

    scores_exp = None
    if (tokens.get("scores", "true").lower() != "false"
            and solver.clip_loss is not None):
        scores_exp = export_scores(solver, platforms=platforms)
        scores_out = out.with_name(out.stem + "_scores" + out.suffix)
        save_exported(scores_exp, scores_out)
        logger.info("Exported retrieval scorer -> %s (%.1f MB)",
                    scores_out, scores_out.stat().st_size / 1e6)

    if tokens.get("selfcheck", "true").lower() != "false":
        split, ds = _example_split(solver)
        n = batch_size or min(4, len(ds))
        batch = prepare_batch(
            solver,
            SegmentBatch.collate([ds[i % len(ds)] for i in range(n)]),
            split=split)
        reloaded = load_exported(out)
        est_x, out_x, mask_x, keep_x = call_exported(reloaded, batch)
        est_s, out_s, mask_s, keep_s = solver.forward_batch(batch)
        np.testing.assert_allclose(est_x, est_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out_x, out_s, rtol=1e-5, atol=1e-5)
        assert bool(np.all(keep_x == keep_s))
        if scores_exp is not None:
            probs_x = np.asarray(scores_exp.call(jnp.asarray(est_x),
                                                 jnp.asarray(out_x)))
            probs_s = np.asarray(solver.clip_loss.apply(
                {"params": jax.device_get(
                    solver.state["params"])["loss"]},
                jnp.asarray(est_s), jnp.asarray(out_s),
                method=solver.clip_loss.get_probabilities))
            np.testing.assert_allclose(probs_x, probs_s, rtol=1e-4,
                                       atol=1e-5)
        logger.info("selfcheck OK: exported forward%s == solver "
                    "on a %d-sample test batch",
                    " + scorer" if scores_exp is not None else "", n)


if __name__ == "__main__":
    main()
