"""Convert trained REFERENCE checkpoints (facebookresearch/brainmagick,
torch state_dicts) into this framework's flax parameter trees.

The reference checkpoints `all_models = nn.ModuleList([model,
feature_model])` (bm/solver.py:38) through flashy, so its state_dicts
carry keys like ``0.encoders.meg.sequence.3.0.weight`` (the SimpleConv)
and ``1.sequence.0.0.weight`` (the DeepMel feature model, when present).
This module replays BOTH frameworks' module-construction walks side by
side — the reference's Sequential/ModuleList indices
(bm/models/simpleconv.py:94-195, bm/models/common.py:79-151) and flax's
auto-naming counters (models/simpleconv.py, models/common.py) — emitting
one (torch_key, flax_path, transform) rule per tensor, so every
supported architecture converts without any hand-written key table.

Storage conventions verified identical on both sides (no rescaling
needed): ScaledEmbedding stores weights / scale
(bm/models/common.py:34), SubjectLayers bakes 1/sqrt(C_in) into the
stored matrix (bm/models/common.py:54), LayerScale stores init/boost
(bm/models/common.py:73), ChannelMerger stores heads / sqrt(pos_dim)
(bm/models/common.py:324).

Tensor layout transforms (primitive-level torch-vs-flax equivalence is
tested in tests/test_convert.py):
- torch Conv1d weight [O, I/g, k]        -> flax nn.Conv kernel [k, I/g, O]
- torch ConvTranspose1d weight [I, O/g, k] -> flax nn.ConvTranspose
  kernel [k, I, O], spatially FLIPPED (torch's transposed conv is the
  adjoint of correlation; flax's conv_transpose does not flip)
- torch BatchNorm1d weight/bias -> flax scale/bias;
  running_mean/var -> batch_stats mean/var. When the target model
  elides BatchNorm-cancelled conv biases (bn_conv_bias=False), the
  torch conv bias is folded into running_mean (exact: BN subtracts it).

Supported: SimpleConv (all paper-family options incl. concatenate,
stft head, subject embedding, rewrite/post_skip/LayerScale, groups) and
DeepMel feature models. Not supported: ConvRNN, DualPathRNN, ClipLoss
projections (clip.linear), fused_conv_bn/DotConv1D targets.

CLI (writes a ready-to-eval XP checkpoint):
    python -m brainmagick_tpu.convert in=/path/checkpoint.th \
        preset=clip_conv 'dset.selections=["gwilliams2022"]' [overrides...]
"""

from __future__ import annotations

import dataclasses
import logging
import sys
import typing as tp
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

#: rule: (torch_key, flax_path, transform, collection)
Rule = tp.Tuple[str, tp.Tuple[str, ...], str, str]

#: torch keys that carry no information for inference/resume
_IGNORED_SUFFIXES = ("num_batches_tracked",)


def _np(x: tp.Any) -> np.ndarray:
    """torch tensor or array-like -> numpy (no torch import needed)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Rule generation: replay both construction walks
# ---------------------------------------------------------------------------

def conv_sequence_rules(
        tprefix: str, fprefix: tp.Tuple[str, ...], *,
        channels: tp.Sequence[int], batch_norm: bool, skip: bool,
        scale: tp.Optional[float], rewrite: bool, post_skip: bool,
        glu: int, dropout: float, dropout_input: float,
        activation_on_last: bool, decode: bool,
        bn_conv_bias: bool = True) -> tp.List[Rule]:
    """Rules for one ConvSequence (reference bm/models/common.py:88-141
    Sequential indices vs our flax auto-name counters,
    models/common.py:444-527)."""
    rules: tp.List[Rule] = []
    conv_n = 0       # flax nn.Conv counter
    convt_n = 0      # flax nn.ConvTranspose counter
    bn_n = 0         # flax nn.BatchNorm counter
    ls_n = 0         # flax LayerScale counter
    channels = tuple(channels)
    for k, (chin, chout) in enumerate(zip(channels[:-1], channels[1:])):
        is_last = k == len(channels) - 2
        t = 0
        if k == 0 and dropout_input:
            t += 1                                   # torch nn.Dropout
        has_act_tail = activation_on_last or not is_last
        has_bn = batch_norm and has_act_tail
        use_bias = bn_conv_bias or not has_bn
        # stack conv (transposed in decode mode)
        tkey = f"{tprefix}sequence.{k}.{t}"
        if decode:
            fname, wkind = f"ConvTranspose_{convt_n}", "convT_w"
            convt_n += 1
        else:
            fname, wkind = f"Conv_{conv_n}", "conv_w"
            conv_n += 1
        rules.append((f"{tkey}.weight", fprefix + (fname, "kernel"),
                      wkind, "params"))
        if use_bias:
            rules.append((f"{tkey}.bias", fprefix + (fname, "bias"),
                          "copy", "params"))
        t += 1
        if has_act_tail:
            if batch_norm:
                bkey = f"{tprefix}sequence.{k}.{t}"
                fbn = f"BatchNorm_{bn_n}"
                rules.append((f"{bkey}.weight", fprefix + (fbn, "scale"),
                              "copy", "params"))
                rules.append((f"{bkey}.bias", fprefix + (fbn, "bias"),
                              "copy", "params"))
                mean_kind = "copy" if use_bias else "bn_mean_fold_bias"
                if mean_kind == "bn_mean_fold_bias":
                    # record the conv-bias key the fold reads from
                    rules.append((f"{tkey}.bias|{bkey}.running_mean",
                                  fprefix + (fbn, "mean"), mean_kind,
                                  "batch_stats"))
                else:
                    rules.append((f"{bkey}.running_mean",
                                  fprefix + (fbn, "mean"), "copy",
                                  "batch_stats"))
                rules.append((f"{bkey}.running_var",
                              fprefix + (fbn, "var"), "copy",
                              "batch_stats"))
                bn_n += 1
                t += 1
            t += 1                                   # activation
            if dropout:
                t += 1                               # torch nn.Dropout
            if rewrite:
                rkey = f"{tprefix}sequence.{k}.{t}"
                rules.append((f"{rkey}.weight",
                              fprefix + (f"Conv_{conv_n}", "kernel"),
                              "conv_w", "params"))
                rules.append((f"{rkey}.bias",
                              fprefix + (f"Conv_{conv_n}", "bias"),
                              "copy", "params"))
                conv_n += 1
                t += 2                               # conv + LeakyReLU
        if chin == chout and skip:
            if scale is not None:
                lkey = f"{tprefix}sequence.{k}.{t}"
                rules.append((f"{lkey}.scale",
                              fprefix + (f"LayerScale_{ls_n}", "scale"),
                              "copy", "params"))
                ls_n += 1
                t += 1
            if post_skip:
                pkey = f"{tprefix}sequence.{k}.{t}"
                # reference uses the decode Conv class here too
                # (bm/models/common.py:130); ours is always nn.Conv
                kind = "convT_w_as_conv" if decode else "conv_w"
                rules.append((f"{pkey}.weight",
                              fprefix + (f"Conv_{conv_n}", "kernel"),
                              kind, "params"))
                conv_n += 1
                t += 1
        if glu and (k + 1) % glu == 0:
            # key layout is the same for glu_glu True/False: the gate
            # conv is always glus.{k}.0, only the (parameter-free)
            # activation behind it differs
            gkey = f"{tprefix}glus.{k}.0"
            rules.append((f"{gkey}.weight",
                          fprefix + (f"Conv_{conv_n}", "kernel"),
                          "conv_w", "params"))
            rules.append((f"{gkey}.bias",
                          fprefix + (f"Conv_{conv_n}", "bias"),
                          "copy", "params"))
            conv_n += 1
    return rules


def simpleconv_rules(model: tp.Any, tprefix: str = "0."
                     ) -> tp.List[Rule]:
    """Rules for a SimpleConv flax module instance (attributes carry the
    full architecture; reference walk bm/models/simpleconv.py:94-195)."""
    if model.dual_path:
        raise NotImplementedError(
            "DualPathRNN checkpoints are not supported")
    if model.conv_impl != "conv" or model.fused_conv_bn:
        raise NotImplementedError(
            "convert into conv_impl='conv', fused_conv_bn=False targets "
            "(the flags are checkpoint-compatible: flip them after "
            "loading)")
    if model.n_fft is not None:
        # the strided transposed head: torch's and flax's explicit-pad
        # ConvTranspose semantics diverge for stride > 1 (measured in
        # tests/test_convert.py), so a converted stft model would not
        # be weight-compatible
        raise NotImplementedError(
            "stft-head (n_fft) checkpoints are not supported")
    rules: tp.List[Rule] = []
    f = ("model",)
    conv_n = 0
    in_channels = dict(model.in_channels)
    hidden = dict(model.hidden)
    if "meg" in in_channels:
        if model.merger:
            rules.append((f"{tprefix}merger.heads",
                          f + ("ChannelMerger_0", "heads"), "copy",
                          "params"))
            in_channels["meg"] = model.merger_channels
        if model.initial_linear:
            for d in range(model.initial_depth):
                tkey = f"{tprefix}initial_linear.{2 * d}"
                rules.append((f"{tkey}.weight",
                              f + (f"Conv_{conv_n}", "kernel"),
                              "conv_w", "params"))
                rules.append((f"{tkey}.bias",
                              f + (f"Conv_{conv_n}", "bias"),
                              "copy", "params"))
                conv_n += 1
            in_channels["meg"] = model.initial_linear
        if model.subject_layers:
            dim = {"hidden": hidden["meg"],
                   "input": in_channels["meg"]}[model.subject_layers_dim]
            rules.append((f"{tprefix}subject_layers.weights",
                          f + ("SubjectLayers_0", "weights"), "copy",
                          "params"))
            in_channels["meg"] = dim
        if model.subject_dim:
            rules.append((f"{tprefix}subject_embedding.embedding.weight",
                          f + ("ScaledEmbedding_0", "Embed_0",
                               "embedding"), "copy", "params"))
            in_channels["meg"] += model.subject_dim

    if model.concatenate:
        in_channels = {"concat": sum(in_channels.values())}
        hidden = {"concat": sum(hidden.values())}

    sizes = {}
    for name in in_channels:
        sizes[name] = [in_channels[name]] + [
            int(round(hidden[name] * model.growth ** k))
            for k in range(model.depth)]
    use_final = model.linear_out or model.complex_out
    activation_on_last = True
    if not use_final:
        activation_on_last = False
        list(sizes.values())[0][-1] = model.out_channels

    for name in sorted(in_channels):
        rules += conv_sequence_rules(
            f"{tprefix}encoders.{name}.", f + (f"encoder_{name}",),
            channels=sizes[name], batch_norm=model.batch_norm,
            skip=model.skip, scale=model.scale, rewrite=model.rewrite,
            post_skip=model.post_skip, glu=model.glu,
            dropout=model.conv_dropout,
            dropout_input=model.dropout_input,
            activation_on_last=activation_on_last, decode=False,
            bn_conv_bias=model.bn_conv_bias)

    if model.linear_out:
        # plain module, not a Sequential (bm/models/simpleconv.py:184)
        rules.append((f"{tprefix}final.weight",
                      f + ("ConvTranspose_0", "kernel"), "convT_w",
                      "params"))
        rules.append((f"{tprefix}final.bias",
                      f + ("ConvTranspose_0", "bias"), "copy", "params"))
    elif model.complex_out:
        rules.append((f"{tprefix}final.0.weight",
                      f + (f"Conv_{conv_n}", "kernel"), "conv_w",
                      "params"))
        rules.append((f"{tprefix}final.0.bias",
                      f + (f"Conv_{conv_n}", "bias"), "copy", "params"))
        rules.append((f"{tprefix}final.2.weight",
                      f + ("ConvTranspose_0", "kernel"), "convT_w",
                      "params"))
        rules.append((f"{tprefix}final.2.bias",
                      f + ("ConvTranspose_0", "bias"), "copy", "params"))
    return rules


def deepmel_rules(fm: tp.Any, tprefix: str = "1.") -> tp.List[Rule]:
    """Rules for our DeepMel (nests one ConvSequence;
    reference DeepMel IS a ConvSequence, bm/models/features.py:15-35)."""
    channels = ([fm.n_in_channels]
                + [fm.n_hidden_channels] * (fm.n_hidden_layers - 1)
                + [fm.n_out_channels])
    return conv_sequence_rules(
        tprefix, ("fm", "ConvSequence_0"), channels=channels,
        batch_norm=fm.batch_norm, skip=fm.skip, scale=None,
        rewrite=False, post_skip=False, glu=fm.glu,
        dropout=0.0, dropout_input=0.0,
        activation_on_last=fm.activation_on_last, decode=False,
        bn_conv_bias=True)


# ---------------------------------------------------------------------------
# Applying rules
# ---------------------------------------------------------------------------

def _transform(kind: str, value: np.ndarray,
               bias: tp.Optional[np.ndarray] = None) -> np.ndarray:
    if kind == "copy":
        return value
    if kind == "conv_w":                      # [O, I/g, k] -> [k, I/g, O]
        return np.transpose(value, (2, 1, 0))
    if kind == "convT_w":                     # [I, O, k] -> flip_k [k, I, O]
        # .copy() also normalizes the negative stride np.flip leaves on
        # size-1 kernel axes (numpy still reports those C-contiguous,
        # which torch.from_numpy rejects on the export path)
        return np.flip(np.transpose(value, (2, 0, 1)), axis=0).copy()
    if kind == "convT_w_as_conv":
        # torch ConvTranspose1d(k=1) weight [I, O, 1] used where ours is
        # nn.Conv: [1, I, O] (k=1 so no flip)
        return np.transpose(value, (2, 0, 1))
    if kind == "bn_mean_fold_bias":
        # target model elides the conv bias; exact fold: BN(x + b) with
        # stats (mean, var) == BN(x) with stats (mean - b, var)
        assert bias is not None
        return value - bias
    raise ValueError(f"unknown transform {kind}")


def _untransform(kind: str, value: np.ndarray) -> np.ndarray:
    if kind == "copy":
        return value
    if kind == "conv_w":
        return np.transpose(value, (2, 1, 0))
    if kind == "convT_w":
        return np.transpose(np.flip(value, axis=0), (1, 2, 0)).copy()
    if kind == "convT_w_as_conv":
        return np.transpose(value, (1, 2, 0))
    raise ValueError(f"cannot invert transform {kind}")


def _set_path(tree: dict, path: tp.Tuple[str, ...],
              value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def model_rules(model: tp.Any, feature_model: tp.Any = None
                ) -> tp.List[Rule]:
    """All rules for a (model, feature_model) pair, with the reference's
    ModuleList prefixes 0./1. (bm/solver.py:38)."""
    from .models.features import DeepMel
    from .models.simpleconv import SimpleConv

    if not isinstance(model, SimpleConv):
        raise NotImplementedError(
            f"only SimpleConv checkpoints convert (got "
            f"{type(model).__name__})")
    rules = simpleconv_rules(model, tprefix="0.")
    if feature_model is not None:
        if not isinstance(feature_model, DeepMel):
            raise NotImplementedError(
                f"unsupported feature model {type(feature_model).__name__}")
        rules += deepmel_rules(feature_model, tprefix="1.")
    return rules


def convert_state_dict(state_dict: tp.Mapping[str, tp.Any],
                       model: tp.Any, feature_model: tp.Any = None,
                       strict: bool = True
                       ) -> tp.Tuple[dict, dict]:
    """Reference torch state_dict -> (params, batch_stats) subtrees
    ({'model': ..., 'fm': ...}). Unknown keys raise when `strict`."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    rules = model_rules(model, feature_model)
    params: dict = {}
    batch_stats: dict = {}
    consumed: tp.Set[str] = set()
    for tkey, fpath, kind, coll in rules:
        if kind == "bn_mean_fold_bias":
            bias_key, mean_key = tkey.split("|")
            if mean_key not in sd:
                raise KeyError(f"reference checkpoint misses {mean_key}")
            value = _transform(kind, sd[mean_key],
                               bias=sd.get(bias_key, np.float32(0.)))
            consumed.update((bias_key, mean_key))
        else:
            if tkey not in sd:
                raise KeyError(f"reference checkpoint misses {tkey} "
                               f"(for {'/'.join(fpath)})")
            value = _transform(kind, sd[tkey])
            consumed.add(tkey)
        target = params if coll == "params" else batch_stats
        _set_path(target, fpath, np.ascontiguousarray(value))
    leftovers = [k for k in sd if k not in consumed
                 and not k.endswith(_IGNORED_SUFFIXES)]
    if leftovers:
        msg = (f"{len(leftovers)} reference tensors were not mapped: "
               f"{sorted(leftovers)[:8]}...")
        if strict:
            raise ValueError(msg)
        logger.warning(msg)
    return params, batch_stats


def export_state_dict(params: tp.Mapping[str, tp.Any],
                      batch_stats: tp.Mapping[str, tp.Any],
                      model: tp.Any, feature_model: tp.Any = None
                      ) -> tp.Dict[str, np.ndarray]:
    """Inverse direction: our trees -> a reference-named state_dict
    (reverse migration / roundtrip tests). Requires bn_conv_bias=True
    targets (elided biases cannot be reconstructed)."""
    rules = model_rules(model, feature_model)
    out: tp.Dict[str, np.ndarray] = {}

    def _get(tree: tp.Mapping, path: tp.Tuple[str, ...]) -> np.ndarray:
        node: tp.Any = tree
        for part in path:
            node = node[part]
        return np.asarray(node)

    for tkey, fpath, kind, coll in rules:
        if kind == "bn_mean_fold_bias":
            raise NotImplementedError(
                "export from a bn_conv_bias=False model is lossy; "
                "re-load the checkpoint into a bn_conv_bias=True config")
        tree = params if coll == "params" else batch_stats
        out[tkey] = np.array(_untransform(kind, _get(tree, fpath)),
                             copy=True)
    return out


# ---------------------------------------------------------------------------
# Checkpoint-file level
# ---------------------------------------------------------------------------

def load_reference_checkpoint(path: tp.Union[str, Path],
                              best: bool = True) -> tp.Dict[str, tp.Any]:
    """Read a reference checkpoint.th (torch pickle) and return the
    all_models state_dict (best_state when available and `best`)."""
    import torch

    payload = torch.load(str(path), map_location="cpu",
                         weights_only=False)
    if isinstance(payload, dict):
        for key in (("best_state",) if best else ()) + (
                "all_models", "model"):
            if key in payload and payload[key]:
                return dict(payload[key])
        if all(hasattr(v, "shape") for v in payload.values()):
            return dict(payload)  # a bare state_dict
    raise ValueError(f"unrecognized reference checkpoint layout: {path}")


def load_into_solver(solver: tp.Any,
                     state_dict: tp.Mapping[str, tp.Any],
                     strict: bool = True) -> None:
    """Install converted reference weights as the solver's current AND
    best state (ready for eval / warm-started training)."""
    import jax

    params, batch_stats = convert_state_dict(
        state_dict, solver.model, solver.feature_model, strict=strict)
    new_params = {**solver.state["params"], **params}
    new_stats = {**solver.state["batch_stats"], **batch_stats}
    # structural check: the converted trees must match the built model
    for name, (ours, theirs) in (
            ("params", (solver.state["params"], new_params)),
            ("batch_stats", (solver.state["batch_stats"], new_stats))):
        ref = jax.tree_util.tree_structure(jax.device_get(ours))
        got = jax.tree_util.tree_structure(theirs)
        if ref != got:
            raise ValueError(
                f"converted {name} tree does not match the built model "
                f"— check that the config reproduces the reference XP "
                f"({ref} vs {got})")
        for p_ours, p_new in zip(jax.tree_util.tree_leaves(ours),
                                 jax.tree_util.tree_leaves(theirs)):
            if np.shape(p_ours) != np.shape(p_new):
                raise ValueError(
                    f"{name} leaf shape mismatch: {np.shape(p_ours)} vs "
                    f"{np.shape(p_new)}")
    solver.state = {**solver.state,
                    "params": jax.device_put(new_params),
                    "batch_stats": jax.device_put(new_stats)}
    solver.best_state = jax.device_get(
        {"params": new_params, "batch_stats": new_stats})


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    from .train import get_solver, parse_overrides

    tokens = list(argv if argv is not None else sys.argv[1:])
    path = None
    rest = []
    for token in tokens:
        if token.startswith("in="):
            path = token.split("=", 1)[1]
        else:
            rest.append(token)
    if path is None:
        print(__doc__)
        return
    args = parse_overrides(rest)
    solver = get_solver(args, training=False)
    sd = load_reference_checkpoint(path)
    load_into_solver(solver, sd)
    solver.commit(block=True)
    logger.info("Converted %s -> %s (sig %s); ready for "
                "`python -m brainmagick_tpu.eval sig=%s`",
                path, solver.checkpoint_path, args.sig, args.sig)


if __name__ == "__main__":
    main()
