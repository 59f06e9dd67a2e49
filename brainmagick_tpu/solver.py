"""Solver: the train/eval engine.

Reference parity: bm/solver.py:29-448 — same responsibilities: loss and
scaler construction (scaler disk-cached), loaders, negative pool, train
loop with early stopping and best-state tracking, `_process_batch`
(scale-reject -> offset_meg -> lowpass -> task wiring -> model ->
feature_model), test dispatch (WER for CLIP, streaming correlations
otherwise), `predict()` single-sample API, checkpoint/restore.

TPU-native architecture: the whole per-batch pipeline — normalization,
clamp/reject, meg offset, lowpass FIR, model forward, feature model,
loss, gradients, optimizer update — is ONE jitted function with static
shapes. Rejected samples are masked (zero loss weight + -inf candidate
logits), not dropped, so shapes never change; the reference's "recycle
the last good batch" DDP hack (bm/solver.py:345-352) disappears.
Multi-chip: see parallel.make_sharded_step, which shards the batch over
a mesh and keeps contrastive negatives per-shard like the reference
keeps them per-GPU (README.md:139-143).
"""

from __future__ import annotations

import contextlib
import logging
import pickle
import time
import typing as tp
from concurrent import futures

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .cache import Cache
from .config import MainConfig
from .dataset import SegmentBatch
from .loader import Loader
from .losses import ClipLoss, FeatureDecodingLoss, masked_l1, masked_l2
from .norm import BatchScaler, ScaleReject
from .ops import dsp
from .svd import svd_penalty
from .utils import write_and_rename

logger = logging.getLogger(__name__)


def _addressable_rows(arr) -> np.ndarray:
    """Host copy of a device array's locally-addressable batch rows.

    Single host: the whole array. Multi-host pods: a batch-sharded
    global jax.Array spans other hosts' devices and np.asarray would
    raise; concatenating this process's shards yields its local rows."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        shards = sorted(arr.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return np.asarray(arr)


class Solver:

    def __init__(self, args: MainConfig, datasets, model,
                 feature_model=None, optimizer: tp.Optional[tp.Any] = None,
                 ) -> None:
        self.args = args
        self.datasets = datasets
        self.model = model
        self.feature_model = feature_model
        self.used_features = datasets.train.datasets[0].features
        self.optimizer = optimizer  # optax GradientTransformation or None

        self.history: tp.List[tp.Dict[str, tp.Dict[str, float]]] = []
        self.best_state: tp.Optional[dict] = None
        self.last_test_epoch = 0
        self.best_epoch = 0
        self.best_loss = float("inf")
        self.epoch = 1
        self._rejected = 0
        self._seen = 0

        self.folder = args.xp_folder
        self.folder.mkdir(parents=True, exist_ok=True)
        self.checkpoint_path = self.folder / "checkpoint.pkl"

        # loss module (ClipLoss may own learnable projection params)
        self.clip_loss: tp.Optional[ClipLoss] = None
        self.feature_loss: tp.Optional[FeatureDecodingLoss] = None
        if args.optim.loss == "clip":
            self.clip_loss = ClipLoss(
                linear=args.clip.linear, twin=args.clip.twin,
                pool=args.clip.pool, center=args.clip.center,
                tmin=args.clip.tmin, tmax=args.clip.tmax,
                tmin_train=args.clip.tmin_train,
                tmax_train=args.clip.tmax_train,
                dset_tmin=args.dset.tmin,
                dset_sample_rate=args.dset.sample_rate,
                compute_dtype=args.clip.compute_dtype)

        # scaler (fit on rank-0 equivalent: host, disk-cached)
        #: wall-clock of each construction phase, printed by bench.py
        self.build_timings: tp.Dict[str, float] = {}
        self.scaler: tp.Optional[BatchScaler] = None
        # dsp.DSP_VERSION: the scaler is fitted on DSP-derived feature
        # values, so a numerics change must refit, not reuse
        self.scaler_cache = Cache(
            "scaler", (args.dset, args.norm, dsp.DSP_VERSION))
        with self._timed("scaler"):
            self._init_scaler()
        if args.optim.loss == "regression_classification":
            self.feature_loss = FeatureDecodingLoss(
                self.used_features,
                self.scaler if args.optim.use_weighting else None)
        self.scale_reject = ScaleReject(
            self.scaler, args.norm.max_scale,
            args.norm.exclude_empty_features, args.norm.clip)

        self._init_loaders()
        self._norm_arrays: tp.Optional[tp.Dict[str, jnp.ndarray]] = None
        with self._timed("norm_arrays"):
            _ = self.norm_arrays  # materialize OUTSIDE any jit trace
        with self._timed("init_state"):
            self._init_state()
        #: optional jax.sharding.Mesh for data-parallel training
        #: (set_mesh); None = single device
        self.mesh = None
        # async checkpoint writer (commit/wait_checkpoint)
        self._checkpoint_executor: tp.Optional[
            futures.ThreadPoolExecutor] = None
        self._checkpoint_future: tp.Optional[futures.Future] = None
        self.negative_pool = {name: None for name in ("train", "valid")}
        # resolved at construction, NOT written back into args: the XP
        # sig derives from the config delta, and a restore that
        # recomputes delta() must see the launched config unchanged
        # (reference default: pool of 2x the negatives)
        n_neg = args.optim.negatives
        self.negative_pool_size = (
            args.optim.negative_pool_size
            if args.optim.negative_pool_size is not None
            else (2 * n_neg if n_neg else None))
        self._neg_rng = np.random.RandomState(args.seed)
        self._jit_cache: tp.Dict[tp.Any, tp.Any] = {}

        from .logging_utils import MetricSinks
        wandb_kwargs = dict(args.wandb)
        use_wandb = wandb_kwargs.pop("use_wandb", False)
        self.metric_sinks = MetricSinks(
            self.folder, use_wandb=use_wandb, wandb_kwargs=wandb_kwargs,
            use_tensorboard=args.tensorboard)

        self.restore()
        if optimizer is None and self.best_state is not None:
            self._load_params(self.best_state)

    # -- setup ----------------------------------------------------------------

    @contextlib.contextmanager
    def _timed(self, name: str) -> tp.Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.build_timings[name] = \
                self.build_timings.get(name, 0.0) \
                + time.perf_counter() - t0

    def _init_scaler(self) -> None:
        if self.scaler is None:
            self.scaler = self.scaler_cache.get(self._fit_scaler)
            path = self.scaler_cache.cache_path({})
            logger.info("Scaler cache file %s", path)

    def _fit_scaler(self) -> BatchScaler:
        logger.info("Fitting scaler. Dataset size=%d samples.",
                    len(self.datasets.train))
        scaler = BatchScaler(
            features_builder=self.used_features,
            n_samples_per_recording=self.args.norm.scaler.n_samples_per_recording,
            per_channel=self.args.norm.scaler.per_channel,
            n_samples_features=self.args.norm.scaler.n_samples_features)
        scaler.fit(self.datasets.train.datasets)
        return scaler

    def _init_loaders(self) -> None:
        args = self.args
        shuffled = {"train"}
        if args.optim.max_batches:
            shuffled.add("valid")
        self.loaders = {
            name: Loader(getattr(self.datasets, name),
                         batch_size=args.optim.batch_size,
                         shuffle=name in shuffled, seed=args.seed,
                         drop_last=(name == "train"),
                         num_workers=args.num_workers,
                         assemble_dtype=args.parallel.assemble_dtype)
            for name in ("train", "valid", "test")}

    def make_loader(self, dataset, shuffle: bool = False,
                    with_events: bool = False) -> Loader:
        # deliberately fp32 assembly (no parallel.assemble_dtype):
        # wer/eval/play read batch.features host-side (word-hash floats)
        # where a bf16 round would corrupt the hash values
        return Loader(dataset, batch_size=self.args.optim.batch_size,
                      shuffle=shuffle, seed=self.args.seed,
                      num_workers=self.args.num_workers,
                      with_events=with_events)

    @property
    def norm_arrays(self) -> tp.Dict[str, jnp.ndarray]:
        if getattr(self, "_norm_arrays", None) is None:
            n_rec = 1 + max(s.recording.recording_index
                            for split in self.datasets
                            for s in split.datasets)
            n_chan = self.datasets.train[0].meg.shape[0]
            arrays = self.scaler.export_arrays(n_rec, n_chan)
            self._norm_arrays = {k: jnp.asarray(v)
                                 for k, v in arrays.items()}
            pos_emb, rec_positions, rec_subjects = \
                self._pos_emb_table(n_rec, n_chan)
            self._norm_arrays["pos_emb"] = pos_emb
            self._norm_arrays["rec_positions"] = rec_positions
            self._norm_arrays["rec_subjects"] = rec_subjects
        return self._norm_arrays

    def _pos_emb_table(self, n_rec: int, n_chan: int):
        """Per-recording merger positional embeddings [R, C, pos_dim]
        plus the matching positions [R, C, 2] (positions are fixed per
        recording; computing 2*C*D cos/sin per forward wastes VPU time,
        and the table lets the merger score per recording instead of
        per sample — see ChannelMerger)."""
        from .models import SimpleConv
        from .models.common import fourier_emb
        from .studies.api import INVALID_POSITION

        if not (isinstance(self.model, SimpleConv) and self.model.merger):
            return None, None, None
        positions = np.full((n_rec, n_chan, 2), INVALID_POSITION,
                            dtype=np.float32)
        rec_subjects = np.zeros(n_rec, dtype=np.int32)
        for split in self.datasets:
            for dset in split.datasets:
                positions[dset.recording.recording_index] = \
                    dset._get_positions()
                rec_subjects[dset.recording.recording_index] = \
                    dset.recording.subject_index
        emb = jnp.asarray(fourier_emb(jnp.asarray(positions),
                                      self.model.merger_pos_dim))
        return emb, jnp.asarray(positions), jnp.asarray(rec_subjects)

    def _example_batch(self) -> SegmentBatch:
        item = self.datasets.train[0]
        return SegmentBatch.collate([item] * 2)

    def _init_state(self) -> None:
        """Initialize model / loss / feature-model parameters and the
        optimizer state into one pytree.

        Flax ``init`` traces eagerly, so on a remote accelerator every
        primitive is a network round-trip (measured: 84s of a 137s cold
        solver build on the relayed chip). Initialization is
        deterministic across backends (threefry PRNG), so when the
        default backend is an accelerator the state is built on the
        host CPU backend and shipped to the device in one transfer.
        """
        cpu = None
        if jax.default_backend() != "cpu":
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                pass
        if cpu is None:
            self.state = self._build_initial_state()
            return
        with jax.default_device(cpu):
            state = self._build_initial_state()
        self.state = jax.device_put(state, jax.local_devices()[0])

    def _build_initial_state(self) -> dict:
        args = self.args
        rng = jax.random.PRNGKey(args.seed)
        batch = self._example_batch()
        arrays = batch.to_device()
        inputs, output, _, _ = self._task_wiring(
            arrays["meg"], arrays["features"], arrays["features_mask"])
        k_model, k_loss, k_fm, k_drop = jax.random.split(rng, 4)

        variables = self.model.init(
            {"params": k_model, "dropout": k_drop}, inputs,
            arrays["subject_index"], arrays["positions"], train=False)
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}

        if self.feature_model is not None:
            fm_vars = self.feature_model.init(
                {"params": k_fm}, output, train=False)
            params["fm"] = fm_vars["params"]
            batch_stats["fm"] = fm_vars.get("batch_stats", {})
            # ground truth for the loss is the feature-model output
            output = self.feature_model.apply(
                {"params": params["fm"],
                 **({"batch_stats": batch_stats["fm"]}
                    if batch_stats["fm"] else {})}, output, train=False)

        if self.clip_loss is not None:
            loss_vars = self.clip_loss.init(
                k_loss, output, output, method=self.clip_loss.get_scores)
            params["loss"] = loss_vars.get("params", {})
        else:
            params["loss"] = {}

        if self.optimizer is not None:
            opt_state = self.optimizer.init(params)
        else:
            opt_state = ()
        return {"step": jnp.int32(0), "params": params,
                "batch_stats": batch_stats, "opt_state": opt_state}

    # -- task wiring (static shapes) -------------------------------------------

    def _offsets(self) -> tp.Tuple[int, int]:
        args = self.args
        off = int(args.task.offset_meg_ms / 1000 * args.dset.sample_rate)
        return off, off

    def _task_wiring(self, meg, features, features_mask,
                     train: bool = False):
        """Apply meg offset / lowpass / task input-output selection.
        Returns (inputs dict, output, mask, limit)."""
        args = self.args
        sr = args.dset.sample_rate
        if not args.task.mask_loss:
            features_mask = jnp.ones_like(features_mask)
        off_meg, off_feat = self._offsets()
        if off_meg:
            meg = meg[..., off_meg:]
            features = features[..., :-off_feat]
            features_mask = features_mask[..., :-off_feat]
        meg_gt = meg
        if args.task.lowpass:
            meg = dsp.lowpass_filter(meg, args.task.lowpass / sr, zeros=5)
            if (args.task.lowpass_gt and train) or args.task.lowpass_gt_test:
                meg_gt = meg
        if args.task.type == "decode":
            limit = 0
            inputs = dict(meg=meg)
            output = features
        elif args.task.type == "encode":
            limit = int(args.task.meg_init * sr)
            t = meg.shape[-1]
            prompt = (jnp.arange(t) < limit).astype(meg.dtype)
            inputs = dict(meg=meg * prompt, features=features)
            output = meg_gt
        else:
            raise ValueError(f"Unknown task {args.task.type}")
        return inputs, output, features_mask, limit

    # -- the jitted step --------------------------------------------------------

    def _forward(self, params, batch_stats, arrays, na, pad_weight, rng,
                 train: bool):
        """Full _process_batch equivalent on device. `na` carries the
        normalization arrays + positional-embedding table — passed as
        arguments (NOT closures) so jit treats them as device buffers
        instead of baking hundreds of MB of constants into the HLO.
        Returns (estimate, output, mask, keep, new_batch_stats, penalty)."""
        args = self.args
        meg = arrays["meg"].astype(jnp.float32)
        features = arrays["features"].astype(jnp.float32)
        rec = arrays["recording_index"]

        # normalize + clamp + reject-peak: one fused Pallas pass on TPU
        # (bm/norm.py transform + ScaleReject, see ops/pallas_norm.py)
        from .ops.pallas_norm import normalize_clamp_peak
        limit_scale = args.norm.max_scale
        meg, peak = normalize_clamp_peak(
            meg, na["meg_center"][rec], na["meg_scale"][rec],
            limit_scale, clip=args.norm.clip,
            impl=getattr(self, "_norm_impl", "auto"))
        features = (features - na["feat_center"][None, :, None]) \
            / na["feat_scale"][None, :, None]
        if args.norm.clip:
            # clamped samples are kept (reference clamps in place and the
            # post-clamp peak never exceeds the limit, bm/norm.py:333-335)
            keep = jnp.ones_like(peak, dtype=bool)
        else:
            keep = peak <= limit_scale
        if args.norm.exclude_empty_features:
            empty = arrays["features_mask"].reshape(
                meg.shape[0], -1).sum(-1) == 0
            keep = keep & ~empty
        keep = keep.astype(jnp.float32) * pad_weight

        inputs, output, mask, limit = self._task_wiring(
            meg, features, arrays["features_mask"], train=train)

        variables = {"params": params["model"]}
        if batch_stats["model"]:
            variables["batch_stats"] = batch_stats["model"]
        mutable = []
        if train and batch_stats["model"]:
            mutable.append("batch_stats")
        if train:
            mutable.append("losses")
        model_kwargs = {}
        if na.get("pos_emb") is not None:
            if getattr(self.model, "merger_per_subject", False):
                model_kwargs["pos_emb"] = na["pos_emb"][rec]
            else:
                # per-recording scores: R softmax rows instead of B and
                # no [B, C, pos_dim] gather (exact same math)
                model_kwargs["pos_emb"] = na["pos_emb"]
                model_kwargs["rec_index"] = rec
                model_kwargs["rec_positions"] = na["rec_positions"]
                if getattr(self.model, "fused_head", False) and \
                        na.get("rec_subjects") is not None:
                    # recordings bind the subject, so the fused head
                    # folds the subject matrix per recording — but the
                    # authoritative binding is THIS batch's own
                    # (recording -> subject) pairs: a hand-built batch
                    # (e.g. solver.predict with an arbitrary
                    # subject_index on recording 0) must compute with
                    # ITS subject, exactly like per-sample
                    # SubjectLayers would
                    model_kwargs["rec_subjects"] = \
                        na["rec_subjects"].at[rec].set(
                            arrays["subject_index"])
        out = self.model.apply(
            variables, inputs, arrays["subject_index"],
            arrays["positions"], train=train, **model_kwargs,
            rngs={"dropout": rng}, mutable=mutable if mutable else False)
        estimate, mutated = out if mutable else (out, {})
        if getattr(self.model, "output_layout", "bct") == "btc":
            # normalize to the solver-wide [B, F, T] contract right at
            # the model boundary (losses, metrics, WER/eval pools and
            # process_batch all assume it). XLA folds this transpose
            # into the downstream contraction — measured neutral
            # (doc/perf_playbook.md) — so a config-set 'btc' model is
            # safe; the layout knob pays off only for direct library
            # use with ClipLoss(est_layout='btc') as in bench variants.
            estimate = jnp.swapaxes(estimate, 1, 2)
        new_bs = dict(batch_stats)
        if "batch_stats" in mutated:
            new_bs["model"] = mutated["batch_stats"]
        penalty = jnp.float32(0.)
        if "losses" in mutated:
            for leaf in jax.tree_util.tree_leaves(mutated["losses"]):
                penalty = penalty + jnp.sum(leaf)

        if limit:
            estimate = estimate[..., limit:]
            output = output[..., limit:]
            mask = mask[..., limit:]

        if self.feature_model is not None:
            fm_vars = {"params": params["fm"]}
            if batch_stats["fm"]:
                fm_vars["batch_stats"] = batch_stats["fm"]
            fm_mutable = ["batch_stats"] if (train and batch_stats["fm"]) \
                else []
            fm_out = self.feature_model.apply(
                fm_vars, output, train=train,
                mutable=fm_mutable if fm_mutable else False)
            if fm_mutable:
                output, fm_mut = fm_out
                new_bs["fm"] = fm_mut.get("batch_stats", batch_stats["fm"])
            else:
                output = fm_out

        return estimate, output, mask, keep, new_bs, penalty

    def _loss_value(self, params, estimate, output, mask, keep,
                    negatives, negative_weight, train: bool):
        args = self.args
        if self.clip_loss is not None:
            candidates = output
            cand_weight = keep
            if negatives is not None:
                candidates = jnp.concatenate([output, negatives], axis=0)
                cand_weight = jnp.concatenate([keep, negative_weight])
            return self.clip_loss.apply(
                {"params": params["loss"]}, estimate, candidates,
                sample_weight=keep, candidate_weight=cand_weight,
                train=train)
        if self.feature_loss is not None:
            return self.feature_loss(estimate, output, mask,
                                     sample_weight=keep, train=train)
        fn = {"l1": masked_l1, "mse": masked_l2}[args.optim.loss]
        return fn(estimate, output, mask, sample_weight=keep)

    def _ring_clip_loss(self, params, estimate, output, keep,
                        negatives, negative_weight, train: bool,
                        axis: str):
        """CLIP loss with the cross-shard candidates ring-gathered
        (parallel.ring_negatives): each of the k-1 other blocks of this
        shard's device group arrives one lax.ppermute hop at a time and
        is scored immediately, so peak candidate HBM is O(local batch)
        instead of the all_gather branch's O(k * local batch) — the
        layout that makes pod-wide global negatives (k=0 -> k=mesh
        size) feasible. Runs inside shard_map; the score matrix
        [b, k*b + n_extra] is small and column order is irrelevant to
        the softmax, so the loss (and its gradients, which flow back
        around the ring through ppermute's transpose) equals the
        all_gather branch exactly (tests/test_parallel.py).

        Works for every ClipLoss configuration: get_scores transforms
        (trim/linear/pool/center) are per-candidate, hence blockwise.
        """
        clip = self.clip_loss
        lp = {"params": params["loss"]}
        b = estimate.shape[0]
        k = self._negatives_group_size()

        def scores_of(cand):
            return clip.apply(lp, estimate, cand, train=train,
                              method=clip.get_scores)

        s_local = scores_of(output)  # [b, b], diag = positives
        cand_w = keep
        scores = s_local
        if k > 1:
            # one-hop left rotation within each contiguous device group
            size = self.mesh.size
            perm = [(g + j, g + (j - 1) % k)
                    for g in range(0, size, k) for j in range(k)]

            def hop(carry, _):
                blk, w = carry
                blk = jax.lax.ppermute(blk, axis, perm)
                w = jax.lax.ppermute(w, axis, perm)
                return (blk, w), (scores_of(blk), w)

            _, (s_rot, w_rot) = jax.lax.scan(
                hop, (output, keep), None, length=k - 1)
            scores = jnp.concatenate(
                [s_local, jnp.moveaxis(s_rot, 0, 1).reshape(b, -1)],
                axis=1)
            cand_w = jnp.concatenate([keep, w_rot.reshape(-1)])
        if negatives is not None:
            scores = jnp.concatenate([scores, scores_of(negatives)],
                                     axis=1)
            cand_w = jnp.concatenate([cand_w, negative_weight])
        return clip.loss_from_scores(scores, sample_weight=keep,
                                     candidate_weight=cand_w)

    def set_mesh(self, mesh) -> None:
        """Enable data-parallel training over a jax.sharding.Mesh; the
        batch is sharded over the mesh's first axis and contrastive
        negatives stay per-shard, matching the reference's per-GPU
        negative pools (README.md:139-143, SURVEY.md §2.4)."""
        self.mesh = mesh
        self._jit_cache.clear()

    def _loss_and_aux(self, params, batch_stats, arrays, na, pad_weight,
                      negatives, negative_weight, rng, train: bool,
                      return_output: bool,
                      gather_axis: tp.Optional[str] = None,
                      gather_groups: tp.Optional[tp.Sequence] = None):
        """Forward + loss on (a shard of) the batch.

        gather_axis: when set (parallel.negatives_group_size != 1 under a
        mesh), the outputs of the shards in this shard's device *group*
        are all_gathered and the other shards' rows join the CLIP
        candidate pool. A group spanning the whole mesh (gather_groups
        None) gives global negatives — an extension the reference explicitly
        does NOT do (its per-GPU pools are intentional,
        README.md:139-143). Intermediate group sizes reproduce the
        reference's k-GPU dynamics on a larger mesh (e.g. groups of 4 on
        a v5e-8 behave like the paper's 2×V100 local pools when the
        per-group batch matches the per-GPU batch) — SURVEY.md §7."""
        estimate, output, mask, keep, new_bs, penalty = self._forward(
            params, batch_stats, arrays, na, pad_weight, rng, train)
        ring = (gather_axis is not None and self.clip_loss is not None
                and self.args.parallel.ring_negatives)
        if ring:
            # ring-gather: candidate blocks rotate around the device
            # group over the ICI ring; the gathered tensor never
            # materializes (O(local batch) candidate HBM at any group
            # size). Same loss/grads as the all_gather branch below.
            loss = self._ring_clip_loss(params, estimate, output, keep,
                                        negatives, negative_weight,
                                        train, gather_axis)
        elif gather_axis is not None and self.clip_loss is not None:
            # [k, b, ...] where k = group size (contiguous device groups)
            all_out = jax.lax.all_gather(output, gather_axis,
                                         axis_index_groups=gather_groups)
            all_keep = jax.lax.all_gather(keep, gather_axis,
                                          axis_index_groups=gather_groups)
            idx = jax.lax.axis_index(gather_axis)
            k = all_out.shape[0]
            pos_in_group = jax.lax.rem(idx, k)
            other = (jnp.arange(k) != pos_in_group).astype(all_keep.dtype)
            extra = all_out.reshape(-1, *output.shape[1:])
            extra_w = (all_keep * other[:, None]).reshape(-1)
            if negatives is None:
                negatives, negative_weight = extra, extra_w
            else:
                negatives = jnp.concatenate([extra, negatives])
                negative_weight = jnp.concatenate([extra_w,
                                                   negative_weight])
        if not ring:
            loss = self._loss_value(params, estimate, output, mask, keep,
                                    negatives, negative_weight, train)
        if train:
            loss = loss + penalty
            if self.args.optim.svd:
                loss = loss + self.args.optim.svd * svd_penalty(
                    params["model"], _rng=_AlwaysApply())
        aux = dict(keep=keep.sum(), new_bs=new_bs)
        if return_output:
            aux["output"] = output
        return loss, aux

    def _build_step(self, train: bool, with_negatives: bool,
                    return_output: bool, jit: bool = True):
        """Build (and cache) the jitted step for this configuration.
        `jit=False` returns the raw python step (uncached) so callers
        can embed it in a larger traced region — bench.py times CHUNK
        shipped steps inside one jitted fori_loop (single dispatch; a
        per-step host round trip would bill relay latency to the chip).

        Single-device: plain jit. With a mesh: the loss is computed under
        shard_map — each device sees only its batch/negative shard (the
        CLIP softmax runs over LOCAL candidates only) and losses/stats
        are pmean'd, so gradients are synchronized exactly like DDP
        all-reduce (bm/solver.py:386) while preserving the per-replica
        contrastive dynamics the paper depends on.
        """
        key = (train, with_negatives, return_output, self.mesh,
               self.args.parallel.ring_negatives)
        if jit and key in self._jit_cache:
            return self._jit_cache[key]

        mesh = self.mesh
        if mesh is not None:
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as P
            shard_map = _partial(jax.shard_map, check_vma=False)
            axis = mesh.axis_names[0]
            batch_spec = {name: P(axis) for name in SegmentBatch.ARRAY_FIELDS}

            def sharded_loss(params, batch_stats, arrays, na, pad_weight,
                             negatives, negative_weight, rngs):
                k = self._negatives_group_size()
                gather_axis = (axis if (self.clip_loss is not None and
                                        k > 1) else None)
                gather_groups = None
                if gather_axis is not None and k < mesh.size:
                    gather_groups = [
                        list(range(g * k, (g + 1) * k))
                        for g in range(mesh.size // k)]

                def local(params, batch_stats, arrays, na, pad_weight,
                          negatives, negative_weight, rngs):
                    loss, aux = self._loss_and_aux(
                        params, batch_stats, arrays, na, pad_weight,
                        negatives, negative_weight, rngs[0], train,
                        return_output, gather_axis=gather_axis,
                        gather_groups=gather_groups)
                    loss = jax.lax.pmean(loss, axis)
                    aux["keep"] = jax.lax.psum(aux["keep"], axis)
                    aux["new_bs"] = jax.tree_util.tree_map(
                        lambda x: jax.lax.pmean(x, axis), aux["new_bs"])
                    return loss, aux

                # sampled extra negatives are REPLICATED: every shard tops
                # its candidate pool up to the full optim.negatives, like
                # each reference GPU does (bm/solver.py:363-368) — never
                # split over the mesh
                neg_spec = P()
                out_aux_spec = dict(keep=P(), new_bs=P())
                if return_output:
                    out_aux_spec["output"] = P(axis)
                return shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(), batch_spec, P(), P(axis), neg_spec,
                              neg_spec, P(axis)),
                    out_specs=(P(), out_aux_spec),
                )(params, batch_stats, arrays, na, pad_weight, negatives,
                  negative_weight, rngs)

        def step(state, arrays, na, pad_weight, negatives,
                 negative_weight, rng):
            if mesh is not None:
                rngs = jax.random.split(rng, mesh.size)

                def loss_fn(params):
                    return sharded_loss(params, state["batch_stats"],
                                        arrays, na, pad_weight, negatives,
                                        negative_weight, rngs)
            else:
                def loss_fn(params):
                    return self._loss_and_aux(
                        params, state["batch_stats"], arrays, na,
                        pad_weight, negatives, negative_weight, rng,
                        train, return_output)

            if train:
                (loss_val, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state["params"])
                updates, opt_state = self.optimizer.update(
                    grads, state["opt_state"], state["params"])
                params = optax.apply_updates(state["params"], updates)
                new_state = {"step": state["step"] + 1, "params": params,
                             "batch_stats": aux["new_bs"],
                             "opt_state": opt_state}
            else:
                loss_val, aux = loss_fn(state["params"])
                new_state = state
            metrics = {"loss": loss_val,
                       "keep": aux["keep"],
                       "count": pad_weight.sum()}
            if return_output:
                metrics["output"] = aux["output"]
            return new_state, metrics

        if not jit:
            return step
        from .parallel import step_compiler_options
        jitted = jax.jit(step, donate_argnums=(0,) if train else (),
                         compiler_options=step_compiler_options(self.args))
        self._jit_cache[key] = jitted
        return jitted

    # -- loop ---------------------------------------------------------------------

    def _run_one_epoch(self, training: bool) -> tp.Dict[str, float]:
        args = self.args
        phase = "train" if training else "valid"
        loader = self.loaders[phase]
        loader.set_epoch(self.epoch - 1)
        total = len(loader)
        if args.optim.max_batches:
            total = min(total, args.optim.max_batches)

        n_neg = args.optim.negatives
        with_negatives = n_neg is not None
        if with_negatives:
            assert args.optim.loss == "clip"
            # Multi-process pods keep the sampled pool IDENTICAL on
            # every process: per-step pool updates are
            # process_allgather'ed in process order (below), and the
            # sampling RNG is seeded from (seed, epoch, phase) only —
            # so the replicated candidate sharding sees the same values
            # on every host (XLA's replica-equality assumption). The
            # gathered update reconstructs the global batch order, so a
            # multi-host pool equals the single-host pool on the same
            # data. (The reference keeps per-rank pools,
            # bm/solver.py:368-371, which could not feed a replicated
            # sharding.)

        step = self._build_step(training and self.optimizer is not None,
                                with_negatives,
                                return_output=with_negatives)
        rng = jax.random.PRNGKey(args.seed + self.epoch * 1000
                                 + (0 if training else 1))
        # per-step keys hoisted to ONE device op + host fetch: an eager
        # `rng, sub = jax.random.split(rng)` inside the loop costs two
        # dispatch round-trips per step, which on a relayed accelerator
        # (~40ms each) dwarfed the 31ms step itself (scripts/bench_e2e)
        step_keys = np.asarray(jax.random.split(rng, total))
        # fresh permutation per batch (reference draws a new randperm each
        # batch, bm/solver.py:359-371); seeded per (seed, epoch, phase) for
        # reproducibility across restarts
        self._neg_rng = np.random.RandomState(
            (args.seed * 9176 + self.epoch * 2 + int(not training))
            % (2 ** 31))
        # keep per-step metrics as device scalars and fetch once at epoch
        # end: a host sync costs a full dispatch round trip per step on
        # relayed TPUs, and steps chain fine asynchronously
        losses, keeps, counts = [], [], []
        for idx, (batch, pad_weight) in enumerate(loader):
            if idx >= total:
                break
            # multi-process: every loader yields the same seeded global
            # batch; keep only this process's rows (the reference's
            # DistributedSampler split, bm/solver.py:120-130)
            rows = self.local_rows(len(batch))
            rows_split = (rows.start, rows.stop) != (0, len(batch))
            if rows_split:
                batch = batch[rows]
                pad_weight = pad_weight[rows]
            arrays = batch.to_device(args.parallel.transfer_dtype)
            pad_w = jnp.asarray(pad_weight)
            if self.mesh is not None:
                # commit inputs to the mesh up front (per-host local
                # data on multi-host pods — parallel.shard_array)
                from .parallel import shard_array, shard_batch
                arrays = shard_batch(arrays, self.mesh)
                pad_w = shard_array(pad_w, self.mesh)
            negatives, negative_weight = self._sample_negatives(
                phase, arrays["features"].shape, n_neg,
                batch_size=self._effective_candidates(len(batch))) \
                if with_negatives else (None, None)
            if self.mesh is not None and negatives is not None:
                from .parallel import replicate
                negatives = replicate(negatives, self.mesh)
                negative_weight = replicate(negative_weight, self.mesh)
            self.state, metrics = step(self.state, arrays,
                                       self.norm_arrays, pad_w,
                                       negatives, negative_weight,
                                       step_keys[idx])
            losses.append(metrics["loss"])
            keeps.append(metrics["keep"])
            counts.append(metrics["count"])
            if with_negatives:
                # the pool update needs the outputs on host (sync); on
                # multi-host pods each process pulls its addressable
                # rows, then every process assembles the same global
                # update (process_allgather in process order == the
                # global batch order) so pools — and therefore the
                # replicated sampled candidates — stay identical
                # across hosts
                out_rows = _addressable_rows(metrics["output"])
                if jax.process_count() > 1 and rows_split:
                    from jax.experimental import multihost_utils
                    out_rows = np.asarray(
                        multihost_utils.process_allgather(
                            out_rows, tiled=True))
                self._update_negative_pool(phase, out_rows)
            if idx + 1 == total:
                break
        # ONE stacked fetch for the epoch's device scalars: a float()
        # per scalar costs a full D2H round trip each (~40ms relayed —
        # 3 scalars/step dwarfed the 31ms step, scripts/bench_e2e.py)
        if not losses:
            return {"loss": float("nan")}
        stacked = np.asarray(jnp.stack(
            [jnp.stack(losses), jnp.stack(keeps), jnp.stack(counts)]))
        losses, keeps, counts = stacked[0], stacked[1], stacked[2]
        self._seen += int(counts.sum())
        self._rejected += int(counts.sum() - keeps.sum())
        metrics = {"loss": float(np.mean(losses))}
        if not training and metrics["loss"] < self.best_loss:
            self.best_loss = metrics["loss"]
            self.best_epoch = self.epoch
            logger.info("New best valid loss %.4f", self.best_loss)
            self.best_state = self._copy_params()
        return metrics

    def _negatives_group_size(self) -> int:
        """Resolved contrastive group size: devices per negative group.

        config 1 = fully local per-shard pools (reference per-GPU
        semantics), 0 = global, k = groups of k devices. Validated
        against the mesh."""
        k = self.args.parallel.negatives_group_size
        if self.mesh is None:
            return 1
        d = self.mesh.size
        if k == 0:
            return d
        assert 1 <= k <= d and d % k == 0, (
            f"parallel.negatives_group_size={k} must divide the mesh "
            f"size {d}")
        return k

    def _effective_candidates(self, local_batch: int) -> int:
        """In-batch CLIP candidates each shard sees before pool top-up:
        its group's worth of batch rows. `local_batch` is this process's
        batch (== the global batch on single-host)."""
        if self.mesh is None:
            return local_batch
        local_devices = max(1, self.mesh.size // jax.process_count())
        per_shard = max(1, local_batch // local_devices)
        return per_shard * self._negatives_group_size()

    def _sample_negatives(self, phase: str, feat_shape, n_negatives: int,
                          batch_size: int):
        """Top-up candidates from the negative pool to n_negatives
        (bm/solver.py:359-371); zero-weight padding when the pool is
        still small (static shapes). Under a mesh the caller passes the
        per-group candidate count so each shard tops up to the full
        n_negatives, matching per-GPU reference counts."""
        n_extra = max(0, n_negatives - batch_size)
        shape = (n_extra,) + tuple(feat_shape[1:])
        out_t = self._output_time(feat_shape[-1])
        shape = (n_extra, self._output_dim(feat_shape[1]), out_t)
        buf = self.negative_pool[phase]
        negatives = np.zeros(shape, dtype=np.float32)
        weight = np.zeros(n_extra, dtype=np.float32)
        if buf is not None and len(buf) and n_extra:
            take = min(n_extra, len(buf))
            sel = self._neg_rng.permutation(len(buf))[:take]
            negatives[:take] = buf[sel]
            weight[:take] = 1.
        return jnp.asarray(negatives), jnp.asarray(weight)

    def _output_time(self, feat_t: int) -> int:
        off, off_f = self._offsets()
        return feat_t - off_f if off_f else feat_t

    def _output_dim(self, feat_dim: int) -> int:
        if self.feature_model is not None:
            return self.args.feature_model_params.get("n_out_channels",
                                                      feat_dim)
        return feat_dim

    def _update_negative_pool(self, phase: str, outputs: np.ndarray) -> None:
        pool_size = self.negative_pool_size
        buf = self.negative_pool[phase]
        buf = outputs if buf is None else np.concatenate([outputs, buf])
        self.negative_pool[phase] = buf[:pool_size]

    def train(self) -> float:
        args = self.args
        if self.history:
            logger.info("Replaying %d past epochs of metrics",
                        len(self.history))
        from .logging_utils import maybe_profile
        for epoch in range(self.epoch, args.optim.epochs + 1):
            self.epoch = epoch
            t0 = time.time()
            stages = {}
            with maybe_profile(self.folder,
                               args.profile and epoch == self.epoch == 1):
                stages["train"] = self._run_one_epoch(training=True)
            stages["valid"] = self._run_one_epoch(training=False)

            will_stop = epoch == args.optim.epochs
            if args.early_stop_patience and \
                    epoch >= self.best_epoch + args.early_stop_patience:
                logger.warning("Early stopping after %d epochs without "
                               "improvement.", args.early_stop_patience)
                will_stop = True

            if epoch % args.eval_every == 0 or will_stop:
                if self.best_epoch > self.last_test_epoch:
                    assert self.best_state is not None
                    saved = self._copy_params()
                    self._load_params(self.best_state)
                    try:
                        stages["test"] = self._test_one_epoch()
                    finally:
                        self._load_params(saved)
                    self.last_test_epoch = epoch
            logger.info(
                "Epoch %d | %s | reject %.3f%% | %.1fs", epoch,
                " | ".join(f"{k} loss {v.get('loss', float('nan')):.4f}"
                           if "loss" in v else f"{k} {v}"
                           for k, v in stages.items()),
                100 * self.rejection_rate, time.time() - t0)
            self.history.append(stages)
            self.metric_sinks.log(epoch, stages)
            self.commit(block=will_stop)
            if will_stop:
                break
        # join any in-flight async write (re-raises a failed write) so
        # eval-after-train always reads the final epoch's checkpoint and
        # done.json never marks an XP finished without it
        self.wait_checkpoint()
        if self._checkpoint_executor is not None:
            self._checkpoint_executor.shutdown(wait=True)
            self._checkpoint_executor = None
        self.metric_sinks.close()
        # completion marker: distinguishes a finished XP (incl. early
        # stop) from one interrupted mid-run, whose history.json exists
        # after every epoch's commit — the grid runner resumes the
        # latter instead of skipping it
        import json
        with write_and_rename(self.folder / "done.json", "w") as f:
            json.dump({"epochs": self.epoch,
                       "best_loss": float(self.best_loss)}, f)
        return self.best_loss

    @property
    def rejection_rate(self) -> float:
        return self._rejected / max(self._seen, 1)

    # -- test dispatch ---------------------------------------------------------

    def _test_one_epoch(self) -> tp.Dict[str, float]:
        test_features = self.datasets.test.datasets[0].features
        if self.clip_loss is not None and "WordHash" in test_features:
            from .wer import get_wer
            return get_wer(self)
        from .play import get_test_metrics
        args = self.args
        trim_offset = 0
        if args.task.type == "encode":
            time_offset = -args.dset.tmin - args.task.meg_init
            trim_offset = int(args.dset.sample_rate * time_offset)
        return get_test_metrics(self, trim_offset)

    def get_metric_constructors(self):
        """Test-metric factories per task/feature
        (bm/solver.py:403-433)."""
        from .metrics import ClassificationAcc, L2Reg, OnlineCorrelation
        if self.args.task.type == "encode":
            return [OnlineCorrelation.get_constructor(
                slice(None), slice(None), "corr_meg")]
        assert self.args.task.type == "decode"
        constructors = []
        for feature in self.used_features.values():
            name = feature.name
            sl = self.used_features.get_slice(name)
            out_sl = self.used_features.get_slice(name, model_output=True)
            if feature.categorical:
                constructors.append(ClassificationAcc.get_constructor(
                    out_sl, sl, name=f"acc_{name}"))
            else:
                constructors.append(L2Reg.get_constructor(
                    sl, out_sl, name=f"l2_{name}"))
                constructors.append(OnlineCorrelation.get_constructor(
                    out_sl, sl, name=f"corr_{name}"))
        return constructors

    # -- inference ---------------------------------------------------------------

    def _build_forward(self, training: bool, use_mesh: bool):
        """Jitted inference forward (no loss): (params, batch_stats,
        arrays, na, pad_weight, rng) -> (estimate, output, mask, keep).

        With `use_mesh` the forward runs under shard_map (batch sharded
        on the mesh axis, everything else replicated) — the test stage
        (WER / streaming metrics / offline eval) keeps every chip busy,
        where the reference shards test batches by DDP rank
        (bm/wer.py:36-37, bm/play.py:120-124). shard_map (not plain jit
        over sharded inputs) is REQUIRED on real multi-chip TPUs: the
        forward contains the Pallas normalize/clamp/peak kernel, and
        Mosaic kernels cannot be automatically partitioned by GSPMD —
        they must be manually sharded (the train step wraps its loss in
        shard_map for the same reason)."""
        key = ("forward", training, use_mesh)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def fwd(params, batch_stats, arrays, na, pad_weight, rng):
            estimate, output, mask, keep, _, _ = self._forward(
                params, batch_stats, arrays, na, pad_weight, rng,
                train=training)
            return estimate, output, mask, keep

        if use_mesh:
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as P
            mesh = self.mesh
            axis = mesh.axis_names[0]
            batch_spec = {name: P(axis)
                          for name in SegmentBatch.ARRAY_FIELDS}
            fwd = _partial(jax.shard_map, check_vma=False)(
                fwd, mesh=mesh,
                in_specs=(P(), P(), batch_spec, P(), P(axis), P()),
                out_specs=(P(axis), P(axis), P(axis), P(axis)))

        from .parallel import step_compiler_options
        jitted = jax.jit(fwd,
                         compiler_options=step_compiler_options(self.args))
        self._jit_cache[key] = jitted
        return jitted

    def local_rows(self, n_global: int) -> slice:
        """This process's row block of a globally-identical batch:
        slice(0, n) on single-process; the contiguous per-process block
        on a multi-process mesh (parallel.process_rows). Callers align
        per-row host metadata with the rows forward_batch returns.
        Batches that do not divide over mesh/processes run whole
        (forward_batch bypasses the mesh for them too)."""
        if (self.mesh is None or jax.process_count() == 1
                or n_global % self.mesh.size != 0):
            return slice(0, n_global)
        from .parallel import process_rows
        return process_rows(n_global)

    def forward_batch(self, batch: SegmentBatch,
                      pad_weight: tp.Optional[np.ndarray] = None,
                      training: bool = False
                      ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray,
                                    np.ndarray]:
        """Jitted host-facing forward; `keep` already folds in the
        loader's pad_weight. Under a mesh the batch is sharded over the
        devices. On multi-process meshes pass the globally-identical
        batch every loader yields: it is reduced to this process's rows
        (solver.local_rows) before the transfer, and the returned
        arrays cover only those rows (reference per-rank semantics,
        bm/play.py:120-124). Batches that do not divide over the mesh
        (e.g. predict's batch of 1) run single-device."""
        if pad_weight is None:
            pad_weight = np.ones(len(batch), dtype=np.float32)
        pad_weight = np.asarray(pad_weight, dtype=np.float32)
        use_mesh = (self.mesh is not None
                    and len(batch) % self.mesh.size == 0)
        if use_mesh:
            rows = self.local_rows(len(batch))
            if (rows.start, rows.stop) != (0, len(batch)):
                batch = batch[rows]
                pad_weight = pad_weight[rows]
        arrays = batch.to_device()
        pad_w = jnp.asarray(pad_weight)
        if use_mesh:
            from .parallel import shard_array, shard_batch
            arrays = shard_batch(arrays, self.mesh)
            pad_w = shard_array(pad_w, self.mesh)
        fwd = self._build_forward(training, use_mesh)
        estimate, output, mask, keep = fwd(
            self.state["params"], self.state["batch_stats"], arrays,
            self.norm_arrays, pad_w, jax.random.PRNGKey(0))
        return (_addressable_rows(estimate), _addressable_rows(output),
                _addressable_rows(mask), _addressable_rows(keep) > 0.5)

    def process_batch(self, batch: SegmentBatch, training: bool = False
                      ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray,
                                    np.ndarray]:
        """Host-facing _process_batch: returns (estimate, output,
        features_mask, keep) as numpy (bm/solver.py:230-321 parity).
        Routed through the jitted (mesh-aware) forward."""
        return self.forward_batch(batch, training=training)

    def predict(self, meg: tp.Optional[np.ndarray] = None,
                features: tp.Optional[np.ndarray] = None,
                subject_index: int = 0, recording_index: int = 0
                ) -> np.ndarray:
        """One prediction; zero MEG if not provided
        (bm/solver.py:172-187)."""
        assert features is not None
        n_chan = self.datasets.train[0].meg.shape[0]
        if meg is None:
            meg = np.zeros((n_chan, features.shape[1]), dtype=np.float32)
        positions = self.datasets.train.datasets[0]._get_positions()
        batch = SegmentBatch(
            meg=meg[None], features=features[None].astype(np.float32),
            features_mask=np.ones((1, 1, features.shape[-1]), dtype=bool),
            subject_index=np.asarray([subject_index], dtype=np.int32),
            recording_index=np.asarray([recording_index], dtype=np.int32),
            positions=positions[None])
        estimate, *_ = self.process_batch(batch, training=False)
        return estimate[0]

    # -- state management ----------------------------------------------------------

    def _copy_params(self) -> dict:
        return jax.device_get({"params": self.state["params"],
                               "batch_stats": self.state["batch_stats"]})

    def _load_params(self, saved: dict) -> None:
        self.state = {**self.state,
                      "params": jax.device_put(saved["params"]),
                      "batch_stats": jax.device_put(saved["batch_stats"])}

    def commit(self, block: bool = False) -> None:
        """Checkpoint + metrics history (flashy commit parity).

        With ``checkpoint_async`` (default) the pickle+disk write runs
        on one background thread so the next epoch trains under it —
        the reference blocks its loop on torch.save every epoch. The
        payload is captured as host-side copies at call time (state via
        device_get; history/pool containers shallow-copied — their past
        entries are replaced, never mutated in place), writes stay
        ordered and atomic (single worker + write_and_rename), and a
        failed write raises at the NEXT commit / the end-of-train join
        instead of disappearing. Crash-loss window: at most the one
        pending epoch — the previous on-disk checkpoint stays intact
        either way."""
        payload = dict(
            state=jax.device_get(self.state), best_state=self.best_state,
            history=list(self.history), epoch=self.epoch + 1,
            best_loss=self.best_loss, best_epoch=self.best_epoch,
            last_test_epoch=self.last_test_epoch,
            negative_pool=dict(self.negative_pool),
            delta=self.args.delta())

        def write() -> None:
            with write_and_rename(self.checkpoint_path) as f:
                pickle.dump(payload, f)
            import json
            with write_and_rename(self.folder / "history.json", "w") as f:
                json.dump(payload["history"], f, indent=1, default=float)

        self.wait_checkpoint()  # order + surface any previous failure
        if getattr(self.args, "checkpoint_async", True) and not block:
            if self._checkpoint_executor is None:
                self._checkpoint_executor = futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="bm_ckpt")
            self._checkpoint_future = self._checkpoint_executor.submit(
                write)
        else:
            write()

    def wait_checkpoint(self) -> None:
        """Join the pending async checkpoint write (re-raises its
        exception, if any)."""
        future, self._checkpoint_future = self._checkpoint_future, None
        if future is not None:
            future.result()

    def restore(self) -> bool:
        """Resume from this XP's checkpoint, or warm-start from
        continue_sig (bm/solver.py:104-118)."""
        if self.checkpoint_path.exists():
            with open(self.checkpoint_path, "rb") as f:
                payload = pickle.load(f)
            self.state = jax.device_put(payload["state"])
            self.best_state = payload["best_state"]
            self.history = payload["history"]
            self.epoch = payload["epoch"]
            self.best_loss = payload["best_loss"]
            self.best_epoch = payload["best_epoch"]
            self.last_test_epoch = payload["last_test_epoch"]
            self.negative_pool = payload.get(
                "negative_pool", {"train": None, "valid": None})
            logger.info("Restored checkpoint at epoch %d", self.epoch)
            return True
        if self.args.continue_sig:
            path = (self.folder.parent / self.args.continue_sig
                    / self.checkpoint_path.name)
            assert path.exists(), f"Could not find checkpoint {path}"
            with open(path, "rb") as f:
                payload = pickle.load(f)
            source = payload["best_state"] if self.args.continue_best \
                else {"params": payload["state"]["params"],
                      "batch_stats": payload["state"]["batch_stats"]}
            self._load_params(source)
        return False


class _AlwaysApply:
    """Stand-in RNG that always applies the SVD penalty inside jit (the
    stochastic skip is decided on the host, outside the trace)."""

    def random(self) -> float:
        return 0.
