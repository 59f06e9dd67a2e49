"""Configuration: nested dataclasses with deterministic XP signatures.

Replaces the reference's Hydra/OmegaConf + Dora stack (bm/conf/*.yaml,
bm/train.py:171). Every field mirrors a key in the reference's
conf/config.yaml (defaults preserved); presets reproduce the composed
configs (clip_conv, convrnn, deep_mel ...).

XP identity follows Dora's rule (README.md:145-154): the signature is a
hash of the *non-default deltas* only, so adding new config keys with
default values never changes existing signatures.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import typing as tp
from dataclasses import dataclass, field
from pathlib import Path


def _dict(**kwargs: tp.Any) -> tp.Any:
    # deep copy: nested dicts must never be shared across config instances
    import copy
    return field(default_factory=lambda: copy.deepcopy(kwargs))


def _list(*items: tp.Any) -> tp.Any:
    return field(default_factory=lambda: list(items))


@dataclass
class OptimConfig:
    name: str = "adam"
    lr: float = 3e-4
    beta2: float = 0.999
    epochs: int = 40
    batch_size: int = 32
    loss: str = "l1"                       # l1 | mse | clip | regression_classification
    use_weighting: bool = False
    max_batches: tp.Optional[int] = None
    svd: float = 0.
    negatives: tp.Optional[int] = None
    negative_pool_size: tp.Optional[int] = None


@dataclass
class ClipConfig:
    linear: tp.Optional[int] = None
    twin: bool = True
    pool: bool = False
    tmin: tp.Optional[float] = None
    tmax: tp.Optional[float] = None
    tmin_train: tp.Optional[float] = None
    tmax_train: tp.Optional[float] = None
    center: bool = False
    save_best: bool = True
    sync_grad: bool = False
    #: matmul input dtype for the CLIP score contraction ('bfloat16'
    #: runs the [B, C*T] x [candidates, C*T] einsum at full MXU rate
    #: with fp32 accumulation — the 10k-negative WER/eval pools are the
    #: big win; None keeps fp32). Softmax always stays fp32.
    compute_dtype: tp.Optional[str] = None


@dataclass
class TestEvalConfig:
    wer_negatives: int = 10_000
    wer_topx: int = 10
    wer_random: bool = False
    wer_recordings: int = 40
    wer_study: tp.Optional[str] = None
    #: int8-quantized WER/eval candidate pools (per-candidate symmetric;
    #: the dequant scale cancels out of the norm-folded score). v5e's
    #: int8 MXU doubles the scoring rate over bf16 and halves the pool
    #: stream/HBM again; scores carry ~1-2% zero-mean quantization noise
    #: relative to their own spread, so retrieval metrics move only on
    #: near-ties (extension — the reference has no equivalent; keep
    #: False when bit-matching reference eval numbers).
    pool_int8: bool = False


@dataclass
class DsetTestOverride:
    tmin: tp.Optional[float] = None
    tmax: tp.Optional[float] = None
    condition: tp.Optional[tp.Union[str, float]] = "word"


@dataclass
class DsetConfig:
    selections: tp.List[str] = _list("gwilliams2022")
    tmin: float = -0.5
    tmax: float = 2.5
    n_recordings: int = 1000
    n_subjects: tp.Optional[int] = None
    n_subjects_test: tp.Optional[int] = None
    shuffle_recordings_seed: int = -1
    skip_recordings: int = 0
    test_ratio: float = 0.2
    valid_ratio: float = 0.1
    remove_ratio: float = 0.
    condition: tp.Union[str, float] = 0.5
    apply_baseline: bool = True
    min_block_duration: float = 6.
    force_uid_assignement: bool = False
    min_n_blocks_per_split: int = 1
    ignore_end_in_block: bool = False
    ignore_start_in_block: bool = False
    sample_rate: int = 120
    highpass: float = 0.
    event_mask: bool = True
    split_wav_as_block: bool = True
    allow_empty_split: bool = False
    autoreject: bool = False
    test: DsetTestOverride = field(default_factory=DsetTestOverride)
    features: tp.List[str] = _list("Wav2VecTransformer")
    extra_test_features: tp.List[str] = field(default_factory=list)
    features_params: tp.Dict[str, tp.Any] = _dict(
        MelSpectrum=dict(n_fft=512, n_mels=120, normalized=True,
                         use_log_scale=True, log_scale_eps=1e-5),
        Pitch=dict(min_f0=100, max_f0=350),
        WordHash=dict(buckets=100000),
        XlmEmbedding=dict(contextual=False),
        WordEmbedding=dict(lang="auto"),
        WordEmbeddingSmall=dict(lang="auto"),
        PartOfSpeech=dict(lang="auto"),
        Wav2VecTransformer=dict(layers=[14, 15, 16, 17, 18], device="cpu",
                                random=False),
        Wav2VecChunk=dict(device="cpu"),
    )


@dataclass
class ScalerConfig:
    per_channel: bool = False
    n_samples_per_recording: int = 200
    n_samples_features: tp.Optional[int] = 8000


@dataclass
class NormConfig:
    scaler: ScalerConfig = field(default_factory=ScalerConfig)
    max_scale: float = 20.
    clip: bool = True
    exclude_empty_features: bool = False


@dataclass
class TaskConfig:
    type: str = "decode"       # decode | encode
    meg_init: float = 0.3
    lowpass: float = 0.
    offset_meg_ms: float = 0.
    lowpass_gt: bool = True
    lowpass_gt_test: bool = False
    mask_loss: bool = False


# model hyperparameter dicts mirror bm/conf/model_defaults/defaults.yaml
SIMPLECONV_DEFAULTS: tp.Dict[str, tp.Any] = dict(
    concatenate=False, depth=4, linear_out=False, complex_out=False,
    kernel_size=5, dilation_growth=2, dilation_period=None, skip=False,
    post_skip=False, growth=1., scale=None, rewrite=False, groups=1,
    glu=0, glu_context=0, glu_glu=True, gelu=False, dual_path=0,
    conv_dropout=0.0, dropout_input=0.0, batch_norm=False,
    relu_leakiness=0.0, subject_dim=64, subject_layers=False,
    embedding_scale=1.0, subject_layers_dim="input",
    subject_layers_id=False, n_fft=None, fft_complex=True, merger=False,
    merger_pos_dim=256, merger_channels=270, merger_dropout=0.2,
    merger_penalty=0., merger_per_subject=False, dropout=0.,
    dropout_rescale=True, initial_linear=0, initial_depth=1,
    initial_nonlin=False, subsample_meg_channels=0,
    # TPU performance knobs (all default to reference-equivalent
    # behavior; sigs unchanged -- non-default deltas only):
    #   dtype='bfloat16'     full-rate MXU convs, fp32 params/stats
    #   output_dtype         estimate dtype (pair with clip bf16 scores)
    #   output_layout='btc'  channels-last model output; the solver
    #                        transposes back to [B, F, T] at the model
    #                        boundary (free — XLA folds it), so this is
    #                        safe to set but only pays off for direct
    #                        library use with ClipLoss(est_layout='btc')
    #   conv_impl            encoder conv lowering (see DotConv1D)
    #   bn_conv_bias=False   elide conv biases that BatchNorm cancels
    #                        (+2% step time, function space unchanged)
    #   fused_conv_bn=True  Pallas fused conv+BN-stats stack layers
    #                        (see models.common.FusedConvBN)
    #   fused_head=True      merger+initial+subject as one per-recording
    #                        matrix (same params; SimpleConv._fused_head)
    #   gelu_exact=False     tanh-approx gelu (~5e-4 off the erf form)
    #                        — XLA lowers erf ~50% slower on TPU; keep
    #                        True for reference-checkpoint parity
    dtype=None, output_dtype=None, output_layout="bct", conv_impl="conv",
    bn_conv_bias=True, fused_conv_bn=False, fused_head=False,
    gelu_exact=True)

CONVRNN_DEFAULTS: tp.Dict[str, tp.Any] = dict(
    concatenate=False, depth=2, linear_out=False, complex_out=False,
    kernel_size=4, stride=2, growth=1., lstm=4, bidirectional_lstm=False,
    flip_lstm=False, attention=0, heads=4, conv_dropout=0.0,
    lstm_dropout=0.0, dropout_input=0.0, batch_norm=False,
    relu_leakiness=0.0, subject_dim=64, embedding_location=("lstm",),
    embedding_scale=1.0, subject_layers=False, subject_layers_dim="input")


@dataclass
class ParallelConfig:
    """Mesh/sharding knobs (no reference equivalent — the reference is
    DDP-only, SURVEY.md §2.4)."""
    data_axis: str = "data"
    #: contrastive candidates stay within groups of this many devices so
    #: the reference's per-GPU negative-pool dynamics (README.md:139-143)
    #: can be reproduced on any mesh size: 1 = fully local per-shard
    #: pools (reference per-GPU semantics), k = all_gather candidates
    #: within contiguous groups of k devices (e.g. 4 on a v5e-8 with the
    #: paper's global batch reproduces the 2xV100 per-GPU pool of 128),
    #: 0 = one global pool (extension). Must divide the mesh size.
    negatives_group_size: int = 1
    #: engage the data-parallel mesh automatically in the train CLI
    #: whenever more than one device is visible (and the batch divides
    #: over them); library users call solver.set_mesh themselves
    auto_mesh: bool = True
    #: call jax.distributed.initialize() at CLI startup — required on
    #: multi-process pods (coordinator env from the launcher), harmless
    #: but off by default for single-process hosts
    distributed_init: bool = False
    donate_state: bool = True
    #: cast meg/features to this dtype for the host->device transfer
    #: (e.g. 'bfloat16' halves wire bytes; compute upcasts on device)
    transfer_dtype: tp.Optional[str] = None
    #: XLA scoped-VMEM cap (KiB) for the step compiles, TPU backends
    #: only (parallel.step_compiler_options). 64 MiB measured ~6%
    #: faster than the compiler default on the v5e paper step
    #: (bench.py sweep, doc/perf_playbook.md); None = compiler default
    scoped_vmem_limit_kib: tp.Optional[int] = 65536
    #: ring-pass WER/eval scoring on single-process meshes: the
    #: candidate pool shards over the devices and rotates over the ICI
    #: ring (losses.ring_scores) instead of replicating every streamed
    #: block on every chip — host-link pool traffic drops n_dev-fold.
    #: Falls back to streaming when the pool exceeds per-device HBM,
    #: for transform/int8 configs, and on multi-process pods
    ring_scoring: bool = False
    #: ring-gather the TRAINING contrastive candidates: with
    #: negatives_group_size k > 1, rotate each shard's candidate block
    #: around its device group over the ICI ring (lax.ppermute under
    #: shard_map) instead of materializing the all_gathered [k*b, F, T]
    #: tensor — peak candidate HBM stays O(local batch) regardless of
    #: group size, making pod-wide global negatives (k=0) feasible.
    #: Same loss/gradients as the all_gather path (tests); off by
    #: default to match the reference's memory/XLA-collective profile
    ring_negatives: bool = False
    #: persist XLA compiles across runs (parallel.
    #: enable_compilation_cache): the ~37 s paper-step compile is paid
    #: once per (config, jaxlib) instead of once per grid job / eval
    #: reload. Directory: BM_TPU_XLA_CACHE, else <env.cache>/xla
    compilation_cache: bool = True
    #: host-side batch ASSEMBLY dtype (native/gather.cpp): 'bfloat16'
    #: writes the wire format directly during the gather instead of
    #: assembling fp32 and casting at transfer — halves the loader's
    #: host memory traffic. None keeps fp32 assembly (the cast to
    #: transfer_dtype, if any, happens in SegmentBatch.to_device).
    #: Applies to the train/valid/test epoch loaders only — wer/eval/
    #: play loaders stay fp32 (they read word-hash floats host-side).
    #: Scaler fitting always reads fp32 (it bypasses the Loader).
    assemble_dtype: tp.Optional[str] = None


@dataclass
class MainConfig:
    num_prints: int = 5
    device: str = "tpu"
    num_workers: int = 2
    verbose: int = 0
    show: int = 0
    download_only: bool = False
    wandb: tp.Dict[str, tp.Any] = _dict(
        use_wandb=False, project="brainmagick_tpu",
        group="brainmagick-group")
    tensorboard: bool = False
    profile: bool = False  # capture a JAX profiler trace of epoch 1
    continue_sig: tp.Optional[str] = None
    continue_best: bool = True
    seed: int = 2036
    dummy: tp.Optional[str] = None
    cache: tp.Optional[str] = "./cache"
    feature_models: tp.Optional[str] = "./features_models"
    early_stop_patience: int = 10
    #: write checkpoints on a background thread so the next epoch trains
    #: under the disk write (solver.commit). Cosmetic key: excluded from
    #: the XP signature like dora.exclude keys
    #: (/root/reference/bm/conf/config.yaml:150-158).
    checkpoint_async: bool = True
    eval_every: int = 1
    eval_train_set: bool = False
    out_dir: str = "./outputs"
    model_name: str = "simpleconv"
    feature_model_name: tp.Optional[str] = None
    feature_model_params: tp.Dict[str, tp.Any] = field(default_factory=dict)
    override_n_subjects_model: tp.Optional[int] = None
    simpleconv: tp.Dict[str, tp.Any] = field(
        default_factory=lambda: dict(SIMPLECONV_DEFAULTS))
    convrnn: tp.Dict[str, tp.Any] = field(
        default_factory=lambda: dict(CONVRNN_DEFAULTS))
    optim: OptimConfig = field(default_factory=OptimConfig)
    clip: ClipConfig = field(default_factory=ClipConfig)
    test: TestEvalConfig = field(default_factory=TestEvalConfig)
    dset: DsetConfig = field(default_factory=DsetConfig)
    norm: NormConfig = field(default_factory=NormConfig)
    task: TaskConfig = field(default_factory=TaskConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    #: selection name -> selection dict (study + params); mirrors
    #: conf/selections/selections_definitions.yaml
    selections: tp.Dict[str, tp.Dict[str, tp.Any]] = _dict(
        audio_mous=dict(study="schoffelen2019", modality="audio"),
        audio_mous_wl=dict(study="schoffelen2019", modality="audio",
                           events_filter='condition == "word_list"'),
        visual_mous=dict(study="schoffelen2019", modality="visual"),
        gwilliams2022=dict(study="gwilliams2022"),
        broderick2019=dict(study="broderick2019"),
        brennan2019=dict(study="brennan2019"),
        fake=dict(study="fake"),
        fakeeeg=dict(study="fakeeeg"),
    )

    # -- identity -----------------------------------------------------------

    # keys excluded from the signature (cosmetic, like dora.exclude)
    _SIG_EXCLUDE = ("num_prints", "device", "num_workers", "verbose",
                    "cache", "feature_models", "show", "out_dir",
                    "download_only", "wandb", "tensorboard", "profile",
                    "checkpoint_async")

    def delta(self) -> tp.Dict[str, tp.Any]:
        """Non-default config deltas (flat dotted keys)."""
        return _diff(dataclasses.asdict(self),
                     dataclasses.asdict(MainConfig()),
                     exclude=self._SIG_EXCLUDE)

    @property
    def sig(self) -> str:
        """Deterministic experiment signature (Dora-style)."""
        payload = json.dumps(self.delta(), sort_keys=True, default=str)
        return hashlib.sha1(payload.encode()).hexdigest()[:8]

    @property
    def xp_folder(self) -> Path:
        return Path(self.out_dir) / "xps" / self.sig


#: marker for "this dict key was removed relative to the default config"
DELETED = "__deleted__"


def _diff(cfg: tp.Any, default: tp.Any, prefix: str = "",
          exclude: tp.Tuple[str, ...] = ()) -> tp.Dict[str, tp.Any]:
    out: tp.Dict[str, tp.Any] = {}
    if isinstance(cfg, dict) and isinstance(default, dict):
        for key in sorted(set(cfg) | set(default), key=str):
            dotted = f"{prefix}{key}"
            if dotted in exclude:
                continue
            if key not in cfg:
                out[dotted] = DELETED
                continue
            sub = _diff(cfg.get(key), default.get(key), dotted + ".",
                        exclude)
            out.update(sub)
        return out
    if cfg != default:
        out[prefix[:-1]] = cfg
    return out


# ---------------------------------------------------------------------------
# Presets (composed reference configs)
# ---------------------------------------------------------------------------

def apply_preset(cfg: MainConfig, name: str) -> MainConfig:
    """Mutate cfg according to a named preset (reference conf/model/*.yaml
    and conf/feature_model/*.yaml)."""
    if name == "clip_conv":
        cfg.model_name = "simpleconv"
        cfg.simpleconv.update(
            hidden=320, batch_norm=True, depth=10, dilation_period=5,
            kernel_size=3, skip=True, subject_layers=True, subject_dim=0,
            complex_out=True, glu=2, glu_context=1, merger=True,
            initial_linear=270, gelu=True, merger_pos_dim=2048)
        cfg.optim.loss = "clip"
        cfg.optim.epochs = 200
        cfg.optim.max_batches = 1200
        cfg.optim.batch_size = 256
        cfg.norm.clip = True
        cfg.task.type = "decode"
        cfg.task.offset_meg_ms = 150
    elif name == "clip_conv_tpu":
        # the paper recipe + the measured-fastest v5e execution knobs
        # (doc/perf_playbook.md): bf16 MXU compute with fp32
        # params/stats/softmax, bf16 CLIP score contraction, and the
        # BatchNorm-cancelled conv biases elided (gradient-read cost
        # only; function space identical — tests/test_models.py).
        apply_preset(cfg, "clip_conv")
        # fused_head: merger+initial+subject folded into one
        # per-recording matmul — measured 36.0 -> 34.0 ms on the
        # shipped step (same params/function, doc/perf_playbook.md)
        # gelu_exact=False: XLA's erf lowering costs ~50% over the tanh
        # approximation on the paper encoder (isolated fwd+bwd 23.8 vs
        # 35.6 ms; shipped step 58.5 -> ~32 ms — doc/perf_playbook.md).
        # Training from scratch is insensitive to the ~5e-4 activation
        # delta; converted reference checkpoints keep the erf default.
        cfg.simpleconv.update(dtype="bfloat16", output_dtype="bfloat16",
                              bn_conv_bias=False, fused_head=True,
                              gelu_exact=False)
        cfg.clip.compute_dtype = "bfloat16"
        cfg.parallel.transfer_dtype = "bfloat16"
        # assemble the bf16 wire format directly in the native gather
        # (halves host batch-assembly memory traffic; scaler fit and
        # wer/eval/play loaders stay fp32 — see ParallelConfig)
        cfg.parallel.assemble_dtype = "bfloat16"
    elif name == "clip_conv_v5e8":
        # RECOMMENDED v5e-8 recipe: weak scaling. The chip saturates by
        # local batch ~128 (B=32 runs at 81% of the B=256 rate, a
        # batch-structural conv amortization loss — doc/perf_playbook.md
        # "Batch scaling"), so each chip keeps the gate recipe's local
        # batch 256 (global 2048) and negatives_group_size=1 keeps every
        # CLIP softmax over a 256-candidate per-chip pool — the same
        # pool dynamics as the single-chip B=256 recipe, independent of
        # pod size (the reference's pools shrink as GPUs are added at
        # fixed global batch, the exact failure README.md:139-143 warns
        # about). Projected pod rate: 8 x 8,057 samples/s = ~64k/s.
        apply_preset(cfg, "clip_conv_tpu")
        cfg.optim.batch_size = 2048
        cfg.parallel.negatives_group_size = 1
        # max_batches stays at the recipe's 1200: at global batch 2048
        # each epoch sweeps 8x the samples, deliberately keeping the
        # reference's optimization-steps budget rather than its
        # samples-per-epoch budget. LR doubles — conservative (below
        # the sqrt(8) ~= 2.8 rule) scaling for the 8x batch
        cfg.optim.lr = cfg.optim.lr * 2
    elif name == "clip_conv_v5e8_paper":
        # EXACT-reproduction v5e-8 recipe: the paper's global batch 256
        # trained on 2 GPUs = two contrastive pools of 128
        # (README.md:139-143). Groups of 4 chips x local 32 rebuild the
        # SAME two 128-candidate pools on 8 chips
        # (tests/test_parallel.py::test_group_negatives_reproduce_*),
        # gathered over the ICI ring (O(local batch) HBM at any group
        # size). Costs the B=32 amortization gap (~81% per-chip rate):
        # ~52k samples/s projected vs ~64k for clip_conv_v5e8.
        apply_preset(cfg, "clip_conv_tpu")
        cfg.optim.batch_size = 256
        cfg.parallel.negatives_group_size = 4
        cfg.parallel.ring_negatives = True
    elif name == "deep_mel":
        cfg.feature_model_name = "deep_mel"
        cfg.feature_model_params = dict(
            n_hidden_channels=320, n_hidden_layers=10, n_out_channels=768,
            kernel=3, stride=1, dilation_growth=2, dilation_period=5,
            batch_norm=True, activation_on_last=False, skip=True,
            glu_context=1, glu=2)
    elif name == "convrnn":
        # encode task (conf/model/convrnn.yaml)
        cfg.model_name = "convrnn"
        cfg.convrnn["hidden"] = dict(meg=512, features=12)
        cfg.task.type = "encode"
        cfg.optim.loss = "l1"
    elif name == "decoder_convrnn":
        # regression/classification decoding (conf/model/decoder_convrnn.yaml)
        cfg.model_name = "convrnn"
        cfg.convrnn["hidden"] = dict(meg=512)
        cfg.convrnn["bidirectional_lstm"] = True
        cfg.dset.features = ["WordSegment"]
        cfg.optim.loss = "regression_classification"
        cfg.task.type = "decode"
    elif name == "tiny":
        # CPU-smoke-run scale: the full paper model takes >10 min/epoch
        # on a single CPU core
        cfg.simpleconv.update(
            hidden=24, depth=2, kernel_size=3, dilation_period=2,
            skip=True, glu=2, glu_context=1, merger=True,
            merger_channels=16, merger_pos_dim=32, initial_linear=16,
            gelu=True, batch_norm=True, subject_layers=True,
            subject_dim=0, complex_out=True)
        cfg.optim.batch_size = 8
    elif name == "none":
        cfg.feature_model_name = None
    else:
        raise ValueError(f"Unknown preset {name}")
    return cfg


def simpleconv_kwargs(cfg: MainConfig) -> tp.Dict[str, tp.Any]:
    """Config dict -> SimpleConv constructor kwargs (hidden becomes a
    per-input mapping at model build time, see train.build_model)."""
    kw = dict(cfg.simpleconv)
    kw.pop("hidden", None)
    return kw
