"""Training losses: masked L1/L2, CLIP contrastive, feature decoding.

Reference parity: bm/losses.py. The CLIP loss keeps the reference's
asymmetric convention: for estimates [B, C, T] and candidates [B', C, T]
with B' >= B, the first B candidates are the targets and the remaining
B'-B are extra negatives (bm/losses.py:104-114). Candidate norms are
folded into the score einsum (one fused matmul on the MXU, no
normalized copy of the candidate tensor in HBM — bm/losses.py:91-94).

TPU-native: pure-functional JAX, plus per-sample weights so rejected
samples (ScaleReject) can be masked without dynamic shapes.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn


def masked_l1(estimate: jax.Array, output: jax.Array, mask: jax.Array,
              sample_weight: tp.Optional[jax.Array] = None) -> jax.Array:
    return _masked_reduce(jnp.abs(estimate - output), mask, sample_weight)


def masked_l2(estimate: jax.Array, output: jax.Array, mask: jax.Array,
              sample_weight: tp.Optional[jax.Array] = None) -> jax.Array:
    return _masked_reduce((estimate - output) ** 2, mask, sample_weight)


def _masked_reduce(err: jax.Array, mask: jax.Array,
                   sample_weight: tp.Optional[jax.Array]) -> jax.Array:
    mask = jnp.broadcast_to(mask, err.shape).astype(err.dtype)
    if sample_weight is not None:
        w = sample_weight.reshape(-1, *([1] * (err.ndim - 1)))
        mask = mask * w
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class ClipLoss(nn.Module):
    """CLIP-style contrastive loss over candidate segments
    (bm/losses.py:29-114 parity).

    Optional learned `linear` projection over the time axis (the
    reference's LazyLinear joined to the optimizer, bm/losses.py:38-43),
    trimming to a [tmin, tmax] scoring window, time pooling, centering.
    """
    linear: tp.Optional[int] = None
    twin: bool = True
    pool: bool = False
    center: bool = False
    tmin: tp.Optional[float] = None
    tmax: tp.Optional[float] = None
    tmin_train: tp.Optional[float] = None
    tmax_train: tp.Optional[float] = None
    dset_tmin: float = -0.5
    dset_sample_rate: float = 120.
    #: matmul input dtype for the [B, C*T] x [B', C*T] score einsum
    #: ('bfloat16' keeps the TPU MXU at full rate with fp32 accumulation;
    #: None = inputs' own dtype). Softmax/log-softmax stay fp32.
    compute_dtype: tp.Optional[str] = None
    #: layout of the `estimates` argument: 'bct' (reference, channels
    #: second) or 'btc' (channels-last — lets a channels-last model skip
    #: its exit transpose; the score contraction is layout-agnostic).
    #: Candidates are always [B', C, T] (the data pipeline's layout).
    est_layout: str = "bct"

    def trim_samples(self, estimates: jax.Array, candidates: jax.Array,
                     train: bool) -> tp.Tuple[jax.Array, jax.Array]:
        """Restrict scoring to [tmin, tmax] relative to the event
        (bm/losses.py:50-75)."""
        if train and (self.tmin_train is not None
                      or self.tmax_train is not None):
            tmin, tmax = self.tmin_train, self.tmax_train
        else:
            tmin, tmax = self.tmin, self.tmax
        time_axis = 1 if self.est_layout == "btc" else estimates.ndim - 1
        trim_min = 0
        trim_max = estimates.shape[time_axis]
        if tmin is not None:
            assert tmin >= self.dset_tmin, "clip.tmin must be >= dset.tmin"
            trim_min = int((-self.dset_tmin + tmin) * self.dset_sample_rate)
        if tmax is not None:
            trim_max = int((-self.dset_tmin + tmax) * self.dset_sample_rate)
        tsl = slice(trim_min, trim_max)
        est = estimates[:, tsl, :] if self.est_layout == "btc" \
            else estimates[..., tsl]
        return est, candidates[..., tsl]

    @nn.compact
    def get_scores(self, estimates: jax.Array, candidates: jax.Array,
                   train: bool = False) -> jax.Array:
        """[B, C, T] (or [B, T, C] with est_layout='btc') x [B', C, T]
        -> [B, B'] matching scores."""
        estimates, candidates = self.trim_samples(estimates, candidates,
                                                  train)
        if self.est_layout == "btc" and (self.linear or self.pool
                                         or self.center):
            # the rare transform paths are defined on [B, C, T]
            estimates = jnp.swapaxes(estimates, 1, 2)
        if self.linear:
            proj_est = nn.Dense(self.linear, name="linear_est")
            proj_gt = (proj_est if self.twin
                       else nn.Dense(self.linear, name="linear_gt"))
            estimates = proj_est(estimates)
            candidates = proj_gt(candidates)
        if self.pool:
            estimates = estimates.mean(axis=2, keepdims=True)
            candidates = candidates.mean(axis=2, keepdims=True)
        if self.center:
            estimates = estimates - estimates.mean(axis=(1, 2), keepdims=True)
            candidates = candidates - candidates.mean(axis=(1, 2),
                                                      keepdims=True)
        est_spec = "btc" if (self.est_layout == "btc" and estimates.ndim == 3
                             and not (self.linear or self.pool
                                      or self.center)) else "bct"
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            # one cast each: the candidate tensor is read from HBM at
            # half width by BOTH the norm reduction and the score
            # contraction (it is the step's largest loss-side operand).
            # Norms accumulate the bf16 values in fp32 — quantization of
            # the INPUTS (~0.4% per element, unbiased) is matched between
            # the norm and the scores it scales, unlike a bf16-
            # ACCUMULATED sum which drifts with the reduction order.
            estimates = estimates.astype(cd)
            candidates = candidates.astype(cd)
            inv_norms = 1 / (1e-8 + jnp.sqrt(jnp.sum(
                candidates.astype(jnp.float32) ** 2, axis=(1, 2))))
            scores = jnp.einsum(f"{est_spec},oct->bo", estimates, candidates,
                                preferred_element_type=jnp.float32)
            return scores * inv_norms[None, :]
        # norm accumulation in fp32: a bf16 sum over ~C*T squares carries
        # ~1% quantization error, enough to flip near-tied rankings
        inv_norms = 1 / (1e-8 + jnp.linalg.norm(
            candidates.reshape(candidates.shape[0], -1)
            .astype(jnp.float32), axis=1))
        return jnp.einsum(f"{est_spec},oct,o->bo", estimates, candidates,
                          inv_norms, preferred_element_type=jnp.float32)

    def get_probabilities(self, estimates: jax.Array,
                          candidates: jax.Array) -> jax.Array:
        scores = self.get_scores(estimates, candidates)
        return jax.nn.softmax(scores, axis=1)

    def __call__(self, estimate: jax.Array, candidate: jax.Array,
                 mask: tp.Optional[jax.Array] = None,
                 sample_weight: tp.Optional[jax.Array] = None,
                 candidate_weight: tp.Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """Cross-entropy over candidates; estimate i's positive is
        candidate i. `sample_weight` masks rejected estimates out of the
        loss; `candidate_weight` masks rejected candidates out of the
        softmax (static-shape equivalent of dropping them)."""
        assert estimate.shape[0] <= candidate.shape[0], \
            "need at least as many candidates as estimates"
        scores = self.get_scores(estimate, candidate, train=train)
        return self.loss_from_scores(scores, sample_weight,
                                     candidate_weight)

    @staticmethod
    def loss_from_scores(scores: jax.Array,
                         sample_weight: tp.Optional[jax.Array] = None,
                         candidate_weight: tp.Optional[jax.Array] = None
                         ) -> jax.Array:
        """Masked softmax cross-entropy over precomputed [B, N] scores;
        estimate i's positive is column i (the first B columns are the
        in-batch candidates). Shared by __call__ and the ring-gather
        loss (solver._ring_clip_loss), which assembles the score matrix
        blockwise so the gathered candidate tensor never materializes."""
        if candidate_weight is not None:
            # large finite negative (not -inf): a zero-weight estimate row
            # whose own candidate is also masked must stay NaN-free
            scores = jnp.where(candidate_weight[None, :] > 0, scores, -1e30)
        logprobs = jax.nn.log_softmax(scores, axis=1)
        diag = jnp.diagonal(logprobs[:, :scores.shape[0]])
        if sample_weight is None:
            return -diag.mean()
        w = sample_weight.astype(diag.dtype)
        return -(diag * w).sum() / jnp.maximum(w.sum(), 1.0)


def candidate_blocks(pool, compute_dtype: tp.Optional[str],
                     block_size: int = 2048,
                     int8: bool = False) -> tp.List:
    """Zero-padded HOST-side candidate blocks in the score compute dtype.

    Host-side (numpy) on purpose: committing every block to the device
    would keep the whole pool resident in HBM — 10-20k wav2vec
    candidates are 7-28 GB fp32, more than one chip — so callers
    transfer a bounded group at a time (`iter_device_groups`). A bf16
    compute dtype halves both the host->device stream and the resident
    group; get_scores/retrieval_scores norms use the same cast values,
    so scores match an in-call cast exactly.
    """
    import numpy as np
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    blocks = []
    for lo in range(0, len(pool), block_size):
        block = np.asarray(pool[lo:lo + block_size])
        pad = block_size - len(block)
        if pad:
            block = np.concatenate(
                [block, np.zeros_like(block[:1]).repeat(pad, 0)])
        if int8:
            # Per-candidate symmetric int8 (v5e int8 MXU runs at 2x the
            # bf16 rate and the pool stream/HBM halve again vs bf16).
            # The dequant scale CANCELS out of the norm-folded score —
            # score_o = est . (s_o q_o) / ||s_o q_o|| = est . q_o /
            # ||q_o|| — so quantized blocks carry no scale array and
            # iter_device_groups handles them unchanged. Scoring side:
            # retrieval_scores_int8.
            block = block.astype(np.float32)
            amax = np.abs(block).reshape(len(block), -1).max(axis=1)
            scale = np.maximum(amax / 127.0, 1e-12)
            q = np.rint(block / scale.reshape(-1, *([1] * (block.ndim - 1))))
            blocks.append(np.clip(q, -127, 127).astype(np.int8))
            continue
        blocks.append(block.astype(dtype) if dtype is not None else block)
    return blocks


def int8_retrieval_ok(clip: "ClipLoss") -> bool:
    """int8 pool scoring covers the fast-path configuration only (no
    learned projection / pooling / centering / trim window — the same
    condition as retrieval_scores' flattened contraction)."""
    return not (clip.linear or clip.pool or clip.center
                or clip.tmin is not None or clip.tmax is not None)


def _int8_quantize_rows(x2: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 over flattened rows: [N, K] float ->
    (int8 [N, K], fp32 scale [N]) with x ~= scale[:, None] * q."""
    x2 = x2.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x2), axis=1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x2 / s[:, None]), -127, 127).astype(jnp.int8)
    return q, s


def retrieval_scores_int8(estimates: jax.Array, cand_q: jax.Array,
                          inv_norms: tp.Optional[jax.Array] = None
                          ) -> jax.Array:
    """No-grad scoring against an int8-quantized candidate block
    (candidate_blocks(int8=True)): same math as retrieval_scores up to
    the quantization of both operands.

    The estimate rows are quantized on device per row; the row scale
    multiplies the whole score row (softmax is not row-scale invariant,
    so it cannot cancel like the candidate scale does). The int8 x int8
    contraction accumulates in int32 on the MXU; the K axis is split so
    a fully-correlated max-magnitude pair cannot overflow int32
    (127^2 * K_chunk < 2^31), then the partial sums combine in fp32.
    Candidate norms come from the quantized values in fp32 — matched
    quantization between the scores and the norms that scale them, as
    in the bf16 path (see get_scores).

    ``estimates`` may be a pre-quantized ``(e_q, s_e)`` pair (flattened
    int8 rows + fp32 row scales, as produced by EstimateCache) — the
    per-call row quantization reads the full fp32 chunk, so wer/eval
    hoist it out of the per-candidate-block call.
    """
    c2 = cand_q.reshape(cand_q.shape[0], -1)
    if isinstance(estimates, tuple):
        e_q, s_e = estimates
    else:
        e2 = estimates.reshape(estimates.shape[0], -1)
        e_q, s_e = _int8_quantize_rows(e2)
    k = e_q.shape[1]
    # largest K chunk whose worst-case accumulator fits int32
    k_chunk = (2 ** 31 - 1) // (127 * 127)
    acc = None
    for lo in range(0, k, k_chunk):
        part = jax.lax.dot_general(
            e_q[:, lo:lo + k_chunk], c2[:, lo:lo + k_chunk],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        acc = part if acc is None else acc + part
    if inv_norms is None:
        inv_norms = block_inv_norms(c2)
    return acc * s_e[:, None] * inv_norms[None, :]


def own_scores_int8(est: jax.Array, own: jax.Array) -> jax.Array:
    """Row-wise own-output scores with BOTH sides int8-quantized, so the
    own column of the WER softmax sees the same quantization noise as
    its pool competitors (wer.get_wer pass 2 under test.pool_int8)."""
    e2 = est.reshape(est.shape[0], -1)
    o2 = own.reshape(own.shape[0], -1)
    e_q, s_e = _int8_quantize_rows(e2)
    o_q, _ = _int8_quantize_rows(o2)
    ef = e_q.astype(jnp.float32)
    of = o_q.astype(jnp.float32)
    acc = jnp.sum(ef * of, axis=1)
    inv = 1 / (1e-8 + jnp.sqrt(jnp.sum(of * of, axis=1)))
    return acc * s_e * inv


def iter_device_groups(blocks: tp.Sequence,
                       budget_bytes: int = 4 << 30,
                       sharding: tp.Optional[tp.Any] = None,
                       prefetch: bool = True):
    """Yield (first_block_index, [device arrays]) groups of candidate
    blocks whose combined size stays under `budget_bytes` of HBM; each
    group is transferred once and must be dropped by the caller before
    the next iteration. `sharding` places each block with an explicit
    jax.sharding (mesh-parallel scoring replicates the candidate block
    on every device while the estimate rows are sharded); the budget is
    per device either way.

    With `prefetch` (default), the NEXT group's host->device transfer
    is issued before the current group is yielded — `jax.device_put`
    is asynchronous on PJRT backends, so the transfer rides under the
    caller's scoring dispatches instead of serializing with them (the
    pool crosses PCIe once either way; overlapped it costs ~zero
    wall-clock next to the [chunk, block] contractions). The group
    size is halved so current + prefetched together stay inside
    `budget_bytes`; when every block fits in one group there is
    nothing to overlap and the full budget applies."""
    if not blocks:
        return
    per = max(blocks[0].nbytes, 1)
    group = max(1, int(budget_bytes // per))
    if prefetch and len(blocks) > group:
        group = max(1, int(budget_bytes // 2 // per))
    if sharding is not None:
        def put(b):
            return jax.device_put(b, sharding)
    else:
        put = jnp.asarray
    starts = list(range(0, len(blocks), group))
    nxt: tp.Optional[list] = None
    for j, i in enumerate(starts):
        cur = nxt if nxt is not None else [put(b)
                                           for b in blocks[i:i + group]]
        if prefetch and j + 1 < len(starts):
            i2 = starts[j + 1]
            nxt = [put(b) for b in blocks[i2:i2 + group]]
        else:
            nxt = None
        yield i, cur
        del cur


def mesh_scoring_setup(solver, chunk: int):
    """(rep_sharding, row_sharding, chunk) for mesh-parallel retrieval
    scoring, shared by wer.get_wer and eval.build_probs: estimate/pred
    rows shard over the mesh, candidate blocks replicate, and the row
    chunk rounds to a mesh multiple. Multi-process meshes score
    per-process on local devices (each process holds different pooled
    rows — the reference's per-rank semantics, bm/wer.py:36-37), so
    both shardings stay None there, as they do without a mesh."""
    mesh = getattr(solver, "mesh", None)
    rep_sharding = row_sharding = None
    if mesh is not None and jax.process_count() == 1:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        rep_sharding = NamedSharding(mesh, P())
        row_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        chunk = max(mesh.size, chunk // mesh.size * mesh.size)
    return rep_sharding, row_sharding, chunk


def commit_rows(arr, row_sharding) -> jax.Array:
    """Device-commit a block of estimate/pred rows, sharded over the
    mesh when mesh-parallel scoring is active."""
    x = jnp.asarray(arr)
    if row_sharding is not None:
        x = jax.device_put(x, row_sharding)
    return x


class EstimateCache:
    """Per-chunk PREPARED estimate rows for streamed retrieval scoring
    (wer.get_wer / eval.build_probs).

    The est-side prep — host->device commit plus the compute-dtype cast
    (bf16 path) or the per-row int8 quantization (test.pool_int8) —
    reads the full fp32 chunk (~2.9 GB at wav2vec dims [2048, 1024,
    343]). Done inside the scoring jit it is paid once per CANDIDATE
    BLOCK; the wer/eval loops run candidate groups OUTER and estimate
    chunks INNER, so the same chunk used to be re-prepared per block
    and re-transferred per group. This cache prepares each chunk once
    (one jitted cast/quantize per miss) and keeps the prepared device
    rows across groups while they fit `budget_bytes`; over budget it
    degrades to prepare-once-per-(group, chunk), which still hoists
    the cast out of the per-block scoring call.

    The prepared value feeds `retrieval_scores` unchanged (a same-dtype
    astype is an XLA no-op) and `retrieval_scores_int8` as the
    ``(e_q, s_e)`` pair. Callers that need the unprepared fp32 rows
    (own-output scoring, trim/transform fallbacks with no compute
    dtype) simply keep using `commit_rows`.
    """

    def __init__(self, clip: "ClipLoss", use_int8: bool, row_sharding,
                 budget_bytes: int = 2 << 30) -> None:
        self.row_sharding = row_sharding
        self.budget = int(budget_bytes)
        self._cache: tp.Dict[int, tp.Any] = {}
        self._bytes = 0
        if use_int8:
            self._prep = jax.jit(
                lambda x: _int8_quantize_rows(x.reshape(x.shape[0], -1)))
        elif (int8_retrieval_ok(clip) and clip.compute_dtype is not None):
            cd = jnp.dtype(clip.compute_dtype)
            self._prep = jax.jit(lambda x: x.astype(cd))
        else:
            self._prep = None

    def get(self, lo: int, make_chunk: tp.Callable[[], tp.Any]):
        hit = self._cache.get(lo)
        if hit is not None:
            return hit
        x = commit_rows(make_chunk(), self.row_sharding)
        prepared = self._prep(x) if self._prep is not None else x
        nbytes = (sum(a.nbytes for a in prepared)
                  if isinstance(prepared, tuple) else prepared.nbytes)
        if self._bytes + nbytes <= self.budget:
            self._cache[lo] = prepared
            self._bytes += nbytes
        return prepared


def ring_scores(mesh, estimates, pool,
                compute_dtype: tp.Optional[str] = None):
    """Whole-pool retrieval scores with the candidate pool SHARDED over
    the mesh and rotated over the ICI ring (jax.lax.ppermute) — the
    classic ring-matmul layout (SURVEY.md §2.4's ICI-native recipe).

    vs the default streamed mode (estimate rows sharded, every
    candidate block REPLICATED on all devices): the pool crosses the
    host->device link once in 1/n_dev-sized shards and then rides ICI,
    so host-link traffic for a 20k-candidate wav2vec pool drops
    n_dev-fold (14 GB bf16 instead of 8 x 14 GB on a v5e-8), and
    per-device HBM holds pool/n_dev instead of the streamed group
    budget. Estimate rows stay row-sharded; each device scores its row
    block against every pool shard after n_dev rotations, so the
    result assembles with no host reshuffle.

    Exact same math as retrieval_scores (norm-folded scores from the
    compute-dtype values; fp32 accumulation). [n, C, T] x [P, C, T] ->
    [n, P] fp32. Rows/pool pad to mesh multiples internally; padded
    score entries are returned (callers slice). Single-process meshes
    only — multi-process pods keep per-rank pools (reference
    semantics).
    """
    import numpy as np

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    size = mesh.size
    axis = mesh.axis_names[0]
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def pad_rows(x, mult):
        pad = (-len(x)) % mult
        if pad:
            x = np.concatenate([x, np.zeros_like(x[:1]).repeat(pad, 0)])
        return x

    est = pad_rows(np.asarray(estimates), size)
    cand = pad_rows(np.asarray(pool), size)
    if cd is not None:
        est = est.astype(cd)
        cand = cand.astype(cd)
    n, p = len(est), len(cand)
    e2 = est.reshape(n, -1)
    c2 = cand.reshape(p, -1)

    row_sh = NamedSharding(mesh, P(axis))
    e_l = jax.device_put(e2, row_sh)
    c_l = jax.device_put(c2, row_sh)  # pool SHARDED, not replicated
    p_shard = p // size
    perm = [(i, (i - 1) % size) for i in range(size)]

    def body(e_loc, c_loc):
        me = jax.lax.axis_index(axis)
        inv0 = block_inv_norms(c_loc)
        out = jnp.zeros((e_loc.shape[0], p), jnp.float32)

        def step(t, carry):
            out, c_cur, inv_cur = carry
            blk = jax.lax.dot_general(
                e_loc, c_cur, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_cur[None, :]
            # after t left-rotations, this device holds the shard that
            # started on device (me + t) % size
            origin = (me + t) % size
            out = jax.lax.dynamic_update_slice(
                out, blk, (0, origin * p_shard))
            c_nxt = jax.lax.ppermute(c_cur, axis, perm)
            inv_nxt = jax.lax.ppermute(inv_cur, axis, perm)
            return out, c_nxt, inv_nxt

        out, _, _ = jax.lax.fori_loop(0, size, step, (out, c_loc, inv0))
        return out

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis), check_vma=False))
    return fn(e_l, c_l)


def maybe_ring_scores(solver, clip: "ClipLoss", use_int8: bool,
                      estimates, pool,
                      budget_bytes: int = 4 << 30):
    """Dispatch to `ring_scores` when parallel.ring_scoring is on and
    the configuration qualifies, else return None (caller keeps the
    streamed path). Returns the host [len(estimates), len(pool)] fp32
    score matrix, already sliced to the unpadded shapes.

    Qualifies = single-process mesh with >1 device, fast-path ClipLoss
    (no trim/transform — the same condition as retrieval_scores'
    flattened contraction), no int8 pool, and per-device residency
    (pool shard + estimate shard + fp32 out rows) under
    `budget_bytes`."""
    import numpy as np

    args = getattr(solver, "args", None)
    par = getattr(args, "parallel", None) if args is not None else None
    if par is None or not getattr(par, "ring_scoring", False):
        return None
    mesh = getattr(solver, "mesh", None)
    if mesh is None or mesh.size < 2 or jax.process_count() > 1:
        return None
    if use_int8 or not int8_retrieval_ok(clip):
        return None
    est = np.asarray(estimates)
    cand = np.asarray(pool)
    if not len(est) or not len(cand):
        return None
    itemsize = (jnp.dtype(clip.compute_dtype).itemsize
                if clip.compute_dtype is not None else cand.itemsize)
    k = int(np.prod(cand.shape[1:]))
    n, p = len(est), len(cand)
    per_dev = (p * k * itemsize + n * k * itemsize + n * p * 4) / mesh.size
    if per_dev > budget_bytes:
        return None
    out = ring_scores(mesh, est, cand, clip.compute_dtype)
    return np.asarray(out)[:n, :p]


def block_inv_norms(block: jax.Array) -> jax.Array:
    """Per-candidate inverse norms of a (possibly bf16/int8-quantized)
    candidate block, fp32-accumulated — the same values
    retrieval_scores/retrieval_scores_int8 compute in-call.

    Computing this ONCE per transferred block (wer/eval do it at device-
    group transfer time) instead of inside every scoring call removes a
    full pool read per estimate chunk: measured 2.2 ms of the 8.7 ms
    [256 x 2048] scoring call on v5e (XLA does not hoist the reduction
    out of the per-chunk jit even though the operand is loop-invariant).
    """
    cf = block.reshape(block.shape[0], -1).astype(jnp.float32)
    return 1 / (1e-8 + jnp.sqrt(jnp.sum(cf * cf, axis=1)))


def retrieval_scores(clip: ClipLoss, params, estimates: jax.Array,
                     candidates: jax.Array,
                     inv_norms: tp.Optional[jax.Array] = None
                     ) -> jax.Array:
    """No-grad scoring fast path for offline eval / WER
    (bm/losses.py:77-97 math, as consumed by
    scripts/run_eval_probs.py:267-307 and bm/wer.py:97-99).

    Same semantics as ``clip.get_scores`` (train=False) for the common
    configuration (no linear/pool/center/trim): candidate-norm-scaled
    [B, B'] scores, norms from the compute-dtype values. The flattened
    [B, C*T] x [B', C*T] contraction runs through the Pallas blocked
    GEMM (ops/pallas_matmul.py) — scoring is pure inference, so the
    kernel needs no VJP. Any transform/trim configuration falls back to
    the reference einsum path.
    """
    if (clip.linear or clip.pool or clip.center
            or clip.tmin is not None or clip.tmax is not None):
        assert inv_norms is None, \
            "precomputed norms apply to the fast path only"
        if clip.est_layout == "btc":  # callers always pass [B, C, T]
            estimates = jnp.swapaxes(estimates, 1, 2)
        return clip.apply(params, estimates, candidates,
                          method=clip.get_scores)
    from .ops.pallas_matmul import nt_matmul
    if clip.compute_dtype is not None:
        cd = jnp.dtype(clip.compute_dtype)
        estimates = estimates.astype(cd)
        candidates = candidates.astype(cd)
    e2 = estimates.reshape(estimates.shape[0], -1)
    c2 = candidates.reshape(candidates.shape[0], -1)
    if inv_norms is None:
        inv_norms = block_inv_norms(c2)
    return nt_matmul(e2, c2) * inv_norms[None, :]


class FeatureDecodingLoss:
    """Per-feature regression (MSE) + class-weighted cross-entropy over
    the FeaturesBuilder channel layout (bm/losses.py:117-173).

    Static metadata (slices, weights) is captured at construction so the
    call is a pure jittable function.
    """

    def __init__(self, used_features, scaler=None) -> None:
        import numpy as np

        self.specs = []
        self.input_dimension = used_features.dimension
        self.output_dimension = used_features.output_dimension
        for name, feature in used_features.items():
            sl_in = used_features.get_slice(name)
            sl_out = used_features.get_slice(name, model_output=True)
            weights = None
            if feature.categorical and scaler is not None:
                weights = jnp.asarray(
                    scaler.get_categorical_feature_weights(name))
            self.specs.append(dict(
                name=name, categorical=feature.categorical,
                cardinality=feature.cardinality,
                sl_in=(sl_in.start, sl_in.stop),
                sl_out=(sl_out.start, sl_out.stop), weights=weights))

    def __call__(self, estimate: jax.Array, output: jax.Array,
                 mask: tp.Optional[jax.Array] = None,
                 sample_weight: tp.Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        assert estimate.shape[1] == self.output_dimension
        assert output.shape[1] == self.input_dimension
        if mask is None:
            mask = jnp.ones((output.shape[0], 1, output.shape[-1]),
                            dtype=bool)
        m = mask.astype(estimate.dtype)  # [B, 1, T]
        if sample_weight is not None:
            m = m * sample_weight.reshape(-1, 1, 1)
        denom = jnp.maximum(m.sum(), 1.0)

        loss = 0.
        for spec in self.specs:
            i0, i1 = spec["sl_in"]
            o0, o1 = spec["sl_out"]
            target = output[:, i0:i1]
            pred = estimate[:, o0:o1]
            if spec["categorical"]:
                labels = target[:, 0].astype(jnp.int32)      # [B, T]
                logits = jnp.swapaxes(pred, 1, 2)            # [B, T, K]
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, labels[..., None], axis=-1)[..., 0]  # [B, T]
                wm = m[:, 0]
                if spec["weights"] is not None:
                    cw = spec["weights"][labels]
                    nll = nll * cw
                    loss = loss + (nll * wm).sum() / jnp.maximum(
                        (cw * wm).sum(), 1e-8)
                else:
                    loss = loss + (nll * wm).sum() / denom
            else:
                err = (pred - target) ** 2
                loss = loss + (err * m).sum() / (denom * (i1 - i0))
        return loss
