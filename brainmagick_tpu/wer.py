"""In-training word-retrieval evaluation ("WER") for CLIP models.

Reference parity: bm/wer.py:21-121 — pool test estimates/outputs, look up
each segment's word hash at t≈0 (with ±2-sample neighbor fallback), rank
every estimate against up to `wer_negatives` candidate outputs where the
estimate's own output replaces the last negative, and report top-K error
over samples and over the word vocabulary (probabilities scatter-added
per unique hash), plus implicit soft-WER support.

TPU-native: scoring is chunked on device — scores for a block of
estimates against the shared negative pool are one einsum; the
per-estimate own-output column is appended so each row's softmax matches
the reference's negatives[-1]-replacement exactly.

Mesh-parallel: with `solver.set_mesh(...)`, both the test-set forward
passes (solver.forward_batch shards the batch over the mesh) and the
scoring contractions (estimate rows sharded, candidate blocks
replicated) run SPMD over every device — the reference instead shards
test batches by DDP rank (bm/wer.py:36-37) and averages the metrics
across ranks (bm/wer.py:121); multi-process meshes average the final
metrics the same way here.
"""

from __future__ import annotations

import logging
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import ConcatDataset

logger = logging.getLogger(__name__)


def _lookup_word_hash(word_hash: np.ndarray, check_at: int) -> np.ndarray:
    """Word hash at the event sample, falling back to +-1/+-2 neighbors
    (bm/wer.py:56-65)."""
    wh = word_hash[:, check_at]
    for offset in (-1, 1, -2, 2):
        idx = check_at + offset
        if 0 <= idx < word_hash.shape[1]:
            wh = np.where(wh == 0, word_hash[:, idx], wh)
    assert (wh != 0).all(), "missing word hash at segment onset"
    return wh


def get_wer(solver, dataset: tp.Optional[tp.Any] = None
            ) -> tp.Dict[str, float]:
    args = solver.args
    test_args = args.test
    if dataset is None:
        datasets = solver.datasets.test.datasets
        if test_args.wer_study is not None:
            datasets = [d for d in datasets
                        if d.recording.study_name() == test_args.wer_study]
        if test_args.wer_recordings is not None:
            datasets = datasets[:test_args.wer_recordings]
        dataset = ConcatDataset(datasets)
    loader = solver.make_loader(dataset, shuffle=True)
    test_features = solver.datasets.test.datasets[0].features

    tmin = args.dset.test.tmin
    if tmin is None:
        tmin = args.dset.tmin
    check_at = int((-tmin) * args.dset.sample_rate) + 2

    estimates_list, outputs_list, hashes_list = [], [], []
    hash_slice = test_features.get_slice("WordHash")
    used_names = list(solver.used_features.keys())
    for batch, pad_weight in loader:
        word_hash = batch.features[:, hash_slice][:, 0]
        # multi-process meshes: forward_batch returns this process's
        # rows only — align the host-side metadata with them
        word_hash = word_hash[solver.local_rows(len(batch))]
        features = test_features.extract_features(batch.features, used_names)
        # jitted forward, sharded over the mesh when one is set; keep
        # folds in pad_weight (no eager single-device process_batch in
        # the test stage)
        estimate, output, _, keep = solver.forward_batch(
            batch.replace(features=features), pad_weight)
        if keep.any():
            estimates_list.append(estimate[keep])
            outputs_list.append(output[keep])
            hashes_list.append(_lookup_word_hash(word_hash[keep], check_at))
    estimates = np.concatenate(estimates_list)
    outputs = np.concatenate(outputs_list)
    word_hashes = np.concatenate(hashes_list).astype(np.int64)

    # seeded from the XP config (the reference uses an unseeded randperm,
    # bm/wer.py:74 — here two identical runs must report identical
    # wer/wer_vocab so grid comparisons are exact)
    rng = np.random.RandomState(args.seed % (2 ** 31))
    if test_args.wer_negatives:
        perm = rng.permutation(len(outputs))
        kept = perm[:test_args.wer_negatives]
        negatives, negative_hashes = outputs[kept], word_hashes[kept]
    else:
        negatives, negative_hashes = outputs, word_hashes
    logger.info("wer: %d negatives selected", len(negatives))

    if test_args.wer_random:
        estimates = rng.randn(*estimates.shape).astype(np.float32)

    # the estimate's own output replaces the last negative -> the fixed
    # pool is negatives[:-1] and each row gets its own extra column.
    # Candidates are streamed through HBM in blocks: 10k wav2vec-dim
    # candidates are ~15 GB in fp32, which does not fit on one chip.
    fixed_all = negatives[:-1]
    fixed_hashes = negative_hashes[:-1]
    loss_params = {"params": solver.state["params"]["loss"]}
    clip = solver.clip_loss

    # host-side blocks transferred in bounded device groups (committing
    # every block would keep the whole pool resident in HBM — 10-20k
    # wav2vec candidates are 7-28 GB, more than one chip); each group
    # is scored against every estimate chunk before the next lands.
    # See losses.candidate_blocks for the bf16-pool trade-off.
    from .losses import (EstimateCache, block_inv_norms, candidate_blocks,
                         commit_rows, int8_retrieval_ok, iter_device_groups,
                         maybe_ring_scores, mesh_scoring_setup,
                         own_scores_int8, retrieval_scores,
                         retrieval_scores_int8)
    cand_block = 2048
    n_fixed = len(fixed_all)
    use_int8 = (bool(getattr(test_args, "pool_int8", False))
                and int8_retrieval_ok(clip))

    # mesh-parallel scoring: estimate rows sharded over the devices,
    # candidate blocks replicated — every chip scores its row slice of
    # the [chunk, cand_block] contraction; per-process local scoring
    # on multi-process meshes (losses.mesh_scoring_setup).
    # 2048-row chunks: the flat GEMM is M-bound on v5e — 80.6 Mpairs/s
    # raw at M=256, 151 at M=1024, 173.5 at M=2048 with precomputed
    # norms (scripts/bench_eval.py M-sweep)
    rep_sharding, row_sharding, chunk = mesh_scoring_setup(solver, 2048)
    fast = int8_retrieval_ok(clip)

    @jax.jit
    def block_scores(est, cand, inv):
        if use_int8:  # int8 MXU pool scoring (test.pool_int8)
            return retrieval_scores_int8(est, cand, inv)
        # Pallas blocked GEMM fast path (XLA einsum fallback for
        # trim/transform configs) — losses.retrieval_scores
        return retrieval_scores(clip, loss_params, est, cand,
                                inv_norms=inv)

    norms_fn = jax.jit(block_inv_norms)

    @jax.jit
    def own_scores_fn(est, own):
        if use_int8:
            # both sides quantized so the own column competes under the
            # same noise as the pool columns (losses.own_scores_int8)
            return own_scores_int8(est, own)
        return jax.vmap(
            lambda e, o: clip.apply(loss_params, e[None], o[None],
                                    method=clip.get_scores)[0, 0]
        )(est, own)

    n = len(estimates)

    def padded_chunk(arr, lo):
        part = arr[lo:lo + chunk]
        pad = chunk - len(part)
        if pad:
            part = np.concatenate([part, part[-1:].repeat(pad, 0)])
        return part, pad

    # pass 1: fixed-pool scores. Ring mode (parallel.ring_scoring):
    # pool sharded over the mesh and rotated over the ICI ring — one
    # host->device pool transfer total instead of one per device
    # (losses.ring_scores). Otherwise group-streamed through the device
    # with replicated blocks.
    scores = np.empty((n, n_fixed + 1), dtype=np.float32)
    ring = maybe_ring_scores(solver, clip, use_int8, estimates, fixed_all)
    if ring is not None:
        scores[:, :n_fixed] = ring
        del ring
    else:
        host_blocks = candidate_blocks(fixed_all, clip.compute_dtype,
                                       cand_block, int8=use_int8)
        # estimate chunks prepared (commit + bf16 cast / int8 quantize)
        # ONCE and reused across candidate groups and blocks — the
        # in-call prep read the full fp32 chunk per block
        # (losses.EstimateCache)
        est_cache = EstimateCache(clip, use_int8, row_sharding)
        for g0, dev_group in iter_device_groups(host_blocks,
                                                sharding=rep_sharding):
            # candidate norms once per transferred block, not once per
            # estimate chunk (losses.block_inv_norms)
            group_norms = [norms_fn(b) if fast else None
                           for b in dev_group]
            for lo in range(0, n, chunk):
                pad = max(0, chunk - (n - lo))
                est_j = est_cache.get(
                    lo, lambda: padded_chunk(estimates, lo)[0])
                # index into dev_group (no loop variable outliving the
                # group: a leftover block ref would keep ~2 GB resident
                # while the next group lands, exceeding the HBM budget)
                for bi in range(len(dev_group)):
                    c0 = (g0 + bi) * cand_block
                    c1 = min(c0 + cand_block, n_fixed)
                    s = np.asarray(block_scores(est_j, dev_group[bi],
                                                group_norms[bi]))
                    scores[lo:lo + chunk - pad, c0:c1] = \
                        s[:chunk - pad, :c1 - c0]
            del dev_group
        del est_cache  # release the cached prepared chunks before pass 2
    # pass 2: each row's own-output score fills the last column
    for lo in range(0, n, chunk):
        est, pad = padded_chunk(estimates, lo)
        own, _ = padded_chunk(outputs, lo)
        s = np.asarray(own_scores_fn(commit_rows(est, row_sharding),
                                     commit_rows(own, row_sharding)))
        scores[lo:lo + chunk - pad, -1] = s[:chunk - pad]
    scores -= scores.max(axis=1, keepdims=True)
    np.exp(scores, out=scores)
    scores /= scores.sum(axis=1, keepdims=True)

    topx = test_args.wer_topx
    correct = 0.
    correct_vocab = 0.
    soft_correct = 0.
    # the fixed negative pool is shared by every row: compute its vocab
    # grouping once (the reference re-runs unique per estimate,
    # bm/wer.py:102-104 — O(N log N) x n_estimates)
    vocab_f, inv_f = np.unique(fixed_hashes, return_inverse=True)
    for lo in range(0, n, chunk):
        wh = word_hashes[lo:lo + chunk]
        probas = scores[lo:lo + len(wh)]
        hashes_row = np.concatenate([fixed_hashes, [0]])  # own filled per row
        for r in range(len(wh)):
            hashes_row[-1] = wh[r]
            p = probas[r]
            best = np.argpartition(p, -topx)[-topx:]
            correct += float((hashes_row[best] == wh[r]).any())
            # vocab probabilities: fixed grouping + the own-output column
            p_vocab = np.bincount(inv_f, weights=p[:-1],
                                  minlength=len(vocab_f))
            j = np.searchsorted(vocab_f, wh[r])
            if j < len(vocab_f) and vocab_f[j] == wh[r]:
                p_vocab[j] += p[-1]
                vocab = vocab_f
            else:
                vocab = np.append(vocab_f, wh[r])
                p_vocab = np.append(p_vocab, p[-1])
            k = min(topx, len(p_vocab))
            bests_vocab = np.argpartition(p_vocab, -k)[-k:]
            correct_vocab += float((vocab[bests_vocab] == wh[r]).any())
            soft_correct += float(p[hashes_row == wh[r]].sum())
    correct /= n
    correct_vocab /= n
    soft_correct /= n
    metrics = {"wer": 1 - correct, "wer_vocab": 1 - correct_vocab,
               # vocab top-k saturates when the candidate pool has few
               # unique words (wer_vocab -> 0 for topx >= vocab size);
               # reported so a 0.0 is distinguishable from a bug
               "wer_n_vocab": float(len(vocab_f))}
    # multi-process pods: every process computed metrics over its own
    # rows — average them like the reference's all-reduce (bm/wer.py:121)
    from .parallel import average_metrics_across_processes
    return average_metrics_across_processes(metrics)
