"""Offline segment-retrieval evaluation — the paper's headline metric.

Reference parity: scripts/run_eval_probs.py:27-519. Pipeline:

  1. stream the test set through the trained solver, mining per-sample
     metadata (word / word_index / sequence hash / segment string) from
     the batch event lists at the segment onset (+neighbor fallback),
  2. build the candidate pool by DEDUPLICATING true segments on their
     segment hash (hash of sequence-hash + word-index) — the paper's
     ">=1300 unseen candidate segments",
  3. compute the [N_pred, N_true] probability matrix in device-sized
     blocks with the CLIP scorer,
  4. report top-k in {1, 5, 10} *segment* accuracy — top-1 on
     gwilliams2022 is the published 41% number — and save
     probs/vocab/metadata/acc artifacts.

Determinism note: the reference hashes strings with python's
process-salted hash(); here all hashes are sha1-derived (stable across
runs/processes), which the retrieval metric requires for reproducibility.
"""

from __future__ import annotations

import logging
import typing as tp
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .dataset import ConcatDataset
from .features.basic import stable_word_hash
from .losses import (ClipLoss, block_inv_norms, candidate_blocks,
                     int8_retrieval_ok, iter_device_groups,
                     retrieval_scores, retrieval_scores_int8)
from .solver import Solver
from .utils import write_and_rename

logger = logging.getLogger(__name__)


def _stable_hash(s: str) -> int:
    import hashlib
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "little",
                          signed=True)


def _get_extra_info(batch, sample_rate: float):
    """Per-sample word_index / sequence-hash tracks + word strings mined
    from the event lists (run_eval_probs.py:27-57)."""
    n_times = batch.features.shape[-1]
    B = len(batch)
    data = np.full((B, 2, n_times), -1.0, dtype=np.float64)
    words = np.full((B, n_times), "", dtype="<U30")
    word_segs = []
    assert B == len(batch._event_lists)
    for k, events in enumerate(batch._event_lists):
        segment = ""
        start = events[0].start
        for event in events:
            if event.kind == "word":
                estart = max(0, int(sample_rate * (event.start - start)))
                estop = min(n_times, int(sample_rate * (event.start - start)
                                         + sample_rate * event.duration))
                data[k, 0, estart:estop] = event.word_index
                if not event.word_sequence:
                    raise RuntimeError("Could not get the word sequence.")
                data[k, 1, estart:estop] = _stable_hash(event.word_sequence)
                if estop > estart:
                    words[k, estart:estop] = event.word
                    segment += " " + event.word
        word_segs.append(segment.strip())
    return data, words, np.array(word_segs)


def load_test_data(solver: Solver, batch_size: tp.Optional[int] = None,
                   n_recordings: tp.Optional[int] = None,
                   shuffle: bool = False,
                   test_study: tp.Optional[str] = None) -> tp.Dict[str, tp.Any]:
    """Extract predictions, deduplicated candidates and metadata
    (run_eval_probs.py:60-180)."""
    datasets = solver.datasets.test.datasets
    if test_study is not None:
        datasets = [d for d in datasets
                    if d.recording.study_name() == test_study]
    if n_recordings is not None:
        datasets = datasets[:n_recordings]
    dataset = ConcatDataset(datasets)
    loader = solver.make_loader(dataset, shuffle=shuffle, with_events=True)
    test_features = solver.datasets.test.datasets[0].features

    tmin = solver.args.dset.test.tmin
    if tmin is None:
        tmin = solver.args.dset.tmin
    check_at = int((-tmin) * solver.args.dset.sample_rate) + 2

    outs: tp.Dict[str, list] = defaultdict(list)
    seen_segment_hashes: set = set()
    used_names = list(solver.used_features.keys())
    for batch, pad_weight in loader:
        features = test_features.extract_features(batch.features, used_names)
        extra_info, word_str, word_segs_str = _get_extra_info(
            batch, solver.args.dset.sample_rate)
        # jitted forward, sharded over the mesh when one is set; keep
        # folds in pad_weight. Multi-process meshes: only this
        # process's rows come back — align the host metadata with them
        rows = solver.local_rows(len(batch))
        extra_info = extra_info[rows]
        word_str = word_str[rows]
        word_segs_str = word_segs_str[rows]
        subject_index = np.asarray(batch.subject_index)[rows]
        recording_index = np.asarray(batch.recording_index)[rows]
        preds, trues, _, keep = solver.forward_batch(
            batch.replace(features=features), pad_weight)
        if not keep.any():
            continue
        if "WordHash" in test_features:
            word_hash = batch.features[:, test_features.get_slice(
                "WordHash")][:, 0][rows]
        else:
            word_hash = np.vectorize(stable_word_hash)(word_str)
        word_hash = word_hash[keep]
        wh = word_hash[:, check_at]
        if check_at > 0:
            wh = np.where(wh == 0, word_hash[:, check_at - 1], wh)
        wh = np.where(wh == 0, word_hash[:, check_at + 1], wh)
        wi = extra_info[keep, 0][:, check_at]
        si = extra_info[keep, 1][:, check_at]
        ws = word_str[keep][:, check_at]
        wseg = word_segs_str[keep]

        preds, trues = preds[keep], trues[keep]
        segment_hashes = np.array([
            _stable_hash(f"{int(s)}_{int(w)}")
            for s, w in zip(si, wi)], dtype=np.int64)
        # dedup candidate segments (run_eval_probs.py:137-149)
        mask = []
        for h in segment_hashes:
            if h in seen_segment_hashes:
                mask.append(False)
            else:
                seen_segment_hashes.add(h)
                mask.append(True)
        mask = np.array(mask, dtype=bool)

        outs["preds"].append(preds)
        outs["segment_hashes"].append(segment_hashes)
        outs["trues"].append(trues[mask])
        outs["trues_segment_hashes"].append(segment_hashes[mask])
        outs["word_hashes"].append(wh.astype(np.int64))
        outs["word_indices"].append(wi.astype(np.int64))
        outs["seq_indices"].append(si.astype(np.int64))
        outs["word_strings"].append(ws)
        outs["word_segment_strings"].append(wseg)
        outs["subject_id"].append(subject_index[keep].astype(np.int64))
        outs["recording_id"].append(
            recording_index[keep].astype(np.int64))
        study = "-".join(sorted({r.study_name() for r in batch._recordings}))
        outs["study"].append(np.array([study] * int(keep.sum())))
    return {k: np.concatenate(v, 0) for k, v in outs.items()}


def build_probs(solver: Solver, preds: np.ndarray, trues: np.ndarray,
                batch_size: int = 2048,
                tmin: tp.Optional[float] = None,
                tmax: tp.Optional[float] = None) -> np.ndarray:
    """[N_pred, N_true] probability matrix via blocked CLIP scoring on
    device (run_eval_probs.py:267-307)."""
    dset_args = solver.args.dset
    trim_min = trim_max = None
    if tmin is not None:
        trim_min = int((tmin - dset_args.tmin) * dset_args.sample_rate)
    if tmax is not None:
        trim_max = int((tmax - dset_args.tmin) * dset_args.sample_rate)
    preds = preds[..., trim_min:trim_max]
    trues = trues[..., trim_min:trim_max]

    clip = solver.clip_loss
    if clip is None:
        clip = ClipLoss(dset_tmin=dset_args.tmin,
                        dset_sample_rate=dset_args.sample_rate)
    loss_params = {"params": solver.state["params"].get("loss", {})}

    # candidates streamed through HBM: host-side blocks (large pools do
    # NOT fit on one chip at wav2vec dims — 20k candidates are 28 GB
    # fp32), transferred in bounded device groups; each group is scored
    # against every pred block before the next group lands, so the pool
    # crosses the wire once per group sweep. Softmax over the full row
    # happens on host once all columns exist. See losses.candidate_blocks
    # for the bf16-pool trade-off.
    cand_block = 2048
    n_cand = len(trues)
    use_int8 = (bool(getattr(solver.args.test, "pool_int8", False))
                and int8_retrieval_ok(clip))

    # mesh-parallel scoring (see wer.py): pred rows sharded over the
    # devices, candidate blocks replicated; per-process local scoring
    # on multi-process meshes (losses.mesh_scoring_setup)
    from .losses import (EstimateCache, maybe_ring_scores,
                         mesh_scoring_setup)
    rep_sharding, row_sharding, batch_size = mesh_scoring_setup(
        solver, batch_size)

    fast = int8_retrieval_ok(clip)

    @jax.jit
    def block_scores(block, cand, inv):
        if use_int8:  # int8 MXU pool scoring (test.pool_int8)
            return retrieval_scores_int8(block, cand, inv)
        # Pallas blocked GEMM fast path (XLA einsum fallback for
        # trim/transform configs) — losses.retrieval_scores
        return retrieval_scores(clip, loss_params, block, cand,
                                inv_norms=inv)

    norms_fn = jax.jit(block_inv_norms)

    scores = np.empty((len(preds), n_cand), dtype=np.float32)
    # ring mode (parallel.ring_scoring): candidate pool sharded over
    # the mesh and rotated over the ICI ring — one host->device pool
    # transfer total instead of one per device (losses.ring_scores)
    ring = maybe_ring_scores(solver, clip, use_int8, preds, trues)
    if ring is not None:
        scores[:] = ring
        del ring
    else:
        host_blocks = candidate_blocks(trues, clip.compute_dtype,
                                       cand_block, int8=use_int8)

        def padded_pred_chunk(lo):
            block = preds[lo:lo + batch_size]
            if len(block) < batch_size:
                block = np.concatenate(
                    [block, block[-1:].repeat(batch_size - len(block), 0)])
            return block

        # pred chunks prepared (commit + bf16 cast / int8 quantize)
        # ONCE and reused across candidate groups and blocks — the
        # in-call prep read the full fp32 chunk per block
        # (losses.EstimateCache)
        est_cache = EstimateCache(clip, use_int8, row_sharding)
        for g0, dev_group in iter_device_groups(host_blocks,
                                                sharding=rep_sharding):
            # candidate norms once per transferred block, not once per
            # pred chunk (losses.block_inv_norms — saves a pool read
            # per chunk)
            group_norms = [norms_fn(b) if fast else None
                           for b in dev_group]
            for lo in range(0, len(preds), batch_size):
                pad = max(0, batch_size - (len(preds) - lo))
                block_j = est_cache.get(
                    lo, lambda: padded_pred_chunk(lo))
                # index into dev_group (no loop variable outliving the
                # group — see wer.py: a leftover block ref would exceed
                # the HBM budget while the next group transfers)
                for bi in range(len(dev_group)):
                    c0 = (g0 + bi) * cand_block
                    c1 = min(c0 + cand_block, n_cand)
                    s = np.asarray(block_scores(block_j, dev_group[bi],
                                                group_norms[bi]))
                    scores[lo:lo + batch_size - pad, c0:c1] = \
                        s[:batch_size - pad, :c1 - c0]
            del dev_group
    scores -= scores.max(axis=1, keepdims=True)
    np.exp(scores, out=scores)
    scores /= scores.sum(axis=1, keepdims=True)
    return scores


def accuracy_from_probs(probs: np.ndarray, target_labels: np.ndarray,
                        vocab_labels: np.ndarray, topk: int = 10) -> float:
    """Top-k accuracy of label retrieval (run_eval_probs.py:237-264)."""
    assert len(target_labels) == len(probs)
    assert len(vocab_labels) == probs.shape[1]
    k = min(topk, probs.shape[1])
    idx = np.argpartition(probs, -k, axis=1)[:, -k:]
    labels = vocab_labels[idx]
    return float((labels == target_labels[:, None]).any(axis=1).mean())


def run_eval(solver: Solver, output_dir: tp.Union[str, Path],
             n_negatives: int = 20_000, probs_batch_size: int = 2048,
             n_recordings: tp.Optional[int] = None,
             test_study: tp.Optional[str] = None) -> pd.DataFrame:
    """Full offline evaluation; writes solver_config.yaml,
    probs_segment.npy, vocab_segment.npy, metadata.csv, acc.csv and
    negative_stats.csv (run_eval_probs.py:310-388)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(exist_ok=True, parents=True)

    # full solver config snapshot (run_eval_probs.py:327-329 writes the
    # same artifact for downstream analysis scripts)
    import dataclasses

    import yaml
    with write_and_rename(output_dir / "solver_config.yaml", "w") as f:
        yaml.safe_dump(dataclasses.asdict(solver.args), f,
                       default_flow_style=False)

    data = load_test_data(solver, n_recordings=n_recordings,
                          test_study=test_study)
    logger.info("Loaded %d predictions, %d candidate segments",
                len(data["preds"]), len(data["trues"]))
    probs_segment = build_probs(solver, data["preds"], data["trues"],
                                batch_size=probs_batch_size)
    vocab_segment = data["trues_segment_hashes"]
    segment_hashes = data["segment_hashes"]

    with write_and_rename(output_dir / "probs_segment.npy") as f:
        np.save(f, probs_segment)
    with write_and_rename(output_dir / "vocab_segment.npy") as f:
        np.save(f, vocab_segment)
    metadata_keys = ["segment_hashes", "word_hashes", "word_indices",
                     "seq_indices", "word_segment_strings", "word_strings",
                     "subject_id", "recording_id", "study"]
    with write_and_rename(output_dir / "metadata.csv", "w") as f:
        pd.DataFrame({k: data[k] for k in metadata_keys}).to_csv(f)

    rows = []
    for k in (1, 5, 10):
        acc = accuracy_from_probs(probs_segment, segment_hashes,
                                  vocab_segment, topk=k)
        rows.append(dict(topk=k, acc_segment=acc))
        logger.info("Top-%d segment acc: %.2f%%", k, 100 * acc)
    df = pd.DataFrame(rows).set_index("topk")
    with write_and_rename(output_dir / "acc.csv", "w") as f:
        df.to_csv(f)

    stats = {
        "n_test_samples": len(data["word_hashes"]),
        "n_test_vocab": len(np.unique(data["word_hashes"])),
        "n_test_segments": len(np.unique(segment_hashes)),
        "n_neg_samples": len(data["word_hashes"][:n_negatives]),
        "n_neg_segments": len(np.unique(segment_hashes[:n_negatives])),
    }
    for key, val in stats.items():
        logger.info("%s: %d", key, val)
    with write_and_rename(output_dir / "negative_stats.csv", "w") as f:
        pd.Series(stats).to_csv(f)
    return df


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    """CLI: python -m brainmagick_tpu.eval sig=<xp_sig> [out_dir=...]
    [output=eval_dir] (run_eval_probs.py __main__ parity; the submitit
    array mode maps to the grids runner)."""
    import sys

    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    from .play import get_solver_from_sig

    tokens = dict(t.split("=", 1) for t in
                  (argv if argv is not None else sys.argv[1:]))
    out_dir = tokens.get("out_dir", "./outputs")
    n_negatives = int(tokens.get("n_negatives", 20_000))
    # accept both spellings of the knob: the bare token and the train
    # CLI's `parallel.compilation_cache` config path
    _cc = tokens.get("parallel.compilation_cache",
                     tokens.get("compilation_cache", "true"))
    if str(_cc).lower() != "false":
        # eval sweeps re-load many XPs with the same compiled forward/
        # scoring shapes — persist the compiles across processes
        from .parallel import enable_compilation_cache
        enable_compilation_cache()

    if "grid" in tokens:
        # evaluate every trained XP of a grid (replaces the reference's
        # submitit array, run_eval_probs.py:497-513); workers=N overlaps
        # N eval subprocesses with per-XP logs
        from .grids import get_grid
        _, jobs = get_grid(tokens["grid"])
        sigs = [job.sig for job in jobs]
        sigs = [s for s in sigs
                if (Path(out_dir) / "xps" / s / "checkpoint.pkl").exists()]
        logger.info("Evaluating %d trained XPs of grid %s", len(sigs),
                    tokens["grid"])
        workers = int(tokens.get("workers", 1))
        if workers > 1:
            from .grids.runner import run_commands_with_logs

            def _cmd(sig: str) -> tp.List[str]:
                cmd = [sys.executable, "-m", "brainmagick_tpu.eval",
                       f"sig={sig}", f"out_dir={out_dir}",
                       f"n_negatives={n_negatives}"]
                if "test_study" in tokens:
                    cmd.append(f"test_study={tokens['test_study']}")
                return cmd

            run_commands_with_logs([(sig, _cmd(sig)) for sig in sigs],
                                   Path(out_dir) / "eval" / "logs",
                                   workers)
            return
    else:
        sigs = [tokens["sig"]]

    for sig in sigs:
        output = tokens.get("output", str(Path(out_dir) / "eval" / sig))
        solver = get_solver_from_sig(sig, out_dir=out_dir, training=False)
        if (solver.args.parallel.auto_mesh and jax.device_count() > 1
                and solver.args.optim.batch_size
                % jax.device_count() == 0):
            # mesh-parallel offline eval: forwards + scoring over every
            # device (single-process meshes; see wer.py for the
            # multi-process per-rank semantics)
            from .parallel import make_mesh
            solver.set_mesh(make_mesh())
            logger.info("eval mesh over %d devices", jax.device_count())
        run_eval(solver, output, n_negatives=n_negatives,
                 test_study=tokens.get("test_study"))


if __name__ == "__main__":
    main()
