"""Full-architecture dress rehearsal of the 41% protocol (VERDICT r2 #5).

Builds a 208-channel gwilliams-shaped synthetic study stored as REAL
KIT `.con` files (the MEG-MASC on-disk format), then drives the
complete headline-metric chain at the TRUE paper architecture:

    grid runner (grids/rehearsal.py, clip_conv_tpu preset: depth 10 /
    hidden 320 / merger pos_dim 2048 / wav2vec-dim-1024 targets)
      -> subprocess training jobs (brainmagick_tpu.train CLI)
      -> offline eval (eval.run_eval: probs_segment.npy + acc.csv)
      -> paper tables (scripts/paper_tables.py table)

Everything is execution-true to the real protocol except run length
(2 epochs x 2 batches) and data volume; the only un-executed step left
for the published 41% number is the real MEG-MASC download.
Reference chain: /root/reference/scripts/run_eval_probs.py:354-364,
/root/reference/bm/grids/nmi/main_table.py:15-23.

Usage:  python scripts/rehearsal.py [workdir=/path]  (also driven by
`make rehearsal` and tests/test_rehearsal.py, gated on BM_REHEARSAL=1)
"""

from __future__ import annotations

import os
import sys
import typing as tp
import wave
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore today",
    "a stitch in time saves nine they always say",
    "every good boy deserves fudge and fruit at noon",
    "the rain in spain falls mainly on the plain",
    "pack my box with five dozen brown liquor jugs",
    "how quickly daft jumping zebras vex the old judge",
    "we watched the bright stars fade before cold dawn",
    "small rivers carve deep valleys through patient stone walls",
    "the baker sold warm bread before the town woke",
    "tall ships crossed rough seas under heavy grey skies",
    "her garden grew wild roses beside the old gate",
    "the children chased bright kites across the open field",
    "old clocks tick slowly in the quiet dusty hall",
    "fresh snow covered every roof in the sleeping village",
    "long trains carried coal north through the frozen hills",
]
WORD_STEP = 0.4
GAP = 2.0
N_CHANNELS = 208
RAW_SR = 1000


def _write_wav(path: Path, seconds: float) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    sr = 16_000
    t = np.arange(int(sr * seconds)) / sr
    # audible structure (chirp + AM) so mel/w2v targets are not flat
    sig = (np.sin(2 * np.pi * (220 + 40 * np.sin(0.5 * t)) * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)))
    sig = (sig * 2 ** 14).astype("<i2")
    with wave.open(str(path), "w") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(sig.tobytes())


def build_study(root: Path, n_subjects: int = 2) -> None:
    """Gwilliams-shaped BIDS tree: participants.tsv, per-recording
    events.tsv (dict-literal trial_type like the real annotations) and
    208-channel KIT .con raws written by our own writer
    (studies/kit.py) — the same format the real MEG-MASC ships."""
    from brainmagick_tpu.studies.api import RawData
    from brainmagick_tpu.studies.kit import write_kit

    download = root / "download"
    download.mkdir(parents=True, exist_ok=True)
    subjects = [f"sub-{k + 1:02d}" for k in range(n_subjects)]
    pd.DataFrame({"participant_id": subjects}).to_csv(
        download / "participants.tsv", sep="\t", index=False)

    # one shared story wav: every sound event slices the same file, so
    # the wav2vec stand-in embeddings compute once and cache
    rows: tp.List[dict] = []
    t = 1.0
    for seq_id, sentence in enumerate(SENTENCES):
        words = sentence.split()
        rows.append(dict(onset=t, duration=len(words) * WORD_STEP,
                         trial_type=repr(dict(
                             kind="sound",
                             sound="stimuli/audio/story0.WAV.wav"))))
        for word in words:
            rows.append(dict(onset=t, duration=0.3, trial_type=repr(dict(
                kind="word", word=word, sequence_id=seq_id,
                condition="sentence"))))
            t += WORD_STEP
        t += GAP
    total = t + 2.0
    _write_wav(download / "stimuli" / "audio" / "story0.wav", total)

    rng = np.random.RandomState(0)
    positions = rng.rand(N_CHANNELS, 2).astype(np.float32)
    for si, sub in enumerate(subjects):
        meg_dir = download / sub / "ses-0" / "meg"
        meg_dir.mkdir(parents=True, exist_ok=True)
        stem = f"{sub}_ses-0_task-0"
        pd.DataFrame(rows).to_csv(meg_dir / f"{stem}_events.tsv",
                                  sep="\t", index=False)
        data = rng.randn(N_CHANNELS, int(RAW_SR * total)
                         ).astype(np.float32) * 1e-13  # Tesla scale
        raw = RawData(
            data=data, sample_rate=float(RAW_SR),
            ch_names=[f"MEG{k:03d}" for k in range(N_CHANNELS)],
            positions=positions, ch_kinds=[1] * N_CHANNELS)
        write_kit(meg_dir / f"{stem}_meg.con", raw)


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> Path:
    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    kw = dict(t.split("=", 1) for t in (argv or sys.argv[1:]))
    workdir = Path(kw.get("workdir") or
                   os.environ.get("BM_REHEARSAL_DIR") or
                   "/tmp/bm_rehearsal")
    root = workdir / "gwilliams"
    cache = workdir / "cache"
    out_dir = workdir / "outputs"
    cache.mkdir(parents=True, exist_ok=True)

    if not (root / "download" / "participants.tsv").exists():
        print("building synthetic KIT-.con gwilliams study ...")
        build_study(root)

    # subprocess grid jobs resolve the study/cache via these env vars;
    # the in-process path (workers=1) needs the already-initialized env
    # singleton updated directly
    os.environ["BM_TPU_STUDY_GWILLIAMS2022"] = str(root)
    os.environ["BM_REHEARSAL_CACHE"] = str(cache)
    from brainmagick_tpu.env import env as _env
    _env.studies = {**_env.studies, "gwilliams2022": root}

    from brainmagick_tpu.grids.runner import get_grid, run_jobs

    explorer, jobs = get_grid("rehearsal")
    assert len(jobs) == 1
    cfg = jobs[0].to_config()
    # the job IS the paper architecture
    assert cfg.simpleconv["depth"] == 10
    assert cfg.simpleconv["merger_pos_dim"] == 2048
    assert cfg.dset.features == ["Wav2VecTransformer"]
    sig = cfg.sig
    print(f"rehearsal XP sig={sig}")

    results = run_jobs(jobs, out_dir=str(out_dir), workers=1)
    failed = {s: rc for s, rc in results.items() if rc not in (0, None)}
    assert not failed, f"training job failed: {failed} " \
        f"(logs under {out_dir}/logs)"
    assert (out_dir / "xps" / sig / "done.json").exists()

    # offline eval — the stage that defines the 41% metric
    from brainmagick_tpu.env import env
    from brainmagick_tpu.eval import run_eval
    from brainmagick_tpu.play import get_solver_from_sig

    with env.temporary(cache=cache):
        solver = get_solver_from_sig(sig, out_dir=str(out_dir),
                                     training=False)
        eval_dir = out_dir / "eval" / sig
        df = run_eval(solver, eval_dir, n_negatives=200)
    for artifact in ("acc.csv", "probs_segment.npy", "vocab_segment.npy",
                     "metadata.csv", "solver_config.yaml",
                     "negative_stats.csv"):
        assert (eval_dir / artifact).exists(), artifact
    acc1 = float(df.loc[1, "acc_segment"])
    assert 0.0 <= acc1 <= 1.0
    print(f"top-1 segment acc (synthetic data, 2x2-batch training): "
          f"{100 * acc1:.1f}%")

    # paper tables over the grid's eval artifacts
    from scripts.paper_tables import main as tables_main
    tables_main(["table", "grid=rehearsal", f"out_dir={out_dir}"])
    table_csv = out_dir / "table_rehearsal.csv"
    assert table_csv.exists()
    print(f"rehearsal complete: {workdir}")
    return workdir


if __name__ == "__main__":
    main()
