"""Dress-rehearsal grid: ONE job at the TRUE paper architecture.

The 41% protocol's composed config (clip_conv_tpu preset: depth 10,
hidden 320, merger pos_dim 2048, kernel 3, dilation period 5, GLU/2,
complex_out — /root/reference/bm/grids/nmi/main_table.py:15-23 +
conf/model/clip_conv.yaml) against wav2vec-dim-1024 targets
(`Wav2VecTransformer` with random=True — offline stand-in weights, same
architecture/dims), shrunk ONLY in run length (epochs / max_batches /
batch size / negative counts), never in model or feature shape. Driven
end to end by scripts/rehearsal.py: synthetic KIT-.con gwilliams study
-> grid runner -> training -> offline eval -> paper tables.

The cache/out_dir come from BM_REHEARSAL_{CACHE,OUT} so the subprocess
jobs the grid runner spawns resolve the same rehearsal workspace.
"""

import os

from .launcher import ClipExplorer


@ClipExplorer
def explorer(launcher):
    launcher.slurm_(chips=1, topology="v5e-1")
    launcher.bind_({"model": "clip_conv_tpu"})
    launcher.bind_({
        "dset.selections": ["gwilliams2022"],
        "dset.n_recordings": 4,
        "dset.min_n_blocks_per_split": 1,
        # 16 sentence blocks per recording, unmerged, so the sha-based
        # split assignment leaves no split empty at this small scale
        "dset.min_block_duration": 1.0,
        "dset.test_ratio": 0.3,
        "dset.valid_ratio": 0.2,
        "dset.features_params": {
            "Wav2VecTransformer": {
                "layers": [14, 15, 16, 17, 18], "device": "cpu",
                "random": True}},
        # run-length shrink only — the architecture stays paper-size.
        # The budget must be enough to pull the PLANTED linear
        # w2v2->MEG map above chance through the full protocol:
        # scripts/rehearsal.py asserts the eval-stage top-1 accuracy,
        # not just that the chain runs. lr stays at the paper's 3e-4 —
        # 1e-3 at batch 16 diverges (measured: valid loss 0.53 -> 29.8
        # across epochs); the accuracy comes from corpus size (48
        # sentences x 4 subjects), not lr.
        "optim.epochs": 8,
        "optim.max_batches": 24,
        "optim.batch_size": 16,
        "optim.lr": 3e-4,
        "test.wer_negatives": 200,
        "test.wer_topx": 3,
        # wer on the paper model costs ~3.5 CPU-min per pass; the
        # rehearsal's gate is the OFFLINE eval stage, so skip
        # intermediate test passes
        "eval_every": 8,
        "num_workers": 2,
    })
    cache = os.environ.get("BM_REHEARSAL_CACHE")
    if cache:
        launcher.bind_({"cache": cache})
    # variant studies (e.g. the bf16-vs-fp32 estimate A/B in STATUS.md)
    # bind extra overrides from a JSON env var instead of editing the
    # grid: BM_REHEARSAL_EXTRA='{"simpleconv.output_dtype": null}'
    extra = os.environ.get("BM_REHEARSAL_EXTRA")
    if extra:
        import json
        launcher.bind_(json.loads(extra))
    launcher()
