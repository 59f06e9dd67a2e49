"""Worker for the TRUE multi-process mesh test (VERDICT r2 #4).

Run as a subprocess with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count set BEFORE interpreter start:

    python mp_worker.py <process_id> <num_processes> <port> <cache> <out>

process_id >= 0 joins a jax.distributed cluster of num_processes
(2 local devices each); process_id -1 is the single-process reference
(4 local devices — same TOTAL device count, so the shard_map loss
structure is identical and losses must match bit-for-near-bit).

Each process exercises the real multi-host code paths: per-process
batch rows (`Solver.local_rows` / `parallel.process_rows`),
`jax.make_array_from_process_local_data` assembly (`parallel.
shard_array`), the shard_map training step with cross-process pmean
(gloo collectives), `_addressable_rows` output pulls, and the
mesh-parallel WER stage with cross-process metric averaging — the
process boundary the reference crosses at bm/train.py:139.
"""

import sys
from pathlib import Path


def build_args(cache: str, out_dir: str, negatives: int = 0):
    from brainmagick_tpu.config import MainConfig
    args = MainConfig()
    args.cache = str(cache)
    args.out_dir = str(out_dir)
    args.num_workers = 2
    args.seed = 1234
    args.dset.selections = ["fake"]
    args.dset.n_recordings = 2
    args.dset.features = ["MelSpectrum"]
    args.dset.features_params = {"MelSpectrum": {"n_mels": 8}}
    args.dset.test_ratio = 0.3
    args.dset.valid_ratio = 0.2
    args.dset.min_n_blocks_per_split = 1
    args.dset.tmin = -0.2
    args.dset.tmax = 1.0
    args.dset.condition = 1.0
    args.optim.loss = "clip"
    args.optim.epochs = 1
    args.optim.batch_size = 8
    args.optim.max_batches = 3
    if negatives:
        # sampled-pool top-up across the process boundary: pools are
        # process_allgather'ed to stay identical on every host
        # (solver._run_one_epoch)
        args.optim.negatives = negatives
    args.test.wer_negatives = 50
    args.test.wer_topx = 3
    args.task.offset_meg_ms = 50
    args.simpleconv.update(
        hidden=24, depth=2, kernel_size=3, dilation_period=2, skip=True,
        glu=2, glu_context=1, merger=True, merger_channels=16,
        merger_pos_dim=32, initial_linear=16, gelu=True, batch_norm=True,
        subject_layers=True, subject_dim=0, complex_out=True)
    return args


def main() -> None:
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    cache = sys.argv[4]
    out_dir = sys.argv[5]
    negatives = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    import jax
    import numpy as np
    if proc_id >= 0:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n_proc, process_id=proc_id)
        assert jax.process_count() == n_proc
    print(f"DEVICES {jax.device_count()} LOCAL {jax.local_device_count()}",
          flush=True)

    from brainmagick_tpu import train as bm_train
    from brainmagick_tpu.env import env
    from brainmagick_tpu.parallel import make_mesh

    with env.temporary(cache=Path(cache)):
        args = build_args(cache, out_dir, negatives=negatives)
        solver = bm_train.get_solver(args)
        solver.set_mesh(make_mesh())  # all devices, across processes

        metrics = solver._run_one_epoch(training=True)
        print(f"TRAIN_LOSS {metrics['loss']!r}", flush=True)
        if negatives:
            pool = solver.negative_pool["train"]
            print(f"POOL {len(pool)} {float(np.abs(pool).sum())!r}",
                  flush=True)

        batch, pad_weight = next(iter(solver.loaders["valid"]))
        est, out, mask, keep = solver.forward_batch(batch, pad_weight)
        print(f"FWD_ROWS {est.shape[0]} KEEP {int(keep.sum())}",
              flush=True)

        from brainmagick_tpu.wer import get_wer
        wer = get_wer(solver)
        print(f"WER {wer['wer']!r} {wer['wer_vocab']!r}", flush=True)


if __name__ == "__main__":
    main()
