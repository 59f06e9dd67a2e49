"""Cross-check the DSP kernels + oracle against the REAL julius package.

This container has no network egress and no julius wheel, so the golden
suite (tests/test_dsp_goldens.py) pins the kernels against an
independent direct-summation oracle whose julius conventions (zero
padding, floor output length, hann^2 window, rolloff scaling, unit-sum
lowpass normalization) are reconstructed from the algorithm. On any
machine where ``pip install julius`` works, run this script to diff all
three implementations; it exits non-zero on mismatch beyond fp32
tolerance.

Reference call sites being certified: bm/studies/api.py:334-363
(ResampleFrac + lowpass-subtraction highpass), bm/solver.py:279
(in-loop lowpass, zeros=5), bm/features/audio.py:66,186 (audio->16k).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main() -> int:
    try:
        import julius
        import torch
    except ImportError as exc:
        print(f"SKIP: {exc} — run on a machine with julius installed")
        return 0

    from dsp_oracle import lowpass_oracle, resample_oracle
    from test_dsp_goldens import LOWPASS_CASES, RESAMPLE_CASES, _signal

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from brainmagick_tpu.ops import dsp

    failed = 0
    for old, new, n in RESAMPLE_CASES:
        x = _signal(n, seed=old + new)
        ref = julius.ResampleFrac(old_sr=old, new_sr=new)(
            torch.from_numpy(x)).numpy()
        orc = resample_oracle(x, old, new)
        jx = np.asarray(dsp.resample(jnp.asarray(x), old, new))
        for name, got in (("oracle", orc), ("dsp", jx)):
            if got.shape != ref.shape:
                print(f"FAIL rs {old}->{new} {name}: shape {got.shape} "
                      f"!= julius {ref.shape}")
                failed += 1
                continue
            err = np.abs(got - ref).max()
            status = "ok" if err < 5e-5 else "FAIL"
            failed += status == "FAIL"
            print(f"{status} rs {old}->{new} {name}: max|diff|={err:.2e}")
    for cutoff, zeros, n in LOWPASS_CASES:
        x = _signal(n, seed=zeros)
        ref = julius.lowpass_filter(torch.from_numpy(x), cutoff,
                                    zeros=zeros).numpy()
        orc = lowpass_oracle(x, cutoff, zeros)
        jx = np.asarray(dsp.lowpass_filter(jnp.asarray(x), cutoff,
                                           zeros=zeros))
        for name, got in (("oracle", orc), ("dsp", jx)):
            err = np.abs(got - ref).max()
            status = "ok" if err < 5e-5 else "FAIL"
            failed += status == "FAIL"
            print(f"{status} lp cutoff={cutoff:.4f} zeros={zeros} "
                  f"{name}: max|diff|={err:.2e}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
