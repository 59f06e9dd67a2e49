"""Full-architecture dress rehearsal (VERDICT r2 #5), gated on
BM_REHEARSAL=1 (it trains the TRUE paper architecture — depth 10 /
hidden 320 / merger pos_dim 2048 / 1024-dim wav2vec targets — which
takes ~10 min on this 1-core host). `make rehearsal` runs it."""

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("BM_REHEARSAL"),
                    reason="set BM_REHEARSAL=1 (or `make rehearsal`) — "
                           "paper-size training is ~10 min on CPU")
def test_full_architecture_rehearsal(tmp_path):
    sys.path.insert(0, str(REPO))
    from scripts.rehearsal import main

    workdir = main([f"workdir={tmp_path / 'rehearsal'}"])
    out_dir = workdir / "outputs"
    sig = next((out_dir / "xps").iterdir()).name
    assert (out_dir / "xps" / sig / "done.json").exists()
    assert (out_dir / "eval" / sig / "acc.csv").exists()
    assert (out_dir / "eval" / sig / "probs_segment.npy").exists()
    assert (out_dir / "table_rehearsal.csv").exists()
