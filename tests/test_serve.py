"""Serving export (jax.export StableHLO artifacts) — brainmagick_tpu
extension; the reference serves by unpickling the torch Solver
(scripts/run_eval_probs.py:211)."""

import numpy as np
import pytest
from test_solver import tiny_args

from brainmagick_tpu import serve
from brainmagick_tpu import train as bm_train
from brainmagick_tpu.dataset import SegmentBatch


def _trained_solver(tmp_cache, tmp_path):
    args = tiny_args(tmp_cache, tmp_path, epochs=1)
    solver = bm_train.get_solver(args)
    solver.train()
    return solver


@pytest.mark.slow
def test_export_roundtrip_symbolic_batch(tmp_cache, tmp_path):
    """Export with a symbolic batch dim, serialize, reload, and check
    the artifact matches the solver forward at TWO batch sizes."""
    solver = _trained_solver(tmp_cache, tmp_path)
    # multi-platform artifact authored from a CPU host: the TPU serving
    # fleet and local debugging both run the same file
    exported = serve.export_forward(solver, platforms=("tpu", "cpu"))
    assert exported.platforms == ("tpu", "cpu")
    path = serve.save_exported(exported, tmp_path / "model.jaxexp")
    assert path.stat().st_size > 1000
    reloaded = serve.load_exported(path)

    ds = solver.datasets.test
    for n in (2, 5):
        batch = serve.prepare_batch(solver, SegmentBatch.collate(
            [ds[i % len(ds)] for i in range(n)]))
        est_x, out_x, mask_x, keep_x = serve.call_exported(reloaded, batch)
        est_s, out_s, mask_s, keep_s = solver.forward_batch(batch)
        assert est_x.shape == est_s.shape
        np.testing.assert_allclose(est_x, est_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out_x, out_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(keep_x, keep_s)

    # the retrieval scorer: symbolic rows AND candidates — one artifact
    # scores any pool size; matches the solver's CLIP probabilities
    import jax
    import jax.numpy as jnp
    scorer = serve.load_exported(serve.save_exported(
        serve.export_scores(solver), tmp_path / "scores.jaxexp"))
    loss_params = jax.device_get(solver.state["params"])["loss"]
    for rows, cands in ((2, 5), (3, 7)):
        est = est_s[:rows]
        bank = np.concatenate([out_s] * ((cands // len(out_s)) + 1))[:cands]
        probs_x = np.asarray(scorer.call(jnp.asarray(est),
                                         jnp.asarray(bank)))
        probs_s = np.asarray(solver.clip_loss.apply(
            {"params": loss_params}, jnp.asarray(est), jnp.asarray(bank),
            method=solver.clip_loss.get_probabilities))
        assert probs_x.shape == (rows, cands)
        np.testing.assert_allclose(probs_x.sum(1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(probs_x, probs_s, rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_export_fixed_batch_and_cli(tmp_cache, tmp_path):
    """Fixed-batch export via the CLI path, including the selfcheck."""
    solver = _trained_solver(tmp_cache, tmp_path)
    sig = solver.args.sig
    serve.main([f"sig={sig}", f"out_dir={solver.args.out_dir}",
                "batch_size=3"])
    out = (tmp_path / "outputs" / "xps" / sig / "model.jaxexp")
    assert out.exists()
    reloaded = serve.load_exported(out)
    ds = solver.datasets.test
    batch = serve.prepare_batch(solver, SegmentBatch.collate(
        [ds[i % len(ds)] for i in range(3)]))
    est_x, *_ = serve.call_exported(reloaded, batch)
    est_s, *_ = solver.forward_batch(batch)
    np.testing.assert_allclose(est_x, est_s, rtol=1e-5, atol=1e-5)
