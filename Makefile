default: tests

# default gate: everything but the slow-marked end-to-end trainings /
# export roundtrips / multiprocess tests (~4 min single-core, scales
# down with -n auto on multi-core hosts). `make tests-all` runs the
# full 240+ test suite (~12 min single-core).
tests:
	python -m pytest tests/ -q -m "not slow" -n auto

tests-all:
	python -m pytest tests/ -q -n auto

fast: tests

lint:
	python -m flake8 brainmagick_tpu tests scripts --max-line-length 100 || true
	python -m mypy brainmagick_tpu --ignore-missing-imports || true

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py dryrun 8

# full-architecture dress rehearsal of the 41% protocol: synthetic
# KIT-.con gwilliams study (planted linear w2v2->MEG map, 48 sentences
# x 4 subjects) -> grid runner -> paper-size training -> offline eval
# (asserts top-1 >> chance; measured 56.4% over 94 candidates, chance
# 1.1%) -> paper tables (~30 min on a 1-core host)
rehearsal:
	BM_REHEARSAL=1 python -m pytest tests/test_rehearsal.py -q -s

.PHONY: default tests tests-all fast lint bench dryrun rehearsal

verify:
	rm -rf /tmp/vfy && mkdir -p /tmp/vfy/fake_cache
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
import runpy, sys; \
sys.argv = ['train', 'dset.selections=[\"fake\"]', 'dset.n_recordings=2', \
'dset.features=[\"MelSpectrum\"]', \
'dset.features_params={\"MelSpectrum\": {\"n_mels\": 8}}', \
'dset.condition=1.0', 'dset.tmin=-0.2', 'dset.tmax=1.0', \
'dset.test_ratio=0.3', 'dset.valid_ratio=0.2', \
'dset.min_n_blocks_per_split=1', 'optim.loss=clip', 'optim.epochs=2', \
'optim.batch_size=8', 'test.wer_negatives=50', 'test.wer_topx=3', \
'preset=tiny', 'cache=/tmp/vfy/fake_cache', \
'out_dir=/tmp/vfy/outputs', 'num_workers=2']; \
runpy.run_module('brainmagick_tpu.train', run_name='__main__')"

.PHONY: verify
