default: tests

tests:
	python -m pytest tests/ -q

fast:
	python -m pytest tests/ -q -m "not slow"

lint:
	python -m flake8 brainmagick_tpu tests scripts --max-line-length 100 || true
	python -m mypy brainmagick_tpu --ignore-missing-imports || true

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py dryrun 8

.PHONY: default tests fast lint bench dryrun
