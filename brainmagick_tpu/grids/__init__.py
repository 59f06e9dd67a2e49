"""Experiment grids: Dora-free launcher + explorers + grid definitions.

Reference parity: bm/grids/ — grid files are python programs over a
`launcher`; an explorer defines the metric table. Here the launcher
collects deduplicated config-override jobs and either prints them,
runs them sequentially in-process, or emits shell commands (no
SLURM/submitit in this environment — plug a scheduler by consuming
`Launcher.jobs`).

CLI: ``python -m brainmagick_tpu.grids <grid_name> [--run | --table]``.
"""

from .launcher import Launcher, Explorer, BMExplorer, ClipExplorer  # noqa
from .runner import get_grid, list_grids, main  # noqa
