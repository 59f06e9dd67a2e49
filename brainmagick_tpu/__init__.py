"""brainmagick_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for decoding
speech perception from non-invasive brain recordings (MEG/EEG).

Re-designed from scratch with the capabilities of facebookresearch/brainmagick
(Défossez et al., Nature Machine Intelligence 2023): a convolutional brain
encoder with Fourier spatial attention over sensor positions, per-subject
layers and a dilated-GLU conv stack, trained with a CLIP-style contrastive
loss against speech representations (mel-spectrogram / wav2vec 2.0), plus the
full event/block/split machinery, feature system, solver and
segment-retrieval evaluation.

Architecture differences vs the reference (see SURVEY.md):
  * the compute path is JAX/XLA (flax.linen models, jit train step) instead
    of PyTorch; multi-chip scaling uses a `jax.sharding.Mesh` + shard_map
    instead of DDP/NCCL,
  * preprocessing (resample, filters) are JAX kernels instead of
    julius/MNE, cached as columnar on-disk arrays,
  * features are precomputed as dense per-recording tracks so the training
    input pipeline is pure array slicing.
"""

from . import utils  # noqa
from .env import env  # noqa

__version__ = "0.1.0"
