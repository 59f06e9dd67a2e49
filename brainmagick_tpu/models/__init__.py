"""Brain-decoding model families (flax.linen, channels-last on TPU)."""

from .simpleconv import SimpleConv  # noqa
from .convrnn import ConvRNN  # noqa
from .features import DeepMel  # noqa
from . import common  # noqa
