"""Stimulus-representation features.

Reference parity: bm/features/. Features are painted onto dense [D, T]
tracks; see base.FeaturesBuilder for the channel-slice contract.
"""

from .base import Feature, FeaturesBuilder  # noqa
from . import basic  # noqa
from . import audio  # noqa
from . import embeddings  # noqa
