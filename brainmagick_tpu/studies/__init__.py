"""Dataset adapters ("studies") and the Recording API.

Importing this package registers every study adapter in `register`
(reference: bm/studies/__init__.py).
"""

from .api import Recording, RawData, register, from_selection, INVALID_POSITION  # noqa
from . import fake  # noqa
from . import fakeeeg  # noqa
from . import gwilliams2022  # noqa
from . import brennan2019  # noqa
from . import broderick2019  # noqa
from . import schoffelen2019  # noqa
