"""Small shared utilities (reference parity: bm/utils.py)."""

from .misc import (  # noqa
    Frequency,
    roundrobin,
    write_and_rename,
    flatten_dict,
    identify_host,
    timer,
)
