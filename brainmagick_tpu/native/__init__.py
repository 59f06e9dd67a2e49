"""Native (C++) runtime components, bound via ctypes.

`gather` assembles fixed-shape epoch batches from preprocessed memmaps
at memory bandwidth (multithreaded strided copy + baseline correction).
The library is compiled on first import (g++, cached next to the
source); every caller has a pure-numpy fallback, so the framework works
without a toolchain.
"""

from .gather import batch_gather_epochs, batch_gather_track, is_available  # noqa
