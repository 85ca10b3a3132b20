"""Device selection helpers."""

from __future__ import annotations

import jax


def local_cpu():
    """First PROCESS-LOCAL CPU device.

    ``jax.devices('cpu')[0]`` is the first device of the GLOBAL list; in a
    multi-process run (``parallel/distributed.py``) that device may belong
    to another process, and ``device_put`` to it raises
    "Cannot copy array to non-addressable device".  Host-side data
    generation must always pin to an addressable device.
    """
    return jax.local_devices(backend="cpu")[0]
