"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D (or reshaped) mesh over the first ``n_devices`` devices.

    Single-slice TPU topologies are torus-contiguous in `jax.devices()` order,
    so a 1-D camera/ray data axis rides ICI neighbours.  Multi-host extension:
    call `jax.distributed.initialize` first; `jax.devices()` then spans hosts
    and the same mesh construction applies (DCN between hosts).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"want {n_devices} devices, have {len(devs)}"
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        # fill trailing axes greedily (e.g. (data, tile))
        shape = (n_devices // int(np.prod([1])), )
        raise NotImplementedError("only 1-D meshes for now")
    return Mesh(np.array(devs[:n_devices]).reshape(shape), axis_names)
