"""Mesh construction + multi-host runtime entry.

The reference is single-GPU/single-process (SURVEY.md §2.4); these are the
greenfield TPU scaling primitives: an N-D `jax.sharding.Mesh` whose axes the
trainers shard cameras ("data") and rays / tile rows ("ray") over, and the
standard JAX multi-host bring-up (`jax.distributed.initialize`) so the same
mesh spans pods — ICI within a slice, DCN between hosts, all collectives
emitted by XLA from the `shard_map` specs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up. On TPU pods with default env vars, call with no
    arguments; elsewhere pass coordinator/num_processes/process_id explicitly.
    After this, `jax.devices()` spans every host and `make_mesh` meshes ride
    DCN across hosts automatically."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    axis_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """N-D mesh over the first ``n_devices`` devices.

    1-D: all devices on ``axis_names[0]``.  N-D: ``axis_shape`` gives the
    size of every axis (its product must equal ``n_devices``); with no
    ``axis_shape``, the leading axis absorbs all devices and trailing axes
    get size 1.  Single-slice TPU topologies are torus-contiguous in
    `jax.devices()` order, so the fastest-varying (trailing) axis rides ICI
    neighbours — put the chattiest dimension (ray/tile all-gathers) last and
    the camera data axis first (per-step pmean only).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"want {n_devices} devices, have {len(devs)}"
    if axis_shape is None:
        axis_shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    axis_shape = tuple(int(s) for s in axis_shape)
    assert len(axis_shape) == len(axis_names), (axis_shape, axis_names)
    assert int(np.prod(axis_shape)) == n_devices, (
        f"axis_shape {axis_shape} does not tile {n_devices} devices"
    )
    return Mesh(np.array(devs[:n_devices]).reshape(axis_shape), axis_names)
