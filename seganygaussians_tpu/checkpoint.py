"""Training checkpoint / resume (orbax).

Parity: the reference's ``gaussians.capture()`` tuple → ``torch.save`` at
``--checkpoint_iterations`` and ``restore`` on ``--start_checkpoint``
(`train_scene.py:141-143,41-43`; `scene/gaussian_model.py:71-105`).  Here the
whole ``GaussianState`` (params + alive mask + densify stats + Adam moments)
is one pytree, so a checkpoint is a single orbax save — no bespoke tuple
packing — plus a tiny JSON of host-side counters (iteration, sh degree,
spatial_lr_scale).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(
    path: str,
    state: Any,
    iteration: int,
    extra: Optional[dict] = None,
) -> str:
    """Save a pytree + metadata under ``path/ckpt_<iteration>``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt_dir = os.path.join(path, f"ckpt_{iteration}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)
    meta = {"iteration": iteration, **(extra or {})}
    with open(os.path.join(path, f"ckpt_{iteration}.meta.json"), "w") as f:
        json.dump(meta, f)
    return ckpt_dir


def latest_iteration(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    iters = [
        int(d.split("_")[-1])
        for d in os.listdir(path)
        if d.startswith("ckpt_") and not d.endswith(".json")
    ]
    return max(iters) if iters else None


def load_checkpoint(path: str, template: Any, iteration: Optional[int] = None):
    """Restore (state, metadata). ``template`` is a pytree with the target
    shapes/dtypes (e.g. a freshly built state of the same capacity)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if iteration is None:
        iteration = latest_iteration(path)
        assert iteration is not None, f"no checkpoints under {path}"
    ckpt_dir = os.path.join(path, f"ckpt_{iteration}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(ckpt_dir, target=template)
    meta_path = os.path.join(path, f"ckpt_{iteration}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
