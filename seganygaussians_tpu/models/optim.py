"""Masked per-group Adam with row-level state surgery.

The reference drives six parameter groups with distinct learning rates through
one torch Adam (eps 1e-15, `scene/gaussian_model.py:188`), and *edits optimizer
state* when the parameter count changes: pruned rows are dropped, new rows get
zero moments (`scene/gaussian_model.py:323-494`), and a replaced tensor (the
opacity reset) gets zeroed moments (`:482-494`).

The TPU design keeps capacity static, so "surgery" becomes masked row writes:
``zero_rows`` zeroes first/second moments at given rows.  Per-group LRs are a
pytree of scalars with the same structure as the params (xyz's entry is
re-evaluated per step from :func:`expon_lr`, matching
`utils/general_utils.py:29-62`).

This is deliberately not optax: optax's ``MultiTransformState`` nesting makes
the per-row moment surgery awkward, while plain (mu, nu, count) pytrees make it
a one-line ``tree_map``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # pytree like params
    nu: Any  # pytree like params
    count: jnp.ndarray  # () int32


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lrs: Any,  # pytree of scalar learning rates, same structure as params
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Any, AdamState]:
    """One Adam step; returns (new_params, new_state).

    Matches torch.optim.Adam semantics (bias-corrected, eps inside the sqrt
    denominator's sum) with the reference's eps=1e-15.
    """
    count = state.count + 1
    t = count.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    bc1 = 1 - b1**t
    bc2 = 1 - b2**t

    def step(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(step, params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def zero_rows(state: AdamState, row_mask: jnp.ndarray) -> AdamState:
    """Zero the moments at rows where ``row_mask`` is True (state surgery for
    freshly allocated / replaced Gaussians)."""

    def z(leaf):
        mask = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, 0.0, leaf)

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu), count=state.count
    )


def zero_leaf_rows(state: AdamState, leaf_name: str, row_mask: jnp.ndarray) -> AdamState:
    """Zero the moments of ONE named leaf (NamedTuple field) at masked rows —
    the reference's ``replace_tensor_to_optimizer`` (opacity reset)."""

    def z(leaf):
        mask = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, 0.0, leaf)

    return AdamState(
        mu=state.mu._replace(**{leaf_name: z(getattr(state.mu, leaf_name))}),
        nu=state.nu._replace(**{leaf_name: z(getattr(state.nu, leaf_name))}),
        count=state.count,
    )


def expon_lr(
    step: jnp.ndarray,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> jnp.ndarray:
    """Log-lerp LR schedule (Plenoxels/JaxNeRF), parity with
    `utils/general_utils.py:29-62`."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros(())
    step_f = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step_f / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step_f / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return jnp.where(step_f < 0, 0.0, delay * log_lerp)
