"""Exponential moving average over a parameter pytree.

Matches the ema-pytorch semantics the reference trainer uses
(trainer_amass_cond_motion_diffusion.py:58: EMA(beta=0.995, update_every=10),
step_start_ema=2000): before `step_start_ema` optimizer steps the EMA is a
straight copy; afterwards it blends every `update_every` steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(
    ema_params,
    params,
    step: jnp.ndarray,
    beta: float = 0.995,
    update_every: int = 10,
    step_start_ema: int = 2000,
):
    """Branchless EMA update suitable for use inside a jitted train step."""
    do_update = (step % update_every) == 0
    warm = step < step_start_ema

    def blend(e, p):
        new = jnp.where(warm, p, beta * e + (1.0 - beta) * p)
        return jnp.where(do_update, new, e)

    return jax.tree.map(blend, ema_params, params)
