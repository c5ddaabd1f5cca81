"""Heading extraction and per-window canonicalization.

JAX ports of the reference's numpy heading utilities:
  * rotate_at_frame   <- egoego/lafan1/utils.py:111-138 (rotate_at_frame_smplh)
  * get_heading_quat / de_heading
      <- egoego/model/head_estimation_transformer.py:21-34 and
         kinpoly/relive/utils/torch_utils.py (get_heading_q / de_heading)

These run fully on device (the reference round-trips to CPU/numpy inside its
DDPM sampling loop — transformer_cond_diffusion_model.py:362-368).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


def get_heading_quat(q: Array, eps: float = 1e-12) -> Array:
    """Project quaternion onto the z-axis (heading) rotation.

    Zeroes the x/y imaginary parts and renormalizes, exactly like the
    reference's get_heading_q_batch.
    """
    heading = q * jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    norm = jnp.linalg.norm(heading, axis=-1, keepdims=True)
    return heading / jnp.maximum(norm, eps)


def de_heading(q: Array) -> Array:
    """Remove heading: returns heading_inv * q."""
    return rot.quat_multiply(rot.quat_invert(get_heading_quat(q)), q)


def rotate_at_frame(
    trans: Array, quat: Array, cano_t_idx: int = 0, eps: float = 1e-8
):
    """Canonicalize a trajectory so frame `cano_t_idx` faces +x.

    trans: (B, T, 3) positions; quat: (B, T, 4) wxyz orientations.
    Returns (new_trans (B,T,3), new_quat (B,T,4), yrot (B,1,1,4)) where yrot
    maps the canonical frame back to the original scene (apply yrot to recover).

    The body-forward axis convention matches the reference: in rest pose +x is
    the body left direction, so forward = R @ [1,0,0] projected to the xy
    plane (floor is z=const).
    """
    key_q = quat[:, cano_t_idx : cano_t_idx + 1, :]  # (B, 1, 4)
    x_axis = jnp.asarray([1.0, 0.0, 0.0], dtype=trans.dtype)
    forward = rot.quat_apply(key_q, jnp.broadcast_to(x_axis, key_q.shape[:-1] + (3,)))
    forward = forward * jnp.asarray([1.0, 1.0, 0.0], dtype=trans.dtype)
    # lafan1 `normalize` divides by (norm + eps) rather than clamping
    forward = forward / (jnp.linalg.norm(forward, axis=-1, keepdims=True) + eps)

    yrot = rot.quat_between(jnp.broadcast_to(x_axis, forward.shape), forward)
    yrot = yrot / (jnp.linalg.norm(yrot, axis=-1, keepdims=True) + eps)  # (B,1,4)

    yrot_inv = rot.quat_invert(yrot)
    new_quat = rot.quat_multiply(yrot_inv, quat)  # broadcast over T
    new_trans = rot.quat_apply(yrot_inv, trans)
    return new_trans, new_quat, yrot[:, None]  # (B,1,1,4) like the reference
