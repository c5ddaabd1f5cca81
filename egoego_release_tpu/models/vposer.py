"""VPoser v1 latent-pose decoder (JAX).

The reference's GIMO preprocessing decodes per-frame 32-d VPoser latents into
21-joint axis-angle body poses with `human_body_prior.load_vposer(...,
vp_model='snapshot').decode(latent, output_type='aa')`
(utils/gimo_utils/extract_pose_params.py:11-53).  human_body_prior is not a
bundled dependency, so this module re-implements the v1 *decoder* path as
pure JAX functions plus a converter for the released torch snapshot
(`vposer_v1_0/snapshots/TR00_E096.pt`-style state dicts):

    decoder: Linear(latentD->512) -> LeakyReLU(0.2) -> [dropout, eval=id]
             Linear(512->512)     -> LeakyReLU(0.2)
             Linear(512->21*6)    -> ContinousRotReprDecoder -> matrot

ContinousRotReprDecoder is the *column* 6d convention (the 6 numbers are the
first two matrix COLUMNS, Gram-Schmidt orthonormalised) — unlike this repo's
row convention (ops/rotations.rot6d_to_matrix, CLAUDE.md) — so it is
implemented locally and not shared.

No VPoser weights ship with either repo (licensed artifact); the converter
accepts the user's downloaded snapshot.  tests/test_vposer.py validates the
math against a functional torch oracle on random weights.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops.rotations import matrix_to_axis_angle

NUM_JOINTS = 21
LATENT_D = 32
NUM_NEURONS = 512


def cont_rot_repr_decode(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3); VPoser's ContinousRotReprDecoder
    (human_body_prior v1): the 6 numbers are two 3-d COLUMNS [a1 a2];
    b1 = norm(a1), b2 = norm(a2 - <b1,a2> b1), b3 = b1 x b2, R = [b1 b2 b3]."""
    a = d6.reshape(d6.shape[:-1] + (3, 2))
    a1, a2 = a[..., 0], a[..., 1]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def vposer_decode(params: dict, latent: jnp.ndarray, output_type: str = "aa") -> jnp.ndarray:
    """Decode VPoser latents (..., 32) to body pose.

    output_type 'aa' -> (..., 21, 3) axis-angle (extract_pose_params.py:53);
    'matrot' -> (..., 21, 3, 3).
    Dropout is inference-mode (identity), matching the reference's eval use.
    """
    def leaky(y):
        return jnp.maximum(y, 0.2 * y)

    x = leaky(latent @ params["fc1_w"] + params["fc1_b"])
    x = leaky(x @ params["fc2_w"] + params["fc2_b"])
    x = x @ params["out_w"] + params["out_b"]           # (..., 21*6)
    m = cont_rot_repr_decode(x.reshape(x.shape[:-1] + (NUM_JOINTS, 6)))
    if output_type == "matrot":
        return m
    if output_type == "aa":
        return matrix_to_axis_angle(m)
    raise ValueError(f"unknown output_type {output_type!r}")


def convert_vposer_state_dict(sd: dict) -> dict:
    """Torch VPoser v1 state dict -> decoder params (transposed for x@W)."""
    def w(key):
        v = sd[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    return {
        "fc1_w": w("bodyprior_dec_fc1.weight").T,
        "fc1_b": w("bodyprior_dec_fc1.bias"),
        "fc2_w": w("bodyprior_dec_fc2.weight").T,
        "fc2_b": w("bodyprior_dec_fc2.bias"),
        "out_w": w("bodyprior_dec_out.weight").T,
        "out_b": w("bodyprior_dec_out.bias"),
    }


def load_vposer_ckpt(path: str) -> dict:
    """Load a VPoser v1 snapshot (.pt state dict / {'state_dict': ...})."""
    from egoego_release_tpu.utils.torch_ckpt import load_torch_state_dict

    sd = load_torch_state_dict(path)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return convert_vposer_state_dict(sd)
