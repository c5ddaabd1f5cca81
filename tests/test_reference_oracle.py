"""Golden-chain parity tests against the reference's OWN code.

Unlike the hand-written functional oracles elsewhere in tests/, these import
the actual modules under /root/reference (via tests/refstubs for the absent
pytorch3d/torchvision/evo deps) and assert the JAX implementations reproduce
them on shared weights and inputs:

  * Decoder / TransformerDiffusionModel forwards  (transformer_module.py:172,
    transformer_cond_diffusion_model.py:75)
  * DDPM posterior math                           (:216-246)
  * p_losses with shared (zero) noise             (:574-605)
  * the FULL canonical sliding-window chain       (:330-467), frame-for-frame,
    with per-step noise pinned to zero on both sides so the comparison is
    deterministic while every piece of math still runs
  * HeadFormer.forward / forward_for_eval         (head_estimation_transformer.py:131,214)
  * HeadNormalFormer.forward / forward_for_eval   (head_normal_estimation_transformer.py:118,214)
  * lafan1 rotate_at_frame_smplh, quat_ik/fk      (lafan1/utils.py:111,
    amass_diffusion_dataset.py:109-143)

The pytorch3d stub itself is validated against scipy (independent oracle)
so the stub cannot share a bug with the JAX rotations library.
"""

import math
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

import reforacle

from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
from egoego_release_tpu.diffusion.gaussian_diffusion import NormStats
from egoego_release_tpu.models import gravitynet as gnet
from egoego_release_tpu.models import headnet as hnet
from egoego_release_tpu.models.denoiser import TransformerDiffusionModel
from egoego_release_tpu.models.transformer import Decoder, make_pos_idx
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import heading
from egoego_release_tpu.ops import rotations as rot
from egoego_release_tpu.utils.torch_ckpt import (
    convert_decoder,
    convert_denoiser,
    convert_gravitynet,
    convert_headformer,
)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# stub validation: pytorch3d stub vs scipy (independent oracle)
# ---------------------------------------------------------------------------

def test_pytorch3d_stub_vs_scipy():
    reforacle.add_reference_paths()
    import pytorch3d.transforms as T

    rng = np.random.RandomState(0)
    r = ScipyRot.random(64, random_state=rng)
    mats = r.as_matrix().astype(np.float64)

    # matrix <-> quaternion (scipy is xyzw; stub is wxyz)
    q = T.matrix_to_quaternion(torch.from_numpy(mats)).numpy()
    q_scipy = r.as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(q * q_scipy, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q_scipy, atol=1e-8)
    np.testing.assert_allclose(
        T.quaternion_to_matrix(torch.from_numpy(q)).numpy(), mats, atol=1e-8
    )

    # axis-angle round trip vs scipy rotvec
    aa = r.as_rotvec()
    np.testing.assert_allclose(
        T.axis_angle_to_matrix(torch.from_numpy(aa)).numpy(), mats, atol=1e-8
    )
    aa_back = T.matrix_to_axis_angle(torch.from_numpy(mats)).numpy()
    np.testing.assert_allclose(
        ScipyRot.from_rotvec(aa_back).as_matrix(), mats, atol=1e-8
    )

    # apply / multiply / invert vs scipy
    v = rng.randn(64, 3)
    np.testing.assert_allclose(
        T.quaternion_apply(torch.from_numpy(q), torch.from_numpy(v)).numpy(),
        r.apply(v), atol=1e-8,
    )
    r2 = ScipyRot.random(64, random_state=rng)
    q2 = r2.as_quat()[:, [3, 0, 1, 2]]
    prod = T.quaternion_multiply(torch.from_numpy(q), torch.from_numpy(q2)).numpy()
    np.testing.assert_allclose(
        ScipyRot.from_quat(prod[:, [1, 2, 3, 0]]).as_matrix(),
        (r * r2).as_matrix(), atol=1e-8,
    )
    assert (prod[:, 0] >= 0).all()  # standardized
    inv = T.quaternion_invert(torch.from_numpy(q)).numpy()
    np.testing.assert_allclose(
        ScipyRot.from_quat(inv[:, [1, 2, 3, 0]]).as_matrix(),
        r.inv().as_matrix(), atol=1e-8,
    )

    # rotation_6d round trip
    d6 = T.matrix_to_rotation_6d(torch.from_numpy(mats))
    np.testing.assert_allclose(
        T.rotation_6d_to_matrix(d6).numpy(), mats, atol=1e-8
    )


# ---------------------------------------------------------------------------
# shared Decoder / denoiser vs the real reference modules
# ---------------------------------------------------------------------------

DEC = dict(d_feats=20, d_model=32, n_layers=2, n_head=2, d_k=16, d_v=16)
WINDOW = 12


def _ref_decoder():
    tm = reforacle.import_reference("egoego.model.transformer_module")
    dec = tm.Decoder(
        d_feats=DEC["d_feats"], d_model=DEC["d_model"], n_layers=DEC["n_layers"],
        n_head=DEC["n_head"], d_k=DEC["d_k"], d_v=DEC["d_v"],
        max_timesteps=WINDOW, use_full_attention=True,
    ).eval()
    return dec


def _decoder_params(dec):
    sd = {f"dec.{k}": v.numpy() for k, v in dec.state_dict().items()}
    return {"params": convert_decoder(sd, "dec", DEC["n_layers"])}


def test_reference_decoder_parity():
    dec = _ref_decoder()
    params = _decoder_params(dec)
    model = Decoder(
        d_feats=DEC["d_feats"], d_model=DEC["d_model"], n_layers=DEC["n_layers"],
        n_head=DEC["n_head"], d_k=DEC["d_k"], d_v=DEC["d_v"],
        max_timesteps=WINDOW, use_full_attention=True,
    )

    rng = np.random.RandomState(1)
    x = rng.randn(3, WINDOW, DEC["d_feats"]).astype(np.float32)
    pm = np.ones((3, WINDOW), np.float32)
    pm[2, 8:] = 0.0

    with torch.no_grad():
        ref_out, _ = dec(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(pm)[:, None, :].bool(),
            torch.arange(1, WINDOW + 1)[None, None].repeat(3, 1, 1),
        )
    ours, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(pm),
        make_pos_idx(3, WINDOW),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-5)


def test_reference_decoder_parity_with_obj_embedding():
    dec = _ref_decoder()
    params = _decoder_params(dec)
    model = Decoder(
        d_feats=DEC["d_feats"], d_model=DEC["d_model"], n_layers=DEC["n_layers"],
        n_head=DEC["n_head"], d_k=DEC["d_k"], d_v=DEC["d_v"],
        max_timesteps=WINDOW, use_full_attention=True,
    )
    rng = np.random.RandomState(2)
    t = WINDOW - 1
    x = rng.randn(2, t, DEC["d_feats"]).astype(np.float32)
    obj = rng.randn(2, 1, DEC["d_model"]).astype(np.float32)
    pm = np.ones((2, t + 1), np.float32)

    with torch.no_grad():
        ref_out, _ = dec(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(pm)[:, None, :].bool(),
            torch.arange(1, t + 2)[None, None].repeat(2, 1, 1),
            obj_embedding=torch.from_numpy(obj),
        )
    ours, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(pm), make_pos_idx(2, t + 1),
        obj_embedding=jnp.asarray(obj),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-5)


def test_scrambled_conversion_detected():
    """A converter that mixed up layers must NOT pass the parity check."""
    dec = _ref_decoder()
    params = _decoder_params(dec)
    # scramble: swap w_q and w_k of layer 0
    p0 = params["params"]["layer_0"]["self_attn"]
    p0["w_q"], p0["w_k"] = p0["w_k"], p0["w_q"]
    model = Decoder(
        d_feats=DEC["d_feats"], d_model=DEC["d_model"], n_layers=DEC["n_layers"],
        n_head=DEC["n_head"], d_k=DEC["d_k"], d_v=DEC["d_v"],
        max_timesteps=WINDOW, use_full_attention=True,
    )
    rng = np.random.RandomState(3)
    x = rng.randn(2, WINDOW, DEC["d_feats"]).astype(np.float32)
    pm = np.ones((2, WINDOW), np.float32)
    with torch.no_grad():
        ref_out, _ = dec(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(pm)[:, None, :].bool(),
            torch.arange(1, WINDOW + 1)[None, None].repeat(2, 1, 1),
        )
    ours, _ = model.apply(params, jnp.asarray(x), jnp.asarray(pm), make_pos_idx(2, WINDOW))
    assert np.abs(np.asarray(ours) - ref_out.numpy()).max() > 1e-3


# ---------------------------------------------------------------------------
# diffusion: denoiser, posterior, loss, and the full canonical window chain
# ---------------------------------------------------------------------------

TT = 8          # diffusion timesteps for oracle runs
D_FEATS = 198   # hardcoded in the reference chain (22*3 + 22*6)
SEQ = 31        # window (reference seq_len = max_timesteps - 1)


def _ref_diffusion():
    dm = reforacle.import_reference("egoego.model.transformer_cond_diffusion_model")
    reforacle.patch_smpl_parents()
    ref = dm.CondGaussianDiffusion(
        d_feats=D_FEATS, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
        max_timesteps=SEQ + 1, out_dim=D_FEATS, timesteps=TT,
        objective="pred_x0", loss_type="l1", beta_schedule="cosine",
    ).eval()
    return dm, ref


def _jax_diffusion():
    cfg = DiffusionConfig(
        d_feats=D_FEATS, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
        window=SEQ, timesteps=TT,
    )
    return CondGaussianDiffusion(cfg)


def _shared_params(ref):
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    return convert_denoiser(sd, n_layers=2, prefix="denoise_fn")


def test_reference_denoiser_parity():
    _, ref = _ref_diffusion()
    diff = _jax_diffusion()
    params = _shared_params(ref)

    rng = np.random.RandomState(4)
    src = rng.randn(2, SEQ, 2 * D_FEATS).astype(np.float32)
    t = np.asarray([0, TT - 1])
    with torch.no_grad():
        ref_out = ref.denoise_fn(torch.from_numpy(src), torch.from_numpy(t))
    ours = diff.denoiser.apply(params, jnp.asarray(src), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=2e-5)


def test_reference_p_mean_variance_parity():
    _, ref = _ref_diffusion()
    diff = _jax_diffusion()
    params = _shared_params(ref)

    rng = np.random.RandomState(5)
    x = rng.randn(2, SEQ, D_FEATS).astype(np.float32)
    x_cond = rng.randn(2, SEQ, D_FEATS).astype(np.float32)
    for t_val in (0, 3, TT - 1):
        t = np.full((2,), t_val, np.int64)
        with torch.no_grad():
            ref_mean, _, ref_logvar = ref.p_mean_variance(
                torch.from_numpy(x), torch.from_numpy(t),
                torch.from_numpy(x_cond), clip_denoised=True,
            )
        mean, logvar = diff._p_mean_variance(
            params, jnp.asarray(x), jnp.asarray(t.astype(np.int32)),
            jnp.asarray(x_cond), None,
        )
        np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(logvar), ref_logvar.shape),
            ref_logvar.numpy(), atol=1e-5,
        )


def test_reference_p_losses_parity(monkeypatch):
    """Shared (zero) noise + fixed t: the loss values must agree, including
    the padding-mask multiplication points (:596-603)."""
    _, ref = _ref_diffusion()
    diff = _jax_diffusion()
    params = _shared_params(ref)

    rng = np.random.RandomState(6)
    bs = 2
    x_start = rng.uniform(-1, 1, (bs, SEQ, D_FEATS)).astype(np.float32)
    cond_mask = np.ones((bs, SEQ, D_FEATS), np.float32)
    cond_mask[:, :, 45:48] = 0.0
    pm = np.ones((bs, 1, SEQ + 1), np.float32)
    pm[1, 0, 20:] = 0.0
    t_fixed = np.asarray([1, TT - 2])

    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))
    with torch.no_grad():
        ref_loss = ref.p_losses(
            torch.from_numpy(x_start), torch.from_numpy(cond_mask),
            torch.from_numpy(t_fixed), noise=torch.zeros(bs, SEQ, D_FEATS),
            padding_mask=torch.from_numpy(pm),
        )

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    monkeypatch.setattr(
        jax.random, "randint",
        lambda key, shape, lo, hi, dtype=jnp.int32: jnp.asarray(
            t_fixed, dtype=jnp.int32
        ),
    )
    ours = diff.p_losses(
        params, jax.random.PRNGKey(0), jnp.asarray(x_start),
        jnp.asarray(cond_mask), jnp.asarray(pm),
    )
    np.testing.assert_allclose(float(ours), float(ref_loss), atol=2e-5)


class _DSShim:
    """Stands in for AMASSDataset inside the reference sampling chain:
    min-max stats + fk_smpl built on the reference's OWN quat_fk_torch
    (amass_diffusion_dataset.py:127-143, parents patched to constants)."""

    def __init__(self, ds_mod, transforms, jpos_min, jpos_max, rest_offsets):
        self._ds_mod = ds_mod
        self._transforms = transforms
        self.global_jpos_min = torch.from_numpy(jpos_min).float()[None]  # 1 X 22 X 3
        self.global_jpos_max = torch.from_numpy(jpos_max).float()[None]
        self.rest_human_offsets = torch.from_numpy(rest_offsets).float()[None]

    def normalize_jpos_min_max(self, ori_jpos):
        n = (ori_jpos - self.global_jpos_min.to(ori_jpos.device)) / (
            self.global_jpos_max.to(ori_jpos.device)
            - self.global_jpos_min.to(ori_jpos.device)
        )
        return n * 2 - 1

    def de_normalize_jpos_min_max(self, normalized_jpos):
        n = (normalized_jpos + 1) * 0.5
        return n * (
            self.global_jpos_max.to(normalized_jpos.device)
            - self.global_jpos_min.to(normalized_jpos.device)
        ) + self.global_jpos_min.to(normalized_jpos.device)

    def fk_smpl(self, root_trans, lrot_aa):
        lrot_mat = self._transforms.axis_angle_to_matrix(lrot_aa)
        lpos = self.rest_human_offsets.repeat(lrot_mat.shape[0], 1, 1).to(
            lrot_mat.dtype
        )
        gr, gp = self._ds_mod.quat_fk_torch(lrot_mat, lpos)
        gp = gp + root_trans[:, None, :]
        return gr, gp


def _make_head_traj(rng, bs, t):
    """Smooth synthetic global head trajectory (positions + wxyz quats)."""
    steps = rng.uniform(-0.05, 0.05, (bs, t, 3)).astype(np.float32)
    jpos = np.cumsum(steps, axis=1) + np.asarray([0.2, -0.1, 1.5], np.float32)
    qs = np.zeros((bs, t, 4), np.float32)
    for b in range(bs):
        q = ScipyRot.random(random_state=rng)
        for i in range(t):
            dq = ScipyRot.from_rotvec(rng.uniform(-0.08, 0.08, 3))
            q = dq * q
            qs[b, i] = q.as_quat()[[3, 0, 1, 2]]
    return jpos, qs


def test_reference_sliding_window_chain_golden(monkeypatch):
    """Frame-for-frame parity of the FULL canonical sliding-window sampler
    (p_sample_loop_sliding_window_w_canonical, :330-467) against the
    reference's own implementation: shared converted weights, shared (zero)
    per-step noise, 3 windows (two full + one ragged) with the 10-frame
    overlap inpainted every DDPM step."""
    dm, ref = _ref_diffusion()
    ds_mod = reforacle.patch_smpl_parents()
    import pytorch3d.transforms as transforms

    diff = _jax_diffusion()
    params = _shared_params(ref)

    rng = np.random.RandomState(7)
    jpos_min = rng.uniform(-3.5, -2.5, (22, 3)).astype(np.float32)
    jpos_max = rng.uniform(2.5, 3.5, (22, 3)).astype(np.float32)
    rest_offsets = rng.uniform(-0.25, 0.25, (22, 3)).astype(np.float32)
    rest_offsets[0] = 0.0

    t_total = 60  # windows at t=0 (31), 21 (31), 42 (ragged 18); 63 stops
    head_jpos, head_jquat = _make_head_traj(rng, 1, t_total)

    ds = _DSShim(ds_mod, transforms, jpos_min, jpos_max, rest_offsets)
    cond_mask = np.ones((1, t_total, D_FEATS), np.float32)
    cond_mask[:, :, 15 * 3 : 15 * 3 + 3] = 0.0
    cond_mask[:, :, 66 + 15 * 6 : 66 + 15 * 6 + 6] = 0.0

    # pin every noise draw to zero on BOTH sides: the chain stays fully
    # deterministic while all of its math (denoiser forwards, posterior
    # updates, canonicalization, IK/FK reprojection, stitching) still runs.
    monkeypatch.setattr(
        torch, "randn",
        lambda *s, **k: torch.zeros(
            *s, **{kk: vv for kk, vv in k.items() if kk in ("dtype", "device")}
        ),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))
    with torch.no_grad():
        ref_aa, ref_root = ref.p_sample_loop_sliding_window_w_canonical(
            ds, (1, t_total, D_FEATS),
            torch.from_numpy(head_jpos), torch.from_numpy(head_jquat),
            torch.from_numpy(cond_mask),
        )

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    stats = NormStats(jpos_min=jnp.asarray(jpos_min), jpos_max=jnp.asarray(jpos_max))
    our_aa, our_root = diff.sample_sliding_window_w_canonical(
        params, jax.random.PRNGKey(0),
        jnp.asarray(head_jpos), jnp.asarray(head_jquat),
        stats, jnp.asarray(rest_offsets),
    )

    assert our_aa.shape == tuple(ref_aa.shape) == (1, t_total, 22, 3)
    np.testing.assert_allclose(
        np.asarray(our_root), ref_root.numpy(), atol=5e-4
    )
    # compare rotations as matrices (axis-angle is ambiguous only at the
    # 2-pi wrap; matrices are the canonical state)
    ref_mats = ScipyRot.from_rotvec(
        ref_aa.numpy().reshape(-1, 3)
    ).as_matrix()
    our_mats = ScipyRot.from_rotvec(
        np.asarray(our_aa, np.float64).reshape(-1, 3)
    ).as_matrix()
    np.testing.assert_allclose(our_mats, ref_mats, atol=5e-4)
    # and the axis-angle values themselves
    np.testing.assert_allclose(
        np.asarray(our_aa), ref_aa.numpy(), atol=5e-4
    )


# ---------------------------------------------------------------------------
# HeadFormer (stage-1 HeadNet) vs the real reference module
# ---------------------------------------------------------------------------

HF_OPT = dict(window=8, n_dec_layers=2, n_head=2, d_k=16, d_v=16, d_model=32,
              dist_scale=10.0)


def _ref_headformer():
    hm = reforacle.import_reference("egoego.model.head_estimation_transformer")
    opt = SimpleNamespace(input_of_feats=True, freeze_of_cnn=False, **HF_OPT)
    ref = hm.HeadFormer(opt, device="cpu").eval()
    return hm, ref


def _jax_headformer():
    return hnet.HeadFormer(
        d_model=HF_OPT["d_model"], n_layers=HF_OPT["n_dec_layers"],
        n_head=HF_OPT["n_head"], d_k=HF_OPT["d_k"], d_v=HF_OPT["d_v"],
        window=HF_OPT["window"],
    )


def test_reference_headformer_forward_parity():
    _, ref = _ref_headformer()
    model = _jax_headformer()
    params = convert_headformer(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=2
    )

    rng = np.random.RandomState(8)
    w = HF_OPT["window"]
    of = rng.randn(2, w, 512).astype(np.float32)
    seq_len = np.asarray([w, w - 3], np.float32)
    init_q = ScipyRot.random(2, random_state=rng).as_quat()[:, [3, 0, 1, 2]].astype(np.float32)
    head_pose = np.zeros((2, w, 7), np.float32)
    head_pose[:, 0, 3:] = init_q

    with torch.no_grad():
        ref_pred = ref(
            {
                "of": torch.from_numpy(of),
                "seq_len": torch.from_numpy(seq_len),
                "head_pose": torch.from_numpy(head_pose),
            }
        )
    mask = hnet.padding_mask_from_len(jnp.asarray(seq_len), w)
    va, dist = model.apply(params, jnp.asarray(of), mask)
    np.testing.assert_allclose(
        np.asarray(va), ref_pred["head_va"].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dist), ref_pred["head_dist_scalar"].numpy(), atol=2e-5
    )
    quat = hnet.va2rot(jnp.asarray(init_q), va)
    np.testing.assert_allclose(
        np.asarray(quat), ref_pred["head_rot_quat"].numpy(), atol=2e-5
    )


def test_reference_headformer_forward_for_eval_parity():
    """Blockwise eval with quaternion chaining + SLAM rescale (:214-308) —
    the JAX version batches all blocks but must match frame-for-frame."""
    _, ref = _ref_headformer()
    model = _jax_headformer()
    params = convert_headformer(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=2
    )

    rng = np.random.RandomState(9)
    t_total = 20  # 2 full blocks of 8 + ragged block of 4
    of = rng.randn(1, t_total, 512).astype(np.float32)
    init_q = ScipyRot.random(random_state=rng).as_quat()[[3, 0, 1, 2]].astype(np.float32)
    head_pose = np.zeros((1, t_total, 7), np.float32)
    head_pose[:, 0, 3:] = init_q
    slam_trans = np.cumsum(
        rng.uniform(-0.1, 0.1, (1, t_total, 3)), axis=1
    ).astype(np.float32)
    slam_quat = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (1, t_total, 1))

    with torch.no_grad():
        ref_pred = ref.forward_for_eval(
            {
                "of": torch.from_numpy(of),
                "head_pose": torch.from_numpy(head_pose),
                "aligned_slam_trans": torch.from_numpy(slam_trans),
                "aligned_slam_rot_quat": torch.from_numpy(slam_quat),
            }
        )

    ours = hnet.headformer_forward_for_eval(
        model, params, jnp.asarray(of), jnp.asarray(init_q)[None],
        jnp.asarray(slam_trans[0]), dist_scale=HF_OPT["dist_scale"],
    )
    np.testing.assert_allclose(
        np.asarray(ours["head_pose"]), ref_pred["head_pose"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        float(ours["pred_scale"]), float(ref_pred["pred_scale"]), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# HeadNormalFormer (stage-1 GravityNet) vs the real reference module
# ---------------------------------------------------------------------------

GN_OPT = dict(window=12, n_dec_layers=2, n_head=2, d_k=16, d_v=16, d_model=32)


def _ref_gravitynet():
    gm = reforacle.import_reference("egoego.model.head_normal_estimation_transformer")
    opt = SimpleNamespace(**GN_OPT)
    ref = gm.HeadNormalFormer(opt, device="cpu").eval()
    return gm, ref


def _jax_gravitynet():
    return gnet.HeadNormalFormer(
        d_model=GN_OPT["d_model"], n_layers=GN_OPT["n_dec_layers"],
        n_head=GN_OPT["n_head"], d_k=GN_OPT["d_k"], d_v=GN_OPT["d_v"],
        window=GN_OPT["window"],
    )


def _slam_batch(rng, bs, t_plus_1):
    mats = ScipyRot.random(bs * t_plus_1, random_state=rng).as_matrix()
    mats = mats.reshape(bs, t_plus_1, 3, 3).astype(np.float32)
    trans = np.cumsum(
        rng.uniform(-0.1, 0.1, (bs, t_plus_1, 3)), axis=1
    ).astype(np.float32)
    return mats, trans


@pytest.mark.parametrize("t_plus_1", [13, 10])  # full window and padded
def test_reference_gravitynet_forward_parity(t_plus_1):
    _, ref = _ref_gravitynet()
    model = _jax_gravitynet()
    params = convert_gravitynet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=2
    )
    rng = np.random.RandomState(10)
    mats, trans = _slam_batch(rng, 1, t_plus_1)
    seq_len = np.asarray([t_plus_1], np.float32)

    with torch.no_grad():
        ref_pred = ref(
            {
                "head_rot_mat": torch.from_numpy(mats),
                "head_trans": torch.from_numpy(trans),
                "seq_len": torch.from_numpy(seq_len),
            }
        )
    feats, mask = gnet.prep_gravitynet_input(
        jnp.asarray(mats), jnp.asarray(trans), GN_OPT["window"]
    )
    ours = model.apply(params, feats, mask)
    np.testing.assert_allclose(
        np.asarray(ours), ref_pred["pred_normal"].numpy(), atol=2e-5
    )


def test_reference_gravitynet_forward_for_eval_parity():
    """Full eval transform: gravity-align + rescale + xy-plane Umeyama
    de-heading (:214-294).  The evo dependency is the functional refstub
    (Umeyama), itself covered by tests/test_alignment_heading.py's scipy
    oracles on the JAX side."""
    _, ref = _ref_gravitynet()
    model = _jax_gravitynet()
    params = convert_gravitynet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, n_layers=2
    )
    rng = np.random.RandomState(11)
    t_plus_1 = 13
    mats, trans = _slam_batch(rng, 1, t_plus_1)
    seq_len = np.asarray([t_plus_1], np.float32)
    scale = np.asarray([1.7], np.float32)
    gt_quat = ScipyRot.random(t_plus_1, random_state=rng).as_quat()[:, [3, 0, 1, 2]]
    gt_pose = np.concatenate(
        [
            np.cumsum(rng.uniform(-0.1, 0.1, (t_plus_1, 3)), axis=0),
            gt_quat,
        ],
        axis=-1,
    ).astype(np.float32)[None]

    with torch.no_grad():
        ref_pred = ref.forward_for_eval(
            {
                "head_rot_mat": torch.from_numpy(mats),
                "head_trans": torch.from_numpy(trans),
                "seq_len": torch.from_numpy(seq_len),
                "aligned_scale": torch.from_numpy(scale),
                "ori_head_pose": torch.from_numpy(gt_pose),
            }
        )

    feats, mask = gnet.prep_gravitynet_input(
        jnp.asarray(mats), jnp.asarray(trans), GN_OPT["window"]
    )
    normal = model.apply(params, feats, mask)[0]
    ours = gnet.gravitynet_eval_transform(
        normal, jnp.asarray(mats[0]), jnp.asarray(trans[0]),
        jnp.asarray(scale[0]), jnp.asarray(gt_pose[0]),
    )
    np.testing.assert_allclose(
        np.asarray(ours["head_trans"]), ref_pred["head_trans"][0].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["head_rot_mat"]), ref_pred["head_rot_mat"][0].numpy(),
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# geometry substrate vs the reference's own utilities
# ---------------------------------------------------------------------------

def test_reference_rotate_at_frame_parity():
    lf = reforacle.import_reference("egoego.lafan1.utils")
    rng = np.random.RandomState(12)
    trans = rng.randn(2, 9, 3).astype(np.float32)
    quat = ScipyRot.random(18, random_state=rng).as_quat()[:, [3, 0, 1, 2]]
    quat = quat.reshape(2, 9, 4).astype(np.float32)

    ref_t, ref_q, ref_yrot = lf.rotate_at_frame_smplh(trans, quat, cano_t_idx=0)
    our_t, our_q, our_yrot = heading.rotate_at_frame(
        jnp.asarray(trans), jnp.asarray(quat), cano_t_idx=0
    )
    np.testing.assert_allclose(np.asarray(our_t), ref_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_q), ref_q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_yrot), ref_yrot, atol=1e-5)


def test_reference_quat_ik_fk_parity():
    ds_mod = reforacle.patch_smpl_parents()
    reforacle.add_reference_paths()
    import pytorch3d.transforms as transforms

    rng = np.random.RandomState(13)
    n = 5
    mats = ScipyRot.random(n * 22, random_state=rng).as_matrix()
    lrot_mat = mats.reshape(n, 22, 3, 3).astype(np.float32)
    offsets = rng.uniform(-0.3, 0.3, (22, 3)).astype(np.float32)
    offsets[0] = 0.0
    lpos = np.tile(offsets[None], (n, 1, 1))

    ref_gr, ref_gp = ds_mod.quat_fk_torch(
        torch.from_numpy(lrot_mat), torch.from_numpy(lpos)
    )
    lquat = rot.matrix_to_quat(jnp.asarray(lrot_mat))
    our_gr, our_gp = fk_mod.fk_from_local_quat(lquat, jnp.asarray(offsets))
    np.testing.assert_allclose(np.asarray(our_gp), ref_gp.numpy(), atol=1e-5)
    # quats may differ by sign (the reference standardizes at each level);
    # compare as matrices
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(our_gr)),
        transforms.quaternion_to_matrix(ref_gr).numpy(),
        atol=1e-5,
    )

    # IK: global matrices -> local matrices
    g_mats = transforms.quaternion_to_matrix(ref_gr)
    ref_local = ds_mod.quat_ik_torch(g_mats)
    our_local = rot.quat_to_matrix(
        fk_mod.ik_to_local_quat(rot.matrix_to_quat(jnp.asarray(g_mats.numpy())))
    )
    np.testing.assert_allclose(np.asarray(our_local), ref_local.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# demo dataset on the REAL bundled fixture vs the reference's own loader
# ---------------------------------------------------------------------------

def test_reference_demo_dataset_parity():
    """ARESDemoDataset record-for-record against the reference's own loader
    (egoego/data/ares_demo_dataset.py) on the bundled 140-frame fixture:
    head pose/vels, OF features, and the SLAM attachment (first-frame
    alignment) must all match."""
    from egoego_release_tpu.data.headpose import ARESDemoDataset

    dm = reforacle.import_reference("egoego.data.ares_demo_dataset")
    root = "/root/reference/test_data/ares"
    ref_ds = dm.ARESDemoDataset(root)
    ref_q = ref_ds[0]

    ours_ds = ARESDemoDataset(root)
    assert len(ours_ds) == len(ref_ds) == 1
    our_q = ours_ds[0]

    assert our_q["seq_name"] == ref_q["seq_name"]
    assert our_q["seq_len"] == ref_q["seq_len"]
    np.testing.assert_allclose(our_q["head_pose"], ref_q["head_pose"], atol=1e-6)
    np.testing.assert_allclose(our_q["head_vels"], ref_q["head_vels"], atol=1e-6)
    np.testing.assert_allclose(our_q["of"], ref_q["of"], atol=1e-6)
    np.testing.assert_allclose(
        our_q["ori_slam_trans"], ref_q["ori_slam_trans"], atol=1e-6
    )
    np.testing.assert_allclose(
        our_q["aligned_slam_trans"], ref_q["aligned_slam_trans"], atol=1e-5
    )
    np.testing.assert_allclose(
        our_q["aligned_slam_rot_mat"], ref_q["aligned_slam_rot_mat"], atol=1e-5
    )
    # quats may differ in sign only
    sign = np.sign(np.sum(
        our_q["aligned_slam_rot_quat"] * ref_q["aligned_slam_rot_quat"],
        axis=-1, keepdims=True,
    ))
    np.testing.assert_allclose(
        our_q["aligned_slam_rot_quat"], sign * ref_q["aligned_slam_rot_quat"],
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# SMPL-tensor metric suite vs the reference's own compute_metrics_for_smpl
# ---------------------------------------------------------------------------

def _load_reference_metric_fns():
    """eval_metrics_imu_rec.py builds a MuJoCo env at module import (:42-50),
    so the pure-tensor metric functions are extracted by AST at test time and
    exec'd with their real dependencies (relive.utils.metrics — importable)."""
    import ast

    reforacle.add_reference_paths()
    import sys as _sys

    if "/root/reference/kinpoly" not in _sys.path:
        _sys.path.insert(0, "/root/reference/kinpoly")
    import relive.utils.metrics as ref_metrics

    src = open(
        "/root/reference/kinpoly/scripts/eval_metrics_imu_rec.py"
    ).read()
    tree = ast.parse(src)
    wanted = {
        "compute_accel", "compute_error_accel",
        "compute_foot_sliding_for_smpl", "compute_metrics_for_smpl",
    }
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[],
    )
    from collections import defaultdict

    ns = {
        "np": np, "torch": torch, "defaultdict": defaultdict,
        "get_root_matrix": ref_metrics.get_root_matrix,
        "get_frobenious_norm": ref_metrics.get_frobenious_norm,
        "get_frobenious_norm_rot_only": ref_metrics.get_frobenious_norm_rot_only,
    }
    exec(compile(module, "<reference eval_metrics_imu_rec>", "exec"), ns)
    assert wanted <= set(ns)
    return ns


def test_reference_metric_suite_parity():
    """Every key of compute_metrics_for_smpl (eval_metrics_imu_rec.py:264-342)
    against the reference's own function on random motion."""
    from egoego_release_tpu.eval import metrics as metrics_mod

    ref = _load_reference_metric_fns()
    rng = np.random.RandomState(20)
    t = 16

    def motion(seed):
        r = np.random.RandomState(seed)
        jpos = np.cumsum(r.uniform(-0.05, 0.05, (t, 22, 3)), axis=0).astype(np.float32)
        jpos[:, :, 2] += 0.9
        quat = ScipyRot.random(t * 22, random_state=r).as_quat()[:, [3, 0, 1, 2]]
        return jpos, quat.reshape(t, 22, 4).astype(np.float32)

    gt_jpos, gt_quat = motion(1)
    pred_jpos, pred_quat = motion(2)
    gt_floor, pred_floor = 0.12, 0.07

    ref_md = ref["compute_metrics_for_smpl"](
        torch.from_numpy(gt_quat), torch.from_numpy(gt_jpos), gt_floor,
        torch.from_numpy(pred_quat), torch.from_numpy(pred_jpos), pred_floor,
    )
    our_md = metrics_mod.compute_metrics_for_smpl(
        jnp.asarray(gt_quat), jnp.asarray(gt_jpos), jnp.float32(gt_floor),
        jnp.asarray(pred_quat), jnp.asarray(pred_jpos), jnp.float32(pred_floor),
    )
    for key, ref_val in ref_md.items():
        assert key in our_md, f"missing metric {key}"
        np.testing.assert_allclose(
            np.mean(np.asarray(our_md[key])), np.asarray(ref_val),
            rtol=2e-4, atol=2e-4, err_msg=key,
        )


# ---------------------------------------------------------------------------
# head-velocity features + qpos->SMPL codec vs the reference's own functions
# ---------------------------------------------------------------------------

def test_reference_get_head_vel_parity():
    """ops.geometry.get_head_vel vs the reference's get_head_vel
    (process_amass_dataset.py:111-137, the same function the eval drivers
    import from convert_amass_ego_syn_to_qpos)."""
    from egoego_release_tpu.ops import geometry as G

    ref_mod = reforacle.import_reference("utils.data_utils.process_amass_dataset")
    rng = np.random.RandomState(30)
    t = 12
    trans = np.cumsum(rng.uniform(-0.05, 0.05, (t, 3)), axis=0).astype(np.float32)
    q = ScipyRot.random(random_state=rng)
    quats = []
    for _ in range(t):
        q = ScipyRot.from_rotvec(rng.uniform(-0.2, 0.2, 3)) * q
        quats.append(q.as_quat()[[3, 0, 1, 2]])
    head_pose = np.concatenate([trans, np.asarray(quats, np.float32)], axis=-1)

    ref_vel = ref_mod.get_head_vel(torch.from_numpy(head_pose))
    our_vel = G.get_head_vel(jnp.asarray(head_pose))
    np.testing.assert_allclose(np.asarray(our_vel), ref_vel, atol=2e-4)


def test_reference_qpos_to_smpl_parity():
    """ops.geometry.qpos_to_smpl vs the reference's qpos_to_smpl_data
    (process_kinpoly_qpos2smpl.py:57-93): ZYX-euler -> axis-angle with the
    mujoco->smpl joint permutation; rotations compared as matrices (the
    axis-angle chart is ambiguous only at the 2-pi wrap)."""
    from egoego_release_tpu.ops import geometry as G

    ref_mod = reforacle.import_reference("utils.data_utils.process_kinpoly_qpos2smpl")
    rng = np.random.RandomState(31)
    t = 8
    qpos = np.zeros((t, 76), np.float32)
    qpos[:, :3] = rng.uniform(-1, 1, (t, 3))
    qpos[:, 3:7] = ScipyRot.random(t, random_state=rng).as_quat()[:, [3, 0, 1, 2]]
    qpos[:, 7:] = rng.uniform(-1.2, 1.2, (t, 69))

    ref_trans, ref_poses72 = ref_mod.qpos_to_smpl_data(torch.from_numpy(qpos))
    our_trans, our_aa24 = G.qpos_to_smpl(jnp.asarray(qpos))

    np.testing.assert_allclose(np.asarray(our_trans), ref_trans.numpy(), atol=1e-6)
    ref_aa = ref_poses72.numpy().reshape(t, 24, 3).reshape(-1, 3)
    our_aa = np.asarray(our_aa24, np.float64).reshape(-1, 3)
    np.testing.assert_allclose(
        ScipyRot.from_rotvec(our_aa).as_matrix(),
        ScipyRot.from_rotvec(ref_aa).as_matrix(),
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# qpos metric suite vs the reference's compute_metrics on REAL MuJoCo FK
# ---------------------------------------------------------------------------

def _load_reference_qpos_metric_fns():
    """AST-extract compute_metrics + compute_physcis_metris + the qpos-space
    foot sliding (eval_metrics_imu_rec.py:123-221,344-398) and exec them with
    an env shim backed by REAL MuJoCo 3 (the original builds a mujoco-py env
    at import)."""
    import ast

    mujoco = pytest.importorskip("mujoco")
    reforacle.add_reference_paths()
    import sys as _sys

    if "/root/reference/kinpoly" not in _sys.path:
        _sys.path.insert(0, "/root/reference/kinpoly")
    import relive.utils.metrics as ref_metrics

    from egoego_release_tpu.ops.mujoco_compat import load_humanoid_model

    model = load_humanoid_model(
        "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    )
    data = mujoco.MjData(model)

    name2id = {
        mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, i): i
        for i in range(model.nbody)
    }

    class _DataShim:
        """mujoco-py field names over a modern MjData."""

        def __init__(self, d):
            self._d = d

        @property
        def qpos(self):
            return self._d.qpos

        @property
        def body_xpos(self):
            return self._d.xpos

        @property
        def body_xquat(self):
            return self._d.xquat

    _Shim = SimpleNamespace(
        qpos_lim=76,
        model=SimpleNamespace(_body_name2id=name2id),
        sim=SimpleNamespace(forward=lambda: mujoco.mj_forward(model, data)),
        data=_DataShim(data),
        reset=lambda: mujoco.mj_resetData(model, data),
        get_wbody_pos=lambda: data.xpos[1:].flatten().copy(),
    )

    src = open("/root/reference/kinpoly/scripts/eval_metrics_imu_rec.py").read()
    tree = ast.parse(src)
    wanted = {
        "compute_metrics", "compute_physcis_metris", "get_body_part",
        "compute_foot_sliding", "compute_accel", "compute_error_accel",
        "compute_vel", "compute_error_vel",
    }
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[],
    )
    from collections import defaultdict

    ns = {
        "np": np, "defaultdict": defaultdict, "tqdm": lambda x: x,
        "env": _Shim,
        "get_joint_vels": ref_metrics.get_joint_vels,
        "get_joint_accels": ref_metrics.get_joint_accels,
        "get_root_matrix": ref_metrics.get_root_matrix,
        "get_frobenious_norm": ref_metrics.get_frobenious_norm,
        "get_frobenious_norm_rot_only": ref_metrics.get_frobenious_norm_rot_only,
        "get_mean_dist": ref_metrics.get_mean_dist,
        "get_mean_abs": ref_metrics.get_mean_abs,
    }
    exec(compile(module, "<reference qpos metrics>", "exec"), ns)
    return ns


def test_reference_qpos_metrics_parity():
    """eval/qpos_metrics.compute_metrics_for_qpos_records against the
    reference's own compute_metrics (FK through real MuJoCo) on random
    qpos takes — every aggregated key."""
    from egoego_release_tpu.eval.qpos_metrics import compute_metrics_for_qpos_records
    from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton

    ref = _load_reference_qpos_metric_fns()
    skeleton = load_mujoco_skeleton(
        "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    )

    def take(seed, t=10):
        r = np.random.RandomState(seed)
        def traj():
            qpos = np.zeros((t, 76))
            qpos[:, :2] = np.cumsum(r.uniform(-0.02, 0.02, (t, 2)), 0)
            qpos[:, 2] = 0.92 + r.uniform(-0.01, 0.01, t)
            base = ScipyRot.from_quat([0.7071, 0, 0, 0.7071])  # xyzw upright
            qs = []
            for _ in range(t):
                base = ScipyRot.from_rotvec(r.uniform(-0.02, 0.02, 3)) * base
                qs.append(base.as_quat()[[3, 0, 1, 2]])
            qpos[:, 3:7] = qs
            qpos[:, 7:] = r.uniform(-0.3, 0.3, (t, 69)) \
                + np.cumsum(r.uniform(-0.02, 0.02, (t, 69)), 0)
            return qpos
        qpos_gt = traj()
        qpos_pred = qpos_gt + r.uniform(-0.03, 0.03, qpos_gt.shape)
        qpos_pred[:, 3:7] /= np.linalg.norm(qpos_pred[:, 3:7], axis=1)[:, None]
        # GT head pose from the reference's own FK shim
        _, _, head_pose_gt = ref["compute_physcis_metris"](qpos_gt)
        return {"qpos": qpos_pred, "qpos_gt": qpos_gt,
                "head_pose_gt": head_pose_gt}

    results = {"take_a": take(0), "take_b": take(1)}
    ref_md = ref["compute_metrics"](results, "statear")
    our_md = compute_metrics_for_qpos_records(results, skeleton)

    for key, ref_val in ref_md.items():
        assert key in our_md, f"missing qpos metric {key}"
        np.testing.assert_allclose(
            np.mean(np.asarray(our_md[key])), np.asarray(ref_val),
            rtol=5e-4, atol=5e-4, err_msg=key,
        )


def test_reference_stage1_losses_parity():
    """headformer_loss / gravitynet_loss vs the reference's OWN compute_loss
    methods (bound onto ducks; note the asymmetry the reference ships:
    HeadFormer's position_loss is squared-L2, GravityNet's is L1)."""
    import torch
    from types import SimpleNamespace

    from egoego_release_tpu.models.headnet import headformer_loss, va2rot
    from egoego_release_tpu.models.gravitynet import gravitynet_loss

    hm = reforacle.import_reference("egoego.model.head_estimation_transformer")
    gm = reforacle.import_reference(
        "egoego.model.head_normal_estimation_transformer")

    rng = np.random.RandomState(17)
    b, t = 2, 9

    def rq(n):
        q = rng.randn(n, 4)
        return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    # --- HeadFormer loss (:310-345) ---
    w_rotation, w_va, w_dist, dist_scale = 0.7, 1.3, 0.4, 10.0
    head_va = rng.randn(b, t, 3).astype(np.float32)
    dist_scalar = rng.randn(b, t, 1).astype(np.float32)
    init_quat = rq(b)
    gt_head_pose = np.concatenate(
        [np.cumsum(rng.randn(b, t + 1, 3), 1).astype(np.float32) * 0.05,
         rq(b * (t + 1)).reshape(b, t + 1, 4)], axis=-1)
    gt_head_vels = np.concatenate(
        [rng.randn(b, t + 1, 3), rng.randn(b, t + 1, 3)], axis=-1
    ).astype(np.float32)

    pred_quat = np.asarray(va2rot(jnp.asarray(init_quat), jnp.asarray(head_va)))

    duck = SimpleNamespace(
        opt=SimpleNamespace(w_rotation=w_rotation, w_va=w_va, w_dist=w_dist,
                            dist_scale=dist_scale),
        device="cpu",
        compute_loss=None, get_dist_scalar=None)
    duck.compute_loss = hm.HeadFormer.compute_loss.__get__(duck)
    duck.get_dist_scalar = hm.HeadFormer.get_dist_scalar.__get__(duck)

    feature_pred = {
        "head_va": torch.from_numpy(head_va),
        "head_rot_quat": torch.from_numpy(pred_quat),
        "head_dist_scalar": torch.from_numpy(dist_scalar),
    }
    # the reference slices [:, 1:] of an implicit (B, T+1) quat sequence and
    # reshapes to (B*T); head_va is (B, T)
    data = {
        "head_vels": torch.from_numpy(gt_head_vels[:, :t]),
        "head_pose": torch.from_numpy(gt_head_pose),
    }
    # reference indexes head_pose[:, 1:] for t quats and head_pose[:, :, :3]
    # (T+1 frames) for the dist targets; dist pred covers t... the pred
    # sequence must be (B, T+1, 4) like va2rot emits
    with torch.no_grad():
        ref_loss, ref_orient, ref_va, ref_dist = duck.compute_loss(
            feature_pred, data)

    ours, (o_orient, o_va, o_dist) = headformer_loss(
        jnp.asarray(head_va), jnp.asarray(dist_scalar),
        jnp.asarray(init_quat), jnp.asarray(gt_head_vels[:, :t, 3:]),
        jnp.asarray(gt_head_pose[:, :, 3:]), jnp.asarray(gt_head_pose[:, :, :3]),
        w_rotation=w_rotation, w_va=w_va, w_dist=w_dist,
        dist_scale=dist_scale,
    )
    np.testing.assert_allclose(float(o_va), float(ref_va), rtol=1e-5)
    np.testing.assert_allclose(float(o_orient), float(ref_orient), rtol=1e-5)
    np.testing.assert_allclose(float(o_dist), float(ref_dist), rtol=1e-5)
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)

    # --- GravityNet loss (:334-342): L1 position loss ---
    pred_normal = rng.randn(b, 3).astype(np.float32)
    gt_normal = rng.randn(b, 3, 1).astype(np.float32)
    gduck = SimpleNamespace(device="cpu")
    gduck.compute_loss = gm.HeadNormalFormer.compute_loss.__get__(gduck)
    with torch.no_grad():
        ref_gloss, _ = gduck.compute_loss(
            {"pred_normal": torch.from_numpy(pred_normal)},
            {"floor_normal": torch.from_numpy(gt_normal)})
    ours_g = gravitynet_loss(jnp.asarray(pred_normal),
                             jnp.asarray(gt_normal[..., 0]))
    np.testing.assert_allclose(float(ours_g), float(ref_gloss), rtol=1e-6)
