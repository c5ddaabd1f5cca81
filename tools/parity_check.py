"""Checkpoint-level numerical parity harness — REAL comparison.

Loads a torch state_dict into the reference's OWN modules
(/root/reference/egoego/model/*, imported via tests/refstubs for the absent
pytorch3d/torchvision/evo deps), converts the same state_dict with
egoego_release_tpu.utils.torch_ckpt, and compares the two forwards on shared
random inputs — including per-layer intermediate activations (torch forward
hooks vs flax capture_intermediates).  Exits nonzero on any mismatch, so a
conversion that scrambled layers FAILS (see
tests/test_reference_oracle.py::test_scrambled_conversion_detected for the
covering unit test).

Usage:
  python tools/parity_check.py --selftest
      # random-init reference modules at FULL release dims; proves the
      # converter + flax forwards without needing the licensed checkpoints
  python tools/parity_check.py --diffusion_ckpt pretrained_models/stage2_diffusion_4.pt
  python tools/parity_check.py --headnet_ckpt pretrained_models/stage1_headnet_ares_250.pt
  python tools/parity_check.py --gravitynet_ckpt pretrained_models/stage1_gravitynet_2000.pt
"""

from __future__ import annotations

import argparse
import os
import sys
from types import SimpleNamespace

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import reforacle  # noqa: E402

ATOL = 5e-4  # full-dim f32 accumulation across 4 layers at d_model 512


def _compare(name: str, ours: np.ndarray, ref: np.ndarray, atol: float = ATOL) -> bool:
    diff = float(np.abs(np.asarray(ours, np.float64) - np.asarray(ref, np.float64)).max())
    ok = diff <= atol and np.isfinite(ours).all()
    print(f"  {'PASS' if ok else 'FAIL'}  {name:<40s} max|diff| = {diff:.3e}")
    return ok


def _layer_outputs_torch(decoder, x_t, pm_t, pos_t, obj=None):
    """Run the reference Decoder capturing each DecoderLayer output."""
    import torch

    captured = []
    hooks = [
        layer.register_forward_hook(lambda m, i, o: captured.append(o[0].detach()))
        for layer in decoder.layer_stack
    ]
    with torch.no_grad():
        out, _ = decoder(x_t, pm_t, pos_t, obj_embedding=obj)
    for h in hooks:
        h.remove()
    return out, captured


def _layer_outputs_flax(model, params, x, pm, pos, obj=None):
    import jax.numpy as jnp  # noqa: F401

    (out, _), state = model.apply(
        params, x, pm, pos, obj_embedding=obj, capture_intermediates=True
    )
    inter = state["intermediates"]
    layers = []
    i = 0
    while f"layer_{i}" in inter:
        layers.append(np.asarray(inter[f"layer_{i}"]["__call__"][0][0]))
        i += 1
    return out, layers


def check_decoder_parity(ref_decoder, flax_decoder, params, d_feats, window,
                         obj_dim=None, label="decoder") -> bool:
    """Layerwise + output parity of one Decoder pair on shared inputs."""
    import torch
    import jax.numpy as jnp

    from egoego_release_tpu.models.transformer import make_pos_idx

    rng = np.random.RandomState(0)
    bs = 2
    x = rng.randn(bs, window, d_feats).astype(np.float32)
    t_total = window + (1 if obj_dim else 0)
    pm = np.ones((bs, t_total), np.float32)
    pm[1, t_total - 3 :] = 0.0
    obj = rng.randn(bs, 1, obj_dim).astype(np.float32) if obj_dim else None

    ref_out, ref_layers = _layer_outputs_torch(
        ref_decoder.eval(),
        torch.from_numpy(x).transpose(1, 2),
        torch.from_numpy(pm)[:, None, :].bool(),
        torch.arange(1, t_total + 1)[None, None].repeat(bs, 1, 1),
        obj=torch.from_numpy(obj) if obj is not None else None,
    )
    our_out, our_layers = _layer_outputs_flax(
        flax_decoder, params, jnp.asarray(x), jnp.asarray(pm),
        make_pos_idx(bs, t_total),
        obj=jnp.asarray(obj) if obj is not None else None,
    )

    ok = True
    assert len(ref_layers) == len(our_layers), "layer count mismatch"
    for i, (r, o) in enumerate(zip(ref_layers, our_layers)):
        ok &= _compare(f"{label}.layer_{i}", o, r.numpy())
    ok &= _compare(f"{label}.output", np.asarray(our_out), ref_out.numpy())
    return ok


def check_diffusion(path: str | None) -> bool:
    """Stage-2 denoiser parity at full release dims
    (trainer_amass_cond_motion_diffusion.py:399-403)."""
    import torch
    import jax.numpy as jnp

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.utils.torch_ckpt import convert_denoiser, load_torch_state_dict

    print("== stage-2 diffusion denoiser (d_model 512, 4 layers, d_k=d_v=256) ==")
    dm = reforacle.import_reference("egoego.model.transformer_cond_diffusion_model")
    reforacle.patch_smpl_parents()
    ref = dm.CondGaussianDiffusion(
        d_feats=198, d_model=512, n_head=4, n_dec_layers=4, d_k=256, d_v=256,
        max_timesteps=121, out_dim=198, timesteps=1000,
        objective="pred_x0", beta_schedule="cosine",
    ).eval()

    if path:
        ckpt = load_torch_state_dict(path)
        sd_np = (
            {k[len("ema_model."):]: v for k, v in ckpt["ema"].items()
             if k.startswith("ema_model.")}
            if "ema" in ckpt else ckpt["model"]
        )
        missing = ref.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()},
            strict=False,
        )
        print(f"  loaded {path} (step {ckpt.get('step', '?')}); "
              f"missing={len(missing.missing_keys)} unexpected={len(missing.unexpected_keys)}")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_denoiser(sd, n_layers=4, prefix="denoise_fn")

    diff = CondGaussianDiffusion(DiffusionConfig())
    rng = np.random.RandomState(1)
    src = rng.randn(2, 120, 2 * 198).astype(np.float32)
    t = np.asarray([7, 900])
    with torch.no_grad():
        ref_out = ref.denoise_fn(torch.from_numpy(src), torch.from_numpy(t))
    ours = diff.denoiser.apply(params, jnp.asarray(src), jnp.asarray(t))
    ok = _compare("denoiser.forward", np.asarray(ours), ref_out.numpy())

    # the fused Pallas decoder-layer path (ops/fused_layer.py) must match the
    # reference too — same params pytree, interpret mode + f32 on host
    from egoego_release_tpu.ops.fused_layer import fused_denoiser_apply

    fused = fused_denoiser_apply(
        params, jnp.asarray(src), jnp.asarray(t), None,
        cfg=diff.cfg, interpret=True, compute_dtype=jnp.float32,
    )
    ok &= _compare("denoiser.forward (fused pallas)", np.asarray(fused),
                   ref_out.numpy())

    # layerwise decoder comparison inside the denoiser
    from egoego_release_tpu.models.transformer import Decoder
    from egoego_release_tpu.utils.torch_ckpt import convert_decoder

    dec_sd = {f"d.{k[len('denoise_fn.motion_transformer.'):]}": v
              for k, v in sd.items()
              if k.startswith("denoise_fn.motion_transformer.")}
    dec_params = {"params": convert_decoder(dec_sd, "d", 4)}
    flax_dec = Decoder(d_feats=396, d_model=512, n_layers=4, n_head=4,
                       d_k=256, d_v=256, max_timesteps=121, use_full_attention=True)
    ok &= check_decoder_parity(
        ref.denoise_fn.motion_transformer, flax_dec, dec_params,
        d_feats=396, window=120, obj_dim=512, label="motion_transformer",
    )
    return ok


def check_headnet(path: str | None) -> bool:
    """HeadFormer parity at release dims (trainer_head_estimation.py:259-260:
    d_model 256, 2 layers, d_k=d_v=256, window 60)."""
    import torch
    import jax.numpy as jnp

    from egoego_release_tpu.models import headnet as hnet
    from egoego_release_tpu.utils.torch_ckpt import convert_headformer, load_torch_state_dict

    print("== stage-1 HeadNet (d_model 256, 2 layers, d_k=d_v=256) ==")
    hm = reforacle.import_reference("egoego.model.head_estimation_transformer")
    opt = SimpleNamespace(window=60, input_of_feats=True, freeze_of_cnn=False,
                          n_dec_layers=2, n_head=4, d_k=256, d_v=256,
                          d_model=256, dist_scale=10.0)
    ref = hm.HeadFormer(opt, device="cpu").eval()
    if path:
        ckpt = load_torch_state_dict(path)
        sd_np = ckpt.get("transformer_encoder_state_dict", ckpt)
        ref.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
        )
        print(f"  loaded {path} (epoch {ckpt.get('epoch', '?')})")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_headformer(sd, n_layers=2)
    model = hnet.HeadFormer()  # release defaults

    rng = np.random.RandomState(2)
    of = rng.randn(2, 60, 512).astype(np.float32)
    seq_len = np.asarray([60, 44], np.float32)
    with torch.no_grad():
        init_q = torch.tensor([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]])
        head_pose = torch.zeros(2, 60, 7)
        head_pose[:, 0, 3:] = init_q
        ref_pred = ref({"of": torch.from_numpy(of),
                        "seq_len": torch.from_numpy(seq_len),
                        "head_pose": head_pose})
    mask = hnet.padding_mask_from_len(jnp.asarray(seq_len), 60)
    va, dist = model.apply(params, jnp.asarray(of), mask)
    ok = _compare("headnet.head_va", np.asarray(va), ref_pred["head_va"].numpy())
    ok &= _compare("headnet.dist_scalar", np.asarray(dist),
                   ref_pred["head_dist_scalar"].numpy())
    quat = hnet.va2rot(jnp.asarray(init_q.numpy()), va)
    ok &= _compare("headnet.rot_quat(va2rot)", np.asarray(quat),
                   ref_pred["head_rot_quat"].numpy())
    return ok


def check_gravitynet(path: str | None) -> bool:
    """HeadNormalFormer parity at release dims (d_model 256, 2 layers,
    window 120; eval_egoego.py:662-663)."""
    import torch
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as ScipyRot

    from egoego_release_tpu.models import gravitynet as gnet
    from egoego_release_tpu.utils.torch_ckpt import convert_gravitynet, load_torch_state_dict

    print("== stage-1 GravityNet (d_model 256, 2 layers, d_k=d_v=256) ==")
    gm = reforacle.import_reference("egoego.model.head_normal_estimation_transformer")
    opt = SimpleNamespace(window=120, n_dec_layers=2, n_head=4, d_k=256,
                          d_v=256, d_model=256)
    ref = gm.HeadNormalFormer(opt, device="cpu").eval()
    if path:
        ckpt = load_torch_state_dict(path)
        sd_np = ckpt.get("transformer_encoder_state_dict", ckpt)
        ref.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
        )
        print(f"  loaded {path} (epoch {ckpt.get('epoch', '?')})")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_gravitynet(sd, n_layers=2)
    model = gnet.HeadNormalFormer()  # release defaults

    rng = np.random.RandomState(3)
    t_plus_1 = 121
    mats = ScipyRot.random(t_plus_1, random_state=rng).as_matrix()[None].astype(np.float32)
    trans = np.cumsum(rng.uniform(-0.05, 0.05, (1, t_plus_1, 3)), axis=1).astype(np.float32)
    with torch.no_grad():
        ref_pred = ref({"head_rot_mat": torch.from_numpy(mats),
                        "head_trans": torch.from_numpy(trans),
                        "seq_len": torch.tensor([float(t_plus_1)])})
    feats, mask = gnet.prep_gravitynet_input(jnp.asarray(mats), jnp.asarray(trans), 120)
    ours = model.apply(params, feats, mask)
    return _compare("gravitynet.pred_normal", np.asarray(ours),
                    ref_pred["pred_normal"].numpy())


def check_pwcnet() -> bool:
    """PWC-DC net parity on a random-init reference module (the reference
    ships no PWC weights; conversion parity defines the contract)."""
    import torch

    from egoego_release_tpu.models.pwcnet import convert_pwcnet, pwcnet_forward

    print("== PWC-DC optical-flow net (random init, 64x64) ==")
    if not hasattr(torch.nn.init, "kaiming_normal"):
        torch.nn.init.kaiming_normal = torch.nn.init.kaiming_normal_
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        reforacle.add_reference_paths()
        if "/root/reference/kinpoly" not in sys.path:
            sys.path.insert(0, "/root/reference/kinpoly")
        import importlib

        pw = importlib.import_module("relive.data_process.PWCNet")
        torch.manual_seed(0)
        ref = pw.PWCDCNet().eval()
        params = convert_pwcnet(
            {k: v.numpy() for k, v in ref.state_dict().items()})
        rng = np.random.RandomState(5)
        im = rng.rand(1, 64, 64, 6).astype(np.float32)
        with torch.no_grad():
            ref_flow = ref(torch.from_numpy(im.transpose(0, 3, 1, 2)))
        ours = pwcnet_forward(params, im[..., :3], im[..., 3:])
    finally:
        torch.Tensor.cuda = orig_cuda
    return _compare("pwcnet.flow2", np.asarray(ours),
                    ref_flow.numpy().transpose(0, 2, 3, 1), atol=5e-4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--diffusion_ckpt", default=None)
    p.add_argument("--headnet_ckpt", default=None)
    p.add_argument("--gravitynet_ckpt", default=None)
    p.add_argument("--selftest", action="store_true",
                   help="run all checks on random-init reference modules")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # deterministic host math

    ok = True
    any_run = False
    if args.selftest or args.diffusion_ckpt:
        ok &= check_diffusion(args.diffusion_ckpt)
        any_run = True
    if args.selftest or args.headnet_ckpt:
        ok &= check_headnet(args.headnet_ckpt)
        any_run = True
    if args.selftest or args.gravitynet_ckpt:
        ok &= check_gravitynet(args.gravitynet_ckpt)
        any_run = True
    if args.selftest:
        ok &= check_pwcnet()
    if not any_run:
        p.error("nothing to check: pass --selftest or a checkpoint path")
    print("OVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
