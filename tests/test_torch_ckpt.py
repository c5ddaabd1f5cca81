"""Checkpoint-conversion parity: a synthetic torch state_dict (reference key
layout) is converted to flax and compared against an independent functional
torch forward implementing the reference semantics (post-LN, 1-based pos
table, prepended noise token, eval-mode dropout).

The REAL reference modules (imported from /root/reference via tests/refstubs)
are used as oracles in tests/test_reference_oracle.py; this file keeps the
independent hand-written oracle as a second, reference-free check plus the
converter plumbing tests."""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.denoiser import TransformerDiffusionModel
from egoego_release_tpu.models.headnet import HeadFormer
from egoego_release_tpu.models.transformer import sinusoid_position_table
from egoego_release_tpu.utils.torch_ckpt import (
    convert_denoiser,
    convert_headformer,
)

D_FEATS, D_MODEL, N_LAYERS, N_HEAD, DK, DV, WINDOW = 10, 16, 2, 2, 8, 8, 6


def rand_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.1
    sd = {
        "denoise_fn.time_mlp.1.weight": r(256, 64),
        "denoise_fn.time_mlp.1.bias": r(256),
        "denoise_fn.time_mlp.3.weight": r(D_MODEL, 256),
        "denoise_fn.time_mlp.3.bias": r(D_MODEL),
        "denoise_fn.motion_transformer.start_conv.weight": r(D_MODEL, 2 * D_FEATS, 1),
        "denoise_fn.motion_transformer.start_conv.bias": r(D_MODEL),
        "denoise_fn.linear_out.weight": r(D_FEATS, D_MODEL),
        "denoise_fn.linear_out.bias": r(D_FEATS),
    }
    for i in range(N_LAYERS):
        p = f"denoise_fn.motion_transformer.layer_stack.{i}"
        sd.update({
            f"{p}.self_attn.w_q.weight": r(N_HEAD * DK, D_MODEL),
            f"{p}.self_attn.w_q.bias": r(N_HEAD * DK),
            f"{p}.self_attn.w_k.weight": r(N_HEAD * DK, D_MODEL),
            f"{p}.self_attn.w_k.bias": r(N_HEAD * DK),
            f"{p}.self_attn.w_v.weight": r(N_HEAD * DV, D_MODEL),
            f"{p}.self_attn.w_v.bias": r(N_HEAD * DV),
            f"{p}.self_attn.fc.weight": r(D_MODEL, N_HEAD * DV),
            f"{p}.self_attn.fc.bias": r(D_MODEL),
            f"{p}.self_attn.layer_norm.weight": torch.ones(D_MODEL) + r(D_MODEL) * 0.1,
            f"{p}.self_attn.layer_norm.bias": r(D_MODEL),
            f"{p}.pos_ffn.w_1.weight": r(D_MODEL, D_MODEL, 1),
            f"{p}.pos_ffn.w_1.bias": r(D_MODEL),
            f"{p}.pos_ffn.w_2.weight": r(D_MODEL, D_MODEL, 1),
            f"{p}.pos_ffn.w_2.bias": r(D_MODEL),
            f"{p}.pos_ffn.layer_norm.weight": torch.ones(D_MODEL) + r(D_MODEL) * 0.1,
            f"{p}.pos_ffn.layer_norm.bias": r(D_MODEL),
        })
    return sd


@torch.no_grad()
def torch_denoiser_oracle(sd, src, noise_t, padding_mask=None):
    """Reference-semantics forward from the raw state_dict."""
    lin = lambda x, k: x @ sd[k + ".weight"].T + sd[k + ".bias"]
    b, t, _ = src.shape

    half = 32
    freq = torch.exp(torch.arange(half).float() * (-math.log(10000.0) / (half - 1)))
    ang = noise_t.float()[:, None] * freq[None]
    emb = torch.cat([ang.sin(), ang.cos()], -1)
    emb = lin(emb, "denoise_fn.time_mlp.1")
    emb = torch.nn.functional.gelu(emb)  # exact erf form
    emb = lin(emb, "denoise_fn.time_mlp.3")

    x = src @ sd["denoise_fn.motion_transformer.start_conv.weight"][..., 0].T \
        + sd["denoise_fn.motion_transformer.start_conv.bias"]
    x = torch.cat([emb[:, None], x], 1)  # (B, T+1, D)

    table = torch.from_numpy(sinusoid_position_table(WINDOW + 2, D_MODEL))
    pos = torch.arange(1, t + 2)
    x = x + table[pos][None]

    if padding_mask is None:
        pm = torch.ones(b, t + 1)
    else:
        pm = padding_mask[:, 0, :]

    for i in range(N_LAYERS):
        p = f"denoise_fn.motion_transformer.layer_stack.{i}"
        res = x
        q = lin(x, f"{p}.self_attn.w_q").view(b, -1, N_HEAD, DK)
        k = lin(x, f"{p}.self_attn.w_k").view(b, -1, N_HEAD, DK)
        v = lin(x, f"{p}.self_attn.w_v").view(b, -1, N_HEAD, DV)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(DK)
        attn = attn.softmax(-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, x.shape[1], -1)
        o = lin(o, f"{p}.self_attn.fc")
        x = torch.nn.functional.layer_norm(
            o + res, (D_MODEL,), sd[f"{p}.self_attn.layer_norm.weight"],
            sd[f"{p}.self_attn.layer_norm.bias"],
        )
        x = x * pm[..., None]
        res = x
        h = torch.relu(x @ sd[f"{p}.pos_ffn.w_1.weight"][..., 0].T + sd[f"{p}.pos_ffn.w_1.bias"])
        h = h @ sd[f"{p}.pos_ffn.w_2.weight"][..., 0].T + sd[f"{p}.pos_ffn.w_2.bias"]
        x = torch.nn.functional.layer_norm(
            h + res, (D_MODEL,), sd[f"{p}.pos_ffn.layer_norm.weight"],
            sd[f"{p}.pos_ffn.layer_norm.bias"],
        )
        x = x * pm[..., None]

    return lin(x[:, 1:], "denoise_fn.linear_out")


def test_denoiser_ckpt_parity():
    sd = rand_sd()
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_denoiser(sd_np, n_layers=N_LAYERS)

    model = TransformerDiffusionModel(
        d_feats=D_FEATS, d_model=D_MODEL, n_dec_layers=N_LAYERS,
        n_head=N_HEAD, d_k=DK, d_v=DV, max_timesteps=WINDOW + 1,
    )
    rng = np.random.RandomState(0)
    src = rng.randn(3, WINDOW, 2 * D_FEATS).astype(np.float32)
    t = np.asarray([0, 500, 999])

    ours = model.apply(params, jnp.asarray(src), jnp.asarray(t))
    oracle = torch_denoiser_oracle(sd, torch.from_numpy(src), torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=2e-5)


def test_denoiser_ckpt_parity_with_padding():
    sd = rand_sd(seed=1)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_denoiser(sd_np, n_layers=N_LAYERS)
    model = TransformerDiffusionModel(
        d_feats=D_FEATS, d_model=D_MODEL, n_dec_layers=N_LAYERS,
        n_head=N_HEAD, d_k=DK, d_v=DV, max_timesteps=WINDOW + 1,
    )
    rng = np.random.RandomState(1)
    src = rng.randn(2, WINDOW, 2 * D_FEATS).astype(np.float32)
    t = np.asarray([3, 7])
    pm = np.ones((2, 1, WINDOW + 1), np.float32)
    pm[1, 0, 4:] = 0.0

    ours = model.apply(params, jnp.asarray(src), jnp.asarray(t), jnp.asarray(pm))
    oracle = torch_denoiser_oracle(
        sd, torch.from_numpy(src), torch.from_numpy(t), torch.from_numpy(pm)
    )
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=2e-5)


def test_headformer_ckpt_roundtrip_structure():
    """HeadFormer conversion produces a tree that apply() accepts."""
    g = torch.Generator().manual_seed(2)
    r = lambda *s: torch.randn(*s, generator=g) * 0.1
    sd = {
        "action_transformer.start_conv.weight": r(D_MODEL, 512, 1),
        "action_transformer.start_conv.bias": r(D_MODEL),
        "action_va_fc.weight": r(3, 8), "action_va_fc.bias": r(3),
        "action_dist_fc.weight": r(1, 8), "action_dist_fc.bias": r(1),
    }
    for m in ("action_va_mlp", "action_dist_mlp"):
        sd[f"{m}.affine_layers.0.weight"] = r(8, D_MODEL)
        sd[f"{m}.affine_layers.0.bias"] = r(8)
    for i in range(N_LAYERS):
        p = f"action_transformer.layer_stack.{i}"
        sd.update({
            f"{p}.self_attn.w_q.weight": r(N_HEAD * DK, D_MODEL),
            f"{p}.self_attn.w_q.bias": r(N_HEAD * DK),
            f"{p}.self_attn.w_k.weight": r(N_HEAD * DK, D_MODEL),
            f"{p}.self_attn.w_k.bias": r(N_HEAD * DK),
            f"{p}.self_attn.w_v.weight": r(N_HEAD * DV, D_MODEL),
            f"{p}.self_attn.w_v.bias": r(N_HEAD * DV),
            f"{p}.self_attn.fc.weight": r(D_MODEL, N_HEAD * DV),
            f"{p}.self_attn.fc.bias": r(D_MODEL),
            f"{p}.self_attn.layer_norm.weight": torch.ones(D_MODEL),
            f"{p}.self_attn.layer_norm.bias": r(D_MODEL),
            f"{p}.pos_ffn.w_1.weight": r(D_MODEL, D_MODEL, 1),
            f"{p}.pos_ffn.w_1.bias": r(D_MODEL),
            f"{p}.pos_ffn.w_2.weight": r(D_MODEL, D_MODEL, 1),
            f"{p}.pos_ffn.w_2.bias": r(D_MODEL),
            f"{p}.pos_ffn.layer_norm.weight": torch.ones(D_MODEL),
            f"{p}.pos_ffn.layer_norm.bias": r(D_MODEL),
        })
    params = convert_headformer({k: v.numpy() for k, v in sd.items()}, n_layers=N_LAYERS)
    model = HeadFormer(d_model=D_MODEL, n_layers=N_LAYERS, n_head=N_HEAD,
                       d_k=DK, d_v=DV, window=WINDOW, mlp_hsize=(8,))
    va, dist = model.apply(
        params, jnp.zeros((1, WINDOW, 512)), jnp.ones((1, WINDOW))
    )
    assert va.shape == (1, WINDOW, 3) and dist.shape == (1, WINDOW, 1)
    assert np.isfinite(np.asarray(va)).all()


def test_torch_ckpt_cli_converts_stage2_to_orbax(tmp_path):
    """python -m egoego_release_tpu.utils.torch_ckpt stage2 <pt> <out>:
    writes an orbax pytree that restores to the converted params."""
    import orbax.checkpoint as ocp

    from egoego_release_tpu.utils import torch_ckpt as tc

    sd = rand_sd()
    pt = tmp_path / "stage2.pt"
    torch.save({"model": sd, "step": 7}, pt)
    out = tmp_path / "orbax_out"
    tc.main(["stage2", str(pt), str(out), "--n_layers", str(N_LAYERS)])

    restored = ocp.PyTreeCheckpointer().restore(str(out))
    assert int(restored["step"]) == 7
    expect = tc.convert_denoiser({k: v.numpy() for k, v in sd.items()},
                                 n_layers=N_LAYERS)
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(restored["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_shape_validation_rejects_wrong_dims():
    """A checkpoint trained at non-release dims (e.g. d_k=64) must be
    rejected with a clear error instead of failing inside apply()."""
    import pytest

    from egoego_release_tpu.utils.torch_ckpt import validate_stage1_shapes

    sd_ok = {
        "action_transformer.layer_stack.0.self_attn.w_q.weight": np.zeros((4 * 256, 256)),
        "action_transformer.layer_stack.0.self_attn.w_v.weight": np.zeros((4 * 256, 256)),
    }
    validate_stage1_shapes(sd_ok, d_model=256, n_head=4, d_k=256, d_v=256)

    sd_bad = {
        "action_transformer.layer_stack.0.self_attn.w_q.weight": np.zeros((4 * 64, 256)),
        "action_transformer.layer_stack.0.self_attn.w_v.weight": np.zeros((4 * 64, 256)),
    }
    with pytest.raises(ValueError, match="d_k=d_v=256"):
        validate_stage1_shapes(sd_bad, d_model=256, n_head=4, d_k=256, d_v=256)


def test_convert_grucell_matches_torch():
    """convert_grucell: the flax GRUCell reproduces torch nn.GRUCell exactly
    (gate relayout + hidden-bias folding) over a rollout."""
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from egoego_release_tpu.utils.torch_ckpt import convert_grucell

    torch.manual_seed(0)
    in_dim, h = 7, 11
    tcell = torch.nn.GRUCell(in_dim, h)
    sd = {f"g.{k}": v.detach().numpy() for k, v in tcell.state_dict().items()}
    params = {"params": convert_grucell(sd, "g")}
    fcell = nn.GRUCell(h)

    rng = np.random.RandomState(0)
    hx_t = torch.zeros(3, h)
    hx_f = jnp.zeros((3, h))
    for t in range(5):
        x = rng.randn(3, in_dim).astype(np.float32)
        with torch.no_grad():
            hx_t = tcell(torch.from_numpy(x), hx_t)
        hx_f, out = fcell.apply(params, hx_f, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), hx_t.numpy(), atol=2e-6,
                                   err_msg=f"step {t}")


def test_relive_rnn_step_and_batch_modes_vs_converted_grucell():
    """The reference's relive/models/rnn.py RNN wrapper ('gru' cell, step
    AND batch modes, plus bi_dir batch) is reproduced by flax GRUCell scans
    with convert_grucell weights — the 'RNN replaced by nn.GRUCell' parity
    claim as a tested fact."""
    import sys

    import numpy as np
    import torch
    import jax.numpy as jnp
    import flax.linen as nn
    import pytest

    sys.path.insert(0, "/root/repo/tests")
    import reforacle

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    import importlib

    rnn_mod = pytest.importorskip("relive.models.rnn")

    torch.manual_seed(1)
    in_dim, h, b, t = 6, 10, 3, 5
    ref = rnn_mod.RNN(in_dim, h, "gru")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from egoego_release_tpu.utils.torch_ckpt import convert_grucell

    params = {"params": convert_grucell(sd, "rnn_f")}
    cell = nn.GRUCell(h)

    rng = np.random.RandomState(2)
    xs = rng.randn(t, b, in_dim).astype(np.float32)

    # step mode
    ref.set_mode("step")
    ref.initialize(batch_size=b)
    hx = jnp.zeros((b, h))
    for i in range(t):
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(xs[i]))
        hx, out = cell.apply(params, hx, jnp.asarray(xs[i]))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=2e-6, err_msg=f"step {i}")

    # batch mode (T, B, in) -> (T, B, H)
    ref.set_mode("batch")
    with torch.no_grad():
        ref_seq = ref(torch.from_numpy(xs))
    hx = jnp.zeros((b, h))
    outs = []
    for i in range(t):
        hx, out = cell.apply(params, hx, jnp.asarray(xs[i]))
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.stack(outs), ref_seq.numpy(), atol=2e-6)

    # bi_dir batch mode (posereg backbones): forward + reversed halves
    ref2 = rnn_mod.RNN(in_dim, h, "gru", bi_dir=True)
    sd2 = {k: v.detach().numpy() for k, v in ref2.state_dict().items()}
    pf = {"params": convert_grucell(sd2, "rnn_f")}
    pb = {"params": convert_grucell(sd2, "rnn_b")}
    half = nn.GRUCell(h // 2)
    with torch.no_grad():
        ref_bi = ref2(torch.from_numpy(xs))
    hf = jnp.zeros((b, h // 2))
    f_outs = []
    for i in range(t):
        hf, out = half.apply(pf, hf, jnp.asarray(xs[i]))
        f_outs.append(np.asarray(out))
    hb = jnp.zeros((b, h // 2))
    b_outs = [None] * t
    for i in reversed(range(t)):
        hb, out = half.apply(pb, hb, jnp.asarray(xs[i]))
        b_outs[i] = np.asarray(out)
    ours_bi = np.concatenate([np.stack(f_outs), np.stack(b_outs)], axis=-1)
    np.testing.assert_allclose(ours_bi, ref_bi.numpy(), atol=2e-6)
