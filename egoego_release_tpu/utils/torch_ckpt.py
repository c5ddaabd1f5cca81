"""Torch checkpoint -> flax parameter conversion.

Ingests the reference's released state_dict pickles so TPU inference runs
with the exact released weights:
  * stage2_diffusion_4.pt       {step, model, ema, scaler}
                                (trainer_amass_cond_motion_diffusion.py:99-106)
  * stage1_headnet_*.pt         {epoch, transformer_encoder_state_dict, ...}
                                (trainer_head_estimation.py:206-212)
  * stage1_gravitynet_2000.pt   same schema

Key layout conventions converted:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out): transpose
  torch Conv1d k=1 weight (out, in, 1) -> squeeze + transpose
  torch LayerNorm weight/bias          -> flax scale/bias
  layer_stack.{i}                      -> layer_{i}
  MLP affine_layers.{i}                -> affine_{i}
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_torch_state_dict(path: str) -> dict:
    """torch.load a checkpoint on CPU and convert all tensors to numpy."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if torch.is_tensor(x):
            return x.detach().numpy()
        return x

    return to_np(data)


def _dense(sd, key):
    return {
        "kernel": jnp.asarray(np.asarray(sd[key + ".weight"]).T),
        "bias": jnp.asarray(sd[key + ".bias"]),
    }


def _conv1d(sd, key):
    w = np.asarray(sd[key + ".weight"])  # (out, in, 1)
    return {
        "kernel": jnp.asarray(w[..., 0].T),
        "bias": jnp.asarray(sd[key + ".bias"]),
    }


def _layernorm(sd, key):
    return {
        "scale": jnp.asarray(sd[key + ".weight"]),
        "bias": jnp.asarray(sd[key + ".bias"]),
    }


def count_decoder_layers(sd: dict, prefix: str) -> int:
    """Number of layer_stack entries in a Decoder state-dict subtree."""
    i = 0
    while f"{prefix}.layer_stack.{i}.self_attn.w_q.weight" in sd:
        i += 1
    return i


def convert_decoder(sd: dict, prefix: str, n_layers: int) -> dict:
    """Decoder (transformer_module.py:172) subtree -> flax params.

    Refuses a layer-count mismatch instead of silently dropping trained
    layers (or crashing on a missing key)."""
    found = count_decoder_layers(sd, prefix)
    if found != n_layers:
        raise ValueError(
            f"decoder layer-count mismatch at {prefix!r}: checkpoint has "
            f"{found} layers, target module expects {n_layers} "
            "(pass the matching n_layers / *_n_dec_layers)"
        )
    out = {"start_conv": _conv1d(sd, f"{prefix}.start_conv")}
    for i in range(n_layers):
        lp = f"{prefix}.layer_stack.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {
                "w_q": _dense(sd, f"{lp}.self_attn.w_q"),
                "w_k": _dense(sd, f"{lp}.self_attn.w_k"),
                "w_v": _dense(sd, f"{lp}.self_attn.w_v"),
                "fc": _dense(sd, f"{lp}.self_attn.fc"),
                "layer_norm": _layernorm(sd, f"{lp}.self_attn.layer_norm"),
            },
            "pos_ffn": {
                "w_1": _conv1d(sd, f"{lp}.pos_ffn.w_1"),
                "w_2": _conv1d(sd, f"{lp}.pos_ffn.w_2"),
                "layer_norm": _layernorm(sd, f"{lp}.pos_ffn.layer_norm"),
            },
        }
    return out


def _mlp(sd: dict, prefix: str) -> dict:
    out = {}
    i = 0
    while f"{prefix}.affine_layers.{i}.weight" in sd:
        out[f"affine_{i}"] = _dense(sd, f"{prefix}.affine_layers.{i}")
        i += 1
    return out


def convert_denoiser(sd: dict, n_layers: int = 4, prefix: str = "denoise_fn") -> dict:
    """TransformerDiffusionModel state dict -> flax params for
    models.denoiser.TransformerDiffusionModel."""
    p = prefix + "." if prefix else ""
    return {
        "params": {
            "time_mlp_1": _dense(sd, f"{p}time_mlp.1"),
            "time_mlp_2": _dense(sd, f"{p}time_mlp.3"),
            "motion_transformer": convert_decoder(sd, f"{p}motion_transformer", n_layers),
            "linear_out": _dense(sd, f"{p}linear_out"),
        }
    }


def convert_headformer(sd: dict, n_layers: int = 2) -> dict:
    """HeadFormer state dict (head_estimation_transformer.py:50-95) ->
    flax params for models.headnet.HeadFormer."""
    return {
        "params": {
            "action_transformer": convert_decoder(sd, "action_transformer", n_layers),
            "action_va_mlp": _mlp(sd, "action_va_mlp"),
            "action_va_fc": _dense(sd, "action_va_fc"),
            "action_dist_mlp": _mlp(sd, "action_dist_mlp"),
            "action_dist_fc": _dense(sd, "action_dist_fc"),
        }
    }


def convert_gravitynet(sd: dict, n_layers: int = 2) -> dict:
    """HeadNormalFormer state dict -> flax params for
    models.gravitynet.HeadNormalFormer."""
    return {
        "params": {
            "action_transformer": convert_decoder(sd, "action_transformer", n_layers),
            "action_normal_mlp": _mlp(sd, "action_normal_mlp"),
            "action_normal_fc": _dense(sd, "action_normal_fc"),
        }
    }


def load_stage2_diffusion_ckpt(path: str, n_layers: int = 4, use_ema: bool = True):
    """stage2_diffusion_*.pt -> (flax denoiser params, step).

    The reference samples with the EMA weights (trainer:254,268 use
    ema.ema_model); ema-pytorch stores them under 'ema_model.'."""
    ckpt = load_torch_state_dict(path)
    if use_ema and "ema" in ckpt:
        sd = {
            k[len("ema_model."):]: v
            for k, v in ckpt["ema"].items()
            if k.startswith("ema_model.")
        }
        if sd:
            return convert_denoiser(sd, n_layers), ckpt.get("step", 0)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    return convert_denoiser(sd, n_layers), ckpt.get("step", 0)


def validate_stage1_shapes(sd: dict, d_model: int, n_head: int, d_k: int,
                           d_v: int) -> None:
    """Assert a stage-1 state_dict matches the target module dims before
    conversion — catches the train/eval config divergence where a model was
    built with non-release d_k/d_v (release = 256; trainer_head_estimation.py
    :259-260) and would otherwise fail deep inside apply() with an opaque
    shape error."""
    wq = np.asarray(sd["action_transformer.layer_stack.0.self_attn.w_q.weight"])
    wv = np.asarray(sd["action_transformer.layer_stack.0.self_attn.w_v.weight"])
    expect_q = (n_head * d_k, d_model)
    expect_v = (n_head * d_v, d_model)
    if wq.shape != expect_q or wv.shape != expect_v:
        raise ValueError(
            f"stage-1 checkpoint dims mismatch: w_q {wq.shape} vs expected "
            f"{expect_q}, w_v {wv.shape} vs expected {expect_v} "
            f"(d_model={d_model}, n_head={n_head}, d_k={d_k}, d_v={d_v}); "
            "the release config uses d_k=d_v=256"
        )


def load_stage1_ckpt(path: str, kind: str, n_layers: int = 2, *,
                     d_model: int = 256, n_head: int = 4, d_k: int = 256,
                     d_v: int = 256):
    """stage1_headnet_*.pt / stage1_gravitynet_*.pt -> flax params.

    Validates the checkpoint layout against the target module dims (release
    defaults) before converting."""
    ckpt = load_torch_state_dict(path)
    sd = ckpt.get("transformer_encoder_state_dict", ckpt)
    validate_stage1_shapes(sd, d_model, n_head, d_k, d_v)
    if kind == "headnet":
        return convert_headformer(sd, n_layers)
    if kind == "gravitynet":
        return convert_gravitynet(sd, n_layers)
    raise ValueError(kind)


def convert_grucell(sd: dict, prefix: str) -> dict:
    """torch nn.GRUCell -> flax nn.GRUCell params.

    torch gates stack [r; z; n] in weight_ih (3H, in) / weight_hh (3H, H)
    with separate input/hidden biases; flax's r/z hidden denses carry no
    bias (r = sigma(W_ir x + b + W_hr h)), so the torch hidden biases for
    r/z fold into the input biases — exact because they add linearly.  The
    n gate keeps both biases (flax: n = tanh(W_in x + b_in + r*(W_hn h +
    b_hn)), matching torch).  Covers the reference's khrylib/relive RNN
    wrappers (relive/models/rnn.py: rnn_f = nn.GRUCell).
    """
    import numpy as np

    w_ih = np.asarray(sd[f"{prefix}.weight_ih"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh"])
    b_ih = np.asarray(sd.get(f"{prefix}.bias_ih", 0.0 * w_ih[:, 0]))
    b_hh = np.asarray(sd.get(f"{prefix}.bias_hh", 0.0 * w_hh[:, 0]))
    h = w_hh.shape[1]

    def seg(a, i):
        return a[i * h:(i + 1) * h]

    return {
        "ir": {"kernel": seg(w_ih, 0).T, "bias": seg(b_ih, 0) + seg(b_hh, 0)},
        "iz": {"kernel": seg(w_ih, 1).T, "bias": seg(b_ih, 1) + seg(b_hh, 1)},
        "in": {"kernel": seg(w_ih, 2).T, "bias": seg(b_ih, 2)},
        "hr": {"kernel": seg(w_hh, 0).T},
        "hz": {"kernel": seg(w_hh, 1).T},
        "hn": {"kernel": seg(w_hh, 2).T, "bias": seg(b_hh, 2)},
    }


def main(argv=None):
    """Convert a released torch checkpoint to an orbax pytree on disk.

    python -m egoego_release_tpu.utils.torch_ckpt stage2 stage2_diffusion_4.pt out/
    python -m egoego_release_tpu.utils.torch_ckpt headnet stage1_headnet_ares_250.pt out/

    (The eval CLIs also accept the torch .pt files directly — this exists
    for users who want a pure-JAX artifact, e.g. to serve without torch.)
    """
    import argparse
    import os

    import jax
    import orbax.checkpoint as ocp

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("kind", choices=["stage2", "headnet", "gravitynet"])
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--n_layers", type=int, default=None)
    p.add_argument("--no_ema", action="store_true",
                   help="stage2: convert the raw model weights, not the EMA")
    a = p.parse_args(argv)

    if a.kind == "stage2":
        params, step = load_stage2_diffusion_ckpt(
            a.torch_ckpt, n_layers=a.n_layers or 4, use_ema=not a.no_ema
        )
    else:
        params = load_stage1_ckpt(a.torch_ckpt, a.kind,
                                  n_layers=a.n_layers or 2)
        step = 0
    n = sum(x.size for x in jax.tree.leaves(params))
    path = os.path.abspath(a.out_dir)
    ocp.PyTreeCheckpointer().save(
        path, {"model": params, "step": int(step)}, force=True
    )
    print(f"{a.kind}: {n:,} params (step {int(step)}) -> {path}")


if __name__ == "__main__":
    main()
