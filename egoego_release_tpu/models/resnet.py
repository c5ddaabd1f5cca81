"""ResNet-18 optical-flow feature encoder.

Port of egoego/model/resnet.py (torchvision resnet18 with the fc replaced by
a 512-d projection) and the FeatureExtractor wrapper that pads 2-channel
flow to 3 channels at 224x224.  Used by the `input_of_feats=False` HeadNet
path and by the offline feature-extraction CLI
(kinpoly/scripts/extract_of_feats.py).

Includes a torchvision state_dict converter so pretrained torch weights can
be ingested (the reference initializes from torchvision `pretrained=True`).
BatchNorm runs in inference mode with stored statistics (running_stats=False
in the reference means frozen stats too).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Input NHWC (B, 224, 224, 3) -> (B, out_dim)."""

    out_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (filters, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]
        ):
            x = BasicBlock(filters, stride, name=f"layer{stage+1}_0")(x, train)
            x = BasicBlock(filters, 1, name=f"layer{stage+1}_1")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.out_dim, name="fc")(x)


def flow_to_input(flow: Array) -> Array:
    """(B, H, W, 2) optical flow -> (B, H, W, 3): zero-pad the channel
    (egoego/model/head_estimation_transformer.py:135-141 semantics; the
    reference always feeds 224x224, but the network is fully convolutional
    so any size works)."""
    b, h, w, _ = flow.shape
    pad = jnp.zeros((b, h, w, 1), flow.dtype)
    return jnp.concatenate([flow, pad], axis=-1)


def convert_torchvision_resnet18(sd: dict, out_dim: int = 512) -> dict:
    """torchvision resnet18 state_dict (numpy values) -> flax variables.

    Conv weight (out, in, kh, kw) -> (kh, kw, in, out); fc transposed.
    Returns {'params': ..., 'batch_stats': ...}.
    """
    conv = lambda k: jnp.asarray(np.transpose(sd[k], (2, 3, 1, 0)))
    params: dict = {}
    stats: dict = {}

    def bn(dst_p, dst_s, key):
        dst_p["scale"] = jnp.asarray(sd[key + ".weight"])
        dst_p["bias"] = jnp.asarray(sd[key + ".bias"])
        dst_s["mean"] = jnp.asarray(sd[key + ".running_mean"])
        dst_s["var"] = jnp.asarray(sd[key + ".running_var"])

    params["conv1"] = {"kernel": conv("conv1.weight")}
    params["bn1"], stats["bn1"] = {}, {}
    bn(params["bn1"], stats["bn1"], "bn1")

    for stage in range(1, 5):
        for blk in range(2):
            name = f"layer{stage}_{blk}"
            src = f"layer{stage}.{blk}"
            p: dict = {
                "conv1": {"kernel": conv(f"{src}.conv1.weight")},
                "conv2": {"kernel": conv(f"{src}.conv2.weight")},
                "bn1": {}, "bn2": {},
            }
            s: dict = {"bn1": {}, "bn2": {}}
            bn(p["bn1"], s["bn1"], f"{src}.bn1")
            bn(p["bn2"], s["bn2"], f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": conv(f"{src}.downsample.0.weight")}
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                bn(p["downsample_bn"], s["downsample_bn"], f"{src}.downsample.1")
            params[name], stats[name] = p, s

    if "fc.weight" in sd and sd["fc.weight"].shape[0] == out_dim:
        params["fc"] = {
            "kernel": jnp.asarray(np.asarray(sd["fc.weight"]).T),
            "bias": jnp.asarray(sd["fc.bias"]),
        }
    else:
        # reference replaces the classifier fc with a fresh Linear(512, out)
        rng = np.random.RandomState(0)
        params["fc"] = {
            "kernel": jnp.asarray(rng.randn(512, out_dim).astype(np.float32) * 0.02),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        }
    return {"params": params, "batch_stats": stats}
