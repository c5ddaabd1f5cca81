"""PWC-DC optical-flow network in JAX/flax.

Port of kinpoly/relive/data_process/PWCNet.py:38-272 (`PWCDCNet`, the
dilated-convolution + DenseNet-connection PWC-Net variant; the `_old`
variant :275-493 differs only in dropping the dense connections and is not
ported — no config references it).  The reference file is legacy in kinpoly
(OF features come from RAFT offline, SURVEY §2.3 row "PWC-Net"), but the
model itself is a complete, runnable flow estimator, so it is provided for
inventory completeness and as the `input_of_feats=False` raw-flow producer
alternative.

TPU-first design notes:
  * NHWC layout end-to-end; convolutions map straight onto the MXU
  * the 81-channel cost volume is one vectorized gather-multiply
    (jnp.stack over rolled windows) instead of the CUDA correlation kernel
  * bilinear warping implements torch grid_sample(align_corners=False)
    semantics with border-mask zeroing, matching the reference's warp()
    (:141-178) including the mask<0.9999 hard threshold

Checkpoint contract: `convert_pwcnet` ingests the torch `state_dict()`
(OIHW conv weights, ConvTranspose2d (in,out,kh,kw) weights).  Golden parity
with the reference module (pure-torch Correlation refstub) is tested in
tests/test_pwcnet.py.  kinpoly ships no trained PWC weights, so random-init
conversion parity defines the contract.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_DD = np.cumsum([128, 128, 96, 64, 32])  # dense-connection widths (:75)
_ND = 81                                 # (2*md+1)^2, md=4


# -- primitive ops -----------------------------------------------------------

def _conv(x: Array, p: dict, stride: int = 1, padding: int = 1,
          dilation: int = 1, relu: bool = True) -> Array:
    """torch Conv2d(+LeakyReLU 0.1) in NHWC (conv() helper, :24-28)."""
    out = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]
    return jax.nn.leaky_relu(out, 0.1) if relu else out


def _deconv(x: Array, p: dict) -> Array:
    """torch ConvTranspose2d(k=4, s=2, p=1) in NHWC (deconv(), :33-35):
    dilate the input by the stride and correlate with the flipped kernel
    (effective padding k-1-p = 2)."""
    w = p["kernel"][::-1, ::-1]  # flip spatial taps
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def correlation(x1: Array, x2: Array, md: int = 4) -> Array:
    """PWC cost volume (correlation_package semantics, kernel 1, stride 1):
    out[..., (dy+md)*(2md+1)+(dx+md)] = mean_c x1(y,x,c) * x2(y+dy,x+dx,c)."""
    b, h, w, c = x1.shape
    x2p = jnp.pad(x2, ((0, 0), (md, md), (md, md), (0, 0)))
    slabs = [
        (x1 * jax.lax.dynamic_slice(x2p, (0, dy, dx, 0), (b, h, w, c))).mean(-1)
        for dy in range(2 * md + 1)
        for dx in range(2 * md + 1)
    ]
    return jnp.stack(slabs, axis=-1)


def grid_sample_zeros(img: Array, px: Array, py: Array) -> Array:
    """Bilinear sample img (B,H,W,C) at pixel coords (B,H',W') with zero
    padding — torch grid_sample(align_corners=False) after the caller maps
    normalized coords to pixels."""
    b, h, w, c = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def tap(xi, yi, wgt):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, xx, yy: im[yy, xx])(img, xc, yc)
        return vals * (wgt * inb)[..., None]

    return (tap(x0, y0, (1 - wx) * (1 - wy))
            + tap(x0 + 1, y0, wx * (1 - wy))
            + tap(x0, y0 + 1, (1 - wx) * wy)
            + tap(x0 + 1, y0 + 1, wx * wy))


def warp(x: Array, flo: Array) -> Array:
    """Backward-warp x (B,H,W,C) by flow (B,H,W,2) — PWCNet.warp (:141-178):
    grid + flow, normalize by (W-1, H-1), sample with align_corners=False
    pixel mapping, and zero everything whose all-ones warp mask < 0.9999."""
    b, h, w, _ = x.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xx + flo[..., 0]
    vy = yy + flo[..., 1]
    # reference: normalized = 2*v/max(S-1,1) - 1; torch then maps back with
    # align_corners=False: p = ((n+1)*S - 1)/2
    nx = 2.0 * vx / max(w - 1, 1) - 1.0
    ny = 2.0 * vy / max(h - 1, 1) - 1.0
    px = ((nx + 1.0) * w - 1.0) / 2.0
    py = ((ny + 1.0) * h - 1.0) / 2.0
    out = grid_sample_zeros(x, px, py)
    mask = grid_sample_zeros(jnp.ones_like(x), px, py)
    mask = jnp.where(mask < 0.9999, 0.0, 1.0)
    return out * mask


# -- the network -------------------------------------------------------------

_PYRAMID = [
    # (name_a, name_aa, name_b, out_ch, uses aa-then-a order at level 6)
    ("conv1a", "conv1aa", "conv1b", 16),
    ("conv2a", "conv2aa", "conv2b", 32),
    ("conv3a", "conv3aa", "conv3b", 64),
    ("conv4a", "conv4aa", "conv4b", 96),
    ("conv5a", "conv5aa", "conv5b", 128),
    ("conv6aa", "conv6a", "conv6b", 196),  # level 6 names swap (:66-68)
]

_FLOW_SCALES = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}  # (:207-246)


def _pyramid_features(params: dict, im: Array) -> list[Array]:
    feats = []
    x = im
    for first, second, third, _ in _PYRAMID:
        x = _conv(x, params[first], stride=2)
        x = _conv(x, params[second])
        x = _conv(x, params[third])
        feats.append(x)
    return feats  # [c?1 .. c?6], strides 2..64


def _decoder_level(params: dict, lvl: int, x_in: Array) -> tuple[Array, Array]:
    """DenseNet decoder block (:170-246): five concat-convs + flow head."""
    x = x_in
    for i in range(5):
        x = jnp.concatenate([_conv(x, params[f"conv{lvl}_{i}"]), x], axis=-1)
    flow = _conv(x, params[f"predict_flow{lvl}"], relu=False)
    return x, flow


def pwcnet_forward(params: dict, im1: Array, im2: Array,
                   training: bool = False):
    """Full PWC-DC forward (:178-272).  im1/im2: (B, H, W, 3), H and W
    divisible by 64.  Returns flow2 (B, H/4, W/4, 2), or the 5-level flow
    pyramid when training=True."""
    c1 = _pyramid_features(params, im1)
    c2 = _pyramid_features(params, im2)

    corr6 = jax.nn.leaky_relu(correlation(c1[5], c2[5]), 0.1)
    x, flow6 = _decoder_level(params, 6, corr6)
    up_flow = _deconv(flow6, params["deconv6"])
    up_feat = _deconv(x, params["upfeat6"])
    flows = {6: flow6}

    for lvl in (5, 4, 3):
        cl1, cl2 = c1[lvl - 1], c2[lvl - 1]
        warped = warp(cl2, up_flow * _FLOW_SCALES[lvl])
        corr = jax.nn.leaky_relu(correlation(cl1, warped), 0.1)
        x, flow = _decoder_level(
            params, lvl,
            jnp.concatenate([corr, cl1, up_flow, up_feat], axis=-1))
        flows[lvl] = flow
        up_flow = _deconv(flow, params[f"deconv{lvl}"])
        up_feat = _deconv(x, params[f"upfeat{lvl}"])

    warped = warp(c2[1], up_flow * _FLOW_SCALES[2])
    corr = jax.nn.leaky_relu(correlation(c1[1], warped), 0.1)
    x, flow2 = _decoder_level(
        params, 2, jnp.concatenate([corr, c1[1], up_flow, up_feat], axis=-1))

    # context network (:133-139, :268-269)
    ctx = _conv(x, params["dc_conv1"], padding=1, dilation=1)
    ctx = _conv(ctx, params["dc_conv2"], padding=2, dilation=2)
    ctx = _conv(ctx, params["dc_conv3"], padding=4, dilation=4)
    ctx = _conv(ctx, params["dc_conv4"], padding=8, dilation=8)
    ctx = _conv(ctx, params["dc_conv5"], padding=16, dilation=16)
    ctx = _conv(ctx, params["dc_conv6"], padding=1, dilation=1)
    flow2 = flow2 + _conv(ctx, params["dc_conv7"], relu=False)
    flows[2] = flow2

    if training:
        return tuple(flows[i] for i in (2, 3, 4, 5, 6))
    return flow2


# -- torch checkpoint ingestion ----------------------------------------------

def convert_pwcnet(state_dict: dict) -> dict:
    """torch PWCDCNet state_dict -> params pytree.  Conv2d OIHW -> HWIO;
    ConvTranspose2d (in,out,kh,kw) -> HWIO (flip handled at apply time)."""
    params: dict[str, Any] = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        name = key.split(".")[0]
        leaf = key.split(".")[-1]
        if leaf == "bias":
            params.setdefault(name, {})["bias"] = jnp.asarray(v)
            continue
        if name.startswith(("deconv", "upfeat")):
            w = jnp.asarray(v.transpose(2, 3, 0, 1))     # (kh, kw, in, out)
        else:
            w = jnp.asarray(v.transpose(2, 3, 1, 0))     # OIHW -> HWIO
        params.setdefault(name, {})["kernel"] = w
    return params


def init_pwcnet(key, dtype=jnp.float32) -> dict:
    """Kaiming-normal(fan_in) random init matching the reference (:129-133)."""
    params: dict[str, Any] = {}

    def add_conv(name, cin, cout, k=3):
        nonlocal key
        key, sub = jax.random.split(key)
        fan_in = cin * k * k
        std = math.sqrt(2.0 / fan_in)
        params[name] = {
            "kernel": std * jax.random.normal(sub, (k, k, cin, cout), dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    cin = 3
    for first, second, third, cout in _PYRAMID:
        add_conv(first, cin, cout)
        add_conv(second, cout, cout)
        add_conv(third, cout, cout)
        cin = cout

    widths = {6: _ND, 5: _ND + 128 + 4, 4: _ND + 96 + 4,
              3: _ND + 64 + 4, 2: _ND + 32 + 4}
    outs = [128, 128, 96, 64, 32]
    for lvl in (6, 5, 4, 3, 2):
        od = widths[lvl]
        acc = od
        for i, o in enumerate(outs):
            add_conv(f"conv{lvl}_{i}", acc, o)
            acc += o
        add_conv(f"predict_flow{lvl}", acc, 2)
        if lvl > 2:
            add_conv(f"deconv{lvl}", 2, 2, k=4)
            add_conv(f"upfeat{lvl}", acc, 2, k=4)
    add_conv("dc_conv1", widths[2] + _DD[4], 128)
    add_conv("dc_conv2", 128, 128)
    add_conv("dc_conv3", 128, 128)
    add_conv("dc_conv4", 128, 96)
    add_conv("dc_conv5", 96, 64)
    add_conv("dc_conv6", 64, 32)
    add_conv("dc_conv7", 32, 2)
    return params
