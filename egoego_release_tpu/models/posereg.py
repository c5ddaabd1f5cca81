"""Pose-regression baseline family (kinpoly "posereg").

Functional port of kinpoly/relive/posereg_models/video_reg_net.py
(`VideoRegNet`): per-frame optical-flow features -> temporal net
(bidirectional LSTM or a dilated TCN, rnn.py / tcn.py) -> MLP -> per-frame
pose/trajectory regression, trained with a squared-error loss
(video_reg_net.py:67-77).  This is the simplest kinpoly baseline (predict
pose directly from video, no autoregression, no physics); the reference's
posereg experiment YAMLs (config/statear/baseline_posereg_*.yml) drive it.

Functional — NOT checkpoint-parity: no posereg checkpoints are released and
parts of the reference posereg stack import broken legacy modules, so this
is a clean flax implementation of the same architecture family.  The
`no_cnn=True` OF-features mode matches the data the head-pose datasets
serve; the raw-frame path reuses models/resnet.ResNet18.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from egoego_release_tpu.models.mlp import MLP

Array = jax.Array


class BiLSTM(nn.Module):
    """Bidirectional LSTM over (B, T, D) -> (B, T, hidden); forward and
    backward halves concatenated (posereg_models/rnn.py bi_dir mode)."""

    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        half = self.hidden // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True,
                     keep_order=True, name="bwd")
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class CausalLSTM(nn.Module):
    """Unidirectional LSTM (the reference's causal=True mode)."""

    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)


class TemporalBlock(nn.Module):
    """One dilated-conv residual block (posereg_models/tcn.py, Bai et al.)."""

    filters: int
    kernel_size: int
    dilation: int
    causal: bool
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        pad = (self.kernel_size - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        y = x
        for i in range(2):
            y = nn.Conv(self.filters, (self.kernel_size,),
                        kernel_dilation=(self.dilation,), padding=padding,
                        name=f"conv{i}")(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        if x.shape[-1] != self.filters:
            x = nn.Conv(self.filters, (1,), name="downsample")(x)
        return nn.relu(x + y)


class TemporalConvNet(nn.Module):
    sizes: tuple[int, ...] = (64, 128)
    kernel_size: int = 3
    causal: bool = False
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i, width in enumerate(self.sizes):
            x = TemporalBlock(width, self.kernel_size, 2 ** i, self.causal,
                              self.dropout, name=f"block{i}")(x, deterministic)
        return x


class VideoRegNet(nn.Module):
    """OF features (B, T, cnn_fdim) -> per-frame regression (B, T, out_dim)
    (video_reg_net.py:11-65)."""

    out_dim: int
    v_hdim: int = 128
    cnn_fdim: int = 512
    v_net_type: str = "lstm"      # 'lstm' | 'tcn'
    mlp_dim: tuple[int, ...] = (300, 200)
    causal: bool = False
    tcn_sizes: tuple[int, ...] | None = None
    no_cnn: bool = True           # OF-features input (the trained config)

    @nn.compact
    def __call__(self, of_feats: Array, deterministic: bool = True) -> Array:
        x = of_feats
        if not self.no_cnn:
            from egoego_release_tpu.models.resnet import ResNet18, flow_to_input

            b, t = x.shape[:2]
            frames = flow_to_input(x.reshape((b * t,) + x.shape[2:]))
            x = ResNet18(out_dim=self.cnn_fdim, name="cnn")(frames)
            x = x.reshape(b, t, self.cnn_fdim)

        if self.v_net_type == "lstm":
            net = CausalLSTM(self.v_hdim) if self.causal else BiLSTM(self.v_hdim)
            x = net(x)
        elif self.v_net_type == "tcn":
            sizes = self.tcn_sizes or (64, self.v_hdim)
            assert sizes[-1] == self.v_hdim
            x = TemporalConvNet(sizes, causal=self.causal, name="v_net")(
                x, deterministic
            )
        else:
            raise ValueError(self.v_net_type)

        x = MLP(self.mlp_dim, "relu", name="mlp")(x)
        return nn.Dense(self.out_dim, name="linear")(x)


def posereg_loss(pred_traj: Array, gt_traj: Array) -> Array:
    """Squared-error trajectory loss (video_reg_net.py:67-77)."""
    return jnp.sum((gt_traj - pred_traj) ** 2, axis=-1).mean()
