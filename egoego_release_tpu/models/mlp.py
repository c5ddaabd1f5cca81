"""Plain MLP head (reference: egoego/model/mlp.py)."""

from __future__ import annotations

import flax.linen as nn


_ACT = {"relu": nn.relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid}


class MLP(nn.Module):
    hidden_dims: tuple[int, ...]
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for i, h in enumerate(self.hidden_dims):
            x = act(nn.Dense(h, name=f"affine_{i}")(x))
        return x
