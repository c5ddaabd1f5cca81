"""Device meshes and sharding rules.

The reference has no distributed support at all (SURVEY §2.4: no
torch.distributed / NCCL anywhere; single-GPU + grad accumulation).  This
module is where the TPU build departs: a 2-D (dp, tp) `jax.sharding.Mesh`
over ICI with

  * data parallelism: batch dim sharded over 'dp'
  * tensor parallelism: attention-head projections and FFN hidden dims
    sharded over 'tp' (Megatron-style column/row split — w_q/w_k/w_v and
    ffn w_1 split on the output dim, the fc / w_2 contractions split on the
    input dim so each tp shard computes a partial sum that XLA reduces with
    a single psum per block)

XLA/GSPMD inserts the collectives; we only annotate shardings.
"""

from __future__ import annotations

import re

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. With dp=None, use all devices / tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# (regex on the flattened param path) -> PartitionSpec for the kernel.
# Flax Dense kernels are (in_features, out_features).
_TP_RULES: list[tuple[str, P]] = [
    (r"(w_q|w_k|w_v)/kernel$", P(None, "tp")),   # split heads (column parallel)
    (r"(w_q|w_k|w_v)/bias$", P("tp")),
    (r"self_attn/fc/kernel$", P("tp", None)),     # row parallel (partial sums)
    (r"pos_ffn/w_1/kernel$", P(None, "tp")),
    (r"pos_ffn/w_1/bias$", P("tp")),
    (r"pos_ffn/w_2/kernel$", P("tp", None)),
]


def _spec_for(path: str, shape: tuple[int, ...], tp: int) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            # only shard if the dim divides evenly
            dims = list(spec)
            ok = True
            for axis_idx, name in enumerate(dims):
                if name == "tp" and shape[axis_idx] % tp != 0:
                    ok = False
            if ok:
                return spec
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a flax param tree: tp rules above, rest replicated."""
    tp = mesh.shape["tp"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = {path_str(kp): _spec_for(path_str(kp), v.shape, tp) for kp, v in flat}

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Device-put a param tree with the tp/dp sharding rules applied."""
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), params, param_shardings(params, mesh)
    )


def count_tp_sharded(params, mesh: Mesh) -> int:
    """Number of params the tp rules actually shard (spec mentions 'tp').

    Guards `_TP_RULES` regex rot: `_spec_for` silently replicates on
    non-matching paths or non-divisible dims, so callers building release
    configs should assert this count (see tests/test_inference_parallel.py).
    """
    flat = jax.tree_util.tree_leaves(param_shardings(params, mesh))
    return sum(1 for s in flat if "tp" in list(s.spec))


def expected_tp_sharded(n_layers: int) -> int:
    """Per DecoderLayer: w_q/w_k/w_v kernel+bias (6), fc kernel (1),
    ffn w_1 kernel+bias (2), w_2 kernel (1) = 10."""
    return 10 * n_layers


def shard_batch(x, mesh: Mesh):
    """Device-put with the leading dim sharded over dp.  The batch must be
    divisible by dp (callers pad via `pad_to_dp`)."""
    return jax.device_put(x, batch_sharding(mesh))


def pad_to_dp(x, mesh: Mesh):
    """Pad the leading dim up to a multiple of dp by repeating the last row.
    Returns (padded, original_batch)."""
    import jax.numpy as jnp

    dp = mesh.shape["dp"]
    b = x.shape[0]
    pad = (-b) % dp
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return x, b
