"""Offline optical-flow feature extraction CLI.

Port of kinpoly/scripts/extract_of_feats.py: reads RAFT flow npys
(H x W x 2), encodes each frame with the ResNet-18 head (512-d), and writes
raft_of_feats npys next to the flows — the features the HeadNet datasets
consume.  Batches frames through the jitted encoder instead of per-frame
torch calls.

Usage:
  python -m egoego_release_tpu.preprocess.of_feats \
      --flow_root <dir with */raft_flows/*.npy> [--torch_resnet resnet18.pth]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.resnet import (
    ResNet18,
    convert_torchvision_resnet18,
    flow_to_input,
)


def build_encoder(torch_resnet: str | None = None, out_dim: int = 512):
    model = ResNet18(out_dim=out_dim)
    if torch_resnet and os.path.exists(torch_resnet):
        import torch

        sd = torch.load(torch_resnet, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        variables = convert_torchvision_resnet18(
            {k: v.numpy() for k, v in sd.items()}, out_dim
        )
    else:
        print("WARNING: no torchvision weights; random-init encoder")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def encode(flow_batch):  # (B, 224, 224, 2)
        return model.apply(variables, flow_to_input(flow_batch))

    return encode


def resize_flow(flow: np.ndarray, size: int = 224) -> np.ndarray:
    """Nearest-neighbor resize on the host (reference feeds 224x224)."""
    h, w = flow.shape[:2]
    if (h, w) == (size, size):
        return flow
    yi = np.linspace(0, h - 1, size).astype(int)
    xi = np.linspace(0, w - 1, size).astype(int)
    return flow[yi][:, xi]


def extract_folder(flow_dir: str, encode, batch: int = 64) -> int:
    out_dir = flow_dir.replace("raft_flows", "raft_of_feats")
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(flow_dir) if f.endswith(".npy"))
    n = 0
    for s in range(0, len(files), batch):
        chunk = files[s : s + batch]
        flows = np.stack(
            [resize_flow(np.load(os.path.join(flow_dir, f)).astype(np.float32))
             for f in chunk]
        )
        feats = np.asarray(encode(jnp.asarray(flows)))
        for f, feat in zip(chunk, feats):
            np.save(os.path.join(out_dir, f), feat)
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--flow_root", required=True)
    p.add_argument("--torch_resnet", default=None)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args(argv)

    encode = build_encoder(args.torch_resnet)
    total = 0
    for dirpath, dirnames, _ in os.walk(args.flow_root):
        if os.path.basename(dirpath) == "raft_flows":
            total += extract_folder(dirpath, encode, args.batch)
            print(f"{dirpath}: done ({total} total)")
    print(f"extracted {total} feature files")


if __name__ == "__main__":
    main()
