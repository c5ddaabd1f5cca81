"""Measure the PyTorch reference workload to populate BASELINE_MEASURED.json.

The reference repo publishes no benchmark numbers (BASELINE.md) and its
CUDA/pytorch3d environment is unavailable here, so we measure an equivalent
torch implementation of the stage-2 sampling workload on this host: the
1000-step reverse chain of the released architecture (post-LN transformer,
d_model 512, 4 layers, 4 heads, d_k=d_v=256, window 120), driven with
sequential per-step python calls exactly like the reference sampler
(transformer_cond_diffusion_model.py:258-270).

This is written independently (plain functional torch, not a port of the
reference's nn.Module classes); it reproduces the FLOP/step structure, which
is what the throughput baseline needs.
"""

import argparse
import json
import math
import time

import torch


def make_params(d_feats=198, d_model=512, n_layers=4, n_head=4, d_k=256, d_v=256, seed=0):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    p = {
        "start_w": r(2 * d_feats, d_model), "start_b": r(d_model),
        "out_w": r(d_model, d_feats), "out_b": r(d_feats),
        "t1_w": r(64, 256), "t1_b": r(256), "t2_w": r(256, d_model), "t2_b": r(d_model),
        "layers": [],
    }
    for _ in range(n_layers):
        p["layers"].append({
            "wq": r(d_model, n_head * d_k), "bq": r(n_head * d_k),
            "wk": r(d_model, n_head * d_k), "bk": r(n_head * d_k),
            "wv": r(d_model, n_head * d_v), "bv": r(n_head * d_v),
            "fc": r(n_head * d_v, d_model), "fcb": r(d_model),
            "ln1_w": torch.ones(d_model), "ln1_b": torch.zeros(d_model),
            "w1": r(d_model, d_model), "b1": r(d_model),
            "w2": r(d_model, d_model), "b2": r(d_model),
            "ln2_w": torch.ones(d_model), "ln2_b": torch.zeros(d_model),
        })
    return p


@torch.no_grad()
def denoiser_forward(p, src, t, n_head=4, d_k=256, d_v=256):
    b, tt, _ = src.shape
    half = 32
    freq = torch.exp(torch.arange(half) * (-math.log(10000.0) / (half - 1)))
    ang = t.float()[:, None] * freq[None]
    emb = torch.cat([ang.sin(), ang.cos()], -1)
    emb = torch.nn.functional.gelu(emb @ p["t1_w"] + p["t1_b"]) @ p["t2_w"] + p["t2_b"]

    x = src @ p["start_w"] + p["start_b"]
    x = torch.cat([emb[:, None], x], 1)  # prepend noise token
    for lp in p["layers"]:
        res = x
        q = (x @ lp["wq"] + lp["bq"]).view(b, -1, n_head, d_k)
        k = (x @ lp["wk"] + lp["bk"]).view(b, -1, n_head, d_k)
        v = (x @ lp["wv"] + lp["bv"]).view(b, -1, n_head, d_v)
        a = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
        a = a.softmax(-1)
        o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, x.shape[1], -1)
        x = torch.nn.functional.layer_norm(
            o @ lp["fc"] + lp["fcb"] + res, (x.shape[-1],), lp["ln1_w"], lp["ln1_b"]
        )
        res = x
        h = torch.relu(x @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
        x = torch.nn.functional.layer_norm(h + res, (x.shape[-1],), lp["ln2_w"], lp["ln2_b"])
    return x[:, 1:] @ p["out_w"] + p["out_b"]


@torch.no_grad()
def sample_chain(p, bs=16, window=120, d_feats=198, steps=1000, device="cpu"):
    x = torch.randn(bs, window, d_feats, device=device)
    x_cond = torch.randn(bs, window, d_feats, device=device)
    for i in reversed(range(steps)):
        t = torch.full((bs,), i, dtype=torch.long, device=device)
        out = denoiser_forward(p, torch.cat([x, x_cond], -1), t)
        x = out.clamp(-1, 1) * 0.9 + x * 0.1  # posterior-update-shaped elementwise work
        if i > 0:
            x = x + 0.01 * torch.randn_like(x)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    device = "cuda" if torch.cuda.is_available() else "cpu"
    p = make_params()
    if device == "cuda":
        p = {k: (v.cuda() if torch.is_tensor(v) else [{kk: vv.cuda() for kk, vv in l.items()} for l in v]) for k, v in p.items()}

    # warmup
    sample_chain(p, bs=1, steps=5, device=device)
    t0 = time.perf_counter()
    for _ in range(args.runs):
        sample_chain(p, bs=args.bs, steps=args.steps, device=device)
    dt = time.perf_counter() - t0
    sps = args.bs * args.runs / dt
    out = {
        "torch_reference_samples_per_sec": sps,
        "device": device,
        "torch_threads": torch.get_num_threads(),
        "batch": args.bs,
        "steps": args.steps,
        "note": "equivalent-architecture torch measurement of the stage-2 "
                "1000-step sampling chain; reference repo publishes no numbers",
    }
    print(json.dumps(out, indent=2))
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
