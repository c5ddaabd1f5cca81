"""AOT export of the inference programs as serialized StableHLO artifacts.

TPU-native serving path with no reference counterpart (the reference deploys
by shipping the torch checkpoint + source and re-tracing at import time —
run_egoego.py): `jax.export` serializes the jitted program — weights,
normalization stats, and rest offsets baked in as constants — so a serving
host loads ONE artifact and calls it without Python model code, checkpoint
loading, or re-tracing.  Artifacts can be lowered for platforms the
exporting host does not have (e.g. export for TPU from a CPU build machine:
``platforms=("tpu",)``), and carry jax.export's forward-compatibility
guarantees for the embedded custom calls.

Shapes are static (XLA semantics): one artifact per (batch_size, n_frames)
serving configuration; export several and route by shape at serve time.

Artifact layout on disk: raw `Exported.serialize()` bytes; `save_artifact` /
`load_artifact` add nothing on top, so any jax >= the export version can
`jax.export.deserialize` the file directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

DEFAULT_PLATFORMS = ("tpu", "cpu")


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def export_chain(
    pipeline,
    batch_size: int,
    n_frames: int,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
):
    """Export the canonical sliding-window diffusion chain (the flagship
    inference unit — p_sample_loop_sliding_window_w_canonical,
    transformer_cond_diffusion_model.py:392-397) as one serialized program.

    Signature of the exported callable:
        (key  : uint32[2]  — a threefry jax.random key's raw data
                (jax.random.key_data(key)),
         head_jpos : f32[batch, n_frames, 3],
         head_jquat: f32[batch, n_frames, 4])
        -> (local_aa f32[batch, T', 22, 3], root_pos f32[batch, T', 3])

    Diffusion params, NormStats, and rest offsets are baked in as
    constants.  Returns the `jax.export.Exported` object; call
    `.serialize()` / `save_artifact` to persist.
    """
    diffusion = pipeline.diffusion
    params = pipeline.diffusion_params
    stats = pipeline.stats
    rest = pipeline.rest_offsets

    def serve_fn(key_data, head_jpos, head_jquat):
        key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
        return diffusion.sample_sliding_window_w_canonical_jit(
            params, key, head_jpos, head_jquat, stats, rest
        )

    return jax_export.export(jax.jit(serve_fn), platforms=list(platforms))(
        _spec((2,), jnp.uint32),
        _spec((batch_size, n_frames, 3)),
        _spec((batch_size, n_frames, 4)),
    )


def export_chain_sharded(
    pipeline,
    batch_size: int,
    n_frames: int,
    mesh,
    platforms: tuple[str, ...] = ("tpu",),
):
    """Multi-chip serving artifact: the canonical chain exported with the
    sequence batch dp-sharded over `mesh` (jax.sharding.Mesh with a 'dp'
    axis).  The artifact records the device count (`Exported.nr_devices`);
    the serving host loads it onto any mesh of that size and feeds
    dp-sharded inputs — SURVEY §2.4's "eval fans whole sequences across
    chips" as a deployable artifact, exportable from a CPU build host.

    Same callable signature as export_chain; the dp axis size must divide
    batch_size.  Params are baked in replicated (dp fan-out serving; use the
    live `EgoEgoPipeline.shard(mesh)` path when tp param sharding matters).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    diffusion = pipeline.diffusion
    params = pipeline.diffusion_params
    stats = pipeline.stats
    rest = pipeline.rest_offsets
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def serve_fn(key_data, head_jpos, head_jquat):
        key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
        return diffusion.sample_sliding_window_w_canonical_jit(
            params, key, head_jpos, head_jquat, stats, rest
        )

    jf = jax.jit(serve_fn, in_shardings=(rep, dp, dp), out_shardings=(dp, dp))
    return jax_export.export(jf, platforms=list(platforms))(
        _spec((2,), jnp.uint32),
        _spec((batch_size, n_frames, 3)),
        _spec((batch_size, n_frames, 4)),
    )


def export_stage1(
    pipeline,
    batch_size: int,
    n_frames: int,
    of_dim: int = 512,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
):
    """Export the batched stage-1 program (HeadNet blockwise eval + va2rot +
    SLAM rescale + GravityNet floor-normal transform — eval_egoego.py:244-295)
    with both stage-1 nets' params baked in.

    Signature (all f32, leading dim = batch):
        (of [B,T-1,of_dim], init_quat [B,4], aligned_slam_trans [B,T,3],
         ori_trans [B,T,3], ori_mat [B,T,3,3], gt_head_pose [B,T,7])
        -> (head_pose [B,T,7], pred_scale [B], pred_normal [B,3])
    """
    fn = pipeline._stage1_fn(batched=True)

    def serve_fn(of, init_quat, aligned_slam_trans, ori_trans, ori_mat,
                 gt_head_pose):
        return fn(pipeline.headnet_params, pipeline.gravitynet_params,
                  of, init_quat, aligned_slam_trans, ori_trans, ori_mat,
                  gt_head_pose)

    b, t = batch_size, n_frames
    return jax_export.export(jax.jit(serve_fn), platforms=list(platforms))(
        _spec((b, t - 1, of_dim)),
        _spec((b, 4)),
        _spec((b, t, 3)),
        _spec((b, t, 3)),
        _spec((b, t, 3, 3)),
        _spec((b, t, 7)),
    )


def export_e2e(
    pipeline,
    batch_size: int,
    n_frames: int,
    of_dim: int = 512,
    floor_offset: float = 0.0,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
):
    """The COMPLETE EgoEgo system as ONE serialized program: stage-1 head
    estimation -> conditional sliding-window diffusion -> SMPL FK
    (run_egoego.py's whole per-sequence flow, which is host-free between
    stages; the reference round-trips through numpy twice).  All three
    models' weights + stats + rest offsets baked in.

    Signature: (key uint32[2], of [B,T-1,of_dim], init_quat [B,4],
                aligned_slam_trans [B,T,3], ori_trans [B,T,3],
                ori_mat [B,T,3,3], ref_head_pose [B,T,7])
        -> (local_aa [B,T',22,3], root_pos [B,T',3],
            pred_jrot [B,T',22,4], pred_jpos [B,T',22,3],
            head_pose [B,T,7], pred_scale [B])

    `floor_offset` is the demo's fixed floor-height shift
    (run_egoego.py:136), baked in.  Post-hoc floor re-detection stays a
    host-side consumer step, as in the live CLI.
    """
    s1fn = pipeline._stage1_fn(batched=True)
    diffusion = pipeline.diffusion

    def serve_fn(key_data, of, init_quat, aligned_slam_trans, ori_trans,
                 ori_mat, ref_head_pose):
        key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
        head_pose, pred_scale, _ = s1fn(
            pipeline.headnet_params, pipeline.gravitynet_params,
            of, init_quat, aligned_slam_trans, ori_trans, ori_mat,
            ref_head_pose,
        )
        head_pose = head_pose.at[..., 2].add(floor_offset)
        local_aa, root_pos = diffusion.sample_sliding_window_w_canonical_jit(
            pipeline.diffusion_params, key,
            head_pose[..., :3], head_pose[..., 3:],
            pipeline.stats, pipeline.rest_offsets,
        )
        pred_jrot, pred_jpos = pipeline.fk(root_pos, local_aa)
        return local_aa, root_pos, pred_jrot, pred_jpos, head_pose, pred_scale

    b, t = batch_size, n_frames
    return jax_export.export(jax.jit(serve_fn), platforms=list(platforms))(
        _spec((2,), jnp.uint32),
        _spec((b, t - 1, of_dim)),
        _spec((b, 4)),
        _spec((b, t, 3)),
        _spec((b, t, 3)),
        _spec((b, t, 3, 3)),
        _spec((b, t, 7)),
    )


def export_fk(
    pipeline,
    batch_size: int,
    n_frames: int,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
):
    """Export the SMPL FK decode (chain output -> global joint rotations +
    positions; ops/fk.py::fk_smpl) with the rest offsets baked in.

    Signature: (root_pos f32[B,T,3], local_aa f32[B,T,22,3])
        -> (jrot f32[B,T,22,4], jpos f32[B,T,22,3])
    """
    def serve_fn(root_pos, local_aa):
        return pipeline.fk(root_pos, local_aa)

    return jax_export.export(jax.jit(serve_fn), platforms=list(platforms))(
        _spec((batch_size, n_frames, 3)),
        _spec((batch_size, n_frames, 22, 3)),
    )


def save_artifact(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_artifact(path: str):
    """Deserialize an artifact; returns the `Exported` — invoke via `.call`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def main(argv=None):
    """CLI: export serving artifacts from converted (or torch) checkpoints.

    egoego-export chain --stats_path ... --rest_offsets ... \
        --diffusion_ckpt ... --batch_size 64 --n_frames 140 \
        --platforms tpu,cpu --out chain_b64_t140.stablehlo
    """
    import argparse

    from egoego_release_tpu.eval.build import build_pipeline

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("which", choices=["chain", "stage1", "fk", "e2e"])
    p.add_argument("--stats_path", required=True)
    p.add_argument("--rest_offsets", required=True)
    p.add_argument("--diffusion_ckpt", default=None)
    p.add_argument("--headnet_ckpt", default=None)
    p.add_argument("--gravitynet_ckpt", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_frames", type=int, default=140)
    p.add_argument("--window", type=int, default=120)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--ddim_steps", type=int, default=0)
    p.add_argument("--floor_offset", type=float, default=0.0,
                   help="e2e only: fixed demo floor shift (run_egoego.py:136)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    pipeline = build_pipeline(
        stats_path=args.stats_path,
        rest_offsets_path=args.rest_offsets,
        diffusion_ckpt=args.diffusion_ckpt,
        headnet_ckpt=args.headnet_ckpt,
        gravitynet_ckpt=args.gravitynet_ckpt,
        window=args.window,
        timesteps=args.timesteps,
        sampler="ddim" if args.ddim_steps else "ddpm",
        ddim_steps=args.ddim_steps or 50,
    )
    platforms = tuple(args.platforms.split(","))
    if args.which == "chain":
        exp = export_chain(pipeline, args.batch_size, args.n_frames,
                           platforms=platforms)
    elif args.which == "stage1":
        exp = export_stage1(pipeline, args.batch_size, args.n_frames,
                            platforms=platforms)
    elif args.which == "e2e":
        exp = export_e2e(pipeline, args.batch_size, args.n_frames,
                         floor_offset=args.floor_offset, platforms=platforms)
    else:
        exp = export_fk(pipeline, args.batch_size, args.n_frames,
                        platforms=platforms)
    save_artifact(exp, args.out)
    import os

    print(f"exported {args.which} (b={args.batch_size}, t={args.n_frames}, "
          f"platforms={platforms}) -> {args.out} "
          f"({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
