"""End-to-end pipeline building blocks shared by the eval drivers.

Mirrors the orchestration of eval_egoego.py / eval_stage2.py / run_egoego.py
(reference repo root): stage-1 head-pose estimation -> head-pose-conditioned
diffusion -> FK decode -> floor snap -> metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    NormStats,
)
from egoego_release_tpu.eval import metrics as metrics_mod
from egoego_release_tpu.models.gravitynet import (
    HeadNormalFormer,
    gravitynet_eval_transform,
    prep_gravitynet_input,
)
from egoego_release_tpu.models.headnet import HeadFormer, headformer_forward_for_eval
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import floor as floor_mod
from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import rotations as rot

HEAD_IDX = fk_mod.HEAD_IDX


@dataclass
class EgoEgoPipeline:
    """Holds the three models + params + normalization/skeleton constants."""

    diffusion: CondGaussianDiffusion
    diffusion_params: Any
    stats: NormStats
    rest_offsets: jnp.ndarray
    headnet: HeadFormer | None = None
    headnet_params: Any = None
    gravitynet: HeadNormalFormer | None = None
    gravitynet_params: Any = None
    dist_scale: float = 10.0
    # Opt-in fast-mode deviation (OFF by default = reference semantics):
    # upload optical-flow features bf16 instead of f32.  The OF batch is the
    # pipeline's dominant host->device byte stream (64 x 139 x 512 f32 =
    # 18.2 MB/batch; measured 927 ms f32 vs 322 ms bf16 through the axon
    # tunnel), and in DDIM fast mode that upload IS the end-to-end
    # bottleneck.  Features are cast back to f32 in-program, so the only
    # deviation is bf16 rounding of the ResNet-18 embeddings (~3 decimal
    # digits); documented in REFERENCE_PARITY.md.
    of_bf16: bool = False
    # Opt-in fast-mode deviation, one step past of_bf16: upload optical-flow
    # features int8 with a per-(sequence, frame) symmetric scale (absmax /
    # 127, f32, rides the same dispatch at (N, T, 1) ~ 35 KB) and
    # dequantize in-program.  Quantization error is <= row-absmax / 254 per
    # element — relative to the ROW PEAK rather than per-element magnitude,
    # so small features see coarser rounding than bf16; equivalence test at
    # 5e-2 (tests/test_eval_pipeline.py::test_stage1_of_int8_close_to_f32).
    # OFF by default; mutually exclusive with of_bf16.
    of_int8: bool = False
    extras: dict = field(default_factory=dict)
    mesh: Any = None

    # -- multi-chip ---------------------------------------------------------

    def shard(self, mesh) -> "EgoEgoPipeline":
        """Shard for multi-chip eval (SURVEY §2.4: "eval fans whole
        sequences x samples across chips"): the diffusion params get the
        Megatron-style tp rules, stage-1 params are replicated, and
        `stage2_generate*` dp-shard their sequence/sample batch dim so the
        canonical sliding-window chain runs SPMD over the mesh."""
        from egoego_release_tpu.parallel.mesh import replicated, shard_params

        self.mesh = mesh
        self.diffusion_params = shard_params(self.diffusion_params, mesh)
        rep = replicated(mesh)
        put = lambda tree: jax.tree.map(lambda v: jax.device_put(v, rep), tree)
        if self.headnet_params is not None:
            self.headnet_params = put(self.headnet_params)
        if self.gravitynet_params is not None:
            self.gravitynet_params = put(self.gravitynet_params)
        return self

    def _dp_shard_head(self, head_jpos, head_jquat):
        """dp-shard the (B, T, ...) stage-2 condition, padding B up to a
        multiple of dp.  Returns (jpos, jquat, original_batch)."""
        from egoego_release_tpu.parallel.mesh import pad_to_dp, shard_batch

        head_jpos, b = pad_to_dp(head_jpos, self.mesh)
        head_jquat, _ = pad_to_dp(head_jquat, self.mesh)
        return shard_batch(head_jpos, self.mesh), shard_batch(head_jquat, self.mesh), b

    # -- stage 1 -----------------------------------------------------------

    def _stage1_impl(self, headnet_params, gravitynet_params, of, init_quat,
                     aligned_slam_trans, ori_trans, ori_mat, gt_head_pose):
        """Pure stage-1 body for ONE sequence (eval_egoego.py:244-295); jit /
        vmap composable (the per-op dispatch version cost ~2.3 s/sequence in
        tunnel round trips on the real chip — BASELINE.md round-3)."""
        head_out = headformer_forward_for_eval(
            self.headnet, headnet_params, of[None], init_quat[None],
            aligned_slam_trans, dist_scale=self.dist_scale,
        )
        ori_trans = ori_trans - ori_trans[0:1]
        window = self.gravitynet.window
        feats, mask = prep_gravitynet_input(ori_mat[None], ori_trans[None], window)
        normal = self.gravitynet.apply(gravitynet_params, feats, mask)[0]

        normal_out = gravitynet_eval_transform(
            normal, ori_mat, ori_trans, head_out["pred_scale"], gt_head_pose
        )
        # translation from GravityNet, orientation from HeadNet (:275-278)
        t = min(normal_out["head_pose"].shape[0], head_out["head_pose"].shape[1])
        head_pose = jnp.concatenate(
            [normal_out["head_pose"][:t, :3], head_out["head_pose"][0, :t, 3:]],
            axis=-1,
        )
        return head_pose, head_out["pred_scale"], normal

    def _stage1_fn(self, batched: bool):
        cache_key = "_s1_batched" if batched else "_s1_single"
        if cache_key not in self.extras:
            fn = self._stage1_impl
            if batched:
                fn = jax.vmap(fn, in_axes=(None, None, 0, 0, 0, 0, 0, 0))
            self.extras[cache_key] = jax.jit(fn)
        return self.extras[cache_key]

    def stage1_head_pose(self, record: dict) -> dict:
        """HeadNet + GravityNet -> world head pose (T, 7)
        (eval_egoego.py:244-295), as ONE jitted program."""
        head_pose, pred_scale, normal = self._stage1_fn(False)(
            self.headnet_params, self.gravitynet_params,
            jnp.asarray(record["of"]),
            jnp.asarray(record["head_pose"][0, 3:]),
            jnp.asarray(record["aligned_slam_trans"]),
            jnp.asarray(record["ori_slam_trans"]),
            jnp.asarray(record["ori_slam_rot_mat"]),
            jnp.asarray(record["head_pose"]),
        )
        return {"head_pose": head_pose, "pred_scale": pred_scale,
                "pred_normal": normal}

    def stage1_head_pose_batched(self, records: list[dict]) -> dict:
        """N same-length sequences through stage 1 as ONE vmapped+jitted
        dispatch (TPU-native eval fan-in; per-record dispatch costs a tunnel
        round trip each).  Returns dict with head_pose (N, T, 7).

        The four pose-length inputs ride ONE packed (N, T, 7+3+3+9) upload
        (separate uploads each cost a tunnel round trip; `of` stays its own
        upload — optical flow is between-frames and can be one frame
        shorter than the pose arrays) and the init quat is sliced from the
        packed head pose in-program."""
        if self.of_bf16 and self.of_int8:
            raise ValueError("of_bf16 and of_int8 are mutually exclusive")
        if "_s1_packed" not in self.extras:
            fn = self._stage1_fn(True)

            def _packed(hn_params, gn_params, of, packed, *of_scale):
                if of_scale:  # int8 upload: dequantize in-program
                    of = of.astype(jnp.float32) * of_scale[0]
                else:
                    of = of.astype(jnp.float32)  # no-op unless of_bf16
                head_pose = packed[..., :7]
                aligned = packed[..., 7:10]
                ori_t = packed[..., 10:13]
                ori_m = packed[..., 13:22].reshape(packed.shape[:2] + (3, 3))
                return fn(hn_params, gn_params, of, head_pose[:, 0, 3:],
                          aligned, ori_t, ori_m, head_pose)

            self.extras["_s1_packed"] = jax.jit(_packed)

        def flat(r):
            return np.concatenate([
                np.asarray(r["head_pose"], np.float32),
                np.asarray(r["aligned_slam_trans"], np.float32),
                np.asarray(r["ori_slam_trans"], np.float32),
                np.asarray(r["ori_slam_rot_mat"], np.float32).reshape(-1, 9),
            ], axis=-1)

        of_np = np.stack([np.asarray(r["of"], np.float32) for r in records])
        of_args = ()
        if self.of_int8:
            scale = np.abs(of_np).max(axis=-1, keepdims=True) / 127.0
            scale = np.maximum(scale, np.float32(1e-12)).astype(np.float32)
            of_np = np.clip(np.rint(of_np / scale), -127, 127).astype(np.int8)
            of_args = (jnp.asarray(scale),)
        elif self.of_bf16:
            import ml_dtypes

            of_np = of_np.astype(ml_dtypes.bfloat16)
        head_pose, pred_scale, normal = self.extras["_s1_packed"](
            self.headnet_params, self.gravitynet_params, jnp.asarray(of_np),
            jnp.asarray(np.stack([flat(r) for r in records])), *of_args,
        )
        return {"head_pose": head_pose, "pred_scale": pred_scale,
                "pred_normal": normal}

    # -- stage 2 -----------------------------------------------------------

    def stage2_generate(self, head_pose: jnp.ndarray, key, sample_bs: int = 1):
        """Head pose (T, 7) -> (local_aa (BS,T',22,3), root_pos (BS,T',3))
        via sliding-window conditional diffusion
        (trainer:261-277 full_body_gen_cond_head_pose_sliding_window)."""
        rep = jnp.tile(head_pose[None], (sample_bs, 1, 1))
        jpos, jquat = rep[:, :, :3], rep[:, :, 3:]
        if self.mesh is not None:
            jpos, jquat, b = self._dp_shard_head(jpos, jquat)
            aa, root = self.diffusion.sample_sliding_window_w_canonical_jit(
                self.diffusion_params, key, jpos, jquat, self.stats,
                self.rest_offsets,
            )
            return aa[:b], root[:b]
        return self.diffusion.sample_sliding_window_w_canonical_jit(
            self.diffusion_params, key, jpos, jquat, self.stats,
            self.rest_offsets,
        )

    def stage2_generate_batched(self, head_poses: jnp.ndarray, key):
        """(N, T, 7) distinct sequences sampled as one batch; with a mesh the
        N sequences fan dp-wise across chips."""
        jpos, jquat = head_poses[:, :, :3], head_poses[:, :, 3:]
        if self.mesh is not None:
            jpos, jquat, b = self._dp_shard_head(jpos, jquat)
            aa, root = self.diffusion.sample_sliding_window_w_canonical_jit(
                self.diffusion_params, key, jpos, jquat, self.stats,
                self.rest_offsets,
            )
            return aa[:b], root[:b]
        return self.diffusion.sample_sliding_window_w_canonical_jit(
            self.diffusion_params, key, jpos, jquat, self.stats,
            self.rest_offsets,
        )

    def fk(self, root_pos: jnp.ndarray, local_aa: jnp.ndarray):
        """(B, T, 3) + (B, T, 22, 3) -> (B, T, 22, 4), (B, T, 22, 3)."""
        b, t = root_pos.shape[:2]
        gq, gp = fk_mod.fk_smpl(
            root_pos.reshape(-1, 3), local_aa.reshape(-1, 22, 3), self.rest_offsets
        )
        return gq.reshape(b, t, 22, 4), gp.reshape(b, t, 22, 3)


def evaluate_sequence(
    pipeline: EgoEgoPipeline,
    gt_head_pose: np.ndarray,        # (T, 7) stage-2 condition (GT or stage-1 output)
    gt_global_jrot: jnp.ndarray,     # (T, 22, 4) GT FK rotations
    gt_global_jpos: jnp.ndarray,     # (T, 22, 3) GT FK positions (floor at z=0)
    key,
    sample_bs: int = 1,
):
    """Stage-2 generation + metric suite for one sequence, best-of-sample_bs
    by MPJPE (eval_egoego.py:345-460, eval_stage2.py metric path)."""
    local_aa, root_pos = pipeline.stage2_generate(
        jnp.asarray(gt_head_pose), key, sample_bs=sample_bs
    )
    pred_jrot, pred_jpos = pipeline.fk(root_pos, local_aa)

    t = min(pred_jpos.shape[1], gt_global_jpos.shape[0])

    # move initial head xy to the same origin (eval_egoego.py:376-383)
    gt_move = (gt_global_jpos[0:1, HEAD_IDX:HEAD_IDX + 1, :]
               * jnp.asarray([1.0, 1.0, 0.0]))[None]
    pred_move = pred_jpos[:, 0:1, HEAD_IDX:HEAD_IDX + 1, :] * jnp.asarray([1.0, 1.0, 0.0])
    gt_jpos_c = gt_global_jpos[None, :t] - gt_move
    pred_jpos_c = pred_jpos[:, :t] - pred_move

    best = None
    for s in range(sample_bs):
        pred_floor, _, _ = geometry.determine_floor_height_and_contacts(
            np.asarray(pred_jpos_c[s]), fps=30
        )
        md = metrics_mod.compute_metrics_for_smpl(
            gt_global_jrot[:t], gt_jpos_c[0], jnp.float32(0.0),
            pred_jrot[s, :t], pred_jpos_c[s], jnp.float32(pred_floor),
        )
        md = {k: np.asarray(v) for k, v in md.items()}
        if best is None or md["mpjpe"] < best[0]["mpjpe"]:
            best = (md, s)
    md, s = best
    return md, {
        "local_aa": np.asarray(local_aa[s]),
        "root_pos": np.asarray(root_pos[s]),
        "pred_jpos": np.asarray(pred_jpos_c[s]),
        "pred_jrot": np.asarray(pred_jrot[s]),
    }


def _eval_chain_dispatch(
    pipeline: EgoEgoPipeline,
    head_poses: np.ndarray,        # (N, T, 7) per-sequence conditions
    gt_global_jrot: jnp.ndarray,   # (N, T, 22, 4)
    gt_global_jpos: jnp.ndarray,   # (N, T, 22, 3)
    key,
):
    """Dispatch the diffusion chain + FK/centering WITHOUT synchronizing.
    Returns device arrays (pred_jrot, pred_jpos_c, gt_jrot_t, gt_jpos_c) so
    a pipelined caller can overlap host work with the chain."""
    hp = jnp.asarray(head_poses)
    local_aa, root_pos = pipeline.stage2_generate_batched(hp, key)

    # FK + head-xy centering as ONE jitted program (these ran as ~8 eager
    # dispatches — each a tunnel round trip on the real chip)
    if "_eval_fk_center" not in pipeline.extras:
        def _fk_center(local_aa, root_pos, gt_jrot, gt_jpos, rest):
            b, t_pred = root_pos.shape[:2]
            gq, gp = fk_mod.fk_smpl(
                root_pos.reshape(-1, 3), local_aa.reshape(-1, 22, 3), rest
            )
            pred_jrot = gq.reshape(b, t_pred, 22, 4)
            pred_jpos = gp.reshape(b, t_pred, 22, 3)
            t = min(t_pred, gt_jpos.shape[1])
            xy = jnp.asarray([1.0, 1.0, 0.0])
            gt_move = gt_jpos[:, 0:1, HEAD_IDX:HEAD_IDX + 1, :] * xy
            pred_move = pred_jpos[:, 0:1, HEAD_IDX:HEAD_IDX + 1, :] * xy
            return (pred_jrot[:, :t], pred_jpos[:, :t] - pred_move,
                    gt_jrot[:, :t], gt_jpos[:, :t] - gt_move)

        pipeline.extras["_eval_fk_center"] = jax.jit(_fk_center)
    return pipeline.extras["_eval_fk_center"](
        local_aa, root_pos, gt_global_jrot, gt_global_jpos, pipeline.rest_offsets
    )


def _eval_metrics_dispatch(pipeline: EgoEgoPipeline, chain_out,
                           extra_cols=None):
    """Dispatch the flattened metric suite directly behind the chain WITHOUT
    fetching anything: the per-sequence predicted-floor clustering runs
    INSIDE the program (ops/floor.py), so the chain's (N, T, 22, 3)
    predictions never cross the tunnel and no host sync separates the chain
    from its metrics (round-4 host-work reduction; the host path previously
    fetched every prediction purely to cluster toe heights).

    extra_cols: optional device-resident (N, E) array appended verbatim to
    the flattened output (the pipelined caller rides its stage-1 metric
    triple on the same fetch)."""
    pred_jrot, pred_jpos_c, gt_jrot_t, gt_jpos_c = chain_out

    # The whole metric suite as ONE jitted program returning ONE flattened
    # (N, K) array: unjitted, the vmapped suite dispatched every op eagerly
    # and the per-key np.asarray cost ~36 blocking tunnel round trips —
    # together they dominated evaluate_batch on the real chip (BASELINE.md
    # round-3 e2e bench).  The key/width spec is captured at trace time and
    # CACHED PER INPUT SHAPE (ADVICE r3): a single mutable closure would be
    # silently stale if a cached-shape dispatch followed a retrace and a
    # metric's width ever became shape-dependent.
    cache = pipeline.extras.setdefault("_eval_metrics_flat", {})
    shape_key = (gt_jrot_t.shape, gt_jpos_c.shape,
                 pred_jrot.shape, pred_jpos_c.shape,
                 None if extra_cols is None else extra_cols.shape)
    if shape_key not in cache:
        spec: list = []
        with_extra = extra_cols is not None

        def _metrics_flat(gt_jrot, gt_jpos_c, pred_jrot, pred_jpos_c, *extra):
            floors = floor_mod.floor_heights(pred_jpos_c)
            md = metrics_mod.batched_metrics_for_smpl(
                gt_jrot, gt_jpos_c, jnp.zeros_like(floors),
                pred_jrot, pred_jpos_c, floors,
            )
            spec.clear()
            cols = []
            for k in sorted(md):
                v = md[k].reshape(md[k].shape[0], -1)
                spec.append((k, v.shape[1]))
                cols.append(v)
            if with_extra:
                # pass-through columns (e.g. the stage-1 metric triple) so
                # the pipelined caller collects ONE array instead of two
                # (each fetch is a blocking tunnel round trip); rows are
                # sample-major groups, so per-sequence extras repeat
                rep = pred_jrot.shape[0] // extra[0].shape[0]
                cols.append(jnp.repeat(extra[0], rep, axis=0))
            return jnp.concatenate(cols, axis=1)

        cache[shape_key] = (jax.jit(_metrics_flat), spec,
                            0 if extra_cols is None else extra_cols.shape[-1])
    metrics_fn, spec, n_extra = cache[shape_key]
    args = (gt_jrot_t, gt_jpos_c, pred_jrot, pred_jpos_c)
    if extra_cols is not None:
        args = args + (extra_cols,)
    flat = metrics_fn(*args)
    return flat, spec, n_extra


def _unflatten_metrics(flat: np.ndarray, spec) -> list[dict]:
    out = []
    for s in range(flat.shape[0]):
        d, o = {}, 0
        for k, w in spec:
            d[k] = flat[s, o] if w == 1 else flat[s, o : o + w]
            o += w
        out.append(d)
    return out


def _eval_metrics_collect(pipeline: EgoEgoPipeline, dispatched) -> list[dict]:
    """Fetch the flattened metric array (ONE device->host transfer) and
    unpack it into per-sequence metric dicts using the spec captured by the
    same-shape trace that produced it."""
    flat_dev, spec, n_extra = dispatched
    flat = np.asarray(flat_dev)
    if n_extra:
        flat = flat[:, :-n_extra]
    return _unflatten_metrics(flat, spec)


def select_best_of(mds: list[dict], n_seqs: int, sample_bs: int) -> list[dict]:
    """Best-of-sample_bs selection by MPJPE (eval_egoego.py:345-460): mds is
    sample-major within each sequence ((seq 0, s 0..S-1), (seq 1, ...))."""
    assert len(mds) == n_seqs * sample_bs
    return [
        min(mds[i * sample_bs : (i + 1) * sample_bs],
            key=lambda d: float(d["mpjpe"]))
        for i in range(n_seqs)
    ]


def _tile_samples(head_poses, gt_jrot, gt_jpos, sample_bs: int):
    """(N, ...) -> (N*S, ...), sample index fastest (seq-major groups).
    jnp.repeat keeps device-resident conditioning on device (np.repeat on a
    jax array would force a host fetch + re-upload through the tunnel)."""
    return (
        jnp.repeat(jnp.asarray(head_poses), sample_bs, axis=0),
        jnp.repeat(gt_jrot, sample_bs, axis=0),
        jnp.repeat(gt_jpos, sample_bs, axis=0),
    )


def evaluate_batch(
    pipeline: EgoEgoPipeline,
    head_poses: np.ndarray,        # (N, T, 7) per-sequence conditions
    gt_global_jrot: jnp.ndarray,   # (N, T, 22, 4)
    gt_global_jpos: jnp.ndarray,   # (N, T, 22, 3)
    key,
    sample_bs: int = 1,
):
    """Batched multi-sequence eval: N sequences (x sample_bs best-of-N
    candidates each) sampled in ONE diffusion chain (batch dim = sequences x
    samples, the SURVEY §2.4 fan-in) + vmapped metrics.  The reference
    evaluates sequences one at a time (eval_stage2.py per-seq loop); on TPU
    batching N*S single-window sequences costs the same 1000 steps once.

    Floor estimation runs IN-PROGRAM via ops/floor.py (fixed-shape 1-D
    DBSCAN: sort + searchsorted + segment medians, fused into the metric
    program by _eval_metrics_dispatch — documented f32 deviation from the
    reference's host-side sklearn DBSCAN; see gt_from_smpl_params_batched
    and REFERENCE_PARITY.md "floor height").
    Returns a list of N metric dicts (each the best of its sample_bs
    candidates by MPJPE, matching evaluate_sequence's selection).
    """
    n = np.asarray(head_poses).shape[0]
    if sample_bs > 1:
        head_poses, gt_global_jrot, gt_global_jpos = _tile_samples(
            head_poses, gt_global_jrot, gt_global_jpos, sample_bs
        )
    chain_out = _eval_chain_dispatch(
        pipeline, head_poses, gt_global_jrot, gt_global_jpos, key
    )
    flat = _eval_metrics_dispatch(pipeline, chain_out)
    mds = _eval_metrics_collect(pipeline, flat)
    return select_best_of(mds, n, sample_bs) if sample_bs > 1 else mds


def gt_from_smpl_params(pipeline: EgoEgoPipeline, trans, root_orient, body_pose):
    """AMASS-style params -> GT FK (jrot (T,22,4), jpos (T,22,3)) + floor snap
    + GT head pose (eval_stage2.py:114-160)."""
    local_aa = jnp.concatenate(
        [jnp.asarray(root_orient)[:, None, :], jnp.asarray(body_pose).reshape(-1, 21, 3)],
        axis=1,
    )
    gq, gp = fk_mod.fk_smpl(jnp.asarray(trans), local_aa, pipeline.rest_offsets)
    floor, _, _ = geometry.determine_floor_height_and_contacts(np.asarray(gp), fps=30)
    gp = gp.at[:, :, 2].add(-floor)
    head_pose = jnp.concatenate([gp[:, HEAD_IDX, :], gq[:, HEAD_IDX, :]], axis=-1)
    return gq, gp, head_pose


def _ensure_gt_programs(pipeline: EgoEgoPipeline):
    """Install the fused GT-prep programs: SMPL params (or kinpoly qpos) ->
    FK -> per-sequence floor clustering (ops/floor.py, on device) -> floor
    snap -> GT head pose, as ONE jitted dispatch per batch.  Round-3 ran FK,
    a (N,T,22,3) fetch, HOST clustering, a floors upload, and a snap
    dispatch — five tunnel round trips where one suffices."""
    if "_gt_prep" in pipeline.extras:
        return

    def _finish(gq, gp):
        floors = floor_mod.floor_heights(gp)
        gp = gp - floors[:, None, None, None] * jnp.asarray([0.0, 0.0, 1.0])
        head_pose = jnp.concatenate(
            [gp[:, :, HEAD_IDX], gq[:, :, HEAD_IDX]], axis=-1
        )
        return gq, gp, head_pose

    def _gt_prep(packed, rest):
        # packed (N, T, 69) = trans 3 | root_orient 3 | body_pose 63 — one
        # upload instead of three (each a tunnel round trip)
        n, t = packed.shape[:2]
        trans = packed[..., :3]
        local_aa = jnp.concatenate(
            [packed[..., None, 3:6], packed[..., 6:].reshape(n, t, 21, 3)],
            axis=2,
        )
        gq, gp = fk_mod.fk_smpl(
            trans.reshape(n * t, 3), local_aa.reshape(n * t, 22, 3), rest
        )
        return _finish(gq.reshape(n, t, 22, 4), gp.reshape(n, t, 22, 3))

    def _gt_prep_qpos(qpos, rest):
        trans, aa24 = jax.vmap(geometry.qpos_to_smpl)(qpos)
        n, t = qpos.shape[:2]
        return _gt_prep(
            jnp.concatenate(
                [trans, aa24[:, :, 0], aa24[:, :, 1:22].reshape(n, t, 63)],
                axis=-1,
            ),
            rest,
        )

    pipeline.extras["_gt_prep"] = jax.jit(_gt_prep)
    pipeline.extras["_gt_prep_qpos"] = jax.jit(_gt_prep_qpos)


def gt_from_smpl_params_batched(pipeline: EgoEgoPipeline, trans, root_orient,
                                body_pose):
    """Batched GT prep: (N, T, ...) params -> (jrot (N,T,22,4), jpos
    (N,T,22,3), head_pose (N,T,7)) as one device program and one packed
    upload — no device->host transfers.

    Deviation note: the floor clustering runs on device (ops/floor.py
    docstring); the per-sequence `gt_from_smpl_params` keeps the
    reference-exact host/sklearn path."""
    _ensure_gt_programs(pipeline)
    packed = np.concatenate([
        np.asarray(trans, np.float32),
        np.asarray(root_orient, np.float32),
        np.asarray(body_pose, np.float32),
    ], axis=-1)
    return pipeline.extras["_gt_prep"](
        jnp.asarray(packed), pipeline.rest_offsets
    )


def run_batches_pipelined(pipeline: EgoEgoPipeline, batches: list[dict], key,
                          sample_bs: int = 1):
    """Software-pipelined full-flow eval over multiple sequence batches.

    Each batch dict: records (list of stage-1 eval records, or None to
    condition on the GT head pose), and the GT bodies as EITHER SMPL params
    — gt_trans (N,T,3), gt_root_orient (N,T,3), gt_body_pose (N,T,63) —
    OR kinpoly qpos records — gt_qpos (N,T,76), decoded on device via the
    qpos->SMPL codec (eval_egoego.py:315-322).  Optional gt_head_pose
    (N,T,7) overrides the FK-derived head pose for the stage-1 metrics
    (eval_egoego compares against the RECORD head pose, :297-312).  Returns
    a list (per batch) of
    {"metrics": [N per-sequence metric dicts], "s1": (e, o, t) arrays | None}.

    Single-TPU schedule (round-5, zero steady-state transfers): batch k+1's
    small device programs (fused GT prep incl. floor clustering + snap,
    stage-1 nets, and the pre-chain program — stage-1 metric triple + chain
    conditioning assembly, all ON DEVICE) are dispatched BEFORE chain k, so
    on the FIFO device queue they execute ahead of it; the only remaining
    per-iteration host work is input stacking/uploads for batch k+1 and ONE
    blocking fetch (the flattened metric array, with the stage-1 triple
    riding as pass-through columns).  Each chain's metric suite (with the
    predicted-floor clustering inside it, ops/floor.py) is dispatched
    straight behind the chain with no host sync in between; per iteration
    the queue is
      [... chain k-1][metrics k-1][gt_prep k+1][stage1 k+1][prechain k+1][chain k]...
    Round-4 kept the chain conditioning on host — two (N,T,7) fetches, one
    packed upload and one re-upload per iteration (~5 tunnel round trips at
    ~0.1 s each) that exceeded the chain's slack; moving them in-program is
    what closed the gap to the chain-bound ideal (BASELINE.md round-5).
    Numerically identical to the sequential gt_from_smpl_params_batched +
    stage1_head_pose_batched + evaluate_batch composition (same programs,
    same keys; slicing/add/sub moved device-side are the same IEEE f32 ops
    in the same order): tests/test_eval_pipeline.py."""
    n_b = len(batches)
    if n_b == 0:
        return []
    keys = jax.random.split(key, n_b)

    results: list = [None] * n_b

    def _collect(slot):
        """The ONE host block per iteration: fetch the flattened metric
        array; the stage-1 triple rides its last columns (sample-major
        rows, so per-sequence extras repeat sample_bs times)."""
        j, n_seqs, dispatched = slot
        flat_dev, spec, n_extra = dispatched
        flat = np.asarray(flat_dev)
        mds = _unflatten_metrics(
            flat[:, :-n_extra] if n_extra else flat, spec
        )
        if sample_bs > 1:
            mds = select_best_of(mds, n_seqs, sample_bs)
        s1 = None
        if n_extra:
            s1_np = flat[::sample_bs, -n_extra:]
            s1 = (s1_np[:, 0].copy(), s1_np[:, 1].copy(), s1_np[:, 2].copy())
        results[j] = {"metrics": mds, "s1": s1}

    _ensure_gt_programs(pipeline)

    def _prefetch(k):
        """Upload batch k's inputs and dispatch its small device programs.
        Called before chain k-1's dispatch, so they run ahead of it and
        their outputs feed chain k with no further transfers."""
        batch = batches[k]
        records = batch.get("records")
        if "gt_qpos" in batch:
            qpos = np.asarray(batch["gt_qpos"], np.float32)
            t_gt = qpos.shape[1]
            gq, gp, head_dev = pipeline.extras["_gt_prep_qpos"](
                jnp.asarray(qpos), pipeline.rest_offsets
            )
        else:
            t_gt = np.asarray(batch["gt_trans"]).shape[1]
            gq, gp, head_dev = gt_from_smpl_params_batched(
                pipeline, batch["gt_trans"], batch["gt_root_orient"],
                batch["gt_body_pose"],
            )
        s1_out = (pipeline.stage1_head_pose_batched(records)
                  if records is not None else None)
        ghp = (jnp.asarray(np.asarray(batch["gt_head_pose"], np.float32))
               if "gt_head_pose" in batch else None)
        return {"t_gt": t_gt, "gq": gq, "gp": gp,
                "head": head_dev, "s1": s1_out, "ghp": ghp}

    def _prechain(pf):
        """Dispatch the pre-chain program on batch k's device-resident
        prefetch outputs: stage-1 metric triple (initial-xy normalization +
        head-pose metrics) and the chain-conditioning assembly (trim +
        floor-align to the snapped GT start, eval_egoego:334), with NO
        host transfers.  Trim lengths are static (derived from input
        shapes), so the program caches per shape combination."""
        t_gt, s1_out, head_dev, ghp = (pf["t_gt"], pf["s1"], pf["head"],
                                       pf["ghp"])
        if s1_out is None:
            # GT-head mode: condition on the (device-resident) GT head pose
            return {"hp": head_dev, "gq": pf["gq"], "gp": pf["gp"],
                    "s1m": None}
        s1h = s1_out["head_pose"]
        # Trim the stage-1 head pose to min(qpos len, GT head-pose len)
        # when an explicit GT head pose is given — the per-sequence
        # eval_egoego path trims to the GT head-pose length, so trimming
        # to t_gt alone would condition the chain on a longer head
        # trajectory than the sequential flow (ADVICE r3).
        t_hp = t_gt if ghp is None else min(t_gt, ghp.shape[1])
        cache = pipeline.extras.setdefault("_prechain_prog", {})
        ck = (tuple(s1h.shape), tuple(head_dev.shape),
              None if ghp is None else tuple(ghp.shape), t_hp)
        if ck not in cache:
            has_ghp = ghp is not None

            def _prog(s1h, gt_head, *extra):
                hp = s1h[:, :t_hp]
                # min-trim for the stage-1 metrics, mirroring
                # stage1_metrics's per-sequence min() (stage-1 output / GT
                # lengths may differ); normalization BEFORE the floor-align
                # (z rides the raw stage-1 height, as in the host path)
                gt_cmp = extra[0] if has_ghp else gt_head
                t_cmp = min(t_hp, gt_cmp.shape[1])
                pred, gt = hp[:, :t_cmp], gt_cmp[:, :t_cmp]
                pred = jnp.concatenate(
                    [pred[..., :2] - pred[:, 0:1, :2], pred[..., 2:]], -1)
                gt = jnp.concatenate(
                    [gt[..., :2] - gt[:, 0:1, :2], gt[..., 2:]], -1)
                hd, hrd, hte = jax.vmap(
                    lambda pt, pq, gtt, gtq:
                        metrics_mod.compute_head_pose_metrics(
                            pt, rot.quat_to_matrix(pq),
                            gtt, rot.quat_to_matrix(gtq))
                )(pred[..., :3], pred[..., 3:], gt[..., :3], gt[..., 3:])
                s1m = jnp.stack([hd, hrd, hte], axis=-1)
                # floor-align predicted heads to the GT start
                # (eval_egoego:334); gt_head[:, 0, :3] IS the snapped
                # first-frame head position
                shift = gt_head[:, 0:1, :3] - hp[:, 0:1, :3]
                hp = jnp.concatenate([hp[..., :3] + shift, hp[..., 3:]], -1)
                return hp, s1m

            cache[ck] = jax.jit(_prog)
        args = (s1h, head_dev) + (() if ghp is None else (ghp,))
        hp, s1m = cache[ck](*args)
        return {"hp": hp, "gq": pf["gq"], "gp": pf["gp"], "s1m": s1m}

    pf_next = _prefetch(0)
    pending = None  # (idx, n_seqs, (flat device array, spec, n_extra))
    for k in range(n_b):
        # (1) dispatch batch k's pre-chain program (device-only; its inputs
        # ran ahead of chain k-1, so it clears the queue before chain k)
        prep = _prechain(pf_next)
        # (2) upload batch k+1's inputs + dispatch its small programs
        # BEFORE chain k; this host work overlaps chain k-1's execution
        pf_next = _prefetch(k + 1) if k + 1 < n_b else None
        # (3) dispatch chain k, then its metric suite straight behind it —
        # the floor clustering lives inside the metric program, so no host
        # sync separates a chain from its metrics
        hp, gq, gp = prep["hp"], prep["gq"], prep["gp"]
        n_seqs = hp.shape[0]
        if sample_bs > 1:
            hp, gq, gp = _tile_samples(hp, gq, gp, sample_bs)
        chain_out = _eval_chain_dispatch(pipeline, hp, gq, gp, keys[k])
        dispatched = _eval_metrics_dispatch(pipeline, chain_out,
                                            extra_cols=prep["s1m"])
        # (4) collect batch k-1 — the one host block per iteration; its
        # metric program completed right after chain k-1 while chain k
        # keeps the device busy
        if pending is not None:
            _collect(pending)
        pending = (k, n_seqs, dispatched)

    _collect(pending)
    return results


def stage1_metrics(head_pose_pred: np.ndarray, head_pose_gt: np.ndarray):
    """Stage-1 metric triple with the initial-xy normalization
    (eval_egoego.py:297-312)."""
    pred = np.array(head_pose_pred, copy=True)
    gt = np.array(head_pose_gt, copy=True)
    t = min(pred.shape[0], gt.shape[0])
    pred, gt = pred[:t], gt[:t]
    pred[:, :2] -= pred[0:1, :2]
    gt[:, :2] -= gt[0:1, :2]
    hd, hrd, hte = metrics_mod.compute_head_pose_metrics(
        jnp.asarray(pred[:, :3]), rot.quat_to_matrix(jnp.asarray(pred[:, 3:])),
        jnp.asarray(gt[:, :3]), rot.quat_to_matrix(jnp.asarray(gt[:, 3:])),
    )
    return float(hd), float(hrd), float(hte)
