"""Pipeline orchestration: batched vs per-sequence eval consistency."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
    NormStats,
)
from egoego_release_tpu.eval.pipeline import (
    EgoEgoPipeline,
    evaluate_batch,
    evaluate_sequence,
    gt_from_smpl_params,
    stage1_metrics,
)

CFG = DiffusionConfig(
    d_feats=198, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
    window=12, timesteps=8, overlap_frames=4,
)


def make_pipeline(seed=0):
    diff = CondGaussianDiffusion(CFG)
    params = diff.init_params(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1).at[0].set(0.0)
    stats = NormStats(jnp.full((22, 3), -3.0), jnp.full((22, 3), 3.0))
    return EgoEgoPipeline(
        diffusion=diff, diffusion_params=params, stats=stats, rest_offsets=rest
    )


def synth_gt(pipeline, t=12, seed=1):
    rng = np.random.RandomState(seed)
    trans = np.cumsum(rng.randn(t, 3).astype(np.float32) * 0.02, 0)
    root_orient = (rng.randn(t, 3) * 0.2).astype(np.float32)
    body = (rng.randn(t, 63) * 0.2).astype(np.float32)
    return gt_from_smpl_params(pipeline, trans, root_orient, body)


def test_gt_from_smpl_params_floor_snapped():
    pipe = make_pipeline()
    gq, gp, head_pose = synth_gt(pipe)
    assert gq.shape == (12, 22, 4) and gp.shape == (12, 22, 3)
    assert head_pose.shape == (12, 7)
    # head pose equals the FK head joint
    np.testing.assert_allclose(
        np.asarray(head_pose[:, :3]), np.asarray(gp[:, 15]), atol=1e-6
    )


def test_evaluate_sequence_and_batch_consistency():
    pipe = make_pipeline()
    gts = [synth_gt(pipe, seed=s) for s in (1, 2, 3)]
    key = jax.random.PRNGKey(7)

    batch_mds = evaluate_batch(
        pipe,
        np.stack([np.asarray(g[2]) for g in gts]),
        jnp.stack([g[0] for g in gts]),
        jnp.stack([g[1] for g in gts]),
        key,
    )
    assert len(batch_mds) == 3
    for md in batch_mds:
        assert np.isfinite(md["mpjpe"]) and np.isfinite(md["head_dist"])
        assert md["single_jpe"].shape == (22,)

    # per-sequence path produces the same metric KEYS and finite values
    md1, extras = evaluate_sequence(
        pipe, np.asarray(gts[0][2]), gts[0][0], gts[0][1], key
    )
    assert set(md1) == set(batch_mds[0])
    assert extras["local_aa"].shape == (12, 22, 3)


def _stage1_pipe_and_records(n_records=3, t=16):
    from egoego_release_tpu.models.gravitynet import HeadNormalFormer
    from egoego_release_tpu.models.headnet import HeadFormer

    pipe = make_pipeline()
    headnet = HeadFormer(d_model=32, n_layers=1, n_head=2, d_k=16, d_v=16,
                         window=8)
    gravitynet = HeadNormalFormer(d_model=32, n_layers=1, n_head=2, d_k=16,
                                  d_v=16, window=t)
    pipe.headnet = headnet
    pipe.headnet_params = headnet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 512)), jnp.ones((1, 8))
    )
    pipe.gravitynet = gravitynet
    pipe.gravitynet_params = gravitynet.init(
        jax.random.PRNGKey(2), jnp.zeros((1, t, 18)), jnp.ones((1, t))
    )

    rng = np.random.RandomState(3)
    records = []
    for _ in range(n_records):
        q = rng.randn(t, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        mats = np.stack([
            np.eye(3, dtype=np.float32) for _ in range(t)
        ])
        records.append({
            "of": rng.randn(t, 512).astype(np.float32),
            "head_pose": np.concatenate(
                [rng.randn(t, 3).astype(np.float32), q], axis=-1
            ),
            "aligned_slam_trans": np.cumsum(
                rng.randn(t, 3).astype(np.float32) * 0.02, 0
            ),
            "ori_slam_trans": np.cumsum(
                rng.randn(t, 3).astype(np.float32) * 0.02, 0
            ),
            "ori_slam_rot_mat": mats,
        })
    return pipe, records


def test_stage1_batched_matches_per_record():
    """stage1_head_pose_batched (one vmapped jit across sequences — the
    round-3 tunnel-round-trip fix) must reproduce the per-record path."""
    pipe, records = _stage1_pipe_and_records()

    batched = pipe.stage1_head_pose_batched(records)
    for i, rec in enumerate(records):
        single = pipe.stage1_head_pose(rec)
        np.testing.assert_allclose(
            np.asarray(batched["head_pose"][i]),
            np.asarray(single["head_pose"]), atol=2e-4,
        )
        np.testing.assert_allclose(
            float(batched["pred_scale"][i]), float(single["pred_scale"]),
            rtol=1e-4,
        )


def test_stage1_of_bf16_close_to_f32():
    """of_bf16 (bf16 OF upload, the fast-mode byte-stream lever) must stay
    within bf16-rounding distance of the f32 path: same shapes, finite, and
    head pose close at a tolerance far below any metric's resolution."""
    pipe, records = _stage1_pipe_and_records()
    ref = pipe.stage1_head_pose_batched(records)

    pipe_bf = EgoEgoPipeline(
        diffusion=pipe.diffusion, diffusion_params=pipe.diffusion_params,
        stats=pipe.stats, rest_offsets=pipe.rest_offsets,
        headnet=pipe.headnet, headnet_params=pipe.headnet_params,
        gravitynet=pipe.gravitynet, gravitynet_params=pipe.gravitynet_params,
        of_bf16=True,
    )
    out = pipe_bf.stage1_head_pose_batched(records)
    hp_ref = np.asarray(ref["head_pose"])
    hp = np.asarray(out["head_pose"])
    assert hp.shape == hp_ref.shape and np.isfinite(hp).all()
    # bf16 has ~8 mantissa bits; transformer + integration keeps the head
    # pose within ~1e-2 of f32 on O(1)-magnitude synthetic features
    np.testing.assert_allclose(hp, hp_ref, atol=2e-2)
    # mixed tolerance: pred_scale components can be near zero on a random
    # net, where pure rtol is meaningless
    np.testing.assert_allclose(
        np.asarray(out["pred_scale"]), np.asarray(ref["pred_scale"]),
        rtol=2e-2, atol=5e-3,
    )


def test_stage1_of_int8_close_to_f32():
    """of_int8 (int8 OF upload with per-frame absmax scales, the fast-mode
    byte-stream lever one step past bf16) must stay within quantization
    distance of the f32 path: same shapes, finite, head pose close at a
    tolerance looser than bf16's (error is relative to the row PEAK)."""
    pipe, records = _stage1_pipe_and_records()
    ref = pipe.stage1_head_pose_batched(records)

    pipe_q = EgoEgoPipeline(
        diffusion=pipe.diffusion, diffusion_params=pipe.diffusion_params,
        stats=pipe.stats, rest_offsets=pipe.rest_offsets,
        headnet=pipe.headnet, headnet_params=pipe.headnet_params,
        gravitynet=pipe.gravitynet, gravitynet_params=pipe.gravitynet_params,
        of_int8=True,
    )
    out = pipe_q.stage1_head_pose_batched(records)
    hp_ref = np.asarray(ref["head_pose"])
    hp = np.asarray(out["head_pose"])
    assert hp.shape == hp_ref.shape and np.isfinite(hp).all()
    # int8 per-row symmetric quantization: <= absmax/254 per element; the
    # transformer + integration keeps the head pose within a few 1e-2 on
    # O(1)-magnitude synthetic features
    np.testing.assert_allclose(hp, hp_ref, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(out["pred_scale"]), np.asarray(ref["pred_scale"]),
        rtol=5e-2, atol=1e-2,
    )


def test_stage1_of_bf16_int8_mutually_exclusive():
    pipe, records = _stage1_pipe_and_records()
    pipe_bad = EgoEgoPipeline(
        diffusion=pipe.diffusion, diffusion_params=pipe.diffusion_params,
        stats=pipe.stats, rest_offsets=pipe.rest_offsets,
        headnet=pipe.headnet, headnet_params=pipe.headnet_params,
        gravitynet=pipe.gravitynet, gravitynet_params=pipe.gravitynet_params,
        of_bf16=True, of_int8=True,
    )
    with pytest.raises(ValueError):
        pipe_bad.stage1_head_pose_batched(records)


def test_stage1_metrics_identity():
    rng = np.random.RandomState(4)
    q = rng.randn(10, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    pose = np.concatenate([rng.randn(10, 3).astype(np.float32), q], -1)
    hd, hrd, hte = stage1_metrics(pose, pose)
    assert hd < 1e-4 and hrd < 1e-4 and hte < 1e-2


def test_pipeline_deterministic_under_fixed_seed():
    """Same key -> bit-identical generation (regression guard: the reference
    relies on global torch RNG and is not reproducible)."""
    pipe = make_pipeline()
    gq, gp, head_pose = synth_gt(pipe, t=20)
    k = jax.random.PRNGKey(42)
    aa1, r1 = pipe.stage2_generate(head_pose, k)
    aa2, r2 = pipe.stage2_generate(head_pose, k)
    np.testing.assert_array_equal(np.asarray(aa1), np.asarray(aa2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    aa3, _ = pipe.stage2_generate(head_pose, jax.random.PRNGKey(43))
    assert np.abs(np.asarray(aa1) - np.asarray(aa3)).max() > 1e-6


def test_batched_eval_under_dp_mesh():
    """Eval fan-out across a dp mesh: sequences sharded over 8 virtual
    devices produce the same metrics as unsharded evaluation."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from egoego_release_tpu.parallel.mesh import make_mesh

    pipe = make_pipeline()
    gts = [synth_gt(pipe, seed=s) for s in range(8)]
    heads = np.stack([np.asarray(g[2]) for g in gts])
    jrot = jnp.stack([g[0] for g in gts])
    jpos = jnp.stack([g[1] for g in gts])
    key = jax.random.PRNGKey(11)

    plain = evaluate_batch(pipe, heads, jrot, jpos, key)

    mesh = make_mesh(dp=8, tp=1)
    shard = NamedSharding(mesh, P("dp"))
    heads_s = jax.device_put(jnp.asarray(heads), shard)
    jrot_s = jax.device_put(jrot, shard)
    jpos_s = jax.device_put(jpos, shard)
    with mesh:
        sharded = evaluate_batch(pipe, heads_s, jrot_s, jpos_s, key)

    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(float(a["mpjpe"]), float(b["mpjpe"]), rtol=1e-4)
        np.testing.assert_allclose(float(a["head_dist"]), float(b["head_dist"]), rtol=1e-4)


def test_headformer_with_cnn_path():
    from egoego_release_tpu.models.headnet import HeadFormer, HeadFormerWithCNN

    hf = HeadFormer(d_model=16, n_layers=1, n_head=2, d_k=8, d_v=8, window=4,
                    cnn_fdim=32, mlp_hsize=(8,))
    model = HeadFormerWithCNN(headformer=hf)
    rng = np.random.RandomState(0)
    flow = jnp.asarray(rng.randn(1, 4, 64, 64, 2).astype(np.float32))
    mask = jnp.ones((1, 4))
    params = model.init(jax.random.PRNGKey(0), flow, mask)
    # BatchNorm uses current-batch statistics (reference running_stats=False),
    # so apply is mutable over batch_stats
    (va, dist), _ = model.apply(params, flow, mask, mutable=["batch_stats"])
    assert va.shape == (1, 4, 3) and dist.shape == (1, 4, 1)
    assert np.isfinite(np.asarray(va)).all()


def test_run_batches_pipelined_matches_sequential():
    """The software-pipelined multi-batch driver must be numerically
    IDENTICAL to the sequential gt-prep + stage-1 + evaluate_batch
    composition (same jitted programs, same per-batch keys — only the
    host/device interleave differs)."""
    from egoego_release_tpu.models.gravitynet import HeadNormalFormer
    from egoego_release_tpu.models.headnet import HeadFormer
    from egoego_release_tpu.eval.pipeline import (
        gt_from_smpl_params_batched,
        run_batches_pipelined,
    )

    pipe = make_pipeline()
    t = 16
    headnet = HeadFormer(d_model=32, n_layers=1, n_head=2, d_k=16, d_v=16,
                         window=8)
    gravitynet = HeadNormalFormer(d_model=32, n_layers=1, n_head=2, d_k=16,
                                  d_v=16, window=t)
    pipe.headnet = headnet
    pipe.headnet_params = headnet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 512)), jnp.ones((1, 8))
    )
    pipe.gravitynet = gravitynet
    pipe.gravitynet_params = gravitynet.init(
        jax.random.PRNGKey(2), jnp.zeros((1, t, 18)), jnp.ones((1, t))
    )

    rng = np.random.RandomState(5)

    def make_batch(n):
        records = []
        for _ in range(n):
            q = rng.randn(t, 4).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            records.append({
                "of": rng.randn(t, 512).astype(np.float32),
                "head_pose": np.concatenate(
                    [rng.randn(t, 3).astype(np.float32), q], axis=-1
                ),
                "aligned_slam_trans": np.cumsum(
                    rng.randn(t, 3).astype(np.float32) * 0.02, 0
                ),
                "ori_slam_trans": np.cumsum(
                    rng.randn(t, 3).astype(np.float32) * 0.02, 0
                ),
                "ori_slam_rot_mat": np.stack(
                    [np.eye(3, dtype=np.float32)] * t
                ),
            })
        return {
            "records": records,
            "gt_trans": np.cumsum(rng.randn(n, t, 3).astype(np.float32) * 0.02, 1),
            "gt_root_orient": (rng.randn(n, t, 3) * 0.2).astype(np.float32),
            "gt_body_pose": (rng.randn(n, t, 63) * 0.2).astype(np.float32),
        }

    batches = [make_batch(3), make_batch(3)]
    key = jax.random.PRNGKey(9)
    got = run_batches_pipelined(pipe, batches, key)

    keys = jax.random.split(key, len(batches))
    for k, batch in enumerate(batches):
        gq, gp, gt_head = gt_from_smpl_params_batched(
            pipe, batch["gt_trans"], batch["gt_root_orient"],
            batch["gt_body_pose"],
        )
        s1 = pipe.stage1_head_pose_batched(batch["records"])
        hp = np.array(s1["head_pose"])[:, :t]
        hp[:, :, :3] += np.asarray(gp[:, 0:1, 15]) - hp[:, 0:1, :3]
        want = evaluate_batch(pipe, hp, gq, gp, keys[k])
        assert len(got[k]["metrics"]) == len(want)
        for g, w in zip(got[k]["metrics"], want):
            assert set(g) == set(w)
            for name in w:
                np.testing.assert_array_equal(g[name], w[name])
        s1m = got[k]["s1"]
        assert s1m is not None and all(np.isfinite(v).all() for v in s1m)

    # GT-head mode (records=None): conditions on the GT head pose
    gt_batches = [{k2: v for k2, v in b.items() if k2 != "records"}
                  for b in batches]
    got_gt = run_batches_pipelined(pipe, gt_batches, key)
    for k, batch in enumerate(gt_batches):
        gq, gp, gt_head = gt_from_smpl_params_batched(
            pipe, batch["gt_trans"], batch["gt_root_orient"],
            batch["gt_body_pose"],
        )
        want = evaluate_batch(pipe, np.asarray(gt_head), gq, gp, keys[k])
        for g, w in zip(got_gt[k]["metrics"], want):
            for name in w:
                np.testing.assert_array_equal(g[name], w[name])
        assert got_gt[k]["s1"] is None


def test_evaluate_batch_best_of_samples():
    """sample_bs>1 in the BATCHED path: seqs x samples fan into one chain and
    per-sequence best-of-N selection matches picking the min-MPJPE candidate
    from the full candidate list (same key => identical chain outputs)."""
    from egoego_release_tpu.eval.pipeline import (
        _eval_chain_dispatch,
        _eval_metrics_collect,
        _eval_metrics_dispatch,
        _tile_samples,
        select_best_of,
    )

    pipe = make_pipeline()
    gts = [synth_gt(pipe, seed=s) for s in (4, 5)]
    hp = np.stack([np.asarray(g[2]) for g in gts])
    gq = jnp.stack([g[0] for g in gts])
    gp = jnp.stack([g[1] for g in gts])
    key = jax.random.PRNGKey(21)
    s = 3

    best = evaluate_batch(pipe, hp, gq, gp, key, sample_bs=s)

    hp_t, gq_t, gp_t = _tile_samples(hp, gq, gp, s)
    chain_out = _eval_chain_dispatch(pipe, hp_t, gq_t, gp_t, key)
    all_mds = _eval_metrics_collect(
        pipe, _eval_metrics_dispatch(pipe, chain_out)
    )
    assert len(all_mds) == 2 * s
    want = select_best_of(all_mds, 2, s)
    for b, w in zip(best, want):
        np.testing.assert_array_equal(b["mpjpe"], w["mpjpe"])
        np.testing.assert_array_equal(b["single_jpe"], w["single_jpe"])
    # selection really is the group minimum
    for i, b in enumerate(best):
        grp = [float(m["mpjpe"]) for m in all_mds[i * s:(i + 1) * s]]
        assert float(b["mpjpe"]) == min(grp)
        assert len(set(grp)) == s  # candidates genuinely differ (noise)


def test_select_best_of_unit():
    from egoego_release_tpu.eval.pipeline import select_best_of

    mds = [{"mpjpe": v} for v in (3.0, 1.0, 2.0, 5.0, 4.0, 6.0)]
    best = select_best_of(mds, 2, 3)
    assert [b["mpjpe"] for b in best] == [1.0, 4.0]
