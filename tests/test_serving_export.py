"""AOT serving-export roundtrip: serialized StableHLO artifacts must
reproduce the live programs to float32 precision and lower for TPU from
this CPU host (cross-platform export)."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
    NormStats,
)
from egoego_release_tpu.eval.pipeline import EgoEgoPipeline
from egoego_release_tpu.serving import (
    export_chain,
    export_stage1,
    load_artifact,
    save_artifact,
)

CFG = DiffusionConfig(
    d_feats=198, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
    window=12, timesteps=8, overlap_frames=4,
)


def make_pipeline(seed=0, with_stage1=False):
    diff = CondGaussianDiffusion(CFG)
    params = diff.init_params(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1).at[0].set(0.0)
    stats = NormStats(jnp.full((22, 3), -3.0), jnp.full((22, 3), 3.0))
    pipe = EgoEgoPipeline(
        diffusion=diff, diffusion_params=params, stats=stats, rest_offsets=rest
    )
    if with_stage1:
        from egoego_release_tpu.models.gravitynet import HeadNormalFormer
        from egoego_release_tpu.models.headnet import HeadFormer

        t = 16
        pipe.headnet = HeadFormer(d_model=32, n_layers=1, n_head=2, d_k=16,
                                  d_v=16, window=8)
        pipe.headnet_params = pipe.headnet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 512)), jnp.ones((1, 8))
        )
        pipe.gravitynet = HeadNormalFormer(d_model=32, n_layers=1, n_head=2,
                                           d_k=16, d_v=16, window=t)
        pipe.gravitynet_params = pipe.gravitynet.init(
            jax.random.PRNGKey(2), jnp.zeros((1, t, 18)), jnp.ones((1, t))
        )
    return pipe


def test_chain_export_roundtrip_matches_live(tmp_path):
    pipe = make_pipeline()
    b, t = 2, 16
    exp = export_chain(pipe, b, t, platforms=("cpu",))
    path = str(tmp_path / "chain.stablehlo")
    save_artifact(exp, path)
    loaded = load_artifact(path)

    rng = np.random.RandomState(3)
    jpos = np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1)
    q = rng.randn(b, t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(7)

    aa_live, root_live = pipe.diffusion.sample_sliding_window_w_canonical_jit(
        pipe.diffusion_params, key, jnp.asarray(jpos), jnp.asarray(q),
        pipe.stats, pipe.rest_offsets,
    )
    aa_art, root_art = loaded.call(
        jax.random.key_data(key), jnp.asarray(jpos), jnp.asarray(q)
    )
    # deserialized modules recompile; XLA may re-fuse, so bit-identity is
    # not guaranteed — float32-precision agreement is
    np.testing.assert_allclose(np.asarray(aa_live), np.asarray(aa_art),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(root_live), np.asarray(root_art),
                               atol=2e-5, rtol=2e-5)


def test_stage1_export_roundtrip_matches_live(tmp_path):
    pipe = make_pipeline(with_stage1=True)
    b, t = 3, 16
    exp = export_stage1(pipe, b, t, platforms=("cpu",))
    path = str(tmp_path / "s1.stablehlo")
    save_artifact(exp, path)
    loaded = load_artifact(path)

    rng = np.random.RandomState(4)
    q0 = rng.randn(b, 4).astype(np.float32)
    q0 /= np.linalg.norm(q0, axis=-1, keepdims=True)
    args = (
        rng.randn(b, t - 1, 512).astype(np.float32),
        q0,
        np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1),
        np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1),
        np.stack([np.stack([np.eye(3, dtype=np.float32)] * t)] * b),
        rng.randn(b, t, 7).astype(np.float32),
    )
    jargs = tuple(jnp.asarray(a) for a in args)
    live = pipe._stage1_fn(batched=True)(
        pipe.headnet_params, pipe.gravitynet_params, *jargs
    )
    art = loaded.call(*jargs)
    for lv, av in zip(live, art):
        np.testing.assert_allclose(np.asarray(lv), np.asarray(av),
                                   atol=2e-5, rtol=2e-5)


def test_chain_exports_for_tpu_from_cpu_host():
    """Cross-platform lowering: a CPU build host can emit the TPU serving
    artifact (deploy-time compile only, no chip needed to export)."""
    pipe = make_pipeline()
    exp = export_chain(pipe, 2, 16, platforms=("tpu", "cpu"))
    blob = exp.serialize()
    assert len(blob) > 1000
    assert "tpu" in [p.lower() for p in exp.platforms]


def test_fk_export_roundtrip_matches_live(tmp_path):
    from egoego_release_tpu.serving import export_fk

    pipe = make_pipeline()
    b, t = 2, 10
    exp = export_fk(pipe, b, t, platforms=("cpu",))
    path = str(tmp_path / "fk.stablehlo")
    save_artifact(exp, path)
    loaded = load_artifact(path)

    rng = np.random.RandomState(6)
    root = rng.randn(b, t, 3).astype(np.float32)
    aa = (rng.randn(b, t, 22, 3) * 0.3).astype(np.float32)
    jr_live, jp_live = pipe.fk(jnp.asarray(root), jnp.asarray(aa))
    jr_art, jp_art = loaded.call(jnp.asarray(root), jnp.asarray(aa))
    np.testing.assert_allclose(np.asarray(jr_live), np.asarray(jr_art),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(jp_live), np.asarray(jp_art),
                               atol=2e-5, rtol=2e-5)


def test_sharded_chain_export_roundtrip(tmp_path):
    """dp-sharded serving artifact on the 8-device virtual mesh: roundtrips,
    runs dp-sharded, and matches the unsharded live chain."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from egoego_release_tpu.parallel.mesh import make_mesh
    from egoego_release_tpu.serving import export_chain_sharded

    pipe = make_pipeline()
    mesh = make_mesh(dp=8, tp=1)
    b, t = 8, 16
    exp = export_chain_sharded(pipe, b, t, mesh, platforms=("cpu",))
    assert exp.nr_devices == 8
    path = str(tmp_path / "chain_dp8.stablehlo")
    save_artifact(exp, path)
    loaded = load_artifact(path)

    rng = np.random.RandomState(8)
    jpos = np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1)
    q = rng.randn(b, t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(12)

    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    aa_art, root_art = loaded.call(
        jax.device_put(np.asarray(jax.random.key_data(key)), rep),
        jax.device_put(jpos, dp),
        jax.device_put(q, dp),
    )
    assert "dp" in str(aa_art.sharding.spec)

    aa_live, root_live = pipe.diffusion.sample_sliding_window_w_canonical_jit(
        pipe.diffusion_params, key, jnp.asarray(jpos), jnp.asarray(q),
        pipe.stats, pipe.rest_offsets,
    )
    # sharded compile reassociates a few reductions vs the single-device
    # program; drift is float32-noise level
    np.testing.assert_allclose(np.asarray(aa_live), np.asarray(aa_art),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(root_live), np.asarray(root_art),
                               atol=2e-4, rtol=2e-4)


def test_e2e_export_roundtrip_matches_live(tmp_path):
    """Whole-system artifact (stage1 -> chain -> FK in ONE program) matches
    the live three-stage composition with the same key."""
    from egoego_release_tpu.serving import export_e2e

    pipe = make_pipeline(with_stage1=True)
    b, t = 2, 16
    exp = export_e2e(pipe, b, t, floor_offset=0.07, platforms=("cpu",))
    path = str(tmp_path / "e2e.stablehlo")
    save_artifact(exp, path)
    loaded = load_artifact(path)

    rng = np.random.RandomState(9)
    q0 = rng.randn(b, 4).astype(np.float32)
    q0 /= np.linalg.norm(q0, axis=-1, keepdims=True)
    args = (
        rng.randn(b, t - 1, 512).astype(np.float32),
        q0,
        np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1),
        np.cumsum(rng.randn(b, t, 3).astype(np.float32) * 0.02, 1),
        np.stack([np.stack([np.eye(3, dtype=np.float32)] * t)] * b),
        rng.randn(b, t, 7).astype(np.float32),
    )
    jargs = tuple(jnp.asarray(a) for a in args)
    key = jax.random.PRNGKey(33)

    out = loaded.call(jax.random.key_data(key), *jargs)
    aa_a, root_a, jrot_a, jpos_a, hp_a, scale_a = out

    hp, scale, _ = pipe._stage1_fn(batched=True)(
        pipe.headnet_params, pipe.gravitynet_params, *jargs
    )
    hp = hp.at[..., 2].add(0.07)
    aa, root = pipe.diffusion.sample_sliding_window_w_canonical_jit(
        pipe.diffusion_params, key, hp[..., :3], hp[..., 3:],
        pipe.stats, pipe.rest_offsets,
    )
    jrot, jpos = pipe.fk(root, aa)

    for got, want in ((aa_a, aa), (root_a, root), (jrot_a, jrot),
                      (jpos_a, jpos), (hp_a, hp), (scale_a, scale)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
