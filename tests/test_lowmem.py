"""Backend low-memory update: the fused one-program path must match the
unfused (steps x chunks host-dispatch) oracle exactly — same chunking, same
GraphAgg frame slots, same DBA plan, same op order (factor_graph.py:255-302
semantics)."""

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig


def make_cfg():
    # fp32 compute: this oracle asserts *structural* fused-vs-chunked
    # equivalence to tight tolerance; bf16 matmuls accumulate differently
    # across the two batch shapes
    return SLAMConfig(
        image_size=(64, 96), buffer=16, warmup=4,
        max_factors=24, edge_bucket=32, inactive_bucket=8,
        pose_bucket=8, backend_edge_cap=32, backend_chunk=8,
        compute_dtype="float32", backend_hidden_dtype="float32",
    )


def stage_video(cfg, T=8, seed=7):
    rng = np.random.default_rng(seed)
    video = Video(cfg)
    video.counter = T
    h, w = cfg.ht8, cfg.wd8
    fd = video.state.fmaps.dtype
    video.state = video.state._replace(
        fmaps=video.state.fmaps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, 1, h, w, 128)),
                        jnp.float32).astype(fd)),
        nets=video.state.nets.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)),
                        jnp.float32).astype(fd)),
        inps=video.state.inps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)),
                        jnp.float32).astype(fd)),
        poses=video.state.poses.at[:T].set(
            lie.se3_exp(jnp.asarray(
                np.cumsum(rng.normal(size=(T, 6)) * 0.02, 0), jnp.float32))),
        disps=video.state.disps.at[:T].set(
            jnp.asarray(0.5 + 0.3 * rng.random((T, h, w)), jnp.float32)),
        intrinsics=video.state.intrinsics.at[:T].set(
            jnp.asarray([w * 4.0, w * 4.0, w / 2, h / 2])),
    )
    return video


def build_graph(cfg, net, params, seed=7):
    video = stage_video(cfg, seed=seed)
    graph = FactorGraph(
        net, params, video, cfg, corr_impl="alt",
        max_factors=cfg.max_factors, edge_bucket=cfg.backend_edge_cap,
        inactive_bucket=8,
    )
    T = video.counter
    ii, jj = [], []
    for i in range(T):
        for j in range(max(0, i - 2), i):
            ii += [i, j]
            jj += [j, i]
    graph.add_factors(np.asarray(ii, np.int32), np.asarray(jj, np.int32))
    return graph


def test_fused_lowmem_matches_chunked_oracle():
    cfg = make_cfg()
    net, params = init_params(cfg, seed=0)

    g_fused = build_graph(cfg, net, params)
    g_ref = build_graph(cfg, net, params)
    assert g_fused.n_edges == g_ref.n_edges > cfg.backend_chunk  # >1 chunk

    g_fused.update_lowmem(steps=2)
    g_ref._update_lowmem_chunked(steps=2)

    T = g_ref.video.counter
    for name, a, b in [
        ("poses", g_fused.video.state.poses[:T], g_ref.video.state.poses[:T]),
        ("disps", g_fused.video.state.disps[:T], g_ref.video.state.disps[:T]),
        ("damping", g_fused.video.state.damping[:T],
         g_ref.video.state.damping[:T]),
        ("target", g_fused.target, g_ref.target),
        ("weight", g_fused.weight, g_ref.weight),
        ("net", g_fused.net, g_ref.net),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)


def test_pose_bucket_tiers():
    """pose_bucket_for doubles to cover the span instead of jumping to the
    full buffer (the dense reduced camera system is [6P, 6P])."""
    from lgu_slam_tpu.slam.factor_graph import pose_bucket_for

    cfg = SLAMConfig()  # pose_bucket=40, buffer=512
    assert pose_bucket_for(cfg, 30) == 40
    assert pose_bucket_for(cfg, 40) == 40
    assert pose_bucket_for(cfg, 41) == 80
    assert pose_bucket_for(cfg, 127) == 160
    assert pose_bucket_for(cfg, 320) == 320
    assert pose_bucket_for(cfg, 500) == 512
    assert pose_bucket_for(cfg, 512) == 512
