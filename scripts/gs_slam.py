#!/usr/bin/env python
"""3DGS mapping over a saved SLAM reconstruction (reference:
to3DGS/executeSlam.py + pc2mesh.py): loads the .npz exported by
scripts/demo.py, fits an isotropic Gaussian-splat scene with the
SplaTAM-style mapping loop, renders each frame and fuses a TSDF mesh.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--reconstruction", required=True,
                   help=".npz from scripts/demo.py")
    p.add_argument("--out", default="gs_scene.npz")
    p.add_argument("--mesh", default=None, help="optional mesh .ply output")
    p.add_argument("--mapping_iters", type=int, default=60)
    p.add_argument("--capacity", type=int, default=400000)
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.gs.mapping import GaussianMapper, GSConfig
    from lgu_slam_tpu.gs.render import render_rgbd
    from lgu_slam_tpu.gs.tsdf import TSDFVolume, write_mesh_ply
    from lgu_slam_tpu.lie import so3_matrix

    data = np.load(args.reconstruction)
    images = data["images"]  # [T, H, W, 3] BGR uint8
    disps = data["disps"]
    poses = data["poses"]  # [T, 7] w2c
    intr8 = data["intrinsics"][0]  # 1/8 scale

    T = len(images) if args.max_frames is None else min(
        len(images), args.max_frames
    )
    H, W = images.shape[1:3]
    h, w = disps.shape[1:3]
    scale = H // h  # 1 if disps_up saved, 8 otherwise
    intr = intr8 * 8.0 / scale
    img_size = (h * 1, w * 1) if scale == 1 else (h, w)

    cfg = GSConfig(capacity=args.capacity, mapping_iters=args.mapping_iters)
    mapper = GaussianMapper(cfg, img_size)

    def frame_data(t):
        img = images[t]
        if scale != 1:
            img = img[scale // 2::scale, scale // 2::scale]
        im = img[..., ::-1].astype(np.float32) / 255.0
        depth = 1.0 / np.maximum(np.asarray(disps[t]), 1e-3)
        R = np.asarray(so3_matrix(jnp.asarray(poses[t, 3:7])))
        tr = poses[t, :3]
        return (
            jnp.asarray(im), jnp.asarray(depth),
            jnp.asarray(R), jnp.asarray(tr), jnp.asarray(intr),
        )

    window = []
    for t in range(T):
        im, depth, R, tr, K = frame_data(t)
        mapper.add_frame_gaussians(
            np.asarray(im), np.asarray(depth), R, tr, intr, t
        )
        window.append((im, depth, R, tr, K))
        window = window[-cfg.mapping_window_size:]
        losses = mapper.map_frame(window)
        msg = (
            f"frame {t}: {mapper.map.count} gaussians, "
            f"loss {losses[-1]:.4f}"
        )
        if t % 10 == 0:
            # truncation telemetry: the span/k_max caps drop
            # contributions silently (reference rasterizer is exact)
            st = mapper.truncation_stats(window[-1])
            if st["dropped_pairs_kmax"] or st["clamped_radius"]:
                msg += (
                    f"  [TRUNCATED: {st['dropped_pairs_kmax']} pairs past "
                    f"k_max (max tile load {st['max_tile_load']}), "
                    f"{st['clamped_radius']} radii clamped — raise "
                    "cfg.k_max/span]"
                )
        print(msg)

    np.savez_compressed(
        args.out,
        **{k: np.asarray(v) for k, v in mapper.map.params.items()},
        alive=mapper.map.alive,
        timestep=mapper.map.timestep,
    )
    print("scene ->", args.out)

    if args.mesh:
        # render-and-fuse (pc2mesh.py:86-144)
        alive = mapper.map.alive_device()
        pts = np.asarray(mapper.map.params["means3D"])[mapper.map.alive]
        lo = pts.min(0) - 0.2
        hi = pts.max(0) + 0.2
        vol = TSDFVolume(lo, hi, voxel_size=args.voxel)
        for t in range(T):
            im, depth, R, tr, K = frame_data(t)
            img_r, depth_r, sil, _ = render_rgbd(
                mapper.map.params, alive, R, tr, K, img_size,
                span=cfg.span, k_max=cfg.k_max,
            )
            d = np.where(np.asarray(sil) > 0.5, np.asarray(depth_r), 0.0)
            vol.integrate(d, np.asarray(img_r), intr, R, tr)
        V, C, Tri = vol.extract_mesh()
        write_mesh_ply(args.mesh, V, C, Tri)
        print(f"mesh: {len(V)} verts, {len(Tri)} tris -> {args.mesh}")


if __name__ == "__main__":
    main()
