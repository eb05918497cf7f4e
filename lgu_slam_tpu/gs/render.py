"""Differentiable 3-D Gaussian splatting renderer in pure JAX.

TPU-native re-design of the reference's CUDA tile rasterizer
(to3DGS/diff_gaussian_rasterization/cuda_rasterizer/{forward,backward}.cu):

- EWA projection of 3-D Gaussians to 2-D conics (forward.cu ``preprocess``),
  including the 0.3-pixel low-pass dilation;
- 16x16 tile binning via a device-side sort of (tile, depth-rank) keys
  (rasterizer_impl.cu duplicate-key radix sort) with a static per-Gaussian
  tile-span cap and per-tile top-K depth-sorted lists;
- front-to-back alpha compositing as a cumulative product over the K list
  (forward.cu ``renderCUDA``), vectorized over whole tiles;
- the backward pass is jax.grad through the whole thing — no hand-written
  VJP needed.

Used with sh_degree=0 + precomputed colors only (executeSlam.py), so SH
evaluation is out of scope.  Depth+silhouette rendering reuses the same
kernel with (z, 1, z^2) pseudo-colors (slam_helpers.py:172-213).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TILE = 16
ALPHA_MIN = 1.0 / 255.0


def quat_to_rotmat_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3] (to3DGS convention:
    slam_external build_rotation)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = jnp.split(q, 4, axis=-1)
    r0 = jnp.concatenate(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
    )
    r1 = jnp.concatenate(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
    )
    r2 = jnp.concatenate(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def project_gaussians(means_cam, quats, scales, intr, img_size):
    """EWA projection (forward.cu computeCov2D).

    means_cam [N,3] camera-space; quats [N,4] wxyz; scales [N,3];
    intr (fx, fy, cx, cy).  Returns (xy [N,2], depth [N], conic [N,3]
    (a, b, c of inverse cov), radius [N]).
    """
    fx, fy, cx, cy = intr
    X, Y, Z = means_cam[:, 0], means_cam[:, 1], means_cam[:, 2]
    Zs = jnp.maximum(Z, 1e-6)
    x = fx * X / Zs + cx
    y = fy * Y / Zs + cy

    R = quat_to_rotmat_wxyz(quats)
    S = scales[:, :, None] * jnp.eye(3)
    M = R @ S
    cov3d = M @ M.transpose(0, 2, 1)

    o = jnp.zeros_like(Zs)
    J = jnp.stack(
        [
            jnp.stack([fx / Zs, o, -fx * X / (Zs * Zs)], -1),
            jnp.stack([o, fy / Zs, -fy * Y / (Zs * Zs)], -1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    cov2d = J @ cov3d @ J.transpose(0, 2, 1)
    # low-pass dilation (forward.cu: += 0.3)
    cov2d = cov2d + 0.3 * jnp.eye(2)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = jnp.maximum(a * c - b * b, 1e-12)
    conic = jnp.stack([c / det, -b / det, a / det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    return jnp.stack([x, y], -1), Z, conic, radius


@partial(
    jax.jit,
    static_argnames=(
        "img_size", "span", "k_max", "tile_chunk", "channels", "with_stats",
    ),
)
def render_gaussians(
    means3d,
    quats,
    scales,
    opacities,
    colors,
    alive,
    w2c_rot,
    w2c_trans,
    intr,
    *,
    img_size: tuple,
    span: int = 6,
    k_max: int = 96,
    tile_chunk: int = 64,
    channels: int = 3,
    xy_offset=None,
    with_stats: bool = False,
):
    """Render [H, W, channels] image + [H, W] silhouette + [H, W] depth.

    means3d [N,3] world; quats [N,4] wxyz; scales [N,3]; opacities [N];
    colors [N,channels]; alive [N] bool mask (padded capacity);
    w2c_rot [3,3], w2c_trans [3].

    Static knobs: ``span`` caps the tile footprint of one Gaussian at
    span x span tiles; ``k_max`` caps depth-sorted Gaussians per tile.
    Both caps TRUNCATE silently (the reference rasterizer is exact:
    rasterizer_impl.cu bins every duplicate key); pass
    ``with_stats=True`` to get drop telemetry for them.
    Returns (image, alpha, depth_exp) — plus a stats dict
    {dropped_pairs_kmax, clamped_radius, max_tile_load} when
    ``with_stats``.
    """
    H, W = img_size
    N = means3d.shape[0]
    n_tx = (W + TILE - 1) // TILE
    n_ty = (H + TILE - 1) // TILE
    n_tiles = n_tx * n_ty

    means_cam = means3d @ w2c_rot.T + w2c_trans
    xy, depth, conic, radius = project_gaussians(
        means_cam, quats, scales, intr, img_size
    )
    if xy_offset is not None:
        # zero-valued probe: grad wrt xy_offset == dL/dmeans2D, the
        # densification signal (gs_external.accumulate_mean2d_gradient)
        xy = xy + xy_offset

    valid = alive & (depth > 0.01) & (radius > 0)
    radius_cap = (span * TILE) / 2.0 - 1.0
    n_clamped = jnp.sum((valid & (radius > radius_cap)).astype(jnp.int32))
    radius = jnp.minimum(radius, radius_cap)

    # tile span
    tx0 = jnp.clip(jnp.floor((xy[:, 0] - radius) / TILE), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor((xy[:, 1] - radius) / TILE), 0, n_ty - 1)
    tx0 = tx0.astype(jnp.int32)
    ty0 = ty0.astype(jnp.int32)

    # depth rank for within-tile ordering
    order = jnp.argsort(depth)
    rank = jnp.zeros(N, jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32)
    )

    # (gaussian, tile) pairs: static span x span window from (tx0, ty0)
    dx = jnp.arange(span)
    dy = jnp.arange(span)
    txs = tx0[:, None, None] + dx[None, None, :]
    tys = ty0[:, None, None] + dy[None, :, None]
    # touch test: tile overlaps the circle(xy, radius)
    tcx = (txs + 0.5) * TILE
    tcy = (tys + 0.5) * TILE
    ddx = jnp.maximum(jnp.abs(xy[:, 0, None, None] - tcx) - TILE / 2, 0.0)
    ddy = jnp.maximum(jnp.abs(xy[:, 1, None, None] - tcy) - TILE / 2, 0.0)
    touches = (ddx * ddx + ddy * ddy) <= (radius[:, None, None] ** 2)
    inb = (txs < n_tx) & (tys < n_ty)
    pair_ok = touches & inb & valid[:, None, None]

    tile_id = jnp.where(pair_ok, tys * n_tx + txs, n_tiles)
    # int32 key = tile * N + rank; requires (n_tiles + 1) * N < 2^31,
    # i.e. N below ~2.5M at 800 tiles — far above SplaTAM scene sizes
    key = tile_id.astype(jnp.int32) * N + rank[:, None, None]
    key = key.reshape(-1)
    gid = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None, None], tile_id.shape
    ).reshape(-1)

    sort_idx = jnp.argsort(key)
    key_sorted = key[sort_idx]
    gid_sorted = gid[sort_idx]
    tile_sorted = (key_sorted // N).astype(jnp.int32)

    # per-tile ranges
    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles))
    ends = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles) + 1)
    tile_load = ends - starts
    dropped_kmax = jnp.sum(jnp.maximum(tile_load - k_max, 0))

    # top-K per tile (front-most K by depth)
    kidx = starts[:, None] + jnp.arange(k_max)[None, :]
    kok = kidx < ends[:, None]
    kidx = jnp.clip(kidx, 0, key.shape[0] - 1)
    tg = gid_sorted[kidx]  # [n_tiles, K]

    # gather per-gaussian data
    g_xy = xy[tg]  # [T, K, 2]
    g_conic = conic[tg]
    g_op = opacities[tg]
    g_col = colors[tg]  # [T, K, C]
    g_z = depth[tg]

    # pixel coordinates per tile
    t_ids = jnp.arange(n_tiles)
    t_x0 = (t_ids % n_tx) * TILE
    t_y0 = (t_ids // n_tx) * TILE
    px = t_x0[:, None] + jnp.tile(jnp.arange(TILE), TILE)[None, :]
    py = t_y0[:, None] + jnp.repeat(jnp.arange(TILE), TILE)[None, :]

    def composite(chunk):
        (g_xy, g_conic, g_op, g_col, g_z, kok, px, py) = chunk
        d_x = px[:, :, None] + 0.5 - g_xy[:, None, :, 0]
        d_y = py[:, :, None] + 0.5 - g_xy[:, None, :, 1]
        power = -0.5 * (
            g_conic[:, None, :, 0] * d_x * d_x
            + g_conic[:, None, :, 2] * d_y * d_y
        ) - g_conic[:, None, :, 1] * d_x * d_y
        alpha = jnp.minimum(
            g_op[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)), 0.99
        )
        alpha = jnp.where(kok[:, None, :] & (alpha >= ALPHA_MIN), alpha, 0.0)
        # exclusive transmittance
        one_m = 1.0 - alpha
        T_incl = jnp.cumprod(one_m, axis=-1)
        T_excl = T_incl / jnp.maximum(one_m, 1e-10)
        wgt = T_excl * alpha  # [t, p, K]
        img = jnp.einsum("tpk,tkc->tpc", wgt, g_col)
        acc = jnp.sum(wgt, axis=-1)
        dep = jnp.einsum("tpk,tk->tp", wgt, g_z)
        return img, acc, dep

    # chunk tiles to bound memory
    n_pad = (-n_tiles) % tile_chunk
    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)], 0
        ) if n_pad else x

    chunks = jax.tree_util.tree_map(
        lambda x: pad(x).reshape((-1, tile_chunk) + x.shape[1:]),
        (g_xy, g_conic, g_op, g_col, g_z, kok, px, py),
    )
    img, acc, dep = jax.lax.map(composite, chunks)
    img = img.reshape(-1, TILE * TILE, channels)[:n_tiles]
    acc = acc.reshape(-1, TILE * TILE)[:n_tiles]
    dep = dep.reshape(-1, TILE * TILE)[:n_tiles]

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(n_ty, n_tx, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(n_ty * TILE, n_tx * TILE, c)
        return x[:H, :W]

    out = (untile(img), untile(acc)[..., 0], untile(dep)[..., 0])
    if with_stats:
        stats = {
            # (gaussian, tile) pairs past the per-tile top-K cap — these
            # contributions are silently lost (reference is exact)
            "dropped_pairs_kmax": dropped_kmax,
            # Gaussians whose projected radius exceeded the span cap —
            # their far tiles are not covered
            "clamped_radius": n_clamped,
            "max_tile_load": jnp.max(tile_load),
        }
        return out + (stats,)
    return out


def render_rgbd(params, alive, w2c_rot, w2c_trans, intr, img_size,
                **kw):
    """Render RGB + (depth, silhouette, depth^2) — the reference runs the
    rasterizer twice with identical geometry (loss.py:48-58, one call for
    RGB and one for the depth/silhouette pseudo-colors); here both render
    as ONE 5-channel pass so the projection, tile binning, key sort, and
    compositing weights are computed once."""
    means = params["means3D"]
    quats = params["unnorm_rotations"]
    scales = jnp.exp(jnp.tile(params["log_scales"], (1, 3)))
    ops = jax.nn.sigmoid(params["logit_opacities"][:, 0])
    rgb = params["rgb_colors"]

    # depth + depth^2 pseudo-colors share the compositing weights
    zcam = means @ w2c_rot.T + w2c_trans
    z = zcam[:, 2:3]
    cols = jnp.concatenate([rgb, z, z * z], axis=-1)

    out = render_gaussians(
        means, quats, scales, ops, cols, alive, w2c_rot, w2c_trans, intr,
        img_size=img_size, channels=5, **kw,
    )
    img5, acc = out[0], out[1]
    img = img5[..., :3]
    depth = img5[..., 3]
    depth_sq = img5[..., 4]
    sil = acc
    if kw.get("with_stats"):
        return img, depth, sil, depth_sq, out[3]
    return img, depth, sil, depth_sq
