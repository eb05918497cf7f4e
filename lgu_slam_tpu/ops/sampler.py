"""Correlation-volume sampling ops (XLA gather formulation).

Re-designs of the reference CUDA samplers with exact boundary semantics:

- :func:`corr_index` — plain windowed lookup
  (/root/reference/src/correlation_kernels.cu and
  offersample_LGS/corrSample_kernel.cu).
- :func:`defcorr_index` — deformable lookup with per-tap learned offsets
  (offersample_LGS/defCorrSample_kernel.cu:26-91).  The sample point of tap
  (i, j) is ``coords + offset[i,j] + (i - r, j - r)``; the *floor corner*
  must be in bounds or the tap output is exactly 0; the three partial
  corners are zero-padded.  The center tap's offset is forced to zero in
  the forward pass but still receives the analytic gradient of the
  formula evaluated at zero (the CUDA kernel mutates the offset buffer
  in place, :51-52 and :122-123, so its backward differentiates through
  the zeroed value) — reproduced here with a straight-through trick.
- :func:`gaussian_window_mask` — the learnable Gaussian re-weighting
  (offersample_LGS/gaussianAttn.cu:20-68): within a (2r+1)^2 window around
  ``floor(mean)``, multiply the volume by ``3*exp(-0.5*((x-mx)^2/c1 +
  (y-my)^2/c2))``; everything outside the window is zero.  Implemented as
  a dense fused elementwise expression (XLA fuses it into the volume
  producer), so autodiff gives the analytic mean/cov gradients that the
  reference hand-codes (gaussianAttn.cu:102-131).

Everything here is pure jnp — differentiable, jit/vmap-safe.  Pallas fused
variants live in :mod:`lgu_slam_tpu.ops.pallas_corr`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_volume(volume_flat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                   H2: int, W2: int) -> jnp.ndarray:
    """Gather volume rows at integer (iy, ix) with zero padding.

    volume_flat: [B, HW1, H2*W2]; iy/ix: [B, HW1, K] int32.
    Returns [B, HW1, K].
    """
    ok = (iy >= 0) & (iy < H2) & (ix >= 0) & (ix < W2)
    idx = jnp.where(ok, iy * W2 + ix, 0)
    vals = jnp.take_along_axis(volume_flat, idx, axis=-1)
    # gather in the storage dtype (e.g. bf16 pyramids), accumulate in fp32
    return jnp.where(ok, vals, 0).astype(jnp.float32)


def _window_taps(radius: int):
    """Tap deltas in the reference channel order: channel = i * rd + j with
    i indexing x and j indexing y (defCorrSample_kernel.cu:54-66)."""
    rd = 2 * radius + 1
    di = jnp.arange(rd) - radius  # x taps
    dj = jnp.arange(rd) - radius  # y taps
    dx = jnp.repeat(di, rd)  # [K] channel-major: i*rd + j
    dy = jnp.tile(dj, rd)
    return dx, dy


def sample_taps_flat(vol: jnp.ndarray, H2: int, W2: int,
                     px: jnp.ndarray, py: jnp.ndarray):
    """Bilinear sample from a *flattened* volume.

    vol: [B, P1, H2*W2] (keeping the volume flat avoids TPU lane padding of
    small trailing dims and the relayout copy a reshape would cost);
    px/py: [B, P1, K].  Returns [B, P1, K].
    """
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    dx = px - x1
    dy = py - y1
    x1 = x1.astype(jnp.int32)
    y1 = y1.astype(jnp.int32)

    # floor corner must be in bounds, else the tap is exactly zero
    base_ok = (x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)

    v11 = _gather_volume(vol, y1, x1, H2, W2)
    v21 = _gather_volume(vol, y1, x1 + 1, H2, W2)
    v12 = _gather_volume(vol, y1 + 1, x1, H2, W2)
    v22 = _gather_volume(vol, y1 + 1, x1 + 1, H2, W2)

    out = (
        v11 * (1.0 - dy) * (1.0 - dx)
        + v21 * (1.0 - dy) * dx
        + v12 * dy * (1.0 - dx)
        + v22 * dy * dx
    )
    return jnp.where(base_ok, out, 0.0)


def _sample_taps(volume: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """5-D volume wrapper over :func:`sample_taps_flat`.

    volume: [B, H1, W1, H2, W2]; px/py: [B, H1, W1, K].
    """
    B, H1, W1, H2, W2 = volume.shape
    K = px.shape[-1]
    out = sample_taps_flat(
        volume.reshape(B, H1 * W1, H2 * W2), H2, W2,
        px.reshape(B, H1 * W1, K), py.reshape(B, H1 * W1, K),
    )
    return out.reshape(B, H1, W1, K)


def sample_taps_patch_flat(
    vol_flat: jnp.ndarray,
    H2: int,
    W2: int,
    base: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    R: int,
    acc_dtype=jnp.float32,
) -> jnp.ndarray:
    """Bilinear tap sampling via bounded-patch extraction (TPU fast path).

    Mathematically identical to :func:`sample_taps_flat` whenever every
    tap position lies within ``[floor(base) - R, floor(base) + R + 1)``
    per axis (guaranteed by construction for windowed lookups: R =
    window_radius + max_learned_offset).  Instead of per-element gathers
    — which XLA lowers to a catastrophic scalar loop on TPU (~2.5 s per
    frontend lookup measured on v5e) — this:

    1. extracts an ``A x A`` patch (A = 2R + 2) around ``floor(base)``
       with two one-hot contractions (MXU matmuls; out-of-range rows/
       cols produce all-zero one-hots = the reference's zero padding);
    2. evaluates each tap as a separable bilinear *tent* contraction
       within the patch: ``out[k] = ky[k] . patch . kx[k]`` where
       ``ky/kx`` are 2-hot linear-interpolation weights;
    3. zeroes taps whose floor corner is out of bounds, matching the
       CUDA boundary semantics (defCorrSample_kernel.cu:48-52).

    vol_flat: [B, P1, H2*W2]; base: [B, P1, 2] (x, y); px/py: [B, P1, K].
    Returns [B, P1, K] float32.
    """
    B, P1, _ = vol_flat.shape
    K = px.shape[-1]
    A = 2 * R + 2

    fx = jnp.floor(base[..., 0]).astype(jnp.int32)  # [B, P1]
    fy = jnp.floor(base[..., 1]).astype(jnp.int32)

    # --- 1) patch extraction: rows then cols (one-hot matmuls) ---
    ar = jnp.arange(A, dtype=jnp.int32)
    rows_idx = fy[..., None] + (ar - R)  # [B, P1, A]
    cols_idx = fx[..., None] + (ar - R)
    oy = (rows_idx[..., None] == jnp.arange(H2, dtype=jnp.int32)).astype(
        acc_dtype
    )  # [B, P1, A, H2]
    ox = (cols_idx[..., None] == jnp.arange(W2, dtype=jnp.int32)).astype(
        acc_dtype
    )  # [B, P1, A, W2]

    vol4 = vol_flat.reshape(B, P1, H2, W2).astype(acc_dtype)
    rows = jnp.einsum(
        "epah,ephw->epaw", oy, vol4, preferred_element_type=jnp.float32
    ).astype(acc_dtype)  # [B, P1, A, W2]
    patch = jnp.einsum(
        "epbw,epaw->epab", ox, rows, preferred_element_type=jnp.float32
    ).astype(acc_dtype)  # [B, P1, A(y), A(x)]

    # --- 2) separable bilinear tents inside the patch ---
    ty = py - (fy[..., None] - R).astype(py.dtype)  # [B, P1, K] in [0, A-1)
    tx = px - (fx[..., None] - R).astype(px.dtype)
    arf = jnp.arange(A, dtype=jnp.float32)
    ky = jnp.maximum(0.0, 1.0 - jnp.abs(ty[..., None] - arf)).astype(
        acc_dtype
    )  # [B, P1, K, A]
    kx = jnp.maximum(0.0, 1.0 - jnp.abs(tx[..., None] - arf)).astype(
        acc_dtype
    )
    tmp = jnp.einsum(
        "epka,epab->epkb", ky, patch, preferred_element_type=jnp.float32
    )  # [B, P1, K, A]
    out = jnp.einsum(
        "epkb,epkb->epk", kx.astype(jnp.float32), tmp,
        preferred_element_type=jnp.float32,
    )

    # --- 3) floor-corner-in-bounds zeroing (exact CUDA semantics) ---
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    base_ok = (x1 >= 0) & (x1 < W2) & (y1 >= 0) & (y1 < H2)
    return jnp.where(base_ok, out, 0.0)


def corr_index_patch_flat(vol_flat: jnp.ndarray, H2: int, W2: int,
                          coords: jnp.ndarray, radius: int,
                          acc_dtype=jnp.float32) -> jnp.ndarray:
    """Plain windowed lookup via the patch fast path (R = radius)."""
    dx, dy = _window_taps(radius)
    px = coords[..., 0:1] + dx
    py = coords[..., 1:2] + dy
    return sample_taps_patch_flat(
        vol_flat, H2, W2, coords, px, py, radius, acc_dtype=acc_dtype
    )


def defcorr_index_patch_flat(
    vol_flat: jnp.ndarray,
    H2: int,
    W2: int,
    coords: jnp.ndarray,
    offset: jnp.ndarray,
    radius: int,
    max_offset: int = 4,
    acc_dtype=jnp.float32,
) -> jnp.ndarray:
    """Deformable lookup via the patch fast path.

    ``max_offset`` bounds |learned offset| per axis (the offset heads are
    tanh-normalized x4, modules/corr.py:127-129), so R = radius +
    max_offset covers every tap.  Offsets are clipped to the bound as a
    safety net (a no-op for tanh x4; keeps the patch guarantee exact).
    """
    rd = 2 * radius + 1
    center = jnp.zeros((rd, rd, 1), offset.dtype).at[radius, radius, 0].set(1.0)
    offset = offset - center * jax.lax.stop_gradient(offset)
    offset = jnp.clip(offset, -max_offset, max_offset)

    dx, dy = _window_taps(radius)
    off = offset.reshape(offset.shape[:2] + (rd * rd, 2))
    px = coords[..., 0:1] + off[..., 0] + dx
    py = coords[..., 1:2] + off[..., 1] + dy
    return sample_taps_patch_flat(
        vol_flat, H2, W2, coords, px, py, radius + max_offset,
        acc_dtype=acc_dtype,
    )


def corr_index_flat(vol_flat: jnp.ndarray, H2: int, W2: int,
                    coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Plain lookup on a flat volume: vol [B, P1, H2*W2],
    coords [B, P1, 2] -> [B, P1, K]."""
    dx, dy = _window_taps(radius)
    px = coords[..., 0:1] + dx
    py = coords[..., 1:2] + dy
    return sample_taps_flat(vol_flat, H2, W2, px, py)


def defcorr_index_flat(
    vol_flat: jnp.ndarray,
    H2: int,
    W2: int,
    coords: jnp.ndarray,
    offset: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Deformable lookup on a flat volume: vol [B, P1, H2*W2],
    coords [B, P1, 2], offset [B, P1, rd, rd, 2] -> [B, P1, K]."""
    rd = 2 * radius + 1
    center = jnp.zeros((rd, rd, 1), offset.dtype).at[radius, radius, 0].set(1.0)
    offset = offset - center * jax.lax.stop_gradient(offset)

    dx, dy = _window_taps(radius)
    off = offset.reshape(offset.shape[:2] + (rd * rd, 2))
    px = coords[..., 0:1] + off[..., 0] + dx
    py = coords[..., 1:2] + off[..., 1] + dy
    return sample_taps_flat(vol_flat, H2, W2, px, py)


def corr_index(volume: jnp.ndarray, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Plain correlation lookup.

    volume: [B, H1, W1, H2, W2]; coords: [B, H1, W1, 2] (x, y) in level
    pixels.  Returns [B, K, H1, W1] with K = (2r+1)^2 channels ordered as
    i*rd+j (x-major), matching the CUDA output layout [B, i, j, H1, W1].
    """
    dx, dy = _window_taps(radius)
    px = coords[..., 0:1] + dx
    py = coords[..., 1:2] + dy
    out = _sample_taps(volume, px, py)
    return out.transpose(0, 3, 1, 2)


def defcorr_index(
    volume: jnp.ndarray,
    coords: jnp.ndarray,
    offset: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Deformable correlation lookup.

    volume: [B, H1, W1, H2, W2]; coords: [B, H1, W1, 2] (x, y);
    offset: [B, H1, W1, rd, rd, 2] with offset[..., i, j, :] the (x, y)
    shift of tap (i, j) — i indexes x, j indexes y (the kernel uses x1 ~ i,
    y1 ~ j; defCorrSample_kernel.cu:63-66).
    Returns [B, K, H1, W1].
    """
    rd = 2 * radius + 1
    # center-tap offset forced to zero, straight-through gradient
    center = jnp.zeros((rd, rd, 1), offset.dtype).at[radius, radius, 0].set(1.0)
    offset = offset - center * jax.lax.stop_gradient(offset)

    dx, dy = _window_taps(radius)
    off = offset.reshape(offset.shape[:3] + (rd * rd, 2))
    px = coords[..., 0:1] + off[..., 0] + dx
    py = coords[..., 1:2] + off[..., 1] + dy
    out = _sample_taps(volume, px, py)
    return out.transpose(0, 3, 1, 2)


def gaussian_window_mask(
    volume: jnp.ndarray,
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    radius: int = 4,
) -> jnp.ndarray:
    """Windowed Gaussian re-weighting of the correlation volume.

    volume: [B, H1, W1, H2, W2]; mean: [B, H1, W1, 2] (x, y) in target
    pixels; cov: [B, H1, W1, 2] per-axis variances.
    Returns the masked volume (zero outside the window), to be combined by
    the caller as ``masked / (2*pi*sqrt(det)) + volume``
    (gaussianMask_cuda.py:84-86).
    """
    B, H1, W1, H2, W2 = volume.shape
    mx = mean[..., 0][..., None, None]  # [B, H1, W1, 1, 1]
    my = mean[..., 1][..., None, None]
    c1 = cov[..., 0][..., None, None]
    c2 = cov[..., 1][..., None, None]

    x2 = jnp.arange(W2, dtype=volume.dtype)
    y2 = jnp.arange(H2, dtype=volume.dtype)
    ddx = x2[None, None, None, None, :] - mx  # [B, H1, W1, 1, W2]
    ddy = y2[None, None, None, :, None] - my  # [B, H1, W1, H2, 1]

    # window membership uses floor(mean) (gaussianAttn.cu:51-56)
    fx = jnp.floor(mx)
    fy = jnp.floor(my)
    in_x = jnp.abs(x2[None, None, None, None, :] - fx) <= radius
    in_y = jnp.abs(y2[None, None, None, :, None] - fy) <= radius

    g = 3.0 * jnp.exp(-0.5 * (ddx * ddx / c1 + ddy * ddy / c2))
    return jnp.where(in_x & in_y, volume * g, 0.0)
