"""Inference-time dense bundle adjustment (DBA) — ba_cuda parity, TPU-first.

Re-design of /root/reference/src/droid_kernels.cu:1314-1434 (``ba_cuda``) and
its helper kernels (projective_transform_kernel :176-424, accum_cuda
:948-998, EEt6x6/Ev6x1/EvT6x1 :1001-1115, SparseBlock :1117-1219,
schur_block :1222-1311, retraction kernels :898-946).

Key TPU design decisions
------------------------
- **No host round-trip.**  The reference assembles an Eigen sparse matrix on
  the CPU and solves with SimplicialLLT in fp64 every Gauss-Newton
  iteration.  Here the reduced pose system is a dense ``[P*6, P*6]`` matrix
  (P = optimization window, padded to a static bucket) solved on-device
  with a damped Cholesky; padded poses get identity rows.
- **Static shapes + host-side planning.**  Graph topology (ii, jj) changes
  only when the host mutates the factor graph, so the Schur row grouping by
  depth frame is computed once per topology in NumPy (:class:`DbaPlan`) and
  shipped as device arrays.  The jitted step never retraces for a fixed
  (E_max, K, P, D_max) bucket.
- **Compact frame slots.**  Depth-side state (C/w/Q, E-matrix rows, Schur
  grouping, back-substitution) lives on ``K`` compact *edge-frame slots*
  (the unique source frames of the edge list, host-planned), not on the
  full N=512 keyframe buffer — an ~8x cut in HBM traffic and FLOPs for a
  48-edge frontend window.
- **Schur product as batched einsums + one-hot matmuls.**  Rows of the E
  matrix are grouped per depth slot into ``[K, D_max, 6, HW]``; the
  ``E Q E^T`` products are one MXU-batched contraction, and the assembly
  into the dense pose system uses one-hot matmul contractions instead of
  giant scatter-adds (TPU scatters with millions of duplicate indices
  serialize; matmuls don't).
- fp32 throughout with damping ``ep + lm*diag``; non-finite updates are
  replaced by zero updates (solver-failure fallback).

E-matrix row layout (compact analog of the reference's): rows [0, K) are
per-slot "self" rows (Eii aggregated over edges with source frame
kf_ids[s]; pose kf_ids[s]), rows [K, K+E) are per-edge Eij rows
(pose jj[e], depth slot edge_slot[e]).

Reference quirk replicated on purpose: the back-substitution skips rows
whose pose is exactly t0 (EvT6x1_kernel's ``idx <= 0`` guard,
droid_kernels.cu:1105-1106) while the Schur product includes them.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.lie import se3_retr

WEIGHT_SCALE = 0.001  # droid_kernels.cu:305
DEPTH_PRIOR_ALPHA = 0.05  # droid_kernels.cu:1396


@dataclass
class DbaPlan:
    """Host-computed topology plan for one factor-graph configuration.

    ``kf_ids`` lists the unique source frames of the live edges (the only
    frames whose depth the DBA touches — matching the reference, whose
    depth updates come solely from edge rows).  Row space for
    ``rows_of_frame`` is [0, K) self rows then [K, K+E) edge rows.
    """

    ii: np.ndarray  # [E] int32, padded with 0
    jj: np.ndarray  # [E]
    edge_mask: np.ndarray  # [E] float32
    kf_ids: np.ndarray  # [K] int32, padded with num_frames
    kf_mask: np.ndarray  # [K] float32
    edge_slot: np.ndarray  # [E] int32 slot of ii[e] (K for dead edges)
    rows_of_frame: np.ndarray  # [K, D_max] int32 into [K+E), -1 padded

    def jax_arrays(self):
        """The seven plan arrays as device arrays, in dba_step order."""
        return tuple(
            jnp.asarray(a) for a in (
                self.ii, self.jj, self.edge_mask, self.kf_ids,
                self.kf_mask, self.edge_slot, self.rows_of_frame,
            )
        )

    @staticmethod
    def _slots(ii, jj, mask, num_frames, dmax_bucket, frame_bucket):
        """Shared slot/grouping construction.  The bucket args are
        *floors*: callers pass their largest previously-seen buckets so
        plan shapes stay stable across topology changes (a shape change
        retraces the fused update program — tens of seconds of XLA
        compile per occurrence)."""
        E = ii.shape[0]
        live = np.nonzero(mask > 0)[0]
        kf = np.unique(ii[live]) if live.size else np.zeros(0, np.int32)
        need_k = max(8, 1 << int(np.ceil(np.log2(max(len(kf), 1)))))
        K = need_k if frame_bucket is None else max(frame_bucket, need_k)

        kf_ids = np.full(K, num_frames, np.int32)
        kf_ids[: len(kf)] = kf
        kf_mask = np.zeros(K, np.float32)
        kf_mask[: len(kf)] = 1.0
        slot_of = {int(f): s for s, f in enumerate(kf)}

        edge_slot = np.full(E, K, np.int32)
        groups = [[s] for s in range(K)]
        for e in live:
            s = slot_of[int(ii[e])]
            edge_slot[e] = s
            groups[s].append(K + int(e))
        deg = max(len(g) for g in groups)
        need_d = max(8, 1 << int(np.ceil(np.log2(deg))))
        D = need_d if dmax_bucket is None else max(dmax_bucket, need_d)
        rof = np.full((K, D), -1, np.int32)
        for s, g in enumerate(groups):
            rof[s, : len(g)] = g
        return kf_ids, kf_mask, edge_slot, rof

    @staticmethod
    def build(ii, jj, num_frames: int, edge_bucket: int,
              dmax_bucket: int | None = None,
              frame_bucket: int | None = None):
        """Plan from an edge list (host numpy).  Pads edges to ``edge_bucket``."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        E = ii.shape[0]
        if E > edge_bucket:
            raise ValueError(f"edge count {E} exceeds bucket {edge_bucket}")
        pad = edge_bucket - E
        mask = np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)])
        ii_p = np.concatenate([ii, np.zeros(pad, np.int32)])
        jj_p = np.concatenate([jj, np.zeros(pad, np.int32)])
        kf_ids, kf_mask, edge_slot, rof = DbaPlan._slots(
            ii_p, jj_p, mask, num_frames, dmax_bucket, frame_bucket
        )
        return DbaPlan(ii_p, jj_p, mask, kf_ids, kf_mask, edge_slot, rof)

    @staticmethod
    def build_masked(ii, jj, mask, num_frames: int,
                     dmax_bucket: int | None = None,
                     frame_bucket: int | None = None):
        """Plan from already-padded edge arrays with a validity mask,
        preserving slot positions (edge e -> row K + e)."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        mask = np.asarray(mask, np.float32).reshape(-1)
        kf_ids, kf_mask, edge_slot, rof = DbaPlan._slots(
            ii, jj, mask, num_frames, dmax_bucket, frame_bucket
        )
        return DbaPlan(ii, jj, mask, kf_ids, kf_mask, edge_slot, rof)


def _build_linear_system_ref(poses, disps, intrinsics, target, weight, ii,
                             jj, edge_mask):
    """Reference formulation via the generic Jacobian API (kept as the
    test oracle for :func:`_build_linear_system`; materializes
    ``[E, H, W, 2, 6]`` tensors whose tiny trailing dims are tiled
    catastrophically on TPU)."""
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd

    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True
    )
    r = target - coords  # [E,H,W,2]
    w_d = WEIGHT_SCALE * weight * valid * edge_mask[:, None, None, None]
    w_p = w_d * (ii != jj).astype(w_d.dtype)[:, None, None, None]

    X = jnp.concatenate([Ji, Jj], axis=-1)  # [E,H,W,2,12]
    wX = w_p[..., None] * X
    He = jnp.einsum("ehwca,ehwcb->eab", wX, X)
    ve = jnp.einsum("ehwca,ehwc->ea", wX, r)

    Jz0 = Jz[..., 0]  # [E,H,W,2]
    wJz_p = w_p * Jz0
    Eii = jnp.einsum("ehwc,ehwca->eahw", wJz_p, Ji).reshape(E, 6, HW)
    Eij = jnp.einsum("ehwc,ehwca->eahw", wJz_p, Jj).reshape(E, 6, HW)
    Cii = jnp.sum(w_d * Jz0 * Jz0, axis=-1).reshape(E, HW)
    bz = jnp.sum(w_d * r * Jz0, axis=-1).reshape(E, HW)
    return He, ve, Eii, Eij, Cii, bz


def _build_linear_system(poses, disps, intrinsics, target, weight, ii, jj,
                         edge_mask):
    """Per-edge Hessian/E/C/w blocks (projective_transform_kernel parity,
    droid_kernels.cu:176-424).

    TPU slab formulation: every per-pixel quantity is an ``[E, HW]`` array
    (pixels in the lane dimension) and the 2x6 Jacobians are built as 24
    such slabs stacked along a small leading axis — the generic
    ``[E, H, W, 2, 6]`` layout puts (2, 6) in the tiled trailing dims and
    measured 31 ms per call on v5e; this form is pure elementwise VPU work
    plus two ``[12, HW] x [HW, 12]`` MXU contractions.

    Returns He [E,12,12], ve [E,12], Eii/Eij [E,6,HW], Cii/bz [E,HW].
    """
    from lgu_slam_tpu.lie import se3_rel, so3_matrix  # noqa: PLC0415

    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    f32 = disps.dtype

    Gij = se3_rel(poses[ii], poses[jj])  # [E, 7]
    stereo = (ii == jj)[:, None]
    Gij = jnp.where(stereo, jnp.asarray(pops.STEREO_TIJ, dtype=Gij.dtype), Gij)
    R = so3_matrix(Gij[:, 3:7])  # [E, 3, 3] (tiny)
    Rc = [[R[:, m, k][:, None] for k in range(3)] for m in range(3)]
    tx, ty, tz = (Gij[:, k][:, None] for k in range(3))

    intr_i = intrinsics[ii]
    intr_j = intrinsics[jj]
    fxi, fyi, cxi, cyi = (intr_i[:, k][:, None] for k in range(4))
    fxj, fyj, cxj, cyj = (intr_j[:, k][:, None] for k in range(4))

    grid = pops.coords_grid(ht, wd, dtype=f32).reshape(HW, 2)
    gx = grid[None, :, 0]
    gy = grid[None, :, 1]

    d = disps[ii].reshape(E, HW)
    X0 = (gx - cxi) / fxi  # [E, HW]
    Y0 = (gy - cyi) / fyi

    X1 = Rc[0][0] * X0 + Rc[0][1] * Y0 + Rc[0][2] + d * tx
    Y1 = Rc[1][0] * X0 + Rc[1][1] * Y0 + Rc[1][2] + d * ty
    Z1 = Rc[2][0] * X0 + Rc[2][1] * Y0 + Rc[2][2] + d * tz

    valid = (Z1 > pops.MIN_DEPTH).astype(f32)
    Zc = jnp.where(Z1 < 0.5 * pops.MIN_DEPTH, 1.0, Z1)
    dd = 1.0 / Zc
    x1 = fxj * X1 * dd + cxj
    y1 = fyj * Y1 * dd + cyj

    a = fxj * dd
    bq = -fxj * X1 * dd * dd
    c = fyj * dd
    e2 = -fyj * Y1 * dd * dd

    # Jj rows (residual u, v) x 6 twist cols (projective_ops.py:79-96)
    o = jnp.zeros_like(d)
    Jju = [a * d, o, bq * d, bq * Y1, a * Z1 - bq * X1, -a * Y1]
    Jjv = [o, c * d, e2 * d, -c * Z1 + e2 * Y1, -e2 * X1, c * X1]

    # Ji = -Ad^T(Gij) Jj, componentwise (lie.se3_adjT_apply expanded):
    # for Jj row [A; B]: Ji = [-R^T A; -R^T (B - t x A)]
    def adjT_neg(row):
        A = row[:3]
        B = row[3:]
        # t x A
        cx_ = ty * A[2] - tz * A[1]
        cy_ = tz * A[0] - tx * A[2]
        cz_ = tx * A[1] - ty * A[0]
        B0 = B[0] - cx_
        B1 = B[1] - cy_
        B2 = B[2] - cz_
        out = []
        for k in range(3):
            out.append(-(Rc[0][k] * A[0] + Rc[1][k] * A[1] + Rc[2][k] * A[2]))
        for k in range(3):
            out.append(-(Rc[0][k] * B0 + Rc[1][k] * B1 + Rc[2][k] * B2))
        return out

    Jiu = adjT_neg(Jju)
    Jiv = adjT_neg(Jjv)

    Jzu = a * tx + bq * tz  # [E, HW]
    Jzv = c * ty + e2 * tz

    ru = target[..., 0].reshape(E, HW) - x1
    rv = target[..., 1].reshape(E, HW) - y1

    wdu = WEIGHT_SCALE * weight[..., 0].reshape(E, HW) * valid \
        * edge_mask[:, None]
    wdv = WEIGHT_SCALE * weight[..., 1].reshape(E, HW) * valid \
        * edge_mask[:, None]
    nonstereo = (ii != jj).astype(f32)[:, None]
    wpu = wdu * nonstereo
    wpv = wdv * nonstereo

    Xu = jnp.stack(Jiu + Jju, axis=1)  # [E, 12, HW]
    Xv = jnp.stack(Jiv + Jjv, axis=1)
    He = (
        jnp.einsum("eah,ebh->eab", wpu[:, None, :] * Xu, Xu)
        + jnp.einsum("eah,ebh->eab", wpv[:, None, :] * Xv, Xv)
    )
    ve = (
        jnp.einsum("eah,eh->ea", Xu, wpu * ru)
        + jnp.einsum("eah,eh->ea", Xv, wpv * rv)
    )

    wJzu = wpu * Jzu
    wJzv = wpv * Jzv
    Eii = jnp.stack(
        [wJzu * Jiu[k] + wJzv * Jiv[k] for k in range(6)], axis=1
    )  # [E, 6, HW]
    Eij = jnp.stack(
        [wJzu * Jju[k] + wJzv * Jjv[k] for k in range(6)], axis=1
    )
    Cii = wdu * Jzu * Jzu + wdv * Jzv * Jzv
    bz = wdu * ru * Jzu + wdv * rv * Jzv
    return He, ve, Eii, Eij, Cii, bz


def _scatter_pose_blocks(He, ve, ii, jj, t0, P):
    """Assemble the dense pose-pose system A [P,6,P,6], b [P,6]."""
    ir = ii - t0
    jr = jj - t0

    def put(A, blocks, rows, cols):
        ok = (rows >= 0) & (rows < P) & (cols >= 0) & (cols < P)
        rows = jnp.where(ok, rows, 0)
        cols = jnp.where(ok, cols, 0)
        blocks = jnp.where(ok[:, None, None], blocks, 0.0)
        return A.at[rows, :, cols, :].add(blocks)

    A = jnp.zeros((P, 6, P, 6), dtype=He.dtype)
    A = put(A, He[:, :6, :6], ir, ir)
    A = put(A, He[:, :6, 6:], ir, jr)
    A = put(A, He[:, 6:, :6], jr, ir)
    A = put(A, He[:, 6:, 6:], jr, jr)

    def putv(b, vecs, rows):
        ok = (rows >= 0) & (rows < P)
        rows = jnp.where(ok, rows, 0)
        vecs = jnp.where(ok[:, None], vecs, 0.0)
        return b.at[rows].add(vecs)

    b = jnp.zeros((P, 6), dtype=ve.dtype)
    b = putv(b, ve[:, :6], ir)
    b = putv(b, ve[:, 6:], jr)
    return A, b


def _retract_window(poses, dx, t0, N):
    """Apply dx [P,6] to poses[t0 : t0+P]; rows past the buffer are dropped.

    Uses an out-of-bounds-drop scatter on the *unclipped* index vector —
    clipping would alias several window slots onto frame N-1 and make the
    scatter nondeterministically discard a real update.
    """
    P = dx.shape[0]
    ids = jnp.arange(P) + t0
    gathered = poses[jnp.clip(ids, 0, N - 1)]
    return poses.at[ids].set(se3_retr(gathered, dx), mode="drop")


def _solve_damped(A, b, t0, t1, P, lm, ep):
    """Damped Cholesky solve with identity rows for padded/inactive poses.

    A [P,6,P,6], b [P,6] -> dx [P,6]; rows for poses outside [t0, t1)
    solve to zero.  Replaces the reference's CPU Eigen SimplicialLLT
    (droid_kernels.cu:1192-1213) with an on-device dense solve.
    """
    pose_ids = jnp.arange(P) + t0
    active = (pose_ids < t1).astype(A.dtype)
    am = jnp.repeat(active, 6)
    A = A.reshape(P * 6, P * 6) * am[:, None] * am[None, :]
    diag = jnp.diagonal(A)
    A = A + jnp.diag(ep * am + lm * diag + (1.0 - am))
    b = b.reshape(P * 6) * am

    L = jax.scipy.linalg.cholesky(A, lower=True)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, jnp.eye(A.shape[0], dtype=A.dtype))
    dx = jax.scipy.linalg.cho_solve((L, True), b)
    dx = jnp.where(ok & jnp.all(jnp.isfinite(dx)), dx, 0.0)
    return dx.reshape(P, 6) * active[:, None]


@partial(jax.jit, static_argnames=("iters", "motion_only", "P", "strict_t0_quirk"))
def dba_step(
    poses,
    disps,
    intrinsics,
    disps_sens,
    target,
    weight,
    eta,
    ii,
    jj,
    edge_mask,
    kf_ids,
    kf_mask,
    edge_slot,
    rows_of_frame,
    t0,
    t1,
    *,
    P: int,
    iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    alpha: float = DEPTH_PRIOR_ALPHA,
    strict_t0_quirk: bool = False,
):
    """Run ``iters`` Gauss-Newton iterations of the dense BA.

    poses [N,7], disps/disps_sens [N,H,W], intrinsics [4] (1/8 res, shared),
    target/weight [E,H,W,2], eta [N,H,W] per-frame damping,
    ii/jj/edge_mask [E] padded edge list,
    kf_ids/kf_mask [K] compact edge-frame slots, edge_slot [E] slot of
    ii[e] (K when dead), rows_of_frame [K,D_max] rows into [0, K+E),
    t0/t1 dynamic int32 scalars bounding the pose window, P static pose
    bucket (>= t1 - t0).  Returns (poses, disps).

    All depth-side work runs on the K compact slots; it scatters back to
    the N-frame buffer only once per iteration (the dz update).
    """
    N, ht, wd = disps.shape
    HW = ht * wd
    K = kf_ids.shape[0]
    intr_n = jnp.broadcast_to(intrinsics, (N, 4))
    f32 = disps.dtype

    kf_clip = jnp.minimum(kf_ids, N - 1)
    slot_frame = jnp.where(kf_mask > 0, kf_ids, N)  # pad -> drop on scatter
    # one-hot edge -> slot ([E, K]); dead edges have edge_slot == K
    oh_es = (edge_slot[:, None] == jnp.arange(K)[None, :]).astype(f32)

    row_pose = jnp.concatenate([slot_frame, jj])  # [K+E]
    row_slot = jnp.concatenate(
        [jnp.arange(K), jnp.minimum(edge_slot, K - 1)]
    )
    row_live = jnp.concatenate([kf_mask > 0, edge_mask > 0])

    rof_ok = rows_of_frame >= 0
    rof_safe = jnp.where(rof_ok, rows_of_frame, 0)

    # slot-gathered static per-frame state
    m_s = (disps_sens[kf_clip] > 0).astype(f32).reshape(K, HW) \
        * kf_mask[:, None]
    sens_s = disps_sens[kf_clip].reshape(K, HW)
    eta_s = eta[kf_clip].reshape(K, HW)

    def gn_iter(_, state):
        poses, disps = state
        He, ve, Eii, Eij, Cii, bz = _build_linear_system(
            poses, disps, intr_n, target, weight, ii, jj, edge_mask
        )
        A, b = _scatter_pose_blocks(He, ve, ii, jj, t0, P)

        if motion_only:
            dx = _solve_damped(A, b, t0, t1, P, lm, ep)
            new_poses = _retract_window(poses, dx, t0, N)
            return new_poses, disps

        disps_s = disps.reshape(N, HW)[kf_clip]

        # depth diagonal + rhs with RGB-D prior (droid_kernels.cu:1395-1399)
        Cs = jnp.einsum("ek,eh->kh", oh_es, Cii)
        Cs = Cs + m_s * alpha + (1.0 - m_s) * eta_s
        ws = jnp.einsum("ek,eh->kh", oh_es, bz)
        ws = ws - m_s * alpha * (disps_s - sens_s)
        Qs = 1.0 / Cs  # [K, HW]

        # E-matrix rows: K slot self-rows then E edge rows
        Ei_self = jnp.einsum("ek,eah->kah", oh_es, Eii)  # [K, 6, HW]
        E_rows = jnp.concatenate([Ei_self, Eij], axis=0)  # [K+E, 6, HW]

        rp = row_pose - t0
        ok_schur = (rp >= 0) & (rp < P) & (row_pose < t1) & row_live
        # The reference's EvT6x1_kernel also skips rows with pose == t0
        # (``idx <= 0``, droid_kernels.cu:1105-1106), making the depth
        # back-substitution inconsistent with the pose solve.  That hurts
        # convergence for small windows, so consistency is the default here
        # and the quirk is opt-in for strict numerical parity runs.
        ok_bsub = (rp >= (1 if strict_t0_quirk else 0)) & (rp < P) & (
            row_pose < t1
        ) & row_live

        # group rows by depth slot -> [K, D, 6, HW], masked
        g_ok = ok_schur[rof_safe] & rof_ok
        Eg = E_rows[rof_safe] * g_ok[..., None, None].astype(f32)

        # Schur blocks: B[k, d, e] = Eg[k,d] diag(Q_k) Eg[k,e]^T
        EgQ = Eg * Qs[:, None, None, :]
        B = jnp.einsum("kdah,kebh->kdeab", EgQ, Eg)

        # assemble into the dense pose system with one-hot contractions
        # (a scatter-add over K*D*D duplicate indices serializes on TPU)
        gp = jnp.where(g_ok, row_pose[rof_safe] - t0, 0)  # [K, D]
        M = (gp[..., None] == jnp.arange(P)[None, None, :]).astype(f32) \
            * g_ok[..., None].astype(f32)  # [K, D, P]
        C1 = jnp.einsum("kdp,kdeab->kpeab", M, B)
        Ssys = jnp.einsum("keq,kpeab->paqb", M, C1)  # [P, 6, P, 6]

        # Schur rhs: v_s[pose(r)] += E_r . (Q w)[slot(r)]
        Qw_rows = (Qs * ws)[row_slot]  # [K+E, HW]
        v_rows = jnp.einsum("rah,rh->ra", E_rows, Qw_rows)
        R = (rp[:, None] == jnp.arange(P)[None, :]).astype(f32) \
            * ok_schur[:, None].astype(f32)  # [K+E, P]
        vs = jnp.einsum("rp,ra->pa", R, v_rows)

        dx = _solve_damped(A - Ssys, b - vs, t0, t1, P, lm, ep)

        # back-substitution:
        # dz_k = Q_k (w_k - sum_{rows r of k} E_r^T dx[pose_r])
        dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6), dx.dtype)], axis=0)
        rp_bs = jnp.where(ok_bsub, rp, P)
        dw_rows = jnp.einsum("rah,ra->rh", E_rows, dx_pad[rp_bs])
        RS = (row_slot[:, None] == jnp.arange(K)[None, :]).astype(f32) \
            * row_live[:, None].astype(f32)  # [K+E, K]
        dw_s = jnp.einsum("rk,rh->kh", RS, dw_rows)
        dz_s = Qs * (ws - dw_s)
        dz_s = jnp.where(jnp.isfinite(dz_s), dz_s, 0.0) * kf_mask[:, None]

        new_poses = _retract_window(poses, dx, t0, N)
        new_disps = disps.at[slot_frame].add(
            dz_s.reshape(K, ht, wd), mode="drop"
        )
        return new_poses, new_disps

    poses, disps = jax.lax.fori_loop(0, iters, gn_iter, (poses, disps))
    if not motion_only:
        disps = jnp.maximum(disps, 0.001)  # depth_video.py:195
    return poses, disps
