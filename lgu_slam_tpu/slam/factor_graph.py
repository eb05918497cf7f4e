"""Factor graph over keyframes (reference: droid_slam/factor_graph.py).

Host/device split (SURVEY.md §7.3 hard part #2):

- **Host (NumPy)**: edge topology — add/dedup (factor_graph.py:48-60),
  age-based and NMS-based edge selection (:319-383), removal/compaction,
  keyframe deletion re-indexing (:170-200).  These are O(E) scalar loops on
  tiny arrays; keeping them off-device avoids data-dependent shapes in jit.
- **Device (jit)**: everything per-pixel — correlation pyramid rebuild,
  reprojection, update-operator application, DBA — over *padded edge-slot
  buffers* of static bucket sizes, masked by ``edge_mask``.

Instead of the reference's incremental ``CorrBlock.cat`` bookkeeping, the
correlation pyramids for all active edges are rebuilt in one jitted batch
whenever the topology changes (an all-pairs matmul per edge — MXU work
measured in milliseconds) and cached across the 8/16 GRU iterations of a
frontend step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.geom.dba import DbaPlan, dba_step
from lgu_slam_tpu.geom.projective import coords_grid, projective_transform
from lgu_slam_tpu.models.corr import CorrPyramid, build_fmap_pyramid
from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.slam.state import Video, video_remove_keyframe
from lgu_slam_tpu.utils.config import SLAMConfig


# ---------------------------------------------------------------------------
# jitted device kernels (module-level so the cache is shared across graphs)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("net_def",))
def _build_pyramids(net_def, params, fmaps, ii, jj, stereo_c):
    """Rebuild corr pyramids for all edge slots from cached video features.

    fmaps: [N, rig, h, w, 128]; ii/jj [E]; stereo_c [E] (1 for stereo self
    edges — selects the right rig camera, factor_graph.py:118-120).
    """
    f1 = fmaps[ii, 0].astype(jnp.float32)
    f2 = fmaps[jj, stereo_c].astype(jnp.float32)
    return net_def.apply(
        {"params": params}, f1, f2, method=LGUNet.build_corr
    )


@partial(jax.jit, static_argnames=("net_def", "num_slots"))
def _update_op(net_def, params, video_state, pyr, net, ii, jj, target,
               edge_mask, edge_slot, num_slots):
    """One GRU update over all active edge slots (factor_graph.py:203-224).

    ``edge_slot [E]`` maps each edge to a compact active-frame slot in
    [0, num_slots) (host-planned) so the GraphAgg convs run only over
    frames with edges, not the whole keyframe buffer.
    Returns (net', target', weight', eta [num_slots,...], upmask, slot_mask).
    """
    coords1, _ = projective_transform(
        video_state.poses, video_state.disps, video_state.intrinsics, ii, jj
    )
    ht, wd = coords1.shape[1:3]
    coords0 = coords_grid(ht, wd)
    motn = jnp.concatenate(
        [coords1 - coords0, target - coords1], axis=-1
    )
    motn = jnp.clip(motn, -64.0, 64.0)

    corr = net_def.apply(
        {"params": params}, pyr, coords1, method=LGUNet.lookup
    )

    inp = video_state.inps[ii].astype(jnp.float32)
    net2, delta, weight, eta, upmask, slot_mask = net_def.apply(
        {"params": params},
        net[None], inp[None], corr[None], motn[None], edge_slot, num_slots,
        edge_mask,
        method=LGUNet.update_step,
    )

    target2 = coords1 + delta[0].astype(jnp.float32)
    weight2 = weight[0].astype(jnp.float32)
    return net2[0], target2, weight2, eta[0], upmask[0], slot_mask


@partial(jax.jit, static_argnames=("net_def", "num_slots"))
def _alt_update_op(net_def, params, video_state, fmap_pyr, net, ii, jj,
                   ii_rig, jj_rig, target, edge_mask, edge_slot, num_slots):
    """Low-memory update: fused on-the-fly correlation (update_lowmem body,
    factor_graph.py:267-292).  ii/jj index keyframes; ii_rig/jj_rig are the
    rig-expanded feature indices (factor_graph.py:279)."""
    coords1, _ = projective_transform(
        video_state.poses, video_state.disps, video_state.intrinsics, ii, jj
    )
    ht, wd = coords1.shape[1:3]
    coords0 = coords_grid(ht, wd)
    motn = jnp.clip(
        jnp.concatenate([coords1 - coords0, target - coords1], axis=-1),
        -64.0, 64.0,
    )

    corr = net_def.apply(
        {"params": params}, fmap_pyr, ii_rig, jj_rig, coords1,
        method=LGUNet.alt_corr,
    )

    inp = video_state.inps[ii].astype(jnp.float32)
    net2, delta, weight, eta, upmask, slot_mask = net_def.apply(
        {"params": params},
        net[None], inp[None], corr[None], motn[None], edge_slot, num_slots,
        edge_mask,
        method=LGUNet.update_step,
    )
    target2 = coords1 + delta[0].astype(jnp.float32)
    return (net2[0], target2, weight[0].astype(jnp.float32), eta[0],
            upmask[0], slot_mask)


@jax.jit
def _add_edge_slots(target, weight, netbuf, poses, disps, intrinsics, nets,
                    ii_c, jj_c, n_new, start):
    """Seed ``n_new`` new edge slots starting at ``start`` (traced):
    target = current reprojection, weight = 0, net = video.nets[ii]
    (factor_graph.py:113-130).  ii_c/jj_c are padded to a fixed chunk."""
    coords, _ = projective_transform(poses, disps, intrinsics, ii_c, jj_c)
    AC = ii_c.shape[0]
    rows = start + jnp.arange(AC)
    rows = jnp.where(jnp.arange(AC) < n_new, rows, target.shape[0])
    target = target.at[rows].set(coords, mode="drop")
    weight = weight.at[rows].set(0.0, mode="drop")
    netbuf = netbuf.at[rows].set(
        nets[ii_c].astype(netbuf.dtype), mode="drop"
    )
    return target, weight, netbuf


@jax.jit
def _store_inactive(target_inac, weight_inac, target, weight, src_idx,
                    dst_mask):
    """Overwrite inactive slots flagged by ``dst_mask`` with active rows
    ``src_idx`` (fixed shapes: one compile regardless of store count)."""
    m = dst_mask[:, None, None, None]
    return (
        jnp.where(m, target[src_idx], target_inac),
        jnp.where(m, weight[src_idx], weight_inac),
    )


@jax.jit
def _compact(buffers, perm, keep_mask):
    """Permute edge-slot buffers (host-computed permutation) and zero the
    slots beyond the surviving count."""

    def one(x):
        out = x[perm]
        m = keep_mask.reshape((-1,) + (1,) * (out.ndim - 1))
        return out * m.astype(out.dtype)

    return jax.tree_util.tree_map(one, buffers)


def _update_loop_impl(
    net_def,
    params,
    video_state,
    pyr,
    net,
    ii,
    jj,
    target,
    weight,
    edge_mask,
    edge_slot,
    frame_ids,
    target_inac,
    weight_inac,
    dba_ii,
    dba_jj,
    dba_mask,
    dba_kf_ids,
    dba_kf_mask,
    dba_edge_slot,
    rows_of_frame,
    t0,
    t1,
    *,
    num_slots: int,
    n_iters: int,
    P: int,
    dba_iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    EP: float = 1e-7,
    motion_only: bool = False,
    t0_quirk: bool = False,
):
    """``n_iters`` x {GRU update + DBA} as ONE jit — the frontend's 8-step
    inner loop (droid_frontend.py:50-51) without per-iteration host
    dispatch.  The DBA edge list is [active..., selected-inactive...] with
    a fixed topology plan; only the active targets/weights evolve."""
    ht, wd = video_state.disps.shape[1:]
    upmask0 = jnp.zeros((num_slots, ht, wd, 576), jnp.float32)
    state = (net, target, weight, video_state.poses, video_state.disps,
             video_state.damping, upmask0)

    def body(_, state):
        net, target, weight, poses, disps, damping, _up = state
        vs = video_state._replace(poses=poses, disps=disps, damping=damping)
        net2, target2, weight2, eta, upmask, slot_mask = _update_op(
            net_def, params, vs, pyr, net, ii, jj, target, edge_mask,
            edge_slot, num_slots,
        )
        damping2 = _update_damping(damping, eta, frame_ids, slot_mask)

        dba_target = jnp.concatenate([target2, target_inac], axis=0)
        dba_weight = jnp.concatenate([weight2, weight_inac], axis=0)
        dba_weight = dba_weight * dba_mask[:, None, None, None]
        eta_dense = 0.2 * damping2 + EP
        poses2, disps2 = dba_step(
            poses, disps, video_state.intrinsics[0], video_state.disps_sens,
            dba_target, dba_weight, eta_dense,
            dba_ii, dba_jj, dba_mask, dba_kf_ids, dba_kf_mask,
            dba_edge_slot, rows_of_frame, t0, t1,
            P=P, iters=dba_iters, lm=lm, ep=ep, motion_only=motion_only,
            strict_t0_quirk=t0_quirk,
        )
        return (net2, target2, weight2, poses2, disps2, damping2,
                upmask.astype(jnp.float32))

    return jax.lax.fori_loop(0, n_iters, body, state)


@partial(
    jax.jit,
    static_argnames=("net_def", "num_slots", "n_iters", "P", "dba_iters", "t0_quirk",
                     "motion_only"),
    donate_argnums=(4, 7, 8),  # net, target, weight buffers reused in place
)
def _update_loop(net_def, params, video_state, pyr, net, *rest, **kw):
    """n_iters x {GRU update + DBA} as one device program (cached-pyramid
    path; see _update_loop_impl)."""
    return _update_loop_impl(net_def, params, video_state, pyr, net,
                             *rest, **kw)


@partial(
    jax.jit,
    static_argnames=("net_def", "num_slots", "n_iters", "P", "dba_iters", "t0_quirk",
                     "motion_only"),
    donate_argnums=(4, 7, 8),  # net, target, weight buffers reused in place
)
def _build_and_update_loop(
    net_def, params, video_state, stereo_c, net, ii, jj, target, weight,
    *loop_args, **loop_kw,
):  # noqa: D401 — signature split so jit maps static/donated args by name
    """Pyramid rebuild fused with the n-iteration update loop — ONE device
    dispatch per tracked keyframe.  Over the axon tunnel each dispatch
    costs ~1 ms RTT, which dominated the split pyramid+loop formulation;
    the rebuilt pyramid is returned so later cached-pyramid calls
    (droid_frontend.py:60-66 second iteration burst) can reuse it."""
    f1 = video_state.fmaps[ii, 0].astype(jnp.float32)
    f2 = video_state.fmaps[jj, stereo_c].astype(jnp.float32)
    pyr = net_def.apply({"params": params}, f1, f2,
                        method=LGUNet.build_corr)
    out = _update_loop_impl(
        net_def, params, video_state, pyr, net, ii, jj, target, weight,
        *loop_args, **loop_kw
    )
    return pyr, out


def _lowmem_loop_impl(
    net_def,
    params,
    video_state,
    fmap_pyr,
    net_ch,     # [C, CH, h, w, 128]  pre-gathered edge buffers
    target_ch,  # [C, CH, h, w, 2]
    weight_ch,  # [C, CH, h, w, 2]
    ii_ch,      # [C, CH] int32
    jj_ch,
    ii_rig_ch,
    jj_rig_ch,
    mask_ch,    # [C, CH] float32
    edge_slot_ch,   # [C, CH] int32
    frame_ids_ch,   # [C, F] int32
    dba_ii,
    dba_jj,
    dba_mask,
    dba_kf_ids,
    dba_kf_mask,
    dba_edge_slot,
    rows_of_frame,
    t0,
    t1,
    *,
    num_slots: int,
    steps: int,
    P: int,
    dba_iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    EP: float = 1e-7,
    upsample: bool = False,
    t0_quirk: bool = False,
):
    """``steps`` x {scan over edge chunks of fused-corr GRU updates, then
    one global DBA} as ONE device program — the backend's update_lowmem
    (factor_graph.py:255-302) without the ``steps x n_chunks`` host
    dispatches + per-chunk ``.at[slot].set`` round trips of the unfused
    formulation (~200 RTTs at t=500/1024 edges/12 steps)."""
    s0 = video_state
    disps_up0 = s0.disps_up if upsample else jnp.zeros((0,), jnp.float32)
    state = (net_ch, target_ch, weight_ch, s0.poses, s0.disps,
             s0.damping, disps_up0)
    C = net_ch.shape[0]

    # ONE flat fori_loop over steps*C iterations (chunk c = i % C, with
    # the global DBA cond-guarded onto each step's last chunk) instead of
    # nested {steps, chunks} loops: XLA copies the inner loop's carry
    # from the outer carry every outer iteration, which materialized a
    # second full-size hidden buffer (6 GB at the 8192-edge scale, the
    # t=512 OOM).  dynamic_update_slice keeps the carry updates in place.
    def body(i, state):
        net_ch, target_ch, weight_ch, poses, disps, damping, disps_up = state
        c = jax.lax.rem(i, C)
        vs = s0._replace(poses=poses, disps=disps)

        dyn = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
            a, c, axis=0, keepdims=False)
        net2, target2, weight2, eta, upmask, slot_mask = _alt_update_op(
            net_def, params, vs, fmap_pyr, dyn(net_ch), dyn(ii_ch),
            dyn(jj_ch), dyn(ii_rig_ch), dyn(jj_rig_ch), dyn(target_ch),
            dyn(mask_ch), dyn(edge_slot_ch), num_slots,
        )
        m_c = dyn(mask_ch)
        fids = dyn(frame_ids_ch)
        live = m_c[:, None, None, None] > 0
        net2 = jnp.where(live, net2, dyn(net_ch)).astype(net_ch.dtype)
        target2 = jnp.where(live, target2, dyn(target_ch))
        weight2 = jnp.where(live, weight2, dyn(weight_ch))
        damping = _update_damping(damping, eta, fids, slot_mask)
        if upsample:
            disps_up = _upsample_slots(
                disps, disps_up, upmask, fids, slot_mask
            )
        upd = lambda buf, x: jax.lax.dynamic_update_index_in_dim(  # noqa: E731
            buf, x, c, axis=0)
        net_ch = upd(net_ch, net2)
        target_ch = upd(target_ch, target2)
        weight_ch = upd(weight_ch, weight2)

        def run_dba(args):
            poses, disps, target_ch, weight_ch, damping = args
            tgt = target_ch.reshape((-1,) + target_ch.shape[2:])
            wgt = weight_ch.reshape((-1,) + weight_ch.shape[2:])
            wgt = wgt * dba_mask[:, None, None, None]
            eta_dense = 0.2 * damping + EP
            poses, disps = dba_step(
                poses, disps, s0.intrinsics[0], s0.disps_sens, tgt, wgt,
                eta_dense,
                dba_ii, dba_jj, dba_mask, dba_kf_ids, dba_kf_mask,
                dba_edge_slot, rows_of_frame, t0, t1,
                P=P, iters=dba_iters, lm=lm, ep=ep, motion_only=False,
                strict_t0_quirk=t0_quirk,
            )
            return poses, jnp.maximum(disps, 1e-3)

        poses, disps = jax.lax.cond(
            c == C - 1, run_dba, lambda args: (args[0], args[1]),
            (poses, disps, target_ch, weight_ch, damping),
        )
        return (net_ch, target_ch, weight_ch, poses, disps, damping,
                disps_up)

    return jax.lax.fori_loop(0, steps * C, body, state)


@partial(
    jax.jit,
    static_argnames=("net_def", "C", "num_slots", "P", "dba_iters",
                     "upsample", "t0_quirk"),
    donate_argnums=(4, 5, 6),  # the graph's net/target/weight edge buffers
)
def _lowmem_fused(net_def, params, video_state, fmap_pyr, net_buf,
                  target_buf, weight_buf, n_live, *rest, C, num_slots,
                  **kw):
    """ONE device program for the whole update_lowmem call: stage the
    [E, ...] edge-slot buffers into [C, CH, ...] chunks, run the fused
    steps x {GRU sweep, DBA} loop, and scatter the chunk results back.

    The previous formulation did the staging gathers and scatter-backs as
    ~40 eager dispatches around the loop jit — ~2.7 s of tunnel RTTs and
    small-jit cache misses per warm call on the axon setup (cProfile'd),
    dwarfing the ~0.5 s/step device program.  Slot indices are computed
    in-graph from iota so the edge count ``n_live`` stays a traced scalar
    (no recompile when the topology changes size)."""
    E = net_buf.shape[0]
    CH = num_slots
    idx = jnp.arange(C * CH, dtype=jnp.int32)
    h, w = net_buf.shape[1:3]
    if C * CH == E:
        # all chunk slots map 1:1 to edge slots: stage as a free reshape
        # (the iota-modulo gather below is not reliably recognized as
        # one, and at the 8192-edge scale the copy is 6.4 GB)
        net_ch = net_buf.reshape(C, CH, h, w, 128)
        target_ch = target_buf.reshape(C, CH, h, w, 2)
        weight_ch = weight_buf.reshape(C, CH, h, w, 2)
    else:
        in_slot = idx % E
        net_ch = net_buf[in_slot].reshape(C, CH, h, w, 128)
        target_ch = target_buf[in_slot].reshape(C, CH, h, w, 2)
        weight_ch = weight_buf[in_slot].reshape(C, CH, h, w, 2)

    out = _lowmem_loop_impl(net_def, params, video_state, fmap_pyr,
                            net_ch, target_ch, weight_ch, *rest,
                            num_slots=num_slots, **kw)
    net_ch, target_ch, weight_ch, poses, disps, damping, disps_up = out

    flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
    if C * CH == E:
        # masked slots pass through the loop unchanged (live=False keeps
        # the old row), so the un-staging is a free reshape too
        net_buf = flat(net_ch)
        target_buf = flat(target_ch)
        weight_buf = flat(weight_ch)
    else:
        # pad rows (chunk slots past the live edge count) drop on scatter
        out_slot = jnp.where(idx < n_live, idx, E)
        net_buf = net_buf.at[out_slot].set(flat(net_ch), mode="drop")
        target_buf = target_buf.at[out_slot].set(
            flat(target_ch), mode="drop")
        weight_buf = weight_buf.at[out_slot].set(
            flat(weight_ch), mode="drop")
    return (net_buf, target_buf, weight_buf, poses, disps, damping,
            disps_up)


@jax.jit
def _update_damping(damping, eta_slots, frame_ids, slot_mask):
    """Scatter per-slot eta into the dense per-frame damping buffer
    (factor_graph.py:228 `self.damping[torch.unique(ii)] = damping`)."""
    cur = damping[frame_ids]
    new = jnp.where(slot_mask[:, None, None], eta_slots, cur)
    return damping.at[frame_ids].set(new)


@jax.jit
def _upsample_slots(disps, disps_up, upmask_slots, frame_ids, slot_mask):
    """disps_up[frame_ids] = cvx_upsample(disps[frame_ids], upmask)
    (depth_video.py:124-128)."""
    from lgu_slam_tpu.models.update import upsample_disp  # noqa: PLC0415

    up = upsample_disp(
        disps[frame_ids], upmask_slots.reshape(
            upmask_slots.shape[:3] + (-1,)
        )
    )
    cur = disps_up[frame_ids]
    up = jnp.where(slot_mask[:, None, None], up, cur)
    return disps_up.at[frame_ids].set(up)


def pose_bucket_for(cfg, span: int) -> int:
    """Smallest doubling of cfg.pose_bucket covering ``span`` free poses
    (capped at the buffer).  The dense reduced camera system is
    [6P, 6P]; jumping straight to the full buffer cost a 64x-oversized
    Cholesky for a t=128 global pass."""
    P = cfg.pose_bucket
    while P < span and P < cfg.buffer:
        P *= 2
    return min(P, cfg.buffer)


class FactorGraph:
    """Padded-buffer factor graph bound to a Video and an LGUNet."""

    def __init__(
        self,
        net_def: LGUNet,
        params,
        video: Video,
        cfg: SLAMConfig,
        corr_impl: str = "volume",
        max_factors: int = -1,
        edge_bucket: int | None = None,
        inactive_bucket: int | None = None,
    ):
        self.net_def = net_def
        self.params = params
        self.video = video
        self.cfg = cfg
        self.corr_impl = corr_impl
        self.upsample = cfg.upsample
        self.max_factors = max_factors if max_factors > 0 else cfg.max_factors
        self.E = edge_bucket or cfg.edge_bucket
        self.EI = inactive_bucket or cfg.inactive_bucket

        h, w = cfg.ht8, cfg.wd8

        # host topology
        self.ii = np.zeros(0, np.int32)
        self.jj = np.zeros(0, np.int32)
        self.age = np.zeros(0, np.int32)
        self.ii_inac = np.zeros(0, np.int32)
        self.jj_inac = np.zeros(0, np.int32)
        self.ii_bad = np.zeros(0, np.int32)
        self.jj_bad = np.zeros(0, np.int32)

        # device edge-slot buffers (padded to E).  The backend (alt impl)
        # stores the per-edge GRU hidden in cfg.backend_hidden_dtype so
        # the 16*t-edge global graph fits one chip's HBM; the frontend's
        # small volume-impl graph keeps fp32.
        hd = (
            jnp.dtype(cfg.backend_hidden_dtype)
            if corr_impl == "alt"
            else jnp.float32
        )
        self.target = jnp.zeros((self.E, h, w, 2), jnp.float32)
        self.weight = jnp.zeros((self.E, h, w, 2), jnp.float32)
        self.net = jnp.zeros((self.E, h, w, 128), hd)
        self.target_inac = jnp.zeros((self.EI, h, w, 2), jnp.float32)
        self.weight_inac = jnp.zeros((self.EI, h, w, 2), jnp.float32)

        self.pyramid: CorrPyramid | None = None
        self.fmap_pyr = None  # alt (low-memory) impl
        self._pyr_dirty = True
        # host planning cache: update_n's DBA plan / frame-slot compaction /
        # inactive-edge gathers are pure functions of the topology, so they
        # are reused until an edge/keyframe mutation bumps _topo_version
        self._topo_version = 0
        self._plan_key = None
        self._plan = None
        # grow-only DbaPlan buckets so plan shapes stay stable across
        # topology changes (a shape change = full XLA recompile)
        self._dmax = cfg.frame_degree_bucket
        self._kbucket = cfg.frame_bucket

    # -- host-side helpers --------------------------------------------------

    @property
    def n_edges(self) -> int:
        return len(self.ii)

    def _edge_arrays(self):
        ii = np.zeros(self.E, np.int32)
        jj = np.zeros(self.E, np.int32)
        mask = np.zeros(self.E, np.float32)
        n = self.n_edges
        ii[:n] = self.ii
        jj[:n] = self.jj
        mask[:n] = 1.0
        return jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask)

    def _dedup(self, ii, jj):
        """Drop candidate edges already present (factor_graph.py:48-60)."""
        existing = set(zip(self.ii.tolist(), self.jj.tolist()))
        existing |= set(zip(self.ii_inac.tolist(), self.jj_inac.tolist()))
        keep = [
            k
            for k, (i, j) in enumerate(zip(ii.tolist(), jj.tolist()))
            if (i, j) not in existing
        ]
        return ii[keep], jj[keep]

    # -- edge addition ------------------------------------------------------

    def add_factors(self, ii, jj, remove: bool = False):
        """Add edges (factor_graph.py:91-140)."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        ii, jj = self._dedup(ii, jj)
        if ii.size == 0:
            return

        # capacity limit: evict oldest (factor_graph.py:107-112)
        if (
            self.max_factors > 0
            and self.n_edges + ii.size > self.max_factors
            and self.n_edges > 0
            and remove
        ):
            order = np.argsort(self.age)[::-1]  # oldest = largest age
            n_drop = min(
                self.n_edges, self.n_edges + ii.size - self.max_factors
            )
            drop = np.zeros(self.n_edges, bool)
            drop[order[:n_drop]] = True
            self.rm_factors(drop, store=True)

        space = self.E - self.n_edges
        if ii.size > space:  # hard bucket cap: keep newest
            ii, jj = ii[:space], jj[:space]
            if ii.size == 0:
                return

        # seed slots in fixed-size chunks (one compile for any edge count)
        AC = self.cfg.add_chunk
        s = self.video.state
        n0 = self.n_edges
        for lo in range(0, ii.size, AC):
            chunk_i = np.zeros(AC, np.int32)
            chunk_j = np.zeros(AC, np.int32)
            n_new = min(AC, ii.size - lo)
            chunk_i[:n_new] = ii[lo : lo + n_new]
            chunk_j[:n_new] = jj[lo : lo + n_new]
            self.target, self.weight, self.net = _add_edge_slots(
                self.target, self.weight, self.net,
                s.poses, s.disps, s.intrinsics, s.nets,
                jnp.asarray(chunk_i), jnp.asarray(chunk_j),
                jnp.int32(n_new), jnp.int32(n0 + lo),
            )

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(ii.size, np.int32)])
        self._pyr_dirty = True
        self._topo_version += 1

    # -- edge removal / compaction -----------------------------------------

    def rm_factors(self, mask, store: bool = False):
        """Remove edges by boolean mask (factor_graph.py:142-167)."""
        mask = np.asarray(mask, bool)
        if mask.size != self.n_edges or not mask.any():
            if mask.size != self.n_edges:
                raise ValueError("mask size mismatch")
            return
        if store:
            n_store = int(mask.sum())
            n_inac = len(self.ii_inac)
            if n_inac + n_store > self.EI:
                # inactive bucket overflow: drop oldest stored edges first
                overflow = n_inac + n_store - self.EI
                self.ii_inac = self.ii_inac[overflow:]
                self.jj_inac = self.jj_inac[overflow:]
                perm = np.arange(self.EI, dtype=np.int32)
                perm[: self.EI - overflow] = np.arange(overflow, self.EI)
                keep_mask = np.zeros(self.EI, bool)
                keep_mask[: len(self.ii_inac)] = True
                self.target_inac, self.weight_inac = _compact(
                    (self.target_inac, self.weight_inac),
                    jnp.asarray(perm), jnp.asarray(keep_mask),
                )
                n_inac = len(self.ii_inac)
            sel = np.where(mask)[0]
            src_idx = np.zeros(self.EI, np.int32)
            dst_mask = np.zeros(self.EI, bool)
            src_idx[n_inac : n_inac + n_store] = sel
            dst_mask[n_inac : n_inac + n_store] = True
            self.target_inac, self.weight_inac = _store_inactive(
                self.target_inac, self.weight_inac, self.target, self.weight,
                jnp.asarray(src_idx), jnp.asarray(dst_mask),
            )
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])

        keep = ~mask
        n_new = int(keep.sum())
        perm = np.zeros(self.E, np.int32)
        perm[:n_new] = np.where(keep)[0]
        keep_mask = np.zeros(self.E, bool)
        keep_mask[:n_new] = True
        bufs = (self.target, self.weight, self.net)
        self.target, self.weight, self.net = _compact(
            bufs, jnp.asarray(perm), jnp.asarray(keep_mask)
        )
        self.ii = self.ii[keep]
        self.jj = self.jj[keep]
        self.age = self.age[keep]
        self._pyr_dirty = True
        self._topo_version += 1

    def rm_keyframe(self, ix: int):
        """Delete keyframe ix: shift video slot, re-index edges
        (factor_graph.py:170-200)."""
        self._topo_version += 1  # inactive lists re-index below
        self.video.state = video_remove_keyframe(self.video.state, jnp.int32(ix))
        self.video.counter -= 1

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1, self.jj_inac)
        if m.any():
            keep = ~m
            n_keep = int(keep.sum())
            perm = np.zeros(self.EI, np.int32)
            perm[:n_keep] = np.where(keep)[0]
            keep_mask = np.zeros(self.EI, bool)
            keep_mask[:n_keep] = True
            self.target_inac, self.weight_inac = _compact(
                (self.target_inac, self.weight_inac),
                jnp.asarray(perm), jnp.asarray(keep_mask),
            )
            self.ii_inac = self.ii_inac[keep]
            self.jj_inac = self.jj_inac[keep]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    def filter_edges(self):
        """Drop low-confidence long-range edges (factor_graph.py:76-83)."""
        if self.n_edges == 0:
            return
        conf = np.asarray(jnp.mean(self.weight[: self.n_edges], axis=(1, 2, 3)))
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        if self.n_edges:
            self.rm_factors(np.ones(self.n_edges, bool), store=False)

    # -- correlation state --------------------------------------------------

    def _ensure_pyramid(self):
        if not self._pyr_dirty:
            return
        ii, jj, _ = self._edge_arrays()
        if self.corr_impl == "volume":
            rig = self.video.state.fmaps.shape[1]
            c = np.zeros(self.E, np.int32)
            c[: self.n_edges] = (self.ii == self.jj).astype(np.int32)
            c = np.minimum(c, rig - 1)
            self.pyramid = _build_pyramids(
                self.net_def, self.params, self.video.state.fmaps, ii, jj,
                jnp.asarray(c),
            )
        else:
            num, rig = self.video.state.fmaps.shape[:2]
            h, w = self.cfg.ht8, self.cfg.wd8
            # pyramid over the LIVE keyframes only (bucketed so jit
            # compiles O(log N) variants, not one per counter value);
            # bf16 on TPU — the per-chunk volume einsum wants bf16 MXU
            # inputs, while the fused-tap oracle path (CPU) wants fp32
            t = max(int(self.video.counter), 1)
            Tb = min(num, max(8, 1 << int(np.ceil(np.log2(t)))))
            fm = self.video.state.fmaps[:Tb]
            from lgu_slam_tpu.models.corr import (  # noqa: PLC0415
                default_use_volume,
            )
            if not default_use_volume():
                fm = fm.astype(jnp.float32)
            flat = fm.reshape(Tb * rig, h, w, 128)
            self.fmap_pyr = build_fmap_pyramid(flat)
        self._pyr_dirty = False

    # -- update -------------------------------------------------------------

    def _frame_slots(self, bucket: int):
        """Host plan: compact active-frame slots for GraphAgg
        (unique(ii) padded to ``bucket``)."""
        uniq = np.unique(self.ii) if self.n_edges else np.zeros(0, np.int32)
        while len(uniq) > bucket:
            bucket *= 2  # rare: recompile with a larger bucket
        frame_ids = np.zeros(bucket, np.int32)
        frame_ids[: len(uniq)] = uniq
        slot_of = {int(f): s for s, f in enumerate(uniq)}
        edge_slot = np.zeros(self.E, np.int32)
        edge_slot[: self.n_edges] = [slot_of[int(i)] for i in self.ii]
        return (
            jnp.asarray(frame_ids), jnp.asarray(edge_slot), bucket,
        )

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               EP=1e-7, motion_only=False):
        """One GRU + DBA update over the active graph
        (factor_graph.py:203-252)."""
        self.update_n(1, t0=t0, t1=t1, itrs=itrs,
                      use_inactive=use_inactive, EP=EP,
                      motion_only=motion_only)

    def update_n(self, n, t0=None, t1=None, itrs=2, use_inactive=False,
                 EP=1e-7, motion_only=False):
        """n x (GRU update + DBA) as a single device program — the
        frontend's inner iteration loop without per-step host dispatch."""
        if self.n_edges == 0:
            return
        cfg = self.cfg
        fuse_build = self._pyr_dirty and self.corr_impl == "volume"
        if not fuse_build:
            self._ensure_pyramid()

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1

        plan_key = (self._topo_version, t0, t1, bool(use_inactive))
        if plan_key == self._plan_key:
            (ii, jj, mask, frame_ids, edge_slot, F, target_inac,
             weight_inac, plan_dev, stereo_c) = self._plan
        else:
            ii, jj, mask = self._edge_arrays()
            frame_ids, edge_slot, F = self._frame_slots(cfg.frame_bucket)

            # inactive edge selection (fixed across the n iterations)
            if use_inactive and len(self.ii_inac) > 0:
                m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
                sel = np.where(m)[0]
            else:
                sel = np.zeros(0, np.int64)
            k = len(sel)
            sel_idx = jnp.asarray(
                np.pad(sel, (0, self.EI - k)).astype(np.int32))
            target_inac = self.target_inac[sel_idx]
            weight_inac = self.weight_inac[sel_idx]

            E_dba = self.E + self.EI
            dba_ii = np.zeros(E_dba, np.int32)
            dba_jj = np.zeros(E_dba, np.int32)
            dba_mask = np.zeros(E_dba, np.float32)
            ne = self.n_edges
            dba_ii[:ne] = self.ii
            dba_jj[:ne] = self.jj
            dba_mask[:ne] = 1.0
            dba_ii[self.E : self.E + k] = self.ii_inac[sel]
            dba_jj[self.E : self.E + k] = self.jj_inac[sel]
            dba_mask[self.E : self.E + k] = 1.0

            plan = DbaPlan.build_masked(dba_ii, dba_jj, dba_mask, cfg.buffer,
                                        dmax_bucket=self._dmax,
                                        frame_bucket=self._kbucket)
            self._dmax = plan.rows_of_frame.shape[1]
            self._kbucket = plan.kf_ids.shape[0]
            plan_dev = plan.jax_arrays()
            rig = self.video.state.fmaps.shape[1]
            c = np.zeros(self.E, np.int32)
            c[: self.n_edges] = (self.ii == self.jj).astype(np.int32)
            stereo_c = jnp.asarray(np.minimum(c, rig - 1))
            self._plan_key = plan_key
            self._plan = (ii, jj, mask, frame_ids, edge_slot, F,
                          target_inac, weight_inac, plan_dev, stereo_c)

        P = pose_bucket_for(cfg, t1 - t0)
        loop_tail = (
            mask, edge_slot, frame_ids, target_inac, weight_inac,
            *plan_dev, jnp.int32(t0), jnp.int32(t1),
        )
        loop_kw = dict(
            num_slots=F, n_iters=n, P=P, dba_iters=itrs,
            lm=cfg.dba_lm, ep=cfg.dba_ep, EP=EP, motion_only=motion_only,
            t0_quirk=cfg.strict_t0_quirk,
        )
        if fuse_build:
            self.pyramid, out = _build_and_update_loop(
                self.net_def, self.params, self.video.state, stereo_c,
                self.net, ii, jj, self.target, self.weight,
                *loop_tail, **loop_kw,
            )
            self._pyr_dirty = False
        else:
            out = _update_loop(
                self.net_def, self.params, self.video.state, self.pyramid,
                self.net, ii, jj, self.target, self.weight,
                *loop_tail, **loop_kw,
            )
        net2, target, weight, poses, disps, damping, upmask = out
        self.net = net2
        self.target = target
        self.weight = weight
        # disps already clamped to 1e-3 inside dba_step (depth_video.py:195)
        s = self.video.state._replace(
            poses=poses, disps=disps, damping=damping
        )
        if self.upsample:
            n_used = len(np.unique(self.ii))
            slot_mask = jnp.asarray(np.arange(F) < n_used)
            s = s._replace(
                disps_up=_upsample_slots(
                    s.disps, s.disps_up, upmask, frame_ids, slot_mask
                )
            )
        self.video.state = s
        self.video.dirty[t0:t1] = True
        self.age += n

    def _run_dba(self, t0, t1, itrs, use_inactive, EP, motion_only):
        """Assemble the (active ∪ inactive) edge set and run the DBA."""
        cfg = self.cfg
        if use_inactive and len(self.ii_inac) > 0:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            sel = np.where(m)[0]
        else:
            sel = np.zeros(0, np.int64)

        E_dba = self.E + self.EI
        ii = np.zeros(E_dba, np.int32)
        jj = np.zeros(E_dba, np.int32)
        emask = np.zeros(E_dba, np.float32)
        n = self.n_edges
        ii[:n] = self.ii
        jj[:n] = self.jj
        emask[:n] = 1.0
        k = len(sel)
        ii[self.E : self.E + k] = self.ii_inac[sel]
        jj[self.E : self.E + k] = self.jj_inac[sel]
        emask[self.E : self.E + k] = 1.0

        sel_idx = jnp.asarray(
            np.pad(sel, (0, self.EI - k)).astype(np.int32)
        )
        target = jnp.concatenate(
            [self.target, self.target_inac[sel_idx]], axis=0
        )
        weight = jnp.concatenate(
            [self.weight, self.weight_inac[sel_idx]], axis=0
        )
        # zero the padded inactive slots
        wmask = jnp.asarray(emask)[:, None, None, None]
        weight = weight * wmask

        plan = DbaPlan.build(
            ii[emask > 0], jj[emask > 0], cfg.buffer, edge_bucket=E_dba,
            dmax_bucket=self._dmax, frame_bucket=self._kbucket,
        )
        self._dmax = plan.rows_of_frame.shape[1]
        self._kbucket = plan.kf_ids.shape[0]
        # plan's padded arrays are ordered [active..., inactive..., pad] —
        # rebuild target/weight in that order:
        order = np.where(emask > 0)[0]
        order_p = np.pad(order, (0, E_dba - len(order))).astype(np.int32)
        target = target[jnp.asarray(order_p)]
        weight = weight[jnp.asarray(order_p)] * jnp.asarray(
            plan.edge_mask
        )[:, None, None, None]

        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1

        damping = 0.2 * self.video.state.damping + EP

        s = self.video.state
        P = pose_bucket_for(cfg, t1 - t0)
        poses, disps = dba_step(
            s.poses, s.disps, s.intrinsics[0], s.disps_sens,
            target, weight, damping,
            *plan.jax_arrays(),
            jnp.int32(t0), jnp.int32(t1),
            P=P, iters=itrs, lm=cfg.dba_lm, ep=cfg.dba_ep,
            motion_only=motion_only, strict_t0_quirk=cfg.strict_t0_quirk,
        )
        self.video.state = s._replace(
            poses=poses, disps=jnp.maximum(disps, 1e-3)
        )
        self.video.dirty[t0:t1] = True

    def _lowmem_chunk_plan(self, CH):
        """Host plan shared by the fused / unfused low-memory paths:
        stacked per-chunk edge lists, rig-expanded feature indices
        (factor_graph.py:279), and compact frame slots for GraphAgg."""
        n = self.n_edges
        rig = self.video.state.fmaps.shape[1]
        C = (n + CH - 1) // CH
        ii_ch = np.zeros((C, CH), np.int32)
        jj_ch = np.zeros((C, CH), np.int32)
        mask_ch = np.zeros((C, CH), np.float32)
        edge_slot_ch = np.zeros((C, CH), np.int32)
        frame_ids_ch = np.zeros((C, CH), np.int32)
        for c in range(C):
            lo = c * CH
            hi = min(lo + CH, n)
            ii_ch[c, : hi - lo] = self.ii[lo:hi]
            jj_ch[c, : hi - lo] = self.jj[lo:hi]
            mask_ch[c, : hi - lo] = 1.0
            uniq = np.unique(ii_ch[c][mask_ch[c] > 0])
            frame_ids_ch[c, : len(uniq)] = uniq
            slot_of = {int(f): s for s, f in enumerate(uniq)}
            edge_slot_ch[c] = [slot_of.get(int(i), 0) for i in ii_ch[c]]
        ii_rig_ch = rig * ii_ch
        jj_rig_ch = rig * jj_ch + (
            (ii_ch == jj_ch).astype(np.int32) if rig > 1 else 0
        )
        return C, ii_ch, jj_ch, ii_rig_ch, jj_rig_ch, mask_ch, \
            edge_slot_ch, frame_ids_ch

    def update_lowmem(self, t0=None, t1=None, itrs=2, steps=8, EP=1e-7,
                      mesh=None):
        """Global low-memory optimization (factor_graph.py:255-302):
        ``steps`` rounds of {chunked fused-correlation GRU updates over
        all edges, then one global DBA}, fused into ONE device program
        (lax.fori_loop over steps, lax.scan over edge chunks).

        With ``mesh`` (>1 device), the whole pass runs sharded over the
        keyframe axis (parallel/backend_shard.py): edges partitioned by
        source frame, GRU chunk sweep and DBA both shard-local."""
        if self.n_edges == 0:
            return
        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            return self._update_lowmem_sharded(mesh, t0, t1, itrs, steps, EP)
        t = self.video.counter
        cfg = self.cfg
        CH = cfg.backend_chunk

        self.corr_impl = "alt"
        self._pyr_dirty = True
        self._ensure_pyramid()

        n = self.n_edges
        (C, ii_ch, jj_ch, ii_rig_ch, jj_rig_ch, mask_ch, edge_slot_ch,
         frame_ids_ch) = self._lowmem_chunk_plan(CH)

        # one DBA plan over the chunk-flattened edge list (topology is
        # fixed for the whole call)
        plan = DbaPlan.build_masked(
            ii_ch.reshape(-1), jj_ch.reshape(-1), mask_ch.reshape(-1),
            cfg.buffer, dmax_bucket=self._dmax, frame_bucket=self._kbucket,
        )
        self._dmax = plan.rows_of_frame.shape[1]
        self._kbucket = plan.kf_ids.shape[0]

        t0_ = 1 if t0 is None else t0
        t1_ = t if t1 is None else t1
        P = pose_bucket_for(cfg, t1_ - t0_)

        # staging gather + loop + scatter-back fused into one program:
        # eager gathers/scatters around the loop cost ~2.7 s of tunnel
        # RTTs + small-jit misses per call (see _lowmem_fused)
        out = _lowmem_fused(
            self.net_def, self.params, self.video.state, self.fmap_pyr,
            self.net, self.target, self.weight, jnp.int32(n),
            jnp.asarray(ii_ch), jnp.asarray(jj_ch),
            jnp.asarray(ii_rig_ch), jnp.asarray(jj_rig_ch),
            jnp.asarray(mask_ch), jnp.asarray(edge_slot_ch),
            jnp.asarray(frame_ids_ch),
            *plan.jax_arrays(), jnp.int32(t0_), jnp.int32(t1_),
            C=C, num_slots=CH, steps=jnp.int32(steps), P=P, dba_iters=itrs,
            lm=cfg.dba_lm, ep=cfg.dba_ep, EP=EP, upsample=self.upsample,
            t0_quirk=cfg.strict_t0_quirk,
        )
        (self.net, self.target, self.weight, poses, disps, damping,
         disps_up) = out
        s = self.video.state._replace(
            poses=poses, disps=disps, damping=damping
        )
        if self.upsample:
            s = s._replace(disps_up=disps_up)
        self.video.state = s
        self.video.dirty[:t] = True

    def _update_lowmem_sharded(self, mesh, t0=None, t1=None, itrs=2,
                               steps=8, EP=1e-7):
        """update_lowmem over a device mesh (see parallel/backend_shard)."""
        from lgu_slam_tpu.parallel.backend_shard import (  # noqa: PLC0415
            ShardedLowmemPlan, lowmem_steps_sharded,
        )

        t = self.video.counter
        cfg = self.cfg
        CH = cfg.backend_chunk
        rig = self.video.state.fmaps.shape[1]
        D = int(np.prod(mesh.devices.shape))
        axis = mesh.axis_names[0]

        self.corr_impl = "alt"
        self._pyr_dirty = True
        self._ensure_pyramid()

        plan = ShardedLowmemPlan.build(
            self.ii, self.jj, cfg.buffer, D, CH, rig=rig,
            dmax_bucket=self._dmax,
        )
        self._dmax = plan.rof.shape[2]
        C = plan.ii.shape[1]

        h, w = cfg.ht8, cfg.wd8
        perm_flat = plan.perm.reshape(-1)
        in_slot = jnp.asarray(perm_flat % self.E)
        net_ch = self.net[in_slot].reshape(D, C, CH, h, w, 128)
        target_ch = self.target[in_slot].reshape(D, C, CH, h, w, 2)
        weight_ch = self.weight[in_slot].reshape(D, C, CH, h, w, 2)

        t0_ = 1 if t0 is None else t0
        t1_ = t if t1 is None else t1
        Pb = pose_bucket_for(cfg, t1_ - t0_)

        out = lowmem_steps_sharded(
            mesh, axis, self.net_def, self.params, self.video.state,
            self.fmap_pyr, net_ch, target_ch, weight_ch, plan, t0_, t1_,
            num_slots=CH, steps=steps, Pb=Pb, dba_iters=itrs,
            lm=cfg.dba_lm, ep=cfg.dba_ep, EP=EP, upsample=self.upsample,
            t0_quirk=cfg.strict_t0_quirk,
        )
        net_ch, target_ch, weight_ch, poses, disps, damping, disps_up = out

        out_slot = jnp.asarray(
            np.where(plan.mask.reshape(-1) > 0, perm_flat, self.E)
        )
        # shard_map concatenates the device axis into dim 0: [D*C, CH, ...]
        flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
        self.net = self.net.at[out_slot].set(flat(net_ch), mode="drop")
        self.target = self.target.at[out_slot].set(
            flat(target_ch), mode="drop"
        )
        self.weight = self.weight.at[out_slot].set(
            flat(weight_ch), mode="drop"
        )
        s = self.video.state._replace(
            poses=poses, disps=disps, damping=damping
        )
        if self.upsample:
            s = s._replace(disps_up=disps_up)
        self.video.state = s
        self.video.dirty[:t] = True

    def _update_lowmem_chunked(self, t0=None, t1=None, itrs=2, steps=8,
                               EP=1e-7):
        """Unfused update_lowmem (steps x n_chunks host dispatches) — kept
        as the semantics oracle for tests/test_slam_modes.py."""
        if self.n_edges == 0:
            return
        t = self.video.counter
        cfg = self.cfg
        CH = cfg.backend_chunk
        rig = self.video.state.fmaps.shape[1]

        self.corr_impl = "alt"
        self._pyr_dirty = True
        self._ensure_pyramid()

        n = self.n_edges
        n_chunks = (n + CH - 1) // CH

        for step in range(steps):
            for c in range(n_chunks):
                lo = c * CH
                hi = min(lo + CH, n)
                ii_c = np.zeros(CH, np.int32)
                jj_c = np.zeros(CH, np.int32)
                mask_c = np.zeros(CH, np.float32)
                ii_c[: hi - lo] = self.ii[lo:hi]
                jj_c[: hi - lo] = self.jj[lo:hi]
                mask_c[: hi - lo] = 1.0
                # rig-expanded feature indices (factor_graph.py:279)
                ii_rig = rig * ii_c
                jj_rig = rig * jj_c + (
                    (ii_c == jj_c).astype(np.int32) if rig > 1 else 0
                )

                slot = jnp.arange(lo, lo + CH) % self.E  # slot gather pad-safe
                net_c = self.net[slot]
                target_c = self.target[slot]

                # compact frame slots for this chunk (host plan)
                uniq = np.unique(ii_c[mask_c > 0])
                F = CH
                frame_ids = np.zeros(F, np.int32)
                frame_ids[: len(uniq)] = uniq
                slot_of = {int(f): s for s, f in enumerate(uniq)}
                edge_slot = np.asarray(
                    [slot_of.get(int(i), 0) for i in ii_c], np.int32
                )

                net2, target2, weight2, eta, upmask, slot_mask = (
                    _alt_update_op(
                        self.net_def, self.params, self.video.state,
                        self.fmap_pyr, net_c,
                        jnp.asarray(ii_c), jnp.asarray(jj_c),
                        jnp.asarray(ii_rig), jnp.asarray(jj_rig),
                        target_c, jnp.asarray(mask_c),
                        jnp.asarray(edge_slot), F,
                    )
                )
                live = jnp.asarray(mask_c)[:, None, None, None] > 0
                self.net = self.net.at[slot].set(
                    jnp.where(live, net2, net_c).astype(self.net.dtype)
                )
                self.target = self.target.at[slot].set(
                    jnp.where(live, target2, target_c)
                )
                self.weight = self.weight.at[slot].set(
                    jnp.where(live, weight2, self.weight[slot])
                )
                s_v = self.video.state
                s_v = s_v._replace(
                    damping=_update_damping(
                        s_v.damping, eta, jnp.asarray(frame_ids), slot_mask
                    )
                )
                if self.upsample:
                    s_v = s_v._replace(
                        disps_up=_upsample_slots(
                            s_v.disps, s_v.disps_up, upmask,
                            jnp.asarray(frame_ids), slot_mask,
                        )
                    )
                self.video.state = s_v

            self._run_dba(
                1 if t0 is None else t0, t if t1 is None else t1,
                itrs, use_inactive=False, EP=EP, motion_only=False,
            )
            self.video.dirty[:t] = True

    # -- proximity edge selection (host-side NMS) ---------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        """(factor_graph.py:304-316)"""
        ii, jj = np.meshgrid(
            np.arange(t0, t1), np.arange(t0, t1), indexing="ij"
        )
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        c = 1 if self.video.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        """Distance-ranked edge selection with NMS
        (factor_graph.py:319-383)."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if ix.size == 0 or jx.size == 0:
            return

        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        # device-built candidate grid: one dispatch + one d2h, no host
        # index upload (depth_video.py:158-171 distance)
        d = self.video.distance_rect(t0, t, t1, t, beta=beta).reshape(-1)

        # native planner (C++ extension) when built; identical semantics
        from lgu_slam_tpu.utils import native  # noqa: PLC0415

        if native.HAVE_NATIVE:
            existing_ii = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
            existing_jj = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
            es = native.proximity_plan(
                d, ii, jj, existing_ii, existing_jj, t0, t1, t, rad, nms,
                thresh, self.max_factors, self.video.stereo,
            )
            if es:
                es = np.asarray(es, np.int32)
                self.add_factors(es[:, 0], es[:, 1], remove)
            return

        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        def nms_suppress(i, j):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        for i, j in zip(ii1.tolist(), jj1.tolist()):
            nms_suppress(i, j)

        es = []
        for i in range(t0, t):
            if self.video.stereo:
                es.append((i, i))
                if t1 <= i:
                    d[(i - t0) * (t - t1) + (i - t1)] = np.inf
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d[(i - t0) * (t - t1) + (j - t1)] = np.inf

        for k in np.argsort(d):
            if d[k] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            nms_suppress(i, j)

        if es:
            es = np.asarray(es, np.int32)
            self.add_factors(es[:, 0], es[:, 1], remove)
