"""Motion filter / keyframe gate (reference: droid_slam/motion_filter.py).

Runs the feature encoder on *every* incoming frame, probes the flow
magnitude against the last keyframe with a single GRU iteration (no BA),
and appends a keyframe when the mean predicted flow delta exceeds the
threshold (motion_filter.py:48-88).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu import lie
from lgu_slam_tpu.geom.projective import coords_grid
from lgu_slam_tpu.models.net import LGUNet, normalize_images
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.utils.config import SLAMConfig


@partial(jax.jit, static_argnames=("net_def",))
def _encode_features(net_def, params, image):
    """image [H, W, 3] raw BGR -> fmap [h, w, 128] (fp32)."""
    x = normalize_images(image[None])
    return net_def.apply({"params": params}, x, method=LGUNet.features)[0]


@partial(jax.jit, static_argnames=("net_def",))
def _encode_context(net_def, params, image):
    x = normalize_images(image[None])
    net, inp = net_def.apply({"params": params}, x, method=LGUNet.context)
    return net[0], inp[0]


@partial(jax.jit, static_argnames=("net_def",))
def _flow_probe(net_def, params, fmap0, fmap1, net, inp):
    """1-edge corr + 1 GRU iteration; returns mean |delta|
    (motion_filter.py:71-81)."""
    pyr = net_def.apply(
        {"params": params}, fmap0[None], fmap1[None], method=LGUNet.build_corr
    )
    h, w = fmap0.shape[:2]
    coords0 = coords_grid(h, w)[None]
    corr = net_def.apply(
        {"params": params}, pyr, coords0, method=LGUNet.lookup
    )
    _, delta, _ = net_def.apply(
        {"params": params}, net[None, None], inp[None, None], corr[None],
        method=LGUNet.update_step,
    )
    return jnp.mean(jnp.linalg.norm(delta[0, 0], axis=-1))


@partial(jax.jit, static_argnames=("net_def",))
def _encode_and_probe(net_def, params, image, fmap0, net, inp):
    """Per-frame hot path as ONE program: fnet encode + 1-edge probe.

    Every host-blocking round-trip over the axon tunnel costs ~27 ms;
    fusing the encode and the probe leaves exactly one dispatch + one
    scalar d2h (the keyframe gate) per non-keyframe frame."""
    x = normalize_images(image[None])
    gmap = net_def.apply({"params": params}, x, method=LGUNet.features)[0]
    pyr = net_def.apply(
        {"params": params}, fmap0[None], gmap[None], method=LGUNet.build_corr
    )
    h, w = gmap.shape[:2]
    coords0 = coords_grid(h, w)[None]
    corr = net_def.apply(
        {"params": params}, pyr, coords0, method=LGUNet.lookup
    )
    _, delta, _ = net_def.apply(
        {"params": params}, net[None, None], inp[None, None], corr[None],
        method=LGUNet.update_step,
    )
    return gmap, jnp.mean(jnp.linalg.norm(delta[0, 0], axis=-1))


def subsample_depth(depth: np.ndarray) -> np.ndarray:
    """Full-res depth -> 1/8 sensed disparity (depth_video.py:64-66)."""
    d = depth[3::8, 3::8]
    return np.where(d > 0, 1.0 / np.maximum(d, 1e-12), 0.0).astype(np.float32)


class MotionFilter:
    def __init__(self, net_def: LGUNet, params, video: Video,
                 cfg: SLAMConfig):
        self.net_def = net_def
        self.params = params
        self.video = video
        self.thresh = cfg.filter_thresh
        self.cfg = cfg
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """image: [H, W, 3] BGR uint8 (or [2, H, W, 3] stereo pair).

        Returns True if a keyframe was appended.
        """
        stereo = image.ndim == 4
        img0 = image[0] if stereo else image
        img_j = jnp.asarray(img0)

        delta_dev = None
        if self.video.counter == 0 or stereo:
            gmap = _encode_features(self.net_def, self.params, img_j)
        else:
            # mono steady state: encode + probe in one dispatch
            gmap, delta_dev = _encode_and_probe(
                self.net_def, self.params, img_j, self.fmap, self.net,
                self.inp,
            )
        if stereo:
            gmap1 = _encode_features(
                self.net_def, self.params, jnp.asarray(image[1])
            )
            fmap_stack = jnp.stack([gmap, gmap1], axis=0)
        else:
            fmap_stack = gmap[None]

        h, w = gmap.shape[:2]
        sens = (
            jnp.asarray(subsample_depth(np.asarray(depth)))
            if depth is not None
            else jnp.zeros((h, w), jnp.float32)
        )
        intr8 = jnp.asarray(intrinsics, jnp.float32) / 8.0

        fd = self.video.state.fmaps.dtype

        if self.video.counter == 0:
            net, inp = _encode_context(self.net_def, self.params, img_j)
            self.fmap, self.net, self.inp = gmap, net, inp
            self.video.append(
                jnp.float32(tstamp), img_j, lie.se3_identity(),
                jnp.ones((h, w), jnp.float32), sens, intr8,
                fmap_stack.astype(fd), net.astype(fd), inp.astype(fd),
            )
            return True

        if delta_dev is None:  # stereo path: probe on the left camera
            delta_dev = _flow_probe(
                self.net_def, self.params, self.fmap, gmap, self.net,
                self.inp,
            )
        delta = float(delta_dev)
        if delta > self.thresh:
            self.count = 0
            net, inp = _encode_context(self.net_def, self.params, img_j)
            self.fmap, self.net, self.inp = gmap, net, inp
            # keep the pose/disp seeded by the frontend for this slot
            # (depth_video.__item_setter skips None fields, :58-62);
            # jnp-scalar index => one cached gather executable, not one
            # compile per keyframe count
            idx = jnp.int32(self.video.counter)
            pose = self.video.state.poses[idx]
            disp = self.video.state.disps[idx]
            self.video.append(
                jnp.float32(tstamp), img_j, pose, disp, sens, intr8,
                fmap_stack.astype(fd), net.astype(fd), inp.astype(fd),
            )
            return True

        self.count += 1
        return False
