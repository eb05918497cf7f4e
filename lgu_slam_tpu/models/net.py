"""LGUNet: the full learned SLAM network (reference: droid_slam/droid_net.py
``DroidNet``:139-239) — feature/context encoders, Gaussian-uncertainty
correlation, deformable-offset heads, and the KAN-biased update operator,
plus the unrolled training forward with per-step differentiable BA.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lgu_slam_tpu.geom import projective as pops
from lgu_slam_tpu.geom.ba import ba
from lgu_slam_tpu.geom.losses import safe_norm
from lgu_slam_tpu.models.corr import (
    CorrPyramid,
    alt_corr_lookup,
    build_corr_pyramid,
    corr_lookup,
)
from lgu_slam_tpu.models.extractor import BasicEncoder
from lgu_slam_tpu.models.gaussian_mask import GaussianMask
from lgu_slam_tpu.models.update import UpdateModule, upsample_disp

# BGR input, ImageNet statistics (droid_net.py:162-166)
_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """images [..., H, W, 3] BGR uint8/float -> normalized RGB float."""
    rgb = images[..., ::-1].astype(jnp.float32) / 255.0
    return (rgb - _MEAN) / _STD


class LGUNet(nn.Module):
    """All learned components behind one parameter tree."""

    volume_dtype: jnp.dtype = jnp.float32
    # conv compute dtype for the update operator (bf16 on the TPU
    # inference path; training / parity tests keep the fp32 default)
    compute_dtype: jnp.dtype | None = None
    # edge sub-chunk of the low-memory volume correlation sweep
    # (per-group HBM transient = sub_chunk * P1 * P2 bf16)
    alt_sub_chunk: int = 8

    def setup(self):
        self.fnet = BasicEncoder(128, "instance", dtype=self.compute_dtype)
        self.cnet = BasicEncoder(256, "none", dtype=self.compute_dtype)
        self.ga = GaussianMask()
        # zero-initialized offset heads (droid_net.py:149-156)
        self.ofs_map = nn.Conv(
            98, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
            name="ofs_map",
        )
        self.ofs_residual = nn.Conv(
            98, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
            name="ofs_residual",
        )
        self.update = UpdateModule(dtype=self.compute_dtype)

    # -- feature extraction -------------------------------------------------

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """Normalized images [B, H, W, 3] -> matching fmaps [B, H/8, W/8, 128]."""
        return self.fnet(images)

    def context(self, images: jnp.ndarray):
        """-> (net [.., 128] tanh, inp [.., 128] relu) (droid_net.py:169-173)."""
        x = self.cnet(images)
        net, inp = jnp.split(x, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    # -- correlation --------------------------------------------------------

    def build_corr(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                   pack: bool | None = None) -> CorrPyramid:
        """fmap1/2: [E, H, W, 128] per-edge features.  ``pack=None`` packs
        the levels for the Pallas lookup on TPU (inference); the training
        forward passes ``pack=False`` to keep the differentiable path."""
        return build_corr_pyramid(
            self.ga.predict, self.ofs_map, self.ofs_residual, fmap1, fmap2,
            volume_dtype=self.volume_dtype, pack=pack,
        )

    def lookup(self, pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
        return corr_lookup(pyr, coords)

    def alt_corr(self, fmap_pyr, ii, jj, coords) -> jnp.ndarray:
        return alt_corr_lookup(
            fmap_pyr, ii, jj, coords, self.ofs_map, self.ofs_residual,
            sub_chunk=self.alt_sub_chunk,
        )

    def update_step(self, net, inp, corr, flow=None, ii=None, num_frames=None,
                    edge_mask=None):
        return self.update(net, inp, corr, flow, ii, num_frames, edge_mask)

    # -- training forward ---------------------------------------------------

    def __call__(
        self,
        Gs: jnp.ndarray,
        images: jnp.ndarray,
        disps: jnp.ndarray,
        intrinsics: jnp.ndarray,
        ii: jnp.ndarray,
        jj: jnp.ndarray,
        num_steps: int = 12,
        fixedp: int = 2,
    ):
        """Unrolled training forward (droid_net.py:176-239).

        Gs [B, N, 7] poses, images [B, N, H, W, 3] raw BGR,
        disps [B, N, H/8, W/8], intrinsics [B, N, 4] (1/8 scale),
        ii/jj [E] static edge lists.

        Returns (poses_list, disps_up_list, residual_list, nll_loss).
        """
        B, N = images.shape[:2]
        E = ii.shape[0]

        imgs = normalize_images(images).reshape((B * N,) + images.shape[2:])
        fmaps = self.features(imgs)
        net_c, inp_c = self.context(imgs)
        h8, w8 = fmaps.shape[1:3]
        fmaps = fmaps.reshape(B, N, h8, w8, 128)
        net = net_c.reshape(B, N, h8, w8, 128)[:, ii]
        inp = inp_c.reshape(B, N, h8, w8, 128)[:, ii]

        # per-edge correlation pyramid, batch folded into the edge axis
        f1 = fmaps[:, ii].reshape(B * E, h8, w8, 128)
        f2 = fmaps[:, jj].reshape(B * E, h8, w8, 128)
        pyr = self.build_corr(f1, f2, pack=False)  # differentiable path
        mean_n = pyr.mean.reshape(B, E, h8, w8, 2)
        theta = pyr.theta.reshape(B, E, h8, w8)

        coords0 = pops.coords_grid(h8, w8)

        def reproject(Gs, disps):
            def one(g, d, k):
                c, v = pops.projective_transform(g, d, k, ii, jj)
                return c, v

            return jax.vmap(one)(Gs, disps, intrinsics)

        coords1, _ = reproject(Gs, disps)
        target = coords1

        poses_out, disps_out, resid_out, nll = [], [], [], []
        for step in range(num_steps):
            Gs = jax.lax.stop_gradient(Gs)
            disps = jax.lax.stop_gradient(disps)
            coords1 = jax.lax.stop_gradient(coords1)
            target = jax.lax.stop_gradient(target)

            resd = target - coords1
            flow = coords1 - coords0
            corr = self.lookup(
                pyr, coords1.reshape(B * E, h8, w8, 2)
            ).reshape(B, E, h8, w8, -1)
            motion = jnp.clip(
                jnp.concatenate([flow, resd], axis=-1), -64.0, 64.0
            )

            net, delta, weight, eta, upmask, _ = self.update_step(
                net, inp, corr, motion, ii, N
            )

            target = coords1 + delta
            for _ in range(2):
                Gs, disps = ba(
                    target, weight, eta, Gs, disps, intrinsics, ii, jj,
                    fixedp=fixedp,
                )

            coords1, valid = reproject(Gs, disps)
            residual = target - coords1

            if step > num_steps - 6:
                # Gaussian-NLL auxiliary loss (droid_net.py:225-227)
                # safe norm: invalid pixels are exact zeros and
                # jnp.linalg.norm backprops NaN (0/0) at the origin
                cn = safe_norm(coords1 * valid)
                mn = safe_norm(mean_n * valid)
                t = jnp.maximum(theta, 1e-6)
                nll.append(
                    jnp.mean(jnp.abs(cn - mn) / (2 * t) + jnp.log(jnp.sqrt(t)))
                )

            poses_out.append(Gs)
            du = upsample_disp(
                disps.reshape(B * N, h8, w8),
                upmask.reshape(B * N, h8, w8, -1),
            ).reshape(B, N, 8 * h8, 8 * w8)
            disps_out.append(du)
            resid_out.append(valid * residual)

        loss = sum(nll) if nll else jnp.zeros(())
        return poses_out, disps_out, resid_out, loss
