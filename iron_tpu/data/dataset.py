"""Datasets: multi-view images + cameras, with device-resident ray sampling.

Behavioral spec from reference `models/dataset.py`:
  * Dataset (95-373): loads `cam_dict_norm.json` + an image folder into one
    stacked array, precomputes K^-1, generates full-image ray grids and
    random per-image ray batches [rays_o | rays_d | rgb | mask] (10 cols),
    `near_far_from_sphere` = mid +- 1 along the ray;
  * functional stage-2 loaders (1139-1456) return (fpaths, images, Ks,
    W2Cs[, masks]) with optional mask-multiplied images.

TPU-first redesign: the image stack lives on device (HBM) as one array and
ray batches are gathered *on device* with jax RNG inside the jitted train
step — no host->device transfer per iteration (the reference gathers on
CPU then `.cuda()` each step, models/dataset.py:686).  For datasets larger
than HBM, shard the image axis across hosts (each host keeps its images
and samples locally; gradients are averaged by psum anyway).
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.data.cameras import load_cam_dict
from iron_tpu.data.io import read_image
from iron_tpu.core.camera import Camera, make_camera


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """NeuS near/far heuristic (dataset.py:767-774): mid -+ 1."""
    a = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0


def load_image_folder(data_dir: str, folder_name: str = "image",
                      cam_dict_name: str = "cam_dict_norm.json",
                      mask_dir: Optional[str] = None,
                      apply_mask: bool = False,
                      shard: Optional[Tuple[int, int]] = None):
    """Load (fpaths, images [N,H,W,3], Ks [N,4,4], W2Cs [N,4,4], masks) from
    an image folder + cam dict (dataset.py:1139-1223 semantics).

    `shard=(index, count)` keeps only files i % count == index, selected
    BEFORE any pixel is read — per-host sharding never materializes the
    full stack on any process (SURVEY §2.5)."""
    cam_path = os.path.join(data_dir, cam_dict_name)
    if not os.path.isfile(cam_path):
        cam_path = os.path.join(os.path.dirname(data_dir), cam_dict_name)
    cam_dict = load_cam_dict(cam_path)

    fpaths = []
    for ext in ("png", "jpg", "jpeg", "exr"):
        fpaths += glob.glob(os.path.join(data_dir, folder_name, f"*.{ext}"))
    fpaths = sorted(fpaths)
    if shard is not None:
        idx, count = shard
        fpaths = fpaths[idx::count]

    images, Ks, W2Cs, masks, kept = [], [], [], [], []
    for fp in fpaths:
        name = os.path.basename(fp)
        key = name if name in cam_dict else os.path.splitext(name)[0] + ".png"
        if key not in cam_dict:
            continue
        img = read_image(fp)
        m = np.ones_like(img)
        if mask_dir is not None:
            mp = sorted(glob.glob(os.path.join(mask_dir, os.path.splitext(name)[0] + ".*")))
            if mp:
                m = read_image(mp[0])
        if apply_mask:
            img = np.where(m < 0.1, 0.0, img)
        images.append(img)
        masks.append(m)
        Ks.append(cam_dict[key]["K"])
        W2Cs.append(cam_dict[key]["W2C"])
        kept.append(fp)

    return (kept, np.stack(images), np.stack(Ks), np.stack(W2Cs), np.stack(masks))


@dataclass
class RayDataset:
    """Device-resident multi-view dataset with jittable ray sampling."""
    images: jnp.ndarray      # [N, H, W, 3]
    masks: jnp.ndarray       # [N, H, W, 1]
    Ks: jnp.ndarray          # [N, 4, 4]
    W2Cs: jnp.ndarray        # [N, 4, 4]
    K_invs: jnp.ndarray      # [N, 4, 4]
    C2Ws: jnp.ndarray        # [N, 4, 4]
    fpaths: List[str]

    @classmethod
    def from_folder(cls, data_dir: str, folder_name: str = "image",
                    cam_dict_name: str = "cam_dict_norm.json",
                    mask_dir: Optional[str] = None,
                    per_host_shard: bool = False) -> "RayDataset":
        """With per_host_shard, each process keeps only images
        i % process_count == process_index (SURVEY §2.5 "per-host image
        shards"): in a multi-host run every host loads, stores, and
        samples rays from its own subset — the gradient psum averages
        across hosts, so this is plain data parallelism over views.
        Host memory AND work scale as N/process_count."""
        shard = None
        if per_host_shard and jax.process_count() > 1:
            shard = (jax.process_index(), jax.process_count())
        fpaths, imgs, Ks, W2Cs, masks = load_image_folder(
            data_dir, folder_name, cam_dict_name, mask_dir, shard=shard)
        return cls.from_arrays(imgs, Ks, W2Cs, masks[..., :1], fpaths)

    @classmethod
    def from_arrays(cls, images, Ks, W2Cs, masks=None, fpaths=()) -> "RayDataset":
        images = jnp.asarray(images, jnp.float32)
        if masks is None:
            masks = jnp.ones(images.shape[:-1] + (1,), jnp.float32)
        Ks = jnp.asarray(Ks, jnp.float32)
        W2Cs = jnp.asarray(W2Cs, jnp.float32)
        return cls(images=images, masks=jnp.asarray(masks, jnp.float32),
                   Ks=Ks, W2Cs=W2Cs,
                   K_invs=jnp.linalg.inv(Ks), C2Ws=jnp.linalg.inv(W2Cs),
                   fpaths=list(fpaths))

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    @property
    def hw(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def camera(self, idx: int) -> Camera:
        H, W = self.hw
        return make_camera(np.asarray(self.Ks[idx]), np.asarray(self.W2Cs[idx]), H, W)

    def gen_random_rays(self, key: jax.Array, img_idx, batch_size: int) -> jnp.ndarray:
        """Random pixels of one image -> [B, 10] = rays_o|rays_d|rgb|mask.

        Device-side equivalent of gen_random_rays_at (dataset.py:672-686);
        fully jittable (img_idx may be traced).
        """
        H, W = self.hw
        kx, ky = jax.random.split(key)
        px = jax.random.randint(kx, (batch_size,), 0, W)
        py = jax.random.randint(ky, (batch_size,), 0, H)

        color = self.images[img_idx, py, px]       # [B, 3]
        mask = self.masks[img_idx, py, px]         # [B, 1]

        uv = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], axis=-1) + 0.5
        uv_h = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        hp = jax.lax.Precision.HIGHEST
        d_cam = jnp.dot(uv_h, self.K_invs[img_idx][:3, :3].T, precision=hp)
        d_world = jnp.dot(d_cam, self.C2Ws[img_idx][:3, :3].T, precision=hp)
        rays_d = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
        rays_o = jnp.broadcast_to(self.C2Ws[img_idx][:3, 3], rays_d.shape)
        return jnp.concatenate([rays_o, rays_d, color, mask], axis=-1)

    def gen_rays_between(self, idx_0: int, idx_1: int, ratio: float,
                         resolution_level: int = 1):
        """Rays from a pose slerp-interpolated between two cameras
        (dataset.py:302-334): rotation slerped, translation lerped, using
        camera-0 intrinsics."""
        from scipy.spatial.transform import Rotation, Slerp

        H, W = self.hw
        l = resolution_level
        C2W0 = np.asarray(self.C2Ws[idx_0])
        C2W1 = np.asarray(self.C2Ws[idx_1])
        rots = Rotation.from_matrix(np.stack([C2W0[:3, :3], C2W1[:3, :3]]))
        rot = Slerp([0, 1], rots)(float(ratio)).as_matrix()
        trans = (1.0 - ratio) * C2W0[:3, 3] + ratio * C2W1[:3, 3]

        tx = jnp.linspace(0, W - 1, W // l) + 0.5
        ty = jnp.linspace(0, H - 1, H // l) + 0.5
        px, py = jnp.meshgrid(tx, ty, indexing="xy")
        uv_h = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
        hp = jax.lax.Precision.HIGHEST
        d_cam = jnp.dot(uv_h, self.K_invs[0][:3, :3].T, precision=hp)
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
        rays_d = jnp.dot(d_cam, jnp.asarray(rot, jnp.float32).T, precision=hp)
        rays_o = jnp.broadcast_to(jnp.asarray(trans, jnp.float32), rays_d.shape)
        return rays_o, rays_d

    def gen_rays_grid(self, img_idx: int, resolution_level: int = 1):
        """Full-image ray grid at a downsample level (dataset.py:gen_rays_at)."""
        H, W = self.hw
        l = resolution_level
        tx = jnp.linspace(0, W - 1, W // l) + 0.5
        ty = jnp.linspace(0, H - 1, H // l) + 0.5
        px, py = jnp.meshgrid(tx, ty, indexing="xy")
        uv = jnp.stack([px, py], axis=-1)
        uv_h = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        hp = jax.lax.Precision.HIGHEST
        d_cam = jnp.dot(uv_h, self.K_invs[img_idx][:3, :3].T, precision=hp)
        d_world = jnp.dot(d_cam, self.C2Ws[img_idx][:3, :3].T, precision=hp)
        rays_d = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
        rays_o = jnp.broadcast_to(self.C2Ws[img_idx][:3, 3], rays_d.shape)
        return rays_o, rays_d
