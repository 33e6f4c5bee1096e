"""Hash-grid NeRF runner — the `render_volume_tcnn.py` equivalent.

Behavioral spec from reference render_volume_tcnn.py:63-111 (TCNNRunner /
train_nerf): hash-grid NeRF trained with plain L1 color loss over random
ray batches, density-compositing renderer, optional white background.

Scene-component switches (render_volume_tcnn.py:63-66):
  * use_background — the hash-grid NeRF itself (scene.use_background);
  * use_foreground — adds a hash-grid SDF + rendering head rendered
    NeuS-style inside the unit sphere, composited over the background
    (the reference constructs TCNNSDF under this switch,
    render_volume_tcnn.py:88-91);
  * use_envmap — adds a learnable equirectangular environment map as the
    residual-transmittance background term (the reference's
    scene.use_envmap hook, render_volume_tcnn.py:93-99, is an empty
    placeholder; here it is functional).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iron_tpu.fields.hashgrid import (HashNeRFConfig, init_hash_nerf,
                                      hash_nerf_apply, HashSDFConfig,
                                      init_hash_sdf, hash_sdf_only,
                                      hash_sdf_value_feat_grad,
                                      HashRenderingConfig, init_hash_rendering,
                                      hash_rendering_apply)
from iron_tpu.fields.scalars import init_variance, variance_apply
from iron_tpu.volume.integrator import (nerf_density_render, neus_render,
                                        NeuSRenderConfig)
from iron_tpu.data.dataset import RayDataset, near_far_from_sphere
from iron_tpu.train.schedules import warmup_cosine_schedule


@dataclass(frozen=True)
class NeRFRunnerConfig:
    nerf: HashNeRFConfig = field(default_factory=HashNeRFConfig)
    n_samples: int = 64
    learning_rate: float = 1e-2     # hash grids like large lrs
    warm_up_end: int = 200
    end_iter: int = 20000
    batch_size: int = 1024
    use_white_bkgd: bool = False
    # scene-component switches (render_volume_tcnn.py:63-66)
    use_background: bool = True
    use_foreground: bool = False
    use_envmap: bool = False
    envmap_hw: tuple = (16, 32)
    sdf: HashSDFConfig = field(default_factory=HashSDFConfig)
    rendering: HashRenderingConfig = field(default_factory=HashRenderingConfig)
    variance_init: float = 0.3
    igr_weight: float = 0.1


def envmap_color(env: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Differentiable bilinear equirect lookup, z-up: [B,3] from [He,We,3]."""
    He, We = env.shape[:2]
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-10)
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    r = jnp.clip(theta / jnp.pi * He - 0.5, 0.0, He - 1.0)
    c = (phi + jnp.pi) / (2 * jnp.pi) * We - 0.5
    r0 = jnp.floor(r).astype(jnp.int32)
    c0f = jnp.floor(c)
    fr, fc = r - r0, c - c0f
    r1 = jnp.clip(r0 + 1, 0, He - 1)
    c0 = jnp.mod(c0f.astype(jnp.int32), We)
    c1 = jnp.mod(c0 + 1, We)  # azimuth wraps
    v00, v01 = env[r0, c0], env[r0, c1]
    v10, v11 = env[r1, c0], env[r1, c1]
    fr, fc = fr[..., None], fc[..., None]
    return ((1 - fr) * ((1 - fc) * v00 + fc * v01)
            + fr * ((1 - fc) * v10 + fc * v11))


class HashNeRFTrainer:
    def __init__(self, cfg: NeRFRunnerConfig, dataset: RayDataset,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.dataset = dataset
        key = key if key is not None else jax.random.PRNGKey(0)
        k_bg, k_fg, k_col = jax.random.split(key, 3)
        self.params = {}
        if cfg.use_background:
            self.params["nerf"] = init_hash_nerf(k_bg, cfg.nerf)
        if cfg.use_foreground:
            self.params["sdf"] = init_hash_sdf(k_fg, cfg.sdf)
            self.params["color"] = init_hash_rendering(k_col, cfg.rendering)
            self.params["variance"] = init_variance(cfg.variance_init)
        if cfg.use_envmap:
            self.params["envmap"] = 0.5 * jnp.ones(cfg.envmap_hw + (3,))
        if not (cfg.use_background or cfg.use_foreground):
            # envmap-only has no geometry/radiance field to composite over:
            # the loss would KeyError on params['nerf'] (ADVICE r3).
            raise ValueError("enable at least one of use_background/"
                             "use_foreground (use_envmap only adds a "
                             "background emitter on top of them)")
        self.tx = optax.adam(warmup_cosine_schedule(
            cfg.learning_rate, cfg.warm_up_end, cfg.end_iter))
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        ds = dataset

        @jax.jit
        def train_step(params, opt_state, step, key):
            k_img, k_ray, k_z = jax.random.split(key, 3)
            img_idx = jax.random.randint(k_img, (), 0, ds.n_images)
            batch = ds.gen_random_rays(k_ray, img_idx, cfg.batch_size)
            rays_o, rays_d, true_rgb = batch[:, :3], batch[:, 3:6], batch[:, 6:9]
            near, far = near_far_from_sphere(rays_o, rays_d)
            def loss_fn(p):
                if cfg.use_envmap:
                    bg = envmap_color(jnp.abs(p["envmap"]), rays_d)
                elif cfg.use_white_bkgd:
                    bg = jnp.ones((1, 3))
                else:
                    bg = None

                eik = 0.0
                if cfg.use_foreground:
                    # NeuS-style foreground SDF composited over the
                    # background NeRF / envmap (render_volume_tcnn.py:88-91)
                    nerf_fn = None
                    rcfg = NeuSRenderConfig(n_samples=cfg.n_samples,
                                            n_importance=0, n_outside=0)
                    if cfg.use_background:
                        nerf_fn = lambda pts, dirs: hash_nerf_apply(
                            p["nerf"], cfg.nerf, pts, dirs)
                        rcfg = NeuSRenderConfig(n_samples=cfg.n_samples,
                                                n_importance=0,
                                                n_outside=max(cfg.n_samples // 2, 8))
                    out = neus_render(
                        rays_o, rays_d, near, far,
                        sdf_fn=lambda x: hash_sdf_only(p["sdf"], x, cfg.sdf),
                        sdf_all_fn=lambda x: hash_sdf_value_feat_grad(
                            p["sdf"], x, cfg.sdf),
                        color_fn=lambda pts, nrm, dirs, feat: hash_rendering_apply(
                            p["color"], cfg.rendering, pts, nrm, dirs, feat),
                        inv_s=variance_apply(p["variance"]),
                        nerf_fn=nerf_fn, cfg=rcfg, key=k_z,
                        background_rgb=bg)
                    out = {**out, "color": out["color_fine"]}
                    eik = cfg.igr_weight * out["gradient_error"]
                else:
                    out = nerf_density_render(
                        rays_o, rays_d, near, far,
                        lambda pts, dirs: hash_nerf_apply(
                            p["nerf"], cfg.nerf, pts, dirs),
                        cfg.n_samples, background_rgb=bg, key=k_z)
                l1 = jnp.mean(jnp.abs(out["color"] - true_rgb))
                loss = l1 + eik
                psnr = 20.0 * jnp.log10(
                    1.0 / jnp.sqrt(jnp.mean((out["color"] - true_rgb) ** 2) + 1e-12))
                return loss, {"loss": loss, "psnr": psnr}

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self._train_step = train_step

    def run(self, num_iters: int, log_every: int = 0, seed: int = 0) -> Dict:
        key = jax.random.PRNGKey(seed)
        metrics = {}
        for _ in range(num_iters):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, self.step, sub)
            self.step += 1
            if log_every and self.step % log_every == 0:
                print(f"[nerf {self.step}] " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))
        return {k: float(v) for k, v in metrics.items()}
