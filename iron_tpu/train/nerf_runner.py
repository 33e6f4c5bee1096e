"""Hash-grid NeRF runner — the `render_volume_tcnn.py` equivalent.

Behavioral spec from reference render_volume_tcnn.py:63-111 (TCNNRunner /
train_nerf): hash-grid NeRF trained with plain L1 color loss over random
ray batches, density-compositing renderer, optional white background.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iron_tpu.fields.hashgrid import HashNeRFConfig, init_hash_nerf, hash_nerf_apply
from iron_tpu.volume.integrator import nerf_density_render
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


class HashNeRFTrainer:
    def __init__(self, cfg: NeRFRunnerConfig, dataset: RayDataset,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        self.dataset = dataset
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = init_hash_nerf(key, cfg.nerf)
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
            bg = jnp.ones((1, 3)) if cfg.use_white_bkgd else None

            def loss_fn(p):
                out = nerf_density_render(
                    rays_o, rays_d, near, far,
                    lambda pts, dirs: hash_nerf_apply(p, cfg.nerf, pts, dirs),
                    cfg.n_samples, background_rgb=bg, key=k_z)
                l1 = jnp.mean(jnp.abs(out["color"] - true_rgb))
                psnr = 20.0 * jnp.log10(
                    1.0 / jnp.sqrt(jnp.mean((out["color"] - true_rgb) ** 2) + 1e-12))
                return l1, {"loss": l1, "psnr": psnr}

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
