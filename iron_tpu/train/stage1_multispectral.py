"""Dual-spectrum (RGB + NIR) stage-1 training.

Behavioral spec from reference `render_volume.py:21-135,316-435` (the
fork's NIR+RGB flash-photography extension):
  * shared SDF + variance networks; per-modality color networks and
    background NeRFs (render_volume.py:74-108);
  * one Adam over all params (render_volume.py:91);
  * phased curriculum: train 'rgb' to end_iter, then 'nir' to 2*end_iter
    (render_volume.py:50-51, train_NIRRGB);
  * cross-modality checkpoint handoff: RGB ckpt provides the SDF, NIR ckpt
    the NIR color nets (render_volume.py:592-611, load_checkpoint_NIR).

Each modality gets its own jitted step; both close over the same param
pytree so the SDF/variance accumulate gradients from whichever modality is
active.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iron_tpu.fields.sdf import init_sdf
from iron_tpu.fields.rendering import RenderingConfig, init_rendering
from iron_tpu.fields.nerf import init_nerf
from iron_tpu.fields.scalars import init_variance
from iron_tpu.data.dataset import RayDataset
from iron_tpu.train.stage1 import Stage1Config, stage1_loss, STAGE1_COLOR
from iron_tpu.train.schedules import warmup_cosine_schedule, cos_anneal_ratio
from iron_tpu.train.checkpoints import save_checkpoint, latest_checkpoint, load_checkpoint


@dataclass(frozen=True)
class MultiSpectralConfig:
    base: Stage1Config = field(default_factory=Stage1Config)
    nir_color: RenderingConfig = STAGE1_COLOR  # model.nir_network default
    rgb_iters: Optional[int] = None   # default: base.end_iter
    nir_iters: Optional[int] = None   # default: base.end_iter more (2x total)


def init_multispectral_params(key, cfg: MultiSpectralConfig) -> Dict:
    ks = jax.random.split(key, 5)
    base = cfg.base
    params = {
        "sdf": init_sdf(ks[0], base.sdf),
        "variance": init_variance(base.variance_init),
        "color_rgb": init_rendering(ks[1], base.color),
        "color_nir": init_rendering(ks[2], cfg.nir_color),
    }
    if base.render.n_outside > 0:
        params["nerf_rgb"] = init_nerf(ks[3], base.nerf)
        params["nerf_nir"] = init_nerf(ks[4], base.nerf)
    return params


def _view(params: Dict, modality: str, has_nerf: bool) -> Dict:
    v = {"sdf": params["sdf"], "variance": params["variance"],
         "color": params[f"color_{modality}"]}
    if has_nerf:
        v["nerf"] = params[f"nerf_{modality}"]
    return v


class MultiSpectralStage1Trainer:
    def __init__(self, cfg: MultiSpectralConfig, datasets: Dict[str, RayDataset],
                 key: Optional[jax.Array] = None, out_dir: Optional[str] = None):
        self.cfg = cfg
        self.datasets = datasets
        self.out_dir = out_dir
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = init_multispectral_params(key, cfg)
        base = cfg.base
        self.schedule = warmup_cosine_schedule(base.learning_rate, base.warm_up_end,
                                               base.end_iter, base.learning_rate_alpha)
        self.tx = optax.adam(self.schedule)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self.has_nerf = base.render.n_outside > 0
        self._steps = {}
        for modality, ds in datasets.items():
            self._steps[modality] = self._build_step(modality, ds)

    def _build_step(self, modality: str, ds: RayDataset):
        base = self.cfg.base
        mod_cfg = base if modality == "rgb" else replace(base, color=self.cfg.nir_color)
        has_nerf = self.has_nerf

        @jax.jit
        def train_step(params, opt_state, step, key):
            k_img, k_ray, k_render = jax.random.split(key, 3)
            img_idx = jax.random.randint(k_img, (), 0, ds.n_images)
            batch = ds.gen_random_rays(k_ray, img_idx, base.batch_size)
            anneal = cos_anneal_ratio(step, base.anneal_end)

            def loss_fn(p):
                return stage1_loss(_view(p, modality, has_nerf), mod_cfg, batch,
                                   k_render, anneal)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return train_step

    def run_phase(self, modality: str, num_iters: int, log_every: int = 0,
                  seed: int = 0) -> Dict:
        step_fn = self._steps[modality]
        key = jax.random.PRNGKey(seed + self.step)
        metrics = {}
        for _ in range(num_iters):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, metrics = step_fn(
                self.params, self.opt_state, self.step, sub)
            self.step += 1
            if log_every and self.step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"[stage1-{modality} {self.step}] "
                      + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        return {k: float(v) for k, v in metrics.items()}

    def run_curriculum(self, log_every: int = 0, seed: int = 0) -> Dict:
        """rgb to end_iter then nir for another end_iter (render_volume.py:50-51)."""
        base = self.cfg.base
        rgb_n = self.cfg.rgb_iters if self.cfg.rgb_iters is not None else base.end_iter
        nir_n = self.cfg.nir_iters if self.cfg.nir_iters is not None else base.end_iter
        m = self.run_phase("rgb", rgb_n, log_every, seed)
        if "nir" in self.datasets:
            m = self.run_phase("nir", nir_n, log_every, seed)
        return m

    def save(self):
        if self.out_dir:
            save_checkpoint(self.out_dir, self.step, self.params, self.opt_state)

    def load_cross_modality(self, rgb_ckpt_dir: Optional[str] = None,
                            nir_ckpt_dir: Optional[str] = None):
        """RGB ckpt -> SDF (+rgb nets); NIR ckpt -> NIR nets
        (render_volume.py:592-611)."""
        if rgb_ckpt_dir:
            path = latest_checkpoint(rgb_ckpt_dir)
            if path:
                ck = load_checkpoint(path)["params"]
                self.params["sdf"] = jax.tree_util.tree_map(jnp.asarray, ck["sdf"])
                for k in ("variance", "color_rgb", "nerf_rgb"):
                    if k in ck and k in self.params:
                        self.params[k] = jax.tree_util.tree_map(jnp.asarray, ck[k])
        if nir_ckpt_dir:
            path = latest_checkpoint(nir_ckpt_dir)
            if path:
                ck = load_checkpoint(path)["params"]
                for k in ("color_nir", "nerf_nir"):
                    if k in ck and k in self.params:
                        self.params[k] = jax.tree_util.tree_map(jnp.asarray, ck[k])
