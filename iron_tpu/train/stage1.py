"""Stage-1 trainer: NeuS volumetric SDF training.

Behavioral spec from reference `render_volume.py` (Runner):
  * per iter: one random image, `batch_size` random rays, near/far from the
    unit sphere, NeuS render with cos-anneal, loss = L1(color)/mask_sum +
    igr_weight * eikonal + mask_weight * BCE (render_volume.py:376-397);
  * one Adam over all params, lr 5e-4 with 5k warmup + cosine to alpha=0.05
    (render_volume.py:554-563, confs/womask_iron.conf);
  * checkpoints {nerf, sdf, variance, color, optimizer, step}
    (render_volume.py:613-643); validation renders + mesh dumps.

TPU-first: the entire iteration (ray sampling included) is ONE jitted
function of (params, opt_state, step, rng) — zero host<->device traffic in
steady state.  The optional `mesh` argument shards the ray batch across
devices (dp) with replicated params and psum-averaged gradients; XLA's
async collectives overlap the all-reduce with the backward pass.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply, sdf_only, sdf_value_feat_grad
from iron_tpu.fields.rendering import RenderingConfig, init_rendering, rendering_apply
from iron_tpu.fields.nerf import NeRFConfig, init_nerf, nerf_apply
from iron_tpu.fields.scalars import init_variance, variance_apply
from iron_tpu.volume.integrator import NeuSRenderConfig, neus_render
from iron_tpu.losses.regularizers import mask_bce_loss
from iron_tpu.losses.image import psnr as psnr_fn
from iron_tpu.data.dataset import RayDataset, near_far_from_sphere
from iron_tpu.train.schedules import warmup_cosine_schedule, cos_anneal_ratio
from iron_tpu.train.checkpoints import save_checkpoint, latest_checkpoint, load_checkpoint


# stage-1 color network (confs/womask_iron.conf rendering_network)
STAGE1_COLOR = RenderingConfig(d_feature=256, mode="idr", d_in=9, d_out=3,
                               d_hidden=256, n_layers=8, multires=10,
                               multires_view=4, squeeze_out=True, skip_in=(4,))


@dataclass(frozen=True)
class Stage1Config:
    learning_rate: float = 5e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 100001
    batch_size: int = 512
    warm_up_end: int = 5000
    anneal_end: int = 50000
    use_white_bkgd: bool = False
    igr_weight: float = 0.1
    mask_weight: float = 0.0
    variance_init: float = 0.3
    save_freq: int = 10000
    val_freq: int = 500
    report_freq: int = 100
    # matmul precision for the stop-gradient importance-sampling SDF sweeps
    # (renderer.py:389 runs them under no_grad); the differentiable
    # render_core pass stays at sdf.precision.
    upsample_precision: str = "high"
    # run the importance-sampling sweeps through the fused bf16 Pallas
    # kernel (kernels/fused_sdf.py) on TPU.  Affects sample *placement*
    # only (bf16-class SDF error); render_core re-evaluates every sample at
    # core_precision with gradients.  Disabled on the dp path (dist/train.py).
    upsample_pallas: bool = False
    # matmul precision of the differentiable SDF pass in render_core
    # (forward + 2nd-order eikonal backward).  'high' (bf16x3, ~2e-4 SDF
    # error) is tighter than the reference's A100 TF32 matmuls (~1e-3) and
    # +8% stage-1 throughput over 'highest' on TPU at equal train PSNR
    # (scripts/bench_stage1_upsample.py A/B, 3k-iter sphere).
    core_precision: str = "high"
    # occupancy-grid guided initial sampling (volume/occupancy.py); the grid
    # is refreshed every `occupancy_update_every` steps outside the jit.
    use_occupancy: bool = False
    occupancy_update_every: int = 256
    # how render_core computes per-point normals (fields.sdf):
    #   'vjp' — one reverse sweep (reference semantics, fields.py:106-137);
    #   'jvp' — 3 structured forward-mode tangents (measured 33% SLOWER on
    #   chip, BENCH_NOTES round-4 — kept as the documented negative result);
    #   'pallas' — the fused differentiable kernel
    #   (kernels/fused_sdf_grad.py): forward + reverse-grad sweep in one
    #   VMEM-resident Pallas call with a hand-derived second-order backward
    #   kernel, eliminating the HBM round-trips of the [B*S,256] activation
    #   chain.  All three are exact (tests/test_fields.py,
    #   tests/test_kernels.py); 'pallas' falls back to 'vjp' off-TPU.
    #   Round-5 on-chip A/B (scripts/bench_stage1_normals.py, v5e, batch
    #   512): pallas 24.2 it/s vs vjp 19.7 — +23%, now the default.
    normals_mode: str = "pallas"
    # rematerialize the differentiable SDF/color applies in render_core:
    # the second-order eikonal graph otherwise retains [B, S, 256]
    # activations for BOTH sweeps of the double backward (41 GB of HLO
    # temps at batch 8192, BENCH_NOTES), capping the usable batch.  With
    # remat the backward recomputes the MLP forward instead — the enabler
    # for the 2k-16k batch sweep (scripts/bench_stage1_scaling.py).
    remat_core: bool = False
    # non-blocking orbax checkpointing (SURVEY §5): saves run in a
    # background thread so the step loop never stalls on serialization.
    # The CLI turns this on for real runs; pickle remains the default for
    # tests and tooling that read ckpt_*.pkl directly.
    async_ckpt: bool = False
    sdf: SDFConfig = field(default_factory=SDFConfig)
    nerf: NeRFConfig = field(default_factory=NeRFConfig)
    color: RenderingConfig = STAGE1_COLOR
    render: NeuSRenderConfig = field(default_factory=NeuSRenderConfig)


def init_stage1_params(key, cfg: Stage1Config) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "sdf": init_sdf(k1, cfg.sdf),
        "color": init_rendering(k2, cfg.color),
        "variance": init_variance(cfg.variance_init),
    }
    if cfg.render.n_outside > 0:
        params["nerf"] = init_nerf(k3, cfg.nerf)
    return params


def stage1_render(params: Dict, cfg: Stage1Config, rays_o, rays_d, near, far,
                  key, cos_anneal, background_rgb=None, perturb_overwrite=-1.0,
                  init_z=None):
    import dataclasses as _dc
    from iron_tpu.kernels.fused_sdf import (make_pallas_sdf_only_bf16_fn,
                                            pallas_available)
    if cfg.upsample_pallas and pallas_available():
        sdf_fn = make_pallas_sdf_only_bf16_fn(params["sdf"], cfg.sdf)
    else:
        up_cfg = _dc.replace(cfg.sdf, precision=cfg.upsample_precision)
        sdf_fn = lambda p: sdf_only(params["sdf"], p, up_cfg)
    core_cfg = _dc.replace(cfg.sdf, precision=cfg.core_precision)
    if cfg.normals_mode == "jvp":
        from iron_tpu.fields.sdf import sdf_value_feat_grad_fwd
        sdf_all_fn = lambda p: sdf_value_feat_grad_fwd(params["sdf"], p, core_cfg)
    elif cfg.normals_mode == "pallas" and pallas_available():
        from iron_tpu.kernels.fused_sdf_grad import make_fused_sdf_grad_fn
        fused = make_fused_sdf_grad_fn(core_cfg, precision=cfg.core_precision)
        sdf_all_fn = lambda p: fused(params["sdf"], p)
    else:
        sdf_all_fn = lambda p: sdf_value_feat_grad(params["sdf"], p, core_cfg)
    color_fn = lambda pts, grads, dirs, feat: rendering_apply(
        params["color"], cfg.color, pts, grads, dirs, feat)
    if cfg.remat_core:
        sdf_all_fn = jax.checkpoint(sdf_all_fn)
        color_fn = jax.checkpoint(color_fn)
    nerf_fn = None
    if cfg.render.n_outside > 0:
        nerf_fn = lambda pts4, dirs: nerf_apply(params["nerf"], cfg.nerf, pts4, dirs)
    inv_s = variance_apply(params["variance"])
    return neus_render(rays_o, rays_d, near, far, sdf_fn=sdf_fn,
                       sdf_all_fn=sdf_all_fn, color_fn=color_fn, inv_s=inv_s,
                       nerf_fn=nerf_fn, cfg=cfg.render, key=key,
                       background_rgb=background_rgb, cos_anneal_ratio=cos_anneal,
                       perturb_overwrite=perturb_overwrite, init_z=init_z)


def stage1_loss(params: Dict, cfg: Stage1Config, batch: jnp.ndarray, key,
                cos_anneal, occ_grid=None) -> Tuple[jnp.ndarray, Dict]:
    """batch [B, 10] -> (loss, metrics) (render_volume.py:376-397)."""
    rays_o, rays_d = batch[:, :3], batch[:, 3:6]
    true_rgb, mask = batch[:, 6:9], batch[:, 9:10]
    near, far = near_far_from_sphere(rays_o, rays_d)

    background_rgb = jnp.ones((1, 3)) if cfg.use_white_bkgd else None
    mask = (mask > 0.5).astype(jnp.float32) if cfg.mask_weight > 0.0 else jnp.ones_like(mask)
    mask_sum = jnp.sum(mask) + 1e-5

    init_z = None
    if occ_grid is not None:
        from iron_tpu.volume.occupancy import OccupancyGridConfig, occupancy_guided_z
        key, k_occ = jax.random.split(key)
        init_z = occupancy_guided_z(occ_grid, OccupancyGridConfig(),
                                    rays_o, rays_d, near, far,
                                    cfg.render.n_samples, key=k_occ)
    out = stage1_render(params, cfg, rays_o, rays_d, near, far, key,
                        cos_anneal, background_rgb, init_z=init_z)

    color_err = (out["color_fine"] - true_rgb) * mask
    color_loss = jnp.sum(jnp.abs(color_err)) / mask_sum
    psnr = 20.0 * jnp.log10(
        1.0 / jnp.sqrt(jnp.sum(color_err ** 2) / (mask_sum * 3.0) + 1e-12))
    eik_loss = out["gradient_error"]
    m_loss = mask_bce_loss(out["weight_sum"], mask)
    loss = color_loss + eik_loss * cfg.igr_weight + m_loss * cfg.mask_weight

    metrics = {"loss": loss, "color_loss": color_loss, "eikonal_loss": eik_loss,
               "mask_loss": m_loss, "psnr": psnr,
               "s_val": jnp.mean(out["s_val"]),
               "cdf": jnp.sum(out["cdf_fine"][:, :1] * mask) / mask_sum,
               "weight_max": jnp.sum(out["weight_max"] * mask) / mask_sum}
    return loss, metrics


def stage1_render_color_normal(params: Dict, cfg: Stage1Config, rays_o, rays_d):
    """Eval-mode render of a flat ray batch -> (color [N,3], normal [N,3]).
    Shared by the trainer's chunked validation renders and the dp-sharded
    eval render (dist/train.py::make_dp_stage1_render); jittable."""
    near, far = near_far_from_sphere(rays_o, rays_d)
    out = stage1_render(params, cfg, rays_o, rays_d, near, far,
                        None, 1.0, None, perturb_overwrite=0.0)
    grads = out["gradients"]
    normal = jnp.sum(grads * out["weights"][:, :grads.shape[1], None], axis=1)
    return out["color_fine"], normal


class Stage1Trainer:
    """Single-host stage-1 training driver (multi-device via dist.train)."""

    def __init__(self, cfg: Stage1Config, dataset: RayDataset,
                 key: Optional[jax.Array] = None, out_dir: Optional[str] = None):
        self.cfg = cfg
        self.dataset = dataset
        self.out_dir = out_dir
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = init_stage1_params(key, cfg)
        self.schedule = warmup_cosine_schedule(cfg.learning_rate, cfg.warm_up_end,
                                               cfg.end_iter, cfg.learning_rate_alpha)
        self.tx = optax.adam(self.schedule)
        self.opt_state = self.tx.init(self.params)
        self.step = 0

        dataset_ref = self.dataset

        def one_step(params, opt_state, step, key, occ_grid=None):
            k_img, k_ray, k_render = jax.random.split(key, 3)
            img_idx = jax.random.randint(k_img, (), 0, dataset_ref.n_images)
            batch = dataset_ref.gen_random_rays(k_ray, img_idx, cfg.batch_size)
            anneal = cos_anneal_ratio(step, cfg.anneal_end)
            (loss, metrics), grads = jax.value_and_grad(
                stage1_loss, has_aux=True)(params, cfg, batch, k_render, anneal,
                                           occ_grid)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self._train_step = jax.jit(one_step, donate_argnums=(0, 1))

        # multi-step variant: lax.scan over `chunk` steps amortizes the
        # host->device dispatch (critical on remote/tunneled chips)
        def train_steps(params, opt_state, step0, key, chunk, occ_grid=None):
            def body(carry, i):
                p, o = carry
                p, o, m = one_step(p, o, step0 + i, jax.random.fold_in(key, i),
                                   occ_grid)
                return (p, o), m
            (params, opt_state), ms = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chunk))
            last = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return params, opt_state, last

        self._train_steps = jax.jit(train_steps, donate_argnums=(0, 1),
                                    static_argnums=(4,))
        self._occ_grid = None

    def _async(self):
        if not hasattr(self, "_async_ckptr"):
            from iron_tpu.train.checkpoints import AsyncCheckpointer
            self._async_ckptr = AsyncCheckpointer(self.out_dir)
        return self._async_ckptr

    def resume(self) -> int:
        if self.out_dir:
            ck = None
            if self.cfg.async_ckpt:
                try:
                    ck = self._async().restore(
                        target={"params": self.params, "opt_state": self.opt_state})
                except Exception as e:  # structure mismatch (old-format /
                    # params-only / changed architecture) — fall through to
                    # the pickle scan as the ck-is-None logic intends
                    # (ADVICE r3).
                    import logging
                    logging.getLogger(__name__).warning(
                        "orbax restore failed (%s); falling back to pickle "
                        "checkpoints", e)
            if ck is None:
                path = latest_checkpoint(self.out_dir)
                if path:
                    ck = load_checkpoint(path)
            if ck is not None:
                self.params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
                if ck["opt_state"] is not None:
                    self.opt_state = jax.tree_util.tree_map(jnp.asarray, ck["opt_state"])
                self.step = ck["step"]
        return self.step

    def save(self):
        if self.out_dir:
            import dataclasses
            # persist the field architectures so stage 2 can adopt them
            # (the reference relies on both stages hard-coding identical
            # nets, ckpt_loader.py:49-66; we make the handoff explicit)
            extra = {"sdf_config": dataclasses.asdict(self.cfg.sdf),
                     "color_config": dataclasses.asdict(self.cfg.color)}
            if self.cfg.async_ckpt:
                self._async().save(self.step, self.params, self.opt_state,
                                   extra=extra)
            else:
                save_checkpoint(self.out_dir, self.step, self.params,
                                self.opt_state, extra=extra)

    def wait_for_saves(self):
        """Join any in-flight async checkpoint (call once at shutdown)."""
        if hasattr(self, "_async_ckptr"):
            self._async_ckptr.wait()

    def run(self, num_iters: Optional[int] = None, log_every: int = 0,
            seed: int = 0, steps_per_call: int = 16) -> Dict:
        n = num_iters if num_iters is not None else (self.cfg.end_iter - self.step)
        key = jax.random.PRNGKey(seed)
        metrics = {}
        done = 0
        while done < n:
            key, sub = jax.random.split(key)
            # bound the chunk so log/save cadence is respected
            chunk = min(steps_per_call, n - done)
            if log_every:
                chunk = min(chunk, log_every - self.step % log_every)
            if self.out_dir:
                chunk = min(chunk, self.cfg.save_freq - self.step % self.cfg.save_freq)
            chunk = max(chunk, 1)
            if self.cfg.use_occupancy and (
                    self._occ_grid is None
                    or self.step % self.cfg.occupancy_update_every < chunk):
                from iron_tpu.volume.occupancy import (OccupancyGridConfig,
                                                       update_occupancy_grid)
                import dataclasses as _dc
                up_cfg = _dc.replace(self.cfg.sdf,
                                     precision=self.cfg.upsample_precision)
                from iron_tpu.fields.sdf import sdf_only as _sdf_only
                self._occ_grid = update_occupancy_grid(
                    lambda p: _sdf_only(self.params["sdf"], p, up_cfg),
                    OccupancyGridConfig())
            if chunk > 1:
                self.params, self.opt_state, metrics = self._train_steps(
                    self.params, self.opt_state, self.step, sub, int(chunk),
                    self._occ_grid)
            else:
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, self.step, sub, self._occ_grid)
            self.step += chunk
            done += chunk
            if log_every and self.step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"[stage1 {self.step}] " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            if self.out_dir and self.step % self.cfg.save_freq == 0:
                self.save()
        return {k: float(v) for k, v in metrics.items()}

    def render_novel_view(self, idx_0: int, idx_1: int, ratio: float,
                          resolution_level: int = 4, chunk: int = 1024) -> np.ndarray:
        """Render from a slerp-interpolated pose (render_volume.py:render_novel_image)."""
        rays_o, rays_d = self.dataset.gen_rays_between(idx_0, idx_1, ratio,
                                                       resolution_level)
        return self._render_rays_grid(rays_o, rays_d, chunk)["color"]

    def interpolate_view_video(self, idx_0: int, idx_1: int, out_path: str,
                               n_frames: int = 60, resolution_level: int = 4,
                               fps: int = 30) -> None:
        """Ping-pong interpolation video (render_volume.py:815-848)."""
        import cv2
        frames = []
        for i in range(n_frames):
            ratio = np.sin(((i / n_frames) - 0.5) * np.pi) * 0.5 + 0.5
            img = self.render_novel_view(idx_0, idx_1, ratio, resolution_level)
            frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        frames = frames + frames[::-1]
        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        for f in frames:
            writer.write(f[:, :, ::-1])
        writer.release()

    def render_image(self, img_idx: int, resolution_level: int = 4,
                     chunk: int = 1024) -> Dict[str, np.ndarray]:
        """Chunked full-image validation render (render_volume.py:645-756)."""
        rays_o, rays_d = self.dataset.gen_rays_grid(img_idx, resolution_level)
        return self._render_rays_grid(rays_o, rays_d, chunk)

    def _render_rays_grid(self, rays_o, rays_d, chunk: int = 1024) -> Dict[str, np.ndarray]:
        h, w = rays_o.shape[:2]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        n = ro.shape[0]
        pad = (-n) % chunk
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3))], 0)
        rd = jnp.concatenate([rd, jnp.ones((pad, 3))], 0)

        if not hasattr(self, "_render_chunk"):
            self._render_chunk = jax.jit(
                lambda params, ro_c, rd_c: stage1_render_color_normal(
                    params, self.cfg, ro_c, rd_c))

        colors, normals = [], []
        for i in range(0, ro.shape[0], chunk):
            c, nm = self._render_chunk(self.params, ro[i:i + chunk], rd[i:i + chunk])
            colors.append(np.asarray(c))
            normals.append(np.asarray(nm))
        color = np.concatenate(colors)[:n].reshape(h, w, 3)
        normal = np.concatenate(normals)[:n].reshape(h, w, 3)
        return {"color": color, "normal": normal}
