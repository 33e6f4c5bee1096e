"""Stage-2 trainer: sphere-traced surface rendering with material recovery.

Behavioral spec from reference `render_surface.py` (+ `render_nir.py`,
`model_bed.py`):
  * per iter: random image -> random patch crop (principal-point shift) ->
    render_camera (trace + edges) -> gamma-correct predictions (optional)
    -> losses: pyramid L2 + weighted SSIM over convergent|edge mask,
    eikonal over {uniform cube points, surface normals, edge side normals},
    roughness hinge at `roughness_value` (0.5 RGB / 0.1 NIR), optional
    metal eta/k and dielectric eta priors (in-loss for the NIR variant,
    render_nir.py:535-566) (render_surface.py:533-653);
  * optimizers: sdf Adam 1e-5; material nets 1e-4; light 1e-2
    (render_surface.py:112, network_conf.py:707-745);
  * light init 8 * median(||cam||)^2 (render_surface.py:353-355);
  * component freezing for staged curricula (model_bed.py:897-907) via the
    `trainable` mask (optax.multi_transform zeroes frozen groups).

TPU-first: one jitted train step of (params, opt_state, image, K, W2C,
crop offsets, rng) — dynamic crop offsets are traced so every random crop
reuses one compiled program.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from iron_tpu.core.camera import Camera, make_camera, crop_camera
from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only, sdf_value_feat_grad, sdf_grad
from iron_tpu.shading.materials import (init_material_networks, material_lr_map,
                                        shade_points)
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
from iron_tpu.losses.image import pyramid_l2_loss, ssim_loss
from iron_tpu.losses.regularizers import (eikonal_loss, roughness_range_loss,
                                          metal_eta_k_loss, dielectric_eta_loss)
from iron_tpu.train.checkpoints import (save_checkpoint, latest_checkpoint,
                                        load_checkpoint, stage1_to_stage2)


@dataclass(frozen=True)
class Stage2Config:
    renderer_name: str = "comp"
    num_iters: int = 50001
    patch_size: int = 128
    eik_weight: float = 0.1
    ssim_weight: float = 1.0
    roughrange_weight: float = 0.1
    roughness_value: float = 0.5          # 0.1 for the NIR variant (render_nir.py:535)
    metal_eta_weight: float = 0.1
    metal_k_weight: float = 0.1
    dielectric_eta_weight: float = 0.1
    include_eta_priors: bool = False      # True for NIR (render_nir.py:566)
    metal_eta_value: float = 1.0
    metal_k_value: float = 10.0
    is_metal: bool = False
    gamma_pred: bool = False
    inv_gamma_gt: bool = False
    init_light_scale: float = 8.0
    sdf_lr: float = 1e-5
    use_env_light: bool = False
    # optional per-group global-norm gradient clipping (0 = off, reference
    # parity — the reference never clips).  Round-4 measurements: sdf grad
    # norm ~1.2 at a converged torus state, ~1000 at cold start; the 35-40k
    # torus collapse (chamfer 0.045 -> 0.27 in one 5k window, ROUND_LOG
    # round 4) motivated the knob, with the resume experiment
    # (scripts/torus_resume_experiment.py) measuring whether clipping
    # changes the outcome.
    grad_clip: float = 0.0
    # matmul precision for the stop-gradient trace/walk paths; training
    # forwards stay at cfg.sdf.precision ('highest').  'high' (bf16x3) is
    # ~30% faster with ~2e-4 SDF error — well under a pixel footprint.
    trace_precision: str = "high"
    # precision of the uniform-cube eikonal regularizer's 2nd-order graph;
    # 'high' (~2e-4 gradient error vs the |∇f|=1 target) matches the
    # reference's TF32-class matmuls.  Surface/edge eikonal terms ride the
    # shading path and keep its precision.
    eik_precision: str = "high"
    # precision for the coarse sphere-trace march (coarse-to-fine tracer);
    # 'default' = single-pass bf16, ~3x cheaper than 'high'.  The refine
    # phase re-checks every ray at trace_precision, so this only affects
    # speed.  None disables the coarse phase.
    coarse_trace_precision: Optional[str] = "default"
    # run the coarse evaluator through the fused bf16 Pallas kernel
    # (kernels/fused_sdf.py): same error class as 'default' XLA precision,
    # ~1.5x faster (weights + activations stay in VMEM).  Disabled on the
    # vmapped dp path (dist/train.py) alongside the interior budget.
    coarse_pallas: bool = True
    # run the DIFFERENTIABLE shading-path sdf_all through the fused
    # second-order kernel (kernels/fused_sdf_grad.py) on TPU.  Exact
    # (tests/test_kernels.py); the shading share of the stage-2 step is
    # small (~12%, BENCH_NOTES), so the win is modest: round-5 on-chip A/B
    # (scripts/bench_shade_pallas.py, v5e) 360.3k vs 354.4k rays/s
    # (+1.6%, within tunnel variance but consistently non-regressing) —
    # on by default; no-op off-TPU (pallas_available() gate).
    shade_pallas: bool = True
    # run the accurate no-grad trace paths (refine/bisection/fallback/
    # edge-side traces — everything that consumes trace_sdf_fn) through
    # the hi/lo-split fused Pallas kernel (kernels/fused_sdf.py
    # make_pallas_sdf_only_3pass_fn, BENCH_NOTES roadmap 7): same error
    # class as the XLA HIGH path it replaces (~1.8e-4), weights resident
    # in VMEM.  Off by default pending the on-chip win measurement
    # (scripts/bench_trace_pallas.py).
    trace_pallas: bool = False
    # run the stage-2 material-net sweeps (9 MLPs on the comp path) in
    # bf16 with f32 weight-norm + f32 BRDF math (BENCH_NOTES roadmap 6).
    # Exactness bound: bf16 activations carry ~3 decimal digits; albedo/
    # roughness heads are smooth and sigmoid/abs-squashed, so the image
    # error stays under ~1e-2 (tests/test_stage2_e2e.py bf16 check).
    # Off by default pending the on-chip win measurement.
    mat_bf16: bool = False
    # IDR-style differentiable silhouette loss (Yariv et al. 2020 eq. 6) as
    # the counterweight to the masked-loss shrink bias (ROUND_LOG round 4:
    # image losses are masked to the render's own coverage, so locally
    # shrinking coverage zeroes the loss; only edge pixels resist — the
    # sphere erodes 0.0283→0.0425 chamfer over 20k→50k, the torus
    # catastrophically).  For pixels where the GT object mask and the
    # render's hit mask DISAGREE, the min of f along the ray is located
    # under stop_gradient and BCE(sigmoid(-alpha·f(x*)), mask)/alpha is
    # applied through one differentiable SDF eval: a shrunk pixel
    # (mask=1, no hit) pushes min-f down until the surface regrows; an
    # excess pixel (hit, mask=0) pushes f up and carves.  Zero exactly when
    # coverage matches the mask.  The reference has NO stage-2 mask loss
    # (render_surface.py:571-647) — default weight 0 keeps parity; the
    # term needs dataset masks (Stage2Trainer(masks=...)).
    silhouette_weight: float = 0.0
    silhouette_alpha: float = 50.0
    silhouette_samples: int = 32   # no-grad min-f sweep samples per ray
    silhouette_budget: int = 1024  # static cap on disagreeing pixels
    surface: SurfaceRenderConfig = field(default_factory=SurfaceRenderConfig)
    sdf: SDFConfig = field(default_factory=SDFConfig)
    save_freq: int = 1000
    val_freq: int = 100
    # non-blocking orbax checkpointing (see Stage1Config.async_ckpt)
    async_ckpt: bool = False


def init_stage2_params(key, cfg: Stage2Config):
    k1, k2 = jax.random.split(key)
    materials, mat_cfgs = init_material_networks(
        k2, cfg.renderer_name, d_feature=cfg.sdf.d_out - 1)
    params = {"sdf": init_sdf(k1, cfg.sdf), "materials": materials}
    return params, mat_cfgs


def make_optimizer(cfg: Stage2Config, params, trainable: Optional[Dict[str, bool]] = None):
    """Per-group Adams via multi_transform; `trainable` freezes groups
    (model_bed.py:897-907 component_switch)."""
    lrs = material_lr_map(cfg.renderer_name)

    def adam(lr):
        if cfg.grad_clip and cfg.grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                               optax.adam(lr))
        return optax.adam(lr)

    txs = {"sdf": adam(cfg.sdf_lr)}
    txs.update({f"mat/{k}": adam(lr) for k, lr in lrs.items()})
    txs["frozen"] = optax.set_to_zero()

    sdf_on = trainable is None or trainable.get("sdf", True)
    full_labels = {
        "sdf": jax.tree_util.tree_map(
            lambda _: "sdf" if sdf_on else "frozen", params["sdf"]),
        "materials": {
            k: jax.tree_util.tree_map(
                lambda _, kk=k: (f"mat/{kk}" if trainable is None or trainable.get(kk, True)
                                 else "frozen"), v)
            for k, v in params["materials"].items()},
    }
    return optax.multi_transform(txs, full_labels)


def init_light_from_cameras(W2Cs: np.ndarray, scale: float = 8.0) -> float:
    """8 * median(||cam origin||)^2 (render_surface.py:353-355)."""
    dists = [np.linalg.norm(np.linalg.inv(w)[:3, 3]) for w in np.asarray(W2Cs)]
    d = float(np.median(dists))
    return scale * d * d


def _gamma(x):
    return jnp.power(x + 1e-6, 1.0 / 2.2)


def _tpu_backend() -> bool:
    """True on real TPU hardware, including tunneled PJRT plugins whose
    platform name differs (e.g. 'axon').  Anything that is not cpu/gpu is
    assumed TPU-like for matmul-precision purposes."""
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:
        return False


def build_stage2_fns(params, mat_cfgs, cfg: Stage2Config) -> Dict:
    """Evaluator closures for the surface pipeline: training-precision
    sdf/sdf_all, cheaper trace-precision variants, the coarse (Pallas or
    XLA-DEFAULT) evaluators, and the shade closure.  Shared by the training
    loss and the full-image eval renders."""
    import dataclasses as _dc
    out = {
        "sdf_fn": lambda p: sdf_only(params["sdf"], p, cfg.sdf),
        "sdf_all_fn": lambda p: sdf_value_feat_grad(params["sdf"], p, cfg.sdf),
        "coarse_sdf_fn": None,
        "coarse_march_fn": None,
    }
    if cfg.shade_pallas:
        from iron_tpu.kernels.fused_sdf import pallas_available
        if pallas_available():
            from iron_tpu.kernels.fused_sdf_grad import make_fused_sdf_grad_fn
            fused = make_fused_sdf_grad_fn(cfg.sdf,
                                           precision=cfg.sdf.precision)
            out["sdf_all_fn"] = lambda p: fused(params["sdf"], p)
    trace_cfg = _dc.replace(cfg.sdf, precision=cfg.trace_precision)
    out["trace_sdf_fn"] = lambda p: sdf_only(params["sdf"], p, trace_cfg)
    out["trace_sdf_all_fn"] = lambda p: sdf_value_feat_grad(params["sdf"], p, trace_cfg)
    if cfg.trace_pallas and _tpu_backend():
        from iron_tpu.kernels.fused_sdf import (make_pallas_sdf_only_3pass_fn,
                                                pallas_available)
        if pallas_available():
            out["trace_sdf_fn"] = make_pallas_sdf_only_3pass_fn(
                params["sdf"], cfg.sdf)
    # matmul precision only differs in cost on TPU (CPU runs f32 regardless),
    # so the coarse march would just double the compiled program there
    if cfg.coarse_trace_precision is not None and _tpu_backend():
        from iron_tpu.kernels.fused_sdf import (make_pallas_sdf_only_bf16_fn,
                                                make_pallas_coarse_march_fn,
                                                pallas_available)
        if cfg.coarse_pallas and pallas_available():
            out["coarse_sdf_fn"] = make_pallas_sdf_only_bf16_fn(
                params["sdf"], cfg.sdf)
            out["coarse_march_fn"] = make_pallas_coarse_march_fn(
                params["sdf"], cfg.sdf,
                threshold=cfg.surface.tracer.coarse_threshold)
        else:
            coarse_cfg = _dc.replace(cfg.sdf, precision=cfg.coarse_trace_precision)
            out["coarse_sdf_fn"] = lambda p: sdf_only(params["sdf"], p, coarse_cfg)
    shade_cfgs = mat_cfgs
    if cfg.mat_bf16:
        shade_cfgs = {k: _dc.replace(v, compute_dtype="bfloat16")
                      for k, v in mat_cfgs.items()}
    out["shade_fn"] = lambda ray_o, ray_d, pts, normals, feats: shade_points(
        cfg.renderer_name, params["materials"], shade_cfgs, ray_o, ray_d, pts,
        normals, feats, is_metal=cfg.is_metal, use_env_light=cfg.use_env_light)
    return out


def _mask_disagreement(res, gt_mask: jnp.ndarray):
    """Cheap shrink-force diagnostics from the hit/GT masks alone:
    (miss, excess, sphere-hit mask, per-ray [min,max] sphere span).
    miss = GT-covered pixels the render lost; excess = render coverage
    beyond the GT mask."""
    from iron_tpu.core.rays import intersect_sphere

    hit = res["hit_mask"]
    gt = gt_mask > 0.5
    sph, min_dis, max_dis = intersect_sphere(res["ray_o"], res["ray_d"], r=1.0)
    miss = gt & ~hit & sph
    excess = hit & ~gt
    return miss, excess, min_dis, max_dis


def _silhouette_term(f, res, cfg: Stage2Config, gt_mask: jnp.ndarray,
                     miss: jnp.ndarray, excess: jnp.ndarray,
                     min_dis: jnp.ndarray, max_dis: jnp.ndarray):
    """Differentiable silhouette loss over mask/coverage disagreements.

    gt_mask [H, W] (float or bool).  Returns the loss.  x* (the along-ray
    argmin of f for misses, the hit point for excess pixels) is found
    under stop_gradient at trace precision; only the single f(x*) eval
    carries gradients — the IDR formulation (Yariv et al. 2020),
    budget-capped like the edge pipeline.
    """
    from iron_tpu.surface.render import _select_topk_mask

    hit = res["hit_mask"]
    gt = gt_mask > 0.5
    ray_o, ray_d = res["ray_o"], res["ray_d"]
    disagree = miss | excess
    n_miss = jnp.sum(miss.astype(jnp.float32))
    n_excess = jnp.sum(excess.astype(jnp.float32))

    n_pix = int(np.prod(hit.shape))
    K = min(cfg.silhouette_budget, n_pix)
    sel, valid = _select_topk_mask(disagree.reshape(-1), K)
    ro = ray_o.reshape(-1, 3)[sel]
    rd = ray_d.reshape(-1, 3)[sel]
    mn = min_dis.reshape(-1)[sel]
    mx = max_dis.reshape(-1)[sel]
    hit_sel = hit.reshape(-1)[sel]

    # no-grad along-ray min of f (uniform sweep, trace precision)
    t = jnp.linspace(0.0, 1.0, cfg.silhouette_samples)
    z = mn[:, None] + t * (mx - mn)[:, None]
    p = ro[:, None, :] + rd[:, None, :] * z[..., None]
    fv = jax.lax.stop_gradient(f["trace_sdf_fn"](p))
    i_min = jnp.argmin(fv, axis=-1)
    f_min = jnp.take_along_axis(fv, i_min[:, None], axis=-1)[:, 0]
    z_min = jnp.take_along_axis(z, i_min[:, None], axis=-1)[:, 0]
    p_min = ro + rd * z_min[:, None]
    # for excess (hit) rays, prefer the deeper of {sweep argmin, traced hit}:
    # the argmin is the strongest carve point, but a coarse sweep can miss a
    # thin crossing the tracer resolved — the hit point (f ~ 0) then still
    # supplies the carving gradient
    s_hit = res["sdf"].reshape(-1)[sel]
    use_hit = hit_sel & (s_hit < f_min)
    x_star = jnp.where(use_hit[:, None],
                       res["points"].reshape(-1, 3)[sel], p_min)
    x_star = jax.lax.stop_gradient(x_star)

    s_star = f["sdf_fn"](x_star)
    alpha = cfg.silhouette_alpha
    target = gt.reshape(-1)[sel].astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(-alpha * s_star, target) / alpha
    # mean over the disagreeing pixels (clip 1): a constant per-pixel
    # restoring force at the silhouette regardless of how small the
    # disagreement region is — the shrink proceeds pixel-by-pixel there
    n = jnp.clip(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss = jnp.sum(jnp.where(valid, bce, 0.0)) / n
    # exactly zero (not just small) when coverage matches the mask
    loss = loss * (n_miss + n_excess > 0).astype(jnp.float32)
    return loss


def stage2_loss(params, mat_cfgs, cfg: Stage2Config, cam: Camera,
                gt_crop: jnp.ndarray, key,
                gt_mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, Dict]:
    f = build_stage2_fns(params, mat_cfgs, cfg)

    res = render_camera(f["sdf_fn"], f["sdf_all_fn"], f["shade_fn"], cam,
                        cfg.surface, is_training=True,
                        trace_sdf_fn=f["trace_sdf_fn"],
                        trace_sdf_all_fn=f["trace_sdf_all_fn"],
                        coarse_sdf_fn=f["coarse_sdf_fn"],
                        coarse_march_fn=f["coarse_march_fn"])

    color = res["color"]
    if cfg.gamma_pred:
        color = _gamma(color)

    mask = res["convergent_mask"]
    if cfg.surface.handle_edges:
        mask = mask | res["edge_mask"]
    any_mask = (jnp.sum(mask) > 0).astype(jnp.float32)

    pred = jnp.transpose(color, (2, 0, 1))[None]
    gt = jnp.transpose(gt_crop[..., :3], (2, 0, 1))[None]
    img_l2 = pyramid_l2_loss(pred, gt) * any_mask
    img_ssim = cfg.ssim_weight * ssim_loss(pred, gt, mask[None, None]) * any_mask
    img_loss = img_l2 + img_ssim

    # eikonal from three sources (render_surface.py:580-607).  The uniform-
    # cube term is a pure regularizer (|∇f|=1 to ~1e-3 is all that matters)
    # — run its 2nd-order graph at the cheaper eik_precision.
    import dataclasses as _dc2
    n_eik = (cam.H * cam.W) // 2
    eik_cfg = _dc2.replace(cfg.sdf, precision=cfg.eik_precision)
    eik_pts = jax.random.uniform(key, (n_eik, 3), minval=-1.0, maxval=1.0)
    e_sum, e_cnt = eikonal_loss(sdf_grad(params["sdf"], eik_pts, eik_cfg))
    s_sum, s_cnt = eikonal_loss(res["raw_grad"], mask)
    e_sum, e_cnt = e_sum + s_sum, e_cnt + s_cnt
    if cfg.surface.handle_edges:
        p_sum, p_cnt = eikonal_loss(res["edge_pos_neg_normal"], res["edge_pos_neg_mask"])
        e_sum, e_cnt = e_sum + p_sum, e_cnt + p_cnt
    eik = e_sum / jnp.clip(e_cnt, 1.0) * cfg.eik_weight

    rough = roughness_range_loss(res["specular_roughness"], mask,
                                 cfg.roughness_value) * cfg.roughrange_weight * any_mask

    loss = img_loss + eik + rough

    sil = None
    if gt_mask is not None:
        # miss/excess counts come straight from the hit/GT masks (nearly
        # free); the budgeted SDF sweep + BCE eval only runs when the
        # counterweight is actually in the loss (ADVICE r4 item 1)
        miss, excess, min_dis, max_dis = _mask_disagreement(res, gt_mask)
        n_miss = jnp.sum(miss.astype(jnp.float32))
        n_excess = jnp.sum(excess.astype(jnp.float32))
        if cfg.silhouette_weight > 0:
            sil = _silhouette_term(f, res, cfg, gt_mask, miss, excess,
                                   min_dis, max_dis)
            loss = loss + cfg.silhouette_weight * sil
        else:
            sil = jnp.zeros(())

    metrics = {"loss": loss, "img_loss": img_loss, "img_l2_loss": img_l2,
               "img_ssim_loss": img_ssim, "eik_loss": eik, "roughrange_loss": rough,
               "mask_frac": jnp.mean(mask.astype(jnp.float32))}
    if sil is not None:
        # shrink-force diagnostics (ROUND_LOG round-4/5): coverage pixels
        # the render LOST vs the GT mask (miss) and grew beyond it (excess)
        metrics.update({"silhouette_loss": sil,
                        "mask_miss_count": n_miss,
                        "mask_excess_count": n_excess})
    if cfg.surface.handle_edges:
        # edge-coverage diagnostics (budget-overflow visibility, VERDICT r2
        # item 7): seeds found, seeds beyond the static budget, edge pixels
        metrics["edge_seed_count"] = res["edge_seed_count"].astype(jnp.float32)
        metrics["edge_seeds_dropped"] = res["edge_seeds_dropped"].astype(jnp.float32)
        metrics["edge_pixel_count"] = jnp.sum(
            res["edge_mask"].astype(jnp.float32))

    if cfg.renderer_name in ("comp", "comp2"):
        m_eta, m_k = metal_eta_k_loss(res["metallic_eta"], res["metallic_k"], mask,
                                      cfg.metal_eta_value, cfg.metal_k_value)
        metal = (m_eta * cfg.metal_eta_weight + m_k * cfg.metal_k_weight) * any_mask
        diel = dielectric_eta_loss(res["dielectric_eta"], mask) * \
            cfg.dielectric_eta_weight * any_mask
        metrics.update({"metallicness_loss": metal, "dielectricness_loss": diel})
        if cfg.include_eta_priors:  # NIR variant puts these in the loss
            loss = loss + metal + diel
            metrics["loss"] = loss

    return loss, metrics


def stage2_render_buffers(params, mat_cfgs, cfg: Stage2Config,
                          cam: Camera) -> Dict[str, jnp.ndarray]:
    """Pure eval-mode surface render of one camera -> fixed buffer dict
    (color/normal/depth/convergent_mask, all [H, W, ...]).  Used by the
    dist sharded full-image render (dist/train.py) and jittable/vmappable."""
    sdf_fn = lambda p: sdf_only(params["sdf"], p, cfg.sdf)
    sdf_all_fn = lambda p: sdf_value_feat_grad(params["sdf"], p, cfg.sdf)
    shade_fn = lambda ray_o, ray_d, pts, normals, feats: shade_points(
        cfg.renderer_name, params["materials"], mat_cfgs, ray_o, ray_d, pts,
        normals, feats, is_metal=cfg.is_metal, use_env_light=cfg.use_env_light)
    res = render_camera(sdf_fn, sdf_all_fn, shade_fn, cam, cfg.surface,
                        is_training=False)
    return {"color": res["color"], "normal": res["normal"],
            "depth": res["depth"],
            "convergent_mask": res["convergent_mask"].astype(jnp.float32)}


class Stage2Trainer:
    def __init__(self, cfg: Stage2Config, images: np.ndarray, Ks: np.ndarray,
                 W2Cs: np.ndarray, key: Optional[jax.Array] = None,
                 out_dir: Optional[str] = None,
                 stage1_params: Optional[Dict] = None,
                 trainable: Optional[Dict[str, bool]] = None,
                 masks: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.out_dir = out_dir
        key = key if key is not None else jax.random.PRNGKey(0)
        if cfg.inv_gamma_gt:
            images = np.power(images, 2.2)
        self.images = jnp.asarray(images, jnp.float32)
        # object masks [N, H, W(, 1)] enable the silhouette counterweight
        # and the mask_miss/excess shrink diagnostics (cfg.silhouette_weight)
        if masks is not None:
            m = np.asarray(masks, np.float32)
            if m.ndim == 4:
                m = m[..., 0]
            if m.shape[:3] != np.asarray(images).shape[:3]:
                raise ValueError(
                    f"masks shape {m.shape[:3]} does not match images "
                    f"{np.asarray(images).shape[:3]} (N, H, W must agree)")
            self.masks = jnp.asarray(m)
        else:
            if cfg.silhouette_weight > 0:
                raise ValueError("silhouette_weight > 0 requires masks")
            self.masks = None
        self.Ks = jnp.asarray(Ks, jnp.float32)
        self.W2Cs = jnp.asarray(W2Cs, jnp.float32)
        self.H, self.W = images.shape[1:3]

        self.params, self.mat_cfgs = init_stage2_params(key, cfg)
        if stage1_params is not None:
            s1_shapes = jax.tree_util.tree_map(np.shape, stage1_params["sdf"])
            s2_shapes = jax.tree_util.tree_map(np.shape, self.params["sdf"])
            if s1_shapes != s2_shapes:
                raise ValueError(
                    "stage-1 SDF parameters do not match Stage2Config.sdf "
                    f"architecture: ckpt {s1_shapes} vs config {s2_shapes}. "
                    "Pass the stage-1 run's SDFConfig as Stage2Config.sdf "
                    "(checkpoints saved by Stage1Trainer carry it in "
                    "extra['sdf_config']).")
            self.params = stage1_to_stage2(stage1_params, self.params)
        light = init_light_from_cameras(W2Cs, cfg.init_light_scale)
        self.params["materials"]["point_light_network"]["light"] = jnp.asarray(
            light, jnp.float32)

        self.tx = make_optimizer(cfg, self.params, trainable)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        # validation-driven model selection (VERDICT r4 item 8): run(...,
        # val_fn=...) tracks the best validation metric and retains that
        # checkpoint — the round-4 trajectories peaked mid-schedule
        # (sphere chamfer 0.0283@20k vs 0.0425@50k), so end-of-schedule
        # params are not the run's best model.
        self.best_metric = float("-inf")
        self.best_step: Optional[int] = None
        self.val_history: list = []

        ps = cfg.patch_size
        mat_cfgs = self.mat_cfgs

        def one_step(params, opt_state, key, img_idx, ul_col, ul_row):
            k_eik, = jax.random.split(key, 1)
            K = self.Ks[img_idx]
            W2C = self.W2Cs[img_idx]
            base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K),
                          C2W=jnp.linalg.inv(W2C), H=self.H, W=self.W)
            cam = crop_camera(base, ul_col, ul_row, ps, ps)
            gt = jax.lax.dynamic_slice(
                self.images[img_idx], (ul_row, ul_col, 0), (ps, ps, 3))
            gt_mask = None
            if self.masks is not None:
                gt_mask = jax.lax.dynamic_slice(
                    self.masks[img_idx], (ul_row, ul_col), (ps, ps))
            (loss, metrics), grads = jax.value_and_grad(
                stage2_loss, has_aux=True)(params, mat_cfgs, cfg, cam, gt,
                                           k_eik, gt_mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        self._train_step = jax.jit(one_step, donate_argnums=(0, 1))

        n_imgs = self.images.shape[0]
        max_col = max(self.W - ps, 1)
        max_row = max(self.H - ps, 1)

        def train_steps(params, opt_state, key, chunk):
            """lax.scan over `chunk` steps with device-side crop sampling —
            amortizes host dispatch on remote/tunneled chips."""
            def body(carry, i):
                p, o = carry
                sub = jax.random.fold_in(key, i)
                k_i, k_c, k_r, k_s = jax.random.split(sub, 4)
                idx = jax.random.randint(k_i, (), 0, n_imgs)
                ul_col = jax.random.randint(k_c, (), 0, max_col)
                ul_row = jax.random.randint(k_r, (), 0, max_row)
                p, o, m = one_step(p, o, k_s, idx, ul_col, ul_row)
                return (p, o), m
            (params, opt_state), ms = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chunk))
            last = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return params, opt_state, last

        self._train_steps = jax.jit(train_steps, donate_argnums=(0, 1),
                                    static_argnums=(3,))

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
                    ck = self._async().restore(target={"params": self.params})
                except Exception as e:  # structure mismatch — fall back to
                    # the pickle scan (ADVICE r3, mirrors stage 1)
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
                self.step = ck["step"]
        return self.step

    def save(self):
        if self.out_dir:
            # stage-2 schema drops optimizer state (render_surface.py:669-671)
            if self.cfg.async_ckpt:
                self._async().save(self.step, self.params)
            else:
                save_checkpoint(self.out_dir, self.step, self.params)

    def wait_for_saves(self):
        if hasattr(self, "_async_ckptr"):
            self._async_ckptr.wait()

    def _validate(self, val_fn) -> float:
        """Run `val_fn(self)` (returns a float metric, higher = better, or a
        dict with a 'metric' key plus extra fields to log); retain the
        best-so-far params as <out_dir>/ckpt_best.pkl."""
        rec = val_fn(self)
        if not isinstance(rec, dict):
            rec = {"metric": float(rec)}
        metric = float(rec["metric"])
        self.val_history.append({"step": self.step, **{k: float(v) for k, v in rec.items()}})
        if metric > self.best_metric:
            self.best_metric = metric
            self.best_step = self.step
            if self.out_dir:
                import pickle
                path = os.path.join(self.out_dir, "ckpt_best.pkl")
                payload = {"params": jax.tree_util.tree_map(np.asarray, self.params),
                           "opt_state": None, "step": int(self.step),
                           "extra": {"val": rec}}
                with open(path + ".tmp", "wb") as fh:
                    pickle.dump(payload, fh, protocol=4)
                os.replace(path + ".tmp", path)
        return metric

    def run(self, num_iters: Optional[int] = None, log_every: int = 0,
            seed: int = 0, steps_per_call: int = 1,
            val_fn=None, val_every: int = 0) -> Dict:
        """Train `num_iters` steps.

        steps_per_call=1 (default) dispatches the one-step program per
        iteration with host-side crop sampling: dispatch is asynchronous,
        so the device pipeline stays full, and the straight-line program
        measured 23% FASTER than the same step inside a lax.scan (486k vs
        374k rays/s at identical SDF state, scripts/bench_step_dispatch.py
        — the round-3 "shard_map anomaly", VERDICT r3 item 4, was this
        scan overhead).  steps_per_call>1 scans on-device instead — only
        useful if per-step host work ever becomes the bottleneck."""
        n = num_iters if num_iters is not None else (self.cfg.num_iters - self.step)
        key = jax.random.PRNGKey(seed + 1)
        metrics = {}
        if val_fn is not None and not val_every:
            val_every = self.cfg.save_freq
        if steps_per_call == 1:
            g = np.random.default_rng((seed + 1) * 1_000_003 + self.step)
            n_imgs = self.images.shape[0]
            ps = self.cfg.patch_size
            max_col = max(self.W - ps, 1)
            max_row = max(self.H - ps, 1)
            metrics_dev = None
            for _ in range(n):
                key, k_s = jax.random.split(key)
                idx = jnp.asarray(g.integers(0, n_imgs), jnp.int32)
                col = jnp.asarray(g.integers(0, max_col), jnp.int32)
                row = jnp.asarray(g.integers(0, max_row), jnp.int32)
                self.params, self.opt_state, metrics_dev = self._train_step(
                    self.params, self.opt_state, k_s, idx, col, row)
                self.step += 1
                if log_every and self.step % log_every == 0:
                    m = {k: float(v) for k, v in metrics_dev.items()}
                    print(f"[stage2 {self.step}] " +
                          " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                if self.out_dir and self.step % self.cfg.save_freq == 0:
                    self.save()
                if val_fn is not None and self.step % val_every == 0:
                    self._validate(val_fn)
            if metrics_dev is not None:
                metrics = metrics_dev
            return {k: float(v) for k, v in metrics.items()}
        done = 0
        while done < n:
            key, sub = jax.random.split(key)
            chunk = min(steps_per_call, n - done)
            if log_every:
                chunk = min(chunk, log_every - self.step % log_every)
            if self.out_dir:
                chunk = min(chunk, self.cfg.save_freq - self.step % self.cfg.save_freq)
            if val_fn is not None:
                chunk = min(chunk, val_every - self.step % val_every)
            chunk = max(chunk, 1)
            self.params, self.opt_state, metrics = self._train_steps(
                self.params, self.opt_state, sub, int(chunk))
            self.step += chunk
            done += chunk
            if log_every and self.step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"[stage2 {self.step}] " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            if self.out_dir and self.step % self.cfg.save_freq == 0:
                self.save()
            if val_fn is not None and self.step % val_every == 0:
                self._validate(val_fn)
        return {k: float(v) for k, v in metrics.items()}

    def render_full(self, img_idx: int, factor: float = 1.0,
                    is_training: bool = False,
                    keys: Optional[Tuple[str, ...]] = None) -> Dict[str, np.ndarray]:
        """Full-frame render for validation / render_all.  The jitted render
        is cached per output resolution so render_all reuses one program for
        every camera (the eval shapes are fixed per dataset, SURVEY §7.4.7).
        `keys` limits which buffers are fetched to the host — on tunneled
        devices the transfer of the full buffer dict dominates wall time."""
        from iron_tpu.core.camera import resize_camera
        K = np.asarray(self.Ks[img_idx])
        W2C = np.asarray(self.W2Cs[img_idx])
        cam = make_camera(K, W2C, self.H, self.W)
        if factor != 1.0:
            cam = resize_camera(cam, factor)

        if not hasattr(self, "_render_full_cache"):
            self._render_full_cache = {}
        key = (cam.H, cam.W, bool(is_training))
        if key not in self._render_full_cache:
            cfg = self.cfg
            mat_cfgs = self.mat_cfgs
            # full-frame renders scale the edge budget with resolution so
            # eval images are never silently budget-capped
            from iron_tpu.surface.render import scale_config_for_resolution
            surf_cfg = scale_config_for_resolution(cfg.surface, cam.H, cam.W,
                                                   train_patch=cfg.patch_size)

            @jax.jit
            def run(params, cam):
                f = build_stage2_fns(params, mat_cfgs, cfg)
                return render_camera(f["sdf_fn"], f["sdf_all_fn"],
                                     f["shade_fn"], cam, surf_cfg,
                                     is_training=is_training,
                                     trace_sdf_fn=f["trace_sdf_fn"],
                                     trace_sdf_all_fn=f["trace_sdf_all_fn"],
                                     coarse_sdf_fn=f["coarse_sdf_fn"],
                                     coarse_march_fn=f["coarse_march_fn"])

            self._render_full_cache[key] = run
        res = self._render_full_cache[key](self.params, cam)
        return {k: np.asarray(v) for k, v in res.items()
                if isinstance(v, jnp.ndarray)
                and (keys is None or k in keys)}
