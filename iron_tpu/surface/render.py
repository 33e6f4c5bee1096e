"""Full surface rendering pipeline: camera trace -> hole filling -> edge
location -> shading -> budgeted edge compositing.

Behavioral spec from reference `models/raytracer.py:367-814`
(raytrace_pixels / raytrace_camera / locate_edge_points /
render_normal_and_color / render_edge_pixels / render_camera):

  pipeline = trace all pixels (no grad)
           -> depth closing fills pinholes (raytracer.py:554-564)
           -> depth-sobel seeds a surface walk to silhouette points
              (raytracer.py:566-585, 422-539)
           -> one-candidate-per-pixel dedupe
           -> shade convergent pixels through the user shade_fn with
              implicit-function reparam (raytracer.py:593-662)
           -> per-edge-pixel two-sided trace+shade, composited by
              circle-coverage weight (raytracer.py:665-775).

TPU-first redesign (SURVEY.md §7.4):
  * No boolean compaction anywhere: the tracer and shader run on full
    [H*W] tiles under masks.
  * The edge pipeline has a **static edge budget** K: seed pixels are
    brought to the front with an argsort-by-mask (stable), the walk +
    two-sided tracing then run on exactly K candidates.  Candidate counts
    beyond K are dropped (the reference would process all, but edges are
    sparse: a 128x128 crop has a few hundred).
  * Dedupe keeps the first candidate per pixel via scatter-min of the
    candidate index — same tie-break as the reference's flip-scatter
    `unique` (raytracer.py:412-419).
  * The whole pipeline is one jittable function; trace outputs are
    stop_gradient'ed (the reference traces under torch.no_grad) and
    gradients re-enter through `reparam_points` only.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.core.camera import Camera, camera_origin, get_rays, pixel_grid, project
from iron_tpu.core.rays import intersect_sphere
from iron_tpu.surface.tracer import TracerConfig, raytrace
from iron_tpu.surface.reparam import reparam_points
from iron_tpu.surface.morphology import closing3x3, sobel_magnitude


@dataclass(frozen=True)
class SurfaceRenderConfig:
    tracer: TracerConfig = field(default_factory=TracerConfig)
    fill_holes: bool = True
    handle_edges: bool = True
    edge_budget: int = 1024          # static max edge candidates per render
    edge_walk_steps: int = 16        # raytracer.py:578 max_step
    edge_step_size: float = 1e-3     # raytracer.py:579
    # Pixel-proportional walk step (round-3 fix): the reference's absolute
    # 1e-3 step is ~1/4 px on its DTU captures (1600px, unit sphere at
    # d~3.5) but ~1/20 px at 128-256 px synthetic scale, so the 16-step
    # walk could never reach the silhouette from ANY seed — measured 8
    # found edge pixels out of a ~170 px sphere silhouette, and a perfect
    # torus monotonically destroyed by silhouette-blind stage-2 training
    # (scripts/diag_torus_stage2.py).  With edge_step_px > 0 the step is
    # max(edge_step_size, edge_step_px * depth / focal) per point — the
    # reference's behavior at the reference's own pixel footprint, made
    # resolution-invariant.  0 restores the absolute step.
    edge_step_px: float = 0.75
    edge_dot_threshold: float = 5e-2  # raytracer.py:580
    depth_edge_threshold: float = 1e-2  # raytracer.py:570
    hole_depth_threshold: float = 1e-2  # raytracer.py:558
    # fallback-sampler budget for the two edge side-trace passes: side rays
    # graze the silhouette so proportionally more need the dense fallback,
    # but a full-tile fallback over all edge_budget rays is still wasteful.
    edge_side_fallback_budget: int = 512
    # Static cap on interior pixels shaded through the material networks
    # (the reference chunks the compacted convergent set, raytracer.py:599).
    # When the convergent count fits the budget, shading gathers just those
    # pixels (saving the 9 material-MLP sweeps over background pixels); on
    # overflow a lax.cond falls back to full-tile shading, so any coverage
    # is handled exactly.  None = always full tile.
    interior_budget: Optional[int] = None


def scale_config_for_resolution(cfg: SurfaceRenderConfig, H: int, W: int,
                                train_patch: int = 128) -> SurfaceRenderConfig:
    """Scale the static edge budget to a render resolution.

    Budgets are tuned for training crops (`train_patch`^2); silhouettes are
    1-D curves, so seed counts grow ~linearly with image side.  Full-image
    renders (--render_all) call this so a 512^2+ eval is never silently
    budget-capped (the reference processes ALL edge pixels,
    raytracer.py:422-539).
    """
    import dataclasses as _dc
    scale = max(1, int(np.ceil((H + W) / (2.0 * train_patch))))
    if scale == 1:
        return cfg
    return _dc.replace(cfg, edge_budget=cfg.edge_budget * scale)


def raytrace_pixels(sdf_fn, cam: Camera, uv: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    cfg: SurfaceRenderConfig = SurfaceRenderConfig(),
                    coarse_sdf_fn=None, coarse_march_fn=None) -> Dict:
    """Trace rays through pixel coords uv [..., 2] (raytracer.py:367-409)."""
    ray_o, ray_d, ray_d_norm = get_rays(cam, uv)
    mask_int, min_dis, max_dis = intersect_sphere(ray_o, ray_d, r=1.0)
    work = mask_int if mask is None else (mask_int & mask)
    res = raytrace(sdf_fn, ray_o, ray_d, min_dis, max_dis, work, cfg.tracer,
                   coarse_sdf_fn=coarse_sdf_fn, coarse_march_fn=coarse_march_fn)
    res = jax.tree_util.tree_map(jax.lax.stop_gradient, res)
    res["depth"] = res["distance"] / ray_d_norm
    res.update({"uv": uv, "ray_o": ray_o, "ray_d": ray_d, "ray_d_norm": ray_d_norm})
    return res


def _select_topk_mask(flat_mask: jnp.ndarray, k: int):
    """Up to k True entries of flat_mask, spatially interleaved
    (tracer.budget_select).  Returns (indices [k], valid [k])."""
    from iron_tpu.surface.tracer import budget_select
    sel = budget_select(flat_mask, k)
    return sel, flat_mask[sel]


def locate_edge_points(sdf_all_fn, cam: Camera, start_points: jnp.ndarray,
                       seed_valid: jnp.ndarray,
                       cfg: SurfaceRenderConfig) -> Dict:
    """Walk K seed points along the surface to the silhouette
    (raytracer.py:422-539), masked & fixed-shape.

    start_points [K,3]; seed_valid [K].  Returns per-candidate
    found-mask, walked points, and their projections.
    """
    cam_o = camera_origin(cam)
    focal = 0.5 * (jnp.abs(cam.K[0, 0]) + jnp.abs(cam.K[1, 1]))

    def step(i, carry):
        pts, found = carry
        viewdir = cam_o - pts
        dist = jnp.linalg.norm(viewdir, axis=-1, keepdims=True)
        viewdir = viewdir / (dist + 1e-10)
        sdf, _, grad = sdf_all_fn(pts)
        normal = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
        dot = jnp.sum(normal * viewdir, axis=-1)
        now_found = jnp.abs(dot) <= cfg.edge_dot_threshold
        found = found | now_found
        walkdir = normal - viewdir / dot[..., None]
        walkdir = walkdir / (jnp.linalg.norm(walkdir, axis=-1, keepdims=True) + 1e-10)
        walkdir = walkdir - sdf[..., None] * normal
        if cfg.edge_step_px > 0:
            step_size = jnp.maximum(cfg.edge_step_size,
                                    cfg.edge_step_px * dist / focal)
        else:
            step_size = cfg.edge_step_size
        active = seed_valid & ~found
        pts = jnp.where(active[..., None], pts + step_size * walkdir, pts)
        return pts, found

    pts, found = jax.lax.fori_loop(
        0, cfg.edge_walk_steps, step,
        (start_points, jnp.zeros(start_points.shape[:1], bool)))
    # Newton-project the walked points back onto the zero level set: the
    # in-walk `- sdf*normal` correction is scaled by the step size
    # (reference semantics, raytracer.py:466), which leaves an O(step)
    # standoff with the pixel-proportional steps.  Two p -= f(p)·n(p)
    # iterations restore |f| to the tracer's accuracy class.  Skipped in
    # the reference-exact absolute-step mode (edge_step_px == 0), which
    # stays bit-compatible with the reference walk.
    if cfg.edge_step_px > 0:
        for _ in range(2):
            p_sdf, _, p_grad = sdf_all_fn(pts)
            p_n = p_grad / (jnp.linalg.norm(p_grad, axis=-1, keepdims=True) + 1e-10)
            pts = pts - p_sdf[..., None] * p_n
    # final convergence check (the reference re-tests after the last step)
    viewdir = cam_o - pts
    viewdir = viewdir / (jnp.linalg.norm(viewdir, axis=-1, keepdims=True) + 1e-10)
    _, _, grad = sdf_all_fn(pts)
    normal = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
    found = found | (jnp.abs(jnp.sum(normal * viewdir, axis=-1)) <= cfg.edge_dot_threshold)
    found = found & seed_valid

    pts = jax.lax.stop_gradient(pts)
    uv = project(cam, pts)
    return {"walk_points": pts, "walk_found": found, "walk_uv": uv}


def _dedupe_per_pixel(cam: Camera, walk: Dict) -> Dict:
    """One candidate per pixel, keeping the first (raytracer.py:487-503)."""
    H, W = cam.H, cam.W
    K = walk["walk_points"].shape[0]
    pix = jnp.floor(walk["walk_uv"]).astype(jnp.int32)
    pid = pix[:, 1] * W + pix[:, 0]
    valid = walk["walk_found"] & (pid >= 0) & (pid < H * W)
    slot_idx = jnp.where(valid, pid, H * W)  # overflow slot for invalid
    BIG = jnp.iinfo(jnp.int32).max
    slots = jnp.full((H * W + 1,), BIG, jnp.int32)
    slots = slots.at[slot_idx].min(jnp.arange(K, dtype=jnp.int32))
    kept = valid & (slots[slot_idx] == jnp.arange(K, dtype=jnp.int32))
    # overflow-slot writes land at index H*W and are sliced off
    edge_mask = jnp.zeros((H * W + 1,), bool).at[slot_idx].max(kept)[:H * W]
    return {"edge_kept": kept, "edge_pid": pid, "edge_mask_flat": edge_mask}


def shade_masked(sdf_all_fn, shade_fn, ray_o, ray_d, points, mask,
                 is_training: bool) -> Dict:
    """render_normal_and_color equivalent (raytracer.py:593-662): fresh
    SDF forward (grad on), reparam in training, user shading, all masked."""
    sdf, feature, grad = sdf_all_fn(points)
    if is_training:
        points = reparam_points(points, jax.lax.stop_gradient(grad),
                                jax.lax.stop_gradient(-ray_d), sdf[..., None])
    else:
        sdf, feature, grad = jax.tree_util.tree_map(
            jax.lax.stop_gradient, (sdf, feature, grad))
    out = shade_fn(ray_o, ray_d, points, grad, feature)
    m = mask[..., None]
    masked = {}
    for k, v in out.items():
        if v.ndim == mask.ndim:
            masked[k] = jnp.where(mask, v, 0.0)
        else:
            masked[k] = jnp.where(m, v, 0.0)
    # unnormalized gradient is reported as "normal" for the eikonal term
    # (raytracer.py:715 writes edge_grads; shading normals stay normalized)
    masked["raw_grad"] = jnp.where(m, grad, 0.0)
    return masked


def render_camera(sdf_fn, sdf_all_fn, shade_fn, cam: Camera,
                  cfg: SurfaceRenderConfig = SurfaceRenderConfig(),
                  is_training: bool = False, debug: bool = False,
                  trace_sdf_fn=None, trace_sdf_all_fn=None,
                  coarse_sdf_fn=None, coarse_march_fn=None) -> Dict:
    """Top-level surface render (raytracer.py:778-814), jittable.

    sdf_fn:     pts [..., 3] -> sdf [...]
    sdf_all_fn: pts [..., 3] -> (sdf, feat, grad)
    shade_fn:   (ray_o, ray_d, points, normals, features) -> dict of buffers
    trace_sdf_fn / trace_sdf_all_fn: optional cheaper evaluators used only on
    the stop-gradient trace/walk paths (e.g. HIGH-precision matmuls or the
    fused Pallas kernel); shading/gradients always use sdf_(all_)fn.
    coarse_sdf_fn: optional even-cheaper evaluator (bf16/DEFAULT precision)
    for the coarse-to-fine sphere-trace march (tracer.sphere_trace).
    Returns [H, W, ...] image buffers + edge diagnostics.
    """
    trace_sdf_fn = trace_sdf_fn or sdf_fn
    trace_sdf_all_fn = trace_sdf_all_fn or sdf_all_fn
    H, W = cam.H, cam.W
    uv = pixel_grid(H, W)
    res = raytrace_pixels(trace_sdf_fn, cam, uv, cfg=cfg,
                          coarse_sdf_fn=coarse_sdf_fn,
                          coarse_march_fn=coarse_march_fn)
    res["depth"] = res["depth"] * res["convergent_mask"]

    if cfg.fill_holes:
        depth = closing3x3(res["depth"])
        new_conv = depth > cfg.hole_depth_threshold
        update = new_conv & (~res["convergent_mask"])
        res["depth"] = jnp.where(update, depth, res["depth"])
        res["convergent_mask"] = res["convergent_mask"] | new_conv
        res["distance"] = jnp.where(update, res["depth"] * res["ray_d_norm"], res["distance"])
        res["points"] = jnp.where(update[..., None],
                                  res["ray_o"] + res["ray_d"] * res["distance"][..., None],
                                  res["points"])

    # Pixel-center coverage indicator, BEFORE edge pixels are carved out of
    # the convergent set below: "this pixel's center ray hits the surface".
    # This is the right semantics for dataset/object masks (the reference's
    # Mitsuba GT masks are coverage masks, render_rgb_flash_mat.py:57-80);
    # `convergent_mask | edge_mask` is NOT — walked edge pixels can lie
    # outside the true silhouette.
    res["hit_mask"] = res["convergent_mask"]

    edge = None
    if cfg.handle_edges:
        grad_mag = sobel_magnitude(res["depth"])
        depth_edge_mask = (grad_mag > cfg.depth_edge_threshold) & res["convergent_mask"]
        if debug:  # VERBOSE_MODE buffers (raytracer.py:587-588)
            res["depth_grad_norm"] = grad_mag
            res["depth_edge_mask"] = depth_edge_mask
        # overflow diagnostics: seeds beyond the static budget are dropped
        # (the reference processes all edge pixels, raytracer.py:422-539);
        # surface the counts so a capped render is never silent.
        n_seeds = jnp.sum(depth_edge_mask.astype(jnp.int32))
        res["edge_seed_count"] = n_seeds
        res["edge_seeds_dropped"] = jnp.maximum(n_seeds - cfg.edge_budget, 0)
        sel, seed_valid = _select_topk_mask(depth_edge_mask.reshape(-1), cfg.edge_budget)
        seeds = res["points"].reshape(-1, 3)[sel]
        nograd_all = lambda p: jax.tree_util.tree_map(
            jax.lax.stop_gradient, trace_sdf_all_fn(p))
        walk = locate_edge_points(nograd_all, cam, seeds, seed_valid, cfg)
        dd = _dedupe_per_pixel(cam, walk)
        edge = {**walk, **dd}
        res["edge_mask"] = dd["edge_mask_flat"].reshape(H, W)
        res["convergent_mask"] = res["convergent_mask"] & ~res["edge_mask"]
    else:
        res["edge_mask"] = jnp.zeros((H, W), bool)

    # ---- interior shading ----
    B = cfg.interior_budget
    if B is not None and B < H * W:
        flat_mask = res["convergent_mask"].reshape(-1)
        sel, valid = _select_topk_mask(flat_mask, B)
        ro_f = res["ray_o"].reshape(-1, 3)
        rd_f = res["ray_d"].reshape(-1, 3)
        pts_f = res["points"].reshape(-1, 3)

        def _shade_gathered(_):
            sh = shade_masked(sdf_all_fn, shade_fn, ro_f[sel], rd_f[sel],
                              pts_f[sel], valid, is_training)
            safe = jnp.where(valid, sel, H * W)  # overflow row, sliced off
            out = {}
            for k, v in sh.items():
                buf = jnp.zeros((H * W + 1,) + v.shape[1:], v.dtype)
                out[k] = buf.at[safe].set(v)[:H * W].reshape(
                    (H, W) + v.shape[1:])
            return out

        def _shade_full(_):
            return shade_masked(sdf_all_fn, shade_fn,
                                res["ray_o"], res["ray_d"], res["points"],
                                res["convergent_mask"], is_training)

        shaded = jax.lax.cond(jnp.sum(flat_mask) <= B,
                              _shade_gathered, _shade_full, None)
    else:
        shaded = shade_masked(sdf_all_fn, shade_fn,
                              res["ray_o"], res["ray_d"], res["points"],
                              res["convergent_mask"], is_training)
    res.update(shaded)

    # ---- edge pixels (raytracer.py:665-775) ----
    if cfg.handle_edges:
        kept = edge["edge_kept"]
        epts = edge["walk_points"]
        pid = jnp.clip(edge["edge_pid"], 0, H * W - 1)

        e_sdf, _, e_grad = sdf_all_fn(epts)
        e_grad_sg = jax.lax.stop_gradient(e_grad)
        e_normal = e_grad_sg / (jnp.linalg.norm(e_grad_sg, axis=-1, keepdims=True) + 1e-10)
        if is_training:
            epts_diff = reparam_points(epts, e_grad_sg, e_normal, e_sdf[..., None])
            edge_uv = project(cam, epts_diff)  # differentiable silhouette path
        else:
            edge_uv = jax.lax.stop_gradient(edge["walk_uv"])
        pixel_center = jnp.floor(jax.lax.stop_gradient(edge_uv)) + 0.5

        n2d = jnp.dot(e_normal, cam.W2C[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST)[:, :2]
        n2d = n2d / (jnp.linalg.norm(n2d, axis=-1, keepdims=True) + 1e-10)

        pixel_radius = 0.707
        pos_uv = pixel_center - pixel_radius * n2d
        neg_uv = pixel_center + pixel_radius * n2d
        dot2d = jnp.sum((edge_uv - pixel_center) * n2d, axis=-1)
        # clip strictly inside (0,1): arccos' blows up at 1 and the clip
        # boundary would pass an infinite gradient into the silhouette path
        ang = 2.0 * jnp.arccos(jnp.clip(dot2d / pixel_radius, 0.0, 1.0 - 1e-6))
        pos_w = 1.0 - (ang - jnp.sin(ang)) / (2.0 * jnp.pi)

        import dataclasses as _dc
        # Both side passes run as ONE batched [2K] trace + shade: the two
        # sides are independent (the reference runs them sequentially,
        # raytracer.py:700-709), and batching doubles the matmul batch on
        # these small edge-budget shapes.  The fallback budget doubles so
        # per-side semantics are unchanged.
        side_cfg = _dc.replace(
            cfg, tracer=_dc.replace(cfg.tracer,
                                    fallback_budget=2 * cfg.edge_side_fallback_budget))

        Kn = pos_uv.shape[0]
        both_uv = jnp.concatenate([pos_uv, neg_uv], axis=0)
        kept2 = jnp.concatenate([kept, kept], axis=0)
        r2 = raytrace_pixels(trace_sdf_fn, cam, both_uv, mask=kept2,
                             cfg=side_cfg, coarse_sdf_fn=coarse_sdf_fn,
                             coarse_march_fn=coarse_march_fn)
        s2 = shade_masked(sdf_all_fn, shade_fn, r2["ray_o"], r2["ray_d"],
                          r2["points"], r2["convergent_mask"] & kept2,
                          is_training)
        split = lambda d, lo, hi: {k: v[lo:hi] for k, v in d.items()}
        pos_res, neg_res = split(r2, 0, Kn), split(r2, Kn, 2 * Kn)
        pos_shade, neg_shade = split(s2, 0, Kn), split(s2, Kn, 2 * Kn)

        edge_color = (pos_shade["color"] * pos_w[..., None]
                      + neg_shade["color"] * (1.0 - pos_w[..., None]))

        # scatter edge results into the image (raytracer.py:713-729);
        # non-kept candidates are routed to an overflow row and sliced off
        def scatter(img_flat, vals, extra_mask=None):
            m = kept if extra_mask is None else (kept & extra_mask)
            safe = jnp.where(m, pid, H * W)
            pad_shape = (1,) + img_flat.shape[1:]
            buf = jnp.concatenate([img_flat, jnp.zeros(pad_shape, img_flat.dtype)], 0)
            buf = buf.at[safe].set(vals)
            return buf[:H * W]

        color_flat = res["color"].reshape(H * W, 3)
        res["color"] = scatter(color_flat, edge_color).reshape(H, W, 3)
        normal_flat = res["normal"].reshape(H * W, 3)
        res["normal"] = scatter(normal_flat, e_grad).reshape(H, W, 3)
        raw_flat = res["raw_grad"].reshape(H * W, 3)
        res["raw_grad"] = scatter(raw_flat, e_grad).reshape(H, W, 3)

        res["edge_pos_neg_normal"] = jnp.concatenate(
            [pos_shade["raw_grad"], neg_shade["raw_grad"]], axis=0)
        res["edge_pos_neg_mask"] = jnp.concatenate(
            [pos_res["convergent_mask"] & kept, neg_res["convergent_mask"] & kept], axis=0)
        res["edge_uv"] = edge_uv
        res["edge_points"] = epts
        res["edge_kept"] = kept
        res["edge_pos_weight"] = pos_w

        if debug:  # VERBOSE edge buffers (raytracer.py:515-537, 731-775)
            zero = jnp.zeros((H * W,))
            res["edge_pos_side_weight"] = scatter(zero, pos_w).reshape(H, W)
            res["edge_pos_side_depth"] = scatter(zero, pos_res["depth"]).reshape(H, W)
            res["edge_neg_side_depth"] = scatter(zero, neg_res["depth"]).reshape(H, W)
            res["edge_pos_side_color"] = scatter(
                jnp.zeros((H * W, 3)), pos_shade["color"]).reshape(H, W, 3)
            res["edge_neg_side_color"] = scatter(
                jnp.zeros((H * W, 3)), neg_shade["color"]).reshape(H, W, 3)
            # per-pixel |n.v| angle at the walked edge point (deg)
            viewdir = jnp.asarray(cam.C2W[:3, 3]) - epts
            viewdir = viewdir / (jnp.linalg.norm(viewdir, axis=-1, keepdims=True) + 1e-10)
            dots = jnp.sum(e_normal * viewdir, axis=-1)
            ang_deg = jnp.degrees(jnp.arccos(jnp.clip(dots, -1.0, 1.0)))
            res["edge_angles"] = scatter(zero, ang_deg).reshape(H, W)
            res["edge_sdf"] = scatter(zero, e_sdf).reshape(H, W)

    return res
