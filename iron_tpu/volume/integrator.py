"""NeuS volume rendering: SDF -> section alpha -> transmittance compositing,
with inverted-sphere background NeRF blending.

Behavioral spec from reference `models/renderer.py:128-453` (NeuSRenderer):
  * render(): 64 uniform z + optional per-ray jitter; 4 importance rounds
    (inv_s = 64 * 2^i) under stop_gradient; background z from an inverted
    distribution beyond the sphere (renderer.py:362-382);
  * render_core_outside(): 4D (x/r, 1/r) input to the NeRF, softplus density
    -> alpha, transmittance weights (renderer.py:151-187);
  * render_core(): section-estimated prev/next SDF with cos annealing
    (renderer.py:288-306), alpha = clip((sig(prev*s) - sig(next*s) + eps)
    / (sig(prev*s) + eps), 0, 1), inside-sphere blend with background
    samples, cumprod transmittance, eikonal error over relax-inside points
    (renderer.py:308-331).

TPU-first: the whole pipeline is pure and jittable; the importance loop is
a statically unrolled Python loop with growing-but-static shapes
(64 -> 80 -> 96 -> 112 -> 128 for the standard config), so XLA sees five
fixed-shape programs fused into one.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from iron_tpu.volume.sampling import sample_pdf, up_sample, cat_z_vals

# sdf_fn:      pts [..., 3] -> sdf [...]
# sdf_all_fn:  pts [..., 3] -> (sdf [...], feat [..., F], grad [..., 3])
# color_fn:    (pts, grads, dirs, feat) -> rgb [..., 3]
# nerf_fn:     (pts4 [..., 4], dirs [..., 3]) -> (density [..., 1], rgb [..., 3])


def nerf_density_render(rays_o, rays_d, near, far, nerf_fn, n_samples: int,
                        background_dist: float = 0.0, background_rgb=None,
                        key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Plain density-field volume rendering (reference NeRFRenderer.render,
    renderer.py:78-126): uniform z, softplus(density) -> alpha, transmittance
    compositing over *unit-normalized* sample positions; returns color, depth
    map and weights.  Used by the hash-grid NeRF runner
    (render_volume_tcnn.py:63-111 equivalent)."""
    batch_size = rays_o.shape[0]
    near = jnp.reshape(near, (batch_size, 1))
    far = jnp.reshape(far, (batch_size, 1))
    z_vals = jnp.linspace(0.0, 1.0, n_samples)
    z_vals = near + (far - near) * z_vals[None, :] + background_dist
    if key is not None:
        t_rand = jax.random.uniform(key, (batch_size, 1)) - 0.5
        z_vals = z_vals + t_rand * (far - near) / n_samples

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, dists[..., :1]], axis=-1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts_n = pts / dis
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    density, sampled_color = nerf_fn(pts_n, dirs)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    color = jnp.sum(weights[..., None] * sampled_color, axis=1)
    zmap = jnp.sum(weights[..., None] * z_vals[..., None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return {"color": color, "sampled_color": sampled_color, "zmap": zmap,
            "weights": weights}


@dataclass(frozen=True)
class NeuSRenderConfig:
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 32
    up_sample_steps: int = 4
    perturb: float = 1.0


def render_core_outside(rays_o, rays_d, z_vals, sample_dist, nerf_fn,
                        background_rgb=None) -> Dict[str, jnp.ndarray]:
    """Background model over z_vals [B, N] (renderer.py:151-187)."""
    batch_size, n_samples = z_vals.shape
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis_to_center = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    density, sampled_color = nerf_fn(pts4, dirs)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    color = jnp.sum(weights[..., None] * sampled_color, axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return {"color": color, "sampled_color": sampled_color, "alpha": alpha,
            "weights": weights}


def render_core(rays_o, rays_d, z_vals, sample_dist,
                sdf_all_fn, color_fn, inv_s,
                background_alpha=None, background_sampled_color=None,
                background_rgb=None, cos_anneal_ratio: float = 0.0
                ) -> Dict[str, jnp.ndarray]:
    """The NeuS hot kernel (renderer.py:250-344). z_vals [B, N]."""
    batch_size, n_samples = z_vals.shape
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]  # [B,N,3]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    sdf, feature, gradients = sdf_all_fn(pts)
    sampled_color = color_fn(pts, gradients, dirs, feature)

    inv_s = jnp.clip(inv_s, 1e-6, 1e6)

    true_cos = jnp.sum(dirs * gradients, axis=-1)  # [B,N]
    # anneal keeps cos "not dead" early in training (renderer.py:290-294)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)

    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)

    pts_norm = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(alpha.dtype))
    relax_inside = jax.lax.stop_gradient((pts_norm < 1.2).astype(alpha.dtype))

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :n_samples] * (1.0 - inside_sphere)
        alpha = jnp.concatenate([alpha, background_alpha[:, n_samples:]], axis=-1)
        sampled_color = (sampled_color * inside_sphere[..., None]
                         + background_sampled_color[:, :n_samples] * (1.0 - inside_sphere)[..., None])
        sampled_color = jnp.concatenate([sampled_color, background_sampled_color[:, n_samples:]], axis=1)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    gradient_error = (jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2
    gradient_error = jnp.sum(relax_inside * gradient_error) / (jnp.sum(relax_inside) + 1e-5)

    return {
        "color": color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": prev_cdf,
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
    }


def neus_render(rays_o, rays_d, near, far, *,
                sdf_fn, sdf_all_fn, color_fn, inv_s,
                nerf_fn=None, cfg: NeuSRenderConfig = NeuSRenderConfig(),
                key: Optional[jax.Array] = None,
                background_rgb=None, cos_anneal_ratio: float = 0.0,
                perturb_overwrite: float = -1.0,
                init_z: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Full NeuS render (renderer.py:346-453). near/far: [B, 1] or [B].

    init_z [B, n_samples]: optional precomputed initial samples (e.g.
    occupancy-guided, volume/occupancy.py) replacing the uniform ladder;
    the per-ray jitter is skipped for them (they carry their own).
    """
    batch_size = rays_o.shape[0]
    near = jnp.reshape(near, (batch_size, 1))
    far = jnp.reshape(far, (batch_size, 1))
    sample_dist = 2.0 / cfg.n_samples

    if init_z is not None:
        z_vals = init_z
    else:
        z_vals = jnp.linspace(0.0, 1.0, cfg.n_samples)
        z_vals = near + (far - near) * z_vals[None, :]

    z_vals_outside = None
    if cfg.n_outside > 0:
        z_vals_outside = jnp.linspace(1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0), cfg.n_outside)

    perturb = cfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    if perturb > 0:
        assert key is not None, "need a PRNG key when perturb > 0"
        k1, k2 = jax.random.split(key)
        if init_z is None:
            t_rand = jax.random.uniform(k1, (batch_size, 1)) - 0.5
            z_vals = z_vals + t_rand * 2.0 / cfg.n_samples
        if cfg.n_outside > 0:
            mids = 0.5 * (z_vals_outside[1:] + z_vals_outside[:-1])
            upper = jnp.concatenate([mids, z_vals_outside[-1:]])
            lower = jnp.concatenate([z_vals_outside[:1], mids])
            t_rand2 = jax.random.uniform(k2, (batch_size, cfg.n_outside))
            z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_rand2

    if cfg.n_outside > 0:
        if z_vals_outside.ndim == 1:
            z_vals_outside = jnp.broadcast_to(z_vals_outside[None, :], (batch_size, cfg.n_outside))
        z_vals_outside = far / jnp.flip(z_vals_outside, axis=-1) + 1.0 / cfg.n_samples

    n_samples = cfg.n_samples
    if cfg.n_importance > 0:
        # importance sampling never takes gradients (renderer.py:389)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
        sdf = jax.lax.stop_gradient(sdf_fn(pts))
        for i in range(cfg.up_sample_steps):
            new_z = up_sample(rays_o, rays_d, z_vals, sdf,
                              cfg.n_importance // cfg.up_sample_steps,
                              64 * 2 ** i)
            last = (i + 1 == cfg.up_sample_steps)
            if not last:
                new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., :, None]
                new_sdf = jax.lax.stop_gradient(sdf_fn(new_pts))
                z_vals, sdf = cat_z_vals(z_vals, new_z, sdf, new_sdf)
            else:
                z_vals, _ = cat_z_vals(z_vals, new_z, None, None)
        n_samples = cfg.n_samples + cfg.n_importance

    background_alpha = None
    background_sampled_color = None
    if cfg.n_outside > 0:
        z_feed = jnp.sort(jnp.concatenate([z_vals, z_vals_outside], axis=-1), axis=-1)
        ret_out = render_core_outside(rays_o, rays_d, z_feed, sample_dist, nerf_fn)
        background_sampled_color = ret_out["sampled_color"]
        background_alpha = ret_out["alpha"]

    ret = render_core(rays_o, rays_d, z_vals, sample_dist,
                      sdf_all_fn, color_fn, inv_s,
                      background_alpha=background_alpha,
                      background_sampled_color=background_sampled_color,
                      background_rgb=background_rgb,
                      cos_anneal_ratio=cos_anneal_ratio)

    weights = ret["weights"]
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    s_val = jnp.mean(jnp.broadcast_to(ret["s_val"], (batch_size, 1)), axis=-1, keepdims=True)

    return {
        "color_fine": ret["color"],
        "s_val": s_val,
        "cdf_fine": ret["cdf"],
        "weight_sum": weights_sum,
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradients": ret["gradients"],
        "weights": weights,
        "gradient_error": ret["gradient_error"],
        "inside_sphere": ret["inside_sphere"],
        "z_vals": z_vals,
    }
