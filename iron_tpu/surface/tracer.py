"""Fixed-shape masked sphere tracer with dense-sampling fallback and
bisection root refinement.

Behavioral spec from reference `models/raytracer.py:27-220` (RayTracer):
  * sphere_tracing: up to 16 iterations, step = SDF value, a ray is
    finished when |sdf| <= 5e-5 or it left [min_dis, max_dis]; convergent
    = finished inside the interval with small |sdf| (raytracer.py:105-140);
  * rays not converged by sphere tracing fall back to 128 uniform samples
    over the remaining interval; the first positive->negative sign
    transition is found with the sign * reversed-arange argmin trick
    (raytracer.py:142-197);
  * the bracketing segment is refined by bisection until the bracket is
    smaller than 2 * sdf_threshold (raytracer.py:199-220).

TPU-first: where the reference physically compacts rays with boolean
indexing, every step here runs on the full fixed-shape ray tile under a
live mask (`jnp.where`) — the XLA-friendly formulation.  Loops are
`lax.while_loop`s whose predicates include `jnp.any(active)`, so converged
tiles still early-exit in wall-clock terms.  The whole tracer runs under
`stop_gradient` semantics by construction (no parameters are touched);
gradients re-enter only via `reparam_points`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TracerConfig:
    sdf_threshold: float = 5.0e-5
    # More iterations than the reference's 16 (raytracer.py:31): in
    # fixed-shape mode unfinished rays can't be compacted into the unlimited
    # fallback the reference uses, and an imperfect *network* SDF needs
    # ~30-50 steps to reach the 5e-5 threshold (measured: 16 iters leave 26%
    # of rays unfinished at geometric init, 48 leave 2.5%).  The masked
    # while_loop early-exits once every ray is done, so easy scenes
    # (near-exact SDFs) pay only the iterations they use.
    sphere_tracing_iters: int = 48
    n_steps: int = 128          # dense fallback samples
    max_bisection_iters: int = 24
    # Static cap on rays entering the dense fallback; the reference compacts
    # dynamically instead (raytracer.py:58-79).  None = full tile.
    # 1024 re-tuned with the in-kernel coarse march (40 masked iterations
    # leave well under 1024 unfinished rays per 128^2 patch on learned SDFs;
    # measured drop vs unlimited: 2/911 convergent pixels, bf16-class
    # distance error — scripts/bench_sweep.py + budget-quality check).
    fallback_budget: int | None = 1024
    # Two-phase tracing: run `dense_iters` sphere-trace steps on the full
    # tile, then gather the still-active rays (same budget) for the
    # remaining iterations.
    dense_iters: int = 24
    # Coarse-to-fine: when a `coarse_sdf_fn` is supplied to raytrace /
    # sphere_trace (e.g. the SDF at DEFAULT/bf16 matmul precision, ~3x
    # cheaper than HIGH), the dense full-tile march runs on it down to
    # `coarse_threshold`, then `refine_iters` full-tile steps on the
    # accurate fn re-check and polish every ray to sdf_threshold.  bf16
    # SDF error is ~1e-2, so coarse_threshold must sit well above it.
    coarse_threshold: float = 2.0e-2
    # Full-tile accurate polish iterations after the coarse march.  Kept
    # short: a handful of grazing rays otherwise keep the full-tile
    # while_loop alive for its whole budget; stragglers past refine_iters
    # are gathered (fallback_budget) for the remaining accurate steps.
    refine_iters: int = 2
    # The coarse march itself is two-phase for the same reason: after
    # `coarse_dense_iters` full-tile steps, still-active rays gather into
    # the budget for `coarse_straggler_iters` more coarse steps.
    coarse_dense_iters: int = 12
    # 28 (up from 16) with the in-kernel march: extra coarse iterations are
    # nearly free under per-tile early exit and shrink the accurate
    # straggler/fallback population.
    coarse_straggler_iters: int = 28
    # When the dense fallback sweep runs on the coarse evaluator, the flip
    # is re-located with accurate evaluations over z_flip +- this margin
    # (must exceed the coarse evaluator's SDF error; bf16 error ~1e-2).
    fallback_revalidate_margin: float = 2.5e-2
    # Run the fallback sweep on the coarse evaluator when one is available.
    fallback_coarse: bool = True


def budget_select(flat_mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of up to k True entries of flat_mask, spatially interleaved.

    A plain stable argsort picks the first k in scan (row-major) order,
    which concentrates an over-budget selection in the top image rows; the
    golden-ratio stride permutation spreads it uniformly instead."""
    n = flat_mask.shape[0]
    stride = max(int(n * 0.6180339887) | 1, 1)
    while np.gcd(stride, n) != 1:
        stride += 2
    perm = (jnp.arange(n) * stride) % n
    order = jnp.argsort(jnp.where(flat_mask[perm], 0, 1), stable=True)
    return perm[order[:k]]


def _trace_loop(sdf_fn, ray_o, ray_d, max_dis, active0, acc0, sdf0, n_iters,
                threshold):
    """Masked sphere-trace iterations (raytracer.py:112-126)."""

    def unfinished(mask, s, d):
        return mask & (jnp.abs(s) > threshold) & (d < max_dis)

    def cond(carry):
        i, active, acc, s = carry
        return (i < n_iters) & jnp.any(active)

    def body(carry):
        i, active, acc, s = carry
        step = jnp.where(active, s, 0.0)
        acc_new = acc + step
        pts_new = ray_o + ray_d * acc_new[..., None]
        s_new = jnp.where(active, sdf_fn(pts_new), s)
        active_new = unfinished(active, s_new, acc_new)
        return i + 1, active_new, acc_new, s_new

    _, active, acc, s = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), active0, acc0, sdf0))
    return active, acc, s


def _budgeted_trace(sdf_fn, ray_o, ray_d, max_dis, active, acc_dis, sdf_val,
                    n_iters: int, threshold: float, budget: int | None):
    """Gather up to `budget` active rays, run n_iters masked trace steps on
    just those, scatter back.  Falls back to the full tile when the budget
    doesn't apply.  Returns updated (active, acc_dis, sdf_val)."""
    shape = active.shape
    n_rays = int(np.prod(shape))
    if budget is None or budget >= n_rays:
        return _trace_loop(sdf_fn, ray_o, ray_d, max_dis, active, acc_dis,
                           sdf_val, n_iters, threshold)
    act_f = active.reshape(-1)
    sel = budget_select(act_f, budget)
    valid = act_f[sel]
    ro_s = ray_o.reshape(-1, 3)[sel]
    rd_s = ray_d.reshape(-1, 3)[sel]
    md_s = jnp.broadcast_to(max_dis, shape).reshape(-1)[sel]
    a_s, acc_s, s_s = _trace_loop(
        sdf_fn, ro_s, rd_s, md_s, valid,
        acc_dis.reshape(-1)[sel], sdf_val.reshape(-1)[sel],
        n_iters, threshold)
    active = active.reshape(-1).at[sel].set(
        jnp.where(valid, a_s, valid)).reshape(shape)
    acc_dis = acc_dis.reshape(-1).at[sel].set(
        jnp.where(valid, acc_s, acc_dis.reshape(-1)[sel])).reshape(shape)
    sdf_val = sdf_val.reshape(-1).at[sel].set(
        jnp.where(valid, s_s, sdf_val.reshape(-1)[sel])).reshape(shape)
    return active, acc_dis, sdf_val


def sphere_trace(sdf_fn: Callable, ray_o, ray_d, min_dis, max_dis, work_mask,
                 cfg: TracerConfig = TracerConfig(),
                 coarse_sdf_fn: Callable | None = None,
                 coarse_march_fn: Callable | None = None):
    """Two-phase masked sphere tracing (raytracer.py:105-140 semantics).

    With `coarse_sdf_fn` (a cheaper, lower-precision evaluator of the same
    SDF), the march runs coarse-to-fine: coarse steps to
    cfg.coarse_threshold (dense full tile, then budgeted stragglers), then
    cfg.refine_iters accurate full-tile steps re-check and polish every ray
    to cfg.sdf_threshold, with accurate budgeted stragglers after that.
    Rays the coarse march mis-judged are reactivated by the accurate
    re-evaluation, so the result matches the accurate-only path up to
    sphere-tracing's own convergence tolerance.

    Returns (convergent_mask, unfinished_mask, points, sdf, distance), all
    full-shape [...].
    """
    acc_dis = min_dis
    pts = ray_o + ray_d * acc_dis[..., None]

    def unfinished(mask, s, d):
        return mask & (jnp.abs(s) > cfg.sdf_threshold) & (d < max_dis)

    if coarse_march_fn is not None or coarse_sdf_fn is not None:
        cd = min(cfg.coarse_dense_iters, cfg.sphere_tracing_iters)
        cs = min(cfg.coarse_straggler_iters,
                 max(cfg.sphere_tracing_iters - cd, 0))
        refine = min(cfg.refine_iters, max(cfg.sphere_tracing_iters - cd, 0))
        if coarse_march_fn is not None:
            # single-kernel march (kernels/fused_sdf.py): per-tile early
            # exit subsumes the dense/straggler phase split and the budget —
            # every ray gets the full iteration allowance
            _, acc_dis, _ = coarse_march_fn(ray_o, ray_d, acc_dis, work_mask,
                                            max_dis, cd + cs)
        else:
            # coarse march on the cheap evaluator: dense phase + budgeted
            # stragglers (grazing rays would otherwise keep the full-tile
            # while_loop alive for its whole iteration budget)
            s_c = coarse_sdf_fn(pts)
            active_c = work_mask & (jnp.abs(s_c) > cfg.coarse_threshold) & (acc_dis < max_dis)
            active_c, acc_dis, s_c = _trace_loop(
                coarse_sdf_fn, ray_o, ray_d, max_dis, active_c, acc_dis, s_c,
                cd, cfg.coarse_threshold)
            if cs > 0:
                _, acc_dis, _ = _budgeted_trace(
                    coarse_sdf_fn, ray_o, ray_d, max_dis, active_c, acc_dis, s_c,
                    cs, cfg.coarse_threshold, cfg.fallback_budget)
        # accurate re-evaluation + short full-tile polish
        sdf_val = sdf_fn(ray_o + ray_d * acc_dis[..., None])
        active = unfinished(work_mask, sdf_val, acc_dis)
        active, acc_dis, sdf_val = _trace_loop(
            sdf_fn, ray_o, ray_d, max_dis, active, acc_dis, sdf_val,
            refine, cfg.sdf_threshold)
        phase1 = cd + refine
    else:
        sdf_val = sdf_fn(pts)
        active0 = unfinished(work_mask, sdf_val, acc_dis)
        phase1 = min(cfg.dense_iters, cfg.sphere_tracing_iters)
        active, acc_dis, sdf_val = _trace_loop(
            sdf_fn, ray_o, ray_d, max_dis, active0, acc_dis, sdf_val,
            phase1, cfg.sdf_threshold)

    rem = max(cfg.sphere_tracing_iters - phase1, 0)
    if rem > 0:
        active, acc_dis, sdf_val = _budgeted_trace(
            sdf_fn, ray_o, ray_d, max_dis, active, acc_dis, sdf_val,
            rem, cfg.sdf_threshold, cfg.fallback_budget)

    pts = ray_o + ray_d * acc_dis[..., None]
    convergent = (work_mask & ~active
                  & (jnp.abs(sdf_val) <= cfg.sdf_threshold)
                  & (acc_dis < max_dis))
    return convergent, active, pts, sdf_val, acc_dis


def ray_sampler(sdf_fn: Callable, ray_o, ray_d, min_dis, max_dis, work_mask,
                cfg: TracerConfig = TracerConfig(),
                coarse_sdf_fn: Callable | None = None):
    """Dense fallback sampling + first-sign-flip bracket (raytracer.py:142-197).

    Runs on the full tile; `work_mask` gates which rays matter.  Returns
    (rootfind_mask, points, sdf, distance).

    With `coarse_sdf_fn`, the n_steps dense sweep (the dominant fallback
    cost) runs on the cheap evaluator; the flip is then re-located inside a
    z_flip ± fallback_revalidate_margin distance window re-evaluated with
    the accurate fn, so the bracket handed to bisection is always
    accurate-sign-valid.  Features whose SDF dip is shallower than the
    coarse evaluator's error can be missed — the trade is documented in
    PARITY.md (budgets/precision deviations).
    """
    t = jnp.linspace(0.0, 1.0, cfg.n_steps)
    intervals = min_dis[..., None] + t * (max_dis - min_dis)[..., None]  # [..., S]
    pts = ray_o[..., None, :] + ray_d[..., None, :] * intervals[..., None]
    sweep_fn = coarse_sdf_fn if coarse_sdf_fn is not None else sdf_fn
    sdf_val = sweep_fn(pts)  # [..., S]

    # first index whose sdf is negative: sign * reversed arange, argmin
    rev = jnp.arange(cfg.n_steps, 0, -1, dtype=sdf_val.dtype)
    tmp = jnp.sign(sdf_val) * rev
    min_val = jnp.min(tmp, axis=-1)
    min_idx = jnp.argmin(tmp, axis=-1)
    rootfind_mask = work_mask & (min_val < 0.0) & (min_idx >= 1)

    if coarse_sdf_fn is not None:
        # Accurate re-evaluation of a *distance* window around a coarse
        # flip.  The window must cover the coarse evaluator's SDF error
        # (bf16 ~1e-2) regardless of the sweep's sample spacing: the true
        # root lies within ~error of the coarse flip position (unit
        # Lipschitz), while its sample-index offset is unbounded when the
        # interval is short.  W=8 accurate points over z_flip +- margin.
        W = 8
        spacing = (max_dis - min_dis) / (cfg.n_steps - 1)
        margin = jnp.maximum(2.0 * spacing, cfg.fallback_revalidate_margin)
        tw = jnp.linspace(0.0, 1.0, W)
        rev_w = jnp.arange(W, 0, -1, dtype=jnp.float32)

        def revalidate(flip_idx):
            """Accurate window around sample flip_idx -> (ok, bracket)."""
            z_flip = jnp.take_along_axis(
                intervals, jnp.clip(flip_idx, 1, cfg.n_steps - 1)[..., None],
                axis=-1)[..., 0]
            z_w = (z_flip - margin)[..., None] + tw * (2.0 * margin)[..., None]
            z_w = jnp.clip(z_w, min_dis[..., None], max_dis[..., None])
            p_w = ray_o[..., None, :] + ray_d[..., None, :] * z_w[..., None]
            f_w = sdf_fn(p_w)                                      # [..., W]
            tmp_w = jnp.sign(f_w) * rev_w
            w_min_idx = jnp.argmin(tmp_w, axis=-1)
            ok = (jnp.min(tmp_w, axis=-1) < 0.0) & (w_min_idx >= 1)
            w_idx = jnp.clip(w_min_idx, 1, W - 1)
            take = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
            return ok, (take(z_w, w_idx - 1), take(z_w, w_idx),
                        take(f_w, w_idx - 1), take(f_w, w_idx))

        ok1, br1 = revalidate(min_idx)
        # Second candidate: a coarse flip can be a false positive (graze
        # within the coarse error) while the ray truly hits further along —
        # rerun the flip search beyond the rejected window instead of
        # dropping the ray.
        margin_idx = jnp.ceil(margin / jnp.maximum(spacing, 1e-12)).astype(jnp.int32)
        beyond = jnp.arange(cfg.n_steps) > (min_idx + margin_idx)[..., None]
        tmp2 = jnp.where(beyond, tmp, jnp.inf)
        min_idx2 = jnp.argmin(tmp2, axis=-1)
        has2 = jnp.min(tmp2, axis=-1) < 0.0
        ok2, br2 = revalidate(min_idx2)
        ok2 = ok2 & has2

        use2 = (~ok1) & ok2
        ok = ok1 | use2
        rootfind_mask = rootfind_mask & ok
        pick = lambda a, b: jnp.where(use2, b, a)
        z_low, z_high, f_low, f_high = (pick(a, b) for a, b in zip(br1, br2))
    else:
        idx = jnp.clip(min_idx, 1, cfg.n_steps - 1)
        z_low = jnp.take_along_axis(intervals, (idx - 1)[..., None], axis=-1)[..., 0]
        z_high = jnp.take_along_axis(intervals, idx[..., None], axis=-1)[..., 0]
        f_low = jnp.take_along_axis(sdf_val, (idx - 1)[..., None], axis=-1)[..., 0]
        f_high = jnp.take_along_axis(sdf_val, idx[..., None], axis=-1)[..., 0]

    p_pred, z_pred, f_pred = bisection(sdf_fn, f_low, f_high, z_low, z_high,
                                       ray_o, ray_d, rootfind_mask, cfg)
    return rootfind_mask, p_pred, f_pred, z_pred


def bisection(sdf_fn: Callable, f_low, f_high, d_low, d_high, ray_o, ray_d,
              work_mask, cfg: TracerConfig = TracerConfig()):
    """Masked bisection until bracket < 2*threshold (raytracer.py:199-220)."""
    work = work_mask & (f_low > 0) & (f_high < 0)

    def cond(carry):
        i, w, dl, dh, fl, fh = carry
        return (i < cfg.max_bisection_iters) & jnp.any(w)

    def body(carry):
        i, w, dl, dh, fl, fh = carry
        d_mid = 0.5 * (dl + dh)
        p_mid = ray_o + ray_d * d_mid[..., None]
        f_mid = sdf_fn(p_mid)
        go_low = f_mid > 0
        dl = jnp.where(w & go_low, d_mid, dl)
        fl = jnp.where(w & go_low, f_mid, fl)
        dh = jnp.where(w & ~go_low, d_mid, dh)
        fh = jnp.where(w & ~go_low, f_mid, fh)
        w = w & ((dh - dl) > 2 * cfg.sdf_threshold)
        return i + 1, w, dl, dh, fl, fh

    _, _, d_low, d_high, f_low, f_high = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), work, d_low, d_high, f_low, f_high))

    d_mid = 0.5 * (d_low + d_high)
    p_mid = ray_o + ray_d * d_mid[..., None]
    f_mid = sdf_fn(p_mid)
    return p_mid, d_mid, f_mid


def raytrace(sdf_fn: Callable, ray_o, ray_d, min_dis, max_dis, work_mask,
             cfg: TracerConfig = TracerConfig(),
             coarse_sdf_fn: Callable | None = None,
             coarse_march_fn: Callable | None = None) -> Dict[str, jnp.ndarray]:
    """Full root finder = sphere trace -> fallback sampler (raytracer.py:45-103).

    Returns dict with full-shape convergent_mask / points / sdf / distance.
    With `fallback_budget`, only up to that many unfinished rays are dense-
    sampled (gather -> sample -> scatter), saving ~n_steps SDF sweeps over
    the full tile; sphere tracing leaves few rays unfinished.
    `coarse_sdf_fn` enables the coarse-to-fine march (see sphere_trace).
    """
    (convergent, unfinished, pts, sdf_val, acc_dis) = sphere_trace(
        sdf_fn, ray_o, ray_d, min_dis, max_dis, work_mask, cfg,
        coarse_sdf_fn=coarse_sdf_fn, coarse_march_fn=coarse_march_fn)

    # fallback interval: if overshoot (sdf > 0) search [acc, max];
    # if we jumped inside (sdf < 0) search [min, acc]  (raytracer.py:59-65)
    went_positive = sdf_val > 0.0
    samp_min = jnp.where(went_positive, acc_dis, min_dis)
    samp_max = jnp.where(went_positive, max_dis, acc_dis)

    K = cfg.fallback_budget
    n_rays = int(np.prod(work_mask.shape))
    fb_coarse = coarse_sdf_fn if cfg.fallback_coarse else None
    if K is None or K >= n_rays:
        samp_conv, samp_pts, samp_sdf, samp_dis = ray_sampler(
            sdf_fn, ray_o, ray_d, samp_min, samp_max, unfinished, cfg,
            coarse_sdf_fn=fb_coarse)
        use = unfinished
        convergent = jnp.where(use, samp_conv, convergent)
        pts = jnp.where(use[..., None], samp_pts, pts)
        sdf_val = jnp.where(use, samp_sdf, sdf_val)
        acc_dis = jnp.where(use, samp_dis, acc_dis)
    else:
        shape = work_mask.shape
        unf_f = unfinished.reshape(-1)
        sel = budget_select(unf_f, K)
        valid = unf_f[sel]
        s_conv, s_pts, s_sdf, s_dis = ray_sampler(
            sdf_fn,
            ray_o.reshape(-1, 3)[sel], ray_d.reshape(-1, 3)[sel],
            samp_min.reshape(-1)[sel], samp_max.reshape(-1)[sel],
            valid, cfg, coarse_sdf_fn=fb_coarse)
        upd = valid
        convergent = convergent.reshape(-1).at[sel].set(
            jnp.where(upd, s_conv, convergent.reshape(-1)[sel])).reshape(shape)
        pts = pts.reshape(-1, 3).at[sel].set(
            jnp.where(upd[..., None], s_pts, pts.reshape(-1, 3)[sel])).reshape(shape + (3,))
        sdf_val = sdf_val.reshape(-1).at[sel].set(
            jnp.where(upd, s_sdf, sdf_val.reshape(-1)[sel])).reshape(shape)
        acc_dis = acc_dis.reshape(-1).at[sel].set(
            jnp.where(upd, s_dis, acc_dis.reshape(-1)[sel])).reshape(shape)

    return {
        "convergent_mask": convergent,
        "points": pts,
        "sdf": sdf_val,
        "distance": acc_dis,
    }
