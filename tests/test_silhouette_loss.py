"""Silhouette counterweight to the masked-loss shrink bias (ROUND_LOG r4).

The stage-2 image losses are masked to the render's own coverage, so
locally shrinking coverage zeroes the loss — only edge pixels resist
(reference has the identical structure, render_surface.py:571-607); the
round-4 e2e runs measured the resulting monotone erosion (sphere chamfer
0.0283@20k -> 0.0425@50k) and one catastrophic torus collapse.
`Stage2Config.silhouette_weight` adds the IDR-style differentiable
silhouette loss (Yariv et al. 2020 eq. 6) over mask/coverage
disagreements: BCE(sigmoid(-alpha*f(x*)), mask)/alpha with x* the no-grad
along-ray argmin of f (miss) or the hit point (excess).

These tests drive the term through an optimizer in BOTH directions: a
too-small SDF sphere must GROW to a larger GT mask, and a too-big one
must be CARVED back — purely through the silhouette term, with the edge
pipeline OFF (so nothing else can supply a silhouette gradient).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from iron_tpu.data.synthetic import ring_cameras, sphere_scene
from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only, \
    sdf_value_feat_grad, sdf_grad
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
from iron_tpu.train.stage2 import (Stage2Config, _silhouette_term,
                                   _mask_disagreement)

R_TRUE = 0.5
H = W = 64


def _white_shade(ray_o, ray_d, points, normals, features):
    return {"color": jnp.ones(points.shape[:-1] + (3,))}


def _gt_masks(cams):
    sdf_fn, sdf_all_fn = sphere_scene(R_TRUE)
    scfg = SurfaceRenderConfig(handle_edges=False, fill_holes=False)
    render = jax.jit(lambda c: render_camera(sdf_fn, sdf_all_fn,
                                             _white_shade, c, scfg))
    return [render(c)["hit_mask"].astype(jnp.float32) for c in cams]


def _fit(init_bias: float, iters: int = 80):
    cams, _, _ = ring_cameras(2, H=H, W=W, focal=80.0)
    gts = _gt_masks(cams)

    sdf_cfg = SDFConfig(bias=init_bias)
    cfg = Stage2Config(sdf=sdf_cfg, silhouette_weight=1.0,
                       silhouette_samples=24, silhouette_budget=512,
                       surface=SurfaceRenderConfig(handle_edges=False,
                                                   fill_holes=False))
    params = init_sdf(jax.random.PRNGKey(0), sdf_cfg)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def loss_fn(params, cam, gt_mask, key):
        sdf_fn = lambda p: sdf_only(params, p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params, p, sdf_cfg)
        res = render_camera(sdf_fn, sdf_all_fn, _white_shade, cam,
                            cfg.surface, is_training=True)
        f = {"sdf_fn": sdf_fn, "trace_sdf_fn": sdf_fn}
        miss, excess, mn, mx = _mask_disagreement(res, gt_mask)
        n_miss = jnp.sum(miss.astype(jnp.float32))
        n_excess = jnp.sum(excess.astype(jnp.float32))
        sil = _silhouette_term(f, res, cfg, gt_mask, miss, excess, mn, mx)
        eik_pts = jax.random.uniform(key, (512, 3), minval=-1, maxval=1)
        g = sdf_grad(params, eik_pts, sdf_cfg)
        eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
        return sil + 0.1 * eik, (n_miss, n_excess)

    @jax.jit
    def step(params, opt_state, cam, gt, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cam, gt, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(iters):
        key, sub = jax.random.split(key)
        v = i % len(cams)
        params, opt_state, loss, aux = step(params, opt_state, cams[v],
                                            gts[v], sub)
        assert np.isfinite(float(loss))
        if first is None:
            first = (float(aux[0]), float(aux[1]))
        last = (float(aux[0]), float(aux[1]))

    probe = np.random.default_rng(0).normal(size=(512, 3))
    probe = jnp.asarray(R_TRUE * probe / np.linalg.norm(
        probe, axis=-1, keepdims=True), jnp.float32)
    p0 = init_sdf(jax.random.PRNGKey(0), sdf_cfg)
    err0 = float(jnp.mean(jnp.abs(sdf_only(p0, probe, sdf_cfg))))
    err1 = float(jnp.mean(jnp.abs(sdf_only(params, probe, sdf_cfg))))
    return first, last, err0, err1


@pytest.mark.slow
def test_silhouette_loss_grows_shrunk_coverage():
    first, last, err0, err1 = _fit(init_bias=0.35)
    # started with a large missing-coverage annulus, excess ~0
    assert first[0] > 100, first
    # the counterweight must regrow most of it
    assert last[0] < first[0] * 0.25, (first, last)
    # global surface error improves too, but two ring views only pin two
    # great circles of silhouette — a halving bar is unreachable from
    # silhouettes alone (measured 0.190 -> 0.146 at 80 iters), so the
    # mechanism bar is the miss-count above and this is a direction check
    assert err0 > 0.1
    assert err1 < err0 * 0.85, (err0, err1)


@pytest.mark.slow
def test_silhouette_loss_carves_excess_coverage():
    first, last, err0, err1 = _fit(init_bias=0.65)
    assert first[1] > 100, first
    assert last[1] < first[1] * 0.25, (first, last)
    assert err1 < err0 * 0.85, (err0, err1)


def test_silhouette_term_zero_when_masks_agree():
    cams, _, _ = ring_cameras(1, H=H, W=W, focal=80.0)
    sdf_fn, sdf_all_fn = sphere_scene(R_TRUE)
    cfg = Stage2Config(silhouette_weight=1.0,
                       surface=SurfaceRenderConfig(handle_edges=False,
                                                   fill_holes=False))
    res = render_camera(sdf_fn, sdf_all_fn, _white_shade, cams[0], cfg.surface)
    gt = res["hit_mask"].astype(jnp.float32)
    f = {"sdf_fn": sdf_fn, "trace_sdf_fn": sdf_fn}
    miss, excess, mn, mx = _mask_disagreement(res, gt)
    n_miss = jnp.sum(miss.astype(jnp.float32))
    n_excess = jnp.sum(excess.astype(jnp.float32))
    sil = _silhouette_term(f, res, cfg, gt, miss, excess, mn, mx)
    assert float(n_miss) == 0 and float(n_excess) == 0
    assert float(sil) == 0.0


def test_stage2_val_fn_best_checkpoint_retention(tmp_path):
    """Stage2Trainer.run(val_fn=...) must retain the best-metric params as
    ckpt_best.pkl and leave numbered-checkpoint resume unaffected
    (VERDICT r4 item 8)."""
    import pickle
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import Stage2Trainer
    from iron_tpu.train.checkpoints import latest_checkpoint
    from iron_tpu.surface.tracer import TracerConfig

    data = render_synthetic_dataset("sphere", n_views=2, H=32, W=32, light=30.0)
    cfg = Stage2Config(patch_size=16, renderer_name="ggx", save_freq=4,
                       surface=SurfaceRenderConfig(
                           handle_edges=False, fill_holes=False,
                           tracer=TracerConfig(sphere_tracing_iters=8,
                                               dense_iters=4,
                                               fallback_budget=32)))
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                       out_dir=str(tmp_path))
    # scripted validation metric: peaks at step 8, declines after
    scores = {4: 1.0, 8: 3.0, 12: 2.0}
    tr.run(num_iters=12, val_fn=lambda t: scores[t.step], val_every=4)
    assert tr.best_step == 8
    assert [v["step"] for v in tr.val_history] == [4, 8, 12]
    best = pickle.load(open(tmp_path / "ckpt_best.pkl", "rb"))
    assert best["step"] == 8
    # numbered-checkpoint scan ignores ckpt_best.pkl
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_0000012.pkl")
