"""Training-loop coverage for the DEFAULT edge walk (VERDICT r3 item 6).

The pixel-proportional walk (SurfaceRenderConfig.edge_step_px=0.75) is the
shipped default, but round 3 exercised it only through analytic unit
tests.  Here an optimizer drives the silhouette-gradient path end to end:
an SDF initialized as a too-small sphere must GROW to match the GT
silhouette of a larger sphere, purely through the edge-pixel loss — the
mechanism that collapsed the torus when the walk was silhouette-blind
(scripts/diag_torus_stage2.py; reference path raytracer.py:665-775)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from iron_tpu.core.camera import make_camera
from iron_tpu.data.synthetic import ring_cameras, sphere_scene, make_ggx_shade_fn
from iron_tpu.fields.sdf import (SDFConfig, init_sdf, sdf_only,
                                 sdf_value_feat_grad, sdf_grad)
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera

R_TRUE = 0.5


def _white_shade(ray_o, ray_d, points, normals, features):
    n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
    return {"color": jnp.ones(points.shape[:-1] + (3,)), "normal": n}


@pytest.mark.slow
def test_default_walk_grows_sphere_to_silhouette():
    H = W = 96
    cams, Ks, W2Cs = ring_cameras(2, H=H, W=W, focal=120.0)

    # GT: white-on-black coverage images of the R_TRUE sphere, rendered with
    # the DEFAULT config (edge walk on, default edge_step_px)
    sdf_fn_gt, sdf_all_fn_gt = sphere_scene(R_TRUE)
    scfg = SurfaceRenderConfig(edge_budget=512)
    assert scfg.edge_step_px > 0  # the default under test
    gts = []
    for cam in cams:
        res = jax.jit(lambda c: render_camera(
            sdf_fn_gt, sdf_all_fn_gt, _white_shade, c, scfg))(cam)
        gts.append(jnp.asarray(res["color"]))

    # learnable SDF starts as a clearly smaller sphere (geometric init,
    # bias 0.35): interior color matches everywhere it converges, so ONLY
    # the silhouette/edge path can grow it
    sdf_cfg = SDFConfig(bias=0.35)
    params = init_sdf(jax.random.PRNGKey(0), sdf_cfg)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def loss_fn(params, cam, gt, key):
        sdf_fn = lambda p: sdf_only(params, p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params, p, sdf_cfg)
        res = render_camera(sdf_fn, sdf_all_fn, _white_shade, cam, scfg,
                            is_training=True)
        m = res["edge_mask"][..., None].astype(jnp.float32)
        img_loss = jnp.sum(((res["color"] - gt) ** 2) * m) / \
            jnp.clip(jnp.sum(m), 1.0)
        eik_pts = jax.random.uniform(key, (1024, 3), minval=-1, maxval=1)
        g1 = sdf_grad(params, eik_pts, sdf_cfg)
        eik = jnp.mean((jnp.linalg.norm(g1, axis=-1) - 1.0) ** 2)
        return img_loss + 0.1 * eik, jnp.sum(res["edge_mask"])

    @jax.jit
    def step(params, opt_state, cam, gt, key):
        (loss, n_edge), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cam, gt, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, n_edge

    # surface error probe: |sdf| at points on the TRUE surface
    probe = np.random.default_rng(0).normal(size=(512, 3))
    probe = jnp.asarray(R_TRUE * probe / np.linalg.norm(probe, axis=-1,
                                                        keepdims=True),
                        jnp.float32)
    err0 = float(jnp.mean(jnp.abs(sdf_only(params, probe, sdf_cfg))))

    key = jax.random.PRNGKey(1)
    edge_counts = []
    for i in range(60):
        key, sub = jax.random.split(key)
        v = i % len(cams)
        params, opt_state, loss, n_edge = step(params, opt_state, cams[v],
                                               gts[v], sub)
        edge_counts.append(int(n_edge))
        assert np.isfinite(float(loss))

    # the walk actually reaches the silhouette: a 96px sphere silhouette is
    # ~200 px of circumference; the round-3 broken walk found ~8
    assert np.mean(edge_counts[-10:]) > 50, edge_counts[-10:]

    err1 = float(jnp.mean(jnp.abs(sdf_only(params, probe, sdf_cfg))))
    # started 0.15 off the true surface; the silhouette gradient must close
    # most of that gap
    assert err0 > 0.1
    assert err1 < err0 / 2.5, (err0, err1)
