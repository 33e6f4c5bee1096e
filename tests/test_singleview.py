"""Single-view silhouette fitting — port of the reference's only
self-contained integration test (tests/test_singleview.py:77-165):
optimize ONLY the SDF from one photo with a constant-color shade_fn,
MSE on edge-mask pixels + eikonal, Adam(1e-4).  Shortened for CI."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from iron_tpu.core.camera import make_camera, crop_camera, Camera
from iron_tpu.data.io import read_image
from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only, sdf_value_feat_grad, sdf_grad
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
from iron_tpu.surface.tracer import TracerConfig

DATA = os.path.join(os.path.dirname(__file__), "data_singleview")

PINK = jnp.asarray([237.0 / 255.0, 61.0 / 255.0, 100.0 / 255.0])


def _shade_fn(ray_o, ray_d, points, normals, features):
    n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
    return {"color": jnp.broadcast_to(PINK, points.shape[:-1] + (3,)), "normal": n}


@pytest.mark.slow
def test_singleview_silhouette_fit():
    gt = jnp.asarray(read_image(os.path.join(DATA, "12.png")))
    cam_dict = json.load(open(os.path.join(DATA, "cam_dict_norm.json")))
    K = np.asarray(cam_dict["12.png"]["K"], np.float32).reshape(4, 4)
    W2C = np.asarray(cam_dict["12.png"]["W2C"], np.float32).reshape(4, 4)
    W, H = cam_dict["12.png"]["img_size"]
    base = make_camera(K, W2C, H, W)

    sdf_cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), sdf_cfg)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    ps = 64
    # reference-exact walk parameters (absolute 1e-3 steps): this test
    # replays the reference's canonical single-view experiment verbatim;
    # the pixel-proportional default walk is covered by
    # test_surface_render.py edge-coverage tests
    scfg = SurfaceRenderConfig(fill_holes=False, handle_edges=True,
                               edge_budget=256, edge_step_px=0.0)

    def loss_fn(params, ul_col, ul_row, key):
        sdf_fn = lambda p: sdf_only(params, p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params, p, sdf_cfg)
        K_j = jnp.asarray(K)
        cam = crop_camera(Camera(K=K_j, W2C=jnp.asarray(W2C),
                                 K_inv=jnp.linalg.inv(K_j),
                                 C2W=jnp.linalg.inv(jnp.asarray(W2C)), H=H, W=W),
                          ul_col, ul_row, ps, ps)
        gt_crop = jax.lax.dynamic_slice(gt, (ul_row, ul_col, 0), (ps, ps, 3))
        res = render_camera(sdf_fn, sdf_all_fn, _shade_fn, cam, scfg,
                            is_training=True)
        mask = res["edge_mask"]
        m = mask[..., None].astype(jnp.float32)
        img_loss = jnp.sum(((res["color"] - gt_crop) ** 2) * m) / \
            jnp.clip(jnp.sum(m), 1.0)

        eik_pts = jax.random.uniform(key, (ps * ps // 2, 3), minval=-1, maxval=1)
        g1 = sdf_grad(params, eik_pts, sdf_cfg)
        all_mask = mask | res["convergent_mask"]
        e1 = (jnp.linalg.norm(g1, axis=-1) - 1) ** 2
        e2 = (jnp.linalg.norm(res["raw_grad"], axis=-1) - 1) ** 2 * all_mask
        e3 = (jnp.linalg.norm(res["edge_pos_neg_normal"], axis=-1) - 1) ** 2 \
            * res["edge_pos_neg_mask"]
        cnt = e1.size + jnp.sum(all_mask) + jnp.sum(res["edge_pos_neg_mask"])
        eik_loss = (jnp.sum(e1) + jnp.sum(e2) + jnp.sum(e3)) / jnp.clip(cnt, 1.0)
        return img_loss + 0.1 * eik_loss, img_loss

    @jax.jit
    def step(params, opt_state, ul_col, ul_row, key):
        (loss, img_l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ul_col, ul_row, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, img_l

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        ul_col = int(rng.integers(0, W - ps))
        ul_row = int(rng.integers(0, H - ps))
        params, opt_state, loss, img_l = step(params, opt_state, ul_col, ul_row, sub)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    # optimization is progressing: recent losses below the early ones
    assert np.mean(losses[-15:]) < np.mean(losses[:15])
