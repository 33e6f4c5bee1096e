"""Full-scale single-view silhouette optimization demo.

The reference's canonical self-contained experiment
(tests/test_singleview.py:77-165): optimize ONLY the SDF from one 512x512
photo with a constant-color shade_fn — MSE on edge-mask pixels + eikonal,
Adam(1e-4), random 128^2 crops, edge sampling ON.  Produces mosaics
(gt | render | normals | edge mask) and a checkpoint; the silhouette of the
SDF should converge to the photographed object's outline.

Usage: python scripts/singleview_demo.py [--iters 15000] [--out_dir D]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data_singleview")
PINK = (237.0 / 255.0, 61.0 / 255.0, 100.0 / 255.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15000)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--out_dir", default="./exp_singleview")
    p.add_argument("--log_every", type=int, default=500)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from iron_tpu.core.camera import Camera, make_camera, crop_camera, resize_camera
    from iron_tpu.data.io import read_image, write_image
    from iron_tpu.fields.sdf import (SDFConfig, init_sdf, sdf_only,
                                     sdf_value_feat_grad, sdf_grad)
    from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
    from iron_tpu.train.checkpoints import save_checkpoint
    from iron_tpu.utils.logging import concatenate_result

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
    ps = args.patch
    scfg = SurfaceRenderConfig(fill_holes=False, handle_edges=True,
                               edge_budget=1024)
    color = jnp.asarray(PINK)

    def shade_fn(ray_o, ray_d, pts, normals, feats):
        n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
        return {"color": jnp.broadcast_to(color, pts.shape[:-1] + (3,)),
                "normal": n}

    def loss_fn(params, ul_col, ul_row, key):
        sdf_fn = lambda p: sdf_only(params, p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params, p, sdf_cfg)
        K_j = jnp.asarray(K)
        cam = crop_camera(Camera(K=K_j, W2C=jnp.asarray(W2C),
                                 K_inv=jnp.linalg.inv(K_j),
                                 C2W=jnp.linalg.inv(jnp.asarray(W2C)),
                                 H=H, W=W),
                          ul_col, ul_row, ps, ps)
        gt_crop = jax.lax.dynamic_slice(gt, (ul_row, ul_col, 0), (ps, ps, 3))
        res = render_camera(sdf_fn, sdf_all_fn, shade_fn, cam, scfg,
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
        e3 = ((jnp.linalg.norm(res["edge_pos_neg_normal"], axis=-1) - 1) ** 2
              * res["edge_pos_neg_mask"])
        cnt = e1.size + jnp.sum(all_mask) + jnp.sum(res["edge_pos_neg_mask"])
        eik = (jnp.sum(e1) + jnp.sum(e2) + jnp.sum(e3)) / jnp.clip(cnt, 1.0)
        return img_loss + 0.1 * eik, (img_loss, eik)

    def one_step(params, opt_state, key):
        k_c, k_r, k_e = jax.random.split(key, 3)
        ul_col = jax.random.randint(k_c, (), 0, W - ps)
        ul_row = jax.random.randint(k_r, (), 0, H - ps)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ul_col, ul_row, k_e)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    @jax.jit
    def steps(params, opt_state, key, n=16):
        def body(carry, i):
            p, o = carry
            p, o, loss, aux = one_step(p, o, jax.random.fold_in(key, i))
            return (p, o), (loss, aux)
        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(16))
        return params, opt_state, losses[-1], (auxs[0][-1], auxs[1][-1])

    # validation render at quarter res
    vcam = resize_camera(base, 0.25)
    vjit = jax.jit(lambda p: render_camera(
        lambda x: sdf_only(p, x, sdf_cfg),
        lambda x: sdf_value_feat_grad(p, x, sdf_cfg),
        shade_fn, vcam, scfg, is_training=False))

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    step = 0
    while step < args.iters:
        key, sub = jax.random.split(key)
        params, opt_state, loss, (il, el) = steps(params, opt_state, sub)
        step += 16
        if step % args.log_every < 16:
            print(f"[{step}] loss={float(loss):.5f} img={float(il):.5f} "
                  f"eik={float(el):.5f} it/s={step / (time.time() - t0):.1f}",
                  flush=True)
            res = vjit(params)
            gt_small = np.asarray(gt)[::4, ::4]
            normal = np.asarray(res["normal"])
            normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-10)
            mosaic = concatenate_result(
                [gt_small, np.asarray(res["color"]), (normal + 1) / 2,
                 np.asarray(res["edge_mask"]).astype(np.float32)], 4)
            write_image(os.path.join(args.out_dir, f"logim_{step:06d}.png"), mosaic)
    save_checkpoint(args.out_dir, step, params)
    # coverage of the final silhouette vs the photo's nonzero region
    res = vjit(params)
    # pixel-center hit mask (coverage semantics; conv|edge would count
    # walked edge pixels outside the true silhouette)
    sil = np.asarray(res["hit_mask"])
    photo = np.asarray(gt)[::4, ::4].sum(-1) > 0.05
    inter = (sil & photo).sum()
    union = (sil | photo).sum()
    print(json.dumps({"iters": step, "iou": float(inter / max(union, 1)),
                      "wall_s": time.time() - t0}))


if __name__ == "__main__":
    main()
