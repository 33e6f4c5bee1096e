"""Stage-2 step breakdown on TPU: time trace / edge / shade / loss / grad."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, dataclasses as dc
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer, stage2_loss, init_stage2_params
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera, raytrace_pixels
from iron_tpu.surface.tracer import TracerConfig
from iron_tpu.core.camera import Camera, crop_camera, pixel_grid
from iron_tpu.fields.sdf import sdf_only, sdf_value_feat_grad
from iron_tpu.shading.materials import shade_points

PATCH = 128
data = render_synthetic_dataset("sphere", n_views=4, H=PATCH*2, W=PATCH*2, light=30.0)
cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                   surface=SurfaceRenderConfig(edge_budget=1024,
                                               interior_budget=4096))
params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)

K = jnp.asarray(data["Ks"][0]); W2C = jnp.asarray(data["W2Cs"][0])
base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K), C2W=jnp.linalg.inv(W2C),
              H=PATCH*2, W=PATCH*2)
cam = crop_camera(base, 64, 64, PATCH, PATCH)
gt = jnp.zeros((PATCH, PATCH, 3))
key = jax.random.PRNGKey(1)

trace_cfg = dc.replace(cfg.sdf, precision=cfg.trace_precision)
coarse_cfg = dc.replace(cfg.sdf, precision=cfg.coarse_trace_precision or "default")

from iron_tpu.kernels.fused_sdf import (make_pallas_sdf_only_bf16_fn,
                                        make_pallas_coarse_march_fn,
                                        pallas_available)
USE_PALLAS = pallas_available()

def fns(params):
    sdf_fn = lambda p: sdf_only(params["sdf"], p, cfg.sdf)
    sdf_all = lambda p: sdf_value_feat_grad(params["sdf"], p, cfg.sdf)
    t_fn = lambda p: sdf_only(params["sdf"], p, trace_cfg)
    t_all = lambda p: sdf_value_feat_grad(params["sdf"], p, trace_cfg)
    if USE_PALLAS:
        c_fn = make_pallas_sdf_only_bf16_fn(params["sdf"], cfg.sdf)
        m_fn = make_pallas_coarse_march_fn(
            params["sdf"], cfg.sdf,
            threshold=cfg.surface.tracer.coarse_threshold)
    else:
        c_fn = lambda p: sdf_only(params["sdf"], p, coarse_cfg)
        m_fn = None
    shade = lambda ro, rd, pts, nrm, ft: shade_points(
        cfg.renderer_name, params["materials"], mat_cfgs, ro, rd, pts, nrm, ft)
    return sdf_fn, sdf_all, t_fn, t_all, c_fn, shade, m_fn

def t_trace(params):
    s, _, t, _, c, _, m = fns(params)
    uv = pixel_grid(PATCH, PATCH)
    return raytrace_pixels(t, cam, uv, cfg=cfg.surface, coarse_sdf_fn=c,
                           coarse_march_fn=m)["distance"].sum()

def t_trace_nomarch(params):
    s, _, t, _, c, _, m = fns(params)
    uv = pixel_grid(PATCH, PATCH)
    return raytrace_pixels(t, cam, uv, cfg=cfg.surface,
                           coarse_sdf_fn=c)["distance"].sum()

def t_trace_nocoarse(params):
    s, _, t, _, _, _, m = fns(params)
    uv = pixel_grid(PATCH, PATCH)
    return raytrace_pixels(t, cam, uv, cfg=cfg.surface)["distance"].sum()

def t_render_noedge(params):
    s, sa, t, ta, c, sh, m = fns(params)
    c2 = dc.replace(cfg.surface, handle_edges=False)
    return render_camera(s, sa, sh, cam, c2, is_training=False,
                         trace_sdf_fn=t, trace_sdf_all_fn=ta,
                         coarse_sdf_fn=c, coarse_march_fn=m)["color"].sum()

def t_render_full(params):
    s, sa, t, ta, c, sh, m = fns(params)
    return render_camera(s, sa, sh, cam, cfg.surface, is_training=False,
                         trace_sdf_fn=t, trace_sdf_all_fn=ta,
                         coarse_sdf_fn=c, coarse_march_fn=m)["color"].sum()

def t_render_train(params):
    s, sa, t, ta, c, sh, m = fns(params)
    return render_camera(s, sa, sh, cam, cfg.surface, is_training=True,
                         trace_sdf_fn=t, trace_sdf_all_fn=ta,
                         coarse_sdf_fn=c, coarse_march_fn=m)["color"].sum()

def t_loss(params):
    return stage2_loss(params, mat_cfgs, cfg, cam, gt, key)[0]

def t_grad(params):
    return jax.grad(lambda p: stage2_loss(p, mat_cfgs, cfg, cam, gt, key)[0])(params)["sdf"]["layers"][0]["g"].sum()

def bench(name, fn):
    f = jax.jit(fn)
    r = f(params); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(params)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(json.dumps({"part": name, "ms": round(best*1e3, 2)}), flush=True)

bench("trace_only_coarse", t_trace)
bench("trace_only_nomarch", t_trace_nomarch)
bench("trace_only_nocoarse", t_trace_nocoarse)
bench("render_noedge_fwd", t_render_noedge)
bench("render_full_fwd", t_render_full)
bench("render_full_train_fwd", t_render_train)
bench("loss_fwd", t_loss)
bench("loss_grad", t_grad)
