"""Measured same-host throughput ratio vs the torch reference (CPU/CPU).

BASELINE.md's A100 reference rate is unavailable in this environment, so
bench.py's `vs_baseline` divides by an engineering estimate.  This script
produces a MEASURED ratio on identical hardware (this host's CPU), same
weights, same camera, same workload: one `render_camera` forward+backward
(trace + shade + pixel-gradient) per step for (a) the torch reference
pipeline and (b) iron_tpu on the CPU backend.  CPU-vs-CPU is not
TPU-vs-A100, but it is a measured apples-to-apples pipeline comparison
with zero estimates in it.

Needs /root/reference mounted.  Run quiesced.
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import test_e2e_parity as T  # reuse the oracle-parity harness helpers

H = W = 64
ITERS = 6


def main():
    torch = T._import_reference_cpu()
    torch.set_num_threads(os.cpu_count())
    from models.raytracer import RayTracer, Camera, render_camera as ref_render_camera
    from oracle import sdf_params_from_torch

    focal = 70.0
    K = np.array([[focal, 0, W / 2, 0], [0, focal, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    W2C = T._lookat_W2C((0.3, 0.4, 2.6))
    sdf_net = T._torch_sdf_net(torch)
    nets, renderer = T._reference_ggx_setup(torch)
    render_fn = T._reference_render_fn(torch, renderer)
    cam_t = Camera(W=W, H=H, K=torch.from_numpy(K), W2C=torch.from_numpy(W2C))
    tracer = RayTracer()
    wpix = torch.from_numpy(np.random.default_rng(0).normal(
        size=(H, W, 3)).astype(np.float32))

    def torch_step():
        res = ref_render_camera(cam_t, sdf_net, tracer, nets, render_fn,
                                fill_holes=False, handle_edges=False,
                                is_training=True)
        loss = (res["color"].reshape(H, W, 3) * wpix).sum()
        sdf_net.zero_grad()
        for n in nets.values():
            n.zero_grad()
        loss.backward()
        return float(loss)

    torch_step()  # warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        torch_step()
    ref_s = (time.perf_counter() - t0) / ITERS

    # ---- ours (CPU backend, same weights) ----
    from iron_tpu.fields.sdf import SDFConfig, sdf_only, sdf_value_feat_grad
    from iron_tpu.core.camera import make_camera
    from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
    from iron_tpu.surface.tracer import TracerConfig
    from iron_tpu.shading.materials import renderer_network_configs, shade_points

    sdf_cfg = SDFConfig()
    mat_cfgs = renderer_network_configs("ggx")
    params = {"sdf": jax.tree_util.tree_map(jnp.asarray, sdf_params_from_torch(sdf_net)),
              "materials": jax.tree_util.tree_map(
                  jnp.asarray, T._ours_material_params_from_torch(nets))}
    cfg = SurfaceRenderConfig(fill_holes=False, handle_edges=False,
                              tracer=TracerConfig(fallback_budget=None))
    cam = make_camera(K, W2C, H, W)
    wj = jnp.asarray(np.asarray(wpix))

    def loss_fn(params):
        sdf_fn = lambda p: sdf_only(params["sdf"], p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params["sdf"], p, sdf_cfg)
        shade_fn = lambda ro, rd, pts, nrm, feat: shade_points(
            "ggx", params["materials"], mat_cfgs, ro, rd, pts, nrm, feat)
        r = render_camera(sdf_fn, sdf_all_fn, shade_fn, cam, cfg,
                          is_training=True)
        return jnp.sum(r["color"].reshape(H, W, 3) * wj)

    step = jax.jit(jax.value_and_grad(loss_fn))
    jax.block_until_ready(step(params))  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(step(params))
    ours_s = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "workload": f"render_camera {H}x{W} fwd+bwd, ggx, edges off, same weights",
        "reference_torch_cpu_s_per_step": round(ref_s, 3),
        "iron_tpu_cpu_s_per_step": round(ours_s, 3),
        "measured_speedup_same_host_cpu": round(ref_s / ours_s, 2),
        "rays_per_s_reference": round(H * W / ref_s, 1),
        "rays_per_s_ours_cpu": round(H * W / ours_s, 1),
    }))


if __name__ == "__main__":
    main()
