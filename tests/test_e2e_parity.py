"""END-TO-END parity vs the torch reference (VERDICT r4 missing #1).

The component oracle tests (test_fields/test_brdf/test_volume/...) pin
fields, BRDFs, sample_pdf and losses individually; these tests transplant
ONE set of weights and pin the two full pipelines against each other:

  * `NeuSRenderer.render` (reference models/renderer.py:346-453) vs our
    `neus_render` — rendered colors, compositing weights, in-graph
    normals, eikonal error, AND the parameter gradients of a scalar loss
    (the BASELINE quality gate: "images and pixel gradients allclose").
  * `render_camera` (reference models/raytracer.py:778-814) vs our
    surface pipeline — traced depth/normals/colors and the pixel-gradient
    path through reparam_points, ggx materials and the point light.

Documented deviations (by design, SURVEY §7.1 static-shape stance):
  * trace convergence: the reference sphere-traces 16 iters then densely
    samples + bisects the non-converged set with dynamic compaction; we
    run budgeted masked loops.  A handful of grazing pixels can converge
    on one side only, so image comparisons run on the intersection of the
    convergent masks and the masks themselves are compared by IoU.
  * edge sampling: the reference dedups walked edge points with a scatter
    `unique` trick and has no edge budget; our edge pipeline is
    budget-capped and sorted — edge-pixel parity is structural (coverage
    compared in test_edge_walk_training.py), not pixelwise, so edges are
    OFF here.
  * fill_holes uses kornia in the reference (stubbed out in this
    environment) — OFF here, pinned separately by our morphology tests.

Run only when the reference is mounted (ALL torch work on CPU).
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import has_reference

need_ref = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

from iron_tpu.fields.sdf import SDFConfig, sdf_value_feat_grad, sdf_only
from iron_tpu.fields.rendering import RenderingConfig, rendering_apply
from iron_tpu.fields.scalars import variance_apply
from iron_tpu.volume.integrator import NeuSRenderConfig, neus_render
from iron_tpu.core.camera import make_camera
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
from iron_tpu.surface.tracer import TracerConfig
from iron_tpu.shading.materials import (renderer_network_configs, shade_points,
                                        init_material_networks)


def _import_reference_cpu():
    """Import the reference with .cuda() neutralized (CPU oracle runs)."""
    from oracle import import_reference
    import_reference()
    import torch
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    return torch


def _lookat_W2C(origin, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    o = np.asarray(origin, np.float64)
    fwd = np.asarray(target, np.float64) - o
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    dwn = np.cross(fwd, right)
    C2W = np.eye(4)
    C2W[:3, 0], C2W[:3, 1], C2W[:3, 2], C2W[:3, 3] = right, dwn, fwd, o
    return np.linalg.inv(C2W).astype(np.float32)


def _torch_sdf_net(torch, seed=0):
    from models.fields import SDFNetwork
    torch.manual_seed(seed)
    return SDFNetwork(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                      skip_in=[4], multires=6, bias=0.5, scale=1.0,
                      geometric_init=True, weight_norm=True)


def _grads_to_ours(lin, weight_norm=True):
    """Map a torch Linear's .grad tensors through the same transpose map
    as the weights (tests/oracle.py torch_linear_to_ours)."""
    if weight_norm and hasattr(lin, "weight_v"):
        return {"v": lin.weight_v.grad.detach().numpy().T.copy(),
                "g": lin.weight_g.grad.detach().numpy()[:, 0].copy(),
                "b": lin.bias.grad.detach().numpy().copy()}
    return {"w": lin.weight.grad.detach().numpy().T.copy(),
            "b": lin.bias.grad.detach().numpy().copy()}


def _mlp_grads_from_torch(net):
    layers, l = [], 0
    while hasattr(net, f"lin{l}"):
        layers.append(_grads_to_ours(getattr(net, f"lin{l}")))
        l += 1
    return {"layers": layers}


def _assert_tree_close(ours, ref, rel=2e-2, name=""):
    """Per-tensor relative Frobenius error + overall cosine similarity."""
    o_leaves, treedef = jax.tree_util.tree_flatten(ours)
    r_leaves = jax.tree_util.tree_flatten(ref)[0]
    assert len(o_leaves) == len(r_leaves)
    dots = na = nb = 0.0
    for i, (a, b) in enumerate(zip(o_leaves, r_leaves)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(b)
        if denom > 1e-8:
            err = np.linalg.norm(a - b) / denom
            assert err < rel, f"{name} leaf {i}: rel err {err:.3e} (>{rel})"
        dots += float(np.sum(a * b))
        na += float(np.sum(a * a))
        nb += float(np.sum(b * b))
    cos = dots / max(np.sqrt(na * nb), 1e-30)
    assert cos > 1.0 - 1e-4, f"{name}: cosine {cos}"


# ---------------------------------------------------------------------------
# 1. Full NeuSRenderer.render (renderer.py:346-453)
# ---------------------------------------------------------------------------

@need_ref
def test_neus_render_full_parity_with_reference():
    torch = _import_reference_cpu()
    from models.fields import RenderingNetwork, SingleVarianceNetwork
    from models.renderer import NeuSRenderer
    from oracle import sdf_params_from_torch, rendering_params_from_torch

    sdf_net = _torch_sdf_net(torch)
    torch.manual_seed(1)
    color_net = RenderingNetwork(d_feature=256, mode="idr", d_in=9, d_out=3,
                                 d_hidden=256, n_layers=4, weight_norm=True,
                                 multires_view=4, squeeze_out=True)
    dev_net = SingleVarianceNetwork(init_val=0.3)
    renderer = NeuSRenderer(nerf=None, sdf_network=sdf_net,
                            deviation_network=dev_net, color_network=color_net,
                            n_samples=32, n_importance=32, n_outside=0,
                            up_sample_steps=4, perturb=0.0)

    B = 24
    rng = np.random.default_rng(0)
    origins = rng.normal(size=(B, 3)).astype(np.float32)
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * 2.5
    jitter = rng.normal(size=(B, 3)).astype(np.float32) * 0.15
    dirs = -origins + jitter
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(np.float32)
    dist = np.linalg.norm(origins, axis=-1, keepdims=True)
    near = (dist - 1.0).astype(np.float32)
    far = (dist + 1.0).astype(np.float32)
    cos_anneal = 0.7

    # ---- torch forward + backward ----
    to = torch.from_numpy(origins)
    td = torch.from_numpy(dirs)
    ret = renderer.render(to, td, torch.from_numpy(near), torch.from_numpy(far),
                          perturb_overwrite=0, cos_anneal_ratio=cos_anneal)
    w_fix = torch.from_numpy(rng.normal(size=(B, 3)).astype(np.float32))
    loss_t = (ret["color_fine"] * w_fix).sum() + 0.1 * ret["gradient_error"]
    loss_t.backward()

    # ---- ours ----
    sdf_cfg = SDFConfig()
    col_cfg = RenderingConfig(mode="idr", d_in=9, d_out=3, multires_view=4,
                              squeeze_out=True)
    render_cfg = NeuSRenderConfig(n_samples=32, n_importance=32, n_outside=0,
                                  up_sample_steps=4, perturb=0.0)
    params = {"sdf": sdf_params_from_torch(sdf_net),
              "color": rendering_params_from_torch(color_net),
              "variance": {"variance": jnp.asarray(
                  dev_net.variance.detach().numpy())}}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def run(params):
        sdf_fn = lambda p: sdf_only(params["sdf"], p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params["sdf"], p, sdf_cfg)
        color_fn = lambda pts, grads, d, feat: rendering_apply(
            params["color"], col_cfg, pts, grads, d, feat)
        return neus_render(jnp.asarray(origins), jnp.asarray(dirs),
                           jnp.asarray(near), jnp.asarray(far),
                           sdf_fn=sdf_fn, sdf_all_fn=sdf_all_fn,
                           color_fn=color_fn,
                           inv_s=variance_apply(params["variance"]),
                           cfg=render_cfg, cos_anneal_ratio=cos_anneal,
                           perturb_overwrite=0.0)

    ours = run(params)

    # forward parity: image-forming outputs + internals
    np.testing.assert_allclose(np.asarray(ours["color_fine"]),
                               ret["color_fine"].detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["weight_sum"]),
                               ret["weight_sum"].detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["weight_max"]),
                               ret["weight_max"].detach().numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["gradients"]),
                               ret["gradients"].detach().numpy().reshape(
                                   np.asarray(ours["gradients"]).shape),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(ours["gradient_error"]),
                               float(ret["gradient_error"]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(ours["s_val"].mean()),
                               float(ret["s_val"].mean()),
                               atol=1e-6, rtol=1e-5)

    # parameter-gradient parity of the same scalar loss (pixel gradients
    # all the way to every trainable tensor)
    def loss_fn(params):
        r = run(params)
        return jnp.sum(r["color_fine"] * jnp.asarray(w_fix.numpy())) \
            + 0.1 * r["gradient_error"]

    grads = jax.grad(loss_fn)(params)
    ref_grads = {"sdf": _mlp_grads_from_torch(sdf_net),
                 "color": _mlp_grads_from_torch(color_net),
                 "variance": {"variance": dev_net.variance.grad.detach().numpy()}}
    _assert_tree_close(grads["sdf"], ref_grads["sdf"], rel=2e-2, name="sdf")
    _assert_tree_close(grads["color"], ref_grads["color"], rel=2e-2, name="color")
    _assert_tree_close(grads["variance"], ref_grads["variance"], rel=2e-2,
                       name="variance")


# ---------------------------------------------------------------------------
# 2. Full render_camera (raytracer.py:778-814), ggx flavor, trace+shade
# ---------------------------------------------------------------------------

def _reference_ggx_setup(torch, seed=0):
    """Reference nets for the ggx flavor, on CPU, with transplantable
    weights (mirrors init_rendering_network_dict('ggx'),
    network_conf.py:48-122 — constructed here because those factories
    hard-code .cuda())."""
    from models.fields import RenderingNetwork
    from models.network_conf import PointLightNetwork
    from models.renderer_ggx import GGXColocatedRenderer

    torch.manual_seed(seed + 10)
    nets = {
        "diffuse_albedo_network": RenderingNetwork(
            d_in=9, d_out=3, d_feature=256, d_hidden=256, n_layers=4,
            multires_view=4, mode="idr", squeeze_out=True),
        "specular_albedo_network": RenderingNetwork(
            d_in=6, d_out=3, d_feature=256, d_hidden=256, n_layers=4,
            multires=6, multires_view=-1, mode="no_view_dir",
            squeeze_out=False, output_bias=0.4, output_scale=0.1),
        "specular_roughness_network": RenderingNetwork(
            d_in=6, d_out=1, d_feature=256, d_hidden=256, n_layers=4,
            multires=6, multires_view=-1, mode="no_view_dir",
            squeeze_out=False, output_bias=0.1, output_scale=0.1),
        "point_light_network": PointLightNetwork(),
    }
    nets["point_light_network"].set_light(40.0)
    return nets, GGXColocatedRenderer(use_cuda=False)


def _reference_render_fn(torch, renderer):
    """Assemble the reference's stage-2 ggx shading closure
    (render_surface.py:117-157 semantics: compact to the interior mask,
    query get_materials, run the co-located GGX renderer, scatter back)."""
    from models.rendering_func import get_materials

    def render_fn(interior_mask, color_network_dict, ray_o, ray_d, points,
                  normals, features):
        sh = list(interior_mask.shape)
        rgb = torch.zeros(sh + [3], dtype=torch.float32)
        diffuse = rgb.clone()
        specular = rgb.clone()
        normals_pad = rgb.clone()
        roughness = rgb[..., 0].clone()
        if interior_mask.any():
            normals = normals / (normals.norm(dim=-1, keepdim=True) + 1e-10)
            params = get_materials(network_dict=color_network_dict,
                                   points=points, normals=normals,
                                   features=features)
            results = renderer(color_network_dict["point_light_network"](),
                               (points - ray_o).norm(dim=-1, keepdim=True),
                               normals, -ray_d, params=params)
            rgb[interior_mask] = results["rgb"]
            diffuse[interior_mask] = results["diffuse_rgb"]
            specular[interior_mask] = results["specular_rgb"]
            roughness[interior_mask] = params["specular_roughness"].squeeze(-1)
            normals_pad[interior_mask] = normals
        return {"color": rgb, "diffuse_color": diffuse,
                "specular_color": specular, "specular_roughness": roughness,
                "normal": normals_pad}

    return render_fn


def _ours_material_params_from_torch(nets):
    from oracle import rendering_params_from_torch
    params = {name: rendering_params_from_torch(net)
              for name, net in nets.items() if name != "point_light_network"}
    params["point_light_network"] = {
        "light": jnp.asarray(nets["point_light_network"].light.detach().numpy())}
    return params


@need_ref
@pytest.mark.slow
def test_render_camera_full_parity_with_reference():
    torch = _import_reference_cpu()
    from models.raytracer import RayTracer, Camera, render_camera as ref_render_camera
    from models.renderer_ggx import GGXColocatedRenderer
    from oracle import sdf_params_from_torch

    H = W = 48
    focal = 55.0
    K = np.array([[focal, 0, W / 2.0, 0], [0, focal, H / 2.0, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    W2C = _lookat_W2C((0.3, 0.4, 2.6))

    sdf_net = _torch_sdf_net(torch)   # geometric init = near-exact sphere SDF
    nets, renderer = _reference_ggx_setup(torch)
    render_fn = _reference_render_fn(torch, renderer)

    cam_t = Camera(W=W, H=H, K=torch.from_numpy(K), W2C=torch.from_numpy(W2C))
    results = ref_render_camera(cam_t, sdf_net, RayTracer(), nets, render_fn,
                                fill_holes=False, handle_edges=False,
                                is_training=True)

    # ---- ours, transplanted weights ----
    sdf_cfg = SDFConfig()
    mat_cfgs = renderer_network_configs("ggx")
    sdf_params = jax.tree_util.tree_map(jnp.asarray, sdf_params_from_torch(sdf_net))
    mat_params = jax.tree_util.tree_map(jnp.asarray,
                                        _ours_material_params_from_torch(nets))
    cfg = SurfaceRenderConfig(
        fill_holes=False, handle_edges=False, interior_budget=None,
        tracer=TracerConfig(fallback_budget=None))
    cam = make_camera(K, W2C, H, W)

    def render(params):
        sdf_fn = lambda p: sdf_only(params["sdf"], p, sdf_cfg)
        sdf_all_fn = lambda p: sdf_value_feat_grad(params["sdf"], p, sdf_cfg)
        shade_fn = lambda ro, rd, pts, nrm, feat: shade_points(
            "ggx", params["materials"], mat_cfgs, ro, rd, pts, nrm, feat)
        return render_camera(sdf_fn, sdf_all_fn, shade_fn, cam, cfg,
                             is_training=True)

    ours = render({"sdf": sdf_params, "materials": mat_params})

    ref_mask = results["convergent_mask"].detach().numpy().reshape(H, W)
    our_mask = np.asarray(ours["convergent_mask"]).reshape(H, W)
    inter = ref_mask & our_mask
    union = ref_mask | our_mask
    iou = inter.sum() / max(union.sum(), 1)
    assert iou > 0.98, f"convergent-mask IoU {iou}"
    assert inter.sum() > 100  # the sphere actually covers pixels

    ref_depth = results["depth"].detach().numpy().reshape(H, W)
    our_depth = np.asarray(ours["depth"]).reshape(H, W)
    np.testing.assert_allclose(our_depth[inter], ref_depth[inter],
                               atol=5e-4, rtol=1e-4)

    # Both tracers stop anywhere inside the |f|<=5e-5 band, so roots can
    # legitimately land up to a few 1e-4 apart on grazing pixels (budgeted
    # masked loops vs compaction+bisection — the documented deviation),
    # moving shading by up to ~1e-2 there.  Strict comparison runs on the
    # identical-root pixels (the majority: measured ~75%); the tail is
    # bounded loosely over the whole common mask.
    common = inter & (np.abs(ref_depth - our_depth) < 1e-5)
    assert common.sum() >= 0.6 * inter.sum(), \
        f"same-root pixels {common.sum()}/{inter.sum()}"

    ref_color = results["color"].detach().numpy().reshape(H, W, 3)
    our_color = np.asarray(ours["color"]).reshape(H, W, 3)
    np.testing.assert_allclose(our_color[common], ref_color[common],
                               atol=2e-3, rtol=1e-3)
    tail = np.abs(our_color - ref_color).max(-1)[inter]
    assert float((tail > 2e-2).mean()) < 0.005, \
        f"{(tail > 2e-2).mean():.4f} of common pixels off by >2e-2"

    ref_normal = results["normal"].detach().numpy().reshape(H, W, 3)
    our_normal = np.asarray(ours["normal"]).reshape(H, W, 3)
    np.testing.assert_allclose(our_normal[common], ref_normal[common],
                               atol=2e-3, rtol=1e-3)

    # ---- pixel-gradient parity: same fixed-weight scalar over the common
    # mask, backward through reparam + materials + light ----
    wpix = np.random.default_rng(3).normal(
        size=(H, W, 3)).astype(np.float32) * common[..., None]
    loss_t = (results["color"].reshape(H, W, 3) * torch.from_numpy(wpix)).sum()
    loss_t.backward()

    def loss_fn(params):
        r = render(params)
        return jnp.sum(r["color"].reshape(H, W, 3) * jnp.asarray(wpix))

    grads = jax.grad(loss_fn)({"sdf": sdf_params, "materials": mat_params})

    _assert_tree_close(grads["sdf"], _mlp_grads_from_torch(sdf_net),
                       rel=3e-2, name="sdf")
    for name in ("diffuse_albedo_network", "specular_albedo_network",
                 "specular_roughness_network"):
        _assert_tree_close(grads["materials"][name],
                           _mlp_grads_from_torch(nets[name]),
                           rel=3e-2, name=name)
    light_ref = float(nets["point_light_network"].light.grad)
    light_ours = float(grads["materials"]["point_light_network"]["light"])
    np.testing.assert_allclose(light_ours, light_ref, rtol=1e-3)
