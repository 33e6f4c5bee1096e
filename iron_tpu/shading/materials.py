"""Material-network registry: per-renderer-flavor network architectures,
initialization, and material queries.

Replaces the reference's hard-coded dicts in `models/network_conf.py`
(init_rendering_network_dict, 47-704; choose_optmizer, 707-745;
choose_renderer, 748-764) and the query functions in
`models/rendering_func.py:5-63`.

Flavors:
  * "ggx"   — 5 nets: color / diffuse_albedo / specular_albedo /
              specular_roughness / point_light (network_conf.py:48-122);
  * "multi" — ggx nets + 4-way material_network (network_conf.py:123-188);
  * "comp"  — the fork's main composite stage-2 set, 11 nets incl.
              metallic/dielectric weights + etas + env light
              (network_conf.py:188-317, 'comp2_ori');
  * "comp2" — variant with scale-0.1 heads (network_conf.py:318-479).

Learning-rate policy (network_conf.py:707-745): every material net 1e-4,
point light 1e-2 (sdf 1e-5 is handled by the stage-2 trainer).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from iron_tpu.fields.rendering import RenderingConfig, init_rendering, rendering_apply
from iron_tpu.fields.scalars import init_point_light, point_light_apply
from iron_tpu.shading import brdf


def _rn(d_in, d_out, n_layers=4, mode="idr", multires=0, multires_view=0,
        squeeze_out=True, output_bias=0.0, output_scale=1.0, skip_in=()):
    return RenderingConfig(d_feature=256, mode=mode, d_in=d_in, d_out=d_out,
                           d_hidden=256, n_layers=n_layers, multires=multires,
                           multires_view=multires_view, squeeze_out=squeeze_out,
                           output_bias=output_bias, output_scale=output_scale,
                           skip_in=skip_in)

_COLOR = _rn(9, 3, 4, "idr", 0, 4, True)
_SCALAR_HEAD = dict(n_layers=4, mode="no_view_dir", multires=6, squeeze_out=False)


def renderer_network_configs(renderer_name: str,
                             d_feature: int = 256) -> Dict[str, RenderingConfig]:
    """Per-flavor material-net architectures.  `d_feature` is the SDF
    feature width the nets consume (d_out - 1 of the SDF network); the
    reference hard-codes 256 (network_conf.py:48-479)."""
    cfgs = _base_configs(renderer_name)
    if d_feature != 256:
        import dataclasses
        cfgs = {k: dataclasses.replace(v, d_feature=d_feature)
                for k, v in cfgs.items()}
    return cfgs


def _base_configs(renderer_name: str) -> Dict[str, RenderingConfig]:
    if renderer_name == "ggx":
        return {
            "color_network": _COLOR,
            "diffuse_albedo_network": _rn(9, 3, 4, "idr", 0, 4, True),
            "specular_albedo_network": _rn(6, 3, output_bias=0.4, output_scale=0.1, **_SCALAR_HEAD),
            "specular_roughness_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
        }
    if renderer_name == "multi":
        return {
            "color_network": _COLOR,
            "diffuse_albedo_network": _rn(9, 3, 8, "idr", 10, 4, True, skip_in=(4,)),
            "specular_albedo_network": _rn(6, 3, output_bias=0.4, output_scale=0.1, **_SCALAR_HEAD),
            "specular_roughness_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
            "material_network": _rn(3, 4, 4, "points_only", 6, 0, False, 0.1, 0.1),
        }
    if renderer_name == "comp":  # comp2_ori layout (network_conf.py:188-317)
        return {
            "color_network": _COLOR,
            "diffuse_albedo_network": _rn(9, 3, 8, "idr", 10, 4, True, skip_in=(4,)),
            "specular_albedo_network": _rn(6, 3, output_bias=0.0, output_scale=1.0, **_SCALAR_HEAD),
            "specular_roughness_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
            "env_light_network": _rn(3, 1, 4, "points_only", 6, 0, False, 0.0, 1.0),
            "metallic_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
            "dielectric_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
            "metallic_eta_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
            "metallic_k_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
            "dielectric_eta_network": _rn(6, 1, output_bias=0.1, output_scale=1.0, **_SCALAR_HEAD),
        }
    if renderer_name == "disney":
        # Disney-principled flavor composing the reference's latent helpers
        # (renderer_ggx.py:607-779) into a runnable co-located renderer
        # (shading/disney.py): ggx-style heads + metallic/spec_tint/
        # clearcoat scalar heads.
        return {
            "color_network": _COLOR,
            "diffuse_albedo_network": _rn(9, 3, 4, "idr", 0, 4, True),
            "specular_albedo_network": _rn(6, 3, output_bias=0.4, output_scale=0.1, **_SCALAR_HEAD),
            "specular_roughness_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
            "metallic_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
            "spec_tint_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
            "clearcoat_network": _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD),
        }
    if renderer_name == "comp2":  # network_conf.py:318-479
        cfg = renderer_network_configs("comp")
        cfg["diffuse_albedo_network"] = _rn(9, 3, 4, "idr", 0, 4, True)
        for k in ["specular_roughness_network", "metallic_network", "dielectric_network",
                  "metallic_eta_network", "metallic_k_network", "dielectric_eta_network"]:
            cfg[k] = _rn(6, 1, output_bias=0.1, output_scale=0.1, **_SCALAR_HEAD)
        return cfg
    raise ValueError(f"unknown renderer flavor {renderer_name}")


def init_material_networks(key, renderer_name: str, d_feature: int = 256
                           ) -> Tuple[Dict, Dict[str, RenderingConfig]]:
    cfgs = renderer_network_configs(renderer_name, d_feature)
    keys = jax.random.split(key, len(cfgs))
    params = {name: init_rendering(k, cfg) for (name, cfg), k in zip(sorted(cfgs.items()), keys)}
    params["point_light_network"] = init_point_light()
    return params, cfgs


def material_lr_map(renderer_name: str) -> Dict[str, float]:
    cfgs = renderer_network_configs(renderer_name)
    lrs = {name: 1e-4 for name in cfgs}
    lrs["point_light_network"] = 1e-2
    return lrs


def _q(params, cfgs, name, points, normals, view_dirs, features):
    return rendering_apply(params[name], cfgs[name], points, normals, view_dirs, features)


def get_materials(params, cfgs, points, normals, features, is_metal: bool = False) -> Dict:
    """ggx-flavor query (rendering_func.py:5-16)."""
    diffuse = jnp.abs(_q(params, cfgs, "diffuse_albedo_network", points, normals, -normals, features))
    specular = jnp.abs(_q(params, cfgs, "specular_albedo_network", points, normals, None, features))
    if not is_metal:
        specular = jnp.broadcast_to(jnp.mean(specular, axis=-1, keepdims=True), specular.shape)
    roughness = jnp.abs(_q(params, cfgs, "specular_roughness_network", points, normals, None, features)) + 0.01
    return {"diffuse_albedo": diffuse, "specular_albedo": specular,
            "specular_roughness": roughness}


def get_materials_comp(params, cfgs, points, normals, features) -> Dict:
    """composite-flavor query, 9 heads (rendering_func.py:19-48)."""
    out = {"diffuse_albedo": jnp.abs(_q(params, cfgs, "diffuse_albedo_network", points, normals, -normals, features))}
    for key, net in [("specular_albedo", "specular_albedo_network"),
                     ("metallic", "metallic_network"),
                     ("specular_roughness", "specular_roughness_network"),
                     ("dielectric", "dielectric_network"),
                     ("metallic_eta", "metallic_eta_network"),
                     ("metallic_k", "metallic_k_network"),
                     ("dielectric_eta", "dielectric_eta_network")]:
        out[key] = jnp.abs(_q(params, cfgs, net, points, normals, None, features))
    return out


def get_materials_disney(params, cfgs, points, normals, features) -> Dict:
    """disney-flavor query: ggx materials + metallic/spec_tint/clearcoat."""
    out = get_materials(params, cfgs, points, normals, features)
    for key, net in [("metallic", "metallic_network"),
                     ("spec_tint", "spec_tint_network"),
                     ("clearcoat", "clearcoat_network")]:
        out[key] = jnp.clip(jnp.abs(_q(params, cfgs, net, points, normals,
                                       None, features)), 0.0, 1.0)
    return out


def get_materials_multi(params, cfgs, points, normals, features) -> Dict:
    """mixture-flavor query (rendering_func.py:50-63)."""
    diffuse = jnp.abs(_q(params, cfgs, "diffuse_albedo_network", points, normals, -normals, features))
    specular = jnp.abs(_q(params, cfgs, "specular_albedo_network", points, normals, None, features))
    roughness = jnp.abs(_q(params, cfgs, "specular_roughness_network", points, normals, None, features)) + 0.01
    mv = jnp.abs(_q(params, cfgs, "material_network", points, None, None, features))
    return {"diffuse_albedo": diffuse, "specular_albedo": specular,
            "specular_roughness": roughness, "material_vector": mv}


def shade_points(renderer_name: str, params, cfgs, ray_o, ray_d, points, normals,
                 features, is_metal: bool = False, use_env_light: bool = False) -> Dict:
    """Query materials + evaluate the flavor's BRDF for a full point tile.

    Mirrors render_fn / render_fn_comp (render_surface.py:117-234) but as a
    pure fixed-shape function; masking to the convergent set is done by the
    caller with jnp.where.
    """
    normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
    light = point_light_apply(params["point_light_network"])
    distance = jnp.linalg.norm(points - ray_o, axis=-1, keepdims=True)
    viewdir = -ray_d

    if renderer_name == "ggx":
        mats = get_materials(params, cfgs, points, normals, features, is_metal)
        res = brdf.ggx_colocated(light, distance, normals, viewdir, mats)
    elif renderer_name == "multi":
        mats = get_materials_multi(params, cfgs, points, normals, features)
        res = brdf.mixture_colocated(light, distance, normals, viewdir, mats)
    elif renderer_name == "disney":
        from iron_tpu.shading.disney import disney_principled_colocated
        mats = get_materials_disney(params, cfgs, points, normals, features)
        res = disney_principled_colocated(light, distance, normals, viewdir, mats)
    elif renderer_name in ("comp", "comp2"):
        mats = get_materials_comp(params, cfgs, points, normals, features)
        if use_env_light:
            mats = dict(mats)
            mats["env_light"] = jnp.abs(_q(params, cfgs, "env_light_network",
                                           points, None, None, features))
        res = brdf.composite_colocated(light, distance, normals, viewdir, mats,
                                       use_env_light=use_env_light)
    else:
        raise ValueError(renderer_name)

    out = {
        "color": res["rgb"],
        "diffuse_color": res["diffuse_rgb"],
        "specular_color": res["specular_rgb"],
        "normal": normals,
        "diffuse_albedo": mats["diffuse_albedo"],
        "specular_albedo": mats["specular_albedo"],
        "specular_roughness": mats["specular_roughness"][..., 0],
    }
    if renderer_name == "disney":
        out.update({
            "metallic": mats["metallic"][..., 0],
            "spec_tint": mats["spec_tint"][..., 0],
            "clearcoat": mats["clearcoat"][..., 0],
            "clearcoat_rgb": res["clearcoat_rgb"],
        })
    if renderer_name in ("comp", "comp2"):
        out.update({
            "metallic_rgb": res["metallic_rgb"],
            "dielectric_rgb": res["dielectric_rgb"],
            "metallic": mats["metallic"][..., 0],
            "dielectric": mats["dielectric"][..., 0],
            "metallic_eta": mats["metallic_eta"][..., 0],
            "metallic_k": mats["metallic_k"][..., 0],
            "dielectric_eta": mats["dielectric_eta"][..., 0],
        })
    if renderer_name == "multi":
        out["material_vector"] = mats["material_vector"]
    return out
