"""Co-located camera+flash BRDF family.

All renderers take (light, distance, normal, viewdir, params) with normal
and viewdir pointing away from the surface; in the co-located setting
<n,v> = <n,l> = <n,h>, so each BRDF reduces to a function of one cosine.
Every function returns {"diffuse_rgb", "specular_rgb", "rgb", ...}.

Behavioral specs (reference `models/renderer_ggx.py`):
  * ggx_colocated (61-146): Mitsuba roughplastic, const F=0.03867, GGX D,
    smithG1^2 G, table-based diffuse transmission (eta=1.48958738);
  * rough_plastic_colocated (435-517): same with exact dielectric Fresnel;
  * smooth_dielectric (149-204): constant F=0.04 mirror term;
  * thin_dielectric (207-267): R += T^2 R / (1 - R^2);
  * smooth/rough_conductor_colocated (270-395): exact conductor Fresnel,
    default Al @ 850nm (eta=2.58, k=8.21); Cu/Au values below;
  * mixture_colocated (31-58): 4-way per-point blend by material_vector;
  * composite_colocated (520-858): the fork's main stage-2 model —
    metallic conductor Fresnel + dielectric F*D*G/(4|cos|) specular lobes
    (learnable per-point eta/k), GGX-table diffuse, optional per-point
    env light.  NOTE the reference's forward() calls
    calc_D_specular(cos, eta) — i.e. evaluates the NDF with alpha := eta
    (renderer_ggx.py:806).  We reproduce that behavior by default
    (`d_from_eta=True`) for parity and expose the corrected form.

Clamp constants are load-bearing (renderer_ggx.py:98 "must be very
precise") and copied exactly.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from iron_tpu.shading.fresnel import smith_g1, ggx_ndf, fresnel_dielectric, fresnel_conductor_exact
from iron_tpu.shading.tables import lookup_T12, lookup_Fdr

# conductor IOR at 850 nm (renderer_ggx.py:277-280); replaces the missing
# ./resource/ior/*.spd data dependency of the reference.
CONDUCTOR_IOR_850NM = {
    "Cu": (0.280000, 5.485625),
    "Au": (0.198125, 5.631250),
    "Al": (2.580000, 8.210000),
}

_PLASTIC_ETA = 1.48958738  # IOR['polypropylene'] / IOR['air']


def _cos(normal, viewdir):
    dot = jnp.sum(viewdir * normal, axis=-1, keepdims=True)
    return jnp.clip(dot, 0.00001, 0.99999)  # must be very precise; cannot be 0.999


def _light_falloff(light, distance):
    return light / (distance * distance + 1e-10)


def _table_diffuse(light_intensity, dot, alpha, diffuse_albedo, eta=_PLASTIC_ETA):
    """Roughplastic internal-scattering diffuse term (renderer_ggx.py:120-144)."""
    T12 = lookup_T12(dot, alpha)
    T21 = T12  # co-located
    Fdr = lookup_Fdr(alpha)
    inv_eta2 = 1.0 / (eta * eta)
    return (light_intensity * (diffuse_albedo / (1.0 - Fdr + 1e-10) / np.pi)
            * dot * T12 * T21 * inv_eta2)


def ggx_colocated(light, distance, normal, viewdir, params: Dict) -> Dict:
    """Const-Fresnel roughplastic (renderer_ggx.py:61-146)."""
    diffuse_albedo = params["diffuse_albedo"]
    specular_albedo = params["specular_albedo"]
    alpha = jnp.clip(params["specular_roughness"], 0.0001)
    li = _light_falloff(light, distance)
    dot = _cos(normal, viewdir)

    D = ggx_ndf(dot, alpha)
    F = 0.03867
    G = smith_g1(dot, alpha) ** 2
    specular_rgb = li * specular_albedo * F * D * G / (4.0 * dot + 1e-10)
    diffuse_rgb = _table_diffuse(li, dot, alpha, diffuse_albedo)
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def rough_plastic_colocated(light, distance, normal, viewdir, params: Dict) -> Dict:
    """Exact-Fresnel roughplastic (renderer_ggx.py:435-517)."""
    diffuse_albedo = params["diffuse_albedo"]
    specular_albedo = params["specular_albedo"]
    alpha = jnp.clip(params["specular_roughness"], 0.0001)
    li = _light_falloff(light, distance)
    dot = _cos(normal, viewdir)

    D = ggx_ndf(dot, alpha)
    F = fresnel_dielectric(dot, _PLASTIC_ETA)
    G = smith_g1(dot, alpha) ** 2
    specular_rgb = li * specular_albedo * F * D * G / (4.0 * dot + 1e-10)
    diffuse_rgb = _table_diffuse(li, dot, alpha, diffuse_albedo)
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def smooth_dielectric(light, distance, normal, viewdir, params: Dict) -> Dict:
    """Constant-F mirror dielectric (renderer_ggx.py:149-204)."""
    li = _light_falloff(light, distance)
    specular_rgb = li * params["specular_albedo"] * 0.04
    diffuse_rgb = li * params["diffuse_albedo"] * 0.0001
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def thin_dielectric(light, distance, normal, viewdir, params: Dict) -> Dict:
    """Thin-slab dielectric: R' = R + T^2 R/(1-R^2) (renderer_ggx.py:207-267)."""
    li = _light_falloff(light, distance)
    R = 0.04
    T = 1 - R
    R = R + T * T * R / (1 - R * R)
    specular_rgb = li * params["specular_albedo"] * R
    diffuse_rgb = li * params["diffuse_albedo"] * 0.0001
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def smooth_conductor_colocated(light, distance, normal, viewdir, params: Dict,
                               eta: float = 2.58, k: float = 8.21) -> Dict:
    """Smooth conductor mirror (renderer_ggx.py:270-319)."""
    li = _light_falloff(light, distance)
    dot = _cos(normal, viewdir)
    F = fresnel_conductor_exact(dot, eta, k)
    specular_rgb = li * params["specular_albedo"] * F
    diffuse_rgb = li * params["diffuse_albedo"] * 0.0001
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def rough_conductor_colocated(light, distance, normal, viewdir, params: Dict,
                              eta: float = 2.58, k: float = 8.21) -> Dict:
    """Rough conductor (renderer_ggx.py:322-395)."""
    alpha = jnp.clip(params["specular_roughness"], 0.0001)
    li = _light_falloff(light, distance)
    dot = _cos(normal, viewdir)
    D = ggx_ndf(dot, alpha)
    F = fresnel_conductor_exact(dot, eta, k)
    G = smith_g1(dot, alpha) ** 2
    specular_rgb = li * params["specular_albedo"] * F * D * G / (4.0 * dot + 1e-10)
    diffuse_rgb = li * params["diffuse_albedo"] * 0.0001
    return {"diffuse_rgb": diffuse_rgb, "specular_rgb": specular_rgb,
            "rgb": diffuse_rgb + specular_rgb}


def mixture_colocated(light, distance, normal, viewdir, params: Dict) -> Dict:
    """4-way per-point blend by material_vector (renderer_ggx.py:31-58).

    Order: [rough_plastic, smooth_dielectric, rough_conductor, smooth_conductor].
    """
    mv = params["material_vector"]
    parts = [
        rough_plastic_colocated(light, distance, normal, viewdir, params),
        smooth_dielectric(light, distance, normal, viewdir, params),
        rough_conductor_colocated(light, distance, normal, viewdir, params),
        smooth_conductor_colocated(light, distance, normal, viewdir, params),
    ]
    diffuse = sum(mv[..., i:i + 1] * p["diffuse_rgb"] for i, p in enumerate(parts))
    specular = sum(mv[..., i:i + 1] * p["specular_rgb"] for i, p in enumerate(parts))
    return {"diffuse_rgb": diffuse, "specular_rgb": specular,
            "rgb": diffuse + specular, "material_map": mv}


def composite_colocated(light, distance, normal, viewdir, params: Dict,
                        use_env_light: bool = False,
                        d_from_eta: bool = True) -> Dict:
    """Composite metallic+dielectric model (renderer_ggx.py:781-858).

    Param clamps copied from renderer_ggx.py:790-799.  `d_from_eta=True`
    reproduces the reference's NDF-at-eta quirk (renderer_ggx.py:806);
    set False for the physically-intended NDF-at-roughness.

    NOTE on reference parity: renderer_ggx.py:844-849 does
    ``rgb = diffuse_rgb; rgb += main_specular_rgb`` — the in-place add
    aliases the returned "diffuse_rgb" buffer, so the reference *reports*
    diffuse+specular under both keys.  We return the true diffuse; the
    composited "rgb" is identical either way.
    """
    roughness = jnp.clip(params["specular_roughness"], 0.00001)
    dielectric_eta = jnp.clip(params["dielectric_eta"], 1.000001, 1.999999)
    metallic_eta = jnp.clip(params["metallic_eta"], 0.099999, 4.999999)
    metallic_k = jnp.clip(params["metallic_k"], 0.099999, 9.999999)
    specular_albedo = jnp.clip(params["specular_albedo"], 0.00001)
    diffuse_albedo = jnp.clip(params["diffuse_albedo"], 0.00001)

    cos_i = _cos(normal, viewdir)
    d_alpha = jnp.full_like(cos_i, _PLASTIC_ETA) if d_from_eta else roughness
    D = ggx_ndf(cos_i, d_alpha)
    G = smith_g1(cos_i, roughness) * smith_g1(cos_i, roughness)

    if use_env_light:
        li = jnp.clip(params["env_light"], 0.000001, 20.0)
    else:
        li = _light_falloff(light, distance)

    F_metallic = fresnel_conductor_exact(cos_i, metallic_eta, metallic_k)
    F_dielectric = fresnel_dielectric(cos_i, dielectric_eta)

    main_metallic_rgb = li * specular_albedo * F_metallic
    main_dielectric_rgb = li * specular_albedo * F_dielectric * D * G / (4.0 * jnp.abs(cos_i))
    # reference sums the two lobes unweighted (renderer_ggx.py:831)
    main_specular_rgb = main_dielectric_rgb + main_metallic_rgb

    diffuse_rgb = _table_diffuse(li, cos_i, jnp.clip(roughness, 0.0001), diffuse_albedo)

    ret = {"diffuse_rgb": diffuse_rgb,
           "specular_rgb": main_specular_rgb,
           "metallic_rgb": main_metallic_rgb,
           "dielectric_rgb": main_dielectric_rgb,
           "rgb": diffuse_rgb + main_specular_rgb}
    if use_env_light:
        ret["env_light"] = li
    return ret
