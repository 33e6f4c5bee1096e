"""Disney-principled BRDF helpers (co-located specialization).

Behavioral spec from the reference's latent Disney helpers inside
CompositeRenderer (`models/renderer_ggx.py:607-779`: schlick_weight /
calc_schlick / schlick_R0_eta, principled_fresnel, clearcoat D/F/G,
retro-reflective Disney diffuse) — themselves ports of Mitsuba 3's
principled BSDF (principledhelpers.h).  The reference never calls them
from a forward path; here they are first-class and composed into a
runnable co-located renderer (`disney_principled_colocated`) registered as
renderer flavor "disney" (shading/materials.py registry).

All functions broadcast over leading dims; cos_theta is the single
co-located cosine (<n,v> = <n,l> = <n,h>).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from iron_tpu.shading.fresnel import smith_g1, ggx_ndf, fresnel_dielectric
from iron_tpu.shading.brdf import _cos, _light_falloff, _table_diffuse


def schlick_weight(cos_theta: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos)^5 (renderer_ggx.py:751-754)."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return m ** 5


def schlick_r0_eta(eta: jnp.ndarray) -> jnp.ndarray:
    """Normal-incidence reflectance from relative IOR (renderer_ggx.py:756-757)."""
    return ((eta - 1.0) / (eta + 1.0)) ** 2


def calc_schlick(R0, cos_theta: jnp.ndarray, eta) -> jnp.ndarray:
    """Schlick approximation with the inside-the-surface branch
    (renderer_ggx.py:735-749; Mitsuba principledhelpers.h:156).

    NOTE the reference clamps eta into [1e-4, 0.99999] — i.e. it treats the
    passed eta as already-reciprocal; reproduced verbatim for parity.
    """
    eta = jnp.clip(jnp.broadcast_to(jnp.asarray(eta, jnp.float32),
                                    jnp.shape(cos_theta)), 1e-4, 0.99999)
    rcp_eta = jnp.clip(1.0 / eta, 1e-4, 0.99999)
    outside = cos_theta > 0
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    cos_t_sqr = 1.0 - (1.0 - cos_theta * cos_theta) * eta_ti * eta_ti
    cos_t = jnp.sqrt(jnp.clip(cos_t_sqr, 0.0))
    val = schlick_weight(jnp.abs(cos_theta)) * (1.0 - R0) + R0
    val_neq1 = schlick_weight(cos_t) * (1.0 - R0) + R0
    return jnp.where(eta_it < 1.0, val_neq1, val)


def principled_fresnel(F_dielectric, metallic, spec_tint, base_color,
                       intensity, cos_theta, eta,
                       has_metallic: bool = True,
                       has_spec_tint: bool = True) -> jnp.ndarray:
    """Front-side principled Fresnel blend (renderer_ggx.py:697-731)."""
    lum = intensity * jnp.ones_like(cos_theta)
    F_schlick = jnp.zeros_like(base_color)
    if has_metallic:
        F_schlick = F_schlick + metallic * calc_schlick(base_color, cos_theta, eta)
    if has_spec_tint:
        eta_b = jnp.broadcast_to(jnp.asarray(eta, jnp.float32), jnp.shape(cos_theta))
        rcp = 1.0 / eta_b
        eta_it = jnp.where(cos_theta > 0, eta_b, rcp)
        c_tint = jnp.where(lum > 0, base_color / jnp.where(lum > 0, lum, 1.0), 1.0)
        F0_spec_tint = c_tint * schlick_r0_eta(eta_it)
        F_schlick = F_schlick + (1.0 - metallic) * spec_tint * \
            calc_schlick(F0_spec_tint, cos_theta, eta)
    return (1.0 - metallic) * (1.0 - spec_tint) * F_dielectric + F_schlick


def clearcoat_F(cos_theta: jnp.ndarray, eta) -> jnp.ndarray:
    """Clearcoat Fresnel: Schlick at R0=0.04 (renderer_ggx.py:759-762)."""
    return calc_schlick(0.04, cos_theta, eta)


def clearcoat_D(cos_theta: jnp.ndarray, clearcoat: jnp.ndarray) -> jnp.ndarray:
    """Clearcoat GTR1-style NDF with roughness lerp(0.1, 0.001, clearcoat)
    (renderer_ggx.py:764-771)."""
    dot = jnp.clip(cos_theta, 0.00001, 0.99999)
    cos2 = dot * dot
    v = (1.0 - clearcoat) * 0.1 + clearcoat * 0.001
    root = cos2 + (1.0 - cos2) / (v * v + 1e-10)
    return 1.0 / (np.pi * v * v * root * root + 1e-10)


def clearcoat_G(cos_theta: jnp.ndarray, alpha_u: float = 0.25,
                alpha_v: float = 0.25) -> jnp.ndarray:
    return smith_g1(cos_theta, alpha_u) * smith_g1(cos_theta, alpha_v)


def clearcoat_lobe(cos_theta: jnp.ndarray, clearcoat: jnp.ndarray,
                   eta) -> jnp.ndarray:
    """Secondary isotropic specular lobe (renderer_ggx.py:636-643)."""
    Fcc = clearcoat_F(cos_theta, eta)
    Dcc = clearcoat_D(cos_theta, clearcoat)
    Gcc = clearcoat_G(cos_theta)
    return clearcoat * 0.25 * Fcc * Dcc * Gcc * jnp.abs(cos_theta)


def disney_diffuse(cos_theta: jnp.ndarray, alpha: jnp.ndarray,
                   diffuse_albedo: jnp.ndarray) -> jnp.ndarray:
    """Disney retro-reflective diffuse (renderer_ggx.py:645-652)."""
    alpha = jnp.clip(alpha, 0.0001)
    F = schlick_weight(jnp.abs(cos_theta))
    f_diff = (1.0 - 0.5 * F) * (1.0 - 0.5 * F)
    Rr = 2.0 * alpha * cos_theta * cos_theta
    f_retro = Rr * (F + F + F * F * (Rr - 1.0))
    return jnp.abs(cos_theta) * diffuse_albedo / np.pi * (f_diff + f_retro)


def disney_principled_colocated(light, distance, normal, viewdir,
                                params: Dict, eta: float = 1.48958738,
                                use_ggx_table_diffuse: bool = False) -> Dict:
    """Runnable co-located Disney-principled renderer composing the helper
    lobes: principled-Fresnel main specular + clearcoat + Disney diffuse
    (or the Mitsuba table diffuse).

    params: diffuse_albedo [..,3], specular_albedo [..,3],
    specular_roughness [..,1], metallic [..,1], spec_tint [..,1],
    clearcoat [..,1].
    """
    alpha = jnp.clip(params["specular_roughness"], 0.0001)
    metallic = params["metallic"]
    spec_tint = params.get("spec_tint", jnp.zeros_like(alpha))
    clearcoat = params.get("clearcoat", jnp.zeros_like(alpha))
    base_color = params["diffuse_albedo"]

    cos = _cos(normal, viewdir)
    li = _light_falloff(light, distance)

    D = ggx_ndf(cos, alpha)
    G = smith_g1(cos, alpha) ** 2
    F_diel = fresnel_dielectric(cos, eta)
    lum = jnp.mean(base_color, axis=-1, keepdims=True)
    F_p = principled_fresnel(F_diel, metallic, spec_tint, base_color,
                             lum, cos, eta)
    main_spec = li * params["specular_albedo"] * F_p * D * G / (4.0 * jnp.abs(cos))
    cc = li * clearcoat_lobe(cos, clearcoat, eta)

    if use_ggx_table_diffuse:
        diffuse = _table_diffuse(li, cos, alpha, base_color, eta=eta)
    else:
        diffuse = li * disney_diffuse(cos, alpha, base_color)
    diffuse = (1.0 - metallic) * diffuse

    specular = main_spec + cc
    return {"diffuse_rgb": diffuse, "specular_rgb": specular,
            "clearcoat_rgb": cc, "rgb": diffuse + specular}
