"""Microfacet building blocks: Smith G1 shadowing, GGX NDF, exact Fresnel
terms for dielectrics and conductors.

Behavioral specs (reference `models/renderer_ggx.py`):
  * smithG1 (renderer_ggx.py:12-16): 2 / (1 + hypot(alpha*tan(theta), 1));
  * GGX NDF evaluated at the half-vector cosine (renderer_ggx.py:108-110);
  * fresnel_dielectric (renderer_ggx.py:398-416): unpolarized average of
    Rs^2, Rp^2 with eta flipped for cos_theta > 0;
  * fresnel_conductor_exact (renderer_ggx.py:419-432): Mitsuba's exact
    complex-IOR conductor reflectance.
All functions are pure jnp, broadcast over arbitrary leading dims.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def smith_g1(cos_theta: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta * cos_theta, 0.0))
    tan_theta = sin_theta / (cos_theta + 1e-10)
    root = alpha * tan_theta
    return 2.0 / (1.0 + jnp.hypot(root, jnp.ones_like(root)))


def ggx_ndf(cos_theta: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """GGX normal distribution at half-vector cosine (renderer_ggx.py:108-110)."""
    cos2 = cos_theta * cos_theta
    root = cos2 + (1.0 - cos2) / (alpha * alpha + 1e-10)
    return 1.0 / (np.pi * alpha * alpha * root * root + 1e-10)


def fresnel_dielectric(cos_theta_i: jnp.ndarray, eta) -> jnp.ndarray:
    """Unpolarized dielectric Fresnel reflectance (renderer_ggx.py:398-416).

    `eta` is the relative IOR (inside/outside); rays exiting (cos<0) use
    1/eta for the Snell scale.
    """
    eta = jnp.broadcast_to(jnp.asarray(eta, cos_theta_i.dtype), cos_theta_i.shape)
    scale = jnp.where(cos_theta_i > 0, 1.0 / eta, eta)
    cos_t_sqr = 1.0 - (1.0 - cos_theta_i ** 2) * scale ** 2
    cos_i = jnp.abs(cos_theta_i)
    cos_t = jnp.sqrt(jnp.clip(cos_t_sqr, 0.0))
    Rs = (cos_i - eta * cos_t) / (cos_i + eta * cos_t)
    Rp = (eta * cos_i - cos_t) / (eta * cos_i + cos_t)
    F = 0.5 * (Rs * Rs + Rp * Rp)
    # total internal reflection
    return jnp.where(cos_t_sqr <= 0.0, jnp.ones_like(F), F)


def fresnel_conductor_exact(cos_theta_i: jnp.ndarray, eta, k) -> jnp.ndarray:
    """Exact conductor Fresnel (renderer_ggx.py:419-432, Mitsuba util.cpp)."""
    eta = jnp.asarray(eta, cos_theta_i.dtype)
    k = jnp.asarray(k, cos_theta_i.dtype)
    cos2 = cos_theta_i * cos_theta_i
    sin2 = 1.0 - cos2
    sin4 = sin2 * sin2
    temp1 = eta * eta - k * k - sin2
    a2pb2 = jnp.sqrt(jnp.clip(temp1 * temp1 + 4 * k * k * eta * eta, 0.0))
    a = jnp.sqrt(jnp.clip(0.5 * (a2pb2 + temp1), 0.0))
    term1 = a2pb2 + cos2
    term2 = 2 * a * cos_theta_i
    Rs2 = (term1 - term2) / (term1 + term2)
    term3 = a2pb2 * cos2 + sin4
    term4 = term2 * sin2
    Rp2 = Rs2 * (term3 - term4) / (term3 + term4)
    return 0.5 * (Rp2 + Rs2)
