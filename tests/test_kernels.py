"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply
from iron_tpu.kernels.fused_sdf import make_pallas_sdf_fn


def test_fused_sdf_matches_lax_path():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    fn = make_pallas_sdf_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (300, 3)) * 0.5
    ref = np.asarray(sdf_apply(params, x, cfg))
    out = np.asarray(fn(x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_fused_sdf_arbitrary_leading_dims():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    fn = make_pallas_sdf_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (7, 11, 3)) * 0.5
    out = fn(x)
    assert out.shape == (7, 11, cfg.d_out)
    ref = np.asarray(sdf_apply(params, x, cfg))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
