"""Hash-grid field tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.fields.hashgrid import (HashGridConfig, init_hashgrid, hashgrid_encode,
                                      HashSDFConfig, init_hash_sdf, hash_sdf_apply,
                                      hash_sdf_only, hash_sdf_value_feat_grad,
                                      HashNeRFConfig, init_hash_nerf, hash_nerf_apply)

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


def _small_grid():
    return HashGridConfig(n_levels=4, n_features_per_level=2,
                          log2_hashmap_size=12, base_resolution=4,
                          per_level_scale=2.0)


def test_encode_shapes_and_continuity():
    cfg = _small_grid()
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    e = hashgrid_encode(params, x, cfg)
    assert e.shape == (32, 8)
    # trilinear interpolation is continuous: tiny input step -> tiny output step
    e2 = hashgrid_encode(params, x + 1e-5, cfg)
    assert float(jnp.max(jnp.abs(e2 - e))) < 1e-5


def test_encode_differentiable_wrt_x_and_table():
    cfg = _small_grid()
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.9, maxval=0.9)
    g_x = jax.grad(lambda x: jnp.sum(hashgrid_encode(params, x, cfg) ** 2))(x)
    g_t = jax.grad(lambda p: jnp.sum(hashgrid_encode(p, x, cfg) ** 2))(params)
    assert np.all(np.isfinite(np.asarray(g_x)))
    assert float(jnp.sum(jnp.abs(g_t["table"]))) > 0


def test_hash_sdf_sphere_bias_and_fit():
    cfg = HashSDFConfig(grid=_small_grid(), sphere_init_radius=0.5)
    params = init_hash_sdf(jax.random.PRNGKey(0), cfg)
    # at init the sdf is approximately a sphere of radius .5
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 0.4
    v = hash_sdf_only(params, x, cfg)
    expected = jnp.linalg.norm(x, axis=-1) - 0.5
    assert float(jnp.median(jnp.abs(v - expected))) < 0.05

    # it can fit a different radius quickly (hash grids learn fast)
    import optax
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    target_r = 0.3

    @jax.jit
    def step(params, opt, key):
        pts = jax.random.uniform(key, (512, 3), minval=-0.8, maxval=0.8)

        def loss(p):
            v = hash_sdf_only(p, pts, cfg)
            gt = jnp.linalg.norm(pts, axis=-1) - target_r
            return jnp.mean((v - gt) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.PRNGKey(2)
    for i in range(200):
        key, sub = jax.random.split(key)
        params, opt, l = step(params, opt, sub)
    assert float(l) < 1e-3


def test_hash_sdf_grad_consistency():
    cfg = HashSDFConfig(grid=_small_grid())
    params = init_hash_sdf(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (16, 3), minval=-0.8, maxval=0.8)
    v, f, g = hash_sdf_value_feat_grad(params, x, cfg)
    assert v.shape == (16,) and f.shape == (16, cfg.d_feature) and g.shape == (16, 3)
    eps = 1e-4
    for ax in range(3):
        d = jnp.zeros((1, 3)).at[0, ax].set(eps)
        fd = (hash_sdf_only(params, x + d, cfg) - hash_sdf_only(params, x - d, cfg)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, ax]), np.asarray(fd), atol=5e-2)


def test_hash_nerf_apply():
    cfg = HashNeRFConfig(grid=_small_grid())
    params = init_hash_nerf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    views = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    sigma, rgb = hash_nerf_apply(params, cfg, pts, views)
    assert sigma.shape == (16, 1) and rgb.shape == (16, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1


def test_hash_rendering_head():
    from iron_tpu.fields.hashgrid import (HashRenderingConfig, init_hash_rendering,
                                          hash_rendering_apply)
    cfg = HashRenderingConfig(grid=_small_grid(), d_feature=8)
    params = init_hash_rendering(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    nrm = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    view = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    feat = jax.random.normal(jax.random.PRNGKey(4), (16, 8))
    out = hash_rendering_apply(params, cfg, pts, nrm, view, feat)
    assert out.shape == (16, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
