"""Unit + oracle-parity tests for core encodings and neural fields."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.core.embedder import positional_encoding, pe_dim
from iron_tpu.fields import (SDFConfig, init_sdf, sdf_apply, sdf_only,
                             sdf_value_feat_grad, sdf_grad,
                             RenderingConfig, init_rendering, rendering_apply,
                             NeRFConfig, init_nerf, nerf_apply,
                             init_variance, variance_apply)
from conftest import has_reference

need_ref = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_pe_dim():
    assert pe_dim(6, 3) == 39
    assert pe_dim(10, 4) == 84
    assert pe_dim(0, 3) == 3


def test_pe_values():
    x = jnp.array([[0.3, -0.2, 0.7]])
    e = positional_encoding(x, 2)
    assert e.shape == (1, 15)
    np.testing.assert_allclose(e[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(e[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(e[0, 6:9], np.cos(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(e[0, 9:12], np.sin(2 * np.asarray(x[0])), rtol=1e-6)


def test_sdf_geometric_init_is_spherelike():
    """At geometric init the SDF should approximate ||x|| - bias."""
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3)) * 0.6
    vals = sdf_only(params, pts, cfg)
    expected = jnp.linalg.norm(pts, axis=-1) - cfg.bias
    # geometric init is approximate (softplus, PE columns zeroed)
    err = jnp.abs(vals - expected)
    assert float(jnp.median(err)) < 0.1


def test_sdf_grad_matches_fd():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (16, 3)) * 0.4
    g = sdf_grad(params, pts, cfg)
    eps = 1e-3
    for ax in range(3):
        d = jnp.zeros((1, 3)).at[0, ax].set(eps)
        fd = (sdf_only(params, pts + d, cfg) - sdf_only(params, pts - d, cfg)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, ax]), np.asarray(fd), atol=2e-3)


def test_sdf_value_feat_grad_consistency():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(3), (8, 3)) * 0.4
    v, f, g = sdf_value_feat_grad(params, pts, cfg)
    out = sdf_apply(params, pts, cfg)
    np.testing.assert_allclose(np.asarray(v), np.asarray(out[..., 0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(out[..., 1:]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(sdf_grad(params, pts, cfg)), rtol=1e-5, atol=1e-6)


def test_sdf_fwd_mode_normals_match_vjp():
    """The JVP-based normals path (normals_mode='jvp') is exact: values,
    features and gradients equal the vjp path, and a second-order
    eikonal-style loss produces the same parameter gradients."""
    from iron_tpu.fields.sdf import sdf_value_feat_grad_fwd

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 3)) * 0.4

    v1, f1, g1 = sdf_value_feat_grad(params, pts, cfg)
    v2, f2, g2 = sdf_value_feat_grad_fwd(params, pts, cfg)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)

    def loss(p, fn):
        v, f, g = fn(p, pts, cfg)
        # touches all three outputs, incl. second order through g
        return (jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
                + jnp.mean(v ** 2) + 1e-3 * jnp.mean(f ** 2))

    gr1 = jax.grad(loss)(params, sdf_value_feat_grad)
    gr2 = jax.grad(loss)(params, sdf_value_feat_grad_fwd)
    for a, b in zip(jax.tree_util.tree_leaves(gr1),
                    jax.tree_util.tree_leaves(gr2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_sdf_second_order_differentiable():
    """Eikonal-style loss must be differentiable through the gradient."""
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(4), (32, 3)) * 0.5

    def eik_loss(p):
        g = sdf_grad(p, pts, cfg)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(eik_loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


@need_ref
def test_sdf_forward_parity_with_reference():
    from oracle import import_reference, sdf_params_from_torch
    import_reference()
    import torch
    from models.fields import SDFNetwork

    torch.manual_seed(0)
    net = SDFNetwork(d_in=3, d_out=257, d_hidden=256, n_layers=8, skip_in=[4],
                     multires=6, bias=0.5, scale=1.0, geometric_init=True,
                     weight_norm=True)
    params = sdf_params_from_torch(net)
    cfg = SDFConfig()

    x = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(sdf_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    # gradient parity
    xt = torch.from_numpy(x)
    ref_grad = net.gradient(xt).detach().numpy()
    ours_grad = np.asarray(sdf_grad(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours_grad, ref_grad.reshape(ours_grad.shape), atol=5e-4, rtol=1e-3)


@need_ref
@pytest.mark.parametrize("mode,d_in,multires,multires_view,squeeze", [
    ("idr", 9, 0, 4, True),
    ("no_view_dir", 6, 6, -1, False),
    ("points_only", 3, 6, -1, False),
])
def test_rendering_parity_with_reference(mode, d_in, multires, multires_view, squeeze):
    from oracle import import_reference, rendering_params_from_torch
    import_reference()
    import torch
    from models.fields import RenderingNetwork

    torch.manual_seed(0)
    net = RenderingNetwork(d_feature=256, mode=mode, d_in=d_in, d_out=3,
                           d_hidden=256, n_layers=4, weight_norm=True,
                           multires=max(multires, 0), multires_view=max(multires_view, 0),
                           squeeze_out=squeeze, output_bias=0.1, output_scale=0.5)
    params = rendering_params_from_torch(net)
    cfg = RenderingConfig(d_feature=256, mode=mode, d_in=d_in, d_out=3,
                          d_hidden=256, n_layers=4,
                          multires=max(multires, 0), multires_view=max(multires_view, 0),
                          squeeze_out=squeeze, output_bias=0.1, output_scale=0.5)

    g = np.random.default_rng(1)
    pts = g.normal(size=(32, 3)).astype(np.float32)
    nrm = g.normal(size=(32, 3)).astype(np.float32)
    view = g.normal(size=(32, 3)).astype(np.float32)
    feat = g.normal(size=(32, 256)).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(pts), torch.from_numpy(nrm),
                  torch.from_numpy(view), torch.from_numpy(feat)).numpy()
    ours = np.asarray(rendering_apply(params, cfg, jnp.asarray(pts), jnp.asarray(nrm),
                                      jnp.asarray(view), jnp.asarray(feat)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


@need_ref
def test_nerf_parity_with_reference():
    from oracle import import_reference, nerf_params_from_torch
    import_reference()
    import torch
    from models.fields import NeRF

    torch.manual_seed(0)
    net = NeRF(D=8, W=256, d_in=4, d_in_view=3, multires=10, multires_view=4,
               skips=[4], use_viewdirs=True)
    params = nerf_params_from_torch(net)
    cfg = NeRFConfig()

    g = np.random.default_rng(2)
    pts = g.normal(size=(16, 4)).astype(np.float32)
    views = g.normal(size=(16, 3)).astype(np.float32)
    with torch.no_grad():
        a_ref, rgb_ref = net(torch.from_numpy(pts), torch.from_numpy(views))
    a, rgb = nerf_apply(params, cfg, jnp.asarray(pts), jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=1e-5, rtol=1e-4)


def test_variance_network():
    p = init_variance(0.3)
    np.testing.assert_allclose(float(variance_apply(p)), np.exp(3.0), rtol=1e-6)


@need_ref
def test_nerf_dual_parity_with_reference():
    from oracle import import_reference, nerf_params_from_torch
    import_reference()
    import torch
    from models.fields import NeRFdual

    torch.manual_seed(0)
    net = NeRFdual(D=8, W=256, d_in=4, d_in_view=3, multires=10, multires_view=4,
                   skips=[4], use_viewdirs=True)
    params = nerf_params_from_torch(net, dual=True)
    cfg = NeRFConfig(dual=True)

    g = np.random.default_rng(5)
    pts = g.normal(size=(8, 4)).astype(np.float32)
    views = g.normal(size=(8, 3)).astype(np.float32)
    with torch.no_grad():
        a_ref, rgb_ref, nir_ref = net(torch.from_numpy(pts), torch.from_numpy(views))
    a, rgb, nir = nerf_apply(params, cfg, jnp.asarray(pts), jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nir), nir_ref.numpy(), atol=1e-5, rtol=1e-4)
