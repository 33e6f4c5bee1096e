"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

# whole-file slow tier: full-raytrace + kernel-parity sweeps dominate the
# suite wall time (VERDICT r4 item 10); run with `pytest -m slow` / `-m ""`
pytestmark = pytest.mark.slow

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


def test_fused_sdf_bf16_matches_lax_path():
    """The bf16 coarse-trace kernel must stay inside the coarse error
    budget (surface/tracer.py coarse_threshold=2e-2 assumes ~1e-2 bf16
    SDF error) against the HIGHEST-precision reference path."""
    from iron_tpu.fields.sdf import sdf_only
    from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_bf16_fn

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    fn = make_pallas_sdf_only_bf16_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (777, 3),
                           minval=-1.0, maxval=1.0)
    ref = np.asarray(sdf_only(params, x, cfg))
    out = np.asarray(fn(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1.2e-2)


def test_fused_sdf_bf16_leading_dims_and_scale():
    from iron_tpu.fields.sdf import sdf_only
    from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_bf16_fn

    cfg = SDFConfig(scale=2.0)
    params = init_sdf(jax.random.PRNGKey(5), cfg)
    fn = make_pallas_sdf_only_bf16_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(6), (5, 9, 3),
                           minval=-0.5, maxval=0.5)
    out = fn(x)
    assert out.shape == (5, 9)
    ref = np.asarray(sdf_only(params, x, cfg))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1.2e-2)


def test_pallas_coarse_march_raytrace_parity():
    """raytrace with the single-kernel Pallas coarse march (interpret mode)
    must reproduce the accurate-only trace on the geometric-init network
    SDF: same convergent set, hit distances within tracer tolerance, every
    accepted root on the accurate surface (mirrors
    test_tracer.test_coarse_to_fine_trace_matches_accurate)."""
    from iron_tpu.fields.sdf import sdf_only
    from iron_tpu.kernels.fused_sdf import make_pallas_coarse_march_fn
    from iron_tpu.surface.tracer import TracerConfig, raytrace

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    sdf_fn = lambda p: sdf_only(params, p, cfg)

    n = 256
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray_o = 2.5 * d
    target = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    ray_d = target - ray_o
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    min_dis = jnp.full((n,), 0.5)
    max_dis = jnp.full((n,), 4.5)
    work = jnp.ones((n,), bool)

    tc = TracerConfig()
    march = make_pallas_coarse_march_fn(params, cfg,
                                        threshold=tc.coarse_threshold,
                                        tile=128, interpret=True)
    ref = raytrace(sdf_fn, ray_o, ray_d, min_dis, max_dis, work, tc)
    got = raytrace(sdf_fn, ray_o, ray_d, min_dis, max_dis, work, tc,
                   coarse_march_fn=march)

    ref_conv = np.asarray(ref["convergent_mask"])
    got_conv = np.asarray(got["convergent_mask"])
    assert ref_conv.sum() > 50
    np.testing.assert_array_equal(got_conv, ref_conv)
    both = ref_conv & got_conv
    np.testing.assert_allclose(np.asarray(got["distance"])[both],
                               np.asarray(ref["distance"])[both], atol=2e-3)
    hit_sdf = np.asarray(sdf_fn(got["points"]))[got_conv]
    assert np.abs(hit_sdf).max() <= tc.sdf_threshold * 1.01


def test_fused_sdf_grad_forward_matches_lax():
    """Fused differentiable core (kernels/fused_sdf_grad.py): forward
    outputs (value, feature, gradient) match fields.sdf.sdf_value_feat_grad
    exactly (f32, interpret mode, multi-tile grid)."""
    from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_value_feat_grad
    from iron_tpu.kernels.fused_sdf_grad import make_fused_sdf_grad_fn

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 3)) * 0.4
    v1, f1, g1 = sdf_value_feat_grad(params, x, cfg)
    fn = make_fused_sdf_grad_fn(cfg, tile=128, interpret=True)
    v2, f2, g2 = fn(params, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_fused_sdf_grad_second_order_backward_matches_lax():
    """The hand-derived backward kernel reproduces the lax double-vjp
    parameter AND input gradients of a second-order (eikonal-style) loss —
    through the weight-norm effective-weight chain, over a multi-tile
    grid with cross-tile dW accumulation."""
    from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_value_feat_grad
    from iron_tpu.kernels.fused_sdf_grad import make_fused_sdf_grad_fn

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 3)) * 0.4
    fn = make_fused_sdf_grad_fn(cfg, tile=128, interpret=True)

    def loss(p, x, use_fused):
        v, ft, g = fn(p, x) if use_fused else sdf_value_feat_grad(p, x, cfg)
        return (jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
                + jnp.mean(v ** 2) + 1e-3 * jnp.mean(ft ** 2))

    g1p, g1x = jax.grad(loss, argnums=(0, 1))(params, x, False)
    g2p, g2x = jax.grad(loss, argnums=(0, 1))(params, x, True)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x),
                               rtol=1e-4, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g1p),
                    jax.tree_util.tree_leaves(g2p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_sdf_3pass_matches_high_precision():
    """The hi/lo-split trace kernel (make_pallas_sdf_only_3pass_fn,
    Stage2Config.trace_pallas) must sit in the XLA-HIGH error class
    (~2e-4) — an order of magnitude tighter than the bf16 coarse kernel."""
    from iron_tpu.fields.sdf import sdf_only
    from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_3pass_fn

    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    fn = make_pallas_sdf_only_3pass_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (777, 3),
                           minval=-1.0, maxval=1.0)
    ref = np.asarray(sdf_only(params, x, cfg))
    out = np.asarray(fn(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4)
    # strictly tighter than the single-pass bf16 kernel on the same points
    from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_bf16_fn
    coarse = np.asarray(make_pallas_sdf_only_bf16_fn(
        params, cfg, tile=128, interpret=True)(x))
    assert np.abs(out - ref).max() < 0.3 * np.abs(coarse - ref).max()


def test_fused_sdf_3pass_leading_dims():
    from iron_tpu.fields.sdf import sdf_only
    from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_3pass_fn

    cfg = SDFConfig(scale=1.7)
    params = init_sdf(jax.random.PRNGKey(1), cfg)
    fn = make_pallas_sdf_only_3pass_fn(params, cfg, tile=128, interpret=True)
    x = jax.random.uniform(jax.random.PRNGKey(5), (6, 37, 3),
                           minval=-0.8, maxval=0.8)
    ref = np.asarray(sdf_only(params, x, cfg))
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=5e-4)
