"""Sphere tracer tests on analytic SDFs — the reference never does this but
it is the right primitive (SURVEY.md §4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.surface import TracerConfig, sphere_trace, raytrace, reparam_points
from iron_tpu.core import intersect_sphere


def sphere_sdf(r):
    return lambda p: jnp.linalg.norm(p, axis=-1) - r


def box_sdf(b):
    def f(p):
        q = jnp.abs(p) - b
        outside = jnp.linalg.norm(jnp.clip(q, 0.0), axis=-1)
        inside = jnp.clip(jnp.max(q, axis=-1), None, 0.0)
        return outside + inside
    return f


def _rays_towards_origin(n=64, radius=3.0, seed=0, jitter=0.0):
    g = np.random.default_rng(seed)
    d = g.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray_o = (radius * d).astype(np.float32)
    target = (g.normal(size=(n, 3)) * jitter).astype(np.float32)
    rd = target - ray_o
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ray_o), jnp.asarray(rd.astype(np.float32))


def test_sphere_trace_exact_distance():
    r = 0.5
    ray_o, ray_d = _rays_towards_origin(64)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    res = raytrace(sphere_sdf(r), ray_o, ray_d, near, far, mask)
    assert bool(jnp.all(res["convergent_mask"]))
    np.testing.assert_allclose(np.asarray(res["distance"]), 3.0 - r, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(res["points"], axis=-1)),
                               r, atol=1e-4)
    assert float(jnp.max(jnp.abs(res["sdf"]))) <= 5.1e-5


def test_trace_miss_rays_not_convergent():
    """Rays that graze past the surface must not report convergence."""
    r = 0.3
    # rays offset to miss the sphere of radius .3 but hit the unit sphere
    ray_o = jnp.asarray([[3.0, 0.6, 0.0]], jnp.float32)
    ray_d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    res = raytrace(sphere_sdf(r), ray_o, ray_d, near, far, mask)
    assert not bool(res["convergent_mask"][0])


def test_fallback_sampler_catches_thin_feature():
    """A thin box seen edge-on defeats pure sphere tracing steps but the
    dense fallback + bisection must still find the root."""
    f = box_sdf(jnp.asarray([0.02, 0.5, 0.5]))
    ray_o = jnp.asarray([[3.0, 0.2, 0.1]], jnp.float32)
    ray_d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    res = raytrace(f, ray_o, ray_d, near, far, mask)
    assert bool(res["convergent_mask"][0])
    np.testing.assert_allclose(float(res["points"][0, 0]), 0.02, atol=1e-3)


def test_trace_under_jit():
    r = 0.5
    ray_o, ray_d = _rays_towards_origin(32)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    fn = jax.jit(lambda o, d, m, n, fr: raytrace(sphere_sdf(r), o, d, n, fr, m))
    res = fn(ray_o, ray_d, mask, near, far)
    assert bool(jnp.all(res["convergent_mask"]))


def test_reparam_gradient_matches_implicit_function():
    """d(hit distance)/d(radius) for a sphere is -1 along the ray: moving the
    surface out by dr moves the hit point toward the camera by dr."""
    ray_o = jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32)
    ray_d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)

    def hit_x(radius):
        sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - radius
        res = raytrace(sdf_fn, ray_o, ray_d, near, far, mask)
        pts = jax.lax.stop_gradient(res["points"])
        grads = jax.lax.stop_gradient(pts / jnp.linalg.norm(pts, axis=-1, keepdims=True))
        sdf_diff = (jnp.linalg.norm(pts, axis=-1, keepdims=True) - radius)
        p_diff = reparam_points(pts, grads, -ray_d, sdf_diff)
        return p_diff[0, 0]

    g = jax.grad(hit_x)(jnp.asarray(0.5))
    np.testing.assert_allclose(float(g), 1.0, atol=1e-3)  # x of hit pt = radius


def test_budget_select_spreads_uniformly():
    """Over-budget selection must not concentrate in scan order (the naive
    argsort picks the first k row-major entries)."""
    from iron_tpu.surface.tracer import budget_select
    n, k = 16384, 1024
    mask = jnp.ones((n,), bool)  # everything wants selection
    sel = np.asarray(budget_select(mask, k))
    assert len(np.unique(sel)) == k
    # selected indices should span the whole range, not just the front
    assert sel.min() < n // 16 and sel.max() > n - n // 16
    # quartile occupancy roughly balanced
    hist, _ = np.histogram(sel, bins=4, range=(0, n))
    assert hist.min() > k // 8


def test_budget_select_prefers_masked():
    from iron_tpu.surface.tracer import budget_select
    n, k = 1024, 64
    mask = np.zeros(n, bool)
    idx_true = np.random.default_rng(0).choice(n, 40, replace=False)
    mask[idx_true] = True
    sel = np.asarray(budget_select(jnp.asarray(mask), k))
    # all true entries are selected (40 < 64)
    assert set(idx_true).issubset(set(sel.tolist()))


def test_network_sdf_trace_converges_fully():
    """Regression for the learned-SDF budget bug: tracing the geometric-init
    network SDF must converge the bulk of hit rays, not just a top band."""
    from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    f = lambda p: sdf_only(params, p, cfg)
    ray_o, ray_d = _rays_towards_origin(4096, radius=1.0, jitter=0.12)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    res = raytrace(f, ray_o, ray_d, near, far, mask)
    conv = np.asarray(res["convergent_mask"])
    # nearly every ray aimed at the init sphere (bias .5, jitter .12) hits
    assert conv.mean() > 0.9
    # and convergence is not spatially banded: both halves converge
    assert conv[:2048].mean() > 0.85 and conv[2048:].mean() > 0.85


def test_coarse_to_fine_trace_matches_accurate():
    """The coarse-to-fine march (cheap bf16-like coarse evaluator + accurate
    refine) must reproduce the accurate-only trace: same convergent set, hit
    distances within sphere-tracing tolerance."""
    import dataclasses
    from iron_tpu.surface.tracer import TracerConfig, raytrace

    def sdf(p):
        return jnp.linalg.norm(p, axis=-1) - 0.6

    # simulate a low-precision evaluator: bf16 roundtrip + deterministic bias
    def coarse(p):
        v = sdf(p).astype(jnp.bfloat16).astype(jnp.float32)
        return v + 4e-3 * jnp.sin(37.0 * p[..., 0])

    n = 512
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # cameras on a shell, rays toward points near the origin
    ray_o = 2.5 * d
    target = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    ray_d = target - ray_o
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    min_dis = jnp.full((n,), 0.5)
    max_dis = jnp.full((n,), 4.5)
    work = jnp.ones((n,), bool)

    cfg = TracerConfig()
    ref = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg)
    c2f = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg,
                   coarse_sdf_fn=coarse)

    ref_conv = np.asarray(ref["convergent_mask"])
    c2f_conv = np.asarray(c2f["convergent_mask"])
    assert ref_conv.sum() > 100  # the scene actually hits
    np.testing.assert_array_equal(c2f_conv, ref_conv)
    both = ref_conv & c2f_conv
    # distances agree within the tracer's own tolerance divided by the
    # incidence cosine (grazing rays have a sliver of root ambiguity)
    np.testing.assert_allclose(np.asarray(c2f["distance"])[both],
                               np.asarray(ref["distance"])[both],
                               atol=1e-3)
    # converged points really sit on the accurate surface
    hit_sdf = np.asarray(sdf(c2f["points"]))[c2f_conv]
    assert np.abs(hit_sdf).max() <= cfg.sdf_threshold * 1.01


def test_coarse_to_fine_jit_and_grad_free():
    """c2f trace is jittable and fully stop-gradient (no params touched)."""
    import dataclasses
    from iron_tpu.surface.tracer import TracerConfig, raytrace

    def sdf(p):
        return jnp.linalg.norm(p, axis=-1) - 0.5

    coarse = lambda p: sdf(p).astype(jnp.bfloat16).astype(jnp.float32)
    ray_o = jnp.array([[0.0, 0.0, 3.0]] * 8)
    ray_d = jnp.array([[0.0, 0.0, -1.0]] * 8)
    f = jax.jit(lambda: raytrace(sdf, ray_o, ray_d, jnp.full((8,), 1.0),
                                 jnp.full((8,), 5.0), jnp.ones((8,), bool),
                                 TracerConfig(), coarse_sdf_fn=coarse))
    out = f()
    np.testing.assert_allclose(np.asarray(out["distance"]), 2.5, atol=1e-3)


def test_coarse_fallback_sweep_matches_accurate():
    """Force every ray through the dense fallback (zero sphere-trace iters):
    the coarse sweep + accurate window revalidation must find the same roots
    as the accurate-only sweep."""
    import dataclasses
    from iron_tpu.surface.tracer import TracerConfig, raytrace

    def sdf(p):
        return jnp.linalg.norm(p, axis=-1) - 0.6

    def coarse(p):
        v = sdf(p).astype(jnp.bfloat16).astype(jnp.float32)
        return v + 4e-3 * jnp.sin(53.0 * p[..., 1])

    n = 512
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray_o = 2.5 * d
    target = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (n, 3))
    ray_d = target - ray_o
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    min_dis = jnp.full((n,), 0.5)
    max_dis = jnp.full((n,), 4.5)
    work = jnp.ones((n,), bool)

    cfg = TracerConfig(sphere_tracing_iters=0, dense_iters=0, refine_iters=0,
                       fallback_budget=None)
    ref = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg)
    c2f = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg,
                   coarse_sdf_fn=coarse)

    ref_conv = np.asarray(ref["convergent_mask"])
    c2f_conv = np.asarray(c2f["convergent_mask"])
    assert ref_conv.sum() > 100
    # near-tangent rays may be found by one sampling pattern and not the
    # other; the revalidation guarantees any c2f root is accurate-sign-valid,
    # so require near-total agreement + exactness of every found root
    assert (c2f_conv != ref_conv).mean() < 0.005
    both = ref_conv & c2f_conv
    np.testing.assert_allclose(np.asarray(c2f["distance"])[both],
                               np.asarray(ref["distance"])[both], atol=1e-3)
    hit_sdf = np.asarray(sdf(c2f["points"]))[c2f_conv]
    assert np.abs(hit_sdf).max() <= cfg.sdf_threshold * 1.01


def test_coarse_fallback_disabled_by_flag():
    """fallback_coarse=False keeps the 128-sample sweep on the accurate fn
    (the coarse fn sees only sphere-trace-shaped [N] inputs, never the
    [N, n_steps] sweep)."""
    from iron_tpu.surface.tracer import TracerConfig, raytrace
    shapes = []

    def sdf(p):
        return jnp.linalg.norm(p, axis=-1) - 0.5

    def coarse(p):
        shapes.append(p.shape)
        return sdf(p)

    ray_o = jnp.array([[0.0, 0.0, 3.0]] * 8)
    ray_d = jnp.array([[0.0, 0.0, -1.0]] * 8)
    for flag in (False, True):
        shapes.clear()
        cfg = TracerConfig(sphere_tracing_iters=0, dense_iters=0,
                           refine_iters=0, fallback_budget=None,
                           fallback_coarse=flag)
        raytrace(sdf, ray_o, ray_d, jnp.full((8,), 1.0), jnp.full((8,), 5.0),
                 jnp.ones((8,), bool), cfg, coarse_sdf_fn=coarse)
        swept = any(len(s) == 3 and s[1] == cfg.n_steps for s in shapes)
        assert swept == flag


def test_network_sdf_coarse_trace_convergence_matches():
    """The coarse-to-fine march must not lose convergence on a *learned*
    (geometric-init network) SDF — the workload stage 2 actually runs."""
    from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only
    cfg_s = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg_s)
    f = lambda p: sdf_only(params, p, cfg_s)
    coarse = lambda p: f(p).astype(jnp.bfloat16).astype(jnp.float32)
    ray_o, ray_d = _rays_towards_origin(2048, radius=1.0, jitter=0.12)
    mask, near, far = intersect_sphere(ray_o, ray_d, 1.0)
    cfg = TracerConfig()
    ref = raytrace(f, ray_o, ray_d, near, far, mask, cfg)
    c2f = raytrace(f, ray_o, ray_d, near, far, mask, cfg, coarse_sdf_fn=coarse)
    ref_conv = np.asarray(ref["convergent_mask"])
    c2f_conv = np.asarray(c2f["convergent_mask"])
    assert ref_conv.mean() > 0.9
    # coarse path may converge a handful of rays differently near grazing,
    # but must not lose convergence wholesale
    assert c2f_conv.mean() > ref_conv.mean() - 0.02
    both = ref_conv & c2f_conv
    d_ref = np.asarray(ref["distance"])[both]
    d_c2f = np.asarray(c2f["distance"])[both]
    assert np.percentile(np.abs(d_ref - d_c2f), 99) < 2e-3


def test_coarse_fallback_second_candidate_after_false_graze():
    """A coarse false-positive flip at a graze must not kill the ray: the
    revalidation rejects the graze and the second candidate search finds the
    true hit further along the ray."""
    from iron_tpu.surface.tracer import TracerConfig, raytrace

    # small sphere the ray grazes by 3e-3, then a big sphere it truly hits
    def sdf(p):
        graze = jnp.linalg.norm(p - jnp.array([0.0, 0.103, 2.0]), axis=-1) - 0.1
        hit = jnp.linalg.norm(p, axis=-1) - 0.5
        return jnp.minimum(graze, hit)

    # coarse evaluator with a deterministic -6e-3 bias: the graze (accurate
    # min +3e-3) looks like a surface crossing to the coarse sweep
    coarse = lambda p: sdf(p) - 6e-3

    n = 4
    ray_o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    ray_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    cfg = TracerConfig(sphere_tracing_iters=0, dense_iters=0, refine_iters=0,
                       fallback_budget=None, fallback_revalidate_margin=2.5e-2)
    min_dis = jnp.full((n,), 0.2)
    max_dis = jnp.full((n,), 4.0)
    work = jnp.ones((n,), bool)

    ref = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg)
    c2f = raytrace(sdf, ray_o, ray_d, min_dis, max_dis, work, cfg,
                   coarse_sdf_fn=coarse)
    assert bool(ref["convergent_mask"].all())
    assert bool(c2f["convergent_mask"].all()), \
        "false graze flip must not drop the ray"
    # both find the true hit on the big sphere at z=0.5 -> distance 2.5
    np.testing.assert_allclose(np.asarray(c2f["distance"]), 2.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c2f["distance"]),
                               np.asarray(ref["distance"]), atol=1e-3)
