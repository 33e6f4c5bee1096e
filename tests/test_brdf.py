"""BRDF unit tests: closed-form checks + oracle parity with the reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from iron_tpu.shading import (smith_g1, ggx_ndf, fresnel_dielectric,
                              fresnel_conductor_exact, mts_trans_table,
                              mts_diff_trans_table, ggx_colocated,
                              rough_plastic_colocated, smooth_dielectric,
                              thin_dielectric, smooth_conductor_colocated,
                              rough_conductor_colocated, composite_colocated,
                              mixture_colocated)
from conftest import has_reference

need_ref = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_fresnel_dielectric_normal_incidence():
    """At normal incidence F = ((eta-1)/(eta+1))^2."""
    eta = 1.5
    F = float(fresnel_dielectric(jnp.asarray([0.9999999]), eta)[0])
    np.testing.assert_allclose(F, ((eta - 1) / (eta + 1)) ** 2, rtol=1e-3)


def test_fresnel_dielectric_grazing():
    F = float(fresnel_dielectric(jnp.asarray([0.001]), 1.5)[0])
    assert F > 0.95  # grazing angles reflect almost everything


def test_fresnel_conductor_normal_incidence():
    """Normal incidence conductor: ((eta-1)^2+k^2)/((eta+1)^2+k^2)."""
    eta, k = 2.58, 8.21
    F = float(fresnel_conductor_exact(jnp.asarray(1.0), eta, k))
    expected = ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2)
    np.testing.assert_allclose(F, expected, rtol=1e-5)


def test_smith_g1_limits():
    # normal incidence: G1 = 1; grazing: -> 0
    np.testing.assert_allclose(float(smith_g1(jnp.asarray(1.0), jnp.asarray(0.3))), 1.0, atol=1e-5)
    assert float(smith_g1(jnp.asarray(0.01), jnp.asarray(0.5))) < 0.1


def test_ggx_ndf_normalization():
    """Integral of D(h) cos(h) over hemisphere = 1 (quadrature check)."""
    alpha = 0.4
    n = 4096
    theta = np.linspace(0, np.pi / 2, n, endpoint=False) + np.pi / (4 * n)
    ct = np.cos(theta)
    D = np.asarray(ggx_ndf(jnp.asarray(ct, jnp.float32), jnp.asarray(alpha, jnp.float32)))
    integral = float(np.sum(D * ct * np.sin(theta)) * (np.pi / 2 / n) * 2 * np.pi)
    np.testing.assert_allclose(integral, 1.0, rtol=5e-3)


def test_tables_loaded():
    assert mts_trans_table().shape == (5000,)
    assert mts_diff_trans_table().shape == (50,)


def _rand_shading(n=64, seed=0):
    g = np.random.default_rng(seed)
    normal = g.normal(size=(n, 3))
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    # viewdir in the hemisphere of the normal
    v = g.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    flip = (np.sum(v * normal, axis=-1, keepdims=True) < 0)
    v = np.where(flip, -v, v)
    params = {
        "diffuse_albedo": g.uniform(0.05, 0.9, size=(n, 3)).astype(np.float32),
        "specular_albedo": g.uniform(0.05, 0.9, size=(n, 3)).astype(np.float32),
        "specular_roughness": g.uniform(0.02, 0.8, size=(n, 1)).astype(np.float32),
        "metallic": g.uniform(0, 1, size=(n, 1)).astype(np.float32),
        "dielectric": g.uniform(0, 1, size=(n, 1)).astype(np.float32),
        "metallic_eta": g.uniform(0.2, 4.5, size=(n, 1)).astype(np.float32),
        "metallic_k": g.uniform(0.2, 9.0, size=(n, 1)).astype(np.float32),
        "dielectric_eta": g.uniform(1.01, 1.9, size=(n, 1)).astype(np.float32),
        "material_vector": g.uniform(0, 1, size=(n, 4)).astype(np.float32),
    }
    distance = g.uniform(0.5, 3.0, size=(n, 1)).astype(np.float32)
    return (np.float32(20.0), distance, normal.astype(np.float32),
            v.astype(np.float32), params)


@need_ref
@pytest.mark.parametrize("name", ["ggx", "rough_plastic", "smooth_dielectric",
                                  "thin_dielectric", "smooth_conductor",
                                  "rough_conductor", "composite"])
def test_brdf_parity(name):
    from oracle import import_reference
    import_reference()
    import torch
    import models.renderer_ggx as R

    light, distance, normal, viewdir, params = _rand_shading()
    t = lambda x: torch.from_numpy(np.asarray(x))
    tp = {k: t(v) for k, v in params.items()}
    j = lambda x: jnp.asarray(x)
    jp = {k: j(v) for k, v in params.items()}

    if name == "ggx":
        ref = R.GGXColocatedRenderer()(t(light), t(distance), t(normal), t(viewdir), params=tp)
        ours = ggx_colocated(light, j(distance), j(normal), j(viewdir), jp)
    elif name == "rough_plastic":
        # The reference's RoughPlasticCoLocRenderer crashes: it passes a
        # python-float eta into fresnel_dielectric which indexes eta with a
        # mask (renderer_ggx.py:404,484).  Oracle-check the Fresnel term with
        # a tensor eta instead, and reconstruct the renderer from verified
        # reference pieces.
        dot = torch.clamp(torch.sum(t(normal) * t(viewdir), dim=-1, keepdim=True),
                          0.00001, 0.99999)
        eta_t = torch.full_like(dot, 1.48958738)
        F_ref = R.fresnel_dielectric(dot, dot, eta_t)
        from iron_tpu.shading.fresnel import fresnel_dielectric as our_fd
        np.testing.assert_allclose(
            np.asarray(our_fd(jnp.asarray(dot.numpy()), 1.48958738)),
            F_ref.numpy(), rtol=1e-5, atol=1e-7)
        # full-renderer check: rough_plastic == ggx with F swapped
        ours = rough_plastic_colocated(light, j(distance), j(normal), j(viewdir), jp)
        base = ggx_colocated(light, j(distance), j(normal), j(viewdir), jp)
        np.testing.assert_allclose(np.asarray(ours["diffuse_rgb"]),
                                   np.asarray(base["diffuse_rgb"]), rtol=1e-6)
        return
    elif name == "smooth_dielectric":
        ref = R.SmoothDielectricRenderer()(t(light), t(distance), t(normal), t(viewdir),
                                           tp["diffuse_albedo"], tp["specular_albedo"],
                                           tp["specular_roughness"])
        ours = smooth_dielectric(light, j(distance), j(normal), j(viewdir), jp)
    elif name == "thin_dielectric":
        ref = R.ThinDielectricRenderer()(t(light), t(distance), t(normal), t(viewdir),
                                         tp["diffuse_albedo"], tp["specular_albedo"],
                                         tp["specular_roughness"])
        ours = thin_dielectric(light, j(distance), j(normal), j(viewdir), jp)
    elif name == "smooth_conductor":
        ref = R.SmoothConductorCoLocRenderer(ior_path="/nonexistent")(
            t(light), t(distance), t(normal), t(viewdir),
            tp["diffuse_albedo"], tp["specular_albedo"], tp["specular_roughness"])
        ours = smooth_conductor_colocated(light, j(distance), j(normal), j(viewdir), jp)
    elif name == "rough_conductor":
        ref = R.RoughConductorCoLocRenderer(ior_path="/nonexistent")(
            t(light), t(distance), t(normal), t(viewdir),
            tp["diffuse_albedo"], tp["specular_albedo"], tp["specular_roughness"])
        ours = rough_conductor_colocated(light, j(distance), j(normal), j(viewdir), jp)
    elif name == "composite":
        # CompositeRenderer.__init__ globs ./resource/ior which is absent in
        # the reference repo; it tolerates the empty result.
        ref = R.CompositeRenderer()(t(light), t(distance), t(normal), t(viewdir), params=tp)
        ours = composite_colocated(light, j(distance), j(normal), j(viewdir), jp)
        # reference aliases diffuse_rgb to rgb via in-place add
        # (renderer_ggx.py:844-849): its "diffuse_rgb" == diffuse+specular.
        np.testing.assert_allclose(
            np.asarray(ours["diffuse_rgb"] + ours["specular_rgb"]),
            ref["diffuse_rgb"].numpy(), rtol=2e-4, atol=1e-5)
        for k in ["specular_rgb", "metallic_rgb", "dielectric_rgb", "rgb"]:
            np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                       rtol=2e-4, atol=1e-5, err_msg=f"{name}:{k}")
        return

    for k in ["diffuse_rgb", "specular_rgb", "rgb"]:
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   rtol=2e-4, atol=1e-5, err_msg=f"{name}:{k}")


@need_ref
def test_mixture_parity():
    """CoLocRenderer parity (renderer_ggx.py:31-58).  The reference's
    RoughPlasticCoLocRenderer crashes on its float-eta Fresnel indexing, so
    the oracle composition zeroes that component's weight and checks the
    3 runnable renderers' weighted blend + key layout."""
    from oracle import import_reference
    import_reference()
    import torch
    import models.renderer_ggx as R

    light, distance, normal, viewdir, params = _rand_shading(seed=5)
    mv = params["material_vector"].copy()
    mv[:, 0] = 0.0  # rough_plastic weight off (unrunnable in the reference)
    params["material_vector"] = mv

    t = lambda x: torch.from_numpy(np.asarray(x))
    tl, td, tn, tv = t(light), t(distance), t(normal), t(viewdir)
    da, sa, al = t(params["diffuse_albedo"]), t(params["specular_albedo"]), \
        t(params["specular_roughness"])
    res_di = R.SmoothDielectricRenderer()(tl, td, tn, tv, da, sa, al)
    res_rc = R.RoughConductorCoLocRenderer(ior_path="/nonexistent")(tl, td, tn, tv, da, sa, al)
    res_sc = R.SmoothConductorCoLocRenderer(ior_path="/nonexistent")(tl, td, tn, tv, da, sa, al)
    tmv = t(mv)
    ref_diffuse = (tmv[..., 1:2] * res_di["diffuse_rgb"]
                   + tmv[..., 2:3] * res_rc["diffuse_rgb"]
                   + tmv[..., 3:4] * res_sc["diffuse_rgb"])
    ref_specular = (tmv[..., 1:2] * res_di["specular_rgb"]
                    + tmv[..., 2:3] * res_rc["specular_rgb"]
                    + tmv[..., 3:4] * res_sc["specular_rgb"])

    j = lambda x: jnp.asarray(x)
    jp = {k: j(v) for k, v in params.items()}
    ours = mixture_colocated(light, j(distance), j(normal), j(viewdir), jp)
    # zero out the rough_plastic part like the reference composition
    np.testing.assert_allclose(np.asarray(ours["diffuse_rgb"]),
                               ref_diffuse.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["specular_rgb"]),
                               ref_specular.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["rgb"]),
                               (ref_diffuse + ref_specular).numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["material_map"]), mv, atol=0)


def test_disney_helpers_basic():
    """Disney-principled helper lobes (renderer_ggx.py:607-779): schlick
    endpoints, clearcoat NDF normalization trend, retro-diffuse limits."""
    from iron_tpu.shading.disney import (schlick_weight, schlick_r0_eta,
                                         calc_schlick, clearcoat_D,
                                         disney_diffuse, clearcoat_lobe)
    # schlick weight endpoints
    np.testing.assert_allclose(float(schlick_weight(jnp.asarray(1.0))), 0.0)
    np.testing.assert_allclose(float(schlick_weight(jnp.asarray(0.0))), 1.0)
    np.testing.assert_allclose(float(schlick_r0_eta(jnp.asarray(1.5))), 0.04, atol=1e-3)
    # calc_schlick interpolates R0 -> 1 as cos -> 0
    cos = jnp.asarray([[0.999999], [1e-4]])
    v = calc_schlick(0.04, cos, 1.5)
    np.testing.assert_allclose(np.asarray(v[0]), 0.04, atol=1e-4)
    # grazing limit: near-total reflectance (not exactly 1.0 — the
    # reference clamps eta into (0,1), reproduced for parity)
    assert float(v[1, 0]) > 0.9
    # clearcoat NDF sharpens with clearcoat -> 1
    d0 = float(clearcoat_D(jnp.asarray([[1.0]]), jnp.asarray([[0.0]]))[0, 0])
    d1 = float(clearcoat_D(jnp.asarray([[1.0]]), jnp.asarray([[1.0]]))[0, 0])
    assert d1 > 10 * d0
    # retro-diffuse is bounded and positive at normal incidence
    dd = disney_diffuse(jnp.asarray([[0.9]]), jnp.asarray([[0.3]]),
                        jnp.asarray([[0.5, 0.5, 0.5]]))
    assert np.all(np.asarray(dd) > 0)
    cc = clearcoat_lobe(jnp.asarray([[0.9]]), jnp.asarray([[0.5]]), 1.5)
    assert np.all(np.isfinite(np.asarray(cc))) and float(cc[0, 0]) > 0


def test_disney_flavor_shades():
    """The "disney" registry flavor runs end to end through shade_points."""
    import jax
    from iron_tpu.shading.materials import init_material_networks, shade_points
    params, cfgs = init_material_networks(jax.random.PRNGKey(0), "disney",
                                          d_feature=256)
    g = np.random.default_rng(0)
    n = 64
    pts = jnp.asarray(g.normal(size=(n, 3)), jnp.float32) * 0.3
    normals = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
    ray_o = jnp.asarray(np.tile([[0.0, 0.0, 3.0]], (n, 1)), jnp.float32)
    ray_d = pts - ray_o
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    feats = jnp.zeros((n, 256))
    out = shade_points("disney", params, cfgs, ray_o, ray_d, pts, normals, feats)
    assert out["color"].shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out["color"])))
    for k in ("metallic", "spec_tint", "clearcoat", "clearcoat_rgb"):
        assert k in out
