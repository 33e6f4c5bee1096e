"""Independent-oracle cross-validation (VERDICT r2 item 1).

The framework's golden synthetic renderer (its own sphere tracer +
shading.brdf.ggx_colocated) is cross-checked against the independent GT
renderer (native C++ marching tetrahedra + BVH ray casting + numpy GGX
written from the Mitsuba formulas, iron_tpu/eval/independent_gt.py).  The
two share no compute path, so agreement here certifies both — the analogue
of the reference validating against Mitsuba
(render_synthetic_data/render_rgb_flash_mat.py:57-80).
"""
import numpy as np
import pytest

from iron_tpu.eval.independent_gt import (render_independent_dataset,
                                          render_view_np, mesh_scene_np,
                                          SCENES_NP, ggx_colocated_np)

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


def _psnr(a, b, mask=None):
    if mask is not None:
        d = ((a - b) ** 2)[mask]
    else:
        d = (a - b) ** 2
    return -10.0 * np.log10(np.mean(d) + 1e-12)


def test_independent_np_ggx_matches_framework_brdf():
    """The numpy GGX re-implementation agrees with shading.brdf.ggx_colocated
    pointwise (same model, disjoint code)."""
    import jax.numpy as jnp
    from iron_tpu.shading.brdf import ggx_colocated

    g = np.random.default_rng(0)
    n = g.normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = n + 0.3 * g.normal(size=(256, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dist = g.uniform(1.0, 4.0, size=(256, 1)).astype(np.float32)
    da = g.uniform(0.1, 0.9, size=(256, 3)).astype(np.float32)
    sa = g.uniform(0.1, 0.9, size=(256, 3)).astype(np.float32)
    rough = g.uniform(0.05, 0.7, size=(256, 1)).astype(np.float32)

    ours = ggx_colocated(30.0, jnp.asarray(dist), jnp.asarray(n, jnp.float32),
                         jnp.asarray(v, jnp.float32),
                         {"diffuse_albedo": jnp.asarray(da),
                          "specular_albedo": jnp.asarray(sa),
                          "specular_roughness": jnp.asarray(rough)})
    indep = ggx_colocated_np(30.0, dist, n, v, da, sa, rough)
    np.testing.assert_allclose(np.asarray(ours["rgb"]), indep["rgb"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scene", ["sphere", "torus"])
def test_independent_renderer_crossvalidates_golden(scene):
    """Full-image agreement between the system-under-test renderer and the
    independent BVH renderer on analytic scenes."""
    from iron_tpu.data.synthetic import render_synthetic_dataset

    H = W = 96
    golden = render_synthetic_dataset(scene, n_views=2, H=H, W=W, light=30.0)
    sdf_np = SCENES_NP[scene]()
    verts, tris = mesh_scene_np(sdf_np, resolution=256)
    assert len(tris) > 1000

    for i in range(2):
        indep = render_view_np(verts, tris, sdf_np, golden["Ks"][i],
                               golden["W2Cs"][i], H, W, light=30.0)
        g_mask = golden["masks"][i, ..., 0] > 0.5
        i_mask = indep["mask"]
        iou = (g_mask & i_mask).sum() / max((g_mask | i_mask).sum(), 1)
        assert iou > 0.97, f"mask IoU {iou:.3f}"
        # compare interiors (1px-eroded common mask: silhouette pixels
        # differ by construction — edge compositing vs hard mesh hits)
        common = g_mask & i_mask
        er = common.copy()
        er[1:] &= common[:-1]; er[:-1] &= common[1:]
        er[:, 1:] &= common[:, :-1]; er[:, :-1] &= common[:, 1:]
        psnr = _psnr(golden["images"][i], np.asarray(indep["color"]),
                     mask=er)
        assert psnr > 34.0, f"interior PSNR {psnr:.2f} dB"


def test_independent_dataset_schema():
    d = render_independent_dataset("sphere", n_views=2, H=48, W=48,
                                   mesh_resolution=128)
    assert d["images"].shape == (2, 48, 48, 3)
    assert d["masks"].shape == (2, 48, 48, 1)
    assert d["images"].max() > 0.05
    assert 0.05 < d["masks"].mean() < 0.9
