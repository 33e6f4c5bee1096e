"""Volume integrator tests: sample_pdf parity, analytic-SDF compositing."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.volume import sample_pdf, up_sample, cat_z_vals, neus_render, NeuSRenderConfig
from conftest import has_reference

need_ref = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_sample_pdf_uniform_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(4, axis=0)
    weights = jnp.ones((4, 8))
    s = sample_pdf(bins, weights, 16, det=True)
    # uniform weights -> near-uniform stratified samples
    assert s.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(s[0]),
                               np.linspace(0.5 / 16, 1 - 0.5 / 16, 16), atol=0.02)


def test_sample_pdf_concentrates():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :]
    weights = jnp.zeros((1, 8)).at[0, 3].set(100.0)
    s = sample_pdf(bins, weights, 32, det=True)
    frac_in_bin = np.mean((np.asarray(s) >= 3 / 8) & (np.asarray(s) <= 4 / 8))
    assert frac_in_bin > 0.9


@need_ref
def test_sample_pdf_parity():
    from oracle import import_reference
    import_reference()
    import torch
    from models.renderer import sample_pdf as ref_sample_pdf

    g = np.random.default_rng(0)
    bins = np.sort(g.uniform(0, 2, size=(8, 65)), axis=-1).astype(np.float32)
    weights = g.uniform(0, 1, size=(8, 64)).astype(np.float32)
    ref = ref_sample_pdf(torch.from_numpy(bins), torch.from_numpy(weights), 16, det=True).numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16, det=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def _sphere_setup(batch=8):
    g = np.random.default_rng(1)
    # rays from a ring at radius 3 towards the origin; unit-sphere target r=0.5
    theta = g.uniform(0, 2 * np.pi, size=batch)
    ray_o = np.stack([3 * np.cos(theta), 3 * np.sin(theta), np.zeros(batch)], axis=-1)
    ray_d = -ray_o / np.linalg.norm(ray_o, axis=-1, keepdims=True)
    return jnp.asarray(ray_o, jnp.float32), jnp.asarray(ray_d, jnp.float32)


def test_neus_render_sphere_depth():
    """With an analytic sphere SDF and high inv_s, the expected depth from
    the compositing weights must hit the sphere surface."""
    r = 0.5
    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - r

    def sdf_all_fn(p):
        v = sdf_fn(p)
        g = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-9)
        feat = jnp.zeros(p.shape[:-1] + (8,))
        return v, feat, g

    color_fn = lambda pts, grads, dirs, feat: jnp.ones(pts.shape[:-1] + (3,)) * 0.7

    ray_o, ray_d = _sphere_setup()
    near = jnp.full((8, 1), 2.0)
    far = jnp.full((8, 1), 4.0)
    cfg = NeuSRenderConfig(n_samples=64, n_importance=64, n_outside=0,
                           up_sample_steps=4, perturb=0.0)
    out = neus_render(ray_o, ray_d, near, far, sdf_fn=sdf_fn, sdf_all_fn=sdf_all_fn,
                      color_fn=color_fn, inv_s=jnp.asarray(400.0), cfg=cfg)
    w = out["weights"][:, :out["z_vals"].shape[1]]
    z = out["z_vals"]
    depth = np.asarray(jnp.sum(w * (z + 0.5 * (2.0 / 64)), axis=-1) / (jnp.sum(w, axis=-1) + 1e-9))
    np.testing.assert_allclose(depth, 2.5, atol=0.03)
    np.testing.assert_allclose(np.asarray(out["color_fine"]),
                               np.broadcast_to(0.7 * np.asarray(out["weight_sum"]), (8, 3)),
                               atol=0.05)
    # eikonal error of a true SDF is ~0 (rays pass the sphere center where
    # the analytic gradient is singular, hence the loose bound)
    assert float(out["gradient_error"]) < 1e-2


def test_neus_render_grad_flows():
    """Gradients must flow to a parameterized SDF through the full render."""
    ray_o, ray_d = _sphere_setup(4)
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 4.0)
    cfg = NeuSRenderConfig(n_samples=32, n_importance=16, n_outside=0,
                           up_sample_steps=2, perturb=0.0)

    def loss_fn(radius):
        sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - radius

        def sdf_all_fn(p):
            # keep grad path to radius through sdf value
            n = jnp.linalg.norm(p, axis=-1)
            return n - radius, jnp.zeros(p.shape[:-1] + (4,)), p / (n[..., None] + 1e-9)

        color_fn = lambda pts, grads, dirs, feat: jnp.ones(pts.shape[:-1] + (3,))
        out = neus_render(ray_o, ray_d, near, far, sdf_fn=sdf_fn, sdf_all_fn=sdf_all_fn,
                          color_fn=color_fn, inv_s=jnp.asarray(100.0), cfg=cfg)
        return jnp.mean(out["weight_sum"])

    g = jax.grad(loss_fn)(jnp.asarray(0.5))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6
