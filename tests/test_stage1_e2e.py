"""Stage-1 end-to-end: train a NeuS SDF on a synthetic flash dataset and
verify the loss drops, PSNR rises, and geometry approaches the GT sphere."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.fields.sdf import sdf_only
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.volume.integrator import NeuSRenderConfig

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_stage1_learns_sphere(tmp_path):
    """Train from a deliberately-wrong geometric init (bias 0.3) towards a
    GT sphere of radius 0.45; the SDF zero set must move outward."""
    from iron_tpu.fields.sdf import SDFConfig

    data = render_synthetic_dataset("sphere", n_views=10, H=64, W=64, light=30.0,
                                    radius=0.45)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])

    cfg = Stage1Config(
        end_iter=200, warm_up_end=30, anneal_end=100, batch_size=128,
        sdf=SDFConfig(bias=0.3),
        render=NeuSRenderConfig(n_samples=16, n_importance=16, n_outside=0,
                                up_sample_steps=2, perturb=1.0),
        save_freq=10_000)
    tr = Stage1Trainer(cfg, ds, out_dir=str(tmp_path))

    probe = jnp.asarray([[0.45, 0, 0], [0, 0.45, 0], [0, 0, 0.45],
                         [-0.45, 0, 0], [0, -0.45, 0]], jnp.float32)
    err_init = float(np.mean(np.abs(np.asarray(
        sdf_only(tr.params["sdf"], probe, cfg.sdf)))))

    m0 = tr.run(num_iters=5)
    m1 = tr.run(num_iters=195)
    assert m1["loss"] < m0["loss"] * 0.9
    assert m1["psnr"] > m0["psnr"] + 1.0

    err_final = float(np.mean(np.abs(np.asarray(
        sdf_only(tr.params["sdf"], probe, cfg.sdf)))))
    # zero set moved toward GT (~30% closer in 200 tiny iters; full runs use
    # 100k iters, confs/womask_iron.conf:20)
    assert err_final < err_init * 0.8

    # inside negative, outside positive
    assert float(sdf_only(tr.params["sdf"], jnp.zeros((1, 3)), cfg.sdf)[0]) < 0
    assert float(sdf_only(tr.params["sdf"], jnp.asarray([[0.0, 0.0, 0.9]]), cfg.sdf)[0]) > 0

    # checkpoint roundtrip
    tr.save()
    step = tr.step
    tr2 = Stage1Trainer(cfg, ds, out_dir=str(tmp_path))
    assert tr2.resume() == step
    v1 = np.asarray(sdf_only(tr.params["sdf"], probe, cfg.sdf))
    v2 = np.asarray(sdf_only(tr2.params["sdf"], probe, cfg.sdf))
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_stage1_step_runs_and_is_finite():
    data = render_synthetic_dataset("sphere", n_views=4, H=32, W=32, light=30.0)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])
    cfg = Stage1Config(end_iter=10, warm_up_end=2, anneal_end=5, batch_size=64,
                       render=NeuSRenderConfig(n_samples=16, n_importance=16,
                                               n_outside=8, up_sample_steps=2,
                                               perturb=1.0))
    tr = Stage1Trainer(cfg, ds)
    m = tr.run(num_iters=3)
    assert np.isfinite(m["loss"])
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_stage1_upsample_pallas_flag_gated_off_device():
    """upsample_pallas=True must be a no-op off-TPU (pallas_available gates
    it), so CPU runs produce identical renders with the flag on or off."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iron_tpu.train.stage1 import (Stage1Config, init_stage1_params,
                                       stage1_render)
    from iron_tpu.fields.sdf import SDFConfig

    from iron_tpu.volume.integrator import NeuSRenderConfig
    cfg = Stage1Config(
        render=NeuSRenderConfig(n_samples=8, n_importance=8,
                                up_sample_steps=2, n_outside=0, perturb=0.0),
    )
    params = init_stage1_params(jax.random.PRNGKey(0), cfg)
    rays_o = jnp.array([[0.0, 0.0, 2.0]] * 4)
    rays_d = jnp.array([[0.0, 0.0, -1.0]] * 4)
    near = jnp.full((4, 1), 1.0)
    far = jnp.full((4, 1), 3.0)
    out_off = stage1_render(params, cfg, rays_o, rays_d, near, far,
                            None, 1.0, None, perturb_overwrite=0.0)
    cfg_on = dc.replace(cfg, upsample_pallas=True)
    out_on = stage1_render(params, cfg_on, rays_o, rays_d, near, far,
                           None, 1.0, None, perturb_overwrite=0.0)
    np.testing.assert_allclose(np.asarray(out_on["color_fine"]),
                               np.asarray(out_off["color_fine"]), atol=1e-7)
