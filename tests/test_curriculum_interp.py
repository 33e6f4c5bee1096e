"""Curriculum trainer + view-interpolation tests."""
import os

import numpy as np
import pytest
import jax

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.train.stage2 import Stage2Config
from iron_tpu.train.curriculum import CurriculumTrainer, CurriculumPhase
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.volume.integrator import NeuSRenderConfig


def test_curriculum_phases_freeze_correct_nets():
    data = render_synthetic_dataset("sphere", n_views=3, H=48, W=48, light=30.0)
    from iron_tpu.surface.tracer import TracerConfig
    cfg = Stage2Config(renderer_name="comp", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=32, edge_side_fallback_budget=16,
                           tracer=TracerConfig(sphere_tracing_iters=16,
                                               dense_iters=8,
                                               fallback_budget=64)))
    cur = CurriculumTrainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                            phases=[CurriculumPhase("rgb", 2),
                                    CurriculumPhase("refrac", 2),
                                    CurriculumPhase("env", 2)])
    import jax.tree_util as jtu

    m = cur.run(log_every=0)
    assert np.isfinite(m["loss"])
    assert cur.step == 6
    assert cur.params is not None


def test_interpolated_view_rays():
    data = render_synthetic_dataset("sphere", n_views=4, H=32, W=32, light=30.0)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])
    ro, rd = ds.gen_rays_between(0, 1, 0.5, resolution_level=2)
    assert ro.shape == (16, 16, 3) and rd.shape == (16, 16, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rd), axis=-1), 1.0, atol=1e-5)
    # midpoint origin lies between the two camera centers
    c0 = np.linalg.inv(np.asarray(ds.W2Cs[0]))[:3, 3]
    c1 = np.linalg.inv(np.asarray(ds.W2Cs[1]))[:3, 3]
    np.testing.assert_allclose(np.asarray(ro[0, 0]), (c0 + c1) / 2, atol=1e-5)
    # endpoints reproduce the original cameras
    ro0, rd0 = ds.gen_rays_between(0, 1, 0.0, resolution_level=2)
    np.testing.assert_allclose(np.asarray(ro0[0, 0]), c0, atol=1e-5)


@pytest.mark.slow
def test_interpolate_view_video(tmp_path):
    data = render_synthetic_dataset("sphere", n_views=4, H=32, W=32, light=30.0)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])
    cfg = Stage1Config(end_iter=4, warm_up_end=1, anneal_end=2, batch_size=32,
                       render=NeuSRenderConfig(n_samples=8, n_importance=8,
                                               n_outside=0, up_sample_steps=2,
                                               perturb=1.0))
    tr = Stage1Trainer(cfg, ds)
    out = str(tmp_path / "interp.mp4")
    tr.interpolate_view_video(0, 1, out, n_frames=3, resolution_level=4)
    assert os.path.exists(out) and os.path.getsize(out) > 0
