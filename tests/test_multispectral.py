"""Dual-spectrum stage-1 trainer tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.train.stage1 import Stage1Config
from iron_tpu.train.stage1_multispectral import (MultiSpectralConfig,
                                                 MultiSpectralStage1Trainer)
from iron_tpu.volume.integrator import NeuSRenderConfig

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


def _datasets():
    rgb = render_synthetic_dataset("sphere", n_views=3, H=32, W=32, light=30.0)
    nir = render_synthetic_dataset("sphere", n_views=3, H=32, W=32, light=20.0)
    # fake NIR: single-band replicated
    nir_imgs = np.repeat(nir["images"].mean(-1, keepdims=True), 3, axis=-1)
    return {
        "rgb": RayDataset.from_arrays(rgb["images"], rgb["Ks"], rgb["W2Cs"], rgb["masks"]),
        "nir": RayDataset.from_arrays(nir_imgs, nir["Ks"], nir["W2Cs"], nir["masks"]),
    }


def _cfg():
    base = Stage1Config(end_iter=4, warm_up_end=1, anneal_end=2, batch_size=32,
                        render=NeuSRenderConfig(n_samples=8, n_importance=8,
                                                n_outside=4, up_sample_steps=2,
                                                perturb=1.0))
    return MultiSpectralConfig(base=base, rgb_iters=3, nir_iters=3)


def test_curriculum_runs_and_shares_sdf(tmp_path):
    tr = MultiSpectralStage1Trainer(_cfg(), _datasets(), out_dir=str(tmp_path))
    sdf0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tr.params["sdf"])]
    nirc0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(tr.params["color_nir"])]

    m = tr.run_phase("rgb", 3)
    assert np.isfinite(m["loss"])
    sdf1 = jax.tree_util.tree_leaves(tr.params["sdf"])
    nirc1 = jax.tree_util.tree_leaves(tr.params["color_nir"])
    # rgb phase trains the sdf but not the nir color net
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in zip(sdf0, sdf1))
    assert all(np.array_equal(a, np.asarray(b)) for a, b in zip(nirc0, nirc1))

    m = tr.run_phase("nir", 3)
    assert np.isfinite(m["loss"])
    nirc2 = jax.tree_util.tree_leaves(tr.params["color_nir"])
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in zip(nirc0, nirc2))

    tr.save()
    # cross-modality handoff: fresh trainer pulls sdf from the "rgb" ckpt dir
    tr2 = MultiSpectralStage1Trainer(_cfg(), _datasets())
    tr2.load_cross_modality(rgb_ckpt_dir=str(tmp_path), nir_ckpt_dir=str(tmp_path))
    a = jax.tree_util.tree_leaves(tr2.params["sdf"])
    b = jax.tree_util.tree_leaves(tr.params["sdf"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
