"""iron_tpu — a TPU-native inverse-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IRON
(Zhang et al., CVPR 2022; reference fork arthurlirui/IRON):

  * stage 1: NeuS-style volumetric SDF training (hierarchical sampling,
    SDF->alpha compositing, background NeRF);
  * stage 2: sphere-traced surface rendering with implicit-function
    differentiation through the ray-surface intersection, analytic
    co-located GGX / conductor / composite BRDFs, and edge-aware
    silhouette sampling;
  * export of meshes + UV material textures, PSNR/SSIM/Chamfer evaluation;
  * ray-sharded data-parallel training over a `jax.sharding.Mesh`.

Everything on the compute path is fixed-shape and mask-carried so it maps
onto XLA/TPU (no boolean compaction); hot paths have Pallas kernels in
`iron_tpu.kernels`.
"""

__version__ = "0.1.0"

# Platform override for CLI/script runs: the container's sitecustomize
# force-registers the TPU PJRT plugin and resets JAX_PLATFORMS, so the env
# var alone cannot select CPU (tests/conftest.py works around it the same
# way).  IRON_PLATFORM=cpu runs any iron_tpu entry point on host CPU.
import os as _os

if _os.environ.get("IRON_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["IRON_PLATFORM"])
