from iron_tpu.volume.sampling import sample_pdf, up_sample, cat_z_vals
from iron_tpu.volume.integrator import NeuSRenderConfig, neus_render, render_core, render_core_outside
