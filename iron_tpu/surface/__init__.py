from iron_tpu.surface.tracer import TracerConfig, sphere_trace, ray_sampler, bisection, raytrace
from iron_tpu.surface.reparam import reparam_points
