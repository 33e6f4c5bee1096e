from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply, sdf_only, sdf_value_feat_grad, sdf_grad
from iron_tpu.fields.rendering import RenderingConfig, init_rendering, rendering_apply
from iron_tpu.fields.nerf import NeRFConfig, init_nerf, nerf_apply
from iron_tpu.fields.scalars import init_variance, variance_apply, init_point_light, point_light_apply
