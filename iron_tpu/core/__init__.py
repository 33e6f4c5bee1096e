from iron_tpu.core.embedder import positional_encoding, pe_dim
from iron_tpu.core.camera import Camera, make_camera, get_rays, project, crop_camera, resize_camera, pixel_grid
from iron_tpu.core.rays import intersect_sphere
