from iron_tpu.data.io import read_image, write_image, to8b, gamma_correction, inv_gamma_correction
from iron_tpu.data.cameras import load_cam_dict, get_tf_cams, normalize_cam_dict, transform_pose
from iron_tpu.data.dataset import RayDataset, load_image_folder, near_far_from_sphere
