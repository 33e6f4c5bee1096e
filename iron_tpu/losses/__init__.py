from iron_tpu.losses.image import pyramid_l2_loss, ssim_loss, psnr
from iron_tpu.losses.regularizers import (eikonal_loss, roughness_range_loss,
                                          metal_eta_k_loss, dielectric_eta_loss,
                                          mask_bce_loss)
