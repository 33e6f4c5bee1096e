from iron_tpu.eval.metrics import psnr_np, ssim_np, lpips_np, chamfer_distance, eval_image_folder
