"""Format the round-5 A/B results into the results/README table.

Reads results/quality_{scene}_r5_{control,sil}.json and prints a markdown
table plus the A/B verdict lines (chamfer at 50k, best step, erosion
delta, miss/excess counts).
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results")


def fmt(scene, arm):
    p = os.path.join(RES, f"quality_{scene}_r5_{arm}.json")
    if not os.path.exists(p):
        return None
    r = json.load(open(p))
    traj = r.get("chamfer_trajectory", {})
    s2 = {int(k.split("_")[1]): v for k, v in traj.items()
          if k.startswith("stage2_")}
    final_ch = r.get("chamfer")
    best_step_ch = min(s2, key=lambda k: s2[k]["chamfer"]) if s2 else None
    best = r.get("best") or {}
    row = {
        "scene": scene, "arm": arm,
        "psnr_final": r.get("test_psnr"),
        "ssim_final": r.get("test_ssim"),
        "chamfer_final": final_ch,
        "chamfer_best": s2[best_step_ch]["chamfer"] if best_step_ch else None,
        "chamfer_best_step": best_step_ch,
        "psnr_best_ckpt": best.get("heldout_psnr"),
        "best_ckpt_step": best.get("step"),
        "chamfer_at_best_ckpt": best.get("chamfer"),
        "rays_per_s": (r.get("stage2") or {}).get("rays_per_s"),
        "mask_miss_final": None,
        "materials": r.get("materials"),
    }
    return row, s2


def main():
    print("| scene | arm | PSNR 50k | chamfer 50k | best chamfer (step) | "
          "best-ckpt PSNR (step) | chamfer @ best ckpt |")
    print("|---|---|---|---|---|---|---|")
    for scene in ("torus", "sphere", "blobby", "genus2"):
        for arm in ("control", "sil"):
            out = fmt(scene, arm)
            if out is None:
                continue
            row, s2 = out
            print(f"| {scene} | {arm} | {row['psnr_final']:.2f} | "
                  f"{row['chamfer_final']:.4f} | "
                  f"{row['chamfer_best']:.4f} ({row['chamfer_best_step']}) | "
                  + (f"{row['psnr_best_ckpt']:.2f} ({row['best_ckpt_step']}) | "
                     if row['psnr_best_ckpt'] else "- | ")
                  + (f"{row['chamfer_at_best_ckpt']:.4f} |"
                     if row['chamfer_at_best_ckpt'] else "- |"))
    print()
    for scene in ("torus", "sphere", "blobby", "genus2"):
        for arm in ("control", "sil"):
            out = fmt(scene, arm)
            if out is None:
                continue
            row, s2 = out
            steps = sorted(s2)
            curve = " ".join(f"{k//1000}k:{s2[k]['chamfer']:.4f}" for k in steps)
            print(f"{scene}/{arm} trajectory: {curve}")
            if row["materials"]:
                m = row["materials"]
                print(f"  materials: rough_err {m['roughness_abs_err']:.3f} "
                      f"light*diffuse rel {m['light_diffuse_product_rel_err']:.3f} "
                      f"chroma_l1 {m['diffuse_chroma_l1']:.3f}")


if __name__ == "__main__":
    main()
