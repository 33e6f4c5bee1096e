"""Format the round-4 independent-GT quality-run table for results/README
from results/quality_*_r4_independent.json."""
import glob
import json
import os
import sys

rows = []
for p in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                       "results", "quality_*_r4_independent.json"))):
    r = json.load(open(p))
    scene = r["scene"]
    s1 = r.get("stage1", {})
    s2 = r.get("stage2", {})
    rows.append(
        f"| {scene} | {r['test_psnr']:.2f} | {r['test_ssim']:.4f} | "
        f"{r['chamfer']:.4f} | {s1.get('iters_per_s', 0):.1f} it/s "
        f"({s1.get('wall_s', 0) / 3600:.2f} h) | "
        f"{s2.get('rays_per_s', 0) / 1e3:.0f}k rays/s "
        f"({s2.get('wall_s', 0) / 60:.0f} min) | {r['gt_source']} |")

print("| scene | held-out PSNR | SSIM | Chamfer | stage-1 | stage-2 | GT |")
print("|---|---|---|---|---|---|---|")
for row in rows:
    print(row)
