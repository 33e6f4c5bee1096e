"""Evaluation CLI — `evaluation/eval_image_folder.py` + `eval_mesh.py`
equivalents.

  python -m iron_tpu.cli.evaluate images --pred_dir P --gt_dir G [--out metrics.txt]
  python -m iron_tpu.cli.evaluate mesh --mesh1 a.obj --mesh2 b.obj
  python -m iron_tpu.cli.evaluate relight --mesh mesh.obj --materials DIR \
      --cam_dict cams.json --out_dir OUT [--light_pos x y z]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    ip = sub.add_parser("images")
    ip.add_argument("--pred_dir", required=True)
    ip.add_argument("--gt_dir", required=True)
    ip.add_argument("--out", default=None)

    mp = sub.add_parser("mesh")
    mp.add_argument("--mesh1", required=True)
    mp.add_argument("--mesh2", required=True)

    rp = sub.add_parser("relight")
    rp.add_argument("--mesh", required=True)
    rp.add_argument("--materials", required=True)
    rp.add_argument("--cam_dict", required=True)
    rp.add_argument("--out_dir", required=True)
    rp.add_argument("--light", type=float, default=30.0)
    rp.add_argument("--light_pos", type=float, nargs=3, default=None)

    args = p.parse_args(argv)

    if args.cmd == "images":
        from iron_tpu.eval.metrics import eval_image_folder
        summary = eval_image_folder(args.pred_dir, args.gt_dir, args.out)
        print(json.dumps(summary))
    elif args.cmd == "mesh":
        from iron_tpu.eval.metrics import chamfer_distance
        from iron_tpu.export.mesh import read_obj
        v1, t1, _, _ = read_obj(args.mesh1)
        v2, t2, _, _ = read_obj(args.mesh2)
        print(json.dumps({"chamfer": chamfer_distance(v1, t1, v2, t2)}))
    elif args.cmd == "relight":
        from iron_tpu.eval.relight import render_mesh_flash
        from iron_tpu.data.cameras import load_cam_dict
        from iron_tpu.data.io import write_image
        from iron_tpu.core.camera import make_camera
        os.makedirs(args.out_dir, exist_ok=True)
        cams = load_cam_dict(args.cam_dict)
        for name, entry in cams.items():
            W, H = entry["img_size"]
            cam = make_camera(entry["K"], entry["W2C"], H, W)
            res = render_mesh_flash(args.mesh, args.materials, cam,
                                    light=args.light,
                                    light_pos=None if args.light_pos is None
                                    else np.asarray(args.light_pos))
            stem = os.path.splitext(name)[0]
            write_image(os.path.join(args.out_dir, stem + ".png"), res["color"])
        print(f"rendered {len(cams)} relit views to {args.out_dir}")


if __name__ == "__main__":
    main()
