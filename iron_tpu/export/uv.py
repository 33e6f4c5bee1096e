"""UV parameterization.

The reference shells out to headless Blender Smart-UV-Project
(`models/export_uv.py`, invoked at render_surface.py:426-428 and
auto-downloaded by ckpt_loader.py:68-74).  This image has neither Blender
nor network egress, so the built-in parameterization is a dependency-free
per-face grid atlas: every triangle gets its own square cell in a regular
grid, with the triangle drawn inside the cell with a small margin.  Texel
efficiency is lower than a smart unwrap but baking/relighting are exact
(each surface point has a unique UV and charts never bleed).  If a
`blender` binary is on PATH it is used instead.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Tuple

import numpy as np


def grid_uv_unwrap(verts: np.ndarray, tris: np.ndarray, margin: float = 0.15
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face grid atlas.  Returns (uvs [3T, 2], tri_uvs [T, 3])."""
    T = len(tris)
    cells = int(np.ceil(np.sqrt(T)))
    cell = 1.0 / cells
    idx = np.arange(T)
    cx = (idx % cells).astype(np.float32)
    cy = (idx // cells).astype(np.float32)
    # triangle corners inside each cell (left-lower right-lower top)
    local = np.asarray([[margin, margin],
                        [1.0 - margin, margin],
                        [margin, 1.0 - margin]], np.float32)
    uvs = (np.stack([cx, cy], axis=-1)[:, None, :] + local[None]) * cell
    uvs = uvs.reshape(-1, 2)
    tri_uvs = np.arange(3 * T, dtype=np.int32).reshape(T, 3)
    return uvs, tri_uvs


def blender_available() -> bool:
    return shutil.which("blender") is not None


def unwrap_obj(in_path: str, out_path: str) -> None:
    """UV-unwrap an .obj.  Uses Blender smart-project when available,
    otherwise the grid atlas."""
    from iron_tpu.export.mesh import read_obj, write_obj

    if blender_available():
        script = (
            "import bpy, sys\n"
            "argv = sys.argv[sys.argv.index('--')+1:]\n"
            "bpy.ops.object.select_all(action='SELECT')\n"
            "bpy.ops.object.delete()\n"
            "bpy.ops.import_scene.obj(filepath=argv[0])\n"
            "for obj in bpy.context.scene.objects:\n"
            "    bpy.context.view_layer.objects.active = obj\n"
            "    bpy.ops.object.mode_set(mode='EDIT')\n"
            "    bpy.ops.mesh.select_all(action='SELECT')\n"
            "    bpy.ops.uv.smart_project()\n"
            "    bpy.ops.object.mode_set(mode='OBJECT')\n"
            "bpy.ops.export_scene.obj(filepath=argv[1])\n")
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(script)
            spath = f.name
        try:
            subprocess.run(["blender", "--background", "--python", spath,
                            "--", in_path, out_path], check=True,
                           capture_output=True)
            return
        except subprocess.CalledProcessError:
            pass
        finally:
            os.unlink(spath)

    verts, tris, _, _ = read_obj(in_path)
    uvs, tri_uvs = grid_uv_unwrap(verts, tris)
    write_obj(out_path, verts, tris, uvs=uvs, tri_uvs=tri_uvs)
