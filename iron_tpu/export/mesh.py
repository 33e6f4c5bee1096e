"""Mesh extraction & export.

Behavioral spec from reference `models/export_mesh.py:50-130` (export_mesh):
two-pass extraction — low-res 100^3 marching cubes, keep the largest
connected component, sample 10k surface points, PCA-align a tight grid,
re-run marching cubes at `resolution` in the aligned frame, transform back,
write .obj.  `extract_geometry` mirrors models/renderer.py:34-42 (field is
-sdf, threshold 0).

Native path: iso-surfacing runs in the C++ runtime
(iron_tpu/native/mesh_native.cpp) since neither PyMCubes nor skimage is
available; connected components via scipy.sparse.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components

from iron_tpu.native import marching_cubes


def _eval_sdf_grid(sdf_fn: Callable, pts: np.ndarray, chunk: int = 200_000) -> np.ndarray:
    """Chunked SDF evaluation (chunk size per raytracer.py:153)."""
    out = []
    n = pts.shape[0]
    pad = (-n) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), pts.dtype)], 0)
    eval_jit = jax.jit(lambda p: sdf_fn(p))
    for i in range(0, pts_p.shape[0], chunk):
        out.append(np.asarray(eval_jit(jnp.asarray(pts_p[i:i + chunk]))))
    return np.concatenate(out)[:n]


def extract_geometry(sdf_fn: Callable, bound_min=(-1, -1, -1), bound_max=(1, 1, 1),
                     resolution: int = 128, threshold: float = 0.0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Marching cubes of the SDF zero set (renderer.py:34-42 semantics:
    query = -sdf, surface at `threshold`)."""
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    axes = [np.linspace(bound_min[d], bound_max[d], resolution, dtype=np.float32)
            for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    field = _eval_sdf_grid(sdf_fn, pts).reshape(resolution, resolution, resolution)
    spacing = (bound_max - bound_min) / (resolution - 1)
    # inside = sdf < 0  <=>  -sdf > threshold
    return marching_cubes(field, origin=bound_min, spacing=spacing, iso=-threshold)


def largest_component(verts: np.ndarray, tris: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the connected component with the largest surface area
    (export_mesh.py:76-79)."""
    if len(tris) == 0:
        return verts, tris
    n = len(verts)
    i = np.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]])
    j = np.concatenate([tris[:, 1], tris[:, 2], tris[:, 0]])
    adj = sp.coo_matrix((np.ones_like(i), (i, j)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    tri_label = labels[tris[:, 0]]
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    best = np.argmax(np.bincount(tri_label, weights=area))
    keep = tri_label == best
    tris = tris[keep]
    used = np.unique(tris)
    remap = np.full(n, -1, np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[tris].astype(np.int32)


def orient_faces(verts: np.ndarray, tris: np.ndarray,
                 sdf_fn: Callable = None) -> np.ndarray:
    """Make triangle winding consistent across each connected component,
    then globally outward (positive enclosed volume; or, when `sdf_fn` is
    given, normals pointing toward increasing SDF).

    The native marching-tetrahedra emits per-tet triangles with
    inconsistent winding (measured 56/44 outward/inward on a sphere),
    which breaks any orientation consumer — normal-clustered UV charting,
    exported .obj shading, signed volume.  BFS over edge-adjacency:
    a shared edge must appear in OPPOSITE vertex order in its two faces.
    """
    tris = np.asarray(tris, np.int64).copy()
    T = len(tris)
    # directed-edge map: for each face, its 3 directed edges
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    face_of = np.tile(np.arange(T), 3)
    und = np.sort(edges, axis=1)
    order = np.lexsort((und[:, 1], und[:, 0]))
    e_s, f_s, dir_s = und[order], face_of[order], (edges[:, 0] < edges[:, 1])[order]
    same = np.all(e_s[1:] == e_s[:-1], axis=1)
    # neighbor pairs + whether their shared edge runs in the same direction
    pair_a, pair_b = f_s[:-1][same], f_s[1:][same]
    same_dir = dir_s[:-1][same] == dir_s[1:][same]
    adj = [[] for _ in range(T)]
    for a, b, sd in zip(pair_a, pair_b, same_dir):
        adj[a].append((b, sd))
        adj[b].append((a, sd))

    flip = np.zeros(T, bool)
    seen = np.zeros(T, bool)
    for seed in range(T):
        if seen[seed]:
            continue
        seen[seed] = True
        frontier = [seed]
        while frontier:
            nxt = []
            for f in frontier:
                for nb, sd in adj[f]:
                    if not seen[nb]:
                        seen[nb] = True
                        # consistent orientation = shared edge in opposite
                        # direction; same direction means exactly one of the
                        # two faces must flip
                        flip[nb] = flip[f] ^ sd
                        nxt.append(nb)
            frontier = nxt
    tris[flip] = tris[flip][:, ::-1]

    # global orientation: outward = positive signed volume
    v = np.asarray(verts, np.float64)
    p0, p1, p2 = v[tris[:, 0]], v[tris[:, 1]], v[tris[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", p0, np.cross(p1, p2))) / 6.0
    if sdf_fn is not None:
        fn = np.cross(p1 - p0, p2 - p0)
        c = (p0 + p1 + p2) / 3.0
        nn = fn / np.clip(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20, None)
        h = 1e-3
        d = np.asarray(sdf_fn((c + h * nn).astype(np.float32))) - \
            np.asarray(sdf_fn((c - h * nn).astype(np.float32)))
        if np.mean(d > 0) < 0.5:
            tris = tris[:, ::-1]
    elif vol < 0:
        tris = tris[:, ::-1]
    return tris


def sample_mesh_points(verts: np.ndarray, tris: np.ndarray, n: int,
                       rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Area-weighted surface sampling (export_materials.py:13-56 scheme)."""
    rng = rng or np.random.default_rng(0)
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    p = area / area.sum()
    idx = rng.choice(len(tris), size=n, p=p)
    r = rng.random((n, 2))
    s = np.sqrt(r[:, :1])
    return ((1 - s) * a[idx] + s * (1 - r[:, 1:]) * b[idx] + s * r[:, 1:] * c[idx]
            ).astype(np.float32)


def export_mesh(sdf_fn: Callable, mesh_fpath: str, resolution: int = 512,
                low_res: int = 100) -> Tuple[np.ndarray, np.ndarray]:
    """Two-pass PCA-aligned extraction (export_mesh.py:50-130)."""
    assert mesh_fpath.endswith(".obj"), f"must use .obj format: {mesh_fpath}"
    verts, tris = extract_geometry(lambda p: -sdf_fn(p), resolution=low_res)
    verts, tris = largest_component(verts, tris)
    pc = sample_mesh_points(verts, tris, 10_000)

    mean = pc.mean(axis=0)
    cov = (pc - mean).T @ (pc - mean)
    _, vecs = np.linalg.eigh(cov)
    vecs = vecs.T[::-1].copy()  # rows = principal axes, descending variance
    if np.linalg.det(vecs) < 0:
        vecs = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32) @ vecs
    aligned = (pc - mean) @ vecs.T

    eps = 0.1
    amin = aligned.min(axis=0) - eps
    amax = aligned.max(axis=0) + eps
    shortest = np.argmin(amax - amin)
    length = (amax - amin)[shortest]
    step = length / (resolution - 1)
    axes = [np.arange(amin[d], amax[d] + step, step, dtype=np.float32)
            if d != shortest else
            np.linspace(amin[d], amax[d], resolution, dtype=np.float32)
            for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    grid_aligned = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    grid_world = grid_aligned @ vecs + mean
    field = _eval_sdf_grid(sdf_fn, grid_world.astype(np.float32))
    field = field.reshape(len(axes[0]), len(axes[1]), len(axes[2]))

    if field.min() > 0 or field.max() < 0:
        verts2, tris2 = verts, tris
    else:
        v_al, tris2 = marching_cubes(field, origin=amin,
                                     spacing=[axes[0][1] - axes[0][0],
                                              axes[1][1] - axes[1][0],
                                              axes[2][1] - axes[2][0]], iso=0.0)
        verts2 = (v_al @ vecs + mean).astype(np.float32)
        verts2, tris2 = largest_component(verts2, tris2)

    tris2 = orient_faces(verts2, tris2)
    write_obj(mesh_fpath, verts2, tris2)
    return verts2, tris2


# ---------------- minimal OBJ IO (trimesh replacement) ----------------

def write_obj(path: str, verts: np.ndarray, tris: np.ndarray,
              uvs: Optional[np.ndarray] = None,
              tri_uvs: Optional[np.ndarray] = None,
              mtl_name: Optional[str] = None) -> None:
    with open(path, "w") as f:
        if mtl_name:
            f.write(f"mtllib {mtl_name}.mtl\nusemtl {mtl_name}\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if uvs is not None:
            for uv in uvs:
                f.write(f"vt {uv[0]:.6f} {uv[1]:.6f}\n")
            for t, tu in zip(tris, tri_uvs):
                f.write(f"f {t[0]+1}/{tu[0]+1} {t[1]+1}/{tu[1]+1} {t[2]+1}/{tu[2]+1}\n")
        else:
            for t in tris:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def read_obj(path: str):
    """Returns (verts, tris, uvs, tri_uvs); uvs may be empty."""
    verts, uvs, tris, tri_uvs = [], [], [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "vt":
                uvs.append([float(x) for x in p[1:3]])
            elif p[0] == "f":
                vi, ti = [], []
                for tok in p[1:4]:
                    parts = tok.split("/")
                    vi.append(int(parts[0]) - 1)
                    if len(parts) > 1 and parts[1]:
                        ti.append(int(parts[1]) - 1)
                tris.append(vi)
                if ti:
                    tri_uvs.append(ti)
    return (np.asarray(verts, np.float32), np.asarray(tris, np.int32),
            np.asarray(uvs, np.float32) if uvs else np.zeros((0, 2), np.float32),
            np.asarray(tri_uvs, np.int32) if tri_uvs else np.zeros((0, 3), np.int32))
