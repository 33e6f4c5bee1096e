"""Sharded training steps.

Data parallel over rays (stage 1) / patch crops (stage 2) with replicated
parameters: the batch axis carries a `dp` sharding annotation and XLA's
SPMD partitioner turns the gradient reduction into an all-reduce over ICI,
overlapped with the backward pass by the latency-hiding scheduler
(SURVEY.md §2.5 "New components").  Tensor parallel (`tp`) shards the
256-wide MLP hidden dimensions; mostly unnecessary for these small nets
(SURVEY.md row "Tensor/model parallel") but exercised by the multi-chip
dry run.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iron_tpu.train.stage1 import Stage1Config, stage1_loss
from iron_tpu.train.stage2 import Stage2Config, stage2_loss
from iron_tpu.core.camera import Camera, crop_camera


def stage1_param_shardings(params, mesh: Mesh, tp_shard: bool = True):
    """NamedShardings for stage-1 params: replicated by default; with
    tp_shard, hidden matmul dims of the SDF/color/NeRF MLPs are sharded
    over 'tp' (output dim of v/w [in, out] matrices of hidden layers)."""
    def assign(path, x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if tp_shard and x.ndim == 2 and x.shape[1] % mesh.shape["tp"] == 0 \
                and x.shape[1] >= 128:
            return NamedSharding(mesh, P(None, "tp"))
        if tp_shard and x.ndim == 1 and x.shape[0] % mesh.shape["tp"] == 0 \
                and x.shape[0] >= 128:
            return NamedSharding(mesh, P("tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def make_dp_stage1_step(cfg: Stage1Config, tx, mesh: Mesh,
                        tp_shard: bool = True) -> Callable:
    """Jitted (params, opt_state, batch, step, key) -> (params, opt_state,
    metrics) with the ray batch sharded over dp and params replicated
    (tp-sharded hidden dims optional)."""
    batch_sharding = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    if getattr(cfg, "upsample_pallas", False) or \
            getattr(cfg, "normals_mode", "vjp") == "pallas":
        # pallas_call is not auto-partitionable under pjit; keep the dp
        # path on plain XLA evaluators (vjp normals)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, upsample_pallas=False, normals_mode="vjp")

    def step_fn(params, opt_state, batch, step, key):
        from iron_tpu.train.schedules import cos_anneal_ratio
        anneal = cos_anneal_ratio(step, cfg.anneal_end)
        (loss, metrics), grads = jax.value_and_grad(
            stage1_loss, has_aux=True)(params, cfg, batch, key, anneal)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step_fn,
                   in_shardings=(None, None, batch_sharding, None, None),
                   donate_argnums=(0, 1))


def make_dp_stage2_step(cfg: Stage2Config, mat_cfgs, tx, mesh: Mesh,
                        images=None, Ks=None, W2Cs=None,
                        per_shard_data: bool = False) -> Callable:
    """Data parallel over patch crops via `jax.shard_map`: each dp shard
    runs the EXACT single-device program (including the Pallas coarse-march
    kernel and the interior-shading budget — pallas_call is not
    auto-partitionable under pjit, but under shard_map each shard is
    already a single-device program) on its own random crop; per-shard
    gradients are pmean'd over `dp` and the (replicated) optimizer update
    is applied identically everywhere.

    With `per_shard_data=False` (default), the full image stack is baked
    into the program replicated — fine for one host.  With
    `per_shard_data=True` the data is an ARGUMENT sharded over `dp` on the
    view axis (SURVEY §2.5 "per-host image shards", stage-2 path): build
    it with `host_sharded_views` so each process materializes only its
    local views, and pass LOCAL view indices (each shard samples its own
    [N/D]-view shard; the gradient pmean averages across shards — the same
    semantics as the stage-1 `per_host_shard` path).

    Returns jitted
      per_shard_data=False: (params, opt_state, keys [D,2], img_idx [D],
                             ul_col [D], ul_row [D])
      per_shard_data=True:  (params, opt_state, images [N,H,W,3], Ks [N,4,4],
                             W2Cs [N,4,4], keys, local_idx, ul_col, ul_row)
    -> (params, opt_state, metrics).
    """
    ps = cfg.patch_size

    def one_crop_loss(params, img, K, W2C, key, ul_col, ul_row):
        H, W = img.shape[0], img.shape[1]
        base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K),
                      C2W=jnp.linalg.inv(W2C), H=H, W=W)
        cam = crop_camera(base, ul_col, ul_row, ps, ps)
        gt = jax.lax.dynamic_slice(img, (ul_row, ul_col, 0), (ps, ps, 3))
        return stage2_loss(params, mat_cfgs, cfg, cam, gt, key)

    def crop_body(params, imgs, Ks_l, W2Cs_l, keys, img_idx, ul_col, ul_row):
        # local shapes: imgs [n_local, H, W, 3], keys [1, 2], idx/ul_* [1]
        i = img_idx[0]
        (loss, metrics), grads = jax.value_and_grad(
            one_crop_loss, has_aux=True)(params, imgs[i], Ks_l[i], W2Cs_l[i],
                                         keys[0], ul_col[0], ul_row[0])
        grads = jax.lax.pmean(grads, "dp")
        metrics = jax.lax.pmean(metrics, "dp")
        return metrics, grads

    repl = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("dp"))

    if per_shard_data:
        sharded = jax.shard_map(
            crop_body, mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P("dp"),
                      P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=(P(), P()), check_vma=False)

        def step_fn(params, opt_state, images, Ks, W2Cs,
                    keys, img_idx, ul_col, ul_row):
            metrics, grads = sharded(params, images, Ks, W2Cs,
                                     keys, img_idx, ul_col, ul_row)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return jax.jit(step_fn,
                       in_shardings=(repl, repl, sh, sh, sh, sh, sh, sh, sh),
                       donate_argnums=(0, 1))

    images = jnp.asarray(images, jnp.float32)
    Ks = jnp.asarray(Ks, jnp.float32)
    W2Cs = jnp.asarray(W2Cs, jnp.float32)

    def shard_body(params, keys, img_idx, ul_col, ul_row):
        return crop_body(params, images, Ks, W2Cs,
                         keys, img_idx, ul_col, ul_row)

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P()), check_vma=False)

    def step_fn(params, opt_state, keys, img_idx, ul_col, ul_row):
        metrics, grads = sharded(params, keys, img_idx, ul_col, ul_row)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step_fn,
                   in_shardings=(repl, repl, sh, sh, sh, sh),
                   donate_argnums=(0, 1))


def host_sharded_views(images, Ks, W2Cs, mesh: Mesh):
    """Build dp-sharded global view arrays where each process supplies only
    its OWN views (no process materializes the full stack — SURVEY §2.5
    stage-2 per-host shards).  Pass the process-local arrays; their
    concatenation in process order forms the global view axis, which must
    be evenly divisible by mesh.shape['dp'].

    Returns (images, Ks, W2Cs) as global jax.Arrays sharded P('dp') on the
    view axis, ready for `make_dp_stage2_step(per_shard_data=True)`.
    Local view index i on shard d addresses that shard's i-th view.
    """
    sh = NamedSharding(mesh, P("dp"))
    if jax.process_count() > 1:
        mk = lambda local: jax.make_array_from_process_local_data(
            sh, np.asarray(local, np.float32))
        return mk(images), mk(Ks), mk(W2Cs)
    put = lambda x: jax.device_put(jnp.asarray(x, jnp.float32), sh)
    return put(images), put(Ks), put(W2Cs)


def make_dp_stage1_render(cfg: Stage1Config, mesh: Mesh) -> Callable:
    """Collective-aware full-image validation render (SURVEY §2.5): the ray
    grid is sharded over `dp`, every device integrates its slice of rays,
    and the partitioner gathers the image (the reference loops 1024-ray
    chunks on one GPU, render_volume.py:660-661).

    Returns jitted (params, rays_o [N,3], rays_d [N,3]) -> (color [N,3],
    normal [N,3]); N must divide by mesh.shape['dp'].
    """
    from iron_tpu.train.stage1 import stage1_render_color_normal

    if getattr(cfg, "upsample_pallas", False) or \
            getattr(cfg, "normals_mode", "vjp") == "pallas":
        import dataclasses as _dc
        cfg = _dc.replace(cfg, upsample_pallas=False, normals_mode="vjp")
    sh = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    render = lambda params, rays_o, rays_d: stage1_render_color_normal(
        params, cfg, rays_o, rays_d)
    return jax.jit(render, in_shardings=(None, sh, sh),
                   out_shardings=(repl, repl))


def make_dp_stage2_render(cfg: Stage2Config, mat_cfgs, mesh: Mesh,
                          H: int, W: int) -> Callable:
    """Full-image surface render sharded over `dp` as horizontal bands:
    each device runs the whole trace+edge+shade pipeline on its band
    (crop_camera keeps the intrinsics consistent), and the bands are
    gathered into the [H, W] image.  Edge candidates are detected per band,
    so a silhouette crossing a band boundary is handled by both sides
    independently — same semantics as the reference's crop-wise rendering.

    Returns jitted (params, K [4,4], W2C [4,4]) -> {color, normal, depth,
    convergent_mask} with [H, W, ...] buffers.
    """
    from iron_tpu.train.stage2 import stage2_render_buffers

    D = mesh.shape["dp"]
    assert H % D == 0, f"image height {H} must divide dp={D}"
    band = H // D
    repl = NamedSharding(mesh, P())

    def shard_body(params, K, W2C):
        # each shard renders its own horizontal band through the full
        # single-device program (Pallas kernels included)
        base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K),
                      C2W=jnp.linalg.inv(W2C), H=H, W=W)
        row0 = jax.lax.axis_index("dp") * band
        cam = crop_camera(base, 0, row0, W, band)
        return stage2_render_buffers(params, mat_cfgs, cfg, cam)

    render = jax.shard_map(shard_body, mesh=mesh,
                           in_specs=(P(), P(), P()),
                           out_specs=P("dp"), check_vma=False)
    return jax.jit(render, in_shardings=(repl, repl, repl),
                   out_shardings=repl)
