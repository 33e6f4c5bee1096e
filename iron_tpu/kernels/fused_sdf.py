"""Pallas TPU kernel: fused positional-encoding + SDF-MLP forward.

The sphere tracer, dense fallback sampler, bisection and edge walk evaluate
the SDF under stop_gradient (reference traces under torch.no_grad,
raytracer.py:45); together they are ~80-90% of all SDF evaluations in a
stage-2 step.  This kernel runs the whole chain — PE(multires) -> 9
weight-normed linear layers with the skip concat -> [sdf, features] — in
one pallas_call: the weights live in VMEM across the row-tile grid and the
eight 256-wide matmuls never round-trip activations through HBM.

Only used on no-grad paths (no custom VJP needed); training forwards go
through the lax path in iron_tpu.fields.sdf.  An allclose test pins the two
paths together (tests/test_kernels.py).

Weight layout: effective weights W = g * v/||v|| are materialized once per
training step by `sdf_effective_weights` (a handful of 256^2 ops) and
passed as plain arrays.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.fields.sdf import SDFConfig
from iron_tpu.fields.mlp import effective_weight

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def sdf_effective_weights(params: dict) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Materialize (W, b) per layer from weight-norm params."""
    Ws = [effective_weight(p) for p in params["layers"]]
    bs = [p["b"] for p in params["layers"]]
    return Ws, bs


def _pe(x, multires: int):
    # static python loop over frequencies: no captured constant arrays
    # (pallas kernels cannot close over device arrays)
    parts = [x]
    for i in range(multires):
        ang = x * (2.0 ** i)
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    return jnp.concatenate(parts, axis=-1)


def _mlp_body(inputs, Ws, bs, cfg: SDFConfig):
    """The fused layer chain; runs identically inside the kernel and in the
    interpret-mode test path."""
    hp = jax.lax.Precision.HIGHEST
    h = inputs
    n = len(Ws)
    for l in range(n):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = jnp.dot(h, Ws[l], precision=hp) + bs[l]
        if l < n - 1:
            h = jax.nn.softplus(100.0 * h) / 100.0
    return h


def _kernel(cfg: SDFConfig, n_layers: int, x_ref, *refs):
    W_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    x = x_ref[:] * cfg.scale
    inputs = _pe(x, cfg.multires)
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    h = _mlp_body(inputs, Ws, bs, cfg)
    out_ref[:] = jnp.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


_PE_WIDTH = 128  # lane-aligned width of the folded PE block


def _pe_perm(multires: int, d_in: int = 3):
    """Map our lane-aligned PE layout -> reference PE row order.

    Our layout (width _PE_WIDTH): [x (d_in) | sin block (d_in*m, freq-major)
    | cos block (d_in*m) | zero pad].  Reference order (core/embedder.py):
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...].
    Returns (perm, n_feat): perm[i] = reference row feeding our column i.
    """
    m = multires
    perm = list(range(d_in))
    for k in range(m):                       # sin block
        perm += [d_in + 2 * d_in * k + j for j in range(d_in)]
    for k in range(m):                       # cos block
        perm += [d_in + 2 * d_in * k + d_in + j for j in range(d_in)]
    return np.asarray(perm), len(perm)


def _fused_sdf_panel_bf16(x, W_refs, b_refs, cfg: SDFConfig, skip_idx: int):
    """Concat-free fused PE + SDF MLP body, bf16 MXU matmuls, f32 accumulation.

    Lane-narrow concats (13 slabs x 3 lanes for the PE, 217+39 for the skip)
    are lane-shuffles Mosaic executes very slowly — so there are none here:
    the PE is built as one (tile, 128) angle panel via broadcast fmas +
    sin/cos + column masks, and the skip concat is folded into two matmuls
    (h @ W_skip_h + feats @ W_skip_pe).  All weights are pre-permuted /
    padded host-side to this layout (make_pallas_sdf_only_bf16_fn).  Matmul
    list (n_mats entries): [W0' (128,256)] + hidden (256,256)... with the
    skip layer contributing two consecutive entries (W_h then W_pe), final
    (256,128) sdf-column.  Input x is raw (t, 3) f32 points; returns the
    (t, 128) output panel (col 0 = sdf * scale — caller divides).
    """
    n_mats = len(W_refs)
    m = cfg.multires
    d = cfg.d_in
    x = x * np.float32(cfg.scale)

    # angle panel: col c of block j carries x_j * 2^freq(c)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _PE_WIDTH), 1)
    n_feat = d + 2 * d * m
    is_sin = (col >= d) & (col < d + d * m)
    is_cos = (col >= d + d * m) & (col < n_feat)
    in_pe = is_sin | is_cos
    k_idx = jnp.where(is_sin, (col - d) // d,
                      jnp.where(is_cos, (col - d - d * m) // d, 0))
    scale = jnp.where(col < n_feat, jnp.exp2(k_idx.astype(jnp.float32)), 0.0)
    scale = jnp.where(col < d, 1.0, scale)
    c_idx = jnp.where(in_pe, (col - d) % d, jnp.where(col < d, col, 0))
    a = jnp.zeros((x.shape[0], _PE_WIDTH), jnp.float32)
    for j in range(d):
        a = a + jnp.where(c_idx == j, x[:, j:j + 1], 0.0)
    a = a * scale
    feats = jnp.where(is_sin, jnp.sin(a), jnp.where(is_cos, jnp.cos(a), a))
    feats = feats.astype(jnp.bfloat16)

    inv_sqrt2 = np.float32(1.0 / np.sqrt(2))
    h = feats
    li = 0   # matmul index
    bi = 0   # bias index
    n_layers = n_mats - 1  # one layer owns two matmuls (skip)
    for l in range(n_layers):
        if l == skip_idx:
            acc = (jnp.dot(h, W_refs[li][:], preferred_element_type=jnp.float32)
                   + jnp.dot(feats, W_refs[li + 1][:],
                             preferred_element_type=jnp.float32)) * inv_sqrt2
            li += 2
        else:
            acc = jnp.dot(h, W_refs[li][:], preferred_element_type=jnp.float32)
            li += 1
        acc = acc + b_refs[bi][:]
        bi += 1
        if l < n_layers - 1:
            h = (jax.nn.softplus(100.0 * acc) / 100.0).astype(jnp.bfloat16)
        else:
            h = acc
    return h


def _sdf_only_kernel_bf16(cfg: SDFConfig, n_mats: int, skip_idx: int,
                          x_ref, *refs):
    W_refs = refs[:n_mats]
    b_refs = refs[n_mats:len(refs) - 1]
    out_ref = refs[-1]
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    h = _fused_sdf_panel_bf16(x_ref[:], Ws, bs, cfg, skip_idx)
    out_ref[:] = h * np.float32(1.0 / cfg.scale)


def _prepare_bf16_weights(params: dict, cfg: SDFConfig, keep_f32: bool = False):
    """Host-side weight surgery for the fused bf16 kernels: PE rows permuted
    into the lane-aligned layout and padded to 128; the skip layer is split
    into (W_h, W_pe); the layer feeding the skip is column-padded
    (217 -> 256, padded outputs hit zero weight rows); the final layer is
    sliced to the sdf column and lane-padded to 128.  Returns
    (mats, biases, skip_idx) — all stop_gradient'd bf16/f32 arrays.
    """
    assert len(cfg.skip_in) <= 1, "fused kernel supports a single skip"
    d_embed = cfg.d_embed
    assert d_embed <= _PE_WIDTH, "PE width exceeds the lane-aligned panel"
    Ws, bs = sdf_effective_weights(params)
    n_layers = len(Ws)
    skip_idx = cfg.skip_in[0] if cfg.skip_in else -1
    perm, n_feat = _pe_perm(cfg.multires, cfg.d_in)

    def pad_cols(w, b, width):
        wp = jnp.zeros((w.shape[0], width), w.dtype).at[:, :w.shape[1]].set(w)
        bp = jnp.zeros((width,), b.dtype).at[:b.shape[0]].set(b)
        return wp, bp

    mats, biases = [], []
    for l in range(n_layers):
        w, b = Ws[l], bs[l]
        if l == n_layers - 1:                       # final: sdf column only
            w, b = pad_cols(w[:, :1], b[:1], 128)
        if (l + 1) == skip_idx and w.shape[1] < cfg.d_hidden:
            # layer feeding the skip: pad 217 -> 256 output columns
            w, b = pad_cols(w, b, cfg.d_hidden)
        if l == 0:
            wp = jnp.zeros((_PE_WIDTH, w.shape[1]), w.dtype)
            w = wp.at[:n_feat, :].set(w[perm, :])
            mats.append(w)
        elif l == skip_idx:
            # split concat(h_217 -> padded 256, pe_39 -> padded 128)
            d_h = w.shape[0] - d_embed
            w_h = jnp.zeros((cfg.d_hidden, w.shape[1]), w.dtype
                            ).at[:d_h, :].set(w[:d_h, :])
            w_pe = jnp.zeros((_PE_WIDTH, w.shape[1]), w.dtype
                             ).at[:n_feat, :].set(w[d_h:, :][perm, :])
            mats += [w_h, w_pe]
        else:
            mats.append(w)
        biases.append(b)

    if not keep_f32:
        mats = [w.astype(jnp.bfloat16) for w in mats]
    mats = [jax.lax.stop_gradient(w) for w in mats]
    biases = [jax.lax.stop_gradient(b) for b in biases]
    return mats, biases, skip_idx


def make_pallas_sdf_only_bf16_fn(params: dict, cfg: SDFConfig = SDFConfig(),
                                 tile: int = 1024, interpret: bool = False):
    """Returns sdf(x [..., 3]) -> [...] via a fused bf16 PE+MLP Pallas kernel.

    Built for the *coarse* trace paths (sphere-trace march + fallback sweep,
    surface/tracer.py): weights stay resident in VMEM across the row-tile
    grid, activations never round-trip HBM, matmuls run as native single-
    pass bf16 on the MXU with f32 accumulation.  Accuracy matches XLA
    DEFAULT f32 precision (~1e-2 SDF error from bf16 quantization); every
    accepted root is re-verified at accurate precision by the tracer, so
    this only affects speed.  PE runs in f32 on the VPU (positions need full
    precision for the high-frequency sin/cos).
    """
    mats, biases, skip_idx = _prepare_bf16_weights(params, cfg)
    n_mats = len(mats)

    kern = functools.partial(_sdf_only_kernel_bf16, cfg, n_mats, skip_idx)
    flops_per_row = 2 * sum(int(w.shape[0]) * int(w.shape[1]) for w in mats)

    def fwd(x):
        # the coarse evaluator is stop-grad by contract (the tracer is
        # no-grad, reference raytracer.py:45); severing the tangent here also
        # keeps linearization from reaching the pallas_call (which has no
        # JVP rule), matching the while_loop trace path's behavior.
        x = jax.lax.stop_gradient(x)
        shape = x.shape[:-1]
        xf = x.reshape(-1, 3)
        n = xf.shape[0]
        t = min(tile, max(128, -(-n // 128) * 128))
        pad = (-n) % t
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        grid = (xf.shape[0] // t,)

        in_specs = [pl.BlockSpec((t, 3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in mats:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xf.shape[0], 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * xf.shape[0],
                bytes_accessed=xf.shape[0] * (3 + 128) * 4,
                transcendentals=xf.shape[0] * (2 * 3 * cfg.multires
                                               + (n_mats - 2) * cfg.d_hidden)),
            interpret=interpret,
        )(xf, *mats, *biases)
        return out[:n, 0].reshape(shape)

    return fwd


def _split_hi_lo(h):
    hi = h.astype(jnp.bfloat16)
    lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fused_sdf_panel_3pass(x, Whi, Wlo, b_refs, cfg: SDFConfig, skip_idx: int):
    """f32-class fused PE + SDF MLP body via hi/lo bf16 splits
    (BENCH_NOTES roadmap 7): h @ W ~ hi@Whi + hi@Wlo + lo@Whi, dropping
    the O(2^-32) lo@Wlo term — same error class as XLA HIGH (bf16x3),
    ~1.8e-4 max SDF error, good enough for the accurate refine/bisection/
    edge-side trace paths (threshold 5e-5 resolves because errors are
    smooth in x; the round-level comparisons are relative).  Same
    concat-free panel layout as the bf16 kernel."""
    n_mats = len(Whi)
    m = cfg.multires
    d = cfg.d_in
    x = x * np.float32(cfg.scale)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, _PE_WIDTH), 1)
    n_feat = d + 2 * d * m
    is_sin = (col >= d) & (col < d + d * m)
    is_cos = (col >= d + d * m) & (col < n_feat)
    in_pe = is_sin | is_cos
    k_idx = jnp.where(is_sin, (col - d) // d,
                      jnp.where(is_cos, (col - d - d * m) // d, 0))
    scale = jnp.where(col < n_feat, jnp.exp2(k_idx.astype(jnp.float32)), 0.0)
    scale = jnp.where(col < d, 1.0, scale)
    c_idx = jnp.where(in_pe, (col - d) % d, jnp.where(col < d, col, 0))
    a = jnp.zeros((x.shape[0], _PE_WIDTH), jnp.float32)
    for j in range(d):
        a = a + jnp.where(c_idx == j, x[:, j:j + 1], 0.0)
    a = a * scale
    feats = jnp.where(is_sin, jnp.sin(a), jnp.where(is_cos, jnp.cos(a), a))
    f_hi, f_lo = _split_hi_lo(feats)

    def mm3(hhi, hlo, li):
        return (jnp.dot(hhi, Whi[li][:], preferred_element_type=jnp.float32)
                + jnp.dot(hhi, Wlo[li][:], preferred_element_type=jnp.float32)
                + jnp.dot(hlo, Whi[li][:], preferred_element_type=jnp.float32))

    inv_sqrt2 = np.float32(1.0 / np.sqrt(2))
    h_hi, h_lo = f_hi, f_lo
    li = 0
    bi = 0
    n_layers = n_mats - 1
    for l in range(n_layers):
        if l == skip_idx:
            acc = (mm3(h_hi, h_lo, li) + mm3(f_hi, f_lo, li + 1)) * inv_sqrt2
            li += 2
        else:
            acc = mm3(h_hi, h_lo, li)
            li += 1
        acc = acc + b_refs[bi][:]
        bi += 1
        if l < n_layers - 1:
            h = jax.nn.softplus(100.0 * acc) / 100.0
            h_hi, h_lo = _split_hi_lo(h)
        else:
            h = acc
    return h


def _sdf_only_kernel_3pass(cfg: SDFConfig, n_mats: int, skip_idx: int,
                           x_ref, *refs):
    Whi = refs[:n_mats]
    Wlo = refs[n_mats:2 * n_mats]
    b_refs = refs[2 * n_mats:len(refs) - 1]
    out_ref = refs[-1]
    h = _fused_sdf_panel_3pass(x_ref[:], Whi, Wlo, b_refs, cfg, skip_idx)
    out_ref[:] = h * np.float32(1.0 / cfg.scale)


def _prepare_3pass_weights(params: dict, cfg: SDFConfig):
    """Hi/lo bf16 splits of the padded/permuted f32 weight layout."""
    mats_f32, biases, skip_idx = _prepare_bf16_weights(params, cfg,
                                                       keep_f32=True)
    Whi = [jax.lax.stop_gradient(w.astype(jnp.bfloat16)) for w in mats_f32]
    Wlo = [jax.lax.stop_gradient(
        (w - w.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16))
        for w in mats_f32]
    return Whi, Wlo, biases, skip_idx


def make_pallas_sdf_only_3pass_fn(params: dict, cfg: SDFConfig = SDFConfig(),
                                  tile: int = 1024, interpret: bool = False):
    """Returns sdf(x [..., 3]) -> [...] at trace ('high') precision via the
    hi/lo-split fused kernel — the accurate-path counterpart of
    `make_pallas_sdf_only_bf16_fn` for refine/bisection/edge-side traces
    (Stage2Config.trace_pallas)."""
    Whi, Wlo, biases, skip_idx = _prepare_3pass_weights(params, cfg)
    n_mats = len(Whi)

    kern = functools.partial(_sdf_only_kernel_3pass, cfg, n_mats, skip_idx)
    flops_per_row = 3 * 2 * sum(int(w.shape[0]) * int(w.shape[1]) for w in Whi)

    def fwd(x):
        x = jax.lax.stop_gradient(x)
        shape = x.shape[:-1]
        xf = x.reshape(-1, 3)
        n = xf.shape[0]
        t = min(tile, max(128, -(-n // 128) * 128))
        pad = (-n) % t
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        grid = (xf.shape[0] // t,)

        in_specs = [pl.BlockSpec((t, 3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in Whi + Wlo:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xf.shape[0], 128), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * xf.shape[0],
                bytes_accessed=xf.shape[0] * (3 + 128) * 4,
                transcendentals=xf.shape[0] * (2 * 3 * cfg.multires
                                               + (n_mats - 2) * cfg.d_hidden)),
            interpret=interpret,
        )(xf, *Whi, *Wlo, *biases)
        return out[:n, 0].reshape(shape)

    return fwd


def make_pallas_sdf_fn(params: dict, cfg: SDFConfig = SDFConfig(),
                       tile: int = 512, interpret: bool = False):
    """Returns sdf_all(x [..., 3]) -> [..., d_out] running the fused kernel.

    The input is flattened and padded to a tile multiple; the grid walks row
    tiles while weights stay resident in VMEM.
    """
    Ws, bs = sdf_effective_weights(params)
    Ws = [jax.lax.stop_gradient(w) for w in Ws]
    bs = [jax.lax.stop_gradient(b) for b in bs]
    n_layers = len(Ws)
    d_out = cfg.d_out

    kern = functools.partial(_kernel, cfg, n_layers)

    def fwd(x):
        shape = x.shape[:-1]
        xf = x.reshape(-1, 3)
        n = xf.shape[0]
        pad = (-n) % tile
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        grid = (xf.shape[0] // tile,)

        in_specs = [pl.BlockSpec((tile, 3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in Ws:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xf.shape[0], d_out), x.dtype),
            interpret=interpret,
        )(xf, *Ws, *bs)
        return out[:n].reshape(*shape, d_out)

    return fwd


def _march_kernel_bf16(cfg: SDFConfig, n_mats: int, skip_idx: int,
                       n_iters: int, threshold: float,
                       ro_ref, rd_ref, acc0_ref, work_ref, maxd_ref, *refs):
    """Whole coarse sphere-trace march inside one kernel invocation.

    Each grid step owns a tile of rays and runs the masked march loop
    locally: per-tile early exit (the while condition is any(active) over
    *this tile only*) stops a tile as soon as its own rays converge, instead
    of the global lax.while_loop marching the full image until the last
    straggler — and ray state never round-trips HBM between iterations.
    Semantics match tracer._trace_loop at the coarse threshold.
    """
    W_refs = refs[:n_mats]
    b_refs = refs[n_mats:2 * n_mats - 1]
    acc_out, sdf_out, act_out = refs[-3], refs[-2], refs[-1]

    ro = ro_ref[:]                           # (t, 3)
    rd = rd_ref[:]
    acc0 = acc0_ref[:]                       # (t, 1)
    work = work_ref[:] > 0.5
    maxd = maxd_ref[:]
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    inv_scale = np.float32(1.0 / cfg.scale)
    thr = np.float32(threshold)

    def eval_sdf(acc):
        pts = ro + rd * acc
        panel = _fused_sdf_panel_bf16(pts, Ws, bs, cfg, skip_idx)
        return panel[:, 0:1] * inv_scale

    s0 = eval_sdf(acc0)
    act0 = work & (jnp.abs(s0) > thr) & (acc0 < maxd)

    # the active mask is carried as f32 — Mosaic cannot yield padded i1
    # vectors from an scf.while as of this writing
    def cond(c):
        i, act_f, acc, s = c
        return (i < n_iters) & (jnp.max(act_f) > 0.5)

    def body(c):
        i, act_f, acc, s = c
        act = act_f > 0.5
        acc2 = acc + jnp.where(act, s, 0.0)
        s2 = jnp.where(act, eval_sdf(acc2), s)
        act2 = act & (jnp.abs(s2) > thr) & (acc2 < maxd)
        return i + 1, act2.astype(jnp.float32), acc2, s2

    _, act_f, acc, s = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), act0.astype(jnp.float32),
                     acc0, s0))
    acc_out[:] = acc
    sdf_out[:] = s
    act_out[:] = act_f


def make_pallas_coarse_march_fn(params: dict, cfg: SDFConfig = SDFConfig(),
                                threshold: float = 2.0e-2, tile: int = 512,
                                interpret: bool = False):
    """Builds march(ray_o, ray_d, acc0, work_mask, max_dis, n_iters) ->
    (active, acc_dis, sdf) running the whole coarse sphere-trace march as one
    Pallas kernel (see _march_kernel_bf16).  Shapes: ray_o/ray_d [..., 3],
    scalars [...]; n_iters is a static python int.  The march is stop-grad by
    contract (reference raytracer.py:45)."""
    mats, biases, skip_idx = _prepare_bf16_weights(params, cfg)
    n_mats = len(mats)

    def march(ray_o, ray_d, acc0, work_mask, max_dis, n_iters: int):
        ray_o, ray_d, acc0, max_dis = jax.lax.stop_gradient(
            (ray_o, ray_d, acc0, max_dis))
        shape = work_mask.shape
        n = int(np.prod(shape))
        t = min(tile, max(128, -(-n // 128) * 128))
        pad = (-n) % t
        pad2 = ((0, pad), (0, 0))
        ro = jnp.pad(ray_o.reshape(-1, 3), pad2)
        rd = jnp.pad(ray_d.reshape(-1, 3), pad2)
        a0 = jnp.pad(acc0.reshape(-1, 1), pad2[:1] + ((0, 0),))
        wk = jnp.pad(work_mask.reshape(-1, 1).astype(jnp.float32),
                     ((0, pad), (0, 0)))
        md = jnp.pad(jnp.broadcast_to(max_dis, shape).reshape(-1, 1),
                     ((0, pad), (0, 0)))
        grid = ((n + pad) // t,)

        kern = functools.partial(_march_kernel_bf16, cfg, n_mats, skip_idx,
                                 n_iters, threshold)
        row_spec = lambda w: pl.BlockSpec((t, w), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
        in_specs = [row_spec(3), row_spec(3), row_spec(1), row_spec(1),
                    row_spec(1)]
        for w in mats:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        flops_per_row = 2 * sum(int(w.shape[0]) * int(w.shape[1]) for w in mats)
        acc, s, act = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=(row_spec(1), row_spec(1), row_spec(1)),
            out_shape=(jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((n + pad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((n + pad, 1), jnp.float32)),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * (n + pad) * max(n_iters // 2, 1),
                bytes_accessed=(n + pad) * 12 * 4,
                transcendentals=(n + pad) * (n_mats - 2) * cfg.d_hidden),
            interpret=interpret,
        )(ro, rd, a0, wk, md, *mats, *biases)
        return (act[:n, 0].reshape(shape) > 0.5, acc[:n, 0].reshape(shape),
                s[:n, 0].reshape(shape))

    return march
