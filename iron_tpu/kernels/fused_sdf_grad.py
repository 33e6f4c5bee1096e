"""Pallas TPU kernels: fused DIFFERENTIABLE SDF core — (value, feature,
gradient) with an analytic second-order backward.

Why: stage-1 NeuS training is bound by the second-order render_core graph
(normals feed the color net and the eikonal term, so the loss backward
differentiates through vjp(sdf); BENCH_NOTES round-3 ablation: ~108 of
207 ms at batch 2048).  XLA executes that graph as a chain of [B*S, 256]
matmuls whose inter-layer activations round-trip HBM — at 262k points
each activation tensor is 256 MB, so the pass family is HBM-bandwidth
bound, not MXU bound.  These kernels run the whole chain per row-tile
with activations resident in VMEM:

  * forward kernel: PE -> 9 weight-normed linears (skip folded into two
    matmuls, concat-free lane-aligned PE panel — see kernels/fused_sdf.py
    for why concats are banned) -> z_L, PLUS the reverse sweep
    u_{l-1} = (u_l @ W_l^T) * sigma'(z_{l-1}) that yields the input
    gradient.  One kernel, ~2L matmuls, zero HBM activation traffic.
  * backward kernel: recomputes the forward + u-chain in VMEM, then runs
    the hand-derived adjoint of BOTH sweeps (the reverse-over-reverse
    graph) producing dx and per-layer dW/db, with dW accumulated across
    the sequential row-tile grid.

The pair is exposed through jax.custom_vjp over the PADDED weight layout;
the (differentiable) host-side layout surgery maps raw weight-norm params
to that layout, so parameter gradients flow back through
`effective_weight` automatically.  Exactness is pinned against the lax
path (fields.sdf.sdf_value_feat_grad) by tests/test_kernels.py in
interpret mode — outputs AND full second-order loss gradients.

Reference semantics: fields.py:9-137 (SDFNetwork.get_all with
create_graph=True); SURVEY §7.4.2.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.fields.sdf import SDFConfig
from iron_tpu.kernels.fused_sdf import (_PE_WIDTH, _pe_perm, pallas_available,
                                        sdf_effective_weights)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_OUT_PAD = 384  # final layer 257 -> lane-aligned 384


# ---------------------------------------------------------------------------
# differentiable host-side layout surgery (raw weight-norm params -> padded
# lane-aligned mats).  Pure jnp ops: autodiff transposes it for free.
# ---------------------------------------------------------------------------

def prep_padded_weights(params: dict, cfg: SDFConfig):
    """Returns (mats, biases, skip_idx): the concat-free layout of
    kernels/fused_sdf.py (_prepare_bf16_weights) but f32, differentiable,
    with the FULL final layer (value + features) padded to _OUT_PAD, and
    the skip 1/sqrt(2) folded into the two skip matrices."""
    assert len(cfg.skip_in) <= 1
    d_embed = cfg.d_embed
    assert d_embed <= _PE_WIDTH
    Ws, bs = sdf_effective_weights(params)
    n_layers = len(Ws)
    skip_idx = cfg.skip_in[0] if cfg.skip_in else -1
    perm, n_feat = _pe_perm(cfg.multires, cfg.d_in)
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))

    def pad_cols(w, b, width):
        wp = jnp.zeros((w.shape[0], width), w.dtype).at[:, :w.shape[1]].set(w)
        bp = jnp.zeros((width,), b.dtype).at[:b.shape[0]].set(b)
        return wp, bp

    mats, biases = [], []
    for l in range(n_layers):
        w, b = Ws[l], bs[l]
        if l == n_layers - 1:
            w, b = pad_cols(w, b, _OUT_PAD)
        if (l + 1) == skip_idx and w.shape[1] < cfg.d_hidden:
            w, b = pad_cols(w, b, cfg.d_hidden)
        if l == 0:
            wp = jnp.zeros((_PE_WIDTH, w.shape[1]), w.dtype)
            mats.append(wp.at[:n_feat, :].set(w[perm, :]))
        elif l == skip_idx:
            d_h = w.shape[0] - d_embed
            w_h = jnp.zeros((cfg.d_hidden, w.shape[1]), w.dtype
                            ).at[:d_h, :].set(w[:d_h, :]) * inv_sqrt2
            w_pe = jnp.zeros((_PE_WIDTH, w.shape[1]), w.dtype
                             ).at[:n_feat, :].set(w[d_h:, :][perm, :]) * inv_sqrt2
            mats += [w_h, w_pe]
        else:
            mats.append(w)
        biases.append(b)
    return mats, biases, skip_idx


# ---------------------------------------------------------------------------
# PE panels: value + first + second derivative, concat-free
# ---------------------------------------------------------------------------

def _pe_value_d1_d2(x, cfg: SDFConfig):
    """x [t, 3] RAW points.  Returns (feats, d1, d2, sel) [t, _PE_WIDTH]:
      feats_c = PE_c(y),  y = x * cfg.scale  (lane-aligned layout)
      d1_c    = dPE_c/dy   evaluated at y
      d2_c    = d2PE_c/dy2
      sel_j   = column->input-axis one-hot masks, list of 3 [1, _PE_WIDTH]
    Chain rule wrt raw x multiplies d1 by scale once, d2 by scale^2 —
    callers handle it (grad output of the SDF cancels one 1/scale)."""
    m, d = cfg.multires, cfg.d_in
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _PE_WIDTH), 1)
    n_feat = d + 2 * d * m
    is_sin = (col >= d) & (col < d + d * m)
    is_cos = (col >= d + d * m) & (col < n_feat)
    in_pe = is_sin | is_cos
    k_idx = jnp.where(is_sin, (col - d) // d,
                      jnp.where(is_cos, (col - d - d * m) // d, 0))
    freq = jnp.where(col < n_feat, jnp.exp2(k_idx.astype(jnp.float32)), 0.0)
    freq = jnp.where(col < d, 1.0, freq)
    c_idx = jnp.where(in_pe, (col - d) % d, jnp.where(col < d, col, 0))

    y = x * np.float32(cfg.scale)
    a = jnp.zeros((x.shape[0], _PE_WIDTH), jnp.float32)
    for j in range(d):
        a = a + jnp.where(c_idx == j, y[:, j:j + 1], 0.0)
    live = (col < n_feat).astype(jnp.float32)
    a = a * freq
    sin_a, cos_a = jnp.sin(a), jnp.cos(a)
    feats = jnp.where(is_sin, sin_a, jnp.where(is_cos, cos_a, a)) * live
    # d/dy: identity cols -> 1; sin -> f cos; cos -> -f sin
    d1 = jnp.where(is_sin, freq * cos_a,
                   jnp.where(is_cos, -freq * sin_a, 1.0)) * live
    # d2/dy2: identity -> 0; sin -> -f^2 sin; cos -> -f^2 cos
    d2 = jnp.where(is_sin, -freq * freq * sin_a,
                   jnp.where(is_cos, -freq * freq * cos_a, 0.0)) * live
    sel = [((c_idx == j) & (col < n_feat)).astype(jnp.float32)
           for j in range(d)]
    return feats, d1, d2, sel


def _sigma(z):
    return jax.nn.softplus(100.0 * z) / 100.0


def _sigma_p(z):
    return jax.nn.sigmoid(100.0 * z)


def _sigma_pp(z):
    s = jax.nn.sigmoid(100.0 * z)
    return 100.0 * s * (1.0 - s)


# ---------------------------------------------------------------------------
# shared forward + u-chain body (runs inside both kernels)
# ---------------------------------------------------------------------------

def _forward_chain(x, Ws, bs, cfg: SDFConfig, skip_idx: int, prec):
    """Returns (pe, a_list, z_list): pe = (feats, d1, d2, sel); a_list[l] is
    the input activation of layer l (a_list[0] = feats); z_list[l] its
    pre-activation.  Layer l == skip_idx consumes TWO mats (h, pe)."""
    feats, d1, d2, sel = _pe_value_d1_d2(x, cfg)
    n_mats = len(Ws)
    n_layers = n_mats - 1 if skip_idx >= 0 else n_mats
    a_list, z_list = [feats], []
    h = feats
    li = 0
    for l in range(n_layers):
        if l == skip_idx:
            z = (jnp.dot(h, Ws[li], precision=prec)
                 + jnp.dot(feats, Ws[li + 1], precision=prec)) + bs[l]
            li += 2
        else:
            z = jnp.dot(h, Ws[li], precision=prec) + bs[l]
            li += 1
        z_list.append(z)
        if l < n_layers - 1:
            h = _sigma(z)
            a_list.append(h)
    return (feats, d1, d2, sel), a_list, z_list


def _u_chain(Ws, z_list, cfg: SDFConfig, skip_idx: int, prec, t: int):
    """The reverse grad sweep: u_{L-1} = e0; u_{l-1} = (u_l @ W_l^T) *
    sigma'(z_{l-1}); a0cot accumulates from layer 0 and the skip PE part.
    Returns (u_list [L], vh_list [L], a0cot)."""
    n_mats = len(Ws)
    n_layers = n_mats - 1 if skip_idx >= 0 else n_mats
    # map layer -> mat index
    mat_of = {}
    li = 0
    for l in range(n_layers):
        mat_of[l] = li
        li += 2 if l == skip_idx else 1

    out_w = Ws[-1].shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (t, out_w), 1)
    u = jnp.where(col == 0, 1.0, 0.0)  # e0
    u_list = [None] * n_layers
    vh_list = [None] * n_layers
    a0cot = jnp.zeros((t, _PE_WIDTH), jnp.float32)
    u_list[n_layers - 1] = u
    for l in range(n_layers - 1, -1, -1):
        li = mat_of[l]
        vh = jnp.dot(u_list[l], Ws[li].T, precision=prec)
        vh_list[l] = vh
        if l == skip_idx:
            a0cot = a0cot + jnp.dot(u_list[l], Ws[li + 1].T, precision=prec)
        if l > 0:
            u_list[l - 1] = vh * _sigma_p(z_list[l - 1])
        else:
            a0cot = a0cot + vh
    return u_list, vh_list, a0cot


def _outputs_from(z_last, a0cot, pe, cfg: SDFConfig):
    feats, d1, d2, sel = pe
    grad_cols = a0cot * d1
    grads = [jnp.sum(grad_cols * sel[j], axis=-1, keepdims=True)
             for j in range(cfg.d_in)]
    grad = jnp.concatenate(grads, axis=-1)  # [t, 3] — wrt raw x (scales cancel)
    return z_last, grad


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: SDFConfig, n_mats: int, skip_idx: int, prec,
                x_ref, *refs):
    W_refs = refs[:n_mats]
    b_refs = refs[n_mats:n_mats + (n_mats - 1 if skip_idx >= 0 else n_mats)]
    vf_ref, g_ref = refs[-2], refs[-1]
    x = x_ref[:]
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    pe, a_list, z_list = _forward_chain(x, Ws, bs, cfg, skip_idx, prec)
    u_list, vh_list, a0cot = _u_chain(Ws, z_list, cfg, skip_idx, prec,
                                      x.shape[0])
    z_last, grad = _outputs_from(z_list[-1], a0cot, pe, cfg)
    vf_ref[:] = z_last
    gpad = jnp.zeros((x.shape[0], 128), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 128), 1)
    for j in range(cfg.d_in):
        gpad = gpad + jnp.where(col == j, grad[:, j:j + 1], 0.0)
    g_ref[:] = gpad


# ---------------------------------------------------------------------------
# backward kernel — the hand-derived adjoint of (forward + u-chain)
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: SDFConfig, n_mats: int, skip_idx: int, prec,
                x_ref, dvf_ref, dg_ref, *refs):
    n_b = n_mats - 1 if skip_idx >= 0 else n_mats
    # ref order: all inputs (mats, biases) first, then outputs (dW, db, dx)
    W_refs = refs[:n_mats]
    b_refs = refs[n_mats:n_mats + n_b]
    dW_refs = refs[n_mats + n_b:2 * n_mats + n_b]
    db_refs = refs[2 * n_mats + n_b:2 * n_mats + 2 * n_b]
    dx_ref = refs[-1]

    x = x_ref[:]
    t = x.shape[0]
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    scale = np.float32(cfg.scale)

    # ---- recompute forward + u-chain in VMEM ----
    pe, a_list, z_list = _forward_chain(x, Ws, bs, cfg, skip_idx, prec)
    u_list, vh_list, a0cot = _u_chain(Ws, z_list, cfg, skip_idx, prec, t)
    feats, d1, d2, sel = pe
    n_layers = len(z_list)
    mat_of = {}
    li = 0
    for l in range(n_layers):
        mat_of[l] = li
        li += 2 if l == skip_idx else 1

    dvf = dvf_ref[:]            # [t, _OUT_PAD] cotangent of z_last
    dg = dg_ref[:]              # [t, 128] cotangent of grad, cols 0..2

    # ---- adjoint of the output stage ----
    # grad_j = sum_c a0cot_c * d1_c * sel_j_c ; explicit x-dependence of d1:
    # d d1_c/dx_k = d2_c * scale * delta(c_idx=k)
    bar_a0cot = jnp.zeros((t, _PE_WIDTH), jnp.float32)
    dx = jnp.zeros((t, cfg.d_in), jnp.float32)
    # column writes via one-hot masks: Mosaic has no scatter-add lowering,
    # so `.at[:, j:j+1].add` raises on real TPU (interpret mode hides it)
    col_1h = [(jax.lax.broadcasted_iota(jnp.int32, (1, cfg.d_in), 1) == j
               ).astype(jnp.float32) for j in range(cfg.d_in)]
    for j in range(cfg.d_in):
        dgj = dg[:, j:j + 1]
        bar_a0cot = bar_a0cot + dgj * d1 * sel[j]
        dx = dx + jnp.sum(dgj * a0cot * d2 * sel[j], axis=-1,
                          keepdims=True) * scale * col_1h[j]

    bar_z = [jnp.zeros_like(z) for z in z_list]
    bar_z[n_layers - 1] = dvf

    dW_acc = [jnp.zeros_like(w) for w in Ws]
    db_acc = [jnp.zeros((Ws[mat_of[l]].shape[1],), jnp.float32)
              for l in range(n_layers)]

    # ---- adjoint of the u-chain (forward order l = 0 .. L-1) ----
    # primal: vh_l = u_l @ W_l^T ; u_{l-1} = vh_l * sp(z_{l-1}) (l>0)
    #         a0cot += vh_0 (+ skip: u_skip @ Wpe^T)
    bar_u = [jnp.zeros_like(u) for u in u_list]
    # l = 0: bar_vh_0 = bar_a0cot
    li0 = mat_of[0]
    bar_vh = bar_a0cot
    bar_u[0] = bar_u[0] + jnp.dot(bar_vh, Ws[li0], precision=prec)
    # vh = u @ W^T  =>  bar_W = bar_vh^T @ u  (shape [in, out], no transpose)
    dW_acc[li0] = dW_acc[li0] + jnp.dot(bar_vh.T, u_list[0], precision=prec)
    for l in range(1, n_layers):
        li = mat_of[l]
        sp = _sigma_p(z_list[l - 1])
        bar_vh = bar_u[l - 1] * sp
        bar_z[l - 1] = bar_z[l - 1] + bar_u[l - 1] * vh_list[l] * _sigma_pp(z_list[l - 1])
        bar_u[l] = bar_u[l] + jnp.dot(bar_vh, Ws[li], precision=prec)
        dW_acc[li] = dW_acc[li] + jnp.dot(bar_vh.T, u_list[l], precision=prec)
        if l == skip_idx:
            bar_vpe = bar_a0cot
            bar_u[l] = bar_u[l] + jnp.dot(bar_vpe, Ws[li + 1], precision=prec)
            dW_acc[li + 1] = dW_acc[li + 1] + jnp.dot(bar_vpe.T, u_list[l],
                                                      precision=prec)
    # u_{L-1} is a constant (e0): bar_u[L-1] terminates here.

    # ---- adjoint of the primal chain (reverse order l = L-1 .. 0) ----
    bar_a_next = None  # cotangent of a_{l+1}
    bar_a0_total = jnp.zeros((t, _PE_WIDTH), jnp.float32)
    for l in range(n_layers - 1, -1, -1):
        bz = bar_z[l]
        if bar_a_next is not None:
            bz = bz + bar_a_next * _sigma_p(z_list[l])
        li = mat_of[l]
        a_in = a_list[l]
        dW_acc[li] = dW_acc[li] + jnp.dot(a_in.T, bz, precision=prec)
        db_acc[l] = db_acc[l] + jnp.sum(bz, axis=0)
        bar_a = jnp.dot(bz, Ws[li].T, precision=prec)
        if l == skip_idx:
            dW_acc[li + 1] = dW_acc[li + 1] + jnp.dot(feats.T, bz, precision=prec)
            bar_a0_total = bar_a0_total + jnp.dot(bz, Ws[li + 1].T, precision=prec)
        if l > 0:
            bar_a_next = bar_a
        else:
            bar_a0_total = bar_a0_total + bar_a

    # ---- a_0 -> x  (a0 = PE(x*scale): dPE_c/dx_j = d1_c * scale * sel_j) ----
    for j in range(cfg.d_in):
        dx = dx + jnp.sum(bar_a0_total * d1 * sel[j], axis=-1,
                          keepdims=True) * scale * col_1h[j]

    # ---- write outputs; dW/db accumulate across the sequential grid ----
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for r, w in zip(dW_refs, Ws):
            r[:] = jnp.zeros_like(w)
        for i, r in enumerate(db_refs):
            r[:] = jnp.zeros_like(db_acc[i])

    for r, acc in zip(dW_refs, dW_acc):
        r[:] = r[:] + acc
    for r, acc in zip(db_refs, db_acc):
        r[:] = r[:] + acc

    dxp = jnp.zeros((t, 128), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    for j in range(cfg.d_in):
        dxp = dxp + jnp.where(col == j, dx[:, j:j + 1], 0.0)
    dx_ref[:] = dxp


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def make_fused_sdf_grad_fn(cfg: SDFConfig = SDFConfig(), tile: int = 256,
                           interpret: bool = False,
                           precision: str = "highest"):
    """Returns fn(params, x [..., 3]) -> (sdf [...], feat [..., 256],
    grad [..., 3]), differentiable (second order) via the fused Pallas
    kernels.  Drop-in for fields.sdf.sdf_value_feat_grad."""
    # Mosaic's in-kernel dot_general supports only DEFAULT and HIGHEST
    # (no bf16x3 pass count — lowering raises "Unsupported dot precision:
    # HIGH" on real TPU; interpret-mode tests on CPU never hit this).
    # 'high' therefore maps UP to HIGHEST inside the kernel: callers
    # asking for the bf16x3 class get the more accurate f32 path.
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]

    @functools.partial(jax.custom_vjp)
    def core(mats, biases, xf):
        out, _ = _core_fwd(mats, biases, xf)
        return out

    def _run_fwd(mats, biases, xf):
        n = xf.shape[0]
        n_mats = len(mats)
        skip_idx = cfg.skip_in[0] if cfg.skip_in else -1
        t = min(tile, max(128, -(-n // 128) * 128))
        pad = (-n) % t
        xp = jnp.pad(xf, ((0, pad), (0, 0)))
        grid = (xp.shape[0] // t,)
        kern = functools.partial(_fwd_kernel, cfg, n_mats, skip_idx, prec)
        in_specs = [pl.BlockSpec((t, 3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in mats:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        flops_row = 4 * sum(int(w.shape[0]) * int(w.shape[1]) for w in mats)
        vf, g = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=(pl.BlockSpec((t, _OUT_PAD), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((t, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((xp.shape[0], _OUT_PAD), jnp.float32),
                       jax.ShapeDtypeStruct((xp.shape[0], 128), jnp.float32)),
            cost_estimate=pl.CostEstimate(
                flops=flops_row * xp.shape[0],
                bytes_accessed=xp.shape[0] * (3 + _OUT_PAD + 128) * 4,
                transcendentals=xp.shape[0] * 2 * len(mats) * cfg.d_hidden),
            interpret=interpret,
        )(xp, *mats, *biases)
        return vf[:n], g[:n]

    def _core_fwd(mats, biases, xf):
        vf, g = _run_fwd(mats, biases, xf)
        value = vf[:, 0] / np.float32(cfg.scale)
        feat = vf[:, 1:cfg.d_out]
        # grad needs NO scale factor: d(z0/s)/dx = (1/s) * dz0/dy * s = dz0/dy,
        # which is exactly what the u-chain + d1 panel compute.
        grad = g[:, :cfg.d_in]
        return (value, feat, grad), (mats, biases, xf)

    def _core_bwd(res, cots):
        mats, biases, xf = res
        dv, dfeat, dgrad = cots
        n = xf.shape[0]
        n_mats = len(mats)
        n_b = len(biases)
        skip_idx = cfg.skip_in[0] if cfg.skip_in else -1
        inv_s = np.float32(1.0 / cfg.scale)
        # pack cotangents into the kernel panels
        dvf = jnp.zeros((n, _OUT_PAD), jnp.float32)
        dvf = dvf.at[:, 0].set(dv * inv_s)
        dvf = dvf.at[:, 1:cfg.d_out].set(dfeat)
        dgp = jnp.zeros((n, 128), jnp.float32)
        dgp = dgp.at[:, :cfg.d_in].set(dgrad)  # grad carries no scale factor

        # The backward kernel re-runs the forward + u-chain AND holds the
        # bar_z/bar_u adjoint chains per tile: ~34 MB VMEM stack at tile
        # 256 (measured on-chip) — above Mosaic's default 16 MB scoped
        # budget, within the raised per-kernel limit set below.
        t = min(tile, max(128, -(-n // 128) * 128))
        pad = (-n) % t
        xp = jnp.pad(xf, ((0, pad), (0, 0)))
        dvfp = jnp.pad(dvf, ((0, pad), (0, 0)))
        dgpp = jnp.pad(dgp, ((0, pad), (0, 0)))
        grid = (xp.shape[0] // t,)

        kern = functools.partial(_bwd_kernel, cfg, n_mats, skip_idx, prec)
        row = lambda w: pl.BlockSpec((t, w), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        fixed2 = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        fixed1 = lambda s: pl.BlockSpec(s, lambda i: (0,),
                                        memory_space=pltpu.VMEM)
        in_specs = [row(3), row(_OUT_PAD), row(128)]
        for w in mats:
            in_specs.append(fixed2(w.shape))
        for b in biases:
            in_specs.append(fixed1(b.shape))
        out_specs = ([fixed2(w.shape) for w in mats]
                     + [fixed1((mats[i].shape[1],))
                        for i in _layer_mat_indices(n_mats, skip_idx)]
                     + [row(128)])
        out_shape = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in mats]
                     + [jax.ShapeDtypeStruct((mats[i].shape[1],), jnp.float32)
                        for i in _layer_mat_indices(n_mats, skip_idx)]
                     + [jax.ShapeDtypeStruct((xp.shape[0], 128), jnp.float32)])
        flops_row = 10 * sum(int(w.shape[0]) * int(w.shape[1]) for w in mats)
        # The bwd kernel's t-INDEPENDENT live set (weight panels + dW
        # accumulators + per-layer adjoint chains) alone exceeds Mosaic's
        # default 16 MB scoped-VMEM budget (measured on-chip: 21.45 MB at
        # tile 64) — raise the per-kernel limit; v5e has 128 MB physical.
        ckw = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)}
        outs = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            cost_estimate=pl.CostEstimate(
                flops=flops_row * xp.shape[0],
                bytes_accessed=xp.shape[0] * (3 + _OUT_PAD + 2 * 128) * 4,
                transcendentals=xp.shape[0] * 4 * len(mats) * cfg.d_hidden),
            interpret=interpret, **ckw,
        )(xp, dvfp, dgpp, *mats, *biases)
        dWs = list(outs[:n_mats])
        dbs = list(outs[n_mats:n_mats + n_b])
        dx = outs[-1][:n, :cfg.d_in]
        return tuple(dWs), tuple(dbs), dx

    core.defvjp(_core_fwd, _core_bwd)

    def fn(params, x):
        mats, biases, _ = prep_padded_weights(params, cfg)
        shape = x.shape[:-1]
        xf = x.reshape(-1, cfg.d_in)
        value, feat, grad = core(tuple(mats), tuple(biases), xf)
        return (value.reshape(shape), feat.reshape(shape + (cfg.d_out - 1,)),
                grad.reshape(shape + (cfg.d_in,)))

    return fn


def _layer_mat_indices(n_mats: int, skip_idx: int):
    """Mat index owning each LAYER's bias (skip layer -> its h-mat)."""
    n_layers = n_mats - 1 if skip_idx >= 0 else n_mats
    out, li = [], 0
    for l in range(n_layers):
        out.append(li)
        li += 2 if l == skip_idx else 1
    return out
