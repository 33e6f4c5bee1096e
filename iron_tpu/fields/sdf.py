"""SDF field: 8x256 MLP with skip connection, positional encoding,
geometric initialization and weight norm.

Behavioral spec from reference `models/fields.py:9-137` (SDFNetwork):
  * dims = [pe_dim] + [d_hidden]*n_layers + [d_out]; skip at layer 4 means
    layer 3 outputs d_hidden - pe_dim and layer 4 consumes
    concat(x, embedded_inputs)/sqrt(2);
  * geometric init (fields.py:47-73): last layer ~ N(+-sqrt(pi)/sqrt(fan_in),
    1e-4) with bias -+`bias` (sphere-like SDF at init); first layer zeroes
    the PE columns; skip layer zeroes the PE part of the concatenated input;
    hidden layers ~ N(0, sqrt(2)/sqrt(fan_out));
  * Softplus(beta=100) activations (fields.py:80);
  * input scaled by `scale`, output sdf divided by `scale` (fields.py:83,98);
  * gradient via autodiff (fields.py:106-137).

TPU-first: a single vjp over the whole point batch yields all per-point
gradients in one reverse sweep (the sdf is pointwise), and is itself
differentiable so eikonal/normal losses can backprop through it.
Matmuls default to float32-HIGHEST precision: sphere tracing needs SDF
values accurate to ~5e-5, below TPU bf16-pass matmul error.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iron_tpu.core.embedder import positional_encoding, pe_dim
from iron_tpu.fields.mlp import linear_params, apply_linear, normal_weight


@dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257            # 1 sdf + 256 feature
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    precision: str = "highest"  # MXU pass precision for f32 matmuls

    @property
    def d_embed(self) -> int:
        return pe_dim(self.multires, self.d_in)

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.d_embed,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def init_sdf(key, cfg: SDFConfig = SDFConfig()) -> dict:
    dims = list(cfg.dims)
    n = len(dims)
    layers = []
    keys = jax.random.split(key, n - 1)
    for l in range(n - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        d_in = dims[l]
        k = keys[l]
        if cfg.geometric_init:
            if l == n - 2:  # final layer: sphere-like init
                sign = -1.0 if cfg.inside_outside else 1.0
                w = normal_weight(k, d_in, out_dim,
                                  mean=sign * np.sqrt(np.pi) / np.sqrt(d_in),
                                  std=1e-4)
                b = jnp.full((out_dim,), -sign * cfg.bias, jnp.float32)
            elif cfg.multires > 0 and l == 0:
                w = normal_weight(k, d_in, out_dim, 0.0, np.sqrt(2) / np.sqrt(out_dim))
                w = w.at[cfg.d_in:, :].set(0.0)  # zero the PE columns
                b = jnp.zeros((out_dim,), jnp.float32)
            elif cfg.multires > 0 and l in cfg.skip_in:
                w = normal_weight(k, d_in, out_dim, 0.0, np.sqrt(2) / np.sqrt(out_dim))
                # zero the PE part of the concatenated skip input (last
                # dims[0]-d_in rows correspond to the embedded-input tail)
                w = w.at[-(dims[0] - cfg.d_in):, :].set(0.0)
                b = jnp.zeros((out_dim,), jnp.float32)
            else:
                w = normal_weight(k, d_in, out_dim, 0.0, np.sqrt(2) / np.sqrt(out_dim))
                b = jnp.zeros((out_dim,), jnp.float32)
        else:
            bound = 1.0 / np.sqrt(d_in)
            kw, kb = jax.random.split(k)
            w = jax.random.uniform(kw, (d_in, out_dim), jnp.float32, -bound, bound)
            b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
        layers.append(linear_params(w, b, cfg.weight_norm))
    return {"layers": layers}


def _softplus100(x):
    """Softplus with beta=100 (fields.py:80), numerically stable."""
    return jax.nn.softplus(100.0 * x) / 100.0


def sdf_apply(params: dict, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    """[..., 3] -> [..., d_out] = [sdf, features] (fields.py:82-98)."""
    prec = cfg.precision if cfg.precision else None
    inputs = positional_encoding(x * cfg.scale, cfg.multires)
    h = inputs
    n_layers = len(cfg.dims)
    for l in range(n_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = apply_linear(params["layers"][l], h, precision=prec)
        if l < n_layers - 2:
            h = _softplus100(h)
    return jnp.concatenate([h[..., :1] / cfg.scale, h[..., 1:]], axis=-1)


def sdf_only(params: dict, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    """[..., 3] -> [...] signed distance."""
    return sdf_apply(params, x, cfg)[..., 0]


def sdf_value_feat_grad(params: dict, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sdf [...], feature [..., 256], grad [..., 3]) in one forward + one
    reverse sweep; differentiable (create_graph equivalent, fields.py:120-137)."""
    out, vjp_fn = jax.vjp(lambda p: sdf_apply(params, p, cfg), x)
    ct = jnp.zeros_like(out).at[..., 0].set(1.0)
    (grad,) = vjp_fn(ct)
    return out[..., 0], out[..., 1:], grad


def sdf_grad(params: dict, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    """Per-point SDF gradient [..., 3] (fields.py:106-118)."""
    _, vjp_fn = jax.vjp(lambda p: sdf_only(params, p, cfg), x)
    (grad,) = vjp_fn(jnp.ones(x.shape[:-1], x.dtype))
    return grad


def sdf_value_feat_grad_fwd(params: dict, x: jnp.ndarray,
                            cfg: SDFConfig = SDFConfig()
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward-mode variant of `sdf_value_feat_grad` (SURVEY §7.4.2): the
    per-point gradient comes from 3 structured JVPs (one per input axis,
    batched by a vmap over tangents) instead of one reverse sweep.

    Why it exists: the normals feed the color net and the eikonal term, so
    the loss backward differentiates through this function.  With vjp-based
    normals that is reverse-over-REVERSE — the double-backward graph whose
    [B,S,256] residuals dominate stage-1 step time (BENCH_NOTES round-3
    ablation: ~108 of 207 ms at batch 2048).  Here the normal is built from
    forward-mode primitives, so the loss backward is reverse-over-FORWARD:
    each layer's JVP rule is differentiated directly, with no second
    reverse sweep.  Forward FLOPs are higher (3 tangent passes vs 1 reverse
    pass); whether it wins end-to-end is measured on-chip
    (scripts/bench_stage1_normals.py).

    Same contract as `sdf_value_feat_grad` (reference fields.py:120-137):
    differentiable, returns (sdf [...], feature [..., 256], grad [..., 3]).
    """
    out = sdf_apply(params, x, cfg)
    f = lambda p: sdf_only(params, p, cfg)
    eye = jnp.eye(cfg.d_in, dtype=x.dtype)

    def one_dir(t):
        return jax.jvp(f, (x,), (jnp.broadcast_to(t, x.shape),))[1]

    grad = jnp.moveaxis(jax.vmap(one_dir)(eye), 0, -1)
    return out[..., 0], out[..., 1:], grad
