"""Structured config system.

Replaces the reference's split-brain config (SURVEY.md §5: pyhocon .conf
with literal CASE_NAME substitution for stage 1, configargparse CLI for
stage 2, hard-coded dicts for architectures) with one JSON config layer
over the dataclass defaults:

  * config files are JSON with `CASE_NAME` (and `RGB_NAME`/`NIR_NAME`)
    string substitution before parsing (render_volume.py:29-37 semantics);
  * every dataclass field can be overridden by a dotted key, e.g.
    {"train": {"batch_size": 512}, "model": {"neus_renderer":
    {"n_samples": 64}}} mirroring the reference conf sections;
  * architecture registry stays in code (iron_tpu.shading.materials).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

from iron_tpu.fields.sdf import SDFConfig
from iron_tpu.fields.nerf import NeRFConfig
from iron_tpu.fields.rendering import RenderingConfig
from iron_tpu.volume.integrator import NeuSRenderConfig
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.surface.tracer import TracerConfig
from iron_tpu.train.stage1 import Stage1Config
from iron_tpu.train.stage2 import Stage2Config


def load_config_file(path: str, case: str = "", rgb_name: str = "",
                     nir_name: str = "") -> Dict[str, Any]:
    """Read a JSON config with CASE_NAME substitution (render_volume.py:29-37)."""
    with open(path) as f:
        text = f.read()
    text = text.replace("CASE_NAME", case)
    text = text.replace("RGB_NAME", rgb_name or case)
    text = text.replace("NIR_NAME", nir_name or case)
    return json.loads(text)


def _update_dataclass(dc, overrides: Dict[str, Any]):
    """Recursively apply dict overrides to a (frozen) dataclass."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(dc)}
    for k, v in overrides.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {type(dc).__name__}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kwargs[k] = _update_dataclass(cur, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return dataclasses.replace(dc, **kwargs)


def stage1_config_from_dict(d: Dict[str, Any]) -> Stage1Config:
    """Build Stage1Config from a reference-shaped config dict (sections
    train/model per confs/womask_iron.conf)."""
    cfg = Stage1Config()
    train = d.get("train", {})
    model = d.get("model", {})
    overrides: Dict[str, Any] = {}
    mapping = {  # conf key -> dataclass field
        "learning_rate": "learning_rate", "learning_rate_alpha": "learning_rate_alpha",
        "end_iter": "end_iter", "batch_size": "batch_size",
        "warm_up_end": "warm_up_end", "anneal_end": "anneal_end",
        "use_white_bkgd": "use_white_bkgd", "igr_weight": "igr_weight",
        "mask_weight": "mask_weight", "save_freq": "save_freq",
        "val_freq": "val_freq", "report_freq": "report_freq",
    }
    for k, f in mapping.items():
        if k in train:
            overrides[f] = train[k]
    if "sdf_network" in model:
        sdf_map = {"d_out": "d_out", "d_in": "d_in", "d_hidden": "d_hidden",
                   "n_layers": "n_layers", "skip_in": "skip_in",
                   "multires": "multires", "bias": "bias", "scale": "scale",
                   "geometric_init": "geometric_init", "weight_norm": "weight_norm"}
        overrides["sdf"] = {sdf_map[k]: v for k, v in model["sdf_network"].items()
                            if k in sdf_map}
    if "variance_network" in model and "init_val" in model["variance_network"]:
        overrides["variance_init"] = model["variance_network"]["init_val"]
    if "neus_renderer" in model:
        overrides["render"] = {k: v for k, v in model["neus_renderer"].items()
                               if k in ("n_samples", "n_importance", "n_outside",
                                        "up_sample_steps", "perturb")}
    if "nerf" in model:
        nerf_map = {"D": "D", "W": "W", "d_in": "d_in", "d_in_view": "d_in_view",
                    "multires": "multires", "multires_view": "multires_view",
                    "skips": "skips", "use_viewdirs": "use_viewdirs"}
        overrides["nerf"] = {nerf_map[k]: v for k, v in model["nerf"].items()
                             if k in nerf_map}
    if "rendering_network" in model:
        rn_map = {"d_feature": "d_feature", "mode": "mode", "d_in": "d_in",
                  "d_out": "d_out", "d_hidden": "d_hidden", "n_layers": "n_layers",
                  "multires": "multires", "multires_view": "multires_view",
                  "squeeze_out": "squeeze_out", "skip_in": "skip_in",
                  "weight_norm": "weight_norm"}
        overrides["color"] = {rn_map[k]: v for k, v in model["rendering_network"].items()
                              if k in rn_map}
    return _update_dataclass(cfg, overrides)


def stage2_config_from_dict(d: Dict[str, Any]) -> Stage2Config:
    cfg = Stage2Config()
    return _update_dataclass(cfg, d)
