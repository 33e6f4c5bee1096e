"""Staged stage-2 curricula (the ModelBed driver).

Behavioral spec from reference `model_bed.py:1599-1641` (main) +
`model_bed.py:897-907` (component_switch): train in phases with per-phase
network freezing —
  * "rgb"      (to 50k):  color / diffuse+specular albedo / roughness /
                point light, SDF trainable;
  * "refrac"   (to 80k):  metallic & dielectric eta/k (+weights) nets,
                SDF frozen;
  * "env"      (to 120k): env_light_network only (per-point env lighting,
                use_env_light shading, model_bed.py render_fn_env_light).

Each phase builds its own optimizer masks via Stage2Trainer(trainable=...);
parameters carry over between phases.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer


PHASE_PLANS: Dict[str, Dict] = {
    "rgb": {
        "trainable": {
            "sdf": True, "color_network": True, "diffuse_albedo_network": True,
            "specular_albedo_network": True, "specular_roughness_network": True,
            "point_light_network": True,
            "metallic_network": False, "dielectric_network": False,
            "metallic_eta_network": False, "metallic_k_network": False,
            "dielectric_eta_network": False, "env_light_network": False,
        },
        "use_env_light": False,
    },
    "refrac": {
        "trainable": {
            "sdf": False, "color_network": False, "diffuse_albedo_network": False,
            "specular_albedo_network": False, "specular_roughness_network": True,
            "point_light_network": False,
            "metallic_network": True, "dielectric_network": True,
            "metallic_eta_network": True, "metallic_k_network": True,
            "dielectric_eta_network": True, "env_light_network": False,
        },
        "use_env_light": False,
    },
    "env": {
        "trainable": {
            "sdf": False, "color_network": False, "diffuse_albedo_network": False,
            "specular_albedo_network": False, "specular_roughness_network": False,
            "point_light_network": False,
            "metallic_network": False, "dielectric_network": False,
            "metallic_eta_network": False, "metallic_k_network": False,
            "dielectric_eta_network": False, "env_light_network": True,
        },
        "use_env_light": True,
    },
}


@dataclass
class CurriculumPhase:
    name: str
    num_iters: int


class CurriculumTrainer:
    """Runs Stage2 phases with per-phase freezing, carrying params over."""

    def __init__(self, cfg: Stage2Config, images: np.ndarray, Ks: np.ndarray,
                 W2Cs: np.ndarray, phases: Optional[List[CurriculumPhase]] = None,
                 out_dir: Optional[str] = None, stage1_params: Optional[Dict] = None):
        self.base_cfg = cfg
        self.images, self.Ks, self.W2Cs = images, Ks, W2Cs
        self.out_dir = out_dir
        self.phases = phases or [CurriculumPhase("rgb", 50_000),
                                 CurriculumPhase("refrac", 30_000),
                                 CurriculumPhase("env", 40_000)]
        self.stage1_params = stage1_params
        self.params = None
        self.step = 0

    def run(self, iters_scale: float = 1.0, log_every: int = 0, seed: int = 0) -> Dict:
        metrics = {}
        for phase in self.phases:
            plan = PHASE_PLANS[phase.name]
            cfg = dataclasses.replace(self.base_cfg,
                                      use_env_light=plan["use_env_light"])
            tr = Stage2Trainer(cfg, self.images, self.Ks, self.W2Cs,
                               out_dir=self.out_dir,
                               stage1_params=self.stage1_params if self.params is None else None,
                               trainable=plan["trainable"])
            if self.params is not None:
                tr.params = self.params
                tr.opt_state = tr.tx.init(tr.params)
            tr.step = self.step
            n = max(1, int(phase.num_iters * iters_scale))
            metrics = tr.run(num_iters=n, log_every=log_every, seed=seed)
            self.params = tr.params
            self.step = tr.step
            if self.out_dir:
                tr.save()
        return metrics
