"""Checkpointing: single-pytree save/load + stage-1 -> stage-2 conversion.

Replaces the reference's torch.save state-dict dicts and filename-step scan
(`utils/ckpt_loader.py:8-66`, `render_volume.py:613-643`,
`render_surface.py:669-671`) with one pickled pytree per step:
  {"params": ..., "opt_state": ..., "step": int, "extra": {...}}
Resume = scan `ckpt_*.pkl` by step (restart-based resilience, same model as
the reference).  The stage-1 -> stage-2 converter maps the stage-1 SDF into
the stage-2 SDF and warm-starts the diffuse albedo net from the stage-1
color net (architectures are intentionally identical, ckpt_loader.py:49-66).
"""
from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(out_dir: str, step: int, params: Any, opt_state: Any = None,
                    extra: Optional[Dict] = None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"ckpt_{step:07d}.pkl")
    payload = {"params": _to_numpy(params),
               "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
               "step": int(step), "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    return path


def latest_checkpoint(out_dir: str) -> Optional[str]:
    # numbered checkpoints only: ckpt_best.pkl (Stage2Trainer model
    # selection) is a selection artifact, not a resume point
    paths = [p for p in glob.glob(os.path.join(out_dir, "ckpt_*.pkl"))
             if re.search(r"ckpt_(\d+)\.pkl$", p)]
    if not paths:
        return None
    step_of = lambda p: int(re.search(r"ckpt_(\d+)\.pkl$", p).group(1))
    return max(paths, key=step_of)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class AsyncCheckpointer:
    """Non-blocking checkpointing via orbax (SURVEY §5: orbax async
    checkpointing + preemption-tolerant resume is the TPU-native
    equivalent of the reference's torch.save/restart model).

    Saves run in orbax's background thread; `wait()` (or the next save)
    joins the previous one.  Directory layout: <out_dir>/orbax/<step>/.
    """

    def __init__(self, out_dir: str):
        import orbax.checkpoint as ocp
        self.root = os.path.join(os.path.abspath(out_dir), "orbax")
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, step: int, params: Any, opt_state: Any = None,
             extra: Optional[Dict] = None) -> str:
        """Kick off a background save of the array pytrees; `extra`
        (config dicts / non-array metadata) is written synchronously as a
        side JSON — it is tiny and orbax's array handler does not take it."""
        import json
        path = os.path.join(self.root, f"{step:07d}")
        if os.path.exists(path):  # idempotent re-save at the same step
            # Not silent (ADVICE r3): a resumed run that re-trains to this
            # step keeps the OLD payload; delete the dir to force a re-save.
            import logging
            logging.getLogger(__name__).warning(
                "AsyncCheckpointer: step %d already on disk at %s — "
                "skipping re-save (existing payload kept)", step, path)
            return path
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._ckptr.save(path, args=self._args(payload))
        with open(path + ".extra.json", "w") as f:
            json.dump({"step": int(step), **(extra or {})}, f)
        return path

    def _args(self, payload):
        import orbax.checkpoint as ocp
        return ocp.args.StandardSave(payload)

    def wait(self):
        self._ckptr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.wait()
        steps = [int(p) for p in os.listdir(self.root)
                 if p.isdigit() and os.path.isdir(os.path.join(self.root, p))]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None,
                target: Any = None) -> Optional[Dict]:
        """Restore {params[, opt_state], step, extra}.  Pass `target` (a
        pytree of the same structure, e.g. freshly-initialized params /
        opt_state) to get back the original container types — without it
        orbax returns plain nested dicts."""
        import json
        import orbax.checkpoint as ocp
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        self.wait()
        path = os.path.join(self.root, f"{step:07d}")
        ckptr = ocp.StandardCheckpointer()
        out = ckptr.restore(path, target)
        extra = {}
        if os.path.exists(path + ".extra.json"):
            with open(path + ".extra.json") as f:
                extra = json.load(f)
        return {"params": out["params"],
                "opt_state": out.get("opt_state"),
                "step": int(extra.get("step", step)), "extra": extra}

    def close(self):
        self.wait()
        self._ckptr.close()


def load_any_checkpoint(path: str) -> Optional[Dict]:
    """Load a checkpoint from a pickle file, an orbax step directory, or an
    experiment directory holding either (newest step wins).  Lets stage-2's
    --neus_ckpt_fpath accept stage-1 runs that used async checkpointing."""
    if os.path.isfile(path):
        return load_checkpoint(path)
    if not os.path.isdir(path):
        return None
    base = os.path.basename(os.path.normpath(path))
    if base.isdigit() and os.path.basename(os.path.dirname(
            os.path.normpath(path))) == "orbax":
        ck = AsyncCheckpointer(os.path.dirname(os.path.dirname(
            os.path.normpath(path))))
        return ck.restore(step=int(base))
    pkl = latest_checkpoint(path)
    pkl_step = -1
    if pkl:
        pkl_step = int(re.search(r"ckpt_(\d+)\.pkl", pkl).group(1))
    orbax_step = -1
    if os.path.isdir(os.path.join(path, "orbax")):
        ck = AsyncCheckpointer(path)
        orbax_step = ck.latest_step() if ck.latest_step() is not None else -1
    if orbax_step < 0 and pkl_step < 0:
        return None
    if orbax_step >= pkl_step:
        return AsyncCheckpointer(path).restore(step=orbax_step)
    return load_checkpoint(pkl)


def stage1_to_stage2(stage1_params: Dict, stage2_params: Dict,
                     load_diffuse_albedo: bool = True) -> Dict:
    """Map stage-1 {sdf, color, ...} into stage-2 {sdf, materials}
    (ckpt_loader.py:49-66)."""
    out = dict(stage2_params)
    out["sdf"] = stage1_params["sdf"]
    if load_diffuse_albedo and "color" in stage1_params:
        mats = dict(out["materials"])
        s1_layers = stage1_params["color"]["layers"]
        s2_layers = mats["diffuse_albedo_network"]["layers"]
        if len(s1_layers) == len(s2_layers) and all(
                np.shape(a["v" if "v" in a else "w"]) == np.shape(b["v" if "v" in b else "w"])
                for a, b in zip(s1_layers, s2_layers)):
            mats = dict(mats)
            mats["diffuse_albedo_network"] = stage1_params["color"]
            out["materials"] = mats
    return out
