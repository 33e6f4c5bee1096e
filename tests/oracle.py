"""Helpers to use the PyTorch reference (if mounted) as a numerical oracle.

We never copy reference code; we *run* it on CPU and compare outputs.
Weight transfer: torch weight_norm stores (weight_v [out,in], weight_g
[out,1], bias); our layers store (v [in,out], g [out], b [out]) with the
same effective-weight formula, so the map is a transpose.
"""
import os
import sys

import numpy as np

REFERENCE_DIR = "/root/reference"


def _stub_module(name):
    import types
    if name not in sys.modules:
        try:
            __import__(name)
            return
        except ImportError:
            pass
        sys.modules[name] = types.ModuleType(name)


def import_reference():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # stub import-time-only deps of the reference that are absent here
    for name in ["kornia", "kornia.morphology", "kornia.filters", "icecream",
                 "mcubes", "configargparse", "cv2x"]:
        _stub_module(name)
    import types
    ic_mod = sys.modules["icecream"]
    ic_mod.ic = lambda *a, **k: None
    import torch  # noqa
    torch.set_default_dtype(torch.float32)


def torch_linear_to_ours(lin, weight_norm=True):
    """Convert a (possibly weight-normed) torch Linear to our param dict."""
    import torch
    with torch.no_grad():
        if weight_norm and hasattr(lin, "weight_v"):
            v = lin.weight_v.detach().cpu().numpy()      # [out, in]
            g = lin.weight_g.detach().cpu().numpy()[:, 0]  # [out]
            b = lin.bias.detach().cpu().numpy()
            return {"v": v.T.copy(), "g": g.copy(), "b": b.copy()}
        w = lin.weight.detach().cpu().numpy()
        b = lin.bias.detach().cpu().numpy()
        return {"w": w.T.copy(), "b": b.copy()}


def sdf_params_from_torch(net):
    layers = []
    l = 0
    while hasattr(net, f"lin{l}"):
        layers.append(torch_linear_to_ours(getattr(net, f"lin{l}")))
        l += 1
    return {"layers": layers}


def rendering_params_from_torch(net):
    return sdf_params_from_torch(net)


def nerf_params_from_torch(net, dual=False):
    params = {
        "pts_linears": [torch_linear_to_ours(m, weight_norm=False) for m in net.pts_linears],
        "feature_linear": torch_linear_to_ours(net.feature_linear, weight_norm=False),
        "alpha_linear": torch_linear_to_ours(net.alpha_linear, weight_norm=False),
        "views_linear": torch_linear_to_ours(net.views_linears[0], weight_norm=False),
        "rgb_linear": torch_linear_to_ours(net.rgb_linear, weight_norm=False),
    }
    if dual:
        params["nir_linear"] = torch_linear_to_ours(net.nir_linear, weight_norm=False)
    return params
