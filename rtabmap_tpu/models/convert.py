"""Pretrained-weight converters: torch checkpoints -> flax param npz.

Capability parity: the reference loads learned models as TorchScript /
TF checkpoints (superpoint_torch/SuperPoint.cc:342 loads the MagicLeap
``superpoint_v1.pt``; corelib/src/python/rtabmap_netvlad.py loads the
NetVLAD TF checkpoint). Here the torch/TF graph never runs online —
weights are converted ONCE into the flax param pytree this framework
jits, so the TPU compute path stays pure XLA.

Converted layouts are verified by numerical-equivalence tests
(tests/test_weight_convert.py): the official torch architecture and the
flax module produce matching outputs for the SAME (random or pretrained)
weights — so dropping in the real ``superpoint_v1.pt`` is a pure data
operation.

No network egress exists in this build environment, so no pretrained
file ships here; ``convert_superpoint`` accepts any of:
- a MagicLeap-layout ``state_dict`` (conv1a..convDb) from
  ``torch.load(...)`` or ``torch.jit.load(...).state_dict()``
- a path to such a ``.pt``/``.pth`` file (TorchScript or pickled)
"""
from __future__ import annotations

from typing import Dict

import numpy as np

# MagicLeap SuperPointNet layer order -> flax auto-named Conv_{i} of
# rtabmap_tpu.models.superpoint.SuperPointNet (same topology: VGG encoder
# 64,64,64,64,128,128,128,128 + detector convPa(256)/convPb(65,1x1) +
# descriptor convDa(256)/convDb(256,1x1))
_SP_ORDER = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_superpoint(src) -> Dict:
    """MagicLeap/rtabmap SuperPoint torch weights -> flax params for
    ``models.superpoint.SuperPointNet``.

    torch Conv2d kernels are (out, in, kh, kw); flax wants
    (kh, kw, in, out)."""
    sd = _load_state_dict(src)
    # normalize names: strip any module prefixes
    norm = {}
    for k, v in sd.items():
        base = k.split(".")[-2] if "." in k else k
        leaf = k.split(".")[-1]
        norm[(base, leaf)] = _to_numpy(v)
    params = {}
    for i, name in enumerate(_SP_ORDER):
        w = norm.get((name, "weight"))
        b = norm.get((name, "bias"))
        if w is None:
            raise KeyError(
                f"missing layer '{name}' in SuperPoint checkpoint "
                f"(found: {sorted({k[0] for k in norm})})")
        params[f"Conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": (np.zeros(w.shape[0], np.float32) if b is None
                     else b.astype(np.float32)),
        }
    return params


def _load_state_dict(src):
    if isinstance(src, dict):
        return src
    if isinstance(src, str):
        import torch

        try:
            return torch.jit.load(src, map_location="cpu").state_dict()
        except Exception:
            obj = torch.load(src, map_location="cpu", weights_only=False)
            return obj.state_dict() if hasattr(obj, "state_dict") else obj
    if hasattr(src, "state_dict"):
        return src.state_dict()
    raise TypeError(f"cannot extract a state_dict from {type(src)}")


def convert_superpoint_file(src_path: str, out_npz: str) -> None:
    """One-shot CLI conversion: superpoint_v1.pt -> flax npz consumed by
    ``SuperPoint.load_params``."""
    from rtabmap_tpu.models.superpoint import SuperPoint

    params = convert_superpoint(src_path)
    SuperPoint(params=params).save_params(out_npz)


def convert_netvlad(src) -> Dict:
    """NetVLAD checkpoint -> {codebook (K,D), alpha}. Accepts either a
    dict with explicit ``centroids`` (TF/torch exports of the NetVLAD
    layer keep cluster centers; the conv soft-assignment weights are
    2*alpha*centroids and derive from them), or a torch state_dict with
    ``centroids``/``conv.weight`` entries (common torch NetVLAD ports)."""
    sd = _load_state_dict(src) if not isinstance(src, dict) else src
    cent = None
    alpha = None
    for k, v in sd.items():
        lk = k.lower()
        if "centroid" in lk or lk.endswith("clusters") or lk == "codebook":
            cent = _to_numpy(v)
        if lk == "alpha":
            alpha = float(_to_numpy(v))
    if cent is None:
        raise KeyError(f"no centroids found in NetVLAD checkpoint "
                       f"(keys: {sorted(sd)[:8]}...)")
    if cent.ndim != 2:
        cent = cent.reshape(cent.shape[0], -1)
    out = {"codebook": cent.astype(np.float32)}
    if alpha is not None:
        out["alpha"] = alpha
    return out
