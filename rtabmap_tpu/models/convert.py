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


# ------------------------------------------------------- SuperGlue official


def _lin(w, b):
    w = _to_numpy(w)
    if w.ndim == 3:          # MagicLeap Conv1d (out,in,1)
        w = w[:, :, 0]
    return {"w": w.astype(np.float32), "b": _to_numpy(b).astype(np.float32)}


def _bn(sd, prefix):
    return {"gamma": _to_numpy(sd[f"{prefix}.weight"]).astype(np.float32),
            "beta": _to_numpy(sd[f"{prefix}.bias"]).astype(np.float32),
            "mean": _to_numpy(sd[f"{prefix}.running_mean"]).astype(np.float32),
            "var": _to_numpy(sd[f"{prefix}.running_var"]).astype(np.float32)}


def convert_superglue(src) -> Dict:
    """Official SuperGlue checkpoint -> param tree for
    ``models.superglue_official.superglue_apply``.

    Accepts either the MagicLeap layout (superglue_indoor.pth:
    kenc.encoder Conv1d sequential, gnn.layers.N.attn.proj.{0,1,2} /
    attn.merge, mlp Conv1d sequential, final_proj, bin_score) or the
    HF-transformers layout (keypoint_encoder.encoder.N.linear/batch_norm,
    gnn.layers.N.attention.self.query|key|value / attention.output.dense,
    mlp.0.linear/batch_norm + mlp.1, final_projection.final_proj)."""
    sd = _load_state_dict(src)
    hf = any(k.startswith("keypoint_encoder.") for k in sd)
    ml = any(k.startswith("kenc.") for k in sd)
    if not hf and not ml:
        raise KeyError(f"unrecognized SuperGlue layout "
                       f"(keys: {sorted(sd)[:6]}...)")
    params: Dict = {"gnn": {"layers": []}}
    if hf:
        blocks = [{"linear": _lin(sd[f"keypoint_encoder.encoder.{i}.linear.weight"],
                                  sd[f"keypoint_encoder.encoder.{i}.linear.bias"]),
                   "bn": _bn(sd, f"keypoint_encoder.encoder.{i}.batch_norm")}
                  for i in range(4)]
        params["kenc"] = {
            "blocks": blocks,
            "final": _lin(sd["keypoint_encoder.encoder.4.weight"],
                          sd["keypoint_encoder.encoder.4.bias"])}
        n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("gnn.layers."))
        for i in range(n_layers):
            g = f"gnn.layers.{i}"
            params["gnn"]["layers"].append({
                "q": _lin(sd[f"{g}.attention.self.query.weight"],
                          sd[f"{g}.attention.self.query.bias"]),
                "k": _lin(sd[f"{g}.attention.self.key.weight"],
                          sd[f"{g}.attention.self.key.bias"]),
                "v": _lin(sd[f"{g}.attention.self.value.weight"],
                          sd[f"{g}.attention.self.value.bias"]),
                "out": _lin(sd[f"{g}.attention.output.dense.weight"],
                            sd[f"{g}.attention.output.dense.bias"]),
                "mlp0": {"linear": _lin(sd[f"{g}.mlp.0.linear.weight"],
                                        sd[f"{g}.mlp.0.linear.bias"]),
                         "bn": _bn(sd, f"{g}.mlp.0.batch_norm")},
                "mlp1": _lin(sd[f"{g}.mlp.1.weight"], sd[f"{g}.mlp.1.bias"]),
            })
        params["final"] = _lin(sd["final_projection.final_proj.weight"],
                               sd["final_projection.final_proj.bias"])
    else:
        # MagicLeap sequential indices: conv at 0,3,6,9 with BN at 1,4,7,10
        # (ReLU between), final conv at 12
        blocks = [{"linear": _lin(sd[f"kenc.encoder.{c}.weight"],
                                  sd[f"kenc.encoder.{c}.bias"]),
                   "bn": _bn(sd, f"kenc.encoder.{c + 1}")}
                  for c in (0, 3, 6, 9)]
        params["kenc"] = {
            "blocks": blocks,
            "final": _lin(sd["kenc.encoder.12.weight"],
                          sd["kenc.encoder.12.bias"])}
        n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("gnn.layers."))
        for i in range(n_layers):
            g = f"gnn.layers.{i}"
            params["gnn"]["layers"].append({
                "q": _lin(sd[f"{g}.attn.proj.0.weight"],
                          sd[f"{g}.attn.proj.0.bias"]),
                "k": _lin(sd[f"{g}.attn.proj.1.weight"],
                          sd[f"{g}.attn.proj.1.bias"]),
                "v": _lin(sd[f"{g}.attn.proj.2.weight"],
                          sd[f"{g}.attn.proj.2.bias"]),
                "out": _lin(sd[f"{g}.attn.merge.weight"],
                            sd[f"{g}.attn.merge.bias"]),
                "mlp0": {"linear": _lin(sd[f"{g}.mlp.0.weight"],
                                        sd[f"{g}.mlp.0.bias"]),
                         "bn": _bn(sd, f"{g}.mlp.1")},
                "mlp1": _lin(sd[f"{g}.mlp.3.weight"], sd[f"{g}.mlp.3.bias"]),
            })
        params["final"] = _lin(sd["final_proj.weight"], sd["final_proj.bias"])
    params["bin_score"] = float(_to_numpy(sd["bin_score"]))
    return params
