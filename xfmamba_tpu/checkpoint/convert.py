"""PyTorch ``.pth`` checkpoint -> JAX pytree converter.

Implements the key mapping of the reference loader stack (SURVEY.md §3.4):
legacy key rewrites from ``VSSM._load_from_state_dict``
(``/root/reference/models/vmamba.py:2333-2372``: ``patch_embed.proj ->
patch_embed.0``, ``ln_1 -> norm``, ``self_attention -> op``, ``norm ->
classifier.norm``, ``head -> classifier.head``), the ``Linear2d`` weight
reshape (`vmamba.py:47-49`), and the layout transposes from torch
(OIHW convs, (out,in) linears, channel-first pos-embed) to this framework's
channel-last flax modules.

Unlike the reference's silent ``strict=False`` load
(`fusion_vmamba.py:1692-1702`), conversion is STRICT: every tensor must be
consumed, mapped, or appear on an explicit drop-list, otherwise we raise.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# tensors that exist in reference checkpoints but have no consumer in the
# forward pass (and hence no parameter here)
_DROP_PATTERNS = [
    r".*fusemamba\.blocks\.\d+\.self_attention\.in_proj\.weight$",  # dead (fusion_vmamba.py:399)
    r".*fusemamba\.blocks\.\d+\.self_attention\.in_proj\.bias$",
    r".*num_batches_tracked$",
    r".*total_ops$", r".*total_params$",  # thop/fvcore counters
]


def load_pth_state_dict(path: str, key: str = "model") -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a {key: np.ndarray} dict (CPU only)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


def _apply_legacy_rewrites(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """VSSM._load_from_state_dict legacy-name rewrites (vmamba.py:2359-2371)."""
    out = {}
    for k, v in sd.items():
        k = k.replace("patch_embed.proj.", "patch_embed.0.")
        k = k.replace("patch_embed.norm.", "patch_embed.2.")
        k = re.sub(r"(layers\.\d+\.blocks\.\d+\.)ln_1\.", r"\1norm.", k)
        k = re.sub(r"(layers\.\d+\.blocks\.\d+\.)self_attention\.",
                   r"\1op.", k)
        if k.startswith("norm."):
            k = "classifier.norm." + k[len("norm."):]
        if k.startswith("head."):
            k = "classifier.head." + k[len("head."):]
        out[k] = v
    return out


def _t_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear/Linear2d weight -> flax Dense kernel."""
    if w.ndim == 4:  # Linear2d stored as (out, in, 1, 1)
        w = w.reshape(w.shape[0], w.shape[1])
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate destination {'/'.join(path)}")
    node[path[-1]] = value


_PN = {"weight": None, "bias": "bias"}  # norm/conv/linear suffix handling


def _convert_vssm_key(k: str, v: np.ndarray, patchembed_v2: bool,
                      downsample_v1: bool):
    """Map one (rewritten) VSSM state-dict key to (path, tensor) or None if
    the key belongs elsewhere."""
    # ---- patch embed
    m = re.match(r"patch_embed\.(\d+)\.(weight|bias)$", k)
    if m:
        idx, wb = int(m.group(1)), m.group(2)
        if patchembed_v2:
            name, is_conv = {0: ("conv1", True), 2: ("norm1", False),
                             5: ("conv2", True), 7: ("norm2", False)}[idx]
        else:
            name, is_conv = {0: ("proj", True), 2: ("norm", False)}[idx]
        if is_conv:
            t = _t_conv(v) if wb == "weight" else v
            return ("patch_embed", name, "conv", "kernel" if wb == "weight"
                    else "bias"), t
        return ("patch_embed", name,
                "scale" if wb == "weight" else "bias"), v
    if k == "pos_embed":
        return ("pos_embed",), v.transpose(0, 2, 3, 1)

    # ---- stages / blocks
    m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.*)$", k)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        blk = f"stage{i}_block{j}"
        return _convert_block_rest(blk, rest, v)

    # ---- downsample
    m = re.match(r"layers\.(\d+)\.downsample\.(.*)$", k)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        ds = f"downsample{i}"
        if downsample_v1:
            m2 = re.match(r"(norm|reduction)\.(weight|bias)$", rest)
            if m2:
                name, wb = m2.groups()
                if name == "reduction":
                    return (ds, "reduction",
                            "kernel" if wb == "weight" else "bias"), \
                        _t_linear(v) if wb == "weight" else v
                return (ds, "norm", "scale" if wb == "weight" else "bias"), v
        m2 = re.match(r"(\d+)\.(weight|bias)$", rest)
        if m2:
            idx, wb = int(m2.group(1)), m2.group(2)
            if idx == 1:  # conv
                return (ds, "conv", "conv",
                        "kernel" if wb == "weight" else "bias"), \
                    _t_conv(v) if wb == "weight" else v
            if idx == 3:  # norm
                return (ds, "norm", "scale" if wb == "weight" else "bias"), v
        raise KeyError(f"unhandled downsample key {k}")

    # ---- outnorms / classifier
    m = re.match(r"outnorm(\d+)\.(weight|bias)$", k)
    if m:
        i, wb = m.groups()
        return (f"outnorm{i}", "scale" if wb == "weight" else "bias"), v
    m = re.match(r"classifier\.norm\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return ("classifier_norm", "scale" if wb == "weight" else "bias"), v
    m = re.match(r"classifier\.head\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return ("classifier_head", "kernel" if wb == "weight" else "bias"), \
            _t_linear(v) if wb == "weight" else v
    raise KeyError(f"unhandled VSSM key {k}")


def _convert_block_rest(blk: str, rest: str, v: np.ndarray):
    """Keys inside one VSSBlock."""
    m = re.match(r"(norm2?|mlp\.fc[12])\.(weight|bias)$", rest)
    if m:
        name, wb = m.groups()
        if name.startswith("mlp."):
            fc = name.split(".")[1]
            return (blk, "mlp", fc, "kernel" if wb == "weight" else "bias"), \
                _t_linear(v) if wb == "weight" else v
        return (blk, name, "scale" if wb == "weight" else "bias"), v

    m = re.match(r"op\.(.*)$", rest)
    if not m:
        raise KeyError(f"unhandled block key {blk}.{rest}")
    oprest = m.group(1)
    if oprest in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                  "A_logs", "Ds"):
        return (blk, "op", oprest), v
    m = re.match(r"(in_proj|out_proj)\.(weight|bias)$", oprest)
    if m:
        name, wb = m.groups()
        return (blk, "op", name, "kernel" if wb == "weight" else "bias"), \
            _t_linear(v) if wb == "weight" else v
    m = re.match(r"conv2d\.(weight|bias)$", oprest)
    if m:
        wb = m.group(1)
        return (blk, "op", "conv2d", "conv",
                "kernel" if wb == "weight" else "bias"), \
            _t_conv(v) if wb == "weight" else v
    m = re.match(r"out_norm\.(weight|bias)$", oprest)
    if m:
        wb = m.group(1)
        return (blk, "op", "out_norm", "norm",
                "scale" if wb == "weight" else "bias"), v
    m = re.match(r"out_norm\.(\d+)\.(weight|bias)$", oprest)
    if m:  # cnorm variant: Sequential(LN, perm, dwconv, perm)
        idx, wb = int(m.group(1)), m.group(2)
        if idx == 0:
            return (blk, "op", "out_norm", "norm",
                    "scale" if wb == "weight" else "bias"), v
        return (blk, "op", "out_norm", "dwconv", "conv",
                "kernel" if wb == "weight" else "bias"), \
            _t_conv(v) if wb == "weight" else v
    raise KeyError(f"unhandled op key {blk}.op.{oprest}")


def convert_vssm_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a (sub-)state-dict of one VSSM/Backbone_VSSM into a nested
    params dict matching `xfmamba_tpu.models.vssm.VSSM`."""
    sd = _apply_legacy_rewrites(sd)
    patchembed_v2 = any(k.startswith("patch_embed.5.") for k in sd)
    downsample_v1 = any(".downsample.reduction." in k for k in sd)
    tree: Dict = {}
    for k, v in sd.items():
        if _dropped(k):
            continue
        path, t = _convert_vssm_key(k, v, patchembed_v2, downsample_v1)
        _set(tree, path, np.asarray(t))
    return tree


def _dropped(k: str) -> bool:
    return any(re.match(p, k) for p in _DROP_PATTERNS)


def _convert_fusion_op_key(rest: str, v: np.ndarray):
    """Keys inside ShallowFuse_SS2Dv4 / Cross_SS2Dv5."""
    if rest in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                "A_logs", "Ds"):
        return (rest,), v
    m = re.match(r"(in_proj|in_proj_sec|out_proj)\.(weight|bias)$", rest)
    if m:
        name, wb = m.groups()
        return (name, "kernel" if wb == "weight" else "bias"), \
            _t_linear(v) if wb == "weight" else v
    m = re.match(r"conv2d\.(weight|bias)$", rest)
    if m:
        wb = m.group(1)
        return ("conv2d", "conv", "kernel" if wb == "weight" else "bias"), \
            _t_conv(v) if wb == "weight" else v
    m = re.match(r"out_norm\.(weight|bias)$", rest)
    if m:
        wb = m.group(1)
        return ("out_norm", "scale" if wb == "weight" else "bias"), v
    m = re.match(r"fc1\.(\d+)\.weight$", rest)
    if m:  # SE bottleneck Sequential(Linear, SiLU, Linear, Sigmoid)
        idx = int(m.group(1))
        name = "fc1_reduce" if idx == 0 else "fc1_expand"
        return (name, "kernel"), _t_linear(v)
    raise KeyError(f"unhandled fusion op key {rest}")


def convert_xfmamba_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a full TwoViewXFMambaTop state dict
    (`net_fusionmamba.py:141-210`) into a flax variables dict
    ``{"params": ..., "batch_stats": ...}`` for TwoViewXFMamba.  The
    batch_stats come from the shallow fusion block's BatchNorm2d
    (`fusion_vmamba.py:884`)."""
    tree: Dict = {}
    stats: Dict = {}
    backbone_sd = {}
    for k, v in sd.items():
        if _dropped(k):
            continue
        if k.startswith("mamba_feature_extrac."):
            backbone_sd[k[len("mamba_feature_extrac."):]] = v
            continue
        m = re.match(r"shallow_mamba_fusion\.norm\."
                     r"(weight|bias|running_mean|running_var)$", k)
        if m:
            wb = m.group(1)
            if wb in ("running_mean", "running_var"):
                _set(stats, ("shallow_mamba_fusion", "norm",
                             "mean" if wb == "running_mean" else "var"), v)
            else:
                _set(tree, ("shallow_mamba_fusion", "norm",
                            "scale" if wb == "weight" else "bias"), v)
            continue
        m = re.match(r"shallow_mamba_fusion\.shallowfuseSS2D\.(.*)$", k)
        if m:
            path, t = _convert_fusion_op_key(m.group(1), v)
            _set(tree, ("shallow_mamba_fusion", "shallowfuseSS2D") + path,
                 np.asarray(t))
            continue
        m = re.match(r"fusemamba\.blocks\.(\d+)\.norm\.(weight|bias)$", k)
        if m:
            i, wb = m.groups()
            _set(tree, ("fusemamba", f"block{i}", "norm",
                        "scale" if wb == "weight" else "bias"), v)
            continue
        m = re.match(r"fusemamba\.blocks\.(\d+)\.self_attention\.(.*)$", k)
        if m:
            i, rest = m.groups()
            path, t = _convert_fusion_op_key(rest, v)
            _set(tree, ("fusemamba", f"block{i}", "self_attention") + path,
                 np.asarray(t))
            continue
        m = re.match(r"final_conv\.(weight|bias)$", k)
        if m:
            wb = m.group(1)
            t = _t_conv(v) if wb == "weight" else v
            _set(tree, ("final_conv", "conv",
                        "kernel" if wb == "weight" else "bias"), np.asarray(t))
            continue
        m = re.match(r"classifier\.head\.(weight|bias)$", k)
        if m:
            wb = m.group(1)
            t = _t_linear(v) if wb == "weight" else v
            _set(tree, ("classifier_head",
                        "kernel" if wb == "weight" else "bias"), np.asarray(t))
            continue
        raise KeyError(f"unhandled XFMamba top key {k}")

    if backbone_sd:
        tree["mamba_feature_extrac"] = convert_vssm_state_dict(backbone_sd)
    out = {"params": tree}
    if stats:
        out["batch_stats"] = stats
    return out


def verify_tree_matches(converted: Dict, params: Dict, path=()):
    """Assert the converted tree exactly covers the model's param tree
    (names + shapes); hard-fails on mismatch — the anti-silent-drop stance."""
    from flax.traverse_util import flatten_dict
    want = flatten_dict(params)
    got = flatten_dict(converted)
    missing = [k for k in want if k not in got]
    extra = [k for k in got if k not in want]
    if missing or extra:
        raise ValueError(
            f"converted tree mismatch; missing={['/'.join(m) for m in missing][:10]} "
            f"extra={['/'.join(e) for e in extra][:10]}")
    for k in want:
        if tuple(want[k].shape) != tuple(got[k].shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: model {want[k].shape} "
                f"vs checkpoint {got[k].shape}")
