"""Legacy torch CenterNet weight import (reference: centernet.py:23-62).

Converts original-CenterNet / reference-repo torch checkpoints into this
framework's flax variable trees:

* head-key remapping hm->heatmap, wh->width_height, ... (HEAD_KEY_MAPPING,
  reference centernet.py:24-31);
* tensor layout conversion: conv OIHW -> HWIO, transpose-conv IOHW ->
  spatially-flipped HWIO, BN weight/bias/running stats -> scale/bias/
  mean/var, DCN weights -> the [KK*Ci, Co] tap-major matmul layout with the
  DCNv2 offset-channel permutation;
* per-family name mapping (res / resdcn / dla) from torch module paths to
  flax param paths.

The inverse direction (exporting flax -> torch) is not needed for parity.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .checkpoint import HEAD_KEY_MAPPING, load_torch_state_dict


# ---------------------------------------------------------------------------
# Tensor converters
# ---------------------------------------------------------------------------


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> our lhs-dilated-conv HWIO
    kernel: spatial flip + [kh, kw, in, out]."""
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def grouped_conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """Depthwise torch ConvTranspose2d [C, 1, kh, kw] (groups=C) -> our
    grouped HWIO [kh, kw, 1, C] with spatial flip."""
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 1, 0)))


def dcn_weight(w: np.ndarray) -> np.ndarray:
    """torch DCN main weight [Co, Ci, K, K] -> [KK*Ci, Co] tap-major rows."""
    co, ci, kh, kw = w.shape
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * ci, co)
    )


def dcn_offset_mask_perm(kk: int) -> np.ndarray:
    """Output-channel permutation torch conv_offset_mask -> ours.

    The DCNv2 CUDA kernel reads cat(o1, o2) channels interleaved: channel 2k
    = dy of tap k, 2k+1 = dx of tap k. Our layout is [dy_0..dy_{KK-1},
    dx_0..dx_{KK-1}, mask...]."""
    perm = np.empty(3 * kk, np.int64)
    for k in range(kk):
        perm[k] = 2 * k  # dy_k
        perm[kk + k] = 2 * k + 1  # dx_k
        perm[2 * kk + k] = 2 * kk + k  # mask_k
    return perm


def dcn_offset_mask_kernel(w: np.ndarray) -> np.ndarray:
    kk = w.shape[0] // 3
    return conv_kernel(w[dcn_offset_mask_perm(kk)])


def dcn_offset_mask_bias(b: np.ndarray) -> np.ndarray:
    kk = b.shape[0] // 3
    return b[dcn_offset_mask_perm(kk)]


# ---------------------------------------------------------------------------
# Variable-tree plumbing
# ---------------------------------------------------------------------------


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Writer:
    """Collects params/batch_stats assignments and validates shapes against
    the target tree."""

    def __init__(self, target_vars: Mapping):
        self.params: Dict = {}
        self.batch_stats: Dict = {}
        self.target = target_vars
        self.missing: list = []

    def conv(self, torch_sd, tkey, fpath, transform=conv_kernel, bias=False):
        if f"{tkey}.weight" not in torch_sd:
            self.missing.append(f"{tkey}.weight")
            return
        _set(self.params, fpath + ("kernel",), transform(torch_sd[f"{tkey}.weight"]))
        if bias and f"{tkey}.bias" in torch_sd:
            _set(self.params, fpath + ("bias",), torch_sd[f"{tkey}.bias"])

    def bn(self, torch_sd, tkey, fpath):
        if f"{tkey}.weight" not in torch_sd:
            self.missing.append(f"{tkey}.weight")
            return
        _set(self.params, fpath + ("scale",), torch_sd[f"{tkey}.weight"])
        _set(self.params, fpath + ("bias",), torch_sd[f"{tkey}.bias"])
        _set(self.batch_stats, fpath + ("mean",), torch_sd[f"{tkey}.running_mean"])
        _set(self.batch_stats, fpath + ("var",), torch_sd[f"{tkey}.running_var"])

    def dcn(self, torch_sd, tkey, fpath):
        """tkey points at a DCN module (weight/bias/conv_offset_mask.*)."""
        if f"{tkey}.weight" not in torch_sd:
            self.missing.append(f"{tkey}.weight")
            return
        _set(self.params, fpath + ("weight",), dcn_weight(torch_sd[f"{tkey}.weight"]))
        _set(self.params, fpath + ("bias",), torch_sd[f"{tkey}.bias"])
        _set(
            self.params,
            fpath + ("conv_offset_mask", "kernel"),
            dcn_offset_mask_kernel(torch_sd[f"{tkey}.conv_offset_mask.weight"]),
        )
        _set(
            self.params,
            fpath + ("conv_offset_mask", "bias"),
            dcn_offset_mask_bias(torch_sd[f"{tkey}.conv_offset_mask.bias"]),
        )


# ---------------------------------------------------------------------------
# Family mappings
# ---------------------------------------------------------------------------


def _map_resnet_stages(w: _Writer, sd, prefix: Tuple[str, ...], bottleneck: bool,
                       layers):
    """torch PoseResNet stage params -> flax ResNetStages tree."""
    w.conv(sd, "conv1", prefix + ("conv1",))
    w.bn(sd, "bn1", prefix + ("bn1",))
    n_convs = 3 if bottleneck else 2
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            t = f"layer{li + 1}.{bi}"
            f = prefix + (f"layer{li + 1}_{bi}",)
            for c in range(n_convs):
                w.conv(sd, f"{t}.conv{c + 1}", f + (f"Conv_{c}",))
                w.bn(sd, f"{t}.bn{c + 1}", f + (f"BatchNorm_{c}",))
            if f"{t}.downsample.0.weight" in sd:
                w.conv(sd, f"{t}.downsample.0", f + (f"Conv_{n_convs}",))
                w.bn(sd, f"{t}.downsample.1", f + (f"BatchNorm_{n_convs}",))


def _map_res(w: _Writer, sd, layers, bottleneck):
    _map_resnet_stages(w, sd, ("backbone", "resnet"), bottleneck, layers)
    # deconv_layers: Sequential [deconv, bn, relu] x3 -> indices 0,1 / 3,4 / 6,7
    for i in range(3):
        w.conv(
            sd,
            f"deconv_layers.{3 * i}",
            ("backbone", f"deconv{i}", "ConvTranspose2x_0"),
            transform=conv_transpose_kernel,
        )
        w.bn(sd, f"deconv_layers.{3 * i + 1}", ("backbone", f"deconv{i}", "BatchNorm_0"))


def _map_resdcn(w: _Writer, sd, layers, bottleneck):
    _map_resnet_stages(w, sd, ("backbone", "resnet"), bottleneck, layers)
    # deconv_layers: [DCN, BN, ReLU, ConvTranspose, BN, ReLU] x3 -> stride 6
    for i in range(3):
        base = 6 * i
        w.dcn(sd, f"deconv_layers.{base}", ("backbone", f"dcn{i}"))
        w.bn(sd, f"deconv_layers.{base + 1}", ("backbone", f"dcn_bn{i}"))
        w.conv(
            sd,
            f"deconv_layers.{base + 3}",
            ("backbone", f"up{i}"),
            transform=conv_transpose_kernel,
        )
        w.bn(sd, f"deconv_layers.{base + 4}", ("backbone", f"up_bn{i}"))


def _map_dla_block(w: _Writer, sd, t: str, f: Tuple[str, ...]):
    """torch DLA BasicBlock -> flax DlaBasicBlock(conv1/conv2 ConvBNAct)."""
    w.conv(sd, f"{t}.conv1", f + ("conv1", "Conv_0"))
    w.bn(sd, f"{t}.bn1", f + ("conv1", "BatchNorm_0"))
    w.conv(sd, f"{t}.conv2", f + ("conv2", "Conv_0"))
    w.bn(sd, f"{t}.bn2", f + ("conv2", "BatchNorm_0"))


def _map_dla_tree(w: _Writer, sd, t: str, f: Tuple[str, ...], levels: int):
    if levels == 1:
        _map_dla_block(w, sd, f"{t}.tree1", f + ("tree1",))
        _map_dla_block(w, sd, f"{t}.tree2", f + ("tree2",))
        w.conv(sd, f"{t}.root.conv", f + ("root", "Conv_0"))
        w.bn(sd, f"{t}.root.bn", f + ("root", "BatchNorm_0"))
    else:
        _map_dla_tree(w, sd, f"{t}.tree1", f + ("tree1",), levels - 1)
        _map_dla_tree(w, sd, f"{t}.tree2", f + ("tree2",), levels - 1)
    if f"{t}.project.0.weight" in sd:
        w.conv(sd, f"{t}.project.0", f + ("project_conv",))
        w.bn(sd, f"{t}.project.1", f + ("project_bn",))


def _map_dla_base(w: _Writer, sd, tprefix: str = "base.",
                  levels=(1, 1, 1, 2, 2, 1)):
    """DLA trunk params.  ``tprefix`` is "base." inside full CenterNet
    checkpoints and "" for standalone dl.yf.io ImageNet classifiers (the
    reference loads those base-relative, pose_dla_dcn.py:380-397)."""
    b = ("backbone", "base")
    w.conv(sd, f"{tprefix}base_layer.0", b + ("base_layer", "Conv_0"))
    w.bn(sd, f"{tprefix}base_layer.1", b + ("base_layer", "BatchNorm_0"))
    for lvl in (0, 1):
        for i in range(levels[lvl]):
            w.conv(
                sd,
                f"{tprefix}level{lvl}.{2 * i}",
                b + (f"level{lvl}_{i}", "Conv_0"),
            )
            w.bn(
                sd,
                f"{tprefix}level{lvl}.{2 * i + 1}",
                b + (f"level{lvl}_{i}", "BatchNorm_0"),
            )
    for lvl in (2, 3, 4, 5):
        _map_dla_tree(w, sd, f"{tprefix}level{lvl}", b + (f"level{lvl}",),
                      levels[lvl])


def _map_dla(w: _Writer, sd, levels=(1, 1, 1, 2, 2, 1)):
    _map_dla_base(w, sd, "base.", levels)

    def map_ida(tprefix: str, fprefix: Tuple[str, ...], n: int):
        for i in range(1, n):
            for part in ("proj", "node"):
                w.dcn(sd, f"{tprefix}.{part}_{i}.conv", fprefix + (f"{part}_{i}", "conv"))
                w.bn(
                    sd,
                    f"{tprefix}.{part}_{i}.actf.0",
                    fprefix + (f"{part}_{i}", "BatchNorm_0"),
                )
            w.conv(
                sd,
                f"{tprefix}.up_{i}",
                fprefix + (f"up_{i}",),
                transform=grouped_conv_transpose_kernel,
            )

    # dla_up: ida_0 over 2 maps, ida_1 over 3, ida_2 over 4 (first_level=2)
    for i, n in enumerate((2, 3, 4)):
        map_ida(f"dla_up.ida_{i}", ("backbone", "dla_up", f"ida_{i}"), n)
    map_ida("ida_up", ("backbone", "ida_up"), 3)


def _map_hg_conv(w: _Writer, sd, t: str, f: Tuple[str, ...]):
    """Original `convolution` module (conv+bn+relu, large_hourglass.py:11)."""
    w.conv(sd, f"{t}.conv", f + ("Conv_0",))
    w.bn(sd, f"{t}.bn", f + ("BatchNorm_0",))


def _map_hg_residual(w: _Writer, sd, t: str, f: Tuple[str, ...], skip: bool):
    """Original `residual` (conv1/bn1/conv2/bn2[/skip], large_hourglass.py:51).

    ``skip`` is static (stride 2 or channel change) so the mapping is total
    — no dependence on which keys happen to exist in the file."""
    w.conv(sd, f"{t}.conv1", f + ("Conv_0",))
    w.bn(sd, f"{t}.bn1", f + ("BatchNorm_0",))
    w.conv(sd, f"{t}.conv2", f + ("Conv_1",))
    w.bn(sd, f"{t}.bn2", f + ("BatchNorm_1",))
    if skip:
        w.conv(sd, f"{t}.skip.0", f + ("Conv_2",))
        w.bn(sd, f"{t}.skip.1", f + ("BatchNorm_2",))


def _map_hg_module(w: _Writer, sd, t: str, f: Tuple[str, ...], n: int,
                   dims, modules):
    """Recursive kp_module (large_hourglass.py:144-207) -> flax HgModule."""
    curr_mod, next_mod = modules[0], modules[1]
    curr_dim, next_dim = dims[0], dims[1]
    for i in range(curr_mod):
        _map_hg_residual(w, sd, f"{t}.up1.{i}", f + (f"up1_{i}",), skip=False)
        _map_hg_residual(
            w, sd, f"{t}.low1.{i}", f + (f"low1_{i}",), skip=(i == 0)
        )
    if n > 1:
        _map_hg_module(w, sd, f"{t}.low2", f + ("low2",), n - 1, dims[1:],
                       modules[1:])
    else:
        for i in range(next_mod):
            _map_hg_residual(
                w, sd, f"{t}.low2.{i}", f + (f"low2_{i}",), skip=False
            )
    for i in range(curr_mod - 1):
        _map_hg_residual(w, sd, f"{t}.low3.{i}", f + (f"low3_{i}",),
                         skip=False)
    _map_hg_residual(
        w, sd, f"{t}.low3.{curr_mod - 1}", f + (f"low3_{curr_mod - 1}",),
        skip=(next_dim != curr_dim),
    )


def _map_hourglass(w: _Writer, sd, num_stacks: int = 2,
                   dims=(256, 256, 384, 384, 384, 512),
                   modules=(2, 2, 2, 2, 2, 4)):
    """Original large-hourglass exkp naming -> flax HourglassNet
    (reference remap site: centernet.py:46-61; structure
    large_hourglass.py:210-339)."""
    b = ("backbone",)
    _map_hg_conv(w, sd, "pre.0", b + ("pre_conv",))
    _map_hg_residual(w, sd, "pre.1", b + ("pre_res",), skip=True)
    for s in range(num_stacks):
        _map_hg_module(w, sd, f"kps.{s}", b + (f"kp_{s}",), 5, dims, modules)
        _map_hg_conv(w, sd, f"cnvs.{s}", b + (f"cnv_{s}",))
    for s in range(num_stacks - 1):
        w.conv(sd, f"inters_.{s}.0", b + (f"inter__conv_{s}",))
        w.bn(sd, f"inters_.{s}.1", b + (f"inter__bn_{s}",))
        w.conv(sd, f"cnvs_.{s}.0", b + (f"cnv__conv_{s}",))
        w.bn(sd, f"cnvs_.{s}.1", b + (f"cnv__bn_{s}",))
        _map_hg_residual(w, sd, f"inters.{s}", b + (f"inters_{s}",),
                         skip=False)


def _map_heads(w: _Writer, sd_heads: Mapping[str, Mapping[str, np.ndarray]],
               num_stacks: int):
    """Head dicts (keyed by remapped head name) -> flax
    head_{s}/{name}/Conv_{0,1} (reference remap, centernet.py:46-61).

    Accepted per-head key forms (everything the original CenterNet zoo and
    the reference produce):
    * "fc.0.weight" / "<stack>.fc.<idx>.weight" — decoupled-head layouts;
    * "<seq>.weight"  — original resnet/dla Sequential(conv, relu, conv)
      heads (seq 0 = 3x3, seq 2 = final 1x1), single stack;
    * "<stack>.<seq>.conv.weight" / "<stack>.<seq>.weight" — original
      hourglass per-stack ModuleList heads (seq 0 = `convolution` module
      with inner ``conv``, seq 1 = final 1x1).
    """
    for name, sub in sd_heads.items():
        for k, v in sub.items():
            parts = k.split(".")
            if parts[0] == "fc":
                stack, seq, leaf = 0, int(parts[1]), parts[2]
            elif len(parts) == 2:  # original resnet/dla "0.weight"
                stack, seq, leaf = 0, int(parts[0]), parts[1]
            elif parts[1] == "fc":
                stack, seq, leaf = int(parts[0]), int(parts[2]), parts[3]
            else:  # original hourglass "<stack>.<seq>[.conv].<leaf>"
                stack, seq, leaf = int(parts[0]), int(parts[1]), parts[-1]
            conv_i = 0 if seq == 0 else 1
            fpath = (f"head_{stack}", name, f"Conv_{conv_i}")
            if leaf == "weight":
                _set(w.params, fpath + ("kernel",), conv_kernel(v))
            else:
                _set(w.params, fpath + ("bias",), v)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def _merge(dst, src, path=()):
    """Overlay src dict onto a copy of dst (plain dicts). Strict: every
    imported path must already exist in the target tree (catches name-map
    typos instead of silently creating orphan parameters) and shapes must
    match."""
    out = dict(dst)
    for k, v in src.items():
        if k not in dst:
            raise KeyError(
                f"import writes unknown parameter path {'/'.join(path + (k,))}"
            )
        if isinstance(v, dict):
            out[k] = _merge(dst.get(k, {}), v, path + (k,))
        else:
            if k in dst and hasattr(dst[k], "shape"):
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"target {tuple(dst[k].shape)} vs import {np.shape(v)}"
                    )
            out[k] = np.asarray(v, dtype=np.float32)
    return out


def convert_state_dict(state_dict: Mapping[str, np.ndarray], task,
                       target_vars: Mapping) -> Dict[str, Any]:
    """Convert a legacy torch state_dict into {params, batch_stats} overlaying
    ``target_vars`` (the task's initialized variables)."""
    arch = task.arch
    family = arch.split("_")[0]

    # Split head params from backbone params (reference centernet.py:34-45).
    backbone_sd = {}
    head_sd: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        root = k.split(".")[0]
        if root in HEAD_KEY_MAPPING:
            head_sd.setdefault(HEAD_KEY_MAPPING[root], {})[
                k[len(root) + 1 :]
            ] = v
        else:
            backbone_sd[k] = v

    w = _Writer(target_vars)
    from ..models.resnet import RESNET_SPEC

    if family == "res":
        block, layers = RESNET_SPEC[int(arch.split("_")[1])]
        _map_res(w, backbone_sd, layers, block.__name__ == "Bottleneck")
    elif family == "resdcn":
        block, layers = RESNET_SPEC[int(arch.split("_")[1])]
        _map_resdcn(w, backbone_sd, layers, block.__name__ == "Bottleneck")
    elif family == "dla":
        _map_dla(w, backbone_sd)
    elif family == "hourglass":
        _map_hourglass(w, backbone_sd, task.num_stacks)
    else:
        raise NotImplementedError(
            f"legacy import for family {family!r} is not supported"
        )
    _map_heads(w, head_sd, task.num_stacks)

    params = _merge(_to_plain(target_vars["params"]), w.params)
    batch_stats = _merge(_to_plain(target_vars["batch_stats"]), w.batch_stats)
    return {"params": params, "batch_stats": batch_stats, "missing": w.missing}


def _to_plain(tree):
    if isinstance(tree, Mapping):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def load_legacy_centernet_weights(path: str, task, target_vars) -> Dict[str, Any]:
    """Load + convert a legacy checkpoint file (reference
    load_pretrained_weights, centernet.py:23-62)."""
    sd = load_torch_state_dict(path)
    out = convert_state_dict(sd, task, target_vars)
    if out["missing"]:
        print(
            f"[torch_import] {len(out['missing'])} expected torch keys "
            f"missing, e.g. {out['missing'][:5]}"
        )
    return {"params": out["params"], "batch_stats": out["batch_stats"]}


# ---------------------------------------------------------------------------
# ImageNet backbone initialization
# ---------------------------------------------------------------------------


def convert_imagenet_backbone(state_dict: Mapping[str, np.ndarray], task,
                              target_vars: Mapping) -> Dict[str, Any]:
    """Convert an ImageNet *classifier* state_dict (backbone only) into
    {params, batch_stats} overlaying ``target_vars``.

    Accepted namings:
    * res/resdcn: torchvision ``resnet{18,34,50,101,152}`` state_dicts
      (``conv1/bn1/layerX.Y...``; the ``fc`` head is ignored) — the
      reference auto-downloads exactly these (msra_resnet.py:239-246);
    * dla_34: the dl.yf.io ``dla34`` classifier state_dict, base-relative
      keys (``base_layer/level0..level5``; ``fc`` ignored) — reference
      pose_dla_dcn.py:380-397.

    Everything NOT covered by the file (deconv/DCN up-path, heads) keeps its
    fresh initialization, matching the reference's from-ImageNet training
    setup.  Returns a "missing" list that is empty for well-formed inputs.
    """
    arch = task.arch
    family = arch.split("_")[0]
    w = _Writer(target_vars)
    from ..models.resnet import RESNET_SPEC

    if family in ("res", "resdcn"):
        block, layers = RESNET_SPEC[int(arch.split("_")[1])]
        _map_resnet_stages(
            w, state_dict, ("backbone", "resnet"), block.__name__ == "Bottleneck",
            layers,
        )
    elif family == "dla":
        _map_dla_base(w, state_dict, tprefix="")
    else:
        raise NotImplementedError(
            f"no ImageNet weights exist for family {family!r} "
            "(the reference ships none for hourglass either)"
        )

    params = _merge(_to_plain(target_vars["params"]), w.params)
    batch_stats = _merge(_to_plain(target_vars["batch_stats"]), w.batch_stats)
    return {"params": params, "batch_stats": batch_stats, "missing": w.missing}


def load_imagenet_backbone(path: str, task, target_vars) -> Dict[str, Any]:
    """Initialize a fresh model's backbone from a local ImageNet state_dict
    file (torchvision resnet / dl.yf.io dla34 naming).  The TPU-native
    equivalent of the reference's ``pretrained=True`` download-and-load
    (msra_resnet.py:239-246, pose_dla_dcn.py:380-397) — network access is
    replaced by a local file path (``--backbone_weights``)."""
    sd = load_torch_state_dict(path)
    out = convert_imagenet_backbone(sd, task, target_vars)
    if out["missing"]:
        raise ValueError(
            f"ImageNet import left {len(out['missing'])} backbone keys "
            f"unmatched, e.g. {out['missing'][:5]} — wrong file for "
            f"arch {task.arch!r}?"
        )
    return {"params": out["params"], "batch_stats": out["batch_stats"]}
