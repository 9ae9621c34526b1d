"""Weight-import name-map coverage: for each family, synthesize a torch
state_dict with exactly the keys+shapes the mapping expects (derived by
inverting each tensor transform against the flax target tree), convert, and
check every written path lands on an existing target parameter with the
right shape (strict _merge) and that nothing the mapping wants is missing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_tpu.utils import torch_import as ti


def _synthesize_and_convert(arch):
    from centernet_tpu.tasks.detection import CenterNetDetection

    task = CenterNetDetection(arch)
    hw = (128, 128) if arch == "hourglass" else (64, 64)
    variables = task.init_variables(jax.random.PRNGKey(0), hw)
    params = ti._to_plain(variables["params"])
    stats = ti._to_plain(variables["batch_stats"])

    # Pass 1: capture which torch keys + flax paths the mapping touches.
    captured = []

    class Recorder(ti._Writer):
        def conv(self, sd, tkey, fpath, transform=ti.conv_kernel, bias=False):
            captured.append(("conv", tkey, fpath, transform))

        def bn(self, sd, tkey, fpath):
            captured.append(("bn", tkey, fpath, None))

        def dcn(self, sd, tkey, fpath):
            captured.append(("dcn", tkey, fpath, None))

    rec = Recorder(variables)
    family = arch.split("_")[0]
    from centernet_tpu.models.resnet import RESNET_SPEC

    if family == "res":
        block, layers = RESNET_SPEC[int(arch.split("_")[1])]
        ti._map_res(rec, {}, layers, block.__name__ == "Bottleneck")
    elif family == "resdcn":
        block, layers = RESNET_SPEC[int(arch.split("_")[1])]
        ti._map_resdcn(rec, {}, layers, block.__name__ == "Bottleneck")
    elif family == "hourglass":
        ti._map_hourglass(rec, {}, task.num_stacks)
    else:
        ti._map_dla(rec, {})

    # Pass 2: synthesize a torch sd with the inverse shapes.
    sd = {}
    for kind, tkey, fpath, transform in captured:
        node = params
        try:
            for p in fpath:
                node = node[p]
        except KeyError:
            raise AssertionError(
                f"mapping targets nonexistent flax path {'/'.join(fpath)} "
                f"(torch key {tkey})"
            )
        if kind == "conv":
            kern = node["kernel"]
            if transform is ti.conv_kernel:
                kh, kw, ci, co = kern.shape
                sd[f"{tkey}.weight"] = np.zeros((co, ci, kh, kw), np.float32)
            elif transform is ti.conv_transpose_kernel:
                kh, kw, i, o = kern.shape
                sd[f"{tkey}.weight"] = np.zeros((i, o, kh, kw), np.float32)
            else:  # grouped transpose
                kh, kw, one, c = kern.shape
                sd[f"{tkey}.weight"] = np.zeros((c, one, kh, kw), np.float32)
        elif kind == "bn":
            c = node["scale"].shape[0]
            for n in ("weight", "bias"):
                sd[f"{tkey}.{n}"] = np.zeros((c,), np.float32)
            for n in ("running_mean", "running_var"):
                sd[f"{tkey}.{n}"] = np.zeros((c,), np.float32)
        else:  # dcn
            kkci, co = node["weight"].shape
            ci = kkci // 9
            sd[f"{tkey}.weight"] = np.zeros((co, ci, 3, 3), np.float32)
            sd[f"{tkey}.bias"] = np.zeros((co,), np.float32)
            om = node["conv_offset_mask"]["kernel"]
            kh, kw, ci2, c27 = om.shape
            sd[f"{tkey}.conv_offset_mask.weight"] = np.zeros(
                (c27, ci2, kh, kw), np.float32
            )
            sd[f"{tkey}.conv_offset_mask.bias"] = np.zeros((c27,), np.float32)

    # Heads: reference-remapped layout for single-stack arches, the
    # original hourglass per-stack ModuleList layout for hourglass.
    sd_head_prefix = {
        "heatmap": "hm", "width_height": "wh", "regression": "reg",
    }
    for name, ch in task.heads.items():
        hc = task.head_conv
        in_ch = params["head_0"][name]["Conv_0"]["kernel"].shape[2]
        pre = sd_head_prefix[name]
        if arch == "hourglass":
            for st in range(task.num_stacks):
                sd[f"{pre}.{st}.0.conv.weight"] = np.zeros(
                    (hc, in_ch, 3, 3), np.float32)
                sd[f"{pre}.{st}.0.conv.bias"] = np.zeros((hc,), np.float32)
                sd[f"{pre}.{st}.1.weight"] = np.zeros(
                    (ch, hc, 1, 1), np.float32)
                sd[f"{pre}.{st}.1.bias"] = np.zeros((ch,), np.float32)
        else:
            sd[f"{pre}.fc.0.weight"] = np.zeros((hc, in_ch, 3, 3), np.float32)
            sd[f"{pre}.fc.0.bias"] = np.zeros((hc,), np.float32)
            sd[f"{pre}.fc.2.weight"] = np.zeros((ch, hc, 1, 1), np.float32)
            sd[f"{pre}.fc.2.bias"] = np.zeros((ch,), np.float32)

    out = ti.convert_state_dict(sd, task, variables)
    assert not out["missing"], out["missing"][:8]
    return out


@pytest.mark.parametrize("arch", ["res_18", "resdcn_18", "dla_34", "hourglass"])
def test_import_mapping_covers_and_targets_exist(arch):
    """Every torch key the mapping expects converts onto an existing flax
    parameter with a matching shape (strict merge), none are missing."""
    out = _synthesize_and_convert(arch)
    assert "params" in out and "batch_stats" in out


def test_merge_rejects_unknown_paths():
    with pytest.raises(KeyError):
        ti._merge({"a": {"b": np.zeros(2)}}, {"a": {"c": np.zeros(2)}})
