"""ImageNet backbone initialization (reference auto-downloads torchvision
resnet / dl.yf.io dla34 ImageNet weights: msra_resnet.py:239-246,
pose_dla_dcn.py:380-397; here a local state_dict file via
``--backbone_weights``).

The resnet18 key list below is written out explicitly from the torchvision
naming convention (NOT derived from our mapper), so it genuinely gates that
``convert_imagenet_backbone`` consumes torchvision-format files."""

import numpy as np
import jax
import pytest

from centernet_tpu.utils import torch_import as ti


def _resnet18_imagenet_state_dict():
    """Exact torchvision resnet18 ImageNet state_dict keys + shapes."""
    sd = {}
    rng = np.random.default_rng(0)

    def add(key, shape):
        sd[key] = rng.standard_normal(shape).astype(np.float32)

    def add_bn(prefix, c):
        for n in ("weight", "bias", "running_mean", "running_var"):
            add(f"{prefix}.{n}", (c,))
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    add("conv1.weight", (64, 3, 7, 7))
    add_bn("bn1", 64)
    chans = [64, 128, 256, 512]
    for li, c in enumerate(chans):
        for bi in range(2):
            p = f"layer{li + 1}.{bi}"
            cin = c if (bi > 0 or li == 0) else chans[li - 1]
            add(f"{p}.conv1.weight", (c, cin, 3, 3))
            add_bn(f"{p}.bn1", c)
            add(f"{p}.conv2.weight", (c, c, 3, 3))
            add_bn(f"{p}.bn2", c)
            if li > 0 and bi == 0:
                add(f"{p}.downsample.0.weight", (c, chans[li - 1], 1, 1))
                add_bn(f"{p}.downsample.1", c)
    add("fc.weight", (1000, 512))
    add("fc.bias", (1000,))
    return sd


@pytest.mark.parametrize("arch", ["res_18", "resdcn_18"])
def test_imagenet_resnet_init(arch):
    from centernet_tpu.tasks.detection import CenterNetDetection

    task = CenterNetDetection(arch)
    variables = task.init_variables(jax.random.PRNGKey(0), (64, 64))
    sd = _resnet18_imagenet_state_dict()

    out = ti.convert_imagenet_backbone(sd, task, variables)
    assert out["missing"] == [], out["missing"][:8]

    # conv1 kernel landed, OIHW -> HWIO
    got = out["params"]["backbone"]["resnet"]["conv1"]["kernel"]
    np.testing.assert_allclose(
        got, sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6
    )
    # BN stats landed in batch_stats
    np.testing.assert_allclose(
        out["batch_stats"]["backbone"]["resnet"]["bn1"]["mean"],
        sd["bn1.running_mean"], rtol=1e-6,
    )
    # heads untouched (keep fresh init)
    fresh = ti._to_plain(variables["params"])
    np.testing.assert_array_equal(
        out["params"]["head_0"]["heatmap"]["Conv_1"]["bias"],
        fresh["head_0"]["heatmap"]["Conv_1"]["bias"],
    )


def test_imagenet_dla_init():
    """dl.yf.io dla34 classifier naming (base-relative keys, fc ignored)."""
    from centernet_tpu.tasks.detection import CenterNetDetection

    task = CenterNetDetection("dla_34")
    variables = task.init_variables(jax.random.PRNGKey(0), (64, 64))
    params = ti._to_plain(variables["params"])

    # capture the torch keys the base mapping reads, synthesize shapes from
    # the flax target (same technique as test_torch_import_mapping)
    captured = []

    class Recorder(ti._Writer):
        def conv(self, sd, tkey, fpath, transform=ti.conv_kernel, bias=False):
            captured.append(("conv", tkey, fpath))

        def bn(self, sd, tkey, fpath):
            captured.append(("bn", tkey, fpath))

    ti._map_dla_base(Recorder(variables), {}, tprefix="")

    # the mapper reads tree "project" convs only when present in the file —
    # enumerate them from the flax tree (dl.yf.io dla34 ships them)
    def walk_projects(node, tpath, fpath):
        if "project_conv" in node:
            captured.append(("conv", tpath + ".project.0", fpath + ("project_conv",)))
            captured.append(("bn", tpath + ".project.1", fpath + ("project_bn",)))
        for name, sub in node.items():
            if isinstance(sub, dict) and name.startswith("tree"):
                walk_projects(sub, f"{tpath}.{name}", fpath + (name,))

    base = params["backbone"]["base"]
    for lvl in (2, 3, 4, 5):
        walk_projects(base[f"level{lvl}"], f"level{lvl}",
                      ("backbone", "base", f"level{lvl}"))

    rng = np.random.default_rng(1)
    sd = {}
    for kind, tkey, fpath in captured:
        node = params
        for p in fpath:
            node = node[p]
        if kind == "conv":
            kh, kw, ci, co = node["kernel"].shape
            sd[f"{tkey}.weight"] = rng.standard_normal(
                (co, ci, kh, kw)
            ).astype(np.float32)
        else:
            c = node["scale"].shape[0]
            for n in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{tkey}.{n}"] = rng.standard_normal(c).astype(np.float32)
    # classifier head present in the dl.yf.io file, must be ignored
    sd["fc.weight"] = np.zeros((1000, 512, 1, 1), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)

    # spot-check the naming convention itself (reference DLA structure)
    assert "base_layer.0.weight" in sd
    assert "level2.tree1.conv1.weight" in sd
    assert "level3.tree1.tree1.conv1.weight" in sd
    assert "level2.project.0.weight" in sd

    out = ti.convert_imagenet_backbone(sd, task, variables)
    assert out["missing"] == [], out["missing"][:8]
    got = out["params"]["backbone"]["base"]["base_layer"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        got, sd["base_layer.0.weight"].transpose(2, 3, 1, 0), rtol=1e-6
    )
    # DCN up-path untouched (fresh init preserved)
    fresh = params
    np.testing.assert_array_equal(
        out["params"]["backbone"]["dla_up"]["ida_0"]["proj_1"]["conv"]["weight"],
        fresh["backbone"]["dla_up"]["ida_0"]["proj_1"]["conv"]["weight"],
    )


def test_imagenet_loader_raises_on_wrong_file(tmp_path):
    """A file that doesn't cover the backbone must fail loudly."""
    import torch

    from centernet_tpu.tasks.detection import CenterNetDetection
    from centernet_tpu.utils.torch_import import load_imagenet_backbone

    task = CenterNetDetection("res_18")
    variables = task.init_variables(jax.random.PRNGKey(0), (64, 64))
    p = str(tmp_path / "bogus.pth")
    torch.save({"unrelated.weight": torch.zeros(3)}, p)
    with pytest.raises(ValueError, match="unmatched"):
        load_imagenet_backbone(p, task, variables)
