"""Numerical parity between torch layers and our flax/XLA equivalents, and
round-trip correctness of the legacy weight converter (utils/torch_import).

torch (CPU) ships in this image, so each layout conversion is property-tested
against the real torch op. A small torch re-statement of the reference's
PoseResNet deconv stage structure acts as the end-to-end oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from centernet_tpu.models.layers import ConvTranspose2x, BilinearConvTranspose  # noqa: E402
from centernet_tpu.ops.dcn import dcn_v2  # noqa: E402
from centernet_tpu.utils import torch_import as ti  # noqa: E402


def _np(t):
    return t.detach().cpu().numpy()


def test_conv_kernel_conversion():
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
    x = torch.randn(2, 3, 16, 16)
    want = _np(tconv(x)).transpose(0, 2, 3, 1)

    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = {
        "kernel": jnp.asarray(ti.conv_kernel(_np(tconv.weight))),
        "bias": jnp.asarray(_np(tconv.bias)),
    }
    got = conv.apply(
        {"params": params}, jnp.asarray(_np(x).transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_conversion():
    tct = torch.nn.ConvTranspose2d(6, 6, 4, stride=2, padding=1, bias=False)
    x = torch.randn(1, 6, 8, 8)
    want = _np(tct(x)).transpose(0, 2, 3, 1)

    mod = ConvTranspose2x(6)
    params = {"kernel": jnp.asarray(ti.conv_transpose_kernel(_np(tct.weight)))}
    got = mod.apply({"params": params}, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("f", [2, 4])
def test_grouped_conv_transpose_conversion(f):
    c = 5
    tct = torch.nn.ConvTranspose2d(
        c, c, f * 2, stride=f, padding=f // 2, groups=c, bias=False
    )
    x = torch.randn(1, c, 7, 7)
    want = _np(tct(x)).transpose(0, 2, 3, 1)

    mod = BilinearConvTranspose(c, f)
    params = {
        "kernel": jnp.asarray(ti.grouped_conv_transpose_kernel(_np(tct.weight)))
    }
    got = mod.apply({"params": params}, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_batchnorm_conversion():
    tbn = torch.nn.BatchNorm2d(4)
    tbn.weight.data.uniform_(0.5, 1.5)
    tbn.bias.data.uniform_(-0.5, 0.5)
    tbn.running_mean.uniform_(-1, 1)
    tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    x = torch.randn(2, 4, 8, 8)
    want = _np(tbn(x)).transpose(0, 2, 3, 1)

    bn = nn.BatchNorm(use_running_average=True)
    variables = {
        "params": {
            "scale": jnp.asarray(_np(tbn.weight)),
            "bias": jnp.asarray(_np(tbn.bias)),
        },
        "batch_stats": {
            "mean": jnp.asarray(_np(tbn.running_mean)),
            "var": jnp.asarray(_np(tbn.running_var)),
        },
    }
    got = bn.apply(variables, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dcn_zero_offsets_equals_conv():
    """With zero offsets the deformable conv must reduce to a plain conv
    scaled by sigmoid(0)=0.5 on the mask."""
    ci, co = 4, 6
    tconv = torch.nn.Conv2d(ci, co, 3, padding=1, bias=True)
    x = torch.randn(1, ci, 10, 10)
    want = _np(tconv(x) * 0.5 + 0.5 * tconv.bias.view(1, -1, 1, 1)).transpose(
        0, 2, 3, 1
    )
    # note: out = (conv_nobias)*0.5 + bias; compute directly instead:
    with torch.no_grad():
        nob = torch.nn.functional.conv2d(x, tconv.weight, None, padding=1)
    want = (_np(nob) * 0.5 + _np(tconv.bias).reshape(1, -1, 1, 1)).transpose(
        0, 2, 3, 1
    )

    xj = jnp.asarray(_np(x).transpose(0, 2, 3, 1))
    offsets = jnp.zeros((1, 10, 10, 18))
    mask = jnp.full((1, 10, 10, 9), 0.5)
    got = dcn_v2(
        xj,
        offsets,
        mask,
        jnp.asarray(ti.dcn_weight(_np(tconv.weight))),
        jnp.asarray(_np(tconv.bias)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dcn_integer_offset_shifts_sampling():
    """An integer offset of (dy=0, dx=1) on every tap equals convolving the
    input shifted left by one pixel (zero-padded)."""
    ci, co = 2, 3
    w = torch.randn(co, ci, 3, 3)
    x = torch.randn(1, ci, 8, 8)
    x_shift = torch.zeros_like(x)
    x_shift[..., :-1] = x[..., 1:]
    with torch.no_grad():
        want = torch.nn.functional.conv2d(x_shift, w, None, padding=1)
    want = _np(want).transpose(0, 2, 3, 1)

    xj = jnp.asarray(_np(x).transpose(0, 2, 3, 1))
    offsets = jnp.zeros((1, 8, 8, 18)).at[..., 1::2].set(1.0)  # dx = 1
    mask = jnp.ones((1, 8, 8, 9))
    got = dcn_v2(
        xj, offsets, mask, jnp.asarray(ti.dcn_weight(_np(w))), jnp.zeros((co,))
    )
    # Edge columns differ by construction (shift-then-pad zeroes what the
    # deformable op can still sample); compare the interior.
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:6], want[:, :, 1:6], rtol=1e-4, atol=1e-5
    )


class _TorchResnet18Stage(torch.nn.Module):
    """Tiny torch oracle: reference PoseResNet layer naming (msra_resnet.py)
    with one basic block per stage, to exercise the full name mapping."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)

        def block(cin, cout, stride):
            b = torch.nn.Module()
            b.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            b.bn1 = torch.nn.BatchNorm2d(cout)
            b.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            b.bn2 = torch.nn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                b.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(cout),
                )
            else:
                b.downsample = None
            return b

        self.blocks = torch.nn.ModuleDict()
        chans = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (ci, co, s) in enumerate(chans):
            self.blocks[f"l{i}"] = block(ci, co, s)

    def state_dict_reference_names(self):
        sd = {}
        sd["conv1.weight"] = self.conv1.weight
        for n in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{n}"] = getattr(self.bn1, n)
        for i in range(4):
            b = self.blocks[f"l{i}"]
            p = f"layer{i + 1}.0"
            sd[f"{p}.conv1.weight"] = b.conv1.weight
            sd[f"{p}.conv2.weight"] = b.conv2.weight
            for n in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{p}.bn1.{n}"] = getattr(b.bn1, n)
                sd[f"{p}.bn2.{n}"] = getattr(b.bn2, n)
            if b.downsample is not None:
                sd[f"{p}.downsample.0.weight"] = b.downsample[0].weight
                for n in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.downsample.1.{n}"] = getattr(b.downsample[1], n)
        return {k: _np(v) for k, v in sd.items()}

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            b = self.blocks[f"l{i}"]
            res = x if b.downsample is None else b.downsample(x)
            y = torch.relu(b.bn1(b.conv1(x)))
            y = b.bn2(b.conv2(y))
            x = torch.relu(y + res)
        return x


def test_resnet_stage_mapping_end_to_end():
    """Full-name-mapping oracle: a 1-block-per-stage torch resnet with
    reference naming equals the flax ResNetStages after conversion."""
    from centernet_tpu.models.resnet import BasicBlock, ResNetStages

    tm = _TorchResnet18Stage().eval()
    # randomize BN stats so eval-mode BN is non-trivial
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    sd = tm.state_dict_reference_names()
    layers = [1, 1, 1, 1]

    fm = ResNetStages(BasicBlock, layers)
    x = np.random.randn(1, 64, 64, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    w = ti._Writer(variables)
    ti._map_resnet_stages(w, sd, (), False, layers)
    assert not w.missing, w.missing
    params = ti._merge(ti._to_plain(variables["params"]), w.params)
    stats = ti._merge(ti._to_plain(variables["batch_stats"]), w.batch_stats)

    got = np.asarray(
        fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    )
    with torch.no_grad():
        want = _np(tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))).transpose(
            0, 2, 3, 1
        )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
