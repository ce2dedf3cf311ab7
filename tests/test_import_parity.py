"""Numeric parity of the torch->flax weight importers, in-env.

torchvision is not installed here, so the oracles are hand-built from
``torch.nn`` primitives with torchvision's exact module names and
hyper-parameters (stride/padding/eps), randomly initialized.  The converted
flax modules must reproduce the torch eval-mode forward to float32
accuracy — this checks the whole conversion algebra (OIHW->HWIO transpose,
BN scale/bias/mean/var mapping, padding conventions, first-conv 50-channel
surgery) with real numerics, not just "it runs".

Reference parity targets: GAN_word/modules_tro.py:464-533 (ResNet50 style
encoder), fid_folder/inception.py (pytorch-fid InceptionV3: avg-pool
count_include_pad=False, Mixed_7c max-pool).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from affganwriting_tpu.utils.torch_import import (  # noqa: E402
    inception_v3_to_flax,
    merge_pretrained,
    resnet50_to_flax,
)


def _randomize_bn(module, rng):
    """Non-trivial BN stats/affine so the conversion is actually tested."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.tensor(
                rng.normal(0, 0.1, n), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, n), dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, n), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(
                rng.normal(0, 0.1, n), dtype=torch.float32))


def _close(a, b, name, rtol=2e-3):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(1.0, float(np.std(b)))
    assert a.shape == b.shape, (name, a.shape, b.shape)
    assert np.max(np.abs(a - b)) <= rtol * scale, (
        name, float(np.max(np.abs(a - b))), scale)


# --------------------------------------------------------------------------
# ResNet50 oracle (torchvision resnet.py layout)
# --------------------------------------------------------------------------
class _TBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, down):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        if down:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idn)


class _TResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (n, width) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 1) else 1
                down = bi == 0 and (stride != 1 or cin != width * 4)
                blocks.append(_TBottleneck(cin, width, stride, down))
                cin = width * 4
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = []
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
            taps.append(h)
        return taps


@pytest.mark.slow  # full-size resnet50 forward + compile on the 1-core CPU
def test_resnet50_import_numeric_parity():
    from affganwriting_tpu.models.style_encoders.resnet import (
        ResNet50StyleEncoder,
    )

    rng = np.random.default_rng(0)
    tmodel = _TResNet50().eval()
    with torch.no_grad():
        _randomize_bn(tmodel, rng)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    x3 = rng.normal(0, 1, (1, 3, 32, 64)).astype(np.float32)
    with torch.no_grad():
        t_taps = [t.numpy() for t in tmodel(torch.tensor(x3))]

    enc = ResNet50StyleEncoder(dtype=jnp.float32)
    x50 = np.zeros((1, 32, 64, 50), np.float32)
    x50[..., :3] = x3.transpose(0, 2, 3, 1)
    variables = enc.init(jax.random.key(0), x50)
    params, stats = resnet50_to_flax(sd, in_channels=50)
    variables = merge_pretrained(variables, params, stats)

    @jax.jit
    def taps_of(v, x):
        _, inter = enc.apply(v, x, capture_intermediates=True)
        return inter["intermediates"]

    inter = taps_of(variables, x50)
    ends = {"layer1_2": 0, "layer2_3": 1, "layer3_5": 2, "layer4_2": 3}
    for name, ti in ends.items():
        got = np.asarray(inter[name]["__call__"][0])       # NHWC
        want = t_taps[ti].transpose(0, 2, 3, 1)
        _close(got, want, name)

    # first-conv surgery: channel-3..49 kernels are channel-0 copies, so
    # moving the input's channel 0 to channel 7 must not change anything
    x_moved = np.zeros_like(x50)
    x_moved[..., 7] = x50[..., 0]
    x_moved[..., 1:3] = x50[..., 1:3]
    inter2 = taps_of(variables, x_moved)
    _close(np.asarray(inter2["layer4_2"]["__call__"][0]),
           t_taps[3].transpose(0, 2, 3, 1), "surgery-tile")


# --------------------------------------------------------------------------
# InceptionV3 oracle (torchvision inception.py layout, pytorch-fid variant)
# --------------------------------------------------------------------------
class _TBasicConv(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    # pytorch-fid: count_include_pad=False (fid_folder/inception.py)
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class _TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = _TBasicConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = _TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TBasicConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)),
            bd, self.branch_pool(_avg3(x))], 1)


class _TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _TBasicConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([
            self.branch3x3(x), bd, F.max_pool2d(x, 3, 2)], 1)


class _TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = _TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = _TBasicConv(
            c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _TBasicConv(
            c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TBasicConv(
            c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv(
            c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv(
            c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv(
            c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for i in (2, 3, 4, 5):
            bd = getattr(self, f"branch7x7dbl_{i}")(bd)
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avg3(x))], 1)


class _TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _TBasicConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = _TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _TBasicConv(
            192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _TBasicConv(
            192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for i in (2, 3, 4):
            b7 = getattr(self, f"branch7x7x3_{i}")(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class _TInceptionE(tnn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = _TBasicConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = _TBasicConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = _TBasicConv(
            384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _TBasicConv(
            384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _TBasicConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _TBasicConv(
            384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _TBasicConv(
            384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = _avg3(x)
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class _TInceptionV3(tnn.Module):
    """pytorch-fid InceptionV3 trunk to pool3 (fid_folder/inception.py)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)
        self.Mixed_7a = _TInceptionD(768)
        self.Mixed_7b = _TInceptionE(1280, "avg")
        self.Mixed_7c = _TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))   # pool3, 2048-d


@pytest.mark.slow  # full inception forward + compile on the 1-core CPU
def test_inception_import_numeric_parity():
    from affganwriting_tpu.eval.inception_v3 import InceptionV3Pool3

    rng = np.random.default_rng(1)
    tmodel = _TInceptionV3().eval()
    with torch.no_grad():
        _randomize_bn(tmodel, rng)
        # default kaiming conv init can explode through 16 concat blocks;
        # shrink to keep activations in a comparable range
        for m in tmodel.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.data.mul_(0.3)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    x = rng.uniform(0, 1, (2, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x) * 2.0 - 1.0).numpy()

    model = InceptionV3Pool3(resize_input=False, dtype=jnp.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.key(0), x_nhwc)
    params, stats = inception_v3_to_flax(sd)
    variables = merge_pretrained(variables, params, stats)
    got = np.asarray(jax.jit(model.apply)(variables, x_nhwc))
    _close(got, want, "pool3")
