"""FID pipeline tests: activation shapes, Fréchet math, metric sanity."""

import numpy as np
import pytest

from affganwriting_tpu.eval.fid import (
    FIDScorer,
    crop64_preprocess,
    frechet_distance,
    gaussian_stats,
)


def test_crop64_preprocess():
    imgs = (np.random.default_rng(0).random((3, 64, 216)) * 255).astype(
        np.uint8)
    out = crop64_preprocess(imgs)
    assert out.shape == (3, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(0)
    act = rng.normal(size=(256, 16))
    mu, sig = gaussian_stats(act)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4096, 8))
    b = a + 2.0  # shift every dim by 2 -> FID ~= 8 * 4 = 32
    fa, fb = gaussian_stats(a), gaussian_stats(b)
    assert frechet_distance(*fa, *fb) == pytest.approx(8 * 4.0, rel=0.05)


def _torch_inception_pool3():
    """A torch reference InceptionV3-pool3 with torchvision's state_dict
    naming and pytorch-fid's pooling semantics (fid_folder/inception.py:
    InceptionA/C avg-pool with count_include_pad=False, second InceptionE
    max-pools).  torchvision itself is not in this image; torch's own
    conv/bn/pool kernels are the authoritative numerical reference."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    class Basic(nn.Module):
        def __init__(self, cin, cout, k, s=1, p=0):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class BlockA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = Basic(cin, 64, 1)
            self.branch5x5_1 = Basic(cin, 48, 1)
            self.branch5x5_2 = Basic(48, 64, 5, p=2)
            self.branch3x3dbl_1 = Basic(cin, 64, 1)
            self.branch3x3dbl_2 = Basic(64, 96, 3, p=1)
            self.branch3x3dbl_3 = Basic(96, 96, 3, p=1)
            self.branch_pool = Basic(cin, pool_features, 1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                self.branch_pool(avgp(x))], 1)

    class BlockB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = Basic(cin, 384, 3, s=2)
            self.branch3x3dbl_1 = Basic(cin, 64, 1)
            self.branch3x3dbl_2 = Basic(64, 96, 3, p=1)
            self.branch3x3dbl_3 = Basic(96, 96, 3, s=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class BlockC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = Basic(cin, 192, 1)
            self.branch7x7_1 = Basic(cin, c7, 1)
            self.branch7x7_2 = Basic(c7, c7, (1, 7), p=(0, 3))
            self.branch7x7_3 = Basic(c7, 192, (7, 1), p=(3, 0))
            self.branch7x7dbl_1 = Basic(cin, c7, 1)
            self.branch7x7dbl_2 = Basic(c7, c7, (7, 1), p=(3, 0))
            self.branch7x7dbl_3 = Basic(c7, c7, (1, 7), p=(0, 3))
            self.branch7x7dbl_4 = Basic(c7, c7, (7, 1), p=(3, 0))
            self.branch7x7dbl_5 = Basic(c7, 192, (1, 7), p=(0, 3))
            self.branch_pool = Basic(cin, 192, 1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
                self.branch7x7dbl_5(self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(
                        self.branch7x7dbl_1(x))))),
                self.branch_pool(avgp(x))], 1)

    class BlockD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = Basic(cin, 192, 1)
            self.branch3x3_2 = Basic(192, 320, 3, s=2)
            self.branch7x7x3_1 = Basic(cin, 192, 1)
            self.branch7x7x3_2 = Basic(192, 192, (1, 7), p=(0, 3))
            self.branch7x7x3_3 = Basic(192, 192, (7, 1), p=(3, 0))
            self.branch7x7x3_4 = Basic(192, 192, 3, s=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class BlockE(nn.Module):
        def __init__(self, cin, pool):
            super().__init__()
            self.pool = pool
            self.branch1x1 = Basic(cin, 320, 1)
            self.branch3x3_1 = Basic(cin, 384, 1)
            self.branch3x3_2a = Basic(384, 384, (1, 3), p=(0, 1))
            self.branch3x3_2b = Basic(384, 384, (3, 1), p=(1, 0))
            self.branch3x3dbl_1 = Basic(cin, 448, 1)
            self.branch3x3dbl_2 = Basic(448, 384, 3, p=1)
            self.branch3x3dbl_3a = Basic(384, 384, (1, 3), p=(0, 1))
            self.branch3x3dbl_3b = Basic(384, 384, (3, 1), p=(1, 0))
            self.branch_pool = Basic(cin, 192, 1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bp = (F.max_pool2d(x, 3, stride=1, padding=1)
                  if self.pool == "max" else avgp(x))
            return torch.cat([
                self.branch1x1(x),
                torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1),
                torch.cat([self.branch3x3dbl_3a(bd),
                           self.branch3x3dbl_3b(bd)], 1),
                self.branch_pool(bp)], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = Basic(3, 32, 3, s=2)
            self.Conv2d_2a_3x3 = Basic(32, 32, 3)
            self.Conv2d_2b_3x3 = Basic(32, 64, 3, p=1)
            self.Conv2d_3b_1x1 = Basic(64, 80, 1)
            self.Conv2d_4a_3x3 = Basic(80, 192, 3)
            self.Mixed_5b = BlockA(192, 32)
            self.Mixed_5c = BlockA(256, 64)
            self.Mixed_5d = BlockA(288, 64)
            self.Mixed_6a = BlockB(288)
            self.Mixed_6b = BlockC(768, 128)
            self.Mixed_6c = BlockC(768, 160)
            self.Mixed_6d = BlockC(768, 160)
            self.Mixed_6e = BlockC(768, 192)
            self.Mixed_7a = BlockD(768)
            self.Mixed_7b = BlockE(1280, "avg")
            self.Mixed_7c = BlockE(2048, "max")

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                x = getattr(self, name)(x)
            return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)

    return Net()


@pytest.mark.slow
def test_inception_import_parity_vs_pytorch_fid():
    """FID is falsifiable: a random state_dict in torchvision's
    inception_v3 layout, imported via
    utils.torch_import.inception_v3_to_flax, must reproduce the pool3
    activations of a torch network with pytorch-fid's semantics (the
    wrapper the reference uses, GAN_word/fid_folder/inception.py;
    fid_score_crop64x64.py:67-131 consumes its pool3).  Passing on random
    weights proves the import is layout-correct, so dropping real
    ImageNet weights in yields real FID."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from affganwriting_tpu.eval.inception_v3 import InceptionV3Pool3
    from affganwriting_tpu.utils.torch_import import (
        inception_v3_to_flax,
        merge_pretrained,
    )

    torch.manual_seed(0)
    net = _torch_inception_pool3().eval()
    # randomize BN running stats too — default mean=0/var=1 would hide
    # swapped mean/var wiring in the converter
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)

    rng = np.random.default_rng(0)
    img = rng.uniform(-1.0, 1.0, size=(1, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats = inception_v3_to_flax(sd)
    # pre-sized/pre-normalized input isolates the network from the
    # wrapper's resize/normalize
    model = InceptionV3Pool3(resize_input=False, normalize_input=False)
    init = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    variables = merge_pretrained(init, params, stats)
    got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(img)))

    assert got.shape == want.shape == (1, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_scorer_orders_distributions():
    """Same distribution -> small FID; disjoint -> larger (random-weight
    Inception still separates distributions)."""
    rng = np.random.default_rng(0)
    base = rng.random((48, 64, 216)).astype(np.float32)
    same_a, same_b = base[:24], base[24:]
    different = np.clip(base[:24] * 0.2 + 0.8, 0, 1)  # brightness shift
    scorer = FIDScorer(batch_size=24)
    d_same = scorer.fid(same_a, same_b)
    d_diff = scorer.fid(same_a, different)
    assert d_diff > d_same


def test_scorer_provenance_labels_feature_space(monkeypatch, tmp_path):
    """Without local InceptionV3 weights the scorer must declare itself a
    fixed-seed random-feature metric (VERDICT r4 weak #4: 4.6e-06 was
    recorded unflagged); with a weights path present it must declare the
    pretrained space instead."""
    import affganwriting_tpu.eval.fid as fid_mod

    monkeypatch.delenv("AFFGAN_INCEPTION_PTH", raising=False)
    monkeypatch.setattr(fid_mod, "find_inception_weights", lambda: None)
    s1 = fid_mod.FIDScorer(batch_size=4)
    assert s1.provenance == "random_features:seed=0"
    # pinned seed => identical feature space across constructions
    s2 = fid_mod.FIDScorer(batch_size=4)
    a = fid_mod.crop64_preprocess(
        np.random.default_rng(0).random((4, 64, 216)).astype(np.float32))
    np.testing.assert_array_equal(s1.activations(a), s2.activations(a))

    # env-var path that doesn't exist is ignored, not trusted
    monkeypatch.setattr(fid_mod, "find_inception_weights",
                        fid_mod.find_inception_weights.__wrapped__
                        if hasattr(fid_mod.find_inception_weights,
                                   "__wrapped__")
                        else fid_mod.find_inception_weights)
    monkeypatch.setenv("AFFGAN_INCEPTION_PTH", str(tmp_path / "missing.pth"))
    assert fid_mod.find_inception_weights() is None

    # caller-supplied weights are labeled as such
    s3 = fid_mod.FIDScorer(weights=s1.variables, batch_size=4)
    assert s3.provenance == "caller_weights"
