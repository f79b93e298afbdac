"""WideResNet checkpoint conversion parity vs a spec-faithful torch WRN
(reference naming, ``wideresnet.py:16-95``)."""

import pytest
import numpy as np
import torch
import torch.nn as thnn
import torch.nn.functional as thF

import jax
import jax.numpy as jnp

from audiopure_tpu.models.convnets import WideResNet
from audiopure_tpu.utils.torch_convert import convert_wideresnet

DEPTH, K = 10, 2  # tiny: n = 1 block per stage


class TBasicBlock(thnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = thnn.BatchNorm2d(cin)
        self.conv1 = thnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn2 = thnn.BatchNorm2d(cout)
        self.conv2 = thnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.equal = cin == cout and stride == 1
        if not self.equal:
            self.convShortcut = thnn.Conv2d(cin, cout, 1, stride, 0,
                                            bias=False)

    def forward(self, x):
        if not self.equal:
            x = thF.relu(self.bn1(x))
            out = x
        else:
            out = thF.relu(self.bn1(x))
        out = thF.relu(self.bn2(self.conv1(out)))
        out = self.conv2(out)
        sc = x if self.equal else self.convShortcut(x)
        return sc + out


class TWRN(thnn.Module):
    def __init__(self):
        super().__init__()
        n = (DEPTH - 4) // 6
        w = [16, 16 * K, 32 * K, 64 * K]
        self.conv1 = thnn.Conv2d(1, w[0], 3, 1, 1, bias=False)

        def stage(cin, cout, stride):
            layers = [TBasicBlock(cin if i == 0 else cout, cout,
                                  stride if i == 0 else 1)
                      for i in range(n)]
            return thnn.ModuleDict(
                {"layer": thnn.ModuleList(layers)})

        self.block1 = stage(w[0], w[1], 1)
        self.block2 = stage(w[1], w[2], 2)
        self.block3 = stage(w[2], w[3], 2)
        self.bn1 = thnn.BatchNorm2d(w[3])
        self.fc = thnn.Linear(w[3], 10)

    def forward(self, x):
        h = self.conv1(x)
        for blk in (self.block1, self.block2, self.block3):
            for layer in blk["layer"]:
                h = layer(h)
        h = thF.relu(self.bn1(h))
        h = thF.avg_pool2d(h, h.shape[-1]).flatten(1)
        return self.fc(h)


def test_wrn_conversion_matches_torch():
    torch.manual_seed(0)
    tnet = TWRN().eval()
    with torch.no_grad():  # nontrivial BN stats
        for m in tnet.modules():
            if isinstance(m, thnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_wideresnet(tnet.state_dict(), depth=DEPTH,
                                   widen_factor=K)
    net = WideResNet(depth=DEPTH, widen_factor=K, drop_rate=0.0,
                     num_classes=10)
    x = np.random.RandomState(0).randn(2, 1, 32, 32).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_vgg19bn_conversion_matches_torch():
    """VGG19-BN conversion vs a torchvision-style torch twin (the
    reference's ``make_layers(cfg['E'], batch_norm=True)``)."""
    from audiopure_tpu.models.convnets import VGG
    from audiopure_tpu.utils.torch_convert import convert_vgg19_bn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    cin = 1
    for v in cfg:
        if v == "M":
            layers.append(thnn.MaxPool2d(2, 2))
        else:
            layers += [thnn.Conv2d(cin, v, 3, padding=1),
                       thnn.BatchNorm2d(v), thnn.ReLU(True)]
            cin = v
    tnet = thnn.Sequential()
    tnet.features = thnn.Sequential(*layers)
    tnet.classifier = thnn.Sequential(
        thnn.Linear(512, 4096), thnn.ReLU(True), thnn.Dropout(),
        thnn.Linear(4096, 4096), thnn.ReLU(True), thnn.Dropout(),
        thnn.Linear(4096, 10))
    torch.manual_seed(1)
    for m in tnet.modules():
        if isinstance(m, (thnn.Conv2d, thnn.Linear)):
            thnn.init.normal_(m.weight, 0, 0.05)
            if m.bias is not None:
                thnn.init.normal_(m.bias, 0, 0.05)
        if isinstance(m, thnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tnet.eval()

    variables = convert_vgg19_bn(tnet.state_dict())
    net = VGG(cfg_key="E", batch_norm=True, num_classes=10)
    x = np.random.RandomState(1).randn(2, 1, 32, 32).astype(
        np.float32) * 0.3
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet.classifier(
            tnet.features(torch.from_numpy(x)).flatten(1)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-3)


def test_resnet18_conversion_matches_torch():
    from audiopure_tpu.models.convnets import BasicBlock, ResNet
    from audiopure_tpu.utils.torch_convert import convert_resnet

    class TBlock(thnn.Module):
        def __init__(self, cin, cout, stride, down):
            super().__init__()
            self.conv1 = thnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = thnn.BatchNorm2d(cout)
            self.conv2 = thnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = thnn.BatchNorm2d(cout)
            self.downsample = thnn.Sequential(
                thnn.Conv2d(cin, cout, 1, stride, bias=False),
                thnn.BatchNorm2d(cout)) if down else None

        def forward(self, x):
            r = x
            h = thF.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            if self.downsample is not None:
                r = self.downsample(x)
            return thF.relu(h + r)

    class TResNet18(thnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = thnn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = thnn.BatchNorm2d(64)
            cins, couts = [64, 64, 128, 256], [64, 128, 256, 512]
            for s in range(4):
                stride = 1 if s == 0 else 2
                setattr(self, f"layer{s + 1}", thnn.ModuleList([
                    TBlock(cins[s], couts[s], stride,
                           stride != 1 or cins[s] != couts[s]),
                    TBlock(couts[s], couts[s], 1, False)]))
            self.fc = thnn.Linear(512, 10)

        def forward(self, x):
            h = thF.max_pool2d(thF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            for s in range(4):
                for b in getattr(self, f"layer{s + 1}"):
                    h = b(h)
            return self.fc(thF.adaptive_avg_pool2d(h, 1).flatten(1))

    torch.manual_seed(0)
    tnet = TResNet18().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, thnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    variables = convert_resnet(tnet.state_dict(), layers=(2, 2, 2, 2))
    net = ResNet(BasicBlock, (2, 2, 2, 2), 10)
    x = np.random.RandomState(0).randn(2, 1, 32, 32).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.heavy
def test_densenet_conversion_matches_torch():
    """DenseNet-BC conversion vs a bearpaw-style torch twin (depth 10 ->
    n=1 layer per block)."""
    from audiopure_tpu.models.convnets import DenseNet
    from audiopure_tpu.utils.torch_convert import convert_densenet

    GROWTH, DEPTH = 12, 10  # n = (10-4)/3/2 = 1

    class TDense(thnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.bn1 = thnn.BatchNorm2d(cin)
            self.conv1 = thnn.Conv2d(cin, 4 * GROWTH, 1, bias=False)
            self.bn2 = thnn.BatchNorm2d(4 * GROWTH)
            self.conv2 = thnn.Conv2d(4 * GROWTH, GROWTH, 3, padding=1,
                                     bias=False)

        def forward(self, x):
            g = self.conv1(thF.relu(self.bn1(x)))
            g = self.conv2(thF.relu(self.bn2(g)))
            return torch.cat([x, g], 1)

    class TTrans(thnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.bn1 = thnn.BatchNorm2d(cin)
            self.conv1 = thnn.Conv2d(cin, cin // 2, 1, bias=False)

        def forward(self, x):
            return thF.avg_pool2d(self.conv1(thF.relu(self.bn1(x))), 2)

    class TNet(thnn.Module):
        def __init__(self):
            super().__init__()
            c = 2 * GROWTH
            self.conv1 = thnn.Conv2d(1, c, 3, padding=1, bias=False)
            self.dense1 = thnn.ModuleList([TDense(c)]); c += GROWTH
            self.trans1 = TTrans(c); c //= 2
            self.dense2 = thnn.ModuleList([TDense(c)]); c += GROWTH
            self.trans2 = TTrans(c); c //= 2
            self.dense3 = thnn.ModuleList([TDense(c)]); c += GROWTH
            self.bn = thnn.BatchNorm2d(c)
            self.fc = thnn.Linear(c, 10)

        def forward(self, x):
            h = self.conv1(x)
            for m in self.dense1:
                h = m(h)
            h = self.trans1(h)
            for m in self.dense2:
                h = m(h)
            h = self.trans2(h)
            for m in self.dense3:
                h = m(h)
            h = thF.relu(self.bn(h))
            h = thF.adaptive_avg_pool2d(h, 1).flatten(1)
            return self.fc(h)

    torch.manual_seed(0)
    tnet = TNet().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, thnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_densenet(tnet.state_dict(), depth=DEPTH)
    net = DenseNet(depth=DEPTH, growth_rate=GROWTH, compression_rate=2,
                   num_classes=10)
    x = np.random.RandomState(0).randn(2, 1, 32, 32).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
