"""DPN and ResNeXt checkpoint conversion parity vs torch twins built with
the reference repos' parameter naming (kuangliu dpn.py, prlz77 resnext)."""

import pytest
import numpy as np
import torch
import torch.nn as thnn
import torch.nn.functional as thF

import jax.numpy as jnp

from audiopure_tpu.models.convnets import DPN, CifarResNeXt
from audiopure_tpu.utils.torch_convert import convert_dpn, convert_resnext


def _randomize_bn(tnet):
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, thnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)


@pytest.mark.heavy
def test_dpn_conversion_matches_torch():
    INP, OUTP, DD = (96, 192, 384, 768), (256, 512, 1024, 2048), \
        (16, 32, 24, 128)

    class TDPNB(thnn.Module):
        def __init__(self, last, cin, cout, dd, stride, first):
            super().__init__()
            self.conv1 = thnn.Conv2d(last, cin, 1, bias=False)
            self.bn1 = thnn.BatchNorm2d(cin)
            self.conv2 = thnn.Conv2d(cin, cin, 3, stride, 1, groups=32,
                                     bias=False)
            self.bn2 = thnn.BatchNorm2d(cin)
            self.conv3 = thnn.Conv2d(cin, cout + dd, 1, bias=False)
            self.bn3 = thnn.BatchNorm2d(cout + dd)
            self.out_planes = cout
            self.shortcut = thnn.Sequential()
            if first:
                self.shortcut = thnn.Sequential(
                    thnn.Conv2d(last, cout + dd, 1, stride, bias=False),
                    thnn.BatchNorm2d(cout + dd))

        def forward(self, x):
            out = thF.relu(self.bn1(self.conv1(x)))
            out = thF.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            sc = self.shortcut(x) if len(self.shortcut) else x
            d = self.out_planes
            return thF.relu(torch.cat(
                [sc[:, :d] + out[:, :d], sc[:, d:], out[:, d:]], 1))

    class TDPN(thnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = thnn.Conv2d(1, 64, 3, 1, 1, bias=False)
            self.bn1 = thnn.BatchNorm2d(64)
            last = 64
            for s in range(4):
                setattr(self, f"layer{s + 1}", thnn.ModuleList(
                    [TDPNB(last, INP[s], OUTP[s], DD[s],
                           1 if s == 0 else 2, True)]))
                last = OUTP[s] + 2 * DD[s]
            self.linear = thnn.Linear(OUTP[3] + 2 * DD[3], 10)

        def forward(self, x):
            h = thF.relu(self.bn1(self.conv1(x)))
            for s in range(4):
                for b in getattr(self, f"layer{s + 1}"):
                    h = b(h)
            return self.linear(
                thF.avg_pool2d(h, h.shape[-1]).flatten(1))

    torch.manual_seed(0)
    tnet = TDPN().eval()
    _randomize_bn(tnet)
    v = convert_dpn(tnet.state_dict(), num_blocks=(1, 1, 1, 1))
    net = DPN(num_classes=10, num_blocks=(1, 1, 1, 1))
    x = np.random.RandomState(0).randn(2, 1, 32, 32).astype(np.float32)
    got = np.asarray(net.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


@pytest.mark.heavy
def test_resnext_conversion_matches_torch():
    CARD, BW, WF = 8, 64, 4

    class TRB(thnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            D = CARD * int(BW * cout / (WF * 64.0))
            self.conv_reduce = thnn.Conv2d(cin, D, 1, bias=False)
            self.bn_reduce = thnn.BatchNorm2d(D)
            self.conv_conv = thnn.Conv2d(D, D, 3, stride, 1, groups=CARD,
                                         bias=False)
            self.bn = thnn.BatchNorm2d(D)
            self.conv_expand = thnn.Conv2d(D, cout, 1, bias=False)
            self.bn_expand = thnn.BatchNorm2d(cout)
            self.shortcut = thnn.Sequential()
            if cin != cout:
                self.shortcut.add_module(
                    "shortcut_conv",
                    thnn.Conv2d(cin, cout, 1, stride, bias=False))
                self.shortcut.add_module("shortcut_bn",
                                         thnn.BatchNorm2d(cout))

        def forward(self, x):
            b = thF.relu(self.bn_reduce(self.conv_reduce(x)))
            b = thF.relu(self.bn(self.conv_conv(b)))
            b = self.bn_expand(self.conv_expand(b))
            sc = self.shortcut(x) if len(self.shortcut) else x
            return thF.relu(sc + b)

    class TRX(thnn.Module):
        def __init__(self):
            super().__init__()
            st = [64, 64 * WF, 128 * WF, 256 * WF]
            self.conv_1_3x3 = thnn.Conv2d(1, 64, 3, 1, 1, bias=False)
            self.bn_1 = thnn.BatchNorm2d(64)
            for s in range(1, 4):
                mod = thnn.Sequential()
                mod.add_module(f"stage_{s}_bottleneck_0",
                               TRB(st[s - 1], st[s], 1 if s == 1 else 2))
                setattr(self, f"stage_{s}", mod)
            self.classifier = thnn.Linear(st[3], 10)

        def forward(self, x):
            h = thF.relu(self.bn_1(self.conv_1_3x3(x)))
            for s in range(1, 4):
                h = getattr(self, f"stage_{s}")(h)
            return self.classifier(thF.avg_pool2d(h, 8).flatten(1))

    torch.manual_seed(1)
    tnet = TRX().eval()
    _randomize_bn(tnet)
    v = convert_resnext(tnet.state_dict(), depth=11)  # block_depth = 1
    net = CifarResNeXt(num_classes=10, depth=11)
    x = np.random.RandomState(0).randn(2, 1, 32, 32).astype(np.float32)
    got = np.asarray(net.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
