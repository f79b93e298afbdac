"""M5 and RCNN-KWS checkpoint conversion parity vs torch twins built with
the reference's parameter naming."""

import numpy as np
import torch
import torch.nn as thnn
import torch.nn.functional as thF

import jax
import jax.numpy as jnp

from audiopure_tpu.models.m5 import M5
from audiopure_tpu.models.rcnn_kws import KWSModel
from audiopure_tpu.utils.torch_convert import convert_kws, convert_m5


def test_m5_conversion_matches_torch():
    class TM5(thnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = thnn.Conv1d(1, 32, 80, 16)
            self.bn1 = thnn.BatchNorm1d(32)
            self.conv2 = thnn.Conv1d(32, 32, 3)
            self.bn2 = thnn.BatchNorm1d(32)
            self.conv3 = thnn.Conv1d(32, 64, 3)
            self.bn3 = thnn.BatchNorm1d(64)
            self.conv4 = thnn.Conv1d(64, 64, 3)
            self.bn4 = thnn.BatchNorm1d(64)
            self.fc1 = thnn.Linear(64, 10)

        def forward(self, x):
            for c, b in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                         (self.conv3, self.bn3), (self.conv4, self.bn4)):
                x = thF.max_pool1d(thF.relu(b(c(x))), 4)
            x = thF.avg_pool1d(x, x.shape[-1]).squeeze(-1)
            return thF.log_softmax(self.fc1(x), dim=1)

    torch.manual_seed(3)
    tnet = TM5().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, thnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_m5(tnet.state_dict())
    net = M5(n_output=10)
    x = np.random.RandomState(0).randn(2, 1, 16000).astype(np.float32) * 0.2
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_kws_conversion_matches_torch():
    IN, H, C = 40, 64, 4

    class TKWS(thnn.Module):
        def __init__(self):
            super().__init__()
            self.CRNN_model = thnn.Module()
            self.CRNN_model.sepconv = thnn.Sequential(
                thnn.Conv1d(IN, IN, 5, stride=2, groups=IN),
                thnn.Conv1d(IN, H, 1, stride=8, groups=IN // 20))
            self.CRNN_model.gru = thnn.GRU(H, H, num_layers=2,
                                           bidirectional=True)
            self.attn_layer = thnn.Module()
            self.attn_layer.Wx_b = thnn.Linear(2 * H, 2 * H)
            self.attn_layer.Vt = thnn.Linear(2 * H, 1, bias=False)
            self.apply_attn = thnn.Module()
            self.apply_attn.U = thnn.Linear(2 * H, C, bias=False)

        def forward(self, x):
            h = self.CRNN_model.sepconv(x)           # (B, H, T')
            h = h.transpose(0, 1).transpose(0, 2)    # (T', B, H)
            out, _ = self.CRNN_model.gru(h)          # (T', B, 2H)
            e = torch.cat([self.attn_layer.Vt(torch.tanh(
                self.attn_layer.Wx_b(o))) for o in out], dim=1)  # (B, T')
            a = thF.softmax(e, dim=-1).unsqueeze(1)
            data = out.transpose(0, 1)               # (B, T', 2H)
            c = torch.bmm(a, data).squeeze(1)
            return thF.log_softmax(self.apply_attn.U(c), dim=-1)

    torch.manual_seed(5)
    tnet = TKWS().eval()
    variables = convert_kws(tnet.state_dict())
    net = KWSModel(num_classes=C)
    x = np.random.RandomState(1).randn(3, IN, 101).astype(np.float32) * 0.3
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
