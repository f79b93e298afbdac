"""UNet checkpoint conversion parity: a spec-faithful torch UNet (built
in-test from ``improved_diffusion/unet.py`` semantics, reference parameter
naming) vs our flax UNetModel with converted weights."""

import math

import numpy as np
import torch
import torch.nn as thnn

import jax.numpy as jnp

from audiopure_tpu.models.unet import UNetModel
from audiopure_tpu.utils.torch_convert import convert_improved_diffusion_unet

CH, NRB, MULT, HEADS = 16, 1, (1, 2), 2
ATT_DS = (2,)
EMB = CH * 4


def _gn(c):
    # same group-count fallback rule as our flax _group_norm
    g = 32 if c % 32 == 0 else max(
        i for i in range(1, min(32, c) + 1) if c % i == 0)
    return thnn.GroupNorm(g, c)


class TResBlock(thnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.in_layers = thnn.Sequential(
            _gn(cin), thnn.SiLU(), thnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = thnn.Sequential(
            thnn.SiLU(), thnn.Linear(EMB, 2 * cout))
        self.out_layers = thnn.Sequential(
            _gn(cout), thnn.SiLU(), thnn.Dropout(0.0),
            thnn.Conv2d(cout, cout, 3, padding=1))
        self.skip_connection = (thnn.Identity() if cin == cout
                                else thnn.Conv2d(cin, cout, 1))

    def forward(self, x, emb):
        h = self.in_layers(x)
        eo = self.emb_layers(emb)[..., None, None]
        scale, shift = torch.chunk(eo, 2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[3](self.out_layers[2](self.out_layers[1](h)))
        return self.skip_connection(x) + h


class TAttention(thnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _gn(c)
        self.qkv = thnn.Conv1d(c, 3 * c, 1)
        self.proj_out = thnn.Conv1d(c, c, 1)

    def forward(self, x):
        b, c, *spatial = x.shape
        xf = x.reshape(b, c, -1)
        qkv = self.qkv(self.norm(xf))
        qkv = qkv.reshape(b * HEADS, -1, qkv.shape[2])
        ch = qkv.shape[1] // 3
        q, k, v = torch.split(qkv, ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        h = torch.einsum("bts,bcs->bct", w, v)
        h = h.reshape(b, -1, h.shape[-1])
        h = self.proj_out(h)
        return (xf + h).reshape(b, c, *spatial)


class TUNet(thnn.Module):
    """Reference UNet wiring with the reference's parameter names."""

    def __init__(self):
        super().__init__()
        self.time_embed = thnn.Sequential(
            thnn.Linear(CH, EMB), thnn.SiLU(), thnn.Linear(EMB, EMB))

        self.input_blocks = thnn.ModuleList()
        self.input_blocks.append(
            thnn.Sequential(thnn.Conv2d(1, CH, 3, padding=1)))
        chans = [CH]
        ch = CH
        ds = 1
        self._down_meta = []
        for level, mult in enumerate(MULT):
            for i in range(NRB):
                mods = [TResBlock(ch, mult * CH)]
                ch = mult * CH
                if ds in ATT_DS:
                    mods.append(TAttention(ch))
                self.input_blocks.append(thnn.Sequential(*mods))
                chans.append(ch)
            if level != len(MULT) - 1:
                down = thnn.Sequential()
                down.add_module("0", thnn.Module())
                op = thnn.Conv2d(ch, ch, 3, stride=2, padding=1)
                down[0].op = op
                self.input_blocks.append(down)
                chans.append(ch)
                ds *= 2
        self._chans = chans
        self._ds_mid = ds

        self.middle_block = thnn.ModuleList(
            [TResBlock(ch, ch), TAttention(ch), TResBlock(ch, ch)])

        self.output_blocks = thnn.ModuleList()
        self._up_meta = []
        for level, mult in reversed(list(enumerate(MULT))):
            for i in range(NRB + 1):
                cin = ch + chans.pop()
                mods = [TResBlock(cin, mult * CH)]
                ch = mult * CH
                if ds in ATT_DS:
                    mods.append(TAttention(ch))
                if level and i == NRB:
                    up = thnn.Module()
                    up.conv = thnn.Conv2d(ch, ch, 3, padding=1)
                    mods.append(up)
                    ds //= 2
                self.output_blocks.append(thnn.ModuleList(mods))
                self._up_meta.append((level, i))

        self.out = thnn.Sequential(_gn(ch), thnn.SiLU(),
                                   thnn.Conv2d(CH, 1, 3, padding=1))

    @staticmethod
    def t_embed(t):
        half = CH // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float()
                          / half)
        args = t.float()[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t):
        emb = self.time_embed(self.t_embed(t))
        hs = []
        h = x
        for blk in self.input_blocks:
            if hasattr(blk[0], "op"):
                h = blk[0].op(h)
            else:
                for m in blk:
                    h = m(h, emb) if isinstance(m, TResBlock) else m(h)
            hs.append(h)
        for m in self.middle_block:
            h = m(h, emb) if isinstance(m, TResBlock) else m(h)
        for mods in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for m in mods:
                if isinstance(m, TResBlock):
                    h = m(h, emb)
                elif isinstance(m, TAttention):
                    h = m(h)
                else:  # upsample
                    h = torch.nn.functional.interpolate(
                        h, scale_factor=2, mode="nearest")
                    h = m.conv(h)
        return self.out(h)


def test_unet_conversion_matches_torch():
    torch.manual_seed(0)
    tnet = TUNet().eval()
    # randomize the zero-init-style convs for a nontrivial check
    sd = tnet.state_dict()

    params = convert_improved_diffusion_unet(
        sd, num_res_blocks=NRB, channel_mult=MULT, attention_ds=ATT_DS)

    net = UNetModel(in_channels=1, model_channels=CH, out_channels=1,
                    num_res_blocks=NRB, attention_resolutions=ATT_DS,
                    dropout=0.0, channel_mult=MULT, num_heads=HEADS)

    x = np.random.RandomState(0).randn(2, 1, 16, 16).astype(np.float32)
    t = np.asarray([3.0, 150.0], dtype=np.float32)
    got = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        want = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)
