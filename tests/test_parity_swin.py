"""Swin-T backbone checkpoint parity (VERDICT r3 missing-3; reference
``mmdet/models/backbones/swin.py``, Mask R-CNN Swin-T is a named BASELINE
config — ``configs/swin/metafile.yml:63,67``).

Builds a mini Swin in plain torch replicating the reference ops EXACTLY —
double_step_seq+flip relative-position index, per-block zero pad + cyclic
shift + region mask (ShiftWindowMSA, swin.py:178-247), nn.Unfold patch
merging (channel-slowest 4C order), FFN ``layers.0.0``/``layers.1`` naming,
erf GELU, eps-1e-5 LayerNorms — with mmdet state_dict naming, converts via
``convert_swin_backbone``, and asserts forward parity on a size that is
divisible by neither the patch nor the window (the pad-path bug nest).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from boosting_rcnn_tpu.models.backbones.swin import (  # noqa: E402
    SwinTransformer,
    relative_position_index,
)
from tools.convert_torch_weights import convert_swin_backbone  # noqa: E402

E = 8        # embed dims
HEADS = 2
WS = 3       # window size
PS = 4       # patch size
DEPTHS = (2, 2)


def double_step_seq(step1, len1, step2, len2):
    seq1 = torch.arange(0, step1 * len1, step1)
    seq2 = torch.arange(0, step2 * len2, step2)
    return (seq1[:, None] + seq2[None, :]).reshape(1, -1)


class TWindowMSA(torch.nn.Module):
    """reference WindowMSA (swin.py:23-124)."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.2)
        rel_index_coords = double_step_seq(2 * ws - 1, ws, 1, ws)
        rpi = (rel_index_coords + rel_index_coords.T).flip(1).contiguous()
        self.register_buffer("relative_position_index", rpi)
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(
            b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (c // self.heads) ** -0.5
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
            self.ws * self.ws, self.ws * self.ws, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class TShiftMSA(torch.nn.Module):
    """reference ShiftWindowMSA (swin.py:126-283)."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = TWindowMSA(dim, heads, ws)

    def _partition(self, x):
        b, h, w, c = x.shape
        ws = self.ws
        x = x.view(b, h // ws, ws, w // ws, ws, c)
        return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c)

    def _reverse(self, win, h, w):
        ws = self.ws
        b = win.shape[0] // ((h // ws) * (w // ws))
        x = win.view(b, h // ws, w // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)

    def forward(self, query, hw):
        b, l, c = query.shape
        h, w = hw
        query = query.view(b, h, w, c)
        pad_r = (self.ws - w % self.ws) % self.ws
        pad_b = (self.ws - h % self.ws) % self.ws
        query = F.pad(query, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = query.shape[1], query.shape[2]
        if self.shift > 0:
            sq = torch.roll(query, (-self.shift, -self.shift), dims=(1, 2))
            img_mask = torch.zeros((1, hp, wp, 1))
            cnt = 0
            for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = self._partition(img_mask).view(-1, self.ws * self.ws)
            attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
        else:
            sq, attn_mask = query, None
        win = self._partition(sq).view(-1, self.ws ** 2, c)
        win = self.w_msa(win, mask=attn_mask)
        win = win.view(-1, self.ws, self.ws, c)
        sx = self._reverse(win, hp, wp)
        if self.shift > 0:
            sx = torch.roll(sx, (self.shift, self.shift), dims=(1, 2))
        if pad_r or pad_b:
            sx = sx[:, :h, :w, :].contiguous()
        return sx.view(b, h * w, c)


class TFFN(torch.nn.Module):
    """mmcv FFN naming: layers.0.0 (fc1) / layers.1 (fc2)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Sequential(torch.nn.Linear(dim, hidden),
                                torch.nn.GELU()),
            torch.nn.Linear(hidden, dim),
        )

    def forward(self, x):
        return self.layers(x)


class TBlock(torch.nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = TShiftMSA(dim, heads, ws, shift)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.ffn = TFFN(dim, dim * 4)

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.ffn(self.norm2(x))


class TPatchMerging(torch.nn.Module):
    """reference PatchMerging (mmdet/models/utils/transformer.py): corner
    pad to even + nn.Unfold(2, stride=2) -> channel-slowest 4C order."""

    def __init__(self, dim):
        super().__init__()
        self.norm = torch.nn.LayerNorm(4 * dim)
        self.reduction = torch.nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw):
        b, l, c = x.shape
        h, w = hw
        x = x.view(b, h, w, c).permute(0, 3, 1, 2)  # B C H W
        x = F.pad(x, (0, w % 2, 0, h % 2))
        x = F.unfold(x, kernel_size=2, stride=2)  # (B, 4C, L')
        x = x.transpose(1, 2)  # (B, L', 4C)
        return self.reduction(self.norm(x)), ((h + 1) // 2, (w + 1) // 2)


class TPatchEmbed(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.projection = torch.nn.Conv2d(3, dim, PS, PS)
        self.norm = torch.nn.LayerNorm(dim)

    def forward(self, x):
        h, w = x.shape[2:]
        x = F.pad(x, (0, (-w) % PS, 0, (-h) % PS))  # corner pad
        x = self.projection(x)
        hw = (x.shape[2], x.shape[3])
        return self.norm(x.flatten(2).transpose(1, 2)), hw


class TStage(torch.nn.Module):
    def __init__(self, dim, heads, depth, downsample):
        super().__init__()
        self.blocks = torch.nn.ModuleList(
            [TBlock(dim, heads, WS, 0 if i % 2 == 0 else WS // 2)
             for i in range(depth)])
        self.downsample = TPatchMerging(dim) if downsample else None


class TSwin(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = TPatchEmbed(E)
        dims = [E * 2 ** i for i in range(len(DEPTHS))]
        self.stages = torch.nn.ModuleList([
            TStage(dims[s], HEADS, DEPTHS[s], s < len(DEPTHS) - 1)
            for s in range(len(DEPTHS))
        ])
        for i, d in enumerate(dims):
            setattr(self, f"norm{i}", torch.nn.LayerNorm(d))

    def forward(self, x):
        x, hw = self.patch_embed(x)
        outs = []
        for i, st in enumerate(self.stages):
            for blk in st.blocks:
                x = blk(x, hw)
            norm = getattr(self, f"norm{i}")
            out = norm(x).view(-1, *hw, x.shape[-1])
            outs.append(out)
            if st.downsample is not None:
                x, hw = st.downsample(x, hw)
        return outs


def test_rpi_formula_matches_mmdet():
    """Our standard-formula rpi == mmdet's double_step_seq+flip table."""
    for ws in (3, 7):
        coords = double_step_seq(2 * ws - 1, ws, 1, ws)
        mm = (coords + coords.T).flip(1).numpy()
        np.testing.assert_array_equal(mm, relative_position_index(ws))


@pytest.mark.slow
def test_swin_checkpoint_parity():
    torch.manual_seed(0)
    tm = TSwin().eval()
    # non-default values everywhere (catch silent non-loads)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    sd = tm.state_dict()
    conv, _ = convert_swin_backbone(sd)

    fm = SwinTransformer(
        embed_dims=E, depths=DEPTHS, num_heads=(HEADS,) * len(DEPTHS),
        window_size=WS, patch_size=PS, out_indices=tuple(range(len(DEPTHS))),
    )
    x = np.random.RandomState(0).rand(1, 19, 26, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # converted tree covers the init tree exactly (no missing/extra leaves)
    def flat(t, pre=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(flat(v, pre + k + "/"))
            else:
                out[pre + k] = np.asarray(v)
        return out

    want = flat(dict(variables["params"]))
    got = flat(conv)
    assert set(want) == set(got), (
        set(want) ^ set(got))
    for k in want:
        assert want[k].shape == got[k].shape, (
            k, want[k].shape, got[k].shape)

    outs_j = fm.apply({"params": conv}, jnp.asarray(x))
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs_j) == len(outs_t)
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj), ot.numpy(), rtol=1e-4, atol=1e-4)
