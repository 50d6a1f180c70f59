"""Executable torch reconstruction of the MONAI module schema that the
reference imports (``code/networks/unetr.py``: UnetrBasicBlock /
UnetrPrUpBlock / UnetrUpBlock / UnetOutBlock / ViT; ``net_factory_3d.py:7``:
monai.networks.nets.SwinUNETR).

MONAI is not installable in this environment (zero egress), so this module
reproduces the PUBLISHED key schema and forward semantics from MONAI's
source (v0.7-1.x era the reference pins): state dicts saved from these
modules carry the exact MONAI key names, which is what
cvssl_tpu/models/monai_checkpoint.py converts. Used by
tests/test_monai_parity.py for same-weights cross-framework parity.

Deviation (documented): PatchMerging implements MONAI's fixed V2 semantics
(itertools.product order); their default V1 has a known slice-duplication
bug that V2 replaced.
"""
import itertools

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# shared conv blocks (monai.networks.blocks.dynunet_block)
# ---------------------------------------------------------------------------

class _Conv(nn.Module):
    """monai Convolution(conv_only=True): exposes ``.conv``."""

    def __init__(self, cin, cout, k, stride=1, bias=False,
                 transposed=False):
        super().__init__()
        if transposed:
            self.conv = nn.ConvTranspose3d(cin, cout, k, stride=stride,
                                           bias=bias)
        else:
            self.conv = nn.Conv3d(cin, cout, k, stride=stride,
                                  padding=k // 2, bias=bias)

    def forward(self, x):
        return self.conv(x)


class UnetResBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = _Conv(cin, cout, 3, stride)
        self.conv2 = _Conv(cout, cout, 3)
        self.norm1 = nn.InstanceNorm3d(cout)
        self.norm2 = nn.InstanceNorm3d(cout)
        self.lrelu = nn.LeakyReLU(0.01, inplace=True)
        self.downsample = cin != cout or stride != 1
        if self.downsample:
            self.conv3 = _Conv(cin, cout, 1, stride)
            self.norm3 = nn.InstanceNorm3d(cout)

    def forward(self, x):
        residual = x
        out = self.lrelu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            residual = self.norm3(self.conv3(residual))
        return self.lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.layer = UnetResBlock(cin, cout, stride)

    def forward(self, x):
        return self.layer(x)


class UnetrPrUpBlock(nn.Module):
    """conv_block=True, res_block=True variant."""

    def __init__(self, cin, cout, num_layer):
        super().__init__()
        self.transp_conv_init = _Conv(cin, cout, 2, 2, transposed=True)
        self.blocks = nn.ModuleList([
            nn.Sequential(_Conv(cout, cout, 2, 2, transposed=True),
                          UnetResBlock(cout, cout))
            for _ in range(num_layer)])

    def forward(self, x):
        x = self.transp_conv_init(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class UnetrUpBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.transp_conv = _Conv(cin, cout, 2, 2, transposed=True)
        self.conv_block = UnetResBlock(cout + cout, cout)

    def forward(self, x, skip):
        x = self.transp_conv(x)
        x = torch.cat((x, skip), dim=1)
        return self.conv_block(x)


class UnetOutBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = _Conv(cin, cout, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


# ---------------------------------------------------------------------------
# ViT (monai.networks.nets.vit + blocks.selfattention/mlp/patchembedding)
# ---------------------------------------------------------------------------

class SABlock(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.num_heads = heads
        self.head_dim = hidden // heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(hidden, hidden * 3, bias=False)
        self.out_proj = nn.Linear(hidden, hidden)

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # "b h (qkv l d) -> qkv b l h d"
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) * self.scale, dim=-1)
        x = (att @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.out_proj(x)


class MLPBlock(nn.Module):
    def __init__(self, hidden, mlp_dim):
        super().__init__()
        self.linear1 = nn.Linear(hidden, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden)

    def forward(self, x):
        return self.linear2(F.gelu(self.linear1(x)))


class TransformerBlock(nn.Module):
    def __init__(self, hidden, mlp_dim, heads):
        super().__init__()
        self.mlp = MLPBlock(hidden, mlp_dim)
        self.norm1 = nn.LayerNorm(hidden)
        self.attn = SABlock(hidden, heads)
        self.norm2 = nn.LayerNorm(hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PerceptronRearrange(nn.Module):
    """einops Rearrange('b c (h x) (w y) (d z) -> b (h w d) (x y z c)')."""

    def __init__(self, p):
        super().__init__()
        self.p = p

    def forward(self, x):
        b, c, H, W, D = x.shape
        p = self.p
        x = x.reshape(b, c, H // p, p, W // p, p, D // p, p)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1)  # b h w d x y z c
        return x.reshape(b, (H // p) * (W // p) * (D // p), -1)


class PatchEmbeddingBlock(nn.Module):
    """pos_embed='perceptron', no classification token."""

    def __init__(self, cin, img_size, patch_size, hidden):
        super().__init__()
        n = int(np.prod([s // patch_size for s in img_size]))
        self.patch_embeddings = nn.Sequential(
            _PerceptronRearrange(patch_size),
            nn.Linear(patch_size ** 3 * cin, hidden))
        self.position_embeddings = nn.Parameter(torch.zeros(1, n, hidden))
        nn.init.trunc_normal_(self.position_embeddings, std=0.02)

    def forward(self, x):
        return self.patch_embeddings(x) + self.position_embeddings


class ViT(nn.Module):
    def __init__(self, cin, img_size, patch_size=16, hidden=768,
                 mlp_dim=3072, num_layers=12, heads=12):
        super().__init__()
        self.patch_embedding = PatchEmbeddingBlock(cin, img_size,
                                                   patch_size, hidden)
        self.blocks = nn.ModuleList([
            TransformerBlock(hidden, mlp_dim, heads)
            for _ in range(num_layers)])
        self.norm = nn.LayerNorm(hidden)

    def forward(self, x):
        x = self.patch_embedding(x)
        hidden_states_out = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states_out.append(x)
        return self.norm(x), hidden_states_out


class UNETR(nn.Module):
    """reference code/networks/unetr.py with conv_block=res_block=True."""

    def __init__(self, in_channels, out_channels, img_size,
                 feature_size=16, hidden_size=768, mlp_dim=3072,
                 num_heads=12, num_layers=12):
        super().__init__()
        self.hidden_size = hidden_size
        self.feat_size = tuple(s // 16 for s in img_size)
        self.vit = ViT(in_channels, img_size, 16, hidden_size, mlp_dim,
                       num_layers, num_heads)
        fs = feature_size
        self.encoder1 = UnetrBasicBlock(in_channels, fs)
        self.encoder2 = UnetrPrUpBlock(hidden_size, fs * 2, 2)
        self.encoder3 = UnetrPrUpBlock(hidden_size, fs * 4, 1)
        self.encoder4 = UnetrPrUpBlock(hidden_size, fs * 8, 0)
        self.decoder5 = UnetrUpBlock(hidden_size, fs * 8)
        self.decoder4 = UnetrUpBlock(fs * 8, fs * 4)
        self.decoder3 = UnetrUpBlock(fs * 4, fs * 2)
        self.decoder2 = UnetrUpBlock(fs * 2, fs)
        self.out = UnetOutBlock(fs, out_channels)

    def proj_feat(self, x):
        f = self.feat_size
        x = x.view(x.size(0), f[0], f[1], f[2], self.hidden_size)
        return x.permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x_in):
        x, hs = self.vit(x_in)
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self.proj_feat(hs[3]))
        enc3 = self.encoder3(self.proj_feat(hs[6]))
        enc4 = self.encoder4(self.proj_feat(hs[9]))
        dec4 = self.proj_feat(x)
        dec3 = self.decoder5(dec4, enc4)
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        out = self.decoder2(dec1, enc1)
        return self.out(out)


# ---------------------------------------------------------------------------
# SwinUNETR (monai.networks.nets.swin_unetr)
# ---------------------------------------------------------------------------

def window_partition(x, ws):
    b, d, h, w, c = x.shape
    x = x.view(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    return x.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, ws[0] * ws[1] * ws[2], c)


def window_reverse(windows, ws, dims):
    b, d, h, w = dims
    x = windows.view(b, d // ws[0], h // ws[1], w // ws[2],
                     ws[0], ws[1], ws[2], -1)
    return x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, -1)


def get_window_size(x_size, window_size, shift_size):
    use_ws = list(window_size)
    use_ss = list(shift_size)
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            use_ss[i] = 0
    return tuple(use_ws), tuple(use_ss)


def compute_mask(dims, ws, shift):
    d, h, w = dims
    img_mask = torch.zeros((1, d, h, w, 1))
    cnt = 0
    for ds in (slice(-ws[0]), slice(-ws[0], -shift[0]),
               slice(-shift[0], None)) if shift[0] else (slice(None),):
        for hs in (slice(-ws[1]), slice(-ws[1], -shift[1]),
                   slice(-shift[1], None)) if shift[1] else (slice(None),):
            for wsl in (slice(-ws[2]), slice(-ws[2], -shift[2]),
                        slice(-shift[2], None)) if shift[2] else (slice(None),):
                img_mask[:, ds, hs, wsl, :] = cnt
                cnt += 1
    mw = window_partition(img_mask, ws).squeeze(-1)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    return attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0)


class WindowAttention(nn.Module):
    def __init__(self, dim, heads, window_size):
        super().__init__()
        self.num_heads = heads
        self.window_size = window_size
        head_dim = dim // heads
        self.scale = head_dim ** -0.5
        mesh = torch.stack(torch.meshgrid(
            *(torch.arange(w) for w in window_size), indexing="ij"))
        coords = mesh.flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size[0] - 1
        rel[:, :, 1] += window_size[1] - 1
        rel[:, :, 2] += window_size[2] - 1
        rel[:, :, 0] *= (2 * window_size[1] - 1) * (2 * window_size[2] - 1)
        rel[:, :, 1] *= 2 * window_size[2] - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.relative_position_bias_table = nn.Parameter(torch.zeros(
            (2 * window_size[0] - 1) * (2 * window_size[1] - 1)
            * (2 * window_size[2] - 1), heads))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index[:n, :n].reshape(-1)
        ].reshape(n, n, -1).permute(2, 0, 1).contiguous()
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = torch.softmax(attn, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class SwinTransformerBlock(nn.Module):
    def __init__(self, dim, heads, window_size, shift_size, mlp_ratio=4.0):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, heads, window_size)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))

    def forward(self, x):
        # x: (B, D, H, W, C)
        b, d, h, w, c = x.shape
        ws, ss = get_window_size((d, h, w), self.window_size,
                                 self.shift_size)
        shortcut = x
        x = self.norm1(x)
        pad = [(ws[i] - s % ws[i]) % ws[i] for i, s in enumerate((d, h, w))]
        x = F.pad(x, (0, 0, 0, pad[2], 0, pad[1], 0, pad[0]))
        _, dp, hp, wp, _ = x.shape
        if any(ss):
            shifted = torch.roll(x, shifts=tuple(-s for s in ss),
                                 dims=(1, 2, 3))
            mask = compute_mask((dp, hp, wp), ws, ss)
        else:
            shifted, mask = x, None
        attn_windows = self.attn(window_partition(shifted, ws), mask)
        shifted = window_reverse(attn_windows, ws, (b, dp, hp, wp))
        if any(ss):
            x = torch.roll(shifted, shifts=ss, dims=(1, 2, 3))
        else:
            x = shifted
        x = x[:, :d, :h, :w, :]
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchMergingV2(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(8 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(8 * dim)

    def forward(self, x):
        x = torch.cat([x[:, i::2, j::2, k::2, :] for i, j, k in
                       itertools.product(range(2), range(2), range(2))], -1)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, depth, heads, window_size):
        super().__init__()
        self.blocks = nn.ModuleList([
            SwinTransformerBlock(
                dim, heads, window_size,
                tuple(0 for _ in window_size) if i % 2 == 0
                else tuple(w // 2 for w in window_size))
            for i in range(depth)])
        self.downsample = PatchMergingV2(dim)

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return self.downsample(x)


class PatchEmbed(nn.Module):
    def __init__(self, cin, embed_dim):
        super().__init__()
        self.proj = nn.Conv3d(cin, embed_dim, 2, stride=2)

    def forward(self, x):
        return self.proj(x)


class SwinTransformer(nn.Module):
    def __init__(self, cin, embed_dim, depths, heads, window_size):
        super().__init__()
        self.patch_embed = PatchEmbed(cin, embed_dim)
        for i, depth in enumerate(depths):
            setattr(self, f"layers{i + 1}", nn.ModuleList([
                BasicLayer(embed_dim * 2 ** i, depth, heads[i],
                           window_size)]))
        self.num_layers = len(depths)

    @staticmethod
    def proj_out(x):
        # normalize=True: parameter-free layer norm over channels
        ch = x.shape[1]
        x = x.permute(0, 2, 3, 4, 1)
        x = F.layer_norm(x, [ch])
        return x.permute(0, 4, 1, 2, 3)

    def forward(self, x):
        x = self.patch_embed(x)  # (B, C, D, H, W)
        outs = [self.proj_out(x)]
        h = x.permute(0, 2, 3, 4, 1)  # channels-last for swin blocks
        for i in range(self.num_layers):
            h = getattr(self, f"layers{i + 1}")[0](h)
            outs.append(self.proj_out(h.permute(0, 4, 1, 2, 3)))
        return outs


class SwinUNETR(nn.Module):
    def __init__(self, img_size, in_channels, out_channels,
                 feature_size=48, depths=(2, 2, 2, 2),
                 num_heads=(3, 6, 12, 24), window_size=(7, 7, 7)):
        super().__init__()
        fs = feature_size
        self.swinViT = SwinTransformer(in_channels, fs, depths, num_heads,
                                       window_size)
        self.encoder1 = UnetrBasicBlock(in_channels, fs)
        self.encoder2 = UnetrBasicBlock(fs, fs)
        self.encoder3 = UnetrBasicBlock(2 * fs, 2 * fs)
        self.encoder4 = UnetrBasicBlock(4 * fs, 4 * fs)
        self.encoder10 = UnetrBasicBlock(16 * fs, 16 * fs)
        self.decoder5 = UnetrUpBlock(16 * fs, 8 * fs)
        self.decoder4 = UnetrUpBlock(8 * fs, 4 * fs)
        self.decoder3 = UnetrUpBlock(4 * fs, 2 * fs)
        self.decoder2 = UnetrUpBlock(2 * fs, fs)
        self.decoder1 = UnetrUpBlock(fs, fs)
        self.out = UnetOutBlock(fs, out_channels)

    def forward(self, x_in):
        hidden = self.swinViT(x_in)
        enc0 = self.encoder1(x_in)
        enc1 = self.encoder2(hidden[0])
        enc2 = self.encoder3(hidden[1])
        enc3 = self.encoder4(hidden[2])
        dec4 = self.encoder10(hidden[4])
        dec3 = self.decoder5(dec4, hidden[3])
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        dec0 = self.decoder2(dec1, enc1)
        out = self.decoder1(dec0, enc0)
        return self.out(out)
