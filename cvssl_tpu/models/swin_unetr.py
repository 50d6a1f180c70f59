"""SwinUNETR (Flax, NDHWC) — MONAI-free reimplementation matching the
reference usage (``net_factory_3d.py:38``: img 64^3, feature_size 48): a 3D
Swin transformer encoder (patch 2, depths [2,2,2,2], heads [3,6,12,24],
window 7 clamped per resolution, shifted windows, 3D relative position bias)
feeding a UNETR-style residual conv decoder.

Pinned to MONAI's published schema (executable torch reconstruction:
tests/monai_standin.py; parity: tests/test_monai_parity.py): every decoder
tap goes through ``proj_out(normalize=True)`` — a PARAMETER-FREE layer norm
over the channel axis (monai SwinTransformer.proj_out: F.layer_norm(x,
[ch])); decoder convs are bias-free (get_conv_layer default) with only the
UnetOutBlock head biased; swin attention qkv HAS bias (qkv_bias=True).

Documented deviation: patch merging concatenates the 2x2x2 neighborhood in
itertools.product order (i slowest) — MONAI's default ``PatchMerging`` (V1)
has a known slice-duplication bug (fixed in their V2, which uses exactly
this product order); we implement the fixed semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cvssl_tpu.models.swin_unet import DropPath, Mlp, trunc_normal_init
from cvssl_tpu.models.unetr import _Deconv, _ResConvBlock


def window_partition_3d(x, ws):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2],
                  c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, ws[0] * ws[1] * ws[2], c)


def window_reverse_3d(windows, ws, d, h, w):
    c = windows.shape[-1]
    b = windows.shape[0] // (d * h * w // np.prod(ws))
    x = windows.reshape(b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1],
                        ws[2], c)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)


def relative_position_index_3d(ws) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws[0]), np.arange(ws[1]),
                                  np.arange(ws[2]), indexing="ij"))
    coords = coords.reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= (2 * ws[2] - 1)
    return rel.sum(-1)


def shifted_window_mask_3d(dims, ws, shift) -> Optional[np.ndarray]:
    img_mask = np.zeros((1, *dims, 1), np.float32)
    cnt = 0
    for ds_ in (slice(0, -ws[0]), slice(-ws[0], -shift[0]),
                slice(-shift[0], None)) if shift[0] else (slice(None),):
        for hs in (slice(0, -ws[1]), slice(-ws[1], -shift[1]),
                   slice(-shift[1], None)) if shift[1] else (slice(None),):
            for wsl in (slice(0, -ws[2]), slice(-ws[2], -shift[2]),
                        slice(-shift[2], None)) if shift[2] else (slice(None),):
                img_mask[:, ds_, hs, wsl, :] = cnt
                cnt += 1
    mw = window_partition_3d(img_mask, ws).squeeze(-1)
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    """``full_window_size`` sizes the bias table: MONAI allocates the
    relative-position table for the CONFIGURED window (7^3) regardless of
    the per-resolution clamp, then slices its index ``[:n, :n]`` — for
    clamped windows those rows enumerate the first n tokens of the FULL
    window's order, not the clamped window's geometry. Reproduced for
    checkpoint/param parity (a documented MONAI quirk)."""
    dim: int
    window_size: Sequence[int]
    num_heads: int
    full_window_size: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = self.dim // heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * head_dim ** -0.5, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        fw = tuple(self.full_window_size or self.window_size)
        table_size = (2 * fw[0] - 1) * (2 * fw[1] - 1) * (2 * fw[2] - 1)
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           (table_size, heads))
        idx = relative_position_index_3d(fw)[:n, :n].reshape(-1)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) + \
                jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(-1, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shifted: bool = False
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, d, h, w, c = x.shape
        ws = tuple(min(self.window_size, s) for s in (d, h, w))
        shift = tuple(s // 2 if (self.shifted and dim_ > s) else 0
                      for s, dim_ in zip(ws, (d, h, w)))

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        # pad each spatial dim up to a window multiple (MONAI behavior)
        pads = [(0, (-s) % ws[i]) for i, s in enumerate((d, h, w))]
        x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        pd, ph, pw = x.shape[1:4]
        if any(shift):
            x = jnp.roll(x, tuple(-s for s in shift), axis=(1, 2, 3))
        windows = window_partition_3d(x, ws)
        mask = shifted_window_mask_3d((pd, ph, pw), ws, shift) \
            if any(shift) else None
        attn = WindowAttention3D(
            self.dim, ws, self.num_heads,
            full_window_size=(self.window_size,) * 3,
            name="attn")(windows, mask, train=train)
        x = window_reverse_3d(attn, ws, pd, ph, pw)
        if any(shift):
            x = jnp.roll(x, shift, axis=(1, 2, 3))
        x = x[:, :d, :h, :w]
        x = shortcut + DropPath(self.drop_path)(x, train=train)
        mlp_out = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                      name="mlp")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), train=train)
        return x + DropPath(self.drop_path)(mlp_out, train=train)


class PatchMerging3D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        parts = [x[:, i::2, j::2, k::2] for i in range(2) for j in range(2)
                 for k in range(2)]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


def _proj_out(x):
    """monai SwinTransformer.proj_out(normalize=True): parameter-free
    layer norm over the channel axis (F.layer_norm(x, [ch]), eps 1e-5)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class SwinUNETR(nn.Module):
    in_chns: int = 1
    num_classes: int = 2
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fs = self.feature_size
        raw = x
        # patch embed: conv k2 s2
        h = nn.Conv(fs, (2, 2, 2), strides=2, name="patch_embed")(x)

        hidden = [h]
        dim = fs
        for i, depth in enumerate(self.depths):
            for dblk in range(depth):
                h = SwinBlock3D(dim, self.num_heads[i], self.window_size,
                                shifted=(dblk % 2 == 1),
                                drop_path=self.drop_path_rate,
                                name=f"stage{i}_block{dblk}")(h, train=train)
            h = PatchMerging3D(dim, name=f"merge{i}")(h)
            dim *= 2
            hidden.append(h)

        # every swin tap is proj_out-normalized (monai normalize=True)
        hidden = [_proj_out(t) for t in hidden]
        enc0 = _ResConvBlock(fs, name="encoder1")(raw)
        enc1 = _ResConvBlock(fs, name="encoder2")(hidden[0])
        enc2 = _ResConvBlock(2 * fs, name="encoder3")(hidden[1])
        enc3 = _ResConvBlock(4 * fs, name="encoder4")(hidden[2])
        dec4 = _ResConvBlock(16 * fs, name="encoder10")(hidden[4])

        from cvssl_tpu.models.unetr import _UpBlock
        d3 = _UpBlock(8 * fs, name="decoder5")(dec4, hidden[3])
        d2 = _UpBlock(4 * fs, name="decoder4")(d3, enc3)
        d1 = _UpBlock(2 * fs, name="decoder3")(d2, enc2)
        d0 = _UpBlock(fs, name="decoder2")(d1, enc1)
        out = _UpBlock(fs, name="decoder1")(d0, enc0)
        return nn.Conv(self.num_classes, (1, 1, 1), name="out")(out)
