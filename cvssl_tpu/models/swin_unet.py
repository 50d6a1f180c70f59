"""SwinUnet (Flax, NHWC) — parity with
``code/networks/swin_transformer_unet_skip_expand_decoder_sys.py`` (Swin-tiny
encoder: embed 96, depths [2,2,2,2], heads [3,6,12,24], window 7, patch 4)
and the ``code/networks/vision_transformer.py`` wrapper (1->3 channel repeat).

Faithful quirks kept:
* the ``depths_decoder`` argument is DEAD in the reference — ``BasicLayer_up``
  is built from encoder ``depths`` (``swin_...sys.py:703-706``); same here.
* blocks at 7x7 resolution collapse window partitioning (window = min(res),
  shift = 0, ``:198-201``).

TPU notes: tokens stay (B, H, W, C); window partition/reverse are reshapes;
shifted windows are ``jnp.roll``; the shifted-window attention mask and
relative-position index are numpy constants baked at trace time. Attention
is a batched (B*nW, heads, 49, 49) einsum — MXU-batched matmuls.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc_normal_init = nn.initializers.truncated_normal(0.02)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int
                   ) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) lookup into the (2ws-1)^2 bias table (reference
    ``:90-104``)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for SW-MSA
    (reference ``:217-240``)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale by 1/keep)."""
    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                    (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference ``:63-155``).

    Two layouts, IDENTICAL param tree (qkv/proj Dense act on the last axis
    either way, so checkpoints are interchangeable):

    * ``grid=False``: the classic (B*nW, ws*ws, C) window batch — input
      must already be window-partitioned.
    * ``grid=True``: input stays the 6D (B, hb, ws, wb, ws, C) view — a
      FREE reshape of the (B, H, W, C) token map (axis splits never copy).
      The attention einsums carry (B, hb, wb) as batch axes and (i, j) x
      (k, l) as the window token axes, so neither window partition/reverse
      nor the qkv 5D transpose exists in the program.

      MEASURED SLOWER (round 5, scripts/probe_swin_layout.py, real chip,
      scan-amortized interleaved A/B): the full cross-teaching step is
      ~100 ms/step on grid vs ~51 ms on windows — the 8D attention
      einsums' tiny free dims (7x7 window factors) tile far worse onto
      the MXU than the partition copies cost. Kept as a pinned-equivalent
      variant for future layout work; the DEFAULT stays "windows".
    """
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None
    grid: bool = False
    fused: bool = False  # "fused" layout: map-level qkv/proj, see below

    def _bias(self, heads: int):
        ws = self.window_size
        table = self.param("relative_position_bias_table",
                           trunc_normal_init,
                           ((2 * ws - 1) * (2 * ws - 1), heads))
        idx = relative_position_index(ws).reshape(-1)
        # bias lookup as a STATIC one-hot matmul, not a gather — gathers
        # cost ~20ns/element on TPU (2401 x heads x 24 blocks adds up);
        # the (n^2, table) one-hot is a trace-time constant.
        sel = jnp.asarray(np.eye(table.shape[0], dtype=np.float32)[idx])
        return (sel @ table).reshape(ws * ws, ws * ws, heads
                                     ).transpose(2, 0, 1)  # (heads, n, n)

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None, *,
                 train: bool = False):
        heads = self.num_heads
        head_dim = self.dim // heads
        scale = self.qk_scale or head_dim ** -0.5
        ws = self.window_size
        n = ws * ws

        if self.grid:
            b, hb, _, wb, _, c = x.shape
            qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(x)
            qkv = qkv.reshape(b, hb, ws, wb, ws, 3, heads, head_dim)
            q = qkv[..., 0, :, :] * scale
            k = qkv[..., 1, :, :]
            v = qkv[..., 2, :, :]
            attn = jnp.einsum("bpiqjhd,bpkqlhd->bpqhijkl", q, k)
            # merging (i,j)->n and (k,l)->m is free (adjacent axes)
            attn = attn.reshape(b, hb, wb, heads, n, n).astype(jnp.float32)
            attn = attn + self._bias(heads)[None, None, None]
            if mask is not None:
                # (nW, n, n) with nW == hb*wb enumerated row-major
                attn = attn + jnp.asarray(mask).reshape(
                    1, hb, wb, 1, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = attn.astype(self.dtype or jnp.float32)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            attn = attn.reshape(b, hb, wb, heads, ws, ws, ws, ws)
            out = jnp.einsum("bpqhijkl,bpkqlhd->bpiqjhd",
                             attn, v.astype(attn.dtype))
            out = out.reshape(b, hb, ws, wb, ws, c)
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        if self.fused:
            # "fused" layout: x is the (rolled) TOKEN MAP (B, H, W, C).
            # qkv/proj Dense act on the map (channelwise — they commute
            # with window partitioning), and ONE transpose of the 3C qkv
            # map replaces the classic partition(C) + qkv-5D-transpose(3C)
            # copies; on the way out ONE C transpose replaces
            # out-transpose(C) + window_reverse(C). The attention einsums
            # below are SHAPE-IDENTICAL to the classic layout (same MXU
            # tiling — unlike the "grid" variant, which lost 2x to 8D
            # einsum tiling), with b_ enumerated row-major exactly like
            # window_partition, so masks/bias apply unchanged.
            # MEASURED SLOWER anyway (round 5, probe_swin_layout,
            # interleaved A/B on the real cross-teaching step: 59.6 vs
            # 51.9 ms/step) — one 8-axis transpose of the 3C map costs
            # more than the four smaller copies; TPU transpose cost is
            # not copy-count-linear. Kept pinned-equivalent
            # (tests/test_swin_unet.py) as a layout oracle; default
            # stays "windows".
            b, hmap, wmap, c = x.shape
            hb, wb = hmap // ws, wmap // ws
            qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(x)
            qkv = qkv.reshape(b, hb, ws, wb, ws, 3, heads, head_dim)
            qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7)
            # (3, b, hb, wb, heads, ws, ws, d) — adjacent-axis merges free
            qkv = qkv.reshape(3, b * hb * wb, heads, n, head_dim)
            b_ = b * hb * wb
        else:
            b_, n, c = x.shape
            qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(x)
            qkv = qkv.reshape(b_, n, 3, heads,
                              head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = attn + self._bias(heads)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) + \
                jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(-1, heads, n, n)
        # softmax in f32 for stability, back to compute dtype for the PV
        # matmul (bf16 MXU)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype or jnp.float32)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(attn.dtype))
        if self.fused:
            out = out.reshape(b, hb, wb, heads, ws, ws, head_dim)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6)  # one C copy
            out = out.reshape(b, hmap, wmap, c)
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    """(reference ``:169-289``). Input (B, H, W, C).

    ``attn_layout="grid"`` runs WindowAttention on the free 6D
    (B, hb, ws, wb, ws, C) view instead of the copied (B*nW, n, C) window
    batch — same params, same math, no partition/reverse transposes."""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None
    attn_layout: str = "windows"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(h, w, ws, shift) if shift > 0 else None
        if self.attn_layout == "grid":
            xg = x.reshape(b, h // ws, ws, w // ws, ws, c)
            attn = WindowAttention(self.dim, ws, self.num_heads,
                                   self.qkv_bias, self.qk_scale,
                                   self.attn_drop, self.drop,
                                   dtype=self.dtype, grid=True,
                                   name="attn")(xg, mask, train=train)
            x = attn.reshape(b, h, w, c)
        elif self.attn_layout == "fused":
            x = WindowAttention(self.dim, ws, self.num_heads,
                                self.qkv_bias, self.qk_scale,
                                self.attn_drop, self.drop,
                                dtype=self.dtype, fused=True,
                                name="attn")(x, mask, train=train)
        else:
            windows = window_partition(x, ws)
            attn = WindowAttention(self.dim, ws, self.num_heads,
                                   self.qkv_bias, self.qk_scale,
                                   self.attn_drop, self.drop,
                                   dtype=self.dtype,
                                   name="attn")(windows, mask, train=train)
            x = window_reverse(attn, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        x = shortcut + DropPath(self.drop_path)(x, train=train)
        mlp_out = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                      dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="norm2")(x), train=train)
        return x + DropPath(self.drop_path)(mlp_out, train=train)


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN + linear 4C->2C (reference ``:309-355``)."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class PatchExpand(nn.Module):
    """linear C->2C + depth-to-space x2 + LN on C/2 (reference ``:358-382``)."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        x = x.reshape(b, h, w, 2, 2, self.dim // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w,
                                                  self.dim // 2)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class _GroupedLNStats(nn.Module):
    """Declares LayerNorm params (scale/bias of shape (C,), same tree as
    nn.LayerNorm) and returns per-GROUP statistics of a (..., G*C)
    tensor via block-indicator matmuls (f32 accumulation) — the tensor
    never leaves its (..., G*C)-lane layout and nothing full-size is
    written. The normalization itself is folded into the block-diagonal
    output head (_BlockDiagPointwiseHead): a naive grouped LN (either the
    (..., 16, 96) view, 70.3 ms/step, or explicit f32 indicator matmuls,
    54.2 ms with ~6 ms in norm converts) loses to full-res unless every
    full-size write is eliminated."""
    dim: int
    groups: int

    @nn.compact
    def __call__(self, x):
        g, c = self.groups, self.dim
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ind = jnp.asarray(np.kron(np.eye(g, dtype=np.float32),
                                  np.ones((c, 1), np.float32)))  # (g*c, g)
        dims = (((x.ndim - 1,), (0,)), ((), ()))
        mean_g = jax.lax.dot_general(
            x, ind.astype(x.dtype), dims,
            preferred_element_type=jnp.float32) / c       # (..., g) f32
        ex2_g = jax.lax.dot_general(
            x * x, ind.astype(x.dtype), dims,
            preferred_element_type=jnp.float32) / c
        var_g = ex2_g - mean_g ** 2
        return mean_g, var_g, scale, bias


class _BlockDiagPointwiseHead(nn.Module):
    """The 1x1 output conv applied in grouped coordinates, with the
    preceding LayerNorm's affine+normalization FOLDED in:

        LN(x) @ K = (x @ (s .* K)) * r  -  (m * r) * colsum(s .* K)
                    + colsum(b .* K)

    per group (m, r = mean, rsqrt-var of the group; s, b = LN affine;
    colsum over channels). The (..., G*C) tensor is only ever READ (by
    the stats matmuls and the head matmul) — no full-size intermediate is
    written, which is what makes grouped coordinates actually beat the
    full-resolution head. Param tree/shape is IDENTICAL to
    ``nn.Conv(num_classes, (1, 1), use_bias=False)``."""
    in_dim: int
    num_classes: int
    groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mean_g, var_g, ln_scale, ln_bias):
        g = self.groups
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_dim, self.num_classes))
        dt = self.dtype or x.dtype
        kf = k[0, 0].astype(jnp.float32)
        ks = ln_scale.astype(jnp.float32)[:, None] * kf    # (C, nc)
        kbs = jnp.kron(jnp.eye(g, dtype=dt), ks.astype(dt))
        z = (x.astype(dt) @ kbs).astype(jnp.float32)
        z = z.reshape(z.shape[:-1] + (g, self.num_classes))
        r = jax.lax.rsqrt(var_g + 1e-5)                    # (..., g) f32
        cs = jnp.sum(ks, axis=0)                           # (nc,)
        cb = jnp.sum(ln_bias.astype(jnp.float32)[:, None] * kf, axis=0)
        out = z * r[..., None] - (mean_g * r)[..., None] * cs + cb
        return out.astype(dt)


class FinalPatchExpandX4(nn.Module):
    """linear C->16C + depth-to-space x4 + LN on C (reference ``:385-410``).

    ``grouped=True`` keeps the result in s2d grouped COORDINATES — flat
    (B, H, W, 16*C), group axis enumerating the 4x4 sub-positions in
    (i*4+j) order, exactly ``ops.s2d.space_to_depth_labels(..., r=4)``'s
    layout — and normalizes per group via _GroupedChannelLN. Same values
    as depth-to-space + LN, no full-resolution transpose: the full-res
    d2s + LN + 1x1-conv backward at 224^2 were the hottest ops of the
    cross-teaching step (scripts/probe_hlo_ct.py census, round 4)."""
    dim: int
    dtype: Any = None
    grouped: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Dense(16 * self.dim, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        if self.grouped:
            # raw expand output + per-group LN stats; normalization is
            # folded into the consuming head (_BlockDiagPointwiseHead)
            return (x,) + _GroupedLNStats(self.dim, 16, name="norm")(x)
        x = x.reshape(b, h, w, 4, 4, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * h, 4 * w,
                                                  self.dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SwinUnet(nn.Module):
    """Full SwinUnet (``SwinTransformerSys``, reference ``:599-790``, plus
    the 1->3 channel repeat of ``vision_transformer.py:49-50``)."""
    num_classes: int = 4
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False  # remat blocks (reference use_checkpoint,
                                  # vision_transformer.py:46)
    logits_f32: bool = True       # False: logits in compute dtype (train
    # step only — every train-loss consumer casts to f32 at entry, so
    # values are bit-identical; skips materializing the f32 logit map).
    # Eval paths keep the f32 contract.
    s2d_logits: bool = False      # grouped (B, H/4, W/4, 16, C) train
    # logits — skips the full-res x4 depth-to-space + LN + head (see
    # FinalPatchExpandX4.grouped). Train-step clones only.
    attn_layout: str = "windows"  # "windows": classic partition (FASTER —
    # see WindowAttention docstring); "grid": transpose-free 6D variant,
    # measured 2x slower on the real step. Same param tree either way.
    dtype: Any = None             # bf16 compute (params/softmax/logits f32)

    def _block(self, **kw):
        cls = nn.remat(SwinBlock, static_argnums=(2,)) \
            if self.use_checkpoint else SwinBlock
        return cls(**kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1,) * (x.ndim - 1) + (3,))

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        # patch embed: conv k=4 s=4 (+ LN)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype,
                    name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="patch_norm")(x)
        if self.ape:
            b, h, w, c = x.shape
            pos = self.param("absolute_pos_embed", trunc_normal_init,
                             (1, h, w, c))
            x = x + pos
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        # encoder
        skips = []
        for i in range(num_layers):
            dim = int(self.embed_dim * 2 ** i)
            skips.append(x)
            for d in range(self.depths[i]):
                x = self._block(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=dpr[sum(self.depths[:i]) + d],
                    attn_layout=self.attn_layout,
                    dtype=self.dtype, name=f"enc_{i}_{d}")(x, train)
            if i < num_layers - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"downsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        # decoder (depths mirror the ENCODER depths — reference dead-arg)
        for i in range(num_layers):
            stage = num_layers - 1 - i
            dim = int(self.embed_dim * 2 ** stage)
            if i == 0:
                x = PatchExpand(dim, name="up_0")(x)
            else:
                # reference: torch.cat([x, x_downsample[3-inx]]) where
                # x_downsample[k] is the INPUT to encoder stage k (:764-767)
                x = jnp.concatenate([x, skips[stage]], axis=-1)
                x = nn.Dense(dim, name=f"concat_back_dim_{i}")(x)
                for d in range(self.depths[stage]):
                    x = self._block(
                        dim=dim, num_heads=self.num_heads[stage],
                        window_size=self.window_size,
                        shift_size=0 if d % 2 == 0 else self.window_size // 2,
                        mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale, drop=self.drop_rate,
                        attn_drop=self.attn_drop_rate,
                        drop_path=dpr[sum(self.depths[:stage]) + d],
                        attn_layout=self.attn_layout,
                        dtype=self.dtype, name=f"dec_{i}_{d}")(x, train)
                if i < num_layers - 1:
                    x = PatchExpand(dim, dtype=self.dtype,
                                    name=f"up_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)

        if self.s2d_logits:
            # grouped-logits train mode: stay in the flat (B, H/4, W/4,
            # 16*C) layout end-to-end — the 1x1 output conv becomes a
            # block-diagonal (kron) matmul with the SAME (1, 1, C,
            # num_classes) kernel; only the final (cheap, 16*nc-channel)
            # logits get the (..., 16, nc) view the losses consume. Labels
            # are re-indexed in-step (space_to_depth_labels r=4). Eval
            # clones keep the original layout.
            xg, mean_g, var_g, ln_s, ln_b = FinalPatchExpandX4(
                self.embed_dim, dtype=self.dtype, grouped=True,
                name="final_up")(x)
            out = _BlockDiagPointwiseHead(
                self.embed_dim, self.num_classes, 16, dtype=self.dtype,
                name="output")(xg, mean_g, var_g, ln_s, ln_b)
        else:
            x = FinalPatchExpandX4(self.embed_dim, dtype=self.dtype,
                                   name="final_up")(x)
            out = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                          dtype=self.dtype, name="output")(x)
        return out.astype(jnp.float32) if self.logits_f32 else out
