"""Space-to-depth (s2d) reformulation of high-resolution, low-channel convs.

Why: XLA:TPU lays NHWC activations out with channels on the 128-lane axis, so
the UNet's top levels (256^2 at C=16, 128^2 at C=32 — reference
``code/networks/unet.py:31-62``) run 8x/4x over their memory bound (measured
1.8 / 3.9 TF/s on v5e). Re-expressing the SAME 3x3 stride-1 conv in s2d(2)
coordinates — (B, H, W, C) -> (B, H/2, W/2, 4C) — turns it into a 3x3 conv
with 4x the channels and 4x the FLOPs, but the MXU runs it ~8-13x faster
(measured 15.5 TF/s f32 / 26.3 TF/s bf16 at 128^2/C64), a ~2.2-3.7x net win
(scripts/probe_s2d.py).

The reformulation is EXACT (a linear re-indexing of the same math):

  s2d layout: y[i, j, (a*2+b)*C + c] = x[2i+a, 2j+b, c],  a, b in {0, 1}.

  A 3x3 SAME conv out(2i+a+dh...) decomposes with a+dh = 2*di + a'
  (di in {-1,0,1}, a' in {0,1}); the s2d-domain kernel is

  K[di+1, dj+1, (a'*2+b')*C + ci, (a*2+b)*Co + co] = k[dh+1, dw+1, ci, co]
    where dh = 2*di + a' - a, dw = 2*dj + b' - b, if both in {-1, 0, 1},
    else 0.

  Zero-CELL SAME padding in s2d coords touches exactly the zero ROWS/COLS the
  original SAME conv reads (row -1 and row H only), so boundaries match too.

MaxPool 2x2/s2 in s2d coords is a max over the (a, b) group — a pure
channel-axis reduction, no spatial op at all. BatchNorm must pool statistics
over the 4 sub-position channels of each original channel to stay exact
(see ``models/unet.py::S2DBatchNorm``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C), group-major channel layout
    ((a*r+b)*C + c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def depth_to_space(y: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hh, ww, gc = y.shape
    c = gc // (r * r)
    y = y.reshape(b, hh, ww, r, r, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hh * r, ww * r, c)


@functools.lru_cache(maxsize=None)
def _selector(r: int = 2) -> np.ndarray:
    """S[di, dj, a', b', a, b, dh, dw] in {0,1}: tap (dh, dw) of the original
    kernel lands at s2d tap (di, dj) connecting in sub-pos (a', b') to out
    sub-pos (a, b)."""
    s = np.zeros((3, 3, r, r, r, r, 3, 3), np.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for a2 in range(r):
                for b2 in range(r):
                    for a in range(r):
                        for b in range(r):
                            dh = r * di + a2 - a
                            dw = r * dj + b2 - b
                            if -1 <= dh <= 1 and -1 <= dw <= 1:
                                s[di + 1, dj + 1, a2, b2, a, b,
                                  dh + 1, dw + 1] = 1.0
    return s


def s2d_kernel3x3(k: jnp.ndarray) -> jnp.ndarray:
    """Original HWIO kernel (3, 3, C, Co) -> s2d-domain (3, 3, 4C, 4Co)."""
    c, co = k.shape[2], k.shape[3]
    sel = jnp.asarray(_selector(), k.dtype)
    big = jnp.einsum("ijABabhw,hwcd->ijABcabd", sel, k)
    return big.reshape(3, 3, 4 * c, 4 * co)


def conv3x3(x: jnp.ndarray, k: jnp.ndarray, bias=None, dtype=None):
    """SAME 3x3 stride-1 conv applied in s2d coordinates.

    x: (B, HH, WW, 4*Ci) s2d tensor; k: ORIGINAL kernel (3, 3, Ci, Co).
    Returns the s2d form of the original conv's output, (B, HH, WW, 4*Co),
    accumulating in f32 on the MXU.
    """
    big = s2d_kernel3x3(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    # no preferred_element_type: output follows input dtype (TPU still
    # accumulates bf16 MXU passes in f32), and the conv VJP stays
    # dtype-consistent under value_and_grad.
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def conv1x1(x: jnp.ndarray, k: jnp.ndarray, bias=None, dtype=None):
    """1x1 conv (pixel-wise linear map) in s2d coordinates: a block-diagonal
    matmul over the 4 sub-position groups. k: (1, 1, Ci, Co) or (Ci, Co)."""
    if k.ndim == 4:
        k = k[0, 0]
    ci, co = k.shape
    xg = x.reshape(x.shape[:-1] + (4, ci))
    if dtype is not None:
        xg, k = xg.astype(dtype), k.astype(dtype)
    y = jnp.einsum("...gc,cd->...gd", xg, k)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(x.shape[:-1] + (4 * co,))


def space_to_depth_labels(lab: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Integer label map (B, H, W) -> its s2d view (B, H/r, W/r, r*r),
    sub-position axis last, (a*r+b) order — matches the grouped-logits
    view (B, HH, WW, r*r, C) the model emits under ``s2d_logits=True``.
    Same pixels, re-indexed: every per-pixel loss is invariant."""
    b, h, w = lab.shape
    x = lab.reshape(b, h // r, r, w // r, r)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h // r, w // r, r * r)


def depth_to_space_labels(lab: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of ``space_to_depth_labels``: (B, HH, WW, r*r) grouped
    integer labels -> (B, HH*r, WW*r). Cheap on int maps (r*r times less
    data than the logits the grouped mode avoids transposing)."""
    b, hh, ww, g = lab.shape
    x = lab.reshape(b, hh, ww, r, r).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, hh * r, ww * r)


def group_max(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool 2x2 stride 2 of the ORIGINAL tensor, computed in s2d coords:
    (B, HH, WW, 4C) -> (B, HH, WW, C) — max over the (a, b) sub-positions."""
    b, hh, ww, gc = x.shape
    return x.reshape(b, hh, ww, 4, gc // 4).max(axis=3)


def concat(xs, channels) -> jnp.ndarray:
    """Channel-concat of ORIGINAL tensors, performed on their s2d forms.
    ``xs[i]`` is (B, HH, WW, 4*channels[i]); result groups stay (a, b)-major."""
    grouped = [x.reshape(x.shape[:-1] + (4, c))
               for x, c in zip(xs, channels)]
    y = jnp.concatenate(grouped, axis=-1)
    return y.reshape(y.shape[:-2] + (4 * y.shape[-1],))


# ---------------------------------------------------------------------------
# Shifted-grid 2-tap conv pair: a SAME 3x3 conv maps the ALIGNED s2d grid
# (cell i = rows 2i, 2i+1) onto the SHIFTED grid (cell j = rows 2j-1, 2j,
# one extra cell per axis) — and back — with a 2x2-tap kernel instead of the
# 3x3-with-zeros kernel, because each output sub-position then reads only
# two consecutive input cells. FLOPs per output pixel drop from 36C to 16C
# (2.25x). A ConvBlock applies conv1 aligned->shifted and conv2
# shifted->aligned, so the reformulation never leaks outside the block;
# the shifted tensor's overhang sub-rows (original rows -1 and H) must be
# zeroed (they play the SAME-padding role for conv2) via shifted_mask().
#
# Shared tap rule for both directions: dh = 2*di + s_in - s_out - 1.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _selector_k2() -> np.ndarray:
    s = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
    for di in range(2):
        for dj in range(2):
            for a2 in range(2):
                for b2 in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * di + a2 - a - 1
                            dw = 2 * dj + b2 - b - 1
                            if -1 <= dh <= 1 and -1 <= dw <= 1:
                                s[di, dj, a2, b2, a, b, dh + 1, dw + 1] = 1.0
    return s


def k2_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) -> shifted-grid 2-tap kernel (2, 2, 4C, 4Co)."""
    c, co = k.shape[2], k.shape[3]
    sel = jnp.asarray(_selector_k2(), k.dtype)
    big = jnp.einsum("ijABabhw,hwcd->ijABcabd", sel, k)
    return big.reshape(2, 2, 4 * c, 4 * co)


@functools.lru_cache(maxsize=None)
def _shifted_mask_np(hh: int, ww: int) -> np.ndarray:
    """(hh+1, ww+1, 4, 1) zero-mask for the shifted grid's overhang
    sub-rows/cols (original row -1 / row 2*hh, col likewise)."""
    m = np.ones((hh + 1, ww + 1, 2, 2, 1), np.float32)
    m[0, :, 0, :, :] = 0.0       # row -1
    m[hh, :, 1, :, :] = 0.0      # row 2*hh
    m[:, 0, :, 0, :] = 0.0       # col -1
    m[:, ww, :, 1, :] = 0.0      # col 2*ww
    return m.reshape(hh + 1, ww + 1, 4, 1)


def shifted_mask(hh: int, ww: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_shifted_mask_np(hh, ww), dtype)


def apply_shifted_mask(y: jnp.ndarray) -> jnp.ndarray:
    """Zero the overhang positions of a shifted-grid tensor
    (B, hh+1, ww+1, 4C)."""
    b, h1, w1, gc = y.shape
    m = shifted_mask(h1 - 1, w1 - 1, y.dtype)
    yg = y.reshape(b, h1, w1, 4, gc // 4)
    return (yg * m[None]).reshape(y.shape)


def conv3x3_to_shifted(x: jnp.ndarray, k: jnp.ndarray, bias=None,
                       dtype=None):
    """SAME 3x3 conv, aligned s2d input (B, HH, WW, 4Ci) -> shifted output
    (B, HH+1, WW+1, 4Co), overhang already masked to zero."""
    big = k2_kernel(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return apply_shifted_mask(y)


def conv3x3_from_shifted(x: jnp.ndarray, k: jnp.ndarray, bias=None,
                         dtype=None):
    """SAME 3x3 conv, shifted input (B, HH+1, WW+1, 4Ci; overhang MUST be
    zero) -> aligned s2d output (B, HH, WW, 4Co)."""
    big = k2_kernel(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


# ---------------------------------------------------------------------------
# Custom-VJP conv pair: keep the 2-tap forward AND the 2-tap dgrad, but
# compute the WEIGHT gradient at dense aligned-s2d 3x3 shapes. XLA's wgrad
# for the k2 kernels runs at the shifted grid's ODD spatial extents
# (HH+1 = 129 at level 0), which tile poorly onto the MXU; the dense wgrad
# runs at even 128^2/4C shapes (the 15-26 TF/s class, module docstring).
# The math: both convs ARE the original 3x3 conv re-indexed, so
# dL/dk = selector-contraction of the ALIGNED-domain wgrad, computed from
# the aligned forms of the input and the output cotangent.
# ---------------------------------------------------------------------------


def shifted_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Shifted-grid s2d tensor (B, hh+1, ww+1, 4C) -> ORIGINAL layout
    (B, 2hh, 2ww, C). Cell j, sub-pos a' holds original row 2j - 1 + a';
    the overhang rows (-1 and 2hh) are dropped."""
    b, h1, w1, gc = y.shape
    c = gc // 4
    yg = y.reshape(b, h1, w1, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    full = yg.reshape(b, 2 * h1, 2 * w1, c)  # row index = r + 1
    return full[:, 1:2 * h1 - 1, 1:2 * w1 - 1, :]


def _dense_wgrad(x_al: jnp.ndarray, g_al: jnp.ndarray, c: int, co: int):
    """dL/dk (3, 3, c, co) from ALIGNED s2d input x_al (B, HH, WW, 4c) and
    aligned output cotangent g_al (B, HH, WW, 4co): XLA wgrad of the dense
    aligned conv, then the selector contraction (adjoint of
    :func:`s2d_kernel3x3`). f32 accumulation."""
    def aligned_conv(big):
        return jax.lax.conv_general_dilated(
            x_al, big, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # linear_transpose: conv is linear in the kernel, and unlike jax.vjp
    # this does NOT execute a dummy forward conv to get the primal
    big_struct = jax.ShapeDtypeStruct((3, 3, 4 * c, 4 * co), x_al.dtype)
    (dbig,) = jax.linear_transpose(aligned_conv, big_struct)(
        g_al.astype(x_al.dtype))
    dbig = dbig.astype(jnp.float32).reshape(3, 3, 2, 2, c, 2, 2, co)
    sel = jnp.asarray(_selector(), jnp.float32)
    return jnp.einsum("ijABabhw,ijABcabd->hwcd", sel, dbig)


def _k_adjoint(k: jnp.ndarray) -> jnp.ndarray:
    """Spatially flipped, in/out-transposed kernel: the original conv's
    adjoint. (3, 3, C, Co) -> (3, 3, Co, C)."""
    return jnp.flip(k, (0, 1)).swapaxes(2, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_to_shifted_cv(x, k, bias, dtype):
    return conv3x3_to_shifted(x, k, bias, dtype=dtype)


def _to_shifted_fwd(x, k, bias, dtype):
    y = conv3x3_to_shifted(x, k, bias, dtype=dtype)
    return y, (x, k)


def _to_shifted_bwd(dtype, res, g):
    x, k = res
    g = apply_shifted_mask(g)
    # dgrad stays 2-tap: adjoint of the original SAME conv maps the shifted
    # cotangent back to the aligned grid with the flipped/transposed kernel
    dx = conv3x3_from_shifted(g, _k_adjoint(k), dtype=dtype).astype(x.dtype)
    g_al = space_to_depth(shifted_to_space(g))
    c, co = k.shape[2], k.shape[3]
    dk = _dense_wgrad(x.astype(dtype) if dtype else x,
                      g_al, c, co).astype(k.dtype)
    gg = g.reshape(g.shape[:-1] + (4, co))
    dbias = jnp.sum(gg.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(k.dtype)
    return dx, dk, dbias


conv3x3_to_shifted_cv.defvjp(_to_shifted_fwd, _to_shifted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_from_shifted_cv(x, k, bias, dtype):
    return conv3x3_from_shifted(x, k, bias, dtype=dtype)


def _from_shifted_fwd(x, k, bias, dtype):
    y = conv3x3_from_shifted(x, k, bias, dtype=dtype)
    return y, (x, k)


def _from_shifted_bwd(dtype, res, g):
    x, k = res
    # adjoint of the VALID k2 conv: pad-(1,1) k2 conv of the aligned
    # cotangent with the flipped/transposed kernel — NO overhang mask (the
    # true adjoint); upstream apply_shifted_mask zeroes those slots anyway.
    big_adj = k2_kernel(_k_adjoint(k))
    gd = g.astype(dtype) if dtype else g
    dx = jax.lax.conv_general_dilated(
        gd, big_adj.astype(gd.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    # wgrad at dense aligned shapes: x's original-space content is the
    # shifted tensor regridded (overhang is zero by contract)
    x_al = space_to_depth(shifted_to_space(x.astype(dtype) if dtype else x))
    c, co = k.shape[2], k.shape[3]
    dk = _dense_wgrad(x_al, g, c, co).astype(k.dtype)
    gg = g.reshape(g.shape[:-1] + (4, co))
    dbias = jnp.sum(gg.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(k.dtype)
    return dx, dk, dbias


conv3x3_from_shifted_cv.defvjp(_from_shifted_fwd, _from_shifted_bwd)


# Trace-time switch (an XLA-program choice, not a semantics change: the
# custom VJP is grad-identical to autodiff — tests/test_s2d.py). True =
# wgrad at dense aligned shapes; False = XLA's odd-shape k2 wgrad.
#
# MEASURED on v5e (scripts/probe_wgrad.py, bench config 24x256^2 s2d2
# bf16, interleaved within one process): k2 wgrad grad = 29.4 ms, dense
# custom-vjp grad = 45.4 ms — the dense path's 2.25x wgrad FLOPs plus the
# shifted->aligned regrid passes cost MORE than XLA's odd-shape k2 wgrad
# saves. The full backward is already ~2.2x the forward (FLOP-
# proportional), so the odd shapes were never the bottleneck. Kept as an
# off-by-default option + the measurement that closes VERDICT item 2's
# first suggestion.
WGRAD_DENSE = False


def pair_to_shifted(x, k, bias=None, dtype=None):
    if WGRAD_DENSE and bias is not None:  # cv path needs a real dbias slot
        return conv3x3_to_shifted_cv(x, k, bias, dtype)
    return conv3x3_to_shifted(x, k, bias, dtype=dtype)


def pair_from_shifted(x, k, bias=None, dtype=None):
    if WGRAD_DENSE and bias is not None:
        return conv3x3_from_shifted_cv(x, k, bias, dtype)
    return conv3x3_from_shifted(x, k, bias, dtype=dtype)


# ---------------------------------------------------------------------------
# 3D (NDHWC): s2d on the H, W axes only — the depth axis keeps its native
# extent (3D convs are lane-padding-bound exactly like 2D; measured on v5e:
# the 48^3/C32 UNet3D conv runs 2.1x faster in this form, the full-res
# decoder convs ~2x).
# ---------------------------------------------------------------------------


def space_to_depth3d(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D, H/r, W/r, r*r*C), (a*r+b)*C + c layout."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, d, h // r, w // r, r * r * c)


def depth_to_space3d(y: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    b, d, hh, ww, gc = y.shape
    c = gc // (r * r)
    y = y.reshape(b, d, hh, ww, r, r, c)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(b, d, hh * r, ww * r, c)


def s2d_kernel3x3x3(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C, Co) -> (3, 3, 3, 4C, 4Co): the 2D in-plane transform
    applied independently per depth tap (the D axis is untouched)."""
    c, co = k.shape[3], k.shape[4]
    sel = jnp.asarray(_selector(), k.dtype)
    big = jnp.einsum("ijABabhw,Dhwce->DijABcabe", sel, k)
    return big.reshape(3, 3, 3, 4 * c, 4 * co)


def conv3x3x3(x: jnp.ndarray, k: jnp.ndarray, bias=None, dtype=None):
    """SAME 3^3 stride-1 conv in (H, W)-s2d coordinates.
    x: (B, D, HH, WW, 4*Ci); k: ORIGINAL kernel (3, 3, 3, Ci, Co)."""
    big = s2d_kernel3x3x3(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def k2_kernel3d(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C, Co) -> shifted-grid kernel (3, 2, 2, 4C, 4Co): the D
    axis keeps its three native taps, H/W use the 2-tap shifted form."""
    c, co = k.shape[3], k.shape[4]
    sel = jnp.asarray(_selector_k2(), k.dtype)
    big = jnp.einsum("ijABabhw,Dhwce->DijABcabe", sel, k)
    return big.reshape(3, 2, 2, 4 * c, 4 * co)


def apply_shifted_mask3d(y: jnp.ndarray) -> jnp.ndarray:
    """(B, D, hh+1, ww+1, 4C): zero the in-plane overhang positions."""
    b, d, h1, w1, gc = y.shape
    m = shifted_mask(h1 - 1, w1 - 1, y.dtype)
    yg = y.reshape(b, d, h1, w1, 4, gc // 4)
    return (yg * m[None, None]).reshape(y.shape)


def conv3x3x3_to_shifted(x: jnp.ndarray, k: jnp.ndarray, bias=None,
                         dtype=None):
    """SAME 3^3 conv, aligned (H,W)-s2d input (B, D, HH, WW, 4Ci) ->
    shifted output (B, D, HH+1, WW+1, 4Co), overhang masked."""
    big = k2_kernel3d(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return apply_shifted_mask3d(y)


def conv3x3x3_from_shifted(x: jnp.ndarray, k: jnp.ndarray, bias=None,
                           dtype=None):
    """SAME 3^3 conv, shifted input (overhang MUST be zero) -> aligned
    (H,W)-s2d output (B, D, HH, WW, 4Co)."""
    big = k2_kernel3d(k)
    if dtype is not None:
        x, big = x.astype(dtype), big.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, big, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y


def group_max3d(x: jnp.ndarray) -> jnp.ndarray:
    """In-plane 2x2 maxpool of the ORIGINAL tensor, in s2d coords:
    (B, D, HH, WW, 4C) -> (B, D, HH, WW, C)."""
    b, d, hh, ww, gc = x.shape
    return x.reshape(b, d, hh, ww, 4, gc // 4).max(axis=4)


def concat3d(xs, channels) -> jnp.ndarray:
    grouped = [x.reshape(x.shape[:-1] + (4, c))
               for x, c in zip(xs, channels)]
    y = jnp.concatenate(grouped, axis=-1)
    return y.reshape(y.shape[:-2] + (4 * y.shape[-1],))
