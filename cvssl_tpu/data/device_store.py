"""Device-resident dataset + on-device augmentation.

The reference streams every batch host->GPU through a DataLoader
(``train_fully_supervised_2D.py:84-85``). On TPU the whole 2D training set
fits in HBM (ACDC: 1312 x 256^2 f32 = 172 MB), so the TPU-native pipeline is:

1. one-time upload of all (pre-zoomed) slices,
2. per step, transfer ONLY the batch indices (bytes, not megabytes),
3. gather + geometric augmentation JITTED INTO THE TRAIN STEP — the
   reference's ``RandomGenerator`` (50% rot90+flip, else 50% rotate ±20°,
   ``dataset.py:406-425``) becomes gathers/rolls on the VPU.

Deviation (documented): the reference augments at native slice size then
zooms to the patch; here slices are pre-zoomed once (order 0, same
interpolation) and rot90/flip — which commute with resize — plus the ±20°
nearest rotation run on the zoomed grid.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage


class DeviceSliceStore:
    """All train slices resident on device, pre-zoomed to patch size.
    ``mode``: 'default' (RandomGenerator augmentation), 'weak' (resize only),
    'weak_strong' (FixMatch WeakStrongAugment: weak = rot/flip, strong =
    color jitter on weak — ``dataset.py:211-245``)."""

    def __init__(self, dataset, patch_size: Tuple[int, int],
                 image_dtype=jnp.bfloat16, augment: bool = True,
                 mode: str = None):
        self.mode = mode or ("default" if augment else "weak")
        n = len(dataset)
        h, w = patch_size
        images = np.zeros((n, h, w), np.float32)
        labels = np.zeros((n, h, w), np.uint8)
        for i in range(n):
            sample = dataset[i]
            img, lab = sample["image"], sample["label"]
            zh, zw = h / img.shape[0], w / img.shape[1]
            images[i] = ndimage.zoom(img, (zh, zw), order=0)
            labels[i] = ndimage.zoom(lab, (zh, zw), order=0)
        self.images = jax.device_put(jnp.asarray(images, image_dtype))
        self.labels = jax.device_put(jnp.asarray(labels, jnp.uint8))
        self.patch_size = patch_size

    def arrays(self):
        return (self.images, self.labels)

    def batch_fn(self, arrays, indices, rng):
        images, labels = arrays
        if self.mode == "weak_strong":
            return gather_weak_strong(images, labels, indices, rng)
        return gather_augment(images, labels, indices, rng,
                              augment=self.mode == "default")


def _rot90_k(img, k):
    """rot90 by traced k in {0..3} (square images)."""
    return jax.lax.switch(k, [
        lambda x: x,
        lambda x: jnp.rot90(x, 1),
        lambda x: jnp.rot90(x, 2),
        lambda x: jnp.rot90(x, 3)], img)


def _flip_axis(img, axis):
    return jax.lax.cond(axis == 0, lambda x: x[::-1, :], lambda x: x[:, ::-1],
                        img)


def _rotate_nearest(img, angle_deg, is_label):
    """scipy ndimage.rotate(order=0, reshape=False, cval=0) equivalent:
    inverse-map output coords through the rotation about the center, nearest
    neighbor, zero fill. (Reference oracle for the fast batched
    ``_rotate_shear3`` below; a 2D gather — ~20 ns/element on TPU, so the
    hot path avoids it.)"""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = -angle_deg * jnp.pi / 180.0  # inverse rotation
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ys = cos * (yy - cy) - sin * (xx - cx) + cy
    xs = sin * (yy - cy) + cos * (xx - cx) + cx
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    out = img[yi, xi]
    return jnp.where(valid, out, jnp.zeros((), img.dtype))


# -- gather-free batched rotation (Paeth 3-shear) ---------------------------
#
# TPU gathers run ~20 ns/element, so rotating a 24x256^2 batch by per-sample
# angles via index gathers costs ~35-50 ms (measured). The same rotation
# decomposes into three axis-aligned integer shears (Paeth 1986); each shear
# is "shift row/column i by s[i]", realized as a static Python loop over the
# |s| range of jnp.roll + select — pure contiguous copies and VPU selects,
# no gathers. Angles are integers in [-20, 20) (``dataset.py:418``:
# np.random.randint(-20, 20)), so the shift tables are static constants.

_MAX_ANGLE = 20


def _shear_tables(h: int, w: int):
    """Static per-angle integer shift vectors for the three shears.
    Returns (row_shift (40, h), col_shift (40, w)) as numpy int32; shear 1
    and 3 share row_shift."""
    angles = np.arange(-_MAX_ANGLE, _MAX_ANGLE)
    phi = angles * np.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ii = np.arange(h) - cy
    jj = np.arange(w) - cx
    a = -np.tan(phi / 2.0)[:, None]  # (40, 1)
    b = np.sin(phi)[:, None]
    row = np.round(a * ii[None, :]).astype(np.int32)      # (40, h)
    col = np.round(b * jj[None, :]).astype(np.int32)      # (40, w)
    return row, col


def _cyclic_shift(arrs, s, axis):
    """Per-row/column cyclic shift: out[..., j] = a[..., (j + s) mod N]
    along ``axis`` (2 = shift columns, amount per (b, i); 1 = shift rows,
    amount per (b, j)). Binary decomposition of the shift amount — one
    conditional roll per bit, ceil(log2 N) full-array passes instead of one
    pass per distinct shift value."""
    n = arrs[0].shape[axis]
    t = jnp.mod(s, n)
    bit = 1
    while bit < n:
        use = (t & bit) != 0                          # (B, H) or (B, W)
        use = use[:, :, None] if axis == 2 else use[:, None, :]
        arrs = [jnp.where(use, jnp.roll(a, -bit, axis=axis), a)
                for a in arrs]
        bit <<= 1
    return arrs


def _shift_cols(arrs, valids, s, max_s):
    """out[b, i, j] = arr[b, i, j + s[b, i]] with zero fill (horizontal
    shear). ``arrs``: tuple of (B, H, W); ``valids``: running validity mask
    (B, H, W) sheared alongside; ``s``: (B, H) int32 in [-max_s, max_s]."""
    del max_s  # bounded shifts no longer needed: log2(W) passes regardless
    w = arrs[0].shape[2]
    j_s = jnp.arange(w)[None, None, :] + s[:, :, None]   # (B, H, W)
    inb = (j_s >= 0) & (j_s < w)
    shifted = _cyclic_shift(list(arrs) + [valids], s, axis=2)
    outs = [jnp.where(inb, a, jnp.zeros((), a.dtype)) for a in shifted[:-1]]
    return outs, inb & shifted[-1]


def _shift_rows(arrs, valids, s, max_s):
    """out[b, i, j] = arr[b, i + s[b, j], j] with zero fill (vertical
    shear). ``s``: (B, W) int32."""
    del max_s
    h = arrs[0].shape[1]
    i_s = jnp.arange(h)[None, :, None] + s[:, None, :]   # (B, H, W)
    inb = (i_s >= 0) & (i_s < h)
    shifted = _cyclic_shift(list(arrs) + [valids], s, axis=1)
    outs = [jnp.where(inb, a, jnp.zeros((), a.dtype)) for a in shifted[:-1]]
    return outs, inb & shifted[-1]


def _rotate_shear3(img, lab, angle_idx):
    """Batched NN rotation by per-sample integer angles via three shears.
    ``img``/``lab``: (B, H, W); ``angle_idx``: (B,) int32 in [0, 40)
    (angle = idx - 20 degrees). Zero fill outside the source frame.

    NN-rounding differs from the direct inverse-map on a small fraction of
    pixels (~1-2%, the usual Paeth-vs-direct disagreement on rounding
    boundaries); the result is still an exact-angle nearest rotation and is
    artifact-free. Validity (zero-fill region) is tracked through the
    shears so the border matches the direct method's cval=0."""
    b, h, w = img.shape
    row_np, col_np = _shear_tables(h, w)
    row_t = jnp.asarray(row_np)
    col_t = jnp.asarray(col_np)
    srow = row_t[angle_idx]                       # (B, H)
    scol = col_t[angle_idx]                       # (B, W)
    max_r = int(np.abs(row_np).max())
    max_c = int(np.abs(col_np).max())

    valid = jnp.ones((b, h, w), bool)
    (i1, l1), v1 = _shift_cols((img, lab), valid, srow, max_r)
    (i2, l2), v2 = _shift_rows((i1, l1), v1, scol, max_c)
    (i3, l3), v3 = _shift_cols((i2, l2), v2, srow, max_r)
    zero_i = jnp.zeros((), img.dtype)
    zero_l = jnp.zeros((), lab.dtype)
    return jnp.where(v3, i3, zero_i), jnp.where(v3, l3, zero_l)


def _rotflip_one(img, lab, k, axis):
    return (_flip_axis(_rot90_k(img, k), axis),
            _flip_axis(_rot90_k(lab, k), axis))


def gather_augment(images, labels, indices, rng, augment: bool = True):
    """Jitted batch assembly: gather rows, per-sample augmentation, NHWC
    float32 image + int32 label (collate contract of
    ``cvssl_tpu.data.pipeline``).

    Branch structure mirrors the reference RandomGenerator: if u1 > .5 ->
    rot90+flip; elif u2 > .5 -> rotate U{-20..19} (``dataset.py:415-419``),
    realized batch-wise: every variant is computed densely on the VPU
    (SPMD — per-sample control flow would be select-both-sides under vmap
    anyway) and per-sample selected. Augmentation runs in the storage
    dtypes (bf16 image / uint8 label) and casts once at the end — the ops
    are value-exact in those dtypes and it's ~2.5x less memory traffic."""
    img = images[indices]
    lab = labels[indices]
    if augment:
        b = indices.shape[0]
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        u1 = jax.random.uniform(k1, (b,))
        u2 = jax.random.uniform(k2, (b,))
        k = jax.random.randint(k3, (b,), 0, 4)
        axis = jax.random.randint(k4, (b,), 0, 2)
        aidx = jax.random.randint(k5, (b,), 0, 2 * _MAX_ANGLE)
        rf_i, rf_l = jax.vmap(_rotflip_one)(img, lab, k, axis)
        rot_i, rot_l = _rotate_shear3(img, lab, aidx)
        c1 = (u1 > 0.5)[:, None, None]
        c2 = (u2 > 0.5)[:, None, None]
        img = jnp.where(c1, rf_i, jnp.where(c2, rot_i, img))
        lab = jnp.where(c1, rf_l, jnp.where(c2, rot_l, lab))
    return {"image": img.astype(jnp.float32)[..., None],
            "label": lab.astype(jnp.int32),
            "idx": indices.astype(jnp.int32)}


def _color_jitter_device(rng, img):
    """Grayscale-effective ColorJitter(0.8, 0.8, 0.8, 0.2) on device —
    brightness and contrast in random order, clamped to [0, 1] (matches
    ``transforms.color_jitter``)."""
    k_order, k_b, k_c = jax.random.split(rng, 3)
    bf = jax.random.uniform(k_b, (), minval=0.2, maxval=1.8)
    cf = jax.random.uniform(k_c, (), minval=0.2, maxval=1.8)

    def brightness(x):
        return jnp.clip(x * bf, 0.0, 1.0)

    def contrast(x):
        return jnp.clip(cf * x + (1.0 - cf) * x.mean(), 0.0, 1.0)

    return jax.lax.cond(jax.random.uniform(k_order) < 0.5,
                        lambda x: contrast(brightness(x)),
                        lambda x: brightness(contrast(x)), img)


def _weak_strong_one(img, lab, rng):
    """WeakStrongAugment semantics: weak = rot90(k)+flip of image AND label;
    strong = color jitter of weak (``dataset.py:225-231``)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    k = jax.random.randint(k1, (), 0, 4)
    axis = jax.random.randint(k2, (), 0, 2)
    weak = _flip_axis(_rot90_k(img, k), axis)
    lab_aug = _flip_axis(_rot90_k(lab, k), axis)
    strong = _color_jitter_device(k3, weak)
    return weak, strong, lab_aug


def gather_weak_strong(images, labels, indices, rng):
    img = images[indices].astype(jnp.float32)
    lab = labels[indices].astype(jnp.int32)
    rngs = jax.random.split(rng, indices.shape[0])
    weak, strong, lab_aug = jax.vmap(_weak_strong_one)(img, lab, rngs)
    return {"image": img[..., None], "image_weak": weak[..., None],
            "image_strong": strong[..., None], "label_aug": lab_aug,
            "label": lab_aug, "idx": indices.astype(jnp.int32)}


# ---------------------------------------------------------------------------
# 3D volumes (BraTS recipe: RandomRotFlip + RandomCrop, brats2019.py:80-148)
# ---------------------------------------------------------------------------

class DeviceVolumeStore:
    """All train volumes resident in HBM, padded to a common shape (each at
    least patch-sized, reference pad rule), with per-volume valid extents.
    ``estimated_bytes`` lets the engine fall back to the host pipeline when
    a dataset exceeds HBM headroom."""

    def __init__(self, dataset, patch_size, image_dtype=jnp.bfloat16):
        from cvssl_tpu.data.transforms import _pad_to_size
        n = len(dataset)
        vols, labs, shapes = [], [], []
        for i in range(n):
            s = dataset[i]
            img = _pad_to_size(s["image"].astype(np.float32), patch_size)
            lab = _pad_to_size(s["label"], patch_size)
            vols.append(img)
            labs.append(lab)
            shapes.append(img.shape)
        max_shape = tuple(int(max(sh[i] for sh in shapes)) for i in range(3))
        images = np.zeros((n, *max_shape), np.float32)
        labels = np.zeros((n, *max_shape), np.uint8)
        for i, (v, l) in enumerate(zip(vols, labs)):
            images[i, :v.shape[0], :v.shape[1], :v.shape[2]] = v
            labels[i, :l.shape[0], :l.shape[1], :l.shape[2]] = l
        self.images = jax.device_put(jnp.asarray(images, image_dtype))
        self.labels = jax.device_put(jnp.asarray(labels, jnp.uint8))
        self.shapes = jax.device_put(
            jnp.asarray(np.asarray(shapes, np.int32)))
        self.patch_size = tuple(patch_size)

    @staticmethod
    def estimated_bytes(dataset, patch_size, bytes_per_voxel: int = 3):
        shape = np.maximum(np.asarray(dataset[0]["image"].shape), patch_size)
        return int(len(dataset) * np.prod(shape) * bytes_per_voxel)

    def arrays(self):
        return (self.images, self.labels, self.shapes)

    def batch_fn(self, arrays, indices, rng):
        images, labels, shapes = arrays
        return gather_crop_rotflip(images, labels, shapes, indices, rng,
                                   self.patch_size)


def _crop_rotflip_one(img, lab, shape, rng, patch):
    """RandomCrop with a random corner inside the valid extent
    (``brats2019.py:115-117``) then rot90(k)+flip in the first two axes
    (``brats2019.py:131-148``; applied post-crop here — cubic patches keep
    shapes static, documented deviation from the pre-crop order)."""
    kd, kh, kw, kk, kax = jax.random.split(rng, 5)
    d0 = jax.random.randint(kd, (), 0, shape[0] - patch[0] + 1)
    h0 = jax.random.randint(kh, (), 0, shape[1] - patch[1] + 1)
    w0 = jax.random.randint(kw, (), 0, shape[2] - patch[2] + 1)
    ci = jax.lax.dynamic_slice(img, (d0, h0, w0), patch)
    cl = jax.lax.dynamic_slice(lab, (d0, h0, w0), patch)
    k = jax.random.randint(kk, (), 0, 4)
    axis = jax.random.randint(kax, (), 0, 2)

    def rot(x):
        return jax.lax.switch(k, [
            lambda v: v,
            lambda v: jnp.rot90(v, 1, (0, 1)),
            lambda v: jnp.rot90(v, 2, (0, 1)),
            lambda v: jnp.rot90(v, 3, (0, 1))], x)

    def flip(x):
        return jax.lax.cond(axis == 0, lambda v: v[::-1],
                            lambda v: v[:, ::-1], x)

    return flip(rot(ci)), flip(rot(cl))


def gather_crop_rotflip(images, labels, shapes, indices, rng, patch):
    img = images[indices].astype(jnp.float32)
    lab = labels[indices].astype(jnp.int32)
    shp = shapes[indices]
    rngs = jax.random.split(rng, indices.shape[0])
    crop = jax.vmap(lambda i, l, s, r: _crop_rotflip_one(i, l, s, r, patch))
    ci, cl = crop(img, lab, shp, rngs)
    return {"image": ci[..., None], "label": cl,
            "idx": indices.astype(jnp.int32)}
