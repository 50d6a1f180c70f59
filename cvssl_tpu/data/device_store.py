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
    neighbor, zero fill."""
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


def _augment_one(img, lab, rng):
    """The reference RandomGenerator branch structure: if u1 > .5 ->
    rot90+flip; elif u2 > .5 -> rotate U{-20..19} (``dataset.py:415-419``)."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    u1 = jax.random.uniform(k1)
    u2 = jax.random.uniform(k2)
    k = jax.random.randint(k3, (), 0, 4)
    axis = jax.random.randint(k4, (), 0, 2)
    angle = jax.random.randint(k5, (), -20, 20).astype(jnp.float32)

    def rotflip(args):
        i, l = args
        return (_flip_axis(_rot90_k(i, k), axis),
                _flip_axis(_rot90_k(l, k), axis))

    def rotate(args):
        i, l = args
        return (_rotate_nearest(i, angle, False),
                _rotate_nearest(l, angle, True))

    def second(args):
        return jax.lax.cond(u2 > 0.5, rotate, lambda a: a, args)

    return jax.lax.cond(u1 > 0.5, rotflip, second, (img, lab))


def gather_augment(images, labels, indices, rng, augment: bool = True):
    """Jitted batch assembly: gather rows, per-sample augmentation, NHWC
    float32 image + int32 label (collate contract of
    ``cvssl_tpu.data.pipeline``)."""
    img = images[indices].astype(jnp.float32)
    lab = labels[indices].astype(jnp.int32)
    if augment:
        rngs = jax.random.split(rng, indices.shape[0])
        img, lab = jax.vmap(_augment_one)(img, lab, rngs)
    return {"image": img[..., None], "label": lab,
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
