"""Host-side augmentations (numpy/scipy — no torch, no PIL for the hot path).

Parity with the reference transforms in ``code/dataloaders/dataset.py`` and
``code/dataloaders/brats2019.py``. All stochastic transforms take an explicit
``numpy.random.Generator`` (reproducibility is structural here, vs. the
reference's global seeds).

Samples are dicts: 2D images (H, W) float32, labels (H, W) int; 3D images
(D, H, W) float32. Channel axes are added at collate time (NHWC/NDHWC).
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from scipy import ndimage


# ---------------------------------------------------------------------------
# 2D primitives (``dataset.py:79-150``)
# ---------------------------------------------------------------------------

def random_rot_flip(rng: np.random.Generator, image, label=None):
    """rot90 by k ~ U{0..3} then flip along axis ~ U{0,1} (``dataset.py:79``)."""
    k = int(rng.integers(0, 4))
    axis = int(rng.integers(0, 2))
    image = np.flip(np.rot90(image, k), axis=axis).copy()
    if label is not None:
        label = np.flip(np.rot90(label, k), axis=axis).copy()
        return image, label
    return image


def random_rotate(rng: np.random.Generator, image, label):
    """Rotate by U{-20..19} degrees, order=0, no reshape (``dataset.py:92``)."""
    angle = int(rng.integers(-20, 20))
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False)
    return image, label


def zoom_to(image, output_size, order: int = 0):
    """scipy zoom to a fixed output size (``dataset.py:421-422``)."""
    x, y = image.shape
    return ndimage.zoom(image, (output_size[0] / x, output_size[1] / y),
                        order=order)


def color_jitter(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """Grayscale-effective ColorJitter(0.8, 0.8, 0.8, 0.2)
    (``dataset.py:99-107``). For 1-channel data, saturation and hue are
    identities, so this reduces to brightness and contrast in random order,
    each clamped to [0, 1] (torchvision float semantics)."""
    image = image.astype(np.float32)
    ops = [0, 1]
    rng.shuffle(ops)
    for op in ops:
        if op == 0:  # brightness: U(0.2, 1.8) multiplicative
            f = rng.uniform(0.2, 1.8)
            image = np.clip(image * f, 0.0, 1.0)
        else:  # contrast: blend with the grayscale mean
            f = rng.uniform(0.2, 1.8)
            mean = image.mean()
            image = np.clip(f * image + (1.0 - f) * mean, 0.0, 1.0)
    return image


def rand_affine(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """RandomAffine(degrees=90, translate=(.5,.5), shear=30)
    (``dataset.py:109-115``): rotation U(-90,90), translation up to half the
    image, shear-x U(-30,30), nearest interpolation (torchvision default)."""
    h, w = image.shape
    angle = rng.uniform(-90, 90)
    max_dx, max_dy = 0.5 * w, 0.5 * h
    tx = float(np.round(rng.uniform(-max_dx, max_dx)))
    ty = float(np.round(rng.uniform(-max_dy, max_dy)))
    shear = rng.uniform(-30, 30)
    # Build torchvision's inverse affine matrix about the image center.
    rot = math.radians(angle)
    sx = math.radians(shear)
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    # forward: T(center) R(rot) Sh(sx) T(-center) + translation
    a = math.cos(rot - sx) / math.cos(sx)
    b = -math.cos(rot - sx) * math.tan(sx) / math.cos(sx) - math.sin(rot)
    c = math.sin(rot - sx) / math.cos(sx)
    d = -math.sin(rot - sx) * math.tan(sx) / math.cos(sx) + math.cos(rot)
    # matrix maps output coords -> input coords (inverse), row-major [y, x]
    m = np.array([[d, c], [b, a]], dtype=np.float64)
    center = np.array([cy, cx])
    trans = np.array([ty, tx])
    offset = center - m @ (center + trans)
    return ndimage.affine_transform(image, m, offset=offset, order=0,
                                    mode="constant", cval=0.0)


def gaussian_blur(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """GaussianBlur(kernel_size=3), sigma ~ U(0.1, 2.0) (``dataset.py:117``).
    torchvision builds a truncated 3-tap kernel from the Gaussian pdf."""
    sigma = rng.uniform(0.1, 2.0)
    x = np.array([-1.0, 0.0, 1.0])
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    out = ndimage.correlate1d(image, k, axis=0, mode="reflect")
    return ndimage.correlate1d(out, k, axis=1, mode="reflect")


def grid_mask(rng: np.random.Generator, image: np.ndarray, d1: int = 16,
              d2: int = 32, ratio: float = 0.5, rotate: int = 90,
              prob: float = 0.6) -> np.ndarray:
    """GridMask occlusion (``code/gridmask.py:15-107``): a rotated regular
    grid of zeroed squares; d ~ U{d1..d2}, square side ceil(d*ratio)."""
    if rng.uniform() > prob:
        return image
    h, w = image.shape
    d = int(rng.integers(d1, d2 + 1))
    ll = int(math.ceil(d * ratio))
    hh = int(math.ceil(1.5 * max(h, w)))
    mask = np.ones((hh, hh), np.float32)
    st = int(rng.integers(0, d))
    for start in range(st, hh, d):
        mask[start:start + ll, :] = 0
    st = int(rng.integers(0, d))
    for start in range(st, hh, d):
        mask[:, start:start + ll] = 0
    if rotate:
        angle = int(rng.integers(0, rotate))
        mask = ndimage.rotate(mask, angle, order=0, reshape=False)
    off_h = (hh - h) // 2
    off_w = (hh - w) // 2
    return image * mask[off_h:off_h + h, off_w:off_w + w]


# ---------------------------------------------------------------------------
# 2D composite transforms (``dataset.py:196-425``)
# ---------------------------------------------------------------------------

class RandomGenerator:
    """Default train transform (``dataset.py:406-425``): 50% rot/flip, else
    50% rotate ±20°, zoom to patch size (order=0)."""

    def __init__(self, output_size: Sequence[int], rng=None):
        self.output_size = tuple(output_size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        if self.rng.random() > 0.5:
            image, label = random_rot_flip(self.rng, image, label)
        elif self.rng.random() > 0.5:
            image, label = random_rotate(self.rng, image, label)
        image = zoom_to(image, self.output_size).astype(np.float32)
        label = zoom_to(label, self.output_size).astype(np.int32)
        return {"image": image, "label": label}


class RandomGeneratorWeak:
    """'Weak' transform = resize only (``RandomGenerator_w``, ``dataset.py:196``)."""

    def __init__(self, output_size: Sequence[int], rng=None):
        self.output_size = tuple(output_size)

    def __call__(self, sample):
        image = zoom_to(sample["image"], self.output_size).astype(np.float32)
        label = zoom_to(sample["label"], self.output_size).astype(np.int32)
        return {"image": image, "label": label}


class RandomGeneratorStrong:
    """'Strong' transform (``RandomGenerator_s``, ``dataset.py:377-403``):
    geometric (rot/flip | rotate) + zoom + jitter + affine + blur (+ identity
    grayscale)."""

    def __init__(self, output_size: Sequence[int], rng=None):
        self.output_size = tuple(output_size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        if self.rng.random() > 0.5:
            image, label = random_rot_flip(self.rng, image, label)
        elif self.rng.random() > 0.5:
            image, label = random_rotate(self.rng, image, label)
        image = zoom_to(image, self.output_size).astype(np.float32)
        label = zoom_to(label, self.output_size).astype(np.int32)
        image = color_jitter(self.rng, image)
        image = rand_affine(self.rng, image)
        image = gaussian_blur(self.rng, image).astype(np.float32)
        return {"image": image, "label": label}


class WeakStrongAugment:
    """FixMatch transform (``dataset.py:211-245``): resize; weak = rot/flip;
    strong = color jitter ON TOP of weak. Returns image / image_weak /
    image_strong / label_aug."""

    def __init__(self, output_size: Sequence[int], rng=None):
        self.output_size = tuple(output_size)
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image = zoom_to(sample["image"], self.output_size).astype(np.float32)
        label = zoom_to(sample["label"], self.output_size).astype(np.int32)
        image_weak, label = random_rot_flip(self.rng, image, label)
        image_strong = color_jitter(self.rng, image_weak).astype(np.float32)
        return {"image": image, "image_weak": image_weak.astype(np.float32),
                "image_strong": image_strong, "label_aug": label,
                "label": label}


# ---------------------------------------------------------------------------
# 3D transforms (``brats2019.py:48-188``)
# ---------------------------------------------------------------------------

def _pad_to_size(arr, output_size, extra: int = 3):
    """Reference padding rule: if any dim <= target, pad all dims by
    (target-dim)//2 + 3 on both sides (``brats2019.py:97-108``)."""
    if (arr.shape[0] <= output_size[0] or arr.shape[1] <= output_size[1]
            or arr.shape[2] <= output_size[2]):
        pads = [max((output_size[i] - arr.shape[i]) // 2 + extra, 0)
                for i in range(3)]
        arr = np.pad(arr, [(p, p) for p in pads], mode="constant",
                     constant_values=0)
    return arr


class CenterCrop:
    """(``brats2019.py:48-77``)"""

    def __init__(self, output_size: Sequence[int]):
        self.output_size = tuple(output_size)

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        image = _pad_to_size(image, self.output_size)
        label = _pad_to_size(label, self.output_size)
        starts = [int(round((image.shape[i] - self.output_size[i]) / 2.0))
                  for i in range(3)]
        sl = tuple(slice(s, s + o) for s, o in zip(starts, self.output_size))
        return {"image": image[sl], "label": label[sl]}


class RandomCrop:
    """(``brats2019.py:80-128``)"""

    def __init__(self, output_size: Sequence[int], with_sdf: bool = False,
                 rng=None):
        self.output_size = tuple(output_size)
        self.with_sdf = with_sdf
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        image = _pad_to_size(image, self.output_size)
        label = _pad_to_size(label, self.output_size)
        starts = [int(self.rng.integers(0, image.shape[i] - self.output_size[i]))
                  for i in range(3)]
        sl = tuple(slice(s, s + o) for s, o in zip(starts, self.output_size))
        out = {"image": image[sl], "label": label[sl]}
        if self.with_sdf:
            sdf = _pad_to_size(sample["sdf"], self.output_size)
            out["sdf"] = sdf[sl]
        return out


class RandomRotFlip3D:
    """rot90 in the first two axes + flip along axis 0/1 (``brats2019.py:131``)."""

    def __init__(self, rng=None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        k = int(self.rng.integers(0, 4))
        axis = int(self.rng.integers(0, 2))
        image = np.flip(np.rot90(image, k), axis=axis).copy()
        label = np.flip(np.rot90(label, k), axis=axis).copy()
        return {"image": image, "label": label}


class RandomNoise3D:
    """clip(sigma*N(0,1), ±2 sigma) + mu additive noise (``brats2019.py:150``)."""

    def __init__(self, mu: float = 0.0, sigma: float = 0.1, rng=None):
        self.mu, self.sigma = mu, sigma
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image = sample["image"]
        noise = np.clip(self.sigma * self.rng.standard_normal(image.shape),
                        -2 * self.sigma, 2 * self.sigma) + self.mu
        return {"image": image + noise, "label": sample["label"]}


class CreateOnehotLabel:
    """(``brats2019.py:164-175``) — channel-LAST onehot here (NDHWC)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def __call__(self, sample):
        label = sample["label"]
        onehot = np.stack([(label == i).astype(np.float32)
                           for i in range(self.num_classes)], axis=-1)
        return {**sample, "onehot_label": onehot}


class Compose:
    """Sequential transform composition (torchvision.transforms.Compose
    equivalent, ``train_fully_supervised_2D.py:76-78``)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample
