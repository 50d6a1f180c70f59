"""CTAugment (control-theory augmentation, FixMatch) — host-side, PIL.

Provenance: CTAugment originates in Google Research's FixMatch
(https://github.com/google-research/fixmatch, Apache License 2.0,
Copyright 2019 Google LLC); the reference vendors that file with its
Apache-2.0 header intact (``code/augmentations/ctaugment.py:1-16``).
This module is a behavioral reimplementation of the same algorithm —
the op registry, bin counts, and rate-update constants match the
Apache-2.0 original by necessity.

Behavioral parity with ``code/augmentations/ctaugment.py`` and the
``CTATransform`` in ``code/dataloaders/dataset.py:153-190``:

* op registry with binned magnitudes and learned per-bin rates;
* the FIRST 9 registered ops are the 'strong' pool, the rest 'weak'
  (``ctaugment.py:58-62``);
* ``policy(probe, weak)`` samples depth ops; ``update_rates`` EMA-updates
  bin rates from a proximity score;
* serializable state (decay/depth/th/rates) for checkpointing
  (``augmentations/__init__.py:7-21``).

Inputs are float arrays in [0, 1]; they are routed through uint8 PIL 'L'
images exactly like torchvision ToPILImage does in the reference pipeline.
"""
from __future__ import annotations

import random
from collections import OrderedDict, namedtuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

OPS = OrderedDict()
OP = namedtuple("OP", ("f", "bins"))


def register(*bins):
    def wrap(f):
        OPS[f.__name__] = OP(f, bins)
        return f
    return wrap


def _enhance(x, enhancer, level):
    return enhancer(x).enhance(0.1 + 1.9 * level)


def _blend_op(x, op, level):
    return Image.blend(x, op(x), level)


def _blend_filter(x, filt, level):
    return Image.blend(x, x.filter(filt), level)


# --- strong pool (first 9 registrations) -----------------------------------

@register(17)
def autocontrast(x, level):
    return _blend_op(x, ImageOps.autocontrast, level)


@register(17)
def brightness(x, level):
    return _enhance(x, ImageEnhance.Brightness, level)


@register(17)
def color(x, level):
    return _enhance(x, ImageEnhance.Color, level)


@register(17)
def contrast(x, level):
    return _enhance(x, ImageEnhance.Contrast, level)


@register(17)
def equalize(x, level):
    return _blend_op(x, ImageOps.equalize, level)


@register(17)
def smooth(x, level):
    return _blend_filter(x, ImageFilter.SMOOTH, level)


@register(17)
def blur(x, level):
    return _blend_filter(x, ImageFilter.BLUR, level)


@register(17)
def sharpness(x, level):
    return _enhance(x, ImageEnhance.Sharpness, level)


@register(17)
def cutout(x, level):
    """Zero a square at a random lower-right-biased location
    (``ctaugment.py:185-199``)."""
    size = 1 + int(level * min(x.size) * 0.499)
    w, h = x.size
    hl = np.random.randint(low=h // 2, high=h)
    wl = np.random.randint(low=h // 2, high=w)
    upper = (max(0, hl - size // 2), max(0, wl - size // 2))
    lower = (min(h, hl + size // 2), min(w, wl + size // 2))
    x = x.copy()
    px = x.load()
    for i in range(upper[0], lower[0]):
        for j in range(upper[1], lower[1]):
            px[i, j] = 0
    return x


# --- weak pool ---------------------------------------------------------------

@register()
def identity(x):
    return x


@register(17, 6)
def rescale(x, scale, method):
    s = x.size
    scale *= 0.25
    crop = (scale * s[0], scale * s[1], s[0] * (1 - scale), s[1] * (1 - scale))
    methods = (Image.LANCZOS, Image.BICUBIC, Image.BILINEAR, Image.BOX,
               Image.HAMMING, Image.NEAREST)
    return x.crop(crop).resize(x.size, methods[int(method * 5.99)])


@register(17)
def rotate(x, angle):
    return x.rotate(int(np.round((2 * angle - 1) * 45)))


@register(17)
def shear_x(x, shear):
    shear = (2 * shear - 1) * 0.3
    return x.transform(x.size, Image.AFFINE, (1, shear, 0, 0, 1, 0))


@register(17)
def shear_y(x, shear):
    shear = (2 * shear - 1) * 0.3
    return x.transform(x.size, Image.AFFINE, (1, 0, 0, shear, 1, 0))


@register(17)
def translate_x(x, delta):
    delta = (2 * delta - 1) * 0.3
    return x.transform(x.size, Image.AFFINE, (1, 0, delta, 0, 1, 0))


@register(17)
def translate_y(x, delta):
    delta = (2 * delta - 1) * 0.3
    return x.transform(x.size, Image.AFFINE, (1, 0, 0, 0, 1, delta))


NUM_STRONG_OPS = 9


class CTAugment:
    """(``ctaugment.py:40-122``)"""

    def __init__(self, depth: int = 2, th: float = 0.85, decay: float = 0.99):
        self.decay = decay
        self.depth = depth
        self.th = th
        self.random_depth_weak = 2
        self.random_depth_strong = 2
        self.rates = {k: tuple(np.ones(b, "f") for b in op.bins)
                      for k, op in OPS.items()}

    def rate_to_p(self, rate):
        p = rate + (1 - self.decay)
        p = p / p.max()
        p = p.copy()
        p[p < self.th] = 0
        return p

    def stats(self) -> str:
        """Human-readable learned-rate table (``ctaugment.py:99-110``)."""
        return "\n".join(
            "%-16s    %s" % (
                k,
                " / ".join(" ".join("%.2f" % x for x in self.rate_to_p(rate))
                           for rate in self.rates[k]))
            for k in sorted(OPS.keys()))

    def policy(self, probe: bool, weak: bool):
        keys = list(OPS.keys())
        kl = keys[NUM_STRONG_OPS:] if weak else keys[:NUM_STRONG_OPS]
        depth = self.random_depth_weak if weak else self.random_depth_strong
        v = []
        if probe:
            for _ in range(depth):
                k = random.choice(kl)
                rnd = np.random.uniform(0, 1, len(self.rates[k]))
                v.append(OP(k, rnd.tolist()))
            return v
        for _ in range(depth):
            vt = []
            k = random.choice(kl)
            rnd = np.random.uniform(0, 1, len(self.rates[k]))
            for r, bin_ in zip(rnd, self.rates[k]):
                p = self.rate_to_p(bin_)
                value = np.random.choice(p.shape[0], p=p / p.sum())
                vt.append((value + r) / p.shape[0])
            v.append(OP(k, vt))
        return v

    def update_rates(self, policy, proximity: float):
        for k, bins in policy:
            for p, rate in zip(bins, self.rates[k]):
                idx = int(p * len(rate) * 0.999)
                rate[idx] = rate[idx] * self.decay + proximity * (1 - self.decay)

    # serialization (StorableCTAugment parity)
    def state_dict(self):
        return OrderedDict((k, getattr(self, k))
                           for k in ["decay", "depth", "th", "rates"])

    def load_state_dict(self, state):
        for k in ["decay", "depth", "th", "rates"]:
            assert k in state, f"{k} not in {list(state)}"
            setattr(self, k, state[k])


def cta_apply(pil_img: Image.Image, ops):
    if ops is None:
        return pil_img
    for op, args in ops:
        pil_img = OPS[op].f(pil_img, *args)
    return pil_img


def _to_pil(arr: np.ndarray) -> Image.Image:
    """float [0,1] -> uint8 'L' (torchvision ToPILImage float semantics)."""
    return Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8),
                           mode="L")


class CTATransform:
    """(``dataset.py:153-190``): resize (order 0) -> weak ops on image AND
    label -> strong ops on the weak image. Returns float image arrays and an
    int label."""

    def __init__(self, output_size, cta: CTAugment):
        self.output_size = tuple(output_size)
        self.cta = cta

    def __call__(self, sample, ops_weak, ops_strong):
        from scipy.ndimage import zoom
        image, label = sample["image"], sample["label"]
        x, y = image.shape
        image = zoom(image, (self.output_size[0] / x, self.output_size[1] / y),
                     order=0)
        label = zoom(label, (self.output_size[0] / x, self.output_size[1] / y),
                     order=0)
        img_weak = cta_apply(_to_pil(image), ops_weak)
        img_strong = cta_apply(img_weak, ops_strong)
        lab_pil = Image.fromarray(label.astype(np.uint8), mode="L")
        lab_aug = cta_apply(lab_pil, ops_weak)
        return {
            "image": image.astype(np.float32),
            "image_weak": np.asarray(img_weak, np.float32) / 255.0,
            "image_strong": np.asarray(img_strong, np.float32) / 255.0,
            "label_aug": np.asarray(lab_aug, np.int32),
            "label": label.astype(np.int32),
        }
