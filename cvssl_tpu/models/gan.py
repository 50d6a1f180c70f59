"""pix2pix/CycleGAN-style GAN scaffolding (Flax, NHWC) — parity with the
reference's ``code/networks/networks_other.py`` GAN section: ``GANLoss``
(:260-293), ``ResnetGenerator``/``ResnetBlock`` (:301-395), ``UnetGenerator``
/``UnetSkipConnectionBlock`` (:400-478), ``NLayerDiscriminator`` (:481-529),
``get_norm_layer`` (:78-87) and the ``define_G``/``define_D`` factories
(:143-185).

No reference trainer instantiates any of this (dead upstream — the live
adversarial path uses ``discriminator.py``); it is ported for surface
completeness so a user of ``networks_other`` finds the same tools here.

Upstream breakage NOT reproduced: the reference ``ResnetGenerator``
(:301-352) is mangled as shipped — its ``__init__`` is truncated mid-loop
and a stray ``forward`` body is spliced into it, so the class cannot even be
constructed. Here it is the standard Johnson-style generator the
(copy-paste-damaged) original clearly was.

TPU notes: norms select BatchNorm(affine)/"InstanceNorm"(no affine)/none as
upstream; reflect/replicate padding run as ``jnp.pad`` before a VALID conv
(XLA fuses the pad); transpose-convs use ``nn.ConvTranspose`` which XLA
lowers to MXU convs.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# GANLoss (networks_other.py:260-293)
# ---------------------------------------------------------------------------

def gan_loss(pred: jnp.ndarray, target_is_real: bool,
             use_lsgan: bool = True, real_label: float = 1.0,
             fake_label: float = 0.0) -> jnp.ndarray:
    """LSGAN (MSE-vs-constant) or vanilla (BCE-vs-constant) GAN loss.

    The reference class only caches the constant target tensor (a torch-ism);
    functionally it is ``MSELoss(pred, target)`` / ``BCELoss(pred, target)``
    against a broadcast constant, which is what this computes. Like upstream,
    the vanilla branch expects probabilities (the discriminator's
    ``use_sigmoid=True`` output), not logits.
    """
    target = jnp.float32(real_label if target_is_real else fake_label)
    pred = pred.astype(jnp.float32)
    if use_lsgan:
        return jnp.mean((pred - target) ** 2)
    eps = 1e-12  # BCE on probabilities, clamped like torch's BCELoss
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


# ---------------------------------------------------------------------------
# Norm selection (networks_other.py:78-87)
# ---------------------------------------------------------------------------

_NORMS = ("batch", "instance", "none")


def _use_bias(norm: str) -> bool:
    """torch convs skip their bias only when followed by InstanceNorm
    (``use_bias = norm_layer.func == nn.InstanceNorm2d``)."""
    return norm == "instance"


class _Norm(nn.Module):
    """batch: BatchNorm(affine); instance: InstanceNorm(no affine);
    none: identity."""
    norm: str

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5)(x)
        if self.norm == "instance":
            # InstanceNorm2d(affine=False): per-sample, per-channel over H,W
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm == "none":
            return x
        raise NotImplementedError(f"norm {self.norm!r}; options {_NORMS}")


def _pad2d(x, p: int, mode: str):
    """reflect / replicate(edge) / zero spatial padding, NHWC."""
    if p == 0:
        return x
    widths = ((0, 0), (p, p), (p, p), (0, 0))
    if mode == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, widths, mode="edge")
    if mode == "zero":
        return jnp.pad(x, widths)
    raise NotImplementedError(f"padding {mode!r}")


# ---------------------------------------------------------------------------
# ResnetGenerator (networks_other.py:301-395, de-mangled — see module doc)
# ---------------------------------------------------------------------------

class ResnetBlock(nn.Module):
    """pad-conv3-norm-relu-[dropout]-pad-conv3-norm + residual
    (``networks_other.py:354-395``)."""
    dim: int
    padding_type: str = "reflect"
    norm: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bias = _use_bias(self.norm)
        h = _pad2d(x, 1, self.padding_type)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=bias)(h)
        h = _Norm(self.norm)(h, train=train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _pad2d(h, 1, self.padding_type)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=bias)(h)
        h = _Norm(self.norm)(h, train=train)
        return x + h


class ResnetGenerator(nn.Module):
    """Johnson-style generator: 7x7 stem, 2 stride-2 downs, ``n_blocks``
    residual blocks, 2 transpose-conv ups, 7x7 head + tanh."""
    output_nc: int
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.n_blocks >= 0
        bias = _use_bias(self.norm)
        h = _pad2d(x, 3, "reflect")
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=bias)(h)
        h = nn.relu(_Norm(self.norm)(h, train=train))
        for i in range(2):  # n_downsampling = 2
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        use_bias=bias)(h)
            h = nn.relu(_Norm(self.norm)(h, train=train))
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.padding_type, self.norm,
                            self.use_dropout)(h, train=train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=bias)(h)
            h = nn.relu(_Norm(self.norm)(h, train=train))
        h = _pad2d(h, 3, "reflect")
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


# ---------------------------------------------------------------------------
# UnetGenerator (networks_other.py:400-478)
# ---------------------------------------------------------------------------

class UnetSkipConnectionBlock(nn.Module):
    """X --identity-- cat(X, up(sub(down(X)))) (``networks_other.py:427``).
    ``inner`` is a callable building the nested submodule (or None at the
    innermost level)."""
    outer_nc: int
    inner_nc: int
    inner: Optional[Any] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bias = _use_bias(self.norm)
        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.inner_nc, (4, 4), strides=2, padding=1,
                    use_bias=bias)(h)
        if not (self.outermost or self.innermost):
            h = _Norm(self.norm)(h, train=train)
        if self.inner is not None:
            h = self.inner(h, train=train)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.outer_nc, (4, 4), strides=(2, 2),
                             padding="SAME",
                             use_bias=bias or self.outermost)(h)
        if self.outermost:
            return jnp.tanh(h)
        h = _Norm(self.norm)(h, train=train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """``num_downs`` nested skip blocks; 128px needs 7, 256px needs 8."""
    output_nc: int
    num_downs: int
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block = UnetSkipConnectionBlock(self.ngf * 8, self.ngf * 8,
                                        innermost=True, norm=self.norm)
        for _ in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(self.ngf * 8, self.ngf * 8,
                                            inner=block, norm=self.norm,
                                            use_dropout=self.use_dropout)
        for mult in (4, 2, 1):
            block = UnetSkipConnectionBlock(self.ngf * mult,
                                            self.ngf * mult * 2,
                                            inner=block, norm=self.norm)
        block = UnetSkipConnectionBlock(self.output_nc, self.ngf, inner=block,
                                        outermost=True, norm=self.norm)
        return block(x, train=train)


# ---------------------------------------------------------------------------
# NLayerDiscriminator (networks_other.py:481-529)
# ---------------------------------------------------------------------------

class NLayerDiscriminator(nn.Module):
    """PatchGAN: k4 s2 conv ladder (ndf doubling, capped at 8x), one k4 s1
    level, 1-channel patch logit map; optional sigmoid."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bias = _use_bias(self.norm)
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1)(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=bias)(h)
            h = nn.leaky_relu(_Norm(self.norm)(h, train=train), 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=bias)(h)
        h = nn.leaky_relu(_Norm(self.norm)(h, train=train), 0.2)
        h = nn.Conv(1, (4, 4), strides=1, padding=1)(h)
        return jax.nn.sigmoid(h) if self.use_sigmoid else h


# ---------------------------------------------------------------------------
# define_G / define_D (networks_other.py:143-185)
# ---------------------------------------------------------------------------

def define_g(output_nc: int, ngf: int, which_model_netG: str,
             norm: str = "batch", use_dropout: bool = False) -> nn.Module:
    if which_model_netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, norm, use_dropout, n_blocks=9)
    if which_model_netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, norm, use_dropout, n_blocks=6)
    if which_model_netG == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm, use_dropout)
    if which_model_netG == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm, use_dropout)
    raise NotImplementedError(
        f"Generator model name [{which_model_netG}] is not recognized")


def define_d(ndf: int, which_model_netD: str, n_layers_d: int = 3,
             norm: str = "batch", use_sigmoid: bool = False) -> nn.Module:
    if which_model_netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm, use_sigmoid)
    if which_model_netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_d, norm, use_sigmoid)
    raise NotImplementedError(
        f"Discriminator model name [{which_model_netD}] is not recognized")
