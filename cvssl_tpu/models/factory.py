"""Model registries — TPU equivalents of the reference factories
(``code/networks/net_factory.py:77``, ``code/networks/net_factory_3d.py:10``).

Unlike the reference (which runs argparse at import time — SURVEY §8), these
are plain dict registries. Each entry maps a net_type string to a constructor
``(in_chns, class_num, **kwargs) -> flax Module``.
"""
from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

_REGISTRY_2D: Dict[str, Callable[..., nn.Module]] = {}
_REGISTRY_3D: Dict[str, Callable[..., nn.Module]] = {}


def register_2d(name: str):
    def deco(fn):
        _REGISTRY_2D[name] = fn
        return fn
    return deco


def register_3d(name: str):
    def deco(fn):
        _REGISTRY_3D[name] = fn
        return fn
    return deco


def net_factory(net_type: str = "unet", in_chns: int = 1,
                class_num: int = 3, **kwargs) -> nn.Module:
    """2D registry (reference ``net_factory.py:77-107``)."""
    _ensure_registered()
    if net_type not in _REGISTRY_2D:
        raise ValueError(
            f"unknown 2D net {net_type!r}; available: {sorted(_REGISTRY_2D)}")
    return _REGISTRY_2D[net_type](in_chns=in_chns, class_num=class_num,
                                  **kwargs)


def net_factory_3d(net_type: str = "unet_3D", in_chns: int = 1,
                   class_num: int = 2, **kwargs) -> nn.Module:
    """3D registry (reference ``net_factory_3d.py:10-41``)."""
    _ensure_registered()
    if net_type not in _REGISTRY_3D:
        raise ValueError(
            f"unknown 3D net {net_type!r}; available: {sorted(_REGISTRY_3D)}")
    return _REGISTRY_3D[net_type](in_chns=in_chns, class_num=class_num,
                                  **kwargs)


def available_2d():
    _ensure_registered()
    return sorted(_REGISTRY_2D)


def available_3d():
    _ensure_registered()
    return sorted(_REGISTRY_3D)


_registered = False


def _ensure_registered():
    """Populate registries lazily to avoid import cycles."""
    global _registered
    if _registered:
        return
    _registered = True

    from cvssl_tpu.models import unet, discriminator, projector

    _REGISTRY_2D.update({
        "unet": lambda in_chns, class_num, **kw: unet.UNet(
            in_chns=in_chns, num_classes=class_num, **kw),
        "unet_cct": lambda in_chns, class_num, **kw: unet.UNetCCT(
            in_chns=in_chns, num_classes=class_num, **kw),
        "unet_ds": lambda in_chns, class_num, **kw: unet.UNetDS(
            in_chns=in_chns, num_classes=class_num, **kw),
        "unet_urpc": lambda in_chns, class_num, **kw: unet.UNetURPC(
            in_chns=in_chns, num_classes=class_num, **kw),
        "unet_feature": lambda in_chns, class_num, **kw: unet.UNetFeature(
            in_chns=in_chns, num_classes=class_num, **kw),
        "discriminator": lambda in_chns, class_num, **kw:
            discriminator.FCDiscriminator(num_classes=class_num, **kw),
        "projector": lambda in_chns, class_num, **kw:
            projector.Projector(**kw),
        "classifier": lambda in_chns, class_num, **kw:
            projector.Classifier(**kw),
    })

    # Optional families — registered if their modules import cleanly.
    try:
        from cvssl_tpu.models import swin_unet
        _REGISTRY_2D["ViT_Seg"] = lambda in_chns, class_num, **kw: \
            swin_unet.SwinUnet(num_classes=class_num, **kw)
        _REGISTRY_2D["swin_unet"] = _REGISTRY_2D["ViT_Seg"]
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import enet
        _REGISTRY_2D["enet"] = lambda in_chns, class_num, **kw: enet.ENet(
            in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import pnet
        _REGISTRY_2D["pnet"] = lambda in_chns, class_num, **kw: pnet.PNet2D(
            in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import nnunet
        _REGISTRY_2D["nnUNet"] = lambda in_chns, class_num, **kw: \
            nnunet.GenericUNet2D(in_chns=in_chns, num_classes=class_num, **kw)
        _REGISTRY_3D["nnUNet"] = lambda in_chns, class_num, **kw: \
            nnunet.GenericUNet3D(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import efficientunet
        _REGISTRY_2D["efficient_unet"] = lambda in_chns, class_num, **kw: \
            efficientunet.EffiUNet(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import resunet
        _REGISTRY_2D["preunet"] = lambda in_chns, class_num, **kw: \
            resunet.PreUNet(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass

    try:
        from cvssl_tpu.models import unet3d
        _REGISTRY_3D["unet_3D"] = lambda in_chns, class_num, **kw: \
            unet3d.UNet3D(in_chns=in_chns, num_classes=class_num, **kw)
        _REGISTRY_3D["unet_3D_dv_semi"] = lambda in_chns, class_num, **kw: \
            unet3d.UNet3DDeepSup(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import vnet
        _REGISTRY_3D["vnet"] = lambda in_chns, class_num, **kw: vnet.VNet(
            in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import voxresnet
        _REGISTRY_3D["voxresnet"] = lambda in_chns, class_num, **kw: \
            voxresnet.VoxResNet(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import attention_unet
        _REGISTRY_3D["attention_unet"] = lambda in_chns, class_num, **kw: \
            attention_unet.AttentionUNet3D(in_chns=in_chns,
                                           num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import unetr
        _REGISTRY_3D["unetr"] = lambda in_chns, class_num, **kw: unetr.UNETR(
            in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import swin_unetr
        _REGISTRY_3D["swinunetr"] = lambda in_chns, class_num, **kw: \
            swin_unetr.SwinUNETR(in_chns=in_chns, num_classes=class_num, **kw)
    except ImportError:
        pass
    try:
        from cvssl_tpu.models import discriminator as disc
        _REGISTRY_3D["discriminator"] = lambda in_chns, class_num, **kw: \
            disc.FC3DDiscriminator(num_classes=class_num, **kw)
    except ImportError:
        pass
