"""Run the ACTUAL reference training scripts (torch, CPU) inside this
environment, for training-trajectory parity tests.

The reference imports several packages that don't exist in this image
(medpy, torchvision, yacs, timm, efficientnet_pytorch, nibabel, SimpleITK,
tensorboardX-as-recorder). Everything the mean-teacher / fully-supervised
code paths actually EXECUTE is provided faithfully:
  - medpy.metric.binary.{dc, jc, hd95, asd, ravd} -> cvssl_tpu.ops.metrics
    (already parity-tested against medpy's definitions)
  - timm.models.layers.{DropPath, to_2tuple, trunc_normal_} -> standard
    implementations (trunc_normal_ is torch.nn.init's)
  - yacs CfgNode -> a minimal attr-dict with clone/freeze/merge_from_file
  - tensorboardX.SummaryWriter -> an in-memory scalar recorder (this is how
    the harness reads the reference's per-iteration losses)
Modules only touched by code paths we never run (torchvision transforms,
EfficientNet constructors, NIfTI writers) are import-shape-compatible stubs
that raise if actually used.

This file contains NO reference code; it imports the reference read-only.
"""
from __future__ import annotations

import importlib
import os
import sys
import types

REFERENCE = "/root/reference/code"


class _ScalarRecorder:
    """tensorboardX.SummaryWriter replacement that records add_scalar calls."""

    instances = []

    def __init__(self, logdir=None, *a, **k):
        self.logdir = logdir
        self.scalars = {}  # tag -> list[(step, value)]
        _ScalarRecorder.instances.append(self)

    def add_scalar(self, tag, value, step=None):
        self.scalars.setdefault(tag, []).append((step, float(value)))

    def add_image(self, *a, **k):
        pass

    def add_scalars(self, tag, values, step=None):
        for k, v in values.items():
            self.add_scalar(f"{tag}/{k}", v, step)

    def flush(self):
        pass

    def close(self):
        pass


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _FailOnUse:
    """Import-shape placeholder for classes the exercised paths never
    construct."""

    def __init__(self, *a, **k):
        raise RuntimeError(
            f"{type(self).__name__} is a parity-harness stub — this "
            "reference code path isn't exercised here")


def install_stubs():
    if "medpy" in sys.modules and hasattr(sys.modules["medpy"], "metric"):
        return  # already installed

    import torch
    import torch.nn as nn

    # -- medpy: real metric implementations ------------------------------
    from cvssl_tpu.ops import metrics as _m
    binary = _module("medpy.metric.binary", dc=_m.dc, jc=_m.jc,
                     hd95=_m.hd95, asd=_m.asd, ravd=_m.ravd, hd=_m.hd95)
    metric = _module("medpy.metric", binary=binary)
    _module("medpy", metric=metric)

    # -- tensorboardX recorder -------------------------------------------
    _module("tensorboardX", SummaryWriter=_ScalarRecorder)

    # -- timm layers ------------------------------------------------------
    from torch.nn.init import trunc_normal_

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            mask.floor_()
            return x.div(keep) * mask

    layers = _module("timm.models.layers", DropPath=DropPath,
                     to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)
    models = _module("timm.models", layers=layers)
    _module("timm", models=models)

    # -- yacs mini CfgNode ------------------------------------------------
    import yaml

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            import copy
            return copy.deepcopy(self)

        def freeze(self):
            pass

        def defrost(self):
            pass

        def merge_from_file(self, path):
            with open(path) as f:
                _merge(self, yaml.safe_load(f))

        def merge_from_list(self, opts):
            opts = list(opts or [])
            for key, val in zip(opts[0::2], opts[1::2]):
                node, *rest = key.split(".")
                cur = self
                for part in [node] + rest[:-1]:
                    cur = cur[part]
                cur[rest[-1] if rest else node] = val

    def _merge(cn, d):
        for k, v in (d or {}).items():
            if isinstance(v, dict):
                sub = cn.get(k)
                if not isinstance(sub, CfgNode):
                    sub = CfgNode()
                _merge(sub, v)
                cn[k] = sub
            else:
                cn[k] = v

    config_mod = _module("yacs.config", CfgNode=CfgNode)
    _module("yacs", config=config_mod)

    # -- torchvision ------------------------------------------------------
    class Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, sample):
            for op in self.ops:
                sample = op(sample)
            return sample

    class _ToTensor(_FailOnUse):
        pass

    class _ColorJitter(_FailOnUse):
        pass

    class _RandomAffine(_FailOnUse):
        pass

    transforms = _module("torchvision.transforms", Compose=Compose,
                         ToTensor=_ToTensor, ColorJitter=_ColorJitter,
                         RandomAffine=_RandomAffine)

    class _ResNet(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class _DenseNet(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    resnet = _module("torchvision.models.resnet", ResNet=_ResNet,
                     BasicBlock=object, Bottleneck=object)
    densenet = _module("torchvision.models.densenet", DenseNet=_DenseNet)
    tv_models = _module("torchvision.models", resnet=resnet,
                        densenet=densenet)
    def _make_grid(tensor, nrow=8, normalize=False, **k):
        # functional fake: the recorder writer ignores images; the 3D
        # trainers call this on the logging path every 20 iters
        return tensor.reshape(-1)[:12].reshape(3, 2, 2) \
            if tensor.numel() >= 12 else tensor

    tv_utils = _module("torchvision.utils", make_grid=_make_grid)
    _module("torchvision", transforms=transforms, models=tv_models,
            utils=tv_utils)

    # -- efficientnet_pytorch ---------------------------------------------
    class EfficientNet(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        @classmethod
        def from_name(cls, *a, **k):
            raise RuntimeError("EfficientNet stub — not exercised")

    class _AnyURL(dict):
        def __getitem__(self, k):
            return f"stub://{k}"

    en_utils = _module("efficientnet_pytorch.utils",
                       get_model_params=lambda *a, **k: (None, None),
                       url_map=_AnyURL())
    _module("efficientnet_pytorch", EfficientNet=EfficientNet,
            utils=en_utils)

    # -- skimage (reference uses measure.label for CC postprocessing) -----
    from scipy import ndimage as _ndi

    def _sk_label(x, *a, **k):
        lab, _ = _ndi.label(x)
        return lab

    measure = _module("skimage.measure", label=_sk_label,
                      regionprops=_FailOnUse)
    _module("skimage", measure=measure)

    # -- batchgenerators (nnU-Net sliding-window helper, not exercised) ---
    bg_utils = _module("batchgenerators.augmentations.utils",
                       pad_nd_image=_FailOnUse)
    bg_aug = _module("batchgenerators.augmentations", utils=bg_utils)
    _module("batchgenerators", augmentations=bg_aug)

    # -- MONAI (UNETR/SwinUNETR building blocks; 3D trainers import the
    # net factory which imports these even when --model is unet_3D) -------
    m_dyn = _module("monai.networks.blocks.dynunet_block",
                    UnetOutBlock=_FailOnUse)
    m_blocks = _module("monai.networks.blocks", UnetrBasicBlock=_FailOnUse,
                       UnetrPrUpBlock=_FailOnUse, UnetrUpBlock=_FailOnUse,
                       dynunet_block=m_dyn)
    m_nets = _module("monai.networks.nets", ViT=_FailOnUse,
                     SwinUNETR=_FailOnUse)
    m_networks = _module("monai.networks", blocks=m_blocks, nets=m_nets)
    _module("monai", networks=m_networks)

    # -- NIfTI writers (not exercised) ------------------------------------
    _module("nibabel", Nifti1Image=_FailOnUse, save=_FailOnUse)
    _module("SimpleITK", GetImageFromArray=_FailOnUse,
            WriteImage=_FailOnUse, ReadImage=_FailOnUse)

    # -- CPU-only torch ---------------------------------------------------
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def import_reference_trainer(module_name: str):
    """Import a reference train_*.py with stubbed deps, default argv, and
    cwd at the reference code root (its import-time argparse and relative
    yaml paths require both)."""
    install_stubs()
    old_argv, old_cwd = sys.argv, os.getcwd()
    sys.argv = [module_name]
    os.chdir(REFERENCE)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        return importlib.import_module(module_name)
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)


def recorded_scalars():
    """Scalars from the most recent reference run's SummaryWriter."""
    return _ScalarRecorder.instances[-1].scalars


def reset_recorders():
    _ScalarRecorder.instances.clear()
