"""Numerical parity against the REFERENCE implementation: load the actual
reference torch UNet's weights into our Flax UNet and compare outputs.
Skipped when the reference checkout isn't present."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


def test_unet_forward_matches_reference_torch():
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    from networks.unet import UNet as TorchUNet  # reference code, run-only

    from cvssl_tpu.models.torch_convert import convert_unet_checkpoint
    from cvssl_tpu.models.unet import UNet as FlaxUNet

    tm = TorchUNet(1, 4)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = convert_unet_checkpoint(sd)

    x = np.random.default_rng(0).normal(size=(2, 1, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        ty = tm(torch.tensor(x)).numpy()

    fm = FlaxUNet(in_chns=1, num_classes=4)
    fy = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    fy = np.asarray(fy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, atol=1e-5, rtol=1e-4)


def test_unet3d_forward_matches_reference_torch():
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from networks.unet_3D import unet_3D  # reference code, run-only

    from cvssl_tpu.models.unet3d import UNet3D

    tm = unet_3D(n_classes=2, in_channels=1)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    def conv3d_w(w):
        return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))

    def unetconv(prefix):
        return {"Conv_0": {"kernel": conv3d_w(sd[f"{prefix}.conv1.0.weight"]),
                           "bias": sd[f"{prefix}.conv1.0.bias"]},
                "Conv_1": {"kernel": conv3d_w(sd[f"{prefix}.conv2.0.weight"]),
                           "bias": sd[f"{prefix}.conv2.0.bias"]}}

    params = {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4", "center"]):
        params[f"UnetConv3_{i}"] = unetconv(name)
    for i, k in enumerate([4, 3, 2, 1]):  # decoder order: up4 first
        params[f"UnetUp3CT_{i}"] = {
            "UnetConv3_0": unetconv(f"up_concat{k}.conv")}
    params["Conv_0"] = {"kernel": conv3d_w(sd["final.weight"]),
                        "bias": sd["final.bias"]}

    # 32^3: the reference's torch InstanceNorm needs >1 spatial element at
    # the 4x-pooled bottleneck
    x = np.random.default_rng(0).normal(size=(1, 1, 32, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        ty = tm(torch.tensor(x)).numpy()

    fm = UNet3D(in_chns=1, num_classes=2)
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False)
    fy = np.asarray(fy).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(fy, ty, atol=1e-4, rtol=1e-3)


def _install_timm_stub():
    """Minimal stand-ins for the timm symbols the reference imports (timm is
    not installed here; these are behavior-equivalent one-liners)."""
    import types
    import collections.abc
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return tuple(x) if isinstance(x, collections.abc.Iterable) else (x, x)

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-only parity tests

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def test_swin_unet_forward_matches_reference_torch():
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    _install_timm_stub()
    from networks.swin_transformer_unet_skip_expand_decoder_sys import (
        SwinTransformerSys)  # reference code, run-only

    from cvssl_tpu.models.swin_checkpoint import convert_swinunet_full
    from cvssl_tpu.models.swin_unet import SwinUnet

    tm = SwinTransformerSys(img_size=224, patch_size=4, in_chans=3,
                            num_classes=4, embed_dim=96, depths=[2, 2, 2, 2],
                            num_heads=[3, 6, 12, 24], window_size=7,
                            drop_path_rate=0.0)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "attn_mask" not in k and "relative_position_index" not in k}

    fm = SwinUnet(num_classes=4, drop_path_rate=0.0)
    x1 = np.random.default_rng(0).normal(size=(1, 224, 224, 1)).astype(
        np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x1),
                        train=False)
    params, report = convert_swinunet_full(sd, variables["params"])
    assert report["skipped"] == 0 and report["loaded"] > 200

    with torch.no_grad():
        ty = tm(torch.tensor(np.tile(x1.transpose(0, 3, 1, 2),
                                     (1, 3, 1, 1)))).numpy()
    fy = np.asarray(fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x1), train=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, atol=2e-5, rtol=1e-3)
