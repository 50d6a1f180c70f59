"""Same-weights forward parity for ``EffiUNet`` vs the REFERENCE
``Effi_UNet`` (``code/networks/efficientunet.py``) run atop the executable
``efficientnet_pytorch`` reconstruction in ``tests/effnet_standin.py`` —
closing the last converter that had only tree-coverage evidence (the pypi
package is unavailable offline; same approach as tests/test_monai_parity.py).

Pins: the B3 encoder feature contract (stem 40ch as the r2 skip +
stage_idxs (5, 8, 18) taps, ``efficient_encoder.py:76,85-102,156``), the
static TF-SAME padding ladder at image_size=300, the smp decoder, and the
in_channels=1 ``patch_first_conv`` (weight-sum) == input-tile equivalence.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")

sys.path.insert(0, os.path.dirname(__file__))


def _reference_effiunet(in_channels: int, classes: int = 4):
    import reference_shim
    import effnet_standin

    reference_shim.install_stubs()
    effnet_standin.install()  # override the inert stub with the real model
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for m in ("networks.efficientunet", "networks.efficient_encoder"):
        sys.modules.pop(m, None)  # repick up the real efficientnet_pytorch
    from networks.efficientunet import Effi_UNet
    torch_model = Effi_UNet("efficientnet-b3", encoder_weights=None,
                            in_channels=in_channels, classes=classes)
    torch_model.eval()
    return torch_model


def _flax_from_torch(torch_model, classes: int = 4):
    from cvssl_tpu.models.cnn_checkpoint import convert_effiunet_full
    from cvssl_tpu.models.efficientunet import EffiUNet

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert_effiunet_full(sd)
    return EffiUNet(num_classes=classes), params, stats


def test_static_same_padding_goldens():
    """The three asymmetric (0,1) pads of the B3 ladder, and the symmetric
    k5 ones, exactly as Conv2dStaticSamePadding computes them at 300."""
    from cvssl_tpu.models.efficientunet import _same_pad
    assert _same_pad(300, 3, 2) == ((0, 1), (0, 1))   # stem
    assert _same_pad(150, 3, 2) == ((0, 1), (0, 1))   # stage-2 first block
    assert _same_pad(75, 5, 2) == ((2, 2), (2, 2))    # stage-3 first block
    assert _same_pad(38, 3, 2) == ((0, 1), (0, 1))    # stage-4 first block
    assert _same_pad(19, 5, 2) == ((2, 2), (2, 2))    # stage-6 first block
    assert _same_pad(75, 3, 1) == ((1, 1), (1, 1))
    assert _same_pad(19, 5, 1) == ((2, 2), (2, 2))


def test_encoder_feature_contract():
    """Channels/resolutions of the 5 taps == reference out_channels
    (3, 40, 32, 48, 136, 384) at reductions 2/4/8/16/32."""
    import jax
    import jax.numpy as jnp
    from cvssl_tpu.models.efficientunet import EfficientNetEncoder

    enc = EfficientNetEncoder()
    x = jnp.zeros((1, 96, 96, 3))
    v = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = enc.apply(v, x, train=False)
    assert [f.shape for f in feats] == [
        (1, 48, 48, 40), (1, 24, 24, 32), (1, 12, 12, 48),
        (1, 6, 6, 136), (1, 3, 3, 384)]


def test_effiunet_forward_matches_reference_3ch():
    import torch
    import jax

    torch_model = _reference_effiunet(in_channels=3)
    model, params, stats = _flax_from_torch(torch_model)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    ours = model.apply({"params": params, "batch_stats": stats},
                       np.transpose(x, (0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-3)
    del jax  # imported for backend init order only


def test_effiunet_forward_matches_reference_1ch():
    """in_channels=1: the reference SUMS the stem RGB kernel
    (patch_first_conv); we tile the input — conv values must match
    exactly through the whole network."""
    import torch

    torch_model = _reference_effiunet(in_channels=1)
    model, params, stats = _flax_from_torch(torch_model)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    ours = model.apply({"params": params, "batch_stats": stats},
                       np.transpose(x, (0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-3)
