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
