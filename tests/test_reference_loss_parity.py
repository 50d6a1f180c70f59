"""Loss parity against the REFERENCE implementation itself: import
``code/utils/losses.py`` (torch) and compare numerics on identical inputs.
Skipped when the reference checkout isn't present."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_losses():
    sys.path.insert(0, REFERENCE)
    from utils import losses as rl  # reference module, run-only
    return rl


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_dice_loss_binary(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    s = np.abs(_rand((4, 16, 16)))
    t = (np.abs(_rand((4, 16, 16), 1)) > 0.5).astype(np.float32)
    want = float(ref_losses.dice_loss(torch.tensor(s), torch.tensor(t)))
    got = float(losses.dice_loss_binary(jnp.asarray(s), jnp.asarray(t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_class(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    logits = _rand((2, 4, 16, 16))  # torch NCHW
    labels = np.random.default_rng(2).integers(0, 4, (2, 16, 16))
    dl = ref_losses.DiceLoss(4)
    want = float(dl(torch.softmax(torch.tensor(logits), dim=1),
                    torch.tensor(labels[:, None].astype(np.float32))))
    got = float(losses.dice_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels), 4,
        softmax=True))
    assert got == pytest.approx(want, rel=1e-4)


def test_softmax_mse(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    a, b = _rand((2, 4, 8, 8), 3), _rand((2, 4, 8, 8), 4)
    want = ref_losses.softmax_mse_loss(torch.tensor(a),
                                       torch.tensor(b)).numpy()
    got = np.asarray(losses.softmax_mse_loss(
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_softmax_kl(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    a, b = _rand((2, 4, 8, 8), 5), _rand((2, 4, 8, 8), 6)
    want = float(ref_losses.softmax_kl_loss(torch.tensor(a),
                                            torch.tensor(b)))
    got = float(losses.softmax_kl_loss(
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, rel=1e-4)


def test_softmax_dice_loss(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    a, b = _rand((2, 4, 8, 8), 7), _rand((2, 4, 8, 8), 8)
    want = float(ref_losses.softmax_dice_loss(torch.tensor(a),
                                              torch.tensor(b)))
    got = float(losses.softmax_dice_loss(
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, rel=1e-4)


def test_con_loss_patchnce(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    q, k = _rand((2, 8, 4, 4), 9), _rand((2, 8, 4, 4), 10)
    crit = ref_losses.ConLoss()
    want = float(crit(torch.tensor(q), torch.tensor(k)))
    got = float(losses.con_loss(jnp.asarray(q), jnp.asarray(k)))
    assert got == pytest.approx(want, rel=1e-3)


def test_contrastive_loss_sup_second_definition_wins(ref_losses):
    import torch
    import jax.numpy as jnp
    from cvssl_tpu.ops import losses
    q, k = _rand((2, 8, 4, 4), 11), _rand((2, 8, 4, 4), 12)
    crit = ref_losses.contrastive_loss_sup()  # python kept the 2nd def
    want = float(crit(torch.tensor(q), torch.tensor(k)))
    got = float(losses.contrastive_loss_sup(jnp.asarray(q), jnp.asarray(k)))
    assert got == pytest.approx(want, rel=1e-3)


def test_ramps_match(ref_losses):
    sys.path.insert(0, REFERENCE)
    from utils import ramps as rr
    from cvssl_tpu.ops import ramps
    for cur in (0, 37, 150, 199, 200, 500):
        assert float(ramps.sigmoid_rampup(cur, 200)) == pytest.approx(
            rr.sigmoid_rampup(cur, 200), rel=1e-6)
        assert float(ramps.linear_rampup(cur, 200)) == pytest.approx(
            rr.linear_rampup(cur, 200), rel=1e-6)
    for ep in (0, 10, 79, 80, 200):
        assert float(ramps.ramp_up_function(ep, 80)) == pytest.approx(
            rr.ramp_up_function(ep, 80), rel=1e-6)
