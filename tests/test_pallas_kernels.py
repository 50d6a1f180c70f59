"""Pallas fused Dice+CE kernel — interpret-mode correctness on CPU
(compiled-mode parity is exercised on the real TPU by bench/verify runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.ops import losses
from cvssl_tpu.ops.pallas_kernels import fused_dice_ce_loss_tpu


@pytest.mark.parametrize("shape", [(2, 32, 32, 4), (3, 37, 41, 4),
                                   (1, 16, 16, 2)])
def test_fused_matches_reference(shape):
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=shape), jnp.float32)
    labels = jnp.array(rng.integers(0, shape[-1], shape[:-1]), jnp.int32)
    want = float(losses.dice_ce_loss(logits, labels, shape[-1]))
    got = float(fused_dice_ce_loss_tpu(logits, labels, shape[-1],
                                       interpret=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_backward_formula_matches_autodiff():
    from cvssl_tpu.ops.pallas_kernels import _fused_bwd
    rng = np.random.default_rng(1)
    logits = jnp.array(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    labels = jnp.array(rng.integers(0, 4, (2, 16, 16)), jnp.int32)
    g_ref = jax.grad(lambda l: losses.dice_ce_loss(l, labels, 4))(logits)
    g_closed, _ = _fused_bwd(4, (logits, labels), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(g_closed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-9)
