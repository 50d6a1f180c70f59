"""Pallas fused Dice+CE kernel — interpret-mode correctness on CPU
(compiled-mode parity is exercised on the real TPU by bench/verify runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.ops import losses
from cvssl_tpu.ops.pallas_kernels import fused_ce_dice_tpu


@pytest.mark.parametrize("shape", [(2, 32, 32, 4), (3, 37, 41, 4),
                                   (1, 16, 16, 2)])
def test_fused_matches_reference(shape):
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=shape), jnp.float32)
    labels = jnp.array(rng.integers(0, shape[-1], shape[:-1]), jnp.int32)
    want_ce = float(losses.cross_entropy(logits, labels))
    want_dice = float(losses.dice_loss(logits, labels, shape[-1],
                                       softmax=True))
    ce, dice = fused_ce_dice_tpu(logits, labels, shape[-1], interpret=True)
    assert float(ce) == pytest.approx(want_ce, rel=1e-5)
    assert float(dice) == pytest.approx(want_dice, rel=1e-5)


def test_backward_formula_matches_autodiff():
    from cvssl_tpu.ops.pallas_kernels import _fused_bwd
    rng = np.random.default_rng(1)
    logits = jnp.array(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    labels = jnp.array(rng.integers(0, 4, (2, 16, 16)), jnp.int32)
    g_ref = jax.grad(lambda l: losses.dice_ce_loss(l, labels, 4))(logits)
    g_closed, _ = _fused_bwd(4, (logits, labels),
                             (jnp.float32(0.5), jnp.float32(0.5)))
    np.testing.assert_allclose(np.asarray(g_closed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-9)


def test_backward_asymmetric_weights():
    """The pair VJP must honor distinct cotangents on ce vs dice."""
    from cvssl_tpu.ops.pallas_kernels import _fused_bwd
    rng = np.random.default_rng(2)
    logits = jnp.array(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    labels = jnp.array(rng.integers(0, 3, (2, 8, 8)), jnp.int32)

    def ref(l):
        return (0.3 * losses.cross_entropy(l, labels) +
                1.7 * losses.dice_loss(l, labels, 3, softmax=True))

    g_ref = jax.grad(ref)(logits)
    g_closed, _ = _fused_bwd(3, (logits, labels),
                             (jnp.float32(0.3), jnp.float32(1.7)))
    np.testing.assert_allclose(np.asarray(g_closed), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-9)


def test_ce_dice_dispatch_cpu_fallback():
    """losses.ce_dice routes every method's sup loss; on CPU it must equal
    the two stock calls exactly."""
    rng = np.random.default_rng(3)
    logits = jnp.array(rng.normal(size=(2, 12, 12, 4)), jnp.float32)
    labels = jnp.array(rng.integers(0, 4, (2, 12, 12)), jnp.int32)
    ce, dice = losses.ce_dice(logits, labels, 4, fused=True)
    assert float(ce) == pytest.approx(
        float(losses.cross_entropy(logits, labels)), rel=1e-6)
    assert float(dice) == pytest.approx(
        float(losses.dice_loss(logits, labels, 4, softmax=True)), rel=1e-6)
