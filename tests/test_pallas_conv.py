"""Pixel-packed Pallas conv — interpret-mode correctness on CPU (compiled
parity + timing exercised on the real TPU by verify runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.ops.pallas_conv import (build_banded_mats, conv3x3_p8,
                                       conv3x3_p8_db, conv3x3_p8_dma)


def test_banded_mats_structure():
    k = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 3, 16, 16)).astype(np.float32))
    mats = build_banded_mats(k)
    assert set(mats) == {(dh, G) for dh in range(3) for G in (-1, 0, 1)}
    # G=+1 band: only out pixel v=7 reads in pixel u=0 (dw=2)... the matrix
    # must be mostly zero
    m = np.asarray(mats[(0, 1)])
    assert np.count_nonzero(m) <= 2 * 16 * 16
    # G=0 band has the most entries (central band)
    m0 = np.asarray(mats[(0, 0)])
    assert np.count_nonzero(m0) > np.count_nonzero(m)


@pytest.mark.parametrize("fn", [conv3x3_p8, conv3x3_p8_dma, conv3x3_p8_db])
@pytest.mark.parametrize("shape", [(2, 32, 32, 16), (1, 64, 48, 16)])
def test_conv3x3_p8_matches_xla(fn, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = fn(x, k, interpret=True, tile_h=shape[1] // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


class TestBf16Boundary:
    """Pins the resolved round-1 'bf16 boundary anomaly' (see the module
    docstring of ops/pallas_conv.py): jnp.dot at DEFAULT precision rounds
    operands to bf16 on the TPU MXU, so bf16 arrays at the pallas_call
    boundary are numerically a no-op there (pure HBM-traffic saving)."""

    def test_bf16_arrays_bit_identical_on_tpu(self):
        if jax.default_backend() != "tpu" and not any(
                d.platform == "tpu" for d in jax.devices()):
            pytest.skip("TPU-only behavior (MXU default-precision rounding)")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
        y32 = np.asarray(conv3x3_p8(x, k))
        ybf = np.asarray(conv3x3_p8(x.astype(jnp.bfloat16),
                                    k.astype(jnp.bfloat16)))
        np.testing.assert_array_equal(y32, ybf)

    def test_bf16_arrays_close_in_interpret_mode(self):
        # On CPU (interpret) the dot is true f32, so bf16 inputs only agree
        # to bf16 rounding — close, not bit-equal.
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
        y32 = np.asarray(conv3x3_p8(x, k, interpret=True, tile_h=16))
        ybf = np.asarray(conv3x3_p8(
            x.astype(jnp.bfloat16).astype(jnp.float32),
            k.astype(jnp.bfloat16).astype(jnp.float32),
            interpret=True, tile_h=16))
        scale = np.abs(y32).max()
        assert np.abs(y32 - ybf).max() < 0.03 * scale
