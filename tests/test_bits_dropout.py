"""BitsDropout: quantized-rate element dropout (ops/dropout.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.ops.dropout import BitsDropout


def _apply(rate, x, det, seed=0):
    m = BitsDropout(rate)
    return m.apply({}, x, deterministic=det,
                   rngs={"dropout": jax.random.PRNGKey(seed)})


class TestBitsDropout:
    def test_deterministic_and_zero_rate_identity(self):
        x = jnp.arange(24.0).reshape(4, 6)
        np.testing.assert_array_equal(np.asarray(_apply(0.5, x, True)), x)
        np.testing.assert_array_equal(np.asarray(_apply(0.0, x, False)), x)

    def test_effective_rate_and_unbiased_scale(self):
        # effective drop rate = round(p * 256) / 256; survivor scale keeps
        # E[out] == E[in] exactly for that rate
        x = jnp.ones((512, 512), jnp.float32)
        for p in (0.05, 0.1, 0.3, 0.5):
            out = np.asarray(_apply(p, x, False, seed=42))
            t = round(p * 256)
            eff = t / 256.0
            dropped = (out == 0).mean()
            assert abs(dropped - eff) < 0.005, (p, dropped, eff)
            surv = out[out != 0]
            np.testing.assert_allclose(surv, 256.0 / (256 - t), rtol=1e-6)
            assert abs(out.mean() - 1.0) < 0.01

    def test_bf16_dtype_preserved(self):
        x = jnp.ones((64, 64), jnp.bfloat16)
        out = _apply(0.3, x, False)
        assert out.dtype == jnp.bfloat16
