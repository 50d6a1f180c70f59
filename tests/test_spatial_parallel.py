"""Multi-chip sliding-window inference: 8-device result == 1-device result."""
import jax
import jax.numpy as jnp
import numpy as np

from cvssl_tpu.eval.val3d import SlidingWindowEvaluator
from cvssl_tpu.parallel.mesh import make_mesh
from cvssl_tpu.parallel.spatial import ShardedSlidingWindowEvaluator


def _predictor():
    def predict(patches):
        fg = (patches[..., 0] > 0.5).astype(jnp.float32)
        return jnp.stack([1 - fg, fg], axis=-1)
    return predict


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    vol = (rng.uniform(0, 1, (24, 24, 16)) > 0.5).astype(np.float32)
    single = SlidingWindowEvaluator(_predictor(), (16, 16, 16), 2, 8, 8)
    mesh = make_mesh(8)
    sharded = ShardedSlidingWindowEvaluator(_predictor(), (16, 16, 16), 2,
                                            8, 8, mesh)
    np.testing.assert_array_equal(sharded.predict_volume(vol),
                                  single.predict_volume(vol))


def test_sharded_handles_non_multiple_corner_counts():
    # 2 corners over 8 devices -> 6 sentinel pads
    rng = np.random.default_rng(1)
    vol = (rng.uniform(0, 1, (16, 16, 24)) > 0.5).astype(np.float32)
    mesh = make_mesh(8)
    sharded = ShardedSlidingWindowEvaluator(_predictor(), (16, 16, 16), 2,
                                            8, 8, mesh)
    pred = sharded.predict_volume(vol)
    np.testing.assert_array_equal(pred, vol.astype(np.int32))
