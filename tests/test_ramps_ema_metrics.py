"""Tests for ramps, EMA, schedules, metrics, SDF."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvssl_tpu.ops import ema, metrics, ramps, schedules, sdf


class TestRamps:
    def test_sigmoid_rampup_golden(self):
        # reference: exp(-5 * (1 - t)^2)
        assert float(ramps.sigmoid_rampup(0, 200)) == pytest.approx(np.exp(-5), rel=1e-5)
        assert float(ramps.sigmoid_rampup(100, 200)) == pytest.approx(np.exp(-1.25), rel=1e-5)
        assert float(ramps.sigmoid_rampup(200, 200)) == pytest.approx(1.0, abs=1e-6)
        assert float(ramps.sigmoid_rampup(500, 200)) == pytest.approx(1.0, abs=1e-6)
        assert float(ramps.sigmoid_rampup(5, 0)) == 1.0

    def test_linear_rampup(self):
        assert float(ramps.linear_rampup(50, 100)) == pytest.approx(0.5)
        assert float(ramps.linear_rampup(150, 100)) == 1.0

    def test_cosine_rampdown(self):
        assert float(ramps.cosine_rampdown(0, 100)) == pytest.approx(1.0)
        assert float(ramps.cosine_rampdown(100, 100)) == pytest.approx(0.0, abs=1e-6)

    def test_ramp_up_function(self):
        assert float(ramps.ramp_up_function(80, 80)) == 1.0
        assert float(ramps.ramp_up_function(0, 80)) == pytest.approx(np.exp(-5), rel=1e-5)

    def test_consistency_weight_staircase(self):
        # iter//150 staircase: steps 0..149 share the same weight.
        w0 = float(ramps.consistency_weight(0))
        w149 = float(ramps.consistency_weight(149))
        w150 = float(ramps.consistency_weight(150))
        assert w0 == w149 and w150 > w0
        # 0.1 * sigmoid_rampup(step//150, 200)
        assert float(ramps.consistency_weight(30000)) == pytest.approx(
            0.1 * np.exp(-5 * (0.0) ** 2), rel=1e-5)

    def test_jittable(self):
        f = jax.jit(lambda s: ramps.consistency_weight(s))
        assert np.isfinite(float(f(jnp.int32(1234))))


class TestEMA:
    def test_warmup_decay(self):
        assert float(ema.ema_decay_schedule(0)) == pytest.approx(0.0)
        assert float(ema.ema_decay_schedule(1)) == pytest.approx(0.5)
        assert float(ema.ema_decay_schedule(1000)) == pytest.approx(0.99)

    def test_update_matches_reference_loop(self, rng):
        p = {"w": jnp.array(rng.standard_normal((4, 4)), jnp.float32)}
        e = {"w": jnp.array(rng.standard_normal((4, 4)), jnp.float32)}
        step = 10
        alpha = min(1 - 1 / (step + 1), 0.99)
        want = alpha * np.asarray(e["w"]) + (1 - alpha) * np.asarray(p["w"])
        got = ema.mean_teacher_update(e, p, step, 0.99)
        np.testing.assert_allclose(np.asarray(got["w"]), want, rtol=1e-6)

    def test_step0_copies_student(self, rng):
        p = {"w": jnp.ones((2, 2))}
        e = {"w": jnp.zeros((2, 2))}
        got = ema.mean_teacher_update(e, p, 0)
        np.testing.assert_allclose(np.asarray(got["w"]), 1.0)


class TestSchedules:
    def test_poly_lr(self):
        sched = schedules.poly_lr(0.01, 30000)
        assert float(sched(0)) == pytest.approx(0.01)
        assert float(sched(15000)) == pytest.approx(0.01 * 0.5 ** 0.9, rel=1e-5)
        assert float(sched(30000)) == pytest.approx(0.0, abs=1e-8)

    def test_two_phase(self):
        sched = schedules.two_phase_lr(0.01, 30000)
        assert float(sched(0)) == pytest.approx(0.01)
        assert float(sched(15000)) == pytest.approx(1e-4)

    def test_reference_sgd_matches_torch_sgd(self, rng):
        import torch
        w0 = rng.standard_normal((8,)).astype(np.float32)
        g = rng.standard_normal((8,)).astype(np.float32)
        # torch: 2 steps of SGD(momentum .9, wd 1e-4) at fixed lr .01
        tw = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, weight_decay=1e-4)
        for _ in range(2):
            opt.zero_grad()
            tw.grad = torch.tensor(g)
            opt.step()
        tx = schedules.reference_sgd(0.01, 10 ** 9)  # poly ~ constant early
        params = {"w": jnp.array(w0)}
        state = tx.init(params)
        for _ in range(2):
            updates, state = tx.update({"w": jnp.array(g)}, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), rtol=1e-4, atol=1e-6)


class TestMetrics:
    def test_dice_identity(self):
        a = jnp.array([[0, 1], [1, 0]])
        assert float(metrics.dice_coefficient(a == 1, a == 1)) == pytest.approx(1.0)

    def test_dice_per_class(self):
        pred = jnp.array([[0, 1, 2], [2, 1, 0]])
        gt = jnp.array([[0, 1, 2], [2, 1, 1]])
        d = metrics.dice_per_class(pred, gt, 3)
        assert d.shape == (2,)
        assert float(d[0]) == pytest.approx(2 * 2 / (2 + 3))

    def test_hd95_asd_simple_shapes(self):
        a = np.zeros((20, 20), bool)
        b = np.zeros((20, 20), bool)
        a[5:15, 5:15] = True
        b[5:15, 5:15] = True
        assert metrics.hd95(a, b) == 0.0
        assert metrics.asd(a, b) == 0.0
        b2 = np.zeros((20, 20), bool)
        b2[6:16, 5:15] = True  # shifted by 1 row
        assert 0 < metrics.hd95(a, b2) <= 2.0

    def test_hd95_matches_medpy_algorithm_3d(self, rng):
        a = rng.uniform(0, 1, (12, 12, 12)) > 0.7
        b = rng.uniform(0, 1, (12, 12, 12)) > 0.7
        # basic sanity: symmetric, nonneg, finite
        h = metrics.hd95(a, b)
        assert np.isfinite(h) and h >= 0
        assert metrics.hd95(b, a) == pytest.approx(h)

    def test_val_guard_returns_zero_for_empty_pred(self):
        pred = np.zeros((8, 8))
        gt = np.ones((8, 8))
        assert metrics.calculate_metric_percase_val(pred, gt) == (0.0, 0.0)

    def test_ravd(self):
        a = np.zeros((10, 10), bool); a[:5] = True
        b = np.zeros((10, 10), bool); b[:4] = True
        assert metrics.ravd(a, b) == pytest.approx((50 - 40) / 40)

    def test_jc_dc_relation(self, rng):
        a = rng.uniform(0, 1, (16, 16)) > 0.5
        b = rng.uniform(0, 1, (16, 16)) > 0.5
        d, j = metrics.dc(a, b), metrics.jc(a, b)
        assert d == pytest.approx(2 * j / (1 + j), rel=1e-9)


class TestSDF:
    def test_sdf_range_and_boundary(self):
        mask = np.zeros((1, 16, 16), np.uint8)
        mask[0, 4:12, 4:12] = 1
        out = sdf.compute_sdf(mask, mask.shape)
        assert out.min() >= -1.0 - 1e-9 and out.max() <= 1.0 + 1e-9
        # inside negative, outside positive
        assert out[0, 8, 8] < 0
        assert out[0, 0, 0] > 0
        # inner boundary exactly zero
        assert out[0, 4, 8] == 0.0

    def test_sdf_empty_mask_zero(self):
        mask = np.zeros((2, 8, 8), np.uint8)
        out = sdf.compute_sdf(mask, mask.shape)
        assert np.all(out == 0)


def test_surface_distance_bbox_crop_is_exact():
    """The union-bbox crop inside _surface_distances must not change the
    distance multiset (hd95/asd identical to the uncropped algorithm)."""
    import numpy as np
    from scipy import ndimage
    from cvssl_tpu.ops import metrics as M

    def uncropped(result, reference, connectivity=1):
        fp = ndimage.generate_binary_structure(result.ndim, connectivity)
        rb = result ^ ndimage.binary_erosion(result, fp, 1)
        gb = reference ^ ndimage.binary_erosion(reference, fp, 1)
        dt = ndimage.distance_transform_edt(~gb)
        return dt[rb]

    rng = np.random.default_rng(0)
    for trial in range(3):
        a = np.zeros((40, 44, 38), bool)
        b = np.zeros((40, 44, 38), bool)
        ca = rng.integers(8, 30, 3)
        cb = ca + rng.integers(-4, 5, 3)
        zz, yy, xx = np.meshgrid(*[np.arange(s) for s in a.shape],
                                 indexing="ij")
        a |= ((zz - ca[0]) ** 2 + (yy - ca[1]) ** 2 +
              (xx - ca[2]) ** 2) < 36
        b |= ((zz - cb[0]) ** 2 + (yy - cb[1]) ** 2 +
              (xx - cb[2]) ** 2) < 49
        got = np.sort(M._surface_distances(a, b))
        want = np.sort(uncropped(a, b))
        np.testing.assert_allclose(got, want)
        # mask touching the volume edge (margin clamps) stays exact
        a2 = a.copy()
        a2[:2] = True
        got = np.sort(M._surface_distances(a2, b))
        want = np.sort(uncropped(a2, b))
        np.testing.assert_allclose(got, want)
