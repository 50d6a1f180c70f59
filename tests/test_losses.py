"""Golden-value / parity tests for cvssl_tpu.ops.losses.

Torch (CPU) acts as the oracle where reference semantics ARE torch semantics
(CrossEntropyLoss, kl_div, avg_pool2d); otherwise numpy reimplementations of
the reference formulas are inlined here.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cvssl_tpu.ops import losses


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestDice:
    def test_dice_loss_binary_golden(self, rng):
        s = rng.uniform(0, 1, (4, 8, 8)).astype(np.float32)
        t = (rng.uniform(0, 1, (4, 8, 8)) > 0.5).astype(np.float32)
        got = float(losses.dice_loss_binary(jnp.array(s), jnp.array(t)))
        smooth = 1e-5
        want = 1 - (2 * (s * t).sum() + smooth) / ((s * s).sum() + (t * t).sum() + smooth)
        assert got == pytest.approx(want, rel=1e-5)

    def test_dice_loss_binary1_golden(self, rng):
        s = rng.uniform(0, 1, (4, 8, 8)).astype(np.float32)
        t = (rng.uniform(0, 1, (4, 8, 8)) > 0.5).astype(np.float32)
        got = float(losses.dice_loss_binary1(jnp.array(s), jnp.array(t)))
        smooth = 1e-5
        want = 1 - (2 * (s * t).sum() + smooth) / (s.sum() + t.sum() + smooth)
        assert got == pytest.approx(want, rel=1e-5)

    def test_multiclass_dice_matches_reference_formula(self, rng):
        n_classes = 4
        logits = _rand(rng, 2, 16, 16, n_classes)
        labels = rng.integers(0, n_classes, (2, 16, 16))
        got = float(losses.dice_loss(jnp.array(logits), jnp.array(labels),
                                     n_classes, softmax=True))
        # reference DiceLoss forward (losses.py:188-201) in numpy:
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        smooth, total = 1e-5, 0.0
        for c in range(n_classes):
            s, t = probs[..., c], (labels == c).astype(np.float32)
            total += 1 - (2 * (s * t).sum() + smooth) / ((s * s).sum() + (t * t).sum() + smooth)
        assert got == pytest.approx(total / n_classes, rel=1e-4)

    def test_dice_perfect_prediction_near_zero(self):
        labels = jnp.array([[[0, 1], [2, 3]]])
        probs = jax.nn.one_hot(labels, 4)
        assert float(losses.dice_loss(probs, labels, 4)) < 1e-4

    def test_dice_weighting(self, rng):
        logits = _rand(rng, 2, 8, 8, 3)
        labels = rng.integers(0, 3, (2, 8, 8))
        unweighted = losses.dice_loss(jnp.array(logits), jnp.array(labels), 3,
                                      softmax=True)
        weighted = losses.dice_loss(jnp.array(logits), jnp.array(labels), 3,
                                    weight=[1.0, 1.0, 1.0], softmax=True)
        assert float(unweighted) == pytest.approx(float(weighted), rel=1e-6)


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits = _rand(rng, 3, 10, 12, 4)
        labels = rng.integers(0, 4, (3, 10, 12))
        got = float(losses.cross_entropy(jnp.array(logits), jnp.array(labels)))
        want = F.cross_entropy(
            torch.tensor(logits).permute(0, 3, 1, 2),
            torch.tensor(labels, dtype=torch.long)).item()
        assert got == pytest.approx(want, rel=1e-5)

    def test_dice_ce_is_half_sum(self, rng):
        logits = _rand(rng, 2, 8, 8, 4)
        labels = rng.integers(0, 4, (2, 8, 8))
        lo, la = jnp.array(logits), jnp.array(labels)
        combo = float(losses.dice_ce_loss(lo, la, 4))
        want = 0.5 * (float(losses.cross_entropy(lo, la)) +
                      float(losses.dice_loss(lo, la, 4, softmax=True)))
        assert combo == pytest.approx(want, rel=1e-6)


class TestConsistency:
    def test_softmax_mse_elementwise_no_reduction(self, rng):
        a, b = _rand(rng, 2, 6, 6, 4), _rand(rng, 2, 6, 6, 4)
        out = losses.softmax_mse_loss(jnp.array(a), jnp.array(b))
        assert out.shape == (2, 6, 6, 4)
        want = (F.softmax(torch.tensor(a), -1) - F.softmax(torch.tensor(b), -1)) ** 2
        np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-4, atol=1e-6)

    def test_softmax_mse_stops_target_grad(self, rng):
        a, b = jnp.array(_rand(rng, 2, 4)), jnp.array(_rand(rng, 2, 4))
        g = jax.grad(lambda x: jnp.sum(losses.softmax_mse_loss(a, x)))(b)
        assert float(jnp.abs(g).max()) == 0.0

    def test_softmax_kl_matches_torch(self, rng):
        a, b = _rand(rng, 2, 6, 6, 4), _rand(rng, 2, 6, 6, 4)
        got = float(losses.softmax_kl_loss(jnp.array(a), jnp.array(b)))
        want = F.kl_div(F.log_softmax(torch.tensor(a), -1),
                        F.softmax(torch.tensor(b), -1), reduction="mean").item()
        assert got == pytest.approx(want, rel=1e-4)

    def test_symmetric_mse_grads_both_sides(self, rng):
        a, b = jnp.array(_rand(rng, 3, 4)), jnp.array(_rand(rng, 3, 4))
        ga = jax.grad(lambda x: losses.symmetric_mse_loss(x, b))(a)
        gb = jax.grad(lambda x: losses.symmetric_mse_loss(a, x))(b)
        assert float(jnp.abs(ga).max()) > 0 and float(jnp.abs(gb).max()) > 0

    def test_compute_kl_loss_matches_torch(self, rng):
        p, q = _rand(rng, 5, 7), _rand(rng, 5, 7)
        got = float(losses.compute_kl_loss(jnp.array(p), jnp.array(q)))
        tp, tq = torch.tensor(p), torch.tensor(q)
        pl = F.kl_div(F.log_softmax(tp, -1), F.softmax(tq, -1), reduction="none").mean()
        ql = F.kl_div(F.log_softmax(tq, -1), F.softmax(tp, -1), reduction="none").mean()
        assert got == pytest.approx(((pl + ql) / 2).item(), rel=1e-4)


class TestEntropy:
    def test_entropy_loss_golden(self, rng):
        p = rng.uniform(0.01, 1, (2, 8, 8, 3)).astype(np.float32)
        p = p / p.sum(-1, keepdims=True)
        got = float(losses.entropy_loss(jnp.array(p), num_classes=3))
        want = np.mean(-np.sum(p * np.log(p + 1e-6), -1) / np.log(3))
        assert got == pytest.approx(want, rel=1e-3)

    def test_entropy_map_shape(self, rng):
        p = jnp.array(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        assert losses.entropy_map(p).shape == (2, 8, 8, 1)

    def test_uniform_distribution_max_entropy(self):
        p = jnp.full((1, 4, 4, 2), 0.5)
        assert float(losses.entropy_loss(p, 2)) == pytest.approx(1.0, abs=1e-4)


class TestFocal:
    def test_focal_matches_manual(self, rng):
        logits = _rand(rng, 2, 5, 5, 3)
        labels = rng.integers(0, 3, (2, 5, 5))
        got = float(losses.focal_loss(jnp.array(logits), jnp.array(labels), gamma=2.0))
        lp = F.log_softmax(torch.tensor(logits).reshape(-1, 3), -1)
        logpt = lp.gather(1, torch.tensor(labels.reshape(-1, 1), dtype=torch.long)).squeeze(1)
        pt = logpt.exp()
        want = (-(1 - pt) ** 2 * logpt).mean().item()
        assert got == pytest.approx(want, rel=1e-4)


class TestWeightedLoss:
    def test_avg_pool_parity_with_torch(self, rng):
        x = rng.uniform(0, 1, (2, 33, 33, 1)).astype(np.float32)
        got = losses._avg_pool_2d_same(jnp.array(x), 31)
        want = F.avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 31, stride=1,
                            padding=15, count_include_pad=True)
        np.testing.assert_allclose(np.asarray(got)[..., 0],
                                   want.numpy()[:, 0], rtol=1e-4, atol=1e-6)

    def test_weighted_loss_matches_torch(self, rng):
        pred = rng.uniform(0.01, 0.99, (2, 33, 33, 1)).astype(np.float32)
        mask = (rng.uniform(0, 1, (2, 33, 33, 1)) > 0.5).astype(np.float32)
        got = float(losses.weighted_loss(jnp.array(pred), jnp.array(mask)))
        tp = torch.tensor(pred).permute(0, 3, 1, 2)
        tm = torch.tensor(mask).permute(0, 3, 1, 2)
        weit = 1 + 5 * torch.abs(F.avg_pool2d(tm, 31, 1, 15) - tm)
        wbce = F.binary_cross_entropy(tp, tm, reduction="none")
        wbce = (weit * wbce).sum((2, 3)) / weit.sum((2, 3))
        inter = ((tp * tm) * weit).sum((2, 3))
        union = ((tp + tm) * weit).sum((2, 3))
        wiou = 1 - (inter + 1) / (union - inter + 1)
        assert got == pytest.approx((wbce + wiou).mean().item(), rel=1e-4)


class TestContrastive:
    def test_con_loss_matches_torch_reference_formula(self, rng):
        feat_q = _rand(rng, 2, 8, 4, 4)  # (B, C, H, W) as the reference feeds it
        feat_k = _rand(rng, 2, 8, 4, 4)
        got = float(losses.con_loss(jnp.array(feat_q), jnp.array(feat_k)))
        # reference ConLoss.forward in torch:
        tq, tk = torch.tensor(feat_q), torch.tensor(feat_k)
        b, d = 2, 8
        q = F.normalize(tq.view(b, d, -1).permute(0, 2, 1), dim=-1, p=1)
        k = F.normalize(tk.view(b, d, -1).permute(0, 2, 1), dim=-1, p=1)
        l_pos = torch.bmm(q.reshape(-1, 1, d), k.reshape(-1, d, 1)).view(-1, 1)
        npatches = q.size(1)
        l_neg = torch.bmm(q, k.transpose(2, 1))
        eye = torch.eye(npatches, dtype=torch.bool)[None]
        l_neg.masked_fill_(eye, -float("inf"))
        out = torch.cat((l_pos, l_neg.view(-1, npatches)), 1) / 0.07
        want = F.cross_entropy(out, torch.zeros(out.size(0), dtype=torch.long)).item()
        assert got == pytest.approx(want, rel=1e-3)

    def test_info_nce_positive_pairs(self, rng):
        # Construct features where i and i + n/2 are identical -> low loss.
        half = _rand(rng, 4, 16)
        feats = np.concatenate([half, half], 0)
        low = float(losses.info_nce_loss(jnp.array(feats), jnp.array(feats)))
        rand = float(losses.info_nce_loss(jnp.array(_rand(rng, 8, 16)),
                                          jnp.array(_rand(rng, 8, 16))))
        assert low < rand

    def test_moco_queue_roundtrip(self, rng):
        q = losses.moco_queue_init(capacity=16, dim=32)
        fq = jnp.array(_rand(rng, 4, 32))
        fk = jnp.array(_rand(rng, 4, 32))
        loss1, q = losses.moco_loss(fq, fk, q)
        assert np.isfinite(float(loss1))
        assert int(q.valid.sum()) == 4 and int(q.ptr) == 4
        loss2, q = losses.moco_loss(fq, fk, q)
        assert np.isfinite(float(loss2))
        assert int(q.valid.sum()) == 8

    def test_moco_loss_jittable(self, rng):
        q = losses.moco_queue_init(capacity=8, dim=16)
        f = jnp.array(_rand(rng, 2, 16))
        jitted = jax.jit(losses.moco_loss)
        loss, q2 = jitted(f, f, q)
        assert np.isfinite(float(loss))
