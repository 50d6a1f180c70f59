"""Shape/dtype/gradient tests for the 2D model zoo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvssl_tpu.models import net_factory, available_2d
from cvssl_tpu.models.unet import (UNet, feature_dropout, feature_noise,
                                   dropout_perturb, bilinear_resize)


def init_and_apply(model, x, train=False, rngs=None):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "perturb": jax.random.PRNGKey(2)}, x, train=train)
    extra = {}
    if train:
        extra = {"rngs": rngs or {"dropout": jax.random.PRNGKey(3),
                                  "perturb": jax.random.PRNGKey(4)},
                 "mutable": ["batch_stats"]}
    return variables, model.apply(variables, x, train=train, **extra)


class TestUNet:
    def test_output_shape_eval(self):
        model = net_factory("unet", in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, y = init_and_apply(model, x)
        assert y.shape == (2, 64, 64, 4)

    def test_output_shape_train(self):
        model = net_factory("unet", in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, (y, updates) = init_and_apply(model, x, train=True)
        assert y.shape == (2, 64, 64, 4)
        assert "batch_stats" in updates

    def test_param_count_matches_reference(self):
        # Reference UNet(1, 4) has 1,813,764 params (torch sum of numel;
        # bilinear decoder — see module docstring for the dead-flag quirk).
        model = UNet(in_chns=1, num_classes=4)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), train=False)
        n = sum(np.prod(p.shape) for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert n == 1_813_764

    def test_gradients_flow(self):
        model = UNet(in_chns=1, num_classes=2)
        x = jnp.ones((1, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            y = model.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            x, train=False)
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(variables["params"])
        norms = [float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g)]
        assert sum(n > 0 for n in norms) > len(norms) * 0.5

    def test_eval_deterministic(self):
        model = UNet(in_chns=1, num_classes=4)
        x = jnp.array(np.random.default_rng(0).normal(size=(1, 32, 32, 1)),
                      jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y1 = model.apply(variables, x, train=False)
        y2 = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestVariants:
    @pytest.mark.parametrize("name", ["unet_cct", "unet_ds", "unet_urpc"])
    def test_four_outputs(self, name):
        model = net_factory(name, in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, (outs, _) = init_and_apply(model, x, train=True)
        assert len(outs) == 4
        for o in outs:
            assert o.shape == (2, 64, 64, 4)

    def test_cct_aux_differ_from_main(self):
        model = net_factory("unet_cct", in_chns=1, class_num=4)
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 64, 64, 1)),
                      jnp.float32)
        _, (outs, _) = init_and_apply(model, x, train=True)
        main, aux1, aux2, aux3 = outs
        assert not np.allclose(np.asarray(main), np.asarray(aux1))

    def test_unet_feature_returns_features(self):
        model = net_factory("unet_feature", in_chns=1, class_num=4)
        x = jnp.zeros((2, 64, 64, 1))
        _, (logits, feats) = init_and_apply(model, x)
        assert logits.shape == (2, 64, 64, 4)
        assert feats.shape == (2, 64, 64, 16)


class TestPerturbations:
    def test_feature_noise_bounds(self):
        x = jnp.ones((2, 8, 8, 4))
        y = feature_noise(jax.random.PRNGKey(0), x, 0.3)
        assert float(y.min()) >= 0.7 - 1e-6 and float(y.max()) <= 1.3 + 1e-6

    def test_feature_dropout_zeroes_high_attention(self):
        x = jnp.array(np.random.default_rng(0).uniform(
            0.1, 1.0, (2, 8, 8, 4)), jnp.float32)
        y = feature_dropout(jax.random.PRNGKey(0), x)
        assert float(jnp.sum(y == 0)) > 0

    def test_dropout_perturb_scale(self):
        x = jnp.ones((1, 100, 100, 1))
        y = dropout_perturb(jax.random.PRNGKey(0), x, p=0.3)
        # surviving entries scaled by 1/0.7
        kept = np.asarray(y)[np.asarray(y) > 0]
        np.testing.assert_allclose(kept, 1 / 0.7, rtol=1e-5)


class TestBilinearResize:
    def test_matches_torch_align_corners(self):
        import torch
        import torch.nn.functional as F
        x = np.random.default_rng(0).normal(size=(1, 7, 9, 3)).astype(np.float32)
        got = bilinear_resize(jnp.array(x), (14, 18))
        want = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                             size=(14, 18), mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestAuxModels:
    def test_discriminator_2d(self):
        model = net_factory("discriminator", class_num=4)
        seg = jnp.zeros((2, 256, 256, 4))
        img = jnp.zeros((2, 256, 256, 1))
        variables = model.init(jax.random.PRNGKey(0), seg, img, train=False)
        out = model.apply(variables, seg, img, train=False)
        assert out.shape == (2, 2)

    def test_projector_classifier_shapes(self):
        proj = net_factory("projector", class_num=4)
        clf = net_factory("classifier", class_num=4)
        x = jnp.zeros((2, 64, 64, 4))
        vp = proj.init(jax.random.PRNGKey(0), x, train=False)
        vc = clf.init(jax.random.PRNGKey(0), x, train=False)
        assert proj.apply(vp, x, train=False).shape == (2, 16, 16, 16)
        assert clf.apply(vc, x, train=False).shape == (2, 8, 8, 32)

    def test_registry_contents(self):
        av = available_2d()
        for name in ["unet", "unet_cct", "unet_ds", "unet_urpc",
                     "discriminator", "projector", "classifier"]:
            assert name in av
