"""Parity + behavior tests for the networks_other.py surface: GAN
scaffolding (gan.py), init helpers (initializers.py), the scheduler family
(schedules.py), the extended grid-attention modes (attention_unet.py), and
the feature extractor (utils/features.py).

Parity tests load the ACTUAL reference torch modules (read-only) and compare
against our Flax ports with copied weights.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


def _conv_w(w):
    """torch conv (out,in,kh,kw) -> flax (kh,kw,in,out)."""
    return np.transpose(w, (2, 3, 1, 0))


# ---------------------------------------------------------------------------
# GANLoss
# ---------------------------------------------------------------------------

def test_gan_loss_matches_reference_torch():
    import torch
    sys.path.insert(0, REFERENCE)
    from networks.networks_other import GANLoss  # reference, run-only

    from cvssl_tpu.models.gan import gan_loss

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 1, 6, 6)).astype(np.float32)
    probs = rng.uniform(0.01, 0.99, size=(2, 1, 6, 6)).astype(np.float32)

    for target_is_real in (True, False):
        ref = GANLoss(use_lsgan=True)(torch.tensor(pred), target_is_real)
        ours = gan_loss(pred, target_is_real, use_lsgan=True)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

        ref = GANLoss(use_lsgan=False)(torch.tensor(probs), target_is_real)
        ours = gan_loss(probs, target_is_real, use_lsgan=False)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


# ---------------------------------------------------------------------------
# NLayerDiscriminator
# ---------------------------------------------------------------------------

def test_nlayer_discriminator_matches_reference_torch():
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    from networks.networks_other import NLayerDiscriminator as TorchD

    from cvssl_tpu.models.gan import NLayerDiscriminator

    tm = TorchD(input_nc=3, ndf=8, n_layers=3)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    # torch Sequential: 0 conv, 1 lrelu, (2 conv, 3 bn, 4 lrelu),
    # (5 conv, 6 bn, 7 lrelu), (8 conv, 9 bn, 10 lrelu), 11 conv
    def bn(i):
        return {"scale": sd[f"model.{i}.weight"],
                "bias": sd[f"model.{i}.bias"]}, \
               {"mean": sd[f"model.{i}.running_mean"],
                "var": sd[f"model.{i}.running_var"]}

    # batch-norm variant: mid convs have bias=False (use_bias is only True
    # under InstanceNorm, networks_other.py:484-488)
    params = {
        "Conv_0": {"kernel": _conv_w(sd["model.0.weight"]),
                   "bias": sd["model.0.bias"]},
        "Conv_1": {"kernel": _conv_w(sd["model.2.weight"])},
        "Conv_2": {"kernel": _conv_w(sd["model.5.weight"])},
        "Conv_3": {"kernel": _conv_w(sd["model.8.weight"])},
        "Conv_4": {"kernel": _conv_w(sd["model.11.weight"]),
                   "bias": sd["model.11.bias"]},
    }
    stats = {}
    for j, i in enumerate((3, 6, 9)):
        p, s = bn(i)
        params[f"_Norm_{j}"] = {"BatchNorm_0": p}
        stats[f"_Norm_{j}"] = {"BatchNorm_0": s}

    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        ty = tm(torch.tensor(x)).numpy()

    fm = NLayerDiscriminator(ndf=8, n_layers=3)
    fy = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(fy).transpose(0, 3, 1, 2), ty,
                               atol=1e-4, rtol=1e-4)


def test_generators_shapes():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.gan import (ResnetGenerator, UnetGenerator,
                                      define_d, define_g)

    x = jnp.zeros((1, 32, 32, 3))
    g = ResnetGenerator(output_nc=2, ngf=8, n_blocks=2)
    v = g.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = g.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 2)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head

    u = UnetGenerator(output_nc=2, num_downs=5, ngf=4)
    v = u.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = u.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 2)

    assert isinstance(define_g(1, 8, "resnet_6blocks"), ResnetGenerator)
    assert isinstance(define_g(1, 8, "unet_128"), UnetGenerator)
    d = define_d(8, "basic", norm="instance")
    v = d.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert d.apply(v, x, train=False).shape[-1] == 1
    with pytest.raises(NotImplementedError):
        define_g(1, 8, "nope")
    with pytest.raises(NotImplementedError):
        define_d(8, "nope")


# ---------------------------------------------------------------------------
# init_weights
# ---------------------------------------------------------------------------

def test_init_weights_semantics():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.gan import NLayerDiscriminator
    from cvssl_tpu.models.initializers import init_weights

    m = NLayerDiscriminator(ndf=16, n_layers=3)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 32, 32, 3)), train=False)
    params = v["params"]

    out = init_weights(params, jax.random.PRNGKey(1), "normal")
    k = out["Conv_2"]["kernel"]
    assert abs(float(jnp.std(k)) - 0.02) < 0.005         # N(0, 0.02)
    assert float(jnp.abs(out["Conv_0"]["bias"]).max()) == 0.0
    scale = out["_Norm_0"]["BatchNorm_0"]["scale"]
    assert abs(float(jnp.mean(scale)) - 1.0) < 0.05       # N(1, 0.02)

    out = init_weights(params, jax.random.PRNGKey(2), "kaiming")
    k = out["Conv_2"]["kernel"]                            # fan_in = 4*4*32
    expected = (2.0 / (4 * 4 * k.shape[2])) ** 0.5
    assert abs(float(jnp.std(k)) - expected) / expected < 0.1

    out = init_weights(params, jax.random.PRNGKey(3), "xavier")
    fan_in = 4 * 4 * k.shape[2]
    fan_out = 4 * 4 * k.shape[3]
    expected = (2.0 / (fan_in + fan_out)) ** 0.5
    assert abs(float(jnp.std(out["Conv_2"]["kernel"])) -
               expected) / expected < 0.1

    out = init_weights(params, jax.random.PRNGKey(4), "orthogonal")
    k2 = np.asarray(out["Conv_2"]["kernel"]).reshape(-1, k.shape[-1])
    eye = k2.T @ k2
    np.testing.assert_allclose(eye, np.eye(eye.shape[0]), atol=1e-4)

    with pytest.raises(NotImplementedError):
        init_weights(params, jax.random.PRNGKey(5), "bogus")


# ---------------------------------------------------------------------------
# Scheduler family vs torch lr_scheduler
# ---------------------------------------------------------------------------

def test_schedulers_match_reference_torch():
    import torch

    from cvssl_tpu.ops import schedules

    base = 0.1
    p = torch.nn.Parameter(torch.zeros(1))

    # 'lambda' policy
    opt = torch.optim.SGD([p], lr=base)
    niter, niter_decay, epoch_count = 10, 10, 1

    def lambda_rule(epoch):
        return 1.0 - max(0, epoch + 1 + epoch_count - niter) \
            / float(niter_decay + 1)

    sch = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda_rule)
    ours = schedules.lambda_linear_lr(base, niter, niter_decay, epoch_count)
    for e in range(18):
        np.testing.assert_allclose(float(ours(e)), opt.param_groups[0]["lr"],
                                   rtol=1e-6)
        opt.step()
        sch.step()

    # 'step' / 'step2'
    for gamma in (0.5, 0.1):
        opt = torch.optim.SGD([p], lr=base)
        sch = torch.optim.lr_scheduler.StepLR(opt, step_size=4, gamma=gamma)
        ours = schedules.step_lr(base, 4, gamma)
        for e in range(12):
            np.testing.assert_allclose(
                float(ours(e)), opt.param_groups[0]["lr"], rtol=1e-6)
            opt.step()
            sch.step()

    # 'step_warmstart' breakpoints
    ours = schedules.step_warmstart_lr(base, variant=1)
    assert float(ours(0)) == pytest.approx(0.01)
    assert float(ours(5)) == pytest.approx(0.1)
    assert float(ours(100)) == pytest.approx(0.01)
    assert float(ours(200)) == pytest.approx(0.001)
    ours = schedules.step_warmstart_lr(base, variant=2)
    assert float(ours(50)) == pytest.approx(0.01)
    assert float(ours(100)) == pytest.approx(0.001)


def test_reduce_lr_on_plateau():
    from cvssl_tpu.ops.schedules import ReduceLROnPlateau

    pl = ReduceLROnPlateau(factor=0.1, patience=2, threshold=0.01)
    assert pl.update(1.0) == 1.0
    assert pl.update(0.5) == 1.0          # improved
    for _ in range(2):
        assert pl.update(0.5) == 1.0      # within patience
    assert pl.update(0.5) == pytest.approx(0.1)  # patience exceeded
    assert pl.update(0.4) == pytest.approx(0.1)  # improvement keeps scale


# ---------------------------------------------------------------------------
# Grid attention: extra modes + TORR, parity vs reference torch
# ---------------------------------------------------------------------------

def _copy_grid_attention(sd):
    """Weight map for both _GridAttentionBlockND (phi 1x1 WITH bias) and the
    TORR variant (phi strided, bias=False — grid_attention_layer.py:243)."""
    phi = {"kernel": _conv_w(sd["phi.weight"])}
    if "phi.bias" in sd:
        phi["bias"] = sd["phi.bias"]
    params = {
        "theta": {"kernel": _conv_w(sd["theta.weight"])},
        "phi": phi,
        "psi": {"kernel": _conv_w(sd["psi.weight"]),
                "bias": sd["psi.bias"]},
        "W": {"kernel": _conv_w(sd["W.0.weight"]), "bias": sd["W.0.bias"]},
        "W_bn": {"scale": sd["W.1.weight"], "bias": sd["W.1.bias"]},
    }
    stats = {"W_bn": {"mean": sd["W.1.running_mean"],
                      "var": sd["W.1.running_var"]}}
    return params, stats


@pytest.mark.parametrize("mode", ["concatenation", "concatenation_debug",
                                  "concatenation_residual"])
def test_grid_attention_2d_modes_match_reference_torch(mode):
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    from networks.grid_attention_layer import \
        GridAttentionBlock2D as TorchGA

    from cvssl_tpu.models.attention_unet import GridAttentionBlock2D

    tm = TorchGA(in_channels=8, gating_channels=16, inter_channels=4,
                 mode=mode, sub_sample_factor=(2, 2))
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = _copy_grid_attention(sd)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    g = rng.normal(size=(2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ty, tatt = tm(torch.tensor(x), torch.tensor(g))

    fm = GridAttentionBlock2D(in_channels=8, inter_channels=4, mode=mode)
    fy, fatt = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(g.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(fy).transpose(0, 3, 1, 2),
                               ty.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fatt).transpose(0, 3, 1, 2),
                               tatt.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("mode", ["concatenation_sigmoid",
                                  "concatenation_softmax",
                                  "concatenation_mean",
                                  "concatenation_mean_flow",
                                  "concatenation_range_normalise"])
def test_grid_attention_torr_matches_reference_torch(mode):
    import torch
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    from networks.grid_attention_layer import \
        GridAttentionBlock2D_TORR as TorchGA

    from cvssl_tpu.models.attention_unet import GridAttentionBlock2DTORR

    tm = TorchGA(in_channels=8, gating_channels=8, inter_channels=4,
                 mode=mode, sub_sample_factor=(1, 1))
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = _copy_grid_attention(sd)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 12, 12)).astype(np.float32)
    g = rng.normal(size=(2, 8, 12, 12)).astype(np.float32)
    with torch.no_grad():
        ty, tatt = tm(torch.tensor(x), torch.tensor(g))

    fm = GridAttentionBlock2DTORR(in_channels=8, inter_channels=4,
                                  mode=mode)
    fy, fatt = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(g.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(fy).transpose(0, 3, 1, 2),
                               ty.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fatt).transpose(0, 3, 1, 2),
                               tatt.numpy(), atol=2e-4, rtol=1e-3)


def test_grid_attention_torr_psi_bias_warmstart():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.attention_unet import GridAttentionBlock2DTORR

    for mode, expect in (("concatenation_sigmoid", 3.0),
                         ("concatenation_softmax", 10.0),
                         ("concatenation_mean", 0.0)):
        m = GridAttentionBlock2DTORR(in_channels=4, inter_channels=2,
                                     mode=mode)
        v = m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 8, 8, 4)),
                   train=False)
        assert float(v["params"]["psi"]["bias"][0]) == expect


def test_grid_attention_torr_toggles():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.attention_unet import GridAttentionBlock2DTORR

    # identity theta/phi/psi/W: attention = sigmoid(relu(x + g)) pooled to
    # 1 channel never happens — psi off keeps inter_channels channels, so
    # use inter == in and verify shapes + no extra params
    m = GridAttentionBlock2DTORR(in_channels=4, inter_channels=4,
                                 use_w=False, use_phi=False,
                                 use_theta=False, use_psi=False,
                                 mode="concatenation_sigmoid")
    x = jnp.ones((1, 8, 8, 4))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    assert v.get("params", {}) == {}
    out, att = m.apply(v, x, x, train=False)
    assert out.shape == x.shape


# ---------------------------------------------------------------------------
# Feature extractor (HookBasedFeatureExtractor analog)
# ---------------------------------------------------------------------------

def test_extract_features():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from cvssl_tpu.utils.features import extract_features, extract_layers

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(4, (3, 3), name="stem")(x)
            h = nn.Conv(8, (3, 3), strides=2, name="mid")(h)
            return nn.Conv(2, (1, 1), name="head")(h)

    m = Tiny()
    x = jnp.ones((2, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x)

    out, feats = extract_features(m, v, x, "mid")
    assert out.shape == (2, 8, 8, 2)
    assert len(feats) == 1 and feats[0][1].shape == (2, 8, 8, 8)

    # upscale=True resizes to the input's spatial size (reference :432-437)
    _, feats = extract_features(m, v, x, "mid", upscale=True)
    assert feats[0][1].shape == (2, 16, 16, 8)

    _, feats = extract_layers(m, v, x, ["stem", "mid"])
    assert [f[0].split("/")[-1] for f in feats] == ["stem", "mid"]


def test_extract_features_real_unet():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models import net_factory
    from cvssl_tpu.utils.features import extract_layers

    m = net_factory("unet", in_chns=1, class_num=2)
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    names = []

    def collect(mdl, _):
        if mdl.name:
            names.append(mdl.name)
        return False

    m.apply(v, x, train=False, capture_intermediates=collect,
            mutable=["intermediates"])
    assert names, "no named submodules found"
    _, feats = extract_layers(m, v, x, [names[0]], train=False)
    assert feats
