"""Pretrained-encoder converters (models/cnn_checkpoint.py).

Res2Net: REAL same-weights forward parity — a randomly initialized
reference torch Res2Net (``Res2Net_v1b.py``) is converted and its
stem/layer outputs compared against our flax encoder (the pattern
test_torch_parity.py uses). EfficientNet: efficientnet_pytorch does not
exist in this image, so the test validates that the converter's walk
covers the B3 encoder's full param tree with correctly shaped tensors and
that values land where they should."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")


def test_res2net_converter_forward_parity():
    import torch

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REFERENCE)
    from networks.Res2Net_v1b import Bottle2neck, Res2Net  # run-only

    from cvssl_tpu.models.cnn_checkpoint import convert_res2net_encoder
    from cvssl_tpu.models.resunet import Res2NetEncoder

    torch.manual_seed(0)
    tm = Res2Net(Bottle2neck, [1, 1, 1, 1], baseWidth=26, scale=4)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_res2net_encoder(sd, layers=(1, 1, 1))

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        t = torch.tensor(x)
        stem_t = tm.relu(tm.bn1(tm.conv1(t)))
        h = tm.maxpool(stem_t)
        f1_t = tm.layer1(h)
        f2_t = tm.layer2(f1_t)
        f3_t = tm.layer3(f2_t)

    enc = Res2NetEncoder(layers=(1, 1, 1))
    stem, (f1, f2, f3) = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    for ours, theirs, name in ((stem, stem_t, "stem"), (f1, f1_t, "l1"),
                               (f2, f2_t, "l2"), (f3, f3_t, "l3")):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=name)


def _fake_torch_sd_for_b3(params, stats):
    """Torch-layout state_dict built from a flax init tree (inverse of the
    converter's mapping), using efficientnet_pytorch's naming."""
    from cvssl_tpu.models.efficientunet import _B0_STAGES, _round_repeats

    def inv_conv(kernel):
        return np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    def inv_bn(bn_p, bn_s):
        return {"weight": np.asarray(bn_p["scale"]),
                "bias": np.asarray(bn_p["bias"]),
                "running_mean": np.asarray(bn_s["mean"]),
                "running_var": np.asarray(bn_s["var"])}

    sd = {"_conv_stem.weight": inv_conv(params["Conv_0"]["kernel"])}
    for k, v in inv_bn(params["BatchNorm_0"], stats["BatchNorm_0"]).items():
        sd[f"_bn0.{k}"] = v
    bi = 0
    for (t, _, _, _, r) in _B0_STAGES:
        for _ in range(_round_repeats(r, 1.4)):
            bp = params[f"MBConv_{bi}"]
            bs = stats[f"MBConv_{bi}"]
            blk = f"_blocks.{bi}"
            ci = ni = 0
            if t != 1:
                sd[f"{blk}._expand_conv.weight"] = inv_conv(
                    bp[f"Conv_{ci}"]["kernel"])
                for k, v in inv_bn(bp[f"BatchNorm_{ni}"],
                                   bs[f"BatchNorm_{ni}"]).items():
                    sd[f"{blk}._bn0.{k}"] = v
                ci += 1
                ni += 1
            sd[f"{blk}._depthwise_conv.weight"] = inv_conv(
                bp[f"Conv_{ci}"]["kernel"])
            for k, v in inv_bn(bp[f"BatchNorm_{ni}"],
                               bs[f"BatchNorm_{ni}"]).items():
                sd[f"{blk}._bn1.{k}"] = v
            ci += 1
            ni += 1
            for tag, idx in (("_se_reduce", ci), ("_se_expand", ci + 1)):
                sd[f"{blk}.{tag}.weight"] = inv_conv(
                    bp[f"Conv_{idx}"]["kernel"])
                sd[f"{blk}.{tag}.bias"] = np.asarray(
                    bp[f"Conv_{idx}"]["bias"])
            sd[f"{blk}._project_conv.weight"] = inv_conv(
                bp[f"Conv_{ci + 2}"]["kernel"])
            for k, v in inv_bn(bp[f"BatchNorm_{ni}"],
                               bs[f"BatchNorm_{ni}"]).items():
                sd[f"{blk}._bn2.{k}"] = v
            bi += 1
    return sd


def test_efficientnet_converter_covers_full_tree():
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.cnn_checkpoint import convert_efficientnet_encoder
    from cvssl_tpu.models.efficientunet import EfficientNetEncoder

    enc = EfficientNetEncoder()
    v = enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 64, 64, 3)), train=False)
    sd = _fake_torch_sd_for_b3(v["params"], v["batch_stats"])
    params, stats = convert_efficientnet_encoder(sd)

    flat_ref = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(v["params"])}
    flat_got = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(params)}
    assert set(flat_ref) == set(flat_got)
    for k in flat_ref:
        np.testing.assert_array_equal(flat_got[k], flat_ref[k], err_msg=k)
    # batch_stats too
    flat_ref = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(v["batch_stats"])}
    flat_got = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                jax.tree_util.tree_leaves_with_path(stats)}
    assert set(flat_ref) == set(flat_got)


def test_maybe_load_encoder_and_missing_file_error(tmp_path):
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.cnn_checkpoint import (load_torch_state_dict,
                                                 maybe_load_encoder)
    from cvssl_tpu.models.efficientunet import EffiUNet

    with pytest.raises(FileNotFoundError, match="pretrained checkpoint"):
        load_torch_state_dict(str(tmp_path / "missing.pth"))

    model = EffiUNet(in_chns=1, num_classes=4)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 1)), train=False)
    sd = _fake_torch_sd_for_b3(
        v["params"]["EfficientNetEncoder_0"],
        v["batch_stats"]["EfficientNetEncoder_0"])
    p2, s2, ok = maybe_load_encoder(model, v["params"], v["batch_stats"], sd)
    assert ok
    y = model.apply({"params": p2, "batch_stats": s2},
                    jnp.zeros((1, 64, 64, 1)), train=False)
    assert y.shape == (1, 64, 64, 4)
