"""Per-step GRADIENT parity vs the reference trainers — part 3: the REAL
SwinUnet in the ViT slot (VERDICT r4 item 4).

test_grad_parity_more.py pinned the loss-block composition of these methods
with a torch UNet standing in for the ViT slot; these tests close the gap by
running the reference's ACTUAL SwinTransformerSys in that slot on the torch
side and our SwinUnet (same weights via convert_swinunet_full) on ours:

* tripleview       — model3 = ViT   (``train_tripleview_2D(demo).py:218-233``)
* cnn_meet_vit     — model2 + EMA teacher = ViT (``train_cnn_meet_vit_2D.py:
                     219-226``)
* contrastive_cross— model2 = ViT   (``train_Contrastive_Cross_CNN_ViT_2D.py:
                     139-141``)
* adversarial_consistency — model + EMA teacher = ViT
                     (``train_adversarial_consistency_ViT_2D.py:144-151``)

Swin geometry: the small-proof geometry from the long-horizon harness
(img 64, window 4 — grids 16/8/4; the effective reference config is the
swin_tiny *_lite.yaml: embed 96, depths [2,2,2,2], heads [3,6,12,24]),
except adversarial_consistency which must run 224^2 / window 7 because the
reference FCDiscriminator's hard-coded Linear(ndf*32) only type-checks at
224/256px. drop_path/dropout zeroed on both sides (the only stochastic
ops); loss at 1e-4 rel (Swin's longer f32 reduction chains — same bound as
test_grad_parity.py's cross_teaching) and gradients at the measured f32
cross-framework floor.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_grad_parity import (  # noqa: E402
    B, LB, PATCH, C, SEED, STEP,
    _assert_tree_close, _batch, _consistency_weight_torch, _ctx_noise_keys,
    _grads_to_flax, _init_to_flax, _nchw, _our_grads,
    _our_modules, _torch_losses, _torch_unet)
from test_grad_parity_more import (  # noqa: E402
    BA, LBA, HWA, _head_to_flax, _torch_dan2d, _torch_heads)


def _torch_swin(seed, img=PATCH, window=4):
    """Reference SwinTransformerSys at the *_lite.yaml geometry, drop_path
    zeroed (run-only, never copied)."""
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from networks.swin_transformer_unet_skip_expand_decoder_sys import (
        SwinTransformerSys)
    torch.manual_seed(seed)
    m = SwinTransformerSys(
        img_size=img, patch_size=4, in_chans=3, num_classes=C,
        embed_dim=96, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24],
        window_size=window, drop_path_rate=0.0)
    m.train()
    return m


def _swin_to_flax(tswin, img=PATCH, window=4):
    """(flax module, converted params). The same full-model converter the
    production .pth ingest uses; grads convert through the same mapping."""
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.models.swin_checkpoint import convert_swinunet_full
    from cvssl_tpu.models.swin_unet import SwinUnet

    fswin = SwinUnet(num_classes=C, drop_path_rate=0.0, img_size=img,
                     window_size=window)
    variables = fswin.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, img, img, 1)), train=False)
    sd = {k: v.detach().numpy() for k, v in tswin.state_dict().items()
          if "attn_mask" not in k and "relative_position_index" not in k}
    params, report = convert_swinunet_full(sd, variables["params"])
    assert report["skipped"] == 0, report
    import jax.tree_util as jtu
    return fswin, jtu.tree_map(jnp.asarray, params), variables["params"]


def _swin_grads_to_flax(tswin, template):
    from cvssl_tpu.models.swin_checkpoint import convert_swinunet_full
    grad_sd = {}
    for name, p in tswin.named_parameters():
        grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                         else np.zeros(p.shape, np.float32))
    grads, _ = convert_swinunet_full(grad_sd, template)
    return grads


def _repeat3(x):
    return x.repeat(1, 3, 1, 1)  # ViT_seg's 1->3ch input tiling


class TestTripleViewSwinSlotGradParity:
    """tripleview with model3 = REAL Swin — gradients on all three models
    (the two CNNs see the Swin only through stop-gradient pseudo labels,
    the Swin's own CPS terms flow through window attention)."""

    def test_loss_and_grads_match_all_models(self):
        import torch

        models = [_torch_unet(SEED + 150 + i) for i in range(2)]
        tswin = _torch_swin(SEED + 152)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(21)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        # reference block (:290-336), model3 = ViT (1->3ch repeat)
        outs = [m(vol) for m in models] + [tswin(_repeat3(vol))]
        softs = [torch.softmax(o, 1) for o in outs]
        sups = [0.5 * (ce_loss(o[:LB], lab[:LB]) +
                       dice_loss(s[:LB], lab[:LB].unsqueeze(1).float()))
                for o, s in zip(outs, softs)]
        pseudos = [torch.argmax(s[LB:].detach(), dim=1) for s in softs]
        w = _consistency_weight_torch(STEP)
        t_loss = 0.0
        for i in range(3):
            ps = sum(dice_loss(softs[i][LB:], pseudos[j].unsqueeze(1).float())
                     for j in range(3) if j != i)
            t_loss = t_loss + sups[i] + w * ps
        t_loss.backward()
        refs = [_grads_to_flax(m) for m in models]

        inits = [_init_to_flax(m) for m in models]
        fswin, p3, template = _swin_to_flax(tswin)
        ref3 = _swin_grads_to_flax(tswin, template)
        modules = _our_modules(["model1", "model2"])
        modules["model3"] = fswin
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "tripleview", modules,
            {"model1": inits[0][0], "model2": inits[1][0], "model3": p3},
            {"model1": inits[0][1], "model2": inits[1][1], "model3": {}},
            batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-4)
        for i in range(2):
            _assert_tree_close(grads[f"model{i + 1}"], refs[i])
        _assert_tree_close(grads["model3"], ref3)


class TestCnnMeetVitSwinSlotGradParity:
    """cnn_meet_vit with model2 = Swin AND the EMA teacher = Swin (a
    LayerNorm teacher — no running stats; the reference adds the input
    noise BEFORE ViT_seg's 1->3ch repeat, matched here)."""

    STEP_MV = 4500  # past the iter<1000 consistency gate

    def test_loss_and_grads_match_both_models(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import ramps as ref_ramps

        m1 = _torch_unet(SEED + 160)
        tswin = _torch_swin(SEED + 161)
        teacher = _torch_swin(SEED + 162)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(22)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()
        u = B - LB

        import jax
        noise_j = jax.numpy.clip(
            0.1 * jax.random.normal(_ctx_noise_keys(1)[0],
                                    (u, PATCH, PATCH, 1)), -0.2, 0.2)
        from test_grad_parity import _noise_to_torch
        noise_t = _noise_to_torch(noise_j)

        # reference block (:293-341) with the ViT slots live
        ema_inputs = vol[LB:] + noise_t              # noise on the 1ch input
        out1, out2 = m1(vol), tswin(_repeat3(vol))
        soft1, soft2 = torch.softmax(out1, 1), torch.softmax(out2, 1)
        with torch.no_grad():
            ema_soft = torch.softmax(teacher(_repeat3(ema_inputs)), dim=1)
        loss1 = 0.5 * (ce_loss(out1[:LB], lab[:LB]) +
                       dice_loss(soft1[:LB], lab[:LB].unsqueeze(1).float()))
        loss2 = 0.5 * (ce_loss(out2[:LB], lab[:LB]) +
                       dice_loss(soft2[:LB], lab[:LB].unsqueeze(1).float()))
        pseudo1 = torch.argmax(soft1[LB:].detach(), dim=1)
        pseudo2 = torch.argmax(soft2[LB:].detach(), dim=1)
        ps1 = dice_loss(soft1[LB:], pseudo2.unsqueeze(1).float())
        ps2 = dice_loss(soft2[LB:], pseudo1.unsqueeze(1).float())
        w = 0.1 * ref_ramps.linear_rampup(self.STEP_MV // 150, 200.0)
        cons1 = torch.mean((soft1[LB:] - ema_soft) ** 2)
        cons2 = torch.mean((soft2[LB:] - ema_soft) ** 2)
        t_loss = (loss1 + 7 * w * ps1 + w * cons1 +
                  loss2 + 7 * w * ps2 + w * cons2)
        t_loss.backward()
        ref1 = _grads_to_flax(m1)

        p1, b1 = _init_to_flax(m1)
        fswin, p2, template = _swin_to_flax(tswin)
        ref2 = _swin_grads_to_flax(tswin, template)
        _, tp, _ = _swin_to_flax(teacher)
        modules = _our_modules(["model1"])
        modules["model2"] = fswin
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "cnn_meet_vit", modules, {"model1": p1, "model2": p2},
            {"model1": b1, "model2": {}}, batch,
            teacher_params={"model2": tp}, teacher_bstats={"model2": {}},
            step=self.STEP_MV)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-4)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


class TestContrastiveCrossSwinSlotGradParity:
    """contrastive_cross with model2 = Swin: the contrastive heads
    (classifier2/projector2) consume the Swin LOGITS, so head gradients
    flow back through the full decoder/expand chain."""

    def test_loss_and_grads_match(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import losses as ref_losses
        from utils import ramps as ref_ramps

        m1 = _torch_unet(SEED + 170)
        tswin = _torch_swin(SEED + 171)
        tcls1, tproj1 = _torch_heads(SEED + 172)
        tcls2, tproj2 = _torch_heads(SEED + 173)
        for h in (tcls1, tcls2, tproj1, tproj2):
            h.train()
        ce_loss, dice_loss = _torch_losses()
        con_sup = ref_losses.contrastive_loss_sup()
        con_u = ref_losses.ConLoss()
        rng = np.random.default_rng(23)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        epoch = STEP  # labeled_slices_override=LB -> 1 iter/epoch
        w = 0.1 * ref_ramps.ramp_up_function(epoch, 200.0)

        # reference block (:204-272) with model2 = ViT
        out1, out2 = m1(vol), tswin(_repeat3(vol))
        soft1, soft2 = torch.softmax(out1, 1), torch.softmax(out2, 1)
        loss1 = 0.5 * (ce_loss(out1[:LB], lab[:LB]) +
                       dice_loss(soft1[:LB], lab[:LB].unsqueeze(1).float()))
        loss2 = 0.5 * (ce_loss(out2[:LB], lab[:LB]) +
                       dice_loss(soft2[:LB], lab[:LB].unsqueeze(1).float()))
        pseudo1 = torch.argmax(soft1[LB:].detach(), dim=1)
        pseudo2 = torch.argmax(soft2[LB:].detach(), dim=1)
        ps1 = dice_loss(soft1[LB:], pseudo2.unsqueeze(1).float())
        ps2 = dice_loss(soft2[LB:], pseudo1.unsqueeze(1).float())
        supervised = loss1 + loss2
        semi = w * ps1 + w * ps2
        feat_l_q = tcls1(out1[:LB][0::2])
        feat_l_k = tcls2(out2[:LB][1::2])
        lc_l = con_sup(feat_l_q, feat_l_k)
        feat_q = tproj1(out1[LB:])
        feat_k = tproj2(out2[LB:])
        lc_u = con_u(feat_q, feat_k)
        t_loss = 2 * supervised + 0.5 * (lc_l + lc_u) + 1.25 * semi
        t_loss.backward()
        ref1 = _grads_to_flax(m1)

        from cvssl_tpu.models import net_factory
        p1, b1 = _init_to_flax(m1)
        fswin, p2, template = _swin_to_flax(tswin)
        ref2 = _swin_grads_to_flax(tswin, template)
        pc1, bc1 = _head_to_flax(tcls1, "classifier")
        pc2, bc2 = _head_to_flax(tcls2, "classifier")
        pp1, bp1 = _head_to_flax(tproj1, "projector")
        pp2, bp2 = _head_to_flax(tproj2, "projector")
        modules = _our_modules(["model1"])
        modules["model2"] = fswin
        modules["classifier1"] = net_factory("classifier", class_num=C)
        modules["classifier2"] = net_factory("classifier", class_num=C)
        modules["projector1"] = net_factory("projector", class_num=C)
        modules["projector2"] = net_factory("projector", class_num=C)
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "contrastive_cross", modules,
            {"model1": p1, "model2": p2, "classifier1": pc1,
             "classifier2": pc2, "projector1": pp1, "projector2": pp2},
            {"model1": b1, "model2": {}, "classifier1": bc1,
             "classifier2": bc2, "projector1": bp1, "projector2": bp2},
            batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-4)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


class TestAdversarialConsistencySwinGradParity:
    """adversarial_consistency with the REAL ViT generator + ViT EMA
    teacher at the reference geometry (224^2 / window 7 — the
    FCDiscriminator's hard-coded Linear(ndf*32) requires it; batch 4)."""

    def test_loss_and_grads_match(self):
        import torch

        tswin = _torch_swin(SEED + 180, img=HWA, window=7)
        teacher = _torch_swin(SEED + 181, img=HWA, window=7)
        dan = _torch_dan2d(SEED + 182, C)
        dan.eval()
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(24)
        image = rng.normal(0.5, 0.25, (BA, HWA, HWA)).astype(np.float32)
        label = rng.integers(0, C, (BA, HWA, HWA)).astype(np.int32)
        vol, lab = _nchw(image), torch.tensor(label).long()
        half = (BA - LBA) // 2

        import jax
        mix_j = jax.random.beta(_ctx_noise_keys(1)[0], 0.2, 0.2,
                                (half, 1, 1, 1))
        mix_t = torch.tensor(np.asarray(mix_j))

        # reference block (:198-252), generator = ViT
        u0, u1 = vol[LBA:LBA + half], vol[LBA + half:]
        batch_ux_mixed = u0 * (1.0 - mix_t) + u1 * mix_t
        inputs = torch.cat([vol[:LBA], batch_ux_mixed], dim=0)
        outputs = tswin(_repeat3(inputs))
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema0 = torch.softmax(teacher(_repeat3(u0)), dim=1)
            ema1 = torch.softmax(teacher(_repeat3(u1)), dim=1)
            batch_pred_mixed = ema0 * (1.0 - mix_t) + ema1 * mix_t
        loss_ce = ce_loss(outputs[:LBA], lab[:LBA])
        loss_dice = dice_loss(outputs_soft[:LBA],
                              lab[:LBA].unsqueeze(1).float())
        supervised_loss = 2 * loss_dice + loss_ce
        w = _consistency_weight_torch(STEP)
        dan_out = dan(outputs_soft[LBA // 2:], vol[LBA:])
        cons_ict = torch.mean((outputs_soft[LBA:] - batch_pred_mixed) ** 2)
        target = torch.ones(dan_out.shape[0]).long()
        cons_dan = torch.nn.functional.cross_entropy(dan_out, target)
        t_loss = 1.5 * supervised_loss + w * (cons_ict + 0.5 * cons_dan)
        t_loss.backward()

        from cvssl_tpu.models.torch_convert import (
            convert_discriminator2d_checkpoint)
        fswin, params, template = _swin_to_flax(tswin, img=HWA, window=7)
        ref_grads = _swin_grads_to_flax(tswin, template)
        _, tparams, _ = _swin_to_flax(teacher, img=HWA, window=7)
        dan_params = convert_discriminator2d_checkpoint(
            {k: v.detach().numpy() for k, v in dan.state_dict().items()})
        from cvssl_tpu.models.discriminator import FCDiscriminator
        modules = {"model": fswin,
                   "dan": FCDiscriminator(num_classes=C, drop=0.0)}
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "adversarial_consistency", modules,
            {"model": params, "dan": dan_params},
            {"model": {}, "dan": {}}, batch,
            teacher_params={"model": tparams},
            teacher_bstats={"model": {}},
            cfg_kw={"batch_size": BA, "labeled_bs": LBA,
                    "labeled_slices_override": LBA,
                    "patch_size": (HWA, HWA), "ict_alpha": 0.2})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-4)
        _assert_tree_close(grads["model"], ref_grads)
