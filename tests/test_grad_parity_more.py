"""Per-step GRADIENT parity vs the reference trainers — part 2.

Covers the 8 methods test_grad_parity.py does not: deep_co_training,
tripleview, cnn_meet_vit, contrastive_cross, contrastive_consistency,
adversarial, adversarial_consistency, exam_student_teacher. Same recipe:
torch init converted to flax, the reference's ACTUAL loss block run on
torch (in-step randomness — rotation k, ICT mix factors, teacher noise —
injected as constants reproducing the exact jax draw), loss at 1e-5
relative and every parameter gradient at the measured f32 cross-framework
floor (see test_grad_parity._assert_tree_close).

Where a reference script instantiates a ViT/Swin for one slot
(tripleview model3, cnn_meet_vit model2, the Contrastive_* ViT variants)
these tests use the reference torch UNet in that slot on BOTH sides: the
loss-block composition is model-agnostic and per-architecture forward
parity is pinned separately (test_torch_parity.py, cross_teaching grad
test). Dropout is zeroed on both sides as in part 1.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_grad_parity import (  # noqa: E402
    B, LB, PATCH, C, SEED, STEP,
    _assert_tree_close, _batch, _consistency_weight_torch, _ctx_noise_keys,
    _grads_to_flax, _init_to_flax, _nchw, _noise_to_torch, _our_grads,
    _our_modules, _torch_losses, _torch_unet)


class TestDeepCoTrainingGradParity:
    """train_deep_co_training_2D.py:138-158 — rotation-consistency CPS;
    the per-step random rotation count is the exact jax draw."""

    def test_loss_and_grads_match(self):
        import torch

        model = _torch_unet(SEED + 40)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(7)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        # the exact k the jax method draws (methods/co_training.py:25 —
        # FIRST next_rng() of the step)
        import jax
        k = int(jax.random.randint(_ctx_noise_keys(1)[0], (), 0, 4))

        # reference block (:138-158)
        outputs = model(vol)
        outputs_soft = torch.softmax(outputs, dim=1)
        rotated = torch.rot90(vol[LB:], k, [2, 3])
        rot_out = model(rotated)
        rot_soft = torch.softmax(rot_out, dim=1)
        loss_ce = ce_loss(outputs[:LB], lab[:LB])
        loss_dice = dice_loss(outputs_soft[:LB],
                              lab[:LB].unsqueeze(1).float())
        supervised_loss = 0.5 * (loss_dice + loss_ce)
        w = _consistency_weight_torch(STEP)
        consistency_loss = 0.5 * (
            torch.mean((rot_soft.detach() -
                        torch.rot90(outputs_soft[LB:], k, [2, 3])) ** 2) +
            torch.mean((rot_soft -
                        torch.rot90(outputs_soft[LB:].detach(),
                                    k, [2, 3])) ** 2))
        t_loss = supervised_loss + w * consistency_loss
        t_loss.backward()
        ref_grads = _grads_to_flax(model)

        params, bstats = _init_to_flax(model)
        modules = _our_modules(["model"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "deep_co_training", modules, {"model": params},
            {"model": bstats}, batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestTripleViewGradParity:
    """train_tripleview_2D(demo).py:290-336 — three models, pairwise CPS
    among all three; gradients on all three compared."""

    def test_loss_and_grads_match_all_models(self):
        import torch

        models = [_torch_unet(SEED + 50 + i) for i in range(3)]
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(8)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        # reference block (:290-336)
        outs = [m(vol) for m in models]
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
        modules = _our_modules(["model1", "model2", "model3"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "tripleview", modules,
            {f"model{i + 1}": inits[i][0] for i in range(3)},
            {f"model{i + 1}": inits[i][1] for i in range(3)}, batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        for i in range(3):
            _assert_tree_close(grads[f"model{i + 1}"], refs[i])


class TestCnnMeetVitGradParity:
    """train_cnn_meet_vit_2D.py:293-341 — CPS (x7 weight) + a mean-teacher
    branch on BOTH students whose EMA teacher tracks model2; linear ramp on
    iter//150, consistency gated before iter 1000 (tested past the gate)."""

    STEP_MV = 4500

    def test_loss_and_grads_match_both_models(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import ramps as ref_ramps

        m1, m2 = _torch_unet(SEED + 60), _torch_unet(SEED + 61)
        teacher = _torch_unet(SEED + 62)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(9)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()
        u = B - LB

        # the exact teacher noise the jax method draws (cnn_meet_vit.py:29)
        import jax
        import jax.numpy as jnp
        noise_j = jnp.clip(
            0.1 * jax.random.normal(_ctx_noise_keys(1)[0],
                                    (u, PATCH, PATCH, 1)), -0.2, 0.2)

        # reference block (:293-341)
        ema_inputs = vol[LB:] + _noise_to_torch(noise_j)
        out1, out2 = m1(vol), m2(vol)
        soft1, soft2 = torch.softmax(out1, 1), torch.softmax(out2, 1)
        with torch.no_grad():
            ema_soft = torch.softmax(teacher(ema_inputs), dim=1)
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
        ref1, ref2 = _grads_to_flax(m1), _grads_to_flax(m2)

        p1, b1 = _init_to_flax(m1)
        p2, b2 = _init_to_flax(m2)
        tp, tb = _init_to_flax(teacher)
        modules = _our_modules(["model1", "model2"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "cnn_meet_vit", modules, {"model1": p1, "model2": p2},
            {"model1": b1, "model2": b2}, batch,
            teacher_params={"model2": tp}, teacher_bstats={"model2": tb},
            step=self.STEP_MV)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


def _torch_heads(seed):
    """Reference contrastive heads (networks/projector.py) in train mode."""
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from networks.projector import classifier, projectors
    torch.manual_seed(seed)
    return classifier(), projectors()


def _head_to_flax(torch_head, kind):
    from cvssl_tpu.models.torch_convert import (
        convert_classifier_checkpoint, convert_projector_checkpoint)
    sd = {k: v.detach().numpy() for k, v in torch_head.state_dict().items()
          if "num_batches_tracked" not in k}
    fn = (convert_classifier_checkpoint if kind == "classifier"
          else convert_projector_checkpoint)
    return fn(sd)


class TestContrastiveCrossGradParity:
    """train_Contrastive_Cross_CNN_ViT_2D.py:204-272 — CPS + supervised
    contrastive on interleaved labeled logits (classifier heads) + ConLoss
    on unlabeled logits (projector heads); 2*sup + 0.5*contrast +
    1.25*semi; epoch-indexed ramp_up_function weight. Heads use the
    reference's exact torch init via the head converters; model1/model2
    gradients (which flow THROUGH the frozen heads) are compared."""

    def test_loss_and_grads_match(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import losses as ref_losses
        from utils import ramps as ref_ramps

        m1, m2 = _torch_unet(SEED + 70), _torch_unet(SEED + 71)
        tcls1, tproj1 = _torch_heads(SEED + 72)
        tcls2, tproj2 = _torch_heads(SEED + 73)
        for h in (tcls1, tcls2, tproj1, tproj2):
            h.train()
        ce_loss, dice_loss = _torch_losses()
        con_sup = ref_losses.contrastive_loss_sup()      # second def wins
        con_u = ref_losses.ConLoss()
        rng = np.random.default_rng(10)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        # labeled_slices_override=LB makes iters-per-epoch 1, so
        # epoch_num == iter_num on our side; match it here.
        epoch = STEP
        w = 0.1 * ref_ramps.ramp_up_function(epoch, 200.0)

        # reference block (:204-272)
        out1, out2 = m1(vol), m2(vol)
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
        ref1, ref2 = _grads_to_flax(m1), _grads_to_flax(m2)

        from cvssl_tpu.models import net_factory
        p1, b1 = _init_to_flax(m1)
        p2, b2 = _init_to_flax(m2)
        pc1, bc1 = _head_to_flax(tcls1, "classifier")
        pc2, bc2 = _head_to_flax(tcls2, "classifier")
        pp1, bp1 = _head_to_flax(tproj1, "projector")
        pp2, bp2 = _head_to_flax(tproj2, "projector")
        modules = _our_modules(["model1", "model2"])
        modules["classifier1"] = net_factory("classifier", class_num=C)
        modules["classifier2"] = net_factory("classifier", class_num=C)
        modules["projector1"] = net_factory("projector", class_num=C)
        modules["projector2"] = net_factory("projector", class_num=C)
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "contrastive_cross", modules,
            {"model1": p1, "model2": p2, "classifier1": pc1,
             "classifier2": pc2, "projector1": pp1, "projector2": pp2},
            {"model1": b1, "model2": b2, "classifier1": bc1,
             "classifier2": bc2, "projector1": bp1, "projector2": bp2},
            batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


class TestContrastiveConsistencyGradParity:
    """train_Contrastive_Consistency_ViT_2D.py:412-521 — dual students on
    weak/strong views, ensemble MASKED-normalized pseudo labels, four
    projector heads (1/2 are EMA copies outside any optimizer; the
    reference's ``feat_q.detach()`` is a no-op, so gradients DO flow from
    the contrast terms through projector1/2 into the weak logits — pinned
    here)."""

    def test_loss_and_grads_match(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import losses as ref_losses
        from utils import ramps as ref_ramps

        m1, m2 = _torch_unet(SEED + 80), _torch_unet(SEED + 81)
        heads = [_torch_heads(SEED + 82 + i)[1] for i in range(4)]  # proj 1-4
        for h in heads:
            h.train()
        ce_loss, dice_loss = _torch_losses()
        con_sup = ref_losses.contrastive_loss_sup()
        rng = np.random.default_rng(11)
        weak, label = _batch(rng)
        strong = (weak + rng.normal(0, 0.1, weak.shape)).astype(np.float32)
        wv, sv = _nchw(weak), _nchw(strong)
        lab = torch.tensor(label).long()

        t = STEP // 150
        w1 = 1.0 * ref_ramps.sigmoid_rampup(t, 200.0)
        w2 = 0.1 * ref_ramps.sigmoid_rampup(t, 200.0)

        def normalize(x):  # the faithful quirk (:223-228)
            mn = x.min(1, keepdim=True)[0]
            mx = x.max(1, keepdim=True)[0]
            return (x - mn) / mx

        # reference block (:412-521)
        ow1, os1 = m1(wv), m1(sv)
        ow2, os2 = m2(wv), m2(sv)
        sw1, ss1 = torch.softmax(ow1, 1), torch.softmax(os1, 1)
        sw2, ss2 = torch.softmax(ow2, 1), torch.softmax(os2, 1)
        mask1 = (normalize(sw1) > 0.8).float()
        masked1 = normalize(sw1) * mask1
        mask2 = (normalize(sw2) > 0.8).float()
        masked2 = normalize(sw2) * mask2
        masked = (masked1 + masked2) / 2
        pseudo = torch.argmax(masked.detach(), dim=1)
        sup = (ce_loss(ow1[:LB], lab[:LB]) +
               dice_loss(sw1[:LB], lab[:LB].unsqueeze(1).float()) +
               ce_loss(ow2[:LB], lab[:LB]) +
               dice_loss(sw2[:LB], lab[:LB].unsqueeze(1).float()))
        unsup = (ce_loss(os1[LB:], pseudo[LB:]) +
                 dice_loss(ss1[LB:], pseudo[LB:].unsqueeze(1).float()) +
                 ce_loss(os2[LB:], pseudo[LB:]) +
                 dice_loss(ss2[LB:], pseudo[LB:].unsqueeze(1).float()))
        lc_l = con_sup(heads[2](ow1[:LB]), heads[3](ow2[:LB]))
        lc_u1 = con_sup(heads[0](ow1[LB:]), heads[3](os2[LB:]))
        lc_u2 = con_sup(heads[1](ow2[LB:]), heads[2](os1[LB:]))
        t_loss = sup + w1 * lc_l + w1 * unsup + w2 * (lc_u1 + lc_u2)
        t_loss.backward()
        ref1, ref2 = _grads_to_flax(m1), _grads_to_flax(m2)

        from cvssl_tpu.models import net_factory
        p1, b1 = _init_to_flax(m1)
        p2, b2 = _init_to_flax(m2)
        hp = [_head_to_flax(h, "projector") for h in heads]
        modules = _our_modules(["model1", "model2"])
        params = {"model1": p1, "model2": p2}
        bstats = {"model1": b1, "model2": b2}
        for i in range(4):
            modules[f"projector{i + 1}"] = net_factory("projector",
                                                       class_num=C)
            params[f"projector{i + 1}"] = hp[i][0]
            bstats[f"projector{i + 1}"] = hp[i][1]
        batch = {"image_weak": weak[..., None],
                 "image_strong": strong[..., None],
                 "label_aug": label}
        o_loss, grads = _our_grads(
            "contrastive_consistency", modules, params, bstats, batch,
            cfg_kw={"conf_thresh": 0.8, "consistency1": 1.0,
                    "consistency2": 0.1})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


# ---------------------------------------------------------------------------
# DAN-based methods (the reference FCDiscriminator's hard-coded
# Linear(ndf*32) only type-checks at 224/256px, so these run at 224^2
# with a small batch)
# ---------------------------------------------------------------------------

BA, LBA, HWA = 4, 2, 224


def _torch_dan2d(seed, num_classes):
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from networks.discriminator import FCDiscriminator
    torch.manual_seed(seed)
    d = FCDiscriminator(num_classes=num_classes)
    d.train()
    return d


def _our_grads_d(method_name, modules, params, bstats, batch, cfg_kw=None,
                 wrt="dan", step=None):
    """jax.grad of Method.loss_d (the discriminator phase) w.r.t. one
    model's params, other params held constant — mirrors the reference's
    D-phase backward (only the DAN optimizer steps)."""
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.methods.base import get_method
    from cvssl_tpu.train.state import StepCtx

    base = dict(method=method_name, model="unet", num_classes=C,
                batch_size=BA, labeled_bs=LBA, patch_size=(HWA, HWA),
                labeled_slices_override=LBA, device_data=False,
                dtype="float32", s2d_levels=0, fused_loss=False)
    base.update(cfg_kw or {})
    cfg = TrainConfig(**base)
    method = get_method(method_name, cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p_wrt):
        p = dict(params)
        p[wrt] = p_wrt
        ctx = StepCtx(cfg, modules, p, bstats, {}, {},
                      jax.random.PRNGKey(0),
                      jnp.int32(STEP if step is None else step))
        ctx.extra = ()
        loss, metrics = method.loss_d(ctx, jbatch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params[wrt])
    return float(loss), grads


class TestAdversarialGradParity:
    """train_adversarial_network_2D_ViT.py:183-220 — both phases: the
    generator loss (supervised + w * CE fooling the eval-mode DAN on
    unlabeled rows) and the D phase (eval-mode generator detached, DAN in
    train mode — dropout zeroed on both sides for the comparison)."""

    def _setup(self):
        import torch

        model = _torch_unet(SEED + 90)
        dan = _torch_dan2d(SEED + 91, C)
        for mod in dan.modules():
            if type(mod).__name__ == "Dropout2d":
                mod.p = 0.0
        rng = np.random.default_rng(12)
        image = rng.normal(0.5, 0.25, (BA, HWA, HWA)).astype(np.float32)
        label = rng.integers(0, C, (BA, HWA, HWA)).astype(np.int32)
        return model, dan, image, label

    def _flax_modules(self):
        from cvssl_tpu.models.discriminator import FCDiscriminator
        from cvssl_tpu.models.unet import UNet
        return {"model": UNet(in_chns=1, num_classes=C,
                              dropout=(0.0,) * 5),
                "dan": FCDiscriminator(num_classes=C, drop=0.0)}

    def test_generator_loss_and_grads_match(self):
        import torch

        model, dan, image, label = self._setup()
        ce_loss, dice_loss = _torch_losses()
        vol, lab = _nchw(image), torch.tensor(label).long()

        # reference G block (:183-207); DAN_target[:labeled_bs] is all ones
        dan.eval()
        outputs = model(vol)
        outputs_soft = torch.softmax(outputs, dim=1)
        loss_ce = ce_loss(outputs[:LBA], lab[:LBA])
        loss_dice = dice_loss(outputs_soft[:LBA],
                              lab[:LBA].unsqueeze(1).float())
        supervised_loss = 0.5 * (loss_dice + loss_ce)
        w = _consistency_weight_torch(STEP)
        dan_out = dan(outputs_soft[LBA:], vol[LBA:])
        target = torch.ones(BA - LBA).long()
        consistency_loss = torch.nn.functional.cross_entropy(dan_out, target)
        t_loss = supervised_loss + w * consistency_loss
        t_loss.backward()
        ref_grads = _grads_to_flax(model)

        from cvssl_tpu.models.torch_convert import (
            convert_discriminator2d_checkpoint)
        params, bstats = _init_to_flax(model)
        dan_params = convert_discriminator2d_checkpoint(
            {k: v.detach().numpy() for k, v in dan.state_dict().items()})
        modules = self._flax_modules()
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "adversarial", modules,
            {"model": params, "dan": dan_params},
            {"model": bstats, "dan": {}}, batch,
            cfg_kw={"batch_size": BA, "labeled_bs": LBA,
                    "labeled_slices_override": LBA,
                    "patch_size": (HWA, HWA)})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)

    def test_discriminator_loss_and_grads_match(self):
        import torch

        model, dan, image, label = self._setup()
        vol = _nchw(image)

        # reference D block (:209-220)
        model.eval()
        dan.train()
        with torch.no_grad():
            outputs = model(vol)
            outputs_soft = torch.softmax(outputs, dim=1)
        dan_out = dan(outputs_soft, vol)
        target = torch.tensor([1] * LBA + [0] * (BA - LBA)).long()
        d_loss = torch.nn.functional.cross_entropy(dan_out, target)
        d_loss.backward()
        grad_sd = {}
        for name, p in dan.named_parameters():
            grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                             else np.zeros(p.shape, np.float32))

        from cvssl_tpu.models.torch_convert import (
            convert_discriminator2d_checkpoint)
        params, bstats = _init_to_flax(model)
        dan_params = convert_discriminator2d_checkpoint(
            {k: v.detach().numpy() for k, v in dan.state_dict().items()})
        ref_dan_grads = convert_discriminator2d_checkpoint(grad_sd)
        modules = self._flax_modules()
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads_d(
            "adversarial", modules,
            {"model": params, "dan": dan_params},
            {"model": bstats, "dan": {}}, batch)

        assert o_loss == pytest.approx(float(d_loss), rel=1e-5)
        _assert_tree_close(grads, ref_dan_grads)


class TestAdversarialConsistencyGradParity:
    """train_adversarial_consistency_ViT_2D.py:198-252 — ICT mixing (the
    exact jax Beta draw injected), EMA teacher on the unlabeled halves,
    1.5*(2*dice+ce) + w*(ict_mse + 0.5*dan_ce), and the :241 quirk where
    the DAN sees rows lb//2 onward paired with the unlabeled images."""

    def test_loss_and_grads_match(self):
        import torch

        model = _torch_unet(SEED + 92)
        teacher = _torch_unet(SEED + 93)
        dan = _torch_dan2d(SEED + 94, C)
        dan.eval()
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(13)
        image = rng.normal(0.5, 0.25, (BA, HWA, HWA)).astype(np.float32)
        label = rng.integers(0, C, (BA, HWA, HWA)).astype(np.int32)
        vol, lab = _nchw(image), torch.tensor(label).long()
        half = (BA - LBA) // 2

        # the exact mix factors the jax method draws
        # (adversarial_consistency.py:29 — FIRST next_rng() of the step)
        import jax
        mix_j = jax.random.beta(_ctx_noise_keys(1)[0], 0.2, 0.2,
                                (half, 1, 1, 1))
        mix_t = torch.tensor(np.asarray(mix_j))

        # reference block (:198-252)
        u0, u1 = vol[LBA:LBA + half], vol[LBA + half:]
        batch_ux_mixed = u0 * (1.0 - mix_t) + u1 * mix_t
        inputs = torch.cat([vol[:LBA], batch_ux_mixed], dim=0)
        outputs = model(inputs)
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema0 = torch.softmax(teacher(u0), dim=1)
            ema1 = torch.softmax(teacher(u1), dim=1)
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
        ref_grads = _grads_to_flax(model)

        from cvssl_tpu.models.torch_convert import (
            convert_discriminator2d_checkpoint)
        params, bstats = _init_to_flax(model)
        tparams, tbstats = _init_to_flax(teacher)
        dan_params = convert_discriminator2d_checkpoint(
            {k: v.detach().numpy() for k, v in dan.state_dict().items()})
        from cvssl_tpu.models.discriminator import FCDiscriminator
        from cvssl_tpu.models.unet import UNet
        modules = {"model": UNet(in_chns=1, num_classes=C,
                                 dropout=(0.0,) * 5),
                   "dan": FCDiscriminator(num_classes=C, drop=0.0)}
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "adversarial_consistency", modules,
            {"model": params, "dan": dan_params},
            {"model": bstats, "dan": {}}, batch,
            teacher_params={"model": tparams},
            teacher_bstats={"model": tbstats},
            cfg_kw={"batch_size": BA, "labeled_bs": LBA,
                    "labeled_slices_override": LBA,
                    "patch_size": (HWA, HWA), "ict_alpha": 0.2})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestExamStudentTeacherGradParity:
    """train_exam_student_teacher_3D.py:148-186 — 3D mean teacher + FC3D
    examiner; (2*dice + ce) + w*(2*mse + dan_ce). unet_3D at the
    reference's 96^3 (the FC3DDiscriminator's AvgPool3d(6) requires it),
    batch 2 to bound CPU cost; dropout zeroed on both sides."""

    def test_loss_and_grads_match(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        torch.nn.Module.cuda = lambda self, *a, **k: self
        from networks.discriminator import FC3DDiscriminator
        from networks.unet_3D import unet_3D

        NC, BE, LBE, PS = 2, 2, 1, 96

        def mk_unet3d(seed):
            torch.manual_seed(seed)
            m = unet_3D(n_classes=NC, in_channels=1)
            for mod in m.modules():
                if type(mod).__name__ == "Dropout":
                    mod.p = 0.0
            m.train()
            return m

        student = mk_unet3d(SEED + 95)
        teacher = mk_unet3d(SEED + 96)
        torch.manual_seed(SEED + 97)
        dan = FC3DDiscriminator(num_classes=NC)
        dan.eval()

        import reference_shim  # noqa: F401 (stubs already installed)
        from utils import losses as ref_losses
        ce_loss = torch.nn.CrossEntropyLoss()
        dice_loss = ref_losses.DiceLoss(NC)

        rng = np.random.default_rng(14)
        image = rng.normal(0.5, 0.25, (BE, PS, PS, PS)).astype(np.float32)
        label = rng.integers(0, NC, (BE, PS, PS, PS)).astype(np.int32)
        vol = torch.tensor(image[:, None])
        lab = torch.tensor(label).long()
        u = BE - LBE

        # the exact noise the jax method draws (exam.py:26 — FIRST
        # next_rng() of the step)
        import jax
        import jax.numpy as jnp
        noise_j = jnp.clip(
            0.1 * jax.random.normal(_ctx_noise_keys(1)[0],
                                    (u, PS, PS, PS, 1)), -0.2, 0.2)
        noise_t = torch.tensor(np.moveaxis(np.asarray(noise_j), -1, 1))

        # reference block (:148-186)
        ema_inputs = vol[LBE:] + noise_t
        outputs = student(vol)
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema_soft = torch.softmax(teacher(ema_inputs), dim=1)
        loss_ce = ce_loss(outputs[:LBE], lab[:LBE])
        loss_dice = dice_loss(outputs_soft[:LBE],
                              lab[:LBE].unsqueeze(1).float())
        supervised_loss = 2 * loss_dice + loss_ce
        w = _consistency_weight_torch(STEP)
        consistency_loss = torch.mean(
            (outputs_soft[LBE:] - ema_soft) ** 2)
        dan_out = dan(outputs_soft[LBE:], vol[LBE:])
        target = torch.ones(u).long()
        cons_dan = torch.nn.functional.cross_entropy(dan_out, target)
        t_loss = supervised_loss + w * (2 * consistency_loss + cons_dan)
        t_loss.backward()

        from cvssl_tpu.models.torch_convert import (
            convert_discriminator3d_checkpoint, convert_unet3d_checkpoint)
        sd = {k: v.detach().numpy() for k, v in student.state_dict().items()}
        params = convert_unet3d_checkpoint(sd)
        grad_sd = {}
        for name, p in student.named_parameters():
            grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                             else np.zeros(p.shape, np.float32))
        ref_grads = convert_unet3d_checkpoint(grad_sd)
        tparams = convert_unet3d_checkpoint(
            {k: v.detach().numpy() for k, v in teacher.state_dict().items()})
        dan_params = convert_discriminator3d_checkpoint(
            {k: v.detach().numpy() for k, v in dan.state_dict().items()})

        from cvssl_tpu.models.discriminator import (
            FC3DDiscriminator as FlaxDan3D)
        from cvssl_tpu.models.unet3d import UNet3D
        modules = {"model": UNet3D(in_chns=1, num_classes=NC, dropout=0.0),
                   "dan": FlaxDan3D(num_classes=NC, drop=0.0)}
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "exam_student_teacher", modules,
            {"model": params, "dan": dan_params},
            {"model": {}, "dan": {}}, batch,
            teacher_params={"model": tparams},
            teacher_bstats={"model": {}},
            cfg_kw={"dim": 3, "num_classes": NC, "batch_size": BE,
                    "labeled_bs": LBE, "labeled_slices_override": LBE,
                    "patch_size": (PS, PS, PS), "model": "unet_3D"})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)
