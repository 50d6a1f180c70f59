"""Per-step GRADIENT parity vs the reference trainers.

Same weights (torch init converted to flax), same batch, same iteration →
the loss AND every parameter gradient must match the reference loss block
to float32 numerical tolerance. This pins the step math (BN train-mode
semantics, softmax/dice/CE composition, consistency weighting) far tighter
than the trajectory bands in test_fit_parity.py.

Randomness is removed by zeroing dropout on both sides (reference UNet's
only stochastic op); methods covered here have no other in-step noise:
  supervised      — train_fully_supervised_2D.py:109-114
  cps             — train_cross_pseudo_supervision_2D.py:175-197
  fixmatch        — train_Fixmatch_CNN_2D.py:259-290 (incl. comp loss
                    :132-159 and the minmax-normalize quirk :161-166)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

B, LB, PATCH, C = 8, 4, 64, 4
SEED = 1337
STEP = 300  # consistency_weight = 0.1 * sigmoid_rampup(300//150, 200)


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

def _torch_unet(seed):
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from networks.unet import UNet as TorchUNet
    torch.manual_seed(seed)
    m = TorchUNet(1, C)
    for mod in m.modules():
        if type(mod).__name__ == "Dropout":
            mod.p = 0.0
    m.train()
    return m


def _torch_losses():
    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from torch.nn import CrossEntropyLoss

    from utils import losses as ref_losses
    return CrossEntropyLoss(), ref_losses.DiceLoss(C)


def _grads_to_flax(model):
    """torch grads -> flax param tree via the checkpoint converter (grads
    carry the same names as the weights; BN running stats have no grads)."""
    from cvssl_tpu.models.torch_convert import convert_unet_checkpoint
    sd = {}
    for name, p in model.named_parameters():
        sd[name] = (p.grad.detach().numpy() if p.grad is not None
                    else np.zeros(p.shape, np.float32))
    for name, b in model.named_buffers():  # running_mean/var placeholders
        sd[name] = b.detach().numpy() * 0.0
    grads, _ = convert_unet_checkpoint(sd)
    return grads


def _init_to_flax(model):
    from cvssl_tpu.models.torch_convert import convert_unet_checkpoint
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_unet_checkpoint(sd)


def _consistency_weight_torch(iter_num):
    """get_current_consistency_weight(iter//150) with the reference
    defaults consistency=0.1, rampup=200 (train_cross_pseudo_...:62-66)."""
    from utils import ramps as ref_ramps
    return 0.1 * ref_ramps.sigmoid_rampup(iter_num // 150, 200.0)


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def _our_modules(names):
    from cvssl_tpu.models.unet import UNet
    return {n: UNet(in_chns=1, num_classes=C, dropout=(0.0,) * 5)
            for n in names}


def _our_grads(method_name, modules, params, bstats, batch, cfg_kw=None,
               teacher_params=None, teacher_bstats=None, step=None):
    """jax.grad of the ACTUAL Method.loss through a StepCtx — the same
    code path the engine traces."""
    import jax
    import jax.numpy as jnp

    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.methods.base import get_method
    from cvssl_tpu.train.state import StepCtx

    base = dict(method=method_name, model="unet", num_classes=C,
                batch_size=B, labeled_bs=LB, patch_size=(PATCH, PATCH),
                labeled_slices_override=LB, device_data=False,
                dtype="float32", s2d_levels=0, fused_loss=False)
    base.update(cfg_kw or {})
    cfg = TrainConfig(**base)
    method = get_method(method_name, cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p):
        ctx = StepCtx(cfg, modules, p, bstats, teacher_params or {},
                      teacher_bstats or {}, jax.random.PRNGKey(0),
                      jnp.int32(STEP if step is None else step))
        ctx.extra = ()
        loss, metrics = method.loss(ctx, jbatch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), grads


def _assert_tree_close(ours, ref):
    """Gradient trees agree at f32 cross-framework fidelity.

    Measured noise floor (XLA:CPU vs torch:CPU, identical math, different
    f32 accumulation orders through a 17-conv net): per-element error up
    to 5.3e-3 x the global max |grad|, per-significant-leaf relative L2 up
    to 2.0e-2, whole-tree relative L2 up to 6.4e-3. Thresholds below give
    ~3x margin over that floor. A semantic bug — missing / mis-weighted
    loss term, wrong BN mode, wrong consistency schedule — shifts
    gradients at 1e-1..1e0 relative, 10-100x above these thresholds (the
    loss VALUES are additionally checked at 1e-5 relative)."""
    import jax
    o_leaves = jax.tree_util.tree_leaves(ours)
    r_leaves = jax.tree_util.tree_leaves(ref)
    assert len(o_leaves) == len(r_leaves)
    r_leaves = [np.asarray(r, np.float64) for r in r_leaves]
    o_leaves = [np.asarray(o, np.float64) for o in o_leaves]
    gscale = max(max(float(np.abs(r).max()) for r in r_leaves), 1e-8)
    norms = [np.linalg.norm(r) for r in r_leaves]
    big = max(norms)
    sq_err = sq_ref = 0.0
    for o, r, rn in zip(o_leaves, r_leaves, norms):
        assert np.abs(o - r).max() <= 2e-2 * gscale, (
            np.abs(o - r).max(), gscale)
        if rn >= 0.01 * big:
            assert np.linalg.norm(o - r) / rn < 0.05, (
                np.linalg.norm(o - r) / rn, rn)
        sq_err += float(np.sum((o - r) ** 2))
        sq_ref += float(np.sum(r ** 2))
    assert np.sqrt(sq_err / sq_ref) < 0.02, np.sqrt(sq_err / sq_ref)


def _batch(rng):
    image = rng.normal(0.5, 0.25, (B, PATCH, PATCH)).astype(np.float32)
    label = rng.integers(0, C, (B, PATCH, PATCH)).astype(np.int32)
    return image, label


def _nchw(x):
    import torch
    return torch.tensor(x[:, None])  # (B, 1, H, W)


def _ctx_noise_keys(n):
    """The first ``n`` keys StepCtx.next_rng hands out from the PRNGKey(0)
    seed `_our_grads` uses — lets the torch side receive the EXACT noise
    arrays the jax method will draw (input noise is data, not math, so
    injecting it as a constant keeps the comparison honest)."""
    import jax
    key, out = jax.random.PRNGKey(0), []
    for _ in range(n):
        ks = jax.random.split(key, 2)
        key, k = ks[0], ks[1]
        out.append(k)
    return out


def _noise_to_torch(noise_j):
    """(B, H, W, 1) jax noise -> (B, 1, H, W) torch constant."""
    import torch
    return torch.tensor(np.moveaxis(np.asarray(noise_j), -1, 1))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestSupervisedGradParity:
    def test_loss_and_grads_match(self):
        import torch

        model = _torch_unet(SEED)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(0)
        image, label = _batch(rng)

        # reference block (train_fully_supervised_2D.py:109-114)
        outputs = model(_nchw(image))
        outputs_soft = torch.softmax(outputs, dim=1)
        loss_ce = ce_loss(outputs, torch.tensor(label).long())
        loss_dice = dice_loss(outputs_soft,
                              torch.tensor(label).unsqueeze(1).float())
        t_loss = 0.5 * (loss_dice + loss_ce)
        t_loss.backward()
        ref_grads = _grads_to_flax(model)

        import jax.numpy as jnp
        params, bstats = _init_to_flax(model)
        modules = _our_modules(["model"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "supervised", modules, {"model": params}, {"model": bstats},
            batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestCPSGradParity:
    def test_loss_and_grads_match_both_models(self):
        import torch

        m1, m2 = _torch_unet(SEED), _torch_unet(SEED + 1)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(1)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()

        # reference block (train_cross_pseudo_supervision_2D.py:175-197)
        out1, out2 = m1(vol), m2(vol)
        soft1, soft2 = torch.softmax(out1, 1), torch.softmax(out2, 1)
        w = _consistency_weight_torch(STEP)
        loss1 = 0.5 * (ce_loss(out1[:LB], lab[:LB]) +
                       dice_loss(soft1[:LB], lab[:LB].unsqueeze(1).float()))
        loss2 = 0.5 * (ce_loss(out2[:LB], lab[:LB]) +
                       dice_loss(soft2[:LB], lab[:LB].unsqueeze(1).float()))
        pseudo1 = torch.argmax(soft1[LB:].detach(), dim=1)
        pseudo2 = torch.argmax(soft2[LB:].detach(), dim=1)
        t_loss = (loss1 + w * ce_loss(out1[LB:], pseudo2) +
                  loss2 + w * ce_loss(out2[LB:], pseudo1))
        t_loss.backward()
        ref1, ref2 = _grads_to_flax(m1), _grads_to_flax(m2)

        p1, b1 = _init_to_flax(m1)
        p2, b2 = _init_to_flax(m2)
        modules = _our_modules(["model1", "model2"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "cps", modules, {"model1": p1, "model2": p2},
            {"model1": b1, "model2": b2}, batch)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)


class TestFixMatchGradParity:
    def test_loss_and_grads_match(self):
        import torch
        from torch.distributions import Categorical

        model = _torch_unet(SEED + 2)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(2)
        weak, label = _batch(rng)
        strong = (weak + rng.normal(0, 0.1, weak.shape)).astype(np.float32)

        # reference block (train_Fixmatch_CNN_2D.py:259-290)
        outputs_weak = model(_nchw(weak))
        outputs_weak_soft = torch.softmax(outputs_weak, dim=1)
        outputs_strong = model(_nchw(strong))
        outputs_strong_soft = torch.softmax(outputs_strong, dim=1)

        def normalize(t):  # the faithful quirk (:161-166)
            mn = t.min(1, keepdim=True)[0]
            mx = t.max(1, keepdim=True)[0]
            return (t - mn) / mx

        pseudo_mask = (normalize(outputs_weak_soft) > 0.8).float()
        masked = outputs_weak_soft * pseudo_mask
        pseudo = torch.argmax(masked[LB:].detach(), dim=1)
        w = _consistency_weight_torch(STEP)
        lab = torch.tensor(label).long()
        sup = (ce_loss(outputs_weak[:LB], lab[:LB]) +
               dice_loss(outputs_weak_soft[:LB],
                         lab[:LB].unsqueeze(1).float()))
        # comp loss (:132-159)
        il = torch.reshape(outputs_strong_soft, (B, C, PATCH * PATCH))
        as_weight = torch.mean(
            1 - Categorical(probs=il).entropy() / np.log(PATCH * PATCH))
        comp_labels = torch.argmin(outputs_weak_soft.detach(), dim=1)
        comp = as_weight * ce_loss(
            torch.add(torch.negative(outputs_strong_soft), 1), comp_labels)
        unsup = (ce_loss(outputs_strong[LB:], pseudo) +
                 dice_loss(outputs_strong_soft[LB:],
                           pseudo.unsqueeze(1).float()) +
                 as_weight * comp)
        t_loss = sup + w * unsup
        t_loss.backward()
        ref_grads = _grads_to_flax(model)

        params, bstats = _init_to_flax(model)
        modules = _our_modules(["model"])
        batch = {"image_weak": weak[..., None],
                 "image_strong": strong[..., None],
                 "label_aug": label}
        o_loss, grads = _our_grads(
            "fixmatch", modules, {"model": params}, {"model": bstats},
            batch, cfg_kw={"conf_thresh": 0.8})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestMeanTeacherGradParity:
    """North-star #2: mean teacher (train_mean_teacher_2D.py:208-229) —
    same student AND teacher weights, the exact jax-drawn input noise fed
    to the torch block as a constant, iteration past the <1000 consistency
    gate so the softmax-MSE term carries gradient."""

    STEP_MT = 4500  # w = 0.1 * sigmoid_rampup(4500//150, 200)

    def test_loss_and_grads_match(self):
        import torch

        student = _torch_unet(SEED)
        teacher = _torch_unet(SEED + 10)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(4)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()
        u = B - LB

        # the exact noise the jax method draws (methods/mean_teacher.py:25
        # — FIRST next_rng() of the step)
        import jax.numpy as jnp
        k_noise = _ctx_noise_keys(1)[0]
        import jax
        noise_j = jnp.clip(
            0.1 * jax.random.normal(k_noise, (u, PATCH, PATCH, 1)),
            -0.2, 0.2)

        # reference block (train_mean_teacher_2D.py:208-229)
        ema_inputs = vol[LB:] + _noise_to_torch(noise_j)
        outputs = student(vol)
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema_output = teacher(ema_inputs)
            ema_output_soft = torch.softmax(ema_output, dim=1)
        loss_ce = ce_loss(outputs[:LB], lab[:LB])
        loss_dice = dice_loss(outputs_soft[:LB],
                              lab[:LB].unsqueeze(1).float())
        supervised_loss = 0.5 * (loss_dice + loss_ce)
        w = _consistency_weight_torch(self.STEP_MT)
        consistency_loss = torch.mean(
            (outputs_soft[LB:] - ema_output_soft) ** 2)
        t_loss = supervised_loss + w * consistency_loss
        t_loss.backward()
        ref_grads = _grads_to_flax(student)

        params, bstats = _init_to_flax(student)
        tparams, tbstats = _init_to_flax(teacher)
        modules = _our_modules(["model"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "mean_teacher", modules, {"model": params}, {"model": bstats},
            batch, teacher_params={"model": tparams},
            teacher_bstats={"model": tbstats}, step=self.STEP_MT)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestUAMTGradParity:
    """North-star #3/#5 step math in 2D: uncertainty-aware mean teacher
    (train_uncertainty_aware_mean_teacher_2D.py:150-195). The torch side
    runs the reference's ACTUAL T//2 sequential MC passes over the
    twice-repeated unlabeled batch (per-pass BatchNorm statistics); ours
    runs the lax.scan group path — gradients must agree, which pins the
    MC grouping, entropy/threshold/mask math, and masked consistency."""

    STEP_U = 4500

    def test_loss_and_grads_match(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from utils import losses as ref_losses
        from utils import ramps as ref_ramps

        student = _torch_unet(SEED + 20)
        teacher = _torch_unet(SEED + 21)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(5)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()
        u, T, MAX_IT = B - LB, 8, 30000

        # the exact noise arrays the jax method draws (methods/uamt.py:
        # next_rng order = ema noise, student dropout+perturb, MC noise)
        import jax
        import jax.numpy as jnp
        keys = _ctx_noise_keys(4)
        noise_j = jnp.clip(
            0.1 * jax.random.normal(keys[0], (u, PATCH, PATCH, 1)),
            -0.2, 0.2)
        mc_noise_j = jnp.clip(
            0.1 * jax.random.normal(keys[3], (T * u, PATCH, PATCH, 1)),
            -0.2, 0.2)

        # reference block (:150-195), noise injected as constants
        ema_inputs = vol[LB:] + _noise_to_torch(noise_j)
        outputs = student(vol)
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema_output = teacher(ema_inputs)
        volume_batch_r = vol[LB:].repeat(2, 1, 1, 1)
        stride = u
        mc_noise_t = _noise_to_torch(mc_noise_j)
        preds = torch.zeros([stride * T, C, PATCH, PATCH])
        for i in range(T // 2):
            inputs = volume_batch_r + mc_noise_t[2 * u * i:2 * u * (i + 1)]
            with torch.no_grad():
                preds[2 * stride * i:2 * stride * (i + 1)] = teacher(inputs)
        preds = torch.softmax(preds, dim=1)
        preds = preds.reshape(T, stride, C, PATCH, PATCH)
        preds = torch.mean(preds, dim=0)
        uncertainty = -1.0 * torch.sum(preds * torch.log(preds + 1e-6),
                                       dim=1, keepdim=True)
        loss_ce = ce_loss(outputs[:LB], lab[:LB])
        loss_dice = dice_loss(outputs_soft[:LB],
                              lab[:LB].unsqueeze(1).float())
        supervised_loss = 0.5 * (loss_dice + loss_ce)
        w = _consistency_weight_torch(self.STEP_U)
        consistency_dist = ref_losses.softmax_mse_loss(outputs[LB:],
                                                       ema_output)
        threshold = (0.75 + 0.25 * ref_ramps.sigmoid_rampup(
            self.STEP_U, MAX_IT)) * np.log(2)
        mask = (uncertainty < threshold).float()
        consistency_loss = torch.sum(
            mask * consistency_dist) / (2 * torch.sum(mask) + 1e-16)
        t_loss = supervised_loss + w * consistency_loss
        t_loss.backward()
        ref_grads = _grads_to_flax(student)

        params, bstats = _init_to_flax(student)
        tparams, tbstats = _init_to_flax(teacher)
        modules = _our_modules(["model"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "uamt", modules, {"model": params}, {"model": bstats},
            batch, teacher_params={"model": tparams},
            teacher_bstats={"model": tbstats}, step=self.STEP_U)

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestICTGradParity:
    """Interpolation consistency training
    (train_interpolation_consistency_training_2D.py:150-188) — the jax-drawn
    Beta(0.2, 0.2) mix factors are fed to the torch block as constants;
    student + teacher weights converted from torch init."""

    def test_loss_and_grads_match(self):
        import torch

        student = _torch_unet(SEED + 30)
        teacher = _torch_unet(SEED + 31)
        ce_loss, dice_loss = _torch_losses()
        rng = np.random.default_rng(6)
        image, label = _batch(rng)
        vol, lab = _nchw(image), torch.tensor(label).long()
        half = (B - LB) // 2

        # the exact mix factors the jax method draws (methods/ict.py —
        # FIRST next_rng() of the step)
        import jax
        mix_j = jax.random.beta(_ctx_noise_keys(1)[0], 0.2, 0.2,
                                (half, 1, 1, 1))
        mix_t = torch.tensor(np.asarray(mix_j))  # (half, 1, 1, 1)

        # reference block (:150-188)
        u0, u1 = vol[LB:LB + half], vol[LB + half:]
        batch_ux_mixed = u0 * (1.0 - mix_t) + u1 * mix_t
        inputs = torch.cat([vol[:LB], batch_ux_mixed], dim=0)
        outputs = student(inputs)
        outputs_soft = torch.softmax(outputs, dim=1)
        with torch.no_grad():
            ema0 = torch.softmax(teacher(u0), dim=1)
            ema1 = torch.softmax(teacher(u1), dim=1)
            batch_pred_mixed = ema0 * (1.0 - mix_t) + ema1 * mix_t
        loss_ce = ce_loss(outputs[:LB], lab[:LB])
        loss_dice = dice_loss(outputs_soft[:LB],
                              lab[:LB].unsqueeze(1).float())
        supervised_loss = 0.5 * (loss_dice + loss_ce)
        w = _consistency_weight_torch(STEP)
        consistency_loss = torch.mean(
            (outputs_soft[LB:] - batch_pred_mixed) ** 2)
        t_loss = supervised_loss + w * consistency_loss
        t_loss.backward()
        ref_grads = _grads_to_flax(student)

        params, bstats = _init_to_flax(student)
        tparams, tbstats = _init_to_flax(teacher)
        modules = _our_modules(["model"])
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "ict", modules, {"model": params}, {"model": bstats},
            batch, teacher_params={"model": tparams},
            teacher_bstats={"model": tbstats})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-5)
        _assert_tree_close(grads["model"], ref_grads)


class TestCrossTeachingGradParity:
    """North-star #4: cross-teaching CNN <-> SwinUnet
    (train_cross_teaching_between_cnn_transformer_2D.py:215-254) — one
    step, REAL Swin-tiny geometry (embed 96, window 7, 224^2), torch init
    converted to flax, gradients on BOTH models compared. drop_path/dropout
    zeroed on both sides (the only stochastic ops)."""

    def test_loss_and_grads_match_both_models(self):
        import torch

        import reference_shim as rs
        rs.install_stubs()
        if rs.REFERENCE not in sys.path:
            sys.path.insert(0, rs.REFERENCE)
        from networks.swin_transformer_unet_skip_expand_decoder_sys import (
            SwinTransformerSys)  # reference, run-only

        import jax
        import jax.numpy as jnp

        from cvssl_tpu.models.swin_checkpoint import convert_swinunet_full
        from cvssl_tpu.models.swin_unet import SwinUnet
        from cvssl_tpu.models.unet import UNet

        b, lb, hw = 4, 2, 224
        ce_loss, dice_loss = _torch_losses()
        torch.manual_seed(SEED)
        m1 = _torch_unet(SEED)
        tswin = SwinTransformerSys(
            img_size=hw, patch_size=4, in_chans=3, num_classes=C,
            embed_dim=96, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24],
            window_size=7, drop_path_rate=0.0)
        tswin.train()

        rng = np.random.default_rng(3)
        image = rng.normal(0.5, 0.25, (b, hw, hw)).astype(np.float32)
        label = rng.integers(0, C, (b, hw, hw)).astype(np.int32)
        vol = torch.tensor(image[:, None])
        lab = torch.tensor(label).long()

        # reference loss block (:215-254)
        out1 = m1(vol)
        out2 = tswin(vol.repeat(1, 3, 1, 1))  # ViT_seg 1->3ch repeat
        soft1, soft2 = torch.softmax(out1, 1), torch.softmax(out2, 1)
        w = _consistency_weight_torch(STEP)
        loss1 = 0.5 * (ce_loss(out1[:lb], lab[:lb]) +
                       dice_loss(soft1[:lb], lab[:lb].unsqueeze(1).float()))
        loss2 = 0.5 * (ce_loss(out2[:lb], lab[:lb]) +
                       dice_loss(soft2[:lb], lab[:lb].unsqueeze(1).float()))
        pseudo1 = torch.argmax(soft1[lb:].detach(), dim=1)
        pseudo2 = torch.argmax(soft2[lb:].detach(), dim=1)
        ps1 = dice_loss(soft1[lb:], pseudo2.unsqueeze(1).float())
        ps2 = dice_loss(soft2[lb:], pseudo1.unsqueeze(1).float())
        t_loss = (loss1 + w * ps1) + (loss2 + w * ps2)
        t_loss.backward()

        ref1 = _grads_to_flax(m1)
        grad_sd = {}
        for name, p in tswin.named_parameters():
            grad_sd[name] = (p.grad.detach().numpy() if p.grad is not None
                             else np.zeros(p.shape, np.float32))

        # ours: same weights via the converters
        p1, b1 = _init_to_flax(m1)
        fswin = SwinUnet(num_classes=C, drop_path_rate=0.0)
        variables = fswin.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, hw, hw, 1)), train=False)
        sd = {k: v.detach().numpy() for k, v in tswin.state_dict().items()
              if "attn_mask" not in k and "relative_position_index" not in k}
        p2, report = convert_swinunet_full(sd, variables["params"])
        assert report["skipped"] == 0
        grad_sd = {k: v for k, v in grad_sd.items()
                   if "attn_mask" not in k and
                   "relative_position_index" not in k}
        ref2, _ = convert_swinunet_full(grad_sd, variables["params"])

        modules = {"model1": UNet(in_chns=1, num_classes=C,
                                  dropout=(0.0,) * 5),
                   "model2": fswin}
        batch = {"image": image[..., None], "label": label}
        o_loss, grads = _our_grads(
            "cross_teaching", modules,
            {"model1": p1,
             "model2": jax.tree_util.tree_map(jnp.asarray, p2)},
            {"model1": b1, "model2": {}}, batch,
            cfg_kw={"batch_size": b, "labeled_bs": lb,
                    "labeled_slices_override": lb,
                    "patch_size": (hw, hw), "model2": "ViT_Seg"})

        assert o_loss == pytest.approx(float(t_loss), rel=1e-4)
        _assert_tree_close(grads["model1"], ref1)
        _assert_tree_close(grads["model2"], ref2)
