"""Training-trajectory parity against the ACTUAL reference trainer.

Runs the reference ``train_mean_teacher_2D.py`` / ``train_fully_supervised_2D
.py`` loops (torch, CPU, via tests/reference_shim) and our
``Engine``+``mean_teacher``/``supervised`` methods on the SAME synthetic
ACDC tree, same label budget, batch split, LR schedule, and seed, then
compares the loss trajectories and end-of-run val dice.

Inits and data order differ (torch-kaiming vs flax-lecun, different RNGs),
so the assertion is on the converged regime, not per-step equality: the
late-window mean CE/Dice losses and the val dice must agree within a noise
band (see VERDICT round-1, "training-trajectory parity").

Reference match: ``train_mean_teacher_2D.py:202-310``,
``train_fully_supervised_2D.py:91-181``.
"""
import logging
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from cvssl_tpu.data.synthetic import make_synthetic_acdc  # noqa: E402

ITERS = 400          # reference vals fire at 200/400 (hardcoded % 200);
                     # by 400 the synthetic task is near plateau, which
                     # keeps run-to-run val-dice variance inside the band
BATCH, LABELED_BS = 8, 4
PATCH = 64
SEED = 1337
LABELED_NUM = 3      # -> 68 labeled slices via the ACDC table


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    # path must contain "ACDC" for both sides' patients_to_slices tables
    root = str(tmp_path_factory.mktemp("parity") / "ACDC")
    return make_synthetic_acdc(root, num_cases=40, slices_per_case=4,
                               num_val=8, size=64)


def _run_reference(script, root, snapshot, extra=None,
                   fix_val_patch=False):
    import functools
    import random

    import torch

    import reference_shim as rs
    mod = rs.import_reference_trainer(script)
    if fix_val_patch:
        # reference QUIRK: some trainers (train_uncertainty_aware_mean_
        # teacher_2D.py:230-232) call test_single_volume WITHOUT
        # patch_size=args.patch_size, validating at the stale 256^2 default
        # — invisible at production patch 256, nonsense at 64^2. Pin it so
        # the comparison is apples-to-apples (docs/PARITY.md quirks).
        mod.test_single_volume = functools.partial(
            mod.test_single_volume, patch_size=[PATCH, PATCH])
    args = mod.args
    args.root_path = root
    args.max_iterations = ITERS
    args.batch_size = BATCH
    args.labeled_bs = LABELED_BS
    args.labeled_num = LABELED_NUM
    args.patch_size = [PATCH, PATCH]
    args.num_classes = 4
    args.seed = SEED
    for k, v in (extra or {}).items():
        setattr(args, k, v)
    rs.reset_recorders()
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    logging.disable(logging.INFO)  # reference logs every iteration
    try:
        os.makedirs(snapshot, exist_ok=True)
        mod.train(args, snapshot)
    finally:
        logging.disable(logging.NOTSET)
    return rs.recorded_scalars()


def _torch_init_variables():
    """The exact torch init the reference run starts from (same seed, same
    construction order), converted to flax — removes init policy as a
    variable so the trajectories are directly comparable."""
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    from networks.unet import UNet as TorchUNet  # reference, run-only

    from cvssl_tpu.models.torch_convert import convert_unet_checkpoint
    torch.manual_seed(SEED)
    tm = TorchUNet(1, 4)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    return convert_unet_checkpoint(sd)


def _run_ours(root, method):
    import jax

    from cvssl_tpu.data.pipeline import DataPipeline
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine, build_2d_data

    cfg = TrainConfig(root_path=root, method=method, model="unet",
                      num_classes=4, batch_size=BATCH,
                      labeled_bs=LABELED_BS, labeled_num=LABELED_NUM,
                      patch_size=(PATCH, PATCH), seed=SEED,
                      max_iterations=ITERS, device_data=False,
                      dtype="float32", s2d_levels=0, num_devices=1)
    engine = Engine(cfg)
    train_ds, sampler, val_ds = build_2d_data(
        cfg, engine.method.supervised_only, engine.method.transform)
    pipe = DataPipeline(train_ds, sampler, num_workers=2)
    stream = pipe.stream()
    batch = next(stream)
    state = engine.init_state(jax.random.PRNGKey(SEED), batch)

    import jax.numpy as jnp
    params, bstats = _torch_init_variables()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bstats = jax.tree_util.tree_map(jnp.asarray, bstats)
    new_teacher = dict(state.teacher_params)
    new_teacher_stats = dict(state.teacher_batch_stats)
    if "model" in new_teacher:
        new_teacher["model"] = jax.tree_util.tree_map(jnp.copy, params)
        new_teacher_stats["model"] = jax.tree_util.tree_map(jnp.copy, bstats)
    state = state.replace(
        params={**state.params, "model": params},
        batch_stats={**state.batch_stats, "model": bstats},
        teacher_params=new_teacher, teacher_batch_stats=new_teacher_stats)

    curves = {"loss_ce": [], "loss_dice": []}
    dices = []
    for it in range(1, ITERS + 1):
        state, metrics = engine.train_step(state, batch)
        batch = next(stream)
        for k in curves:
            curves[k].append(float(metrics[k]))
        if it % 200 == 0:  # mirror the reference's val cadence
            perf = engine.validate(state, val_ds)
            dices.append(float(perf[:, 0].mean()))
    # mean over the val points — a single steep-curve sample has ~0.1+
    # run-to-run spread on this tiny synthetic task
    global _LAST_VAL_POINTS
    _LAST_VAL_POINTS = list(dices)  # diagnostics (scripts/parity_trajectory)
    return curves, float(np.mean(dices))


_LAST_VAL_POINTS: list = []


def _late_mean(values, frac=0.5):
    arr = np.asarray(values, np.float64)
    return float(arr[int(len(arr) * frac):].mean())


class TestMeanTeacherTrajectory:
    @pytest.fixture(scope="class")
    def runs(self, acdc_root, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ref_mt")
        ref = _run_reference("train_mean_teacher_2D", acdc_root, str(tmp))
        ours = _run_ours(acdc_root, "mean_teacher")
        return ref, ours

    def test_loss_curves_agree_in_converged_window(self, runs):
        ref, (curves, _) = runs
        ref_ce = _late_mean([v for _, v in ref["info/loss_ce"]])
        ref_dice = _late_mean([v for _, v in ref["info/loss_dice"]])
        our_ce = _late_mean(curves["loss_ce"])
        our_dice = _late_mean(curves["loss_dice"])
        assert abs(our_ce - ref_ce) < 0.2, (our_ce, ref_ce)
        assert abs(our_dice - ref_dice) < 0.2, (our_dice, ref_dice)

    def test_both_learn(self, runs):
        ref, (curves, _) = runs
        ref_ce = [v for _, v in ref["info/loss_ce"]]
        assert _late_mean(ref_ce) < np.mean(ref_ce[:20]) * 0.8
        assert _late_mean(curves["loss_ce"]) < \
            np.mean(curves["loss_ce"][:20]) * 0.8

    def test_val_dice_agrees(self, runs):
        ref, (_, our_dice) = runs
        ref_dice = np.mean([v for _, v in ref["info/val_mean_dice"]])
        assert abs(our_dice - ref_dice) < 0.25, (our_dice, ref_dice)


class TestSupervisedTrajectory:
    @pytest.fixture(scope="class")
    def runs(self, acdc_root, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ref_sup")
        ref = _run_reference("train_fully_supervised_2D", acdc_root,
                             str(tmp))
        ours = _run_ours(acdc_root, "supervised")
        return ref, ours

    def test_loss_and_dice_agree(self, runs):
        ref, (curves, our_dice) = runs
        ref_ce = _late_mean([v for _, v in ref["info/loss_ce"]])
        our_ce = _late_mean(curves["loss_ce"])
        assert abs(our_ce - ref_ce) < 0.2, (our_ce, ref_ce)
        ref_dice = np.mean([v for _, v in ref["info/val_mean_dice"]])
        assert abs(our_dice - ref_dice) < 0.25, (our_dice, ref_dice)


class TestUAMTTrajectory:
    """North-star #3/#5 strategy (2D form): uncertainty-aware mean teacher —
    ``train_uncertainty_aware_mean_teacher_2D.py:155-196``. Teacher noise
    RNGs differ between stacks, so assertions are converged-window bands
    like the mean-teacher test (gradient-level parity for noise-free
    methods lives in test_grad_parity.py)."""

    @pytest.fixture(scope="class")
    def runs(self, acdc_root, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ref_uamt")
        ref = _run_reference("train_uncertainty_aware_mean_teacher_2D",
                             acdc_root, str(tmp), fix_val_patch=True)
        ours = _run_ours(acdc_root, "uamt")
        return ref, ours

    def test_loss_curves_agree_in_converged_window(self, runs):
        ref, (curves, _) = runs
        ref_ce = _late_mean([v for _, v in ref["info/loss_ce"]])
        ref_dice = _late_mean([v for _, v in ref["info/loss_dice"]])
        assert abs(_late_mean(curves["loss_ce"]) - ref_ce) < 0.2
        assert abs(_late_mean(curves["loss_dice"]) - ref_dice) < 0.2

    def test_val_dice_agrees(self, runs):
        ref, (_, our_dice) = runs
        ref_dice = np.mean([v for _, v in ref["info/val_mean_dice"]])
        assert abs(our_dice - ref_dice) < 0.25, (our_dice, ref_dice)


# ---------------------------------------------------------------------------
# 3D UAMT (north-star #5) — train_uncertainty_aware_mean_teacher_3D.py
# ---------------------------------------------------------------------------

ITERS_3D = 200
# patch 32 is the smallest the reference unet_3D trains at (4 poolings ->
# 2^3 deepest level; 16^3 dies in torch InstanceNorm at 1^3)
VOL, PATCH_3D = 40, 32


@pytest.fixture(scope="module")
def brats_root(tmp_path_factory):
    from cvssl_tpu.data.synthetic import make_synthetic_brats
    # the reference hardcodes an unlabeled pool of 250 volumes
    # (train_uncertainty_aware_mean_teacher_3D.py:111)
    root = str(tmp_path_factory.mktemp("parity3d") / "BraTS2019")
    return make_synthetic_brats(root, num_train=250, num_val=4, size=VOL)


def _run_reference_3d(root, snapshot):
    import random

    import torch

    import reference_shim as rs
    mod = rs.import_reference_trainer(
        "train_uncertainty_aware_mean_teacher_3D")
    args = mod.args
    args.root_path = root
    args.max_iterations = ITERS_3D
    args.batch_size = 4
    args.labeled_bs = 2
    args.labeled_num = 4
    args.patch_size = [PATCH_3D] * 3
    args.seed = SEED
    rs.reset_recorders()
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    logging.disable(logging.INFO)
    try:
        os.makedirs(snapshot, exist_ok=True)
        mod.train(args, snapshot)
    finally:
        logging.disable(logging.NOTSET)
    return rs.recorded_scalars()


def _run_ours_3d(root):
    import jax

    from cvssl_tpu.data.pipeline import DataPipeline
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine, build_3d_data

    cfg = TrainConfig(root_path=root, method="uamt", model="unet_3D",
                      dim=3, num_classes=2, batch_size=4, labeled_bs=2,
                      labeled_num=4, labeled_slices_override=4,
                      total_num=250, patch_size=(PATCH_3D,) * 3, seed=SEED,
                      max_iterations=ITERS_3D, device_data=False,
                      dtype="float32", s2d_levels=0, num_devices=1)
    engine = Engine(cfg)
    train_ds, sampler, val_ds = build_3d_data(cfg, False)
    pipe = DataPipeline(train_ds, sampler, num_workers=2)
    stream = pipe.stream()
    batch = next(stream)
    state = engine.init_state(jax.random.PRNGKey(SEED), batch)

    curves = {"loss_ce": [], "loss_dice": []}
    dices = []
    for it in range(1, ITERS_3D + 1):
        state, metrics = engine.train_step(state, batch)
        batch = next(stream)
        for k in curves:
            curves[k].append(float(metrics[k]))
        if it % 200 == 0:
            perf = engine.validate(state, val_ds)
            dices.append(float(perf[:, 0].mean()))
    return curves, float(np.mean(dices))


class TestUAMT3DTrajectory:
    """North-star #5: 3D UAMT on BraTS geometry — reference
    ``train_uncertainty_aware_mean_teacher_3D.py:130-190`` vs our
    uamt/dim=3. Inits and RNG streams differ (no 3D weight converter), so
    assertions are converged-window bands; step math is pinned by
    test_reference_loss_parity + the 2D gradient parity (same loss block
    shape, ``:166-189`` vs the 2D trainer's ``:155-196``)."""

    @pytest.fixture(scope="class")
    def runs(self, brats_root, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ref_uamt3d")
        ref = _run_reference_3d(brats_root, str(tmp))
        ours = _run_ours_3d(brats_root)
        return ref, ours

    def test_loss_curves_agree_in_converged_window(self, runs):
        ref, (curves, _) = runs
        ref_ce = _late_mean([v for _, v in ref["info/loss_ce"]])
        ref_dice = _late_mean([v for _, v in ref["info/loss_dice"]])
        assert abs(_late_mean(curves["loss_ce"]) - ref_ce) < 0.25
        assert abs(_late_mean(curves["loss_dice"]) - ref_dice) < 0.25

    def test_val_dice_agrees(self, runs):
        ref, (_, our_dice) = runs
        ref_dice = np.mean([v for _, v in ref["info/val_dice_score"]])
        assert abs(our_dice - ref_dice) < 0.25, (our_dice, ref_dice)
