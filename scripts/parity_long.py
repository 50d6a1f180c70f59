"""Long-horizon training-trajectory parity (round-4, VERDICT r3 item 3).

Runs the ACTUAL reference trainers (torch CPU via tests/reference_shim) and
our Engine for 1-2k iterations on a larger synthetic ACDC tree (>=16 val
volumes), then compares converged-window losses and LATE val dice. Longer
horizon + bigger val set shrinks the run-to-run noise that forced the
+-0.15-0.25 bands of the 200-iter suite runs (docs/PARITY_RUNS.md).

Legs:
  mean_teacher    — train_mean_teacher_2D.py protocol, matched torch init
                    (tests/test_fit_parity.py machinery, ITERS overridden).
  cross_teaching  — train_cross_teaching_between_cnn_transformer_2D.py
                    (:160-260) at matched SMALL swin geometry on both sides
                    (img 64, window 4 — 224^2 torch CPU is infeasible at
                    this horizon), matched torch init for BOTH models via
                    the checkpoint converters.

Usage: python scripts/parity_long.py [--iters 1500] [--legs mean_teacher
       cross_teaching] [--out docs/parity_long_r4.json]
Writes the JSON incrementally after each leg.
"""
import argparse
import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

SEED = 1337
BATCH, LABELED_BS = 8, 4
PATCH = 64
LABELED_NUM = 3


def _late(vals, frac=0.5):
    arr = np.asarray(vals, np.float64)
    return float(arr[int(len(arr) * frac):].mean())


def run_mean_teacher(root, iters):
    import test_fit_parity as tp
    tp.ITERS = iters
    ref = tp._run_reference("train_mean_teacher_2D", root,
                            tempfile.mkdtemp(prefix="ref_mt_"))
    curves, _ = tp._run_ours(root, "mean_teacher")
    our_vals = list(tp._LAST_VAL_POINTS)
    ref_vals = [v for _, v in ref["info/val_mean_dice"]]
    return {
        "iters": iters,
        "ref": {"ce_late": _late([v for _, v in ref["info/loss_ce"]]),
                "dice_late": _late([v for _, v in ref["info/loss_dice"]]),
                "val_dice_series": ref_vals,
                "val_dice_late": _late(ref_vals)},
        "ours": {"ce_late": _late(curves["loss_ce"]),
                 "dice_late": _late(curves["loss_dice"]),
                 "val_dice_series": our_vals,
                 "val_dice_late": _late(our_vals)},
    }


def _torch_cross_teaching_inits(mod):
    """Replicate the trainer's construction order from the same seed
    (create_model() then ViT_seg; load_from is a no-op with PRETRAIN_CKPT
    None) and convert both initial state dicts to flax."""
    import torch

    torch.manual_seed(SEED)
    m1 = mod.net_factory(net_type="unet", in_chns=1, class_num=4)
    m2 = mod.ViT_seg(mod.config, img_size=[PATCH, PATCH], num_classes=4)
    sd1 = {k: v.detach().numpy() for k, v in m1.state_dict().items()}
    sd2 = {k: v.detach().numpy() for k, v in m2.state_dict().items()}
    return sd1, sd2


def run_cross_teaching(root, iters):
    import functools
    import logging
    import random

    import torch

    import reference_shim as rs

    mod = rs.import_reference_trainer(
        "train_cross_teaching_between_cnn_transformer_2D")
    cfgnode = mod.config
    cfgnode.MODEL.PRETRAIN_CKPT = None        # no .pth on disk
    cfgnode.MODEL.SWIN.WINDOW_SIZE = 4        # 64^2: grids 16/8/4
    cfgnode.DATA.IMG_SIZE = PATCH
    args = mod.args
    args.root_path = root
    args.max_iterations = iters
    args.batch_size = BATCH
    args.labeled_bs = LABELED_BS
    args.labeled_num = LABELED_NUM
    args.patch_size = [PATCH, PATCH]
    args.num_classes = 4
    args.seed = SEED

    sd1, sd2 = _torch_cross_teaching_inits(mod)

    rs.reset_recorders()
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    logging.disable(logging.INFO)
    snapshot = tempfile.mkdtemp(prefix="ref_ct_")
    try:
        mod.train(args, snapshot)
    finally:
        logging.disable(logging.NOTSET)
    ref = rs.recorded_scalars()

    ours = _run_ours_cross_teaching(root, iters, sd1, sd2)
    ref_v1 = [v for _, v in ref["info/model1_val_mean_dice"]]
    ref_v2 = [v for _, v in ref["info/model2_val_mean_dice"]]
    return {
        "iters": iters,
        "geometry": {"img": PATCH, "window": 4, "embed": 96},
        "ref": {"model1_loss_late": _late(
                    [v for _, v in ref["loss/model1_loss"]]),
                "model2_loss_late": _late(
                    [v for _, v in ref["loss/model2_loss"]]),
                "val1_series": ref_v1, "val1_late": _late(ref_v1),
                "val2_series": ref_v2, "val2_late": _late(ref_v2)},
        "ours": ours,
    }


def _run_ours_cross_teaching(root, iters, sd1, sd2):
    import jax.numpy as jnp

    from cvssl_tpu.data.pipeline import DataPipeline
    from cvssl_tpu.models.swin_checkpoint import convert_swinunet_full
    from cvssl_tpu.models.torch_convert import convert_unet_checkpoint
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine, build_2d_data

    cfg = TrainConfig(root_path=root, method="cross_teaching", model="unet",
                      num_classes=4, batch_size=BATCH,
                      labeled_bs=LABELED_BS, labeled_num=LABELED_NUM,
                      patch_size=(PATCH, PATCH), seed=SEED,
                      max_iterations=iters, device_data=False,
                      dtype="float32", s2d_levels=0, num_devices=1,
                      vit_kwargs={"img_size": PATCH, "window_size": 4})
    engine = Engine(cfg)
    train_ds, sampler, val_ds = build_2d_data(
        cfg, engine.method.supervised_only, engine.method.transform)
    pipe = DataPipeline(train_ds, sampler, num_workers=2)
    stream = pipe.stream()
    batch = next(stream)
    state = engine.init_state(jax.random.PRNGKey(SEED), batch)

    p1, b1 = convert_unet_checkpoint(sd1)
    p2, rep2 = convert_swinunet_full(sd2, state.params["model2"])
    assert rep2["loaded"] > 200 and rep2["skipped"] == 0, rep2
    state = state.replace(
        params={**state.params,
                "model1": jax.tree_util.tree_map(jnp.asarray, p1),
                "model2": jax.tree_util.tree_map(jnp.asarray, p2)},
        batch_stats={**state.batch_stats,
                     "model1": jax.tree_util.tree_map(jnp.asarray, b1)})

    losses1, losses2, val1, val2 = [], [], [], []
    for it in range(1, iters + 1):
        state, metrics = engine.train_step(state, batch)
        batch = next(stream)
        losses1.append(float(metrics["model1_loss"]))
        losses2.append(float(metrics["model2_loss"]))
        if it % 200 == 0:
            val1.append(float(
                engine.validate(state, val_ds, "model1")[:, 0].mean()))
            val2.append(float(
                engine.validate(state, val_ds, "model2")[:, 0].mean()))
            print(f"[ours ct] iter {it} val1={val1[-1]:.4f} "
                  f"val2={val2[-1]:.4f}", flush=True)
    return {"model1_loss_late": _late(losses1),
            "model2_loss_late": _late(losses2),
            "val1_series": val1, "val1_late": _late(val1),
            "val2_series": val2, "val2_late": _late(val2)}


# ---------------------------------------------------------------------------
# 3D leg (round-5, VERDICT r4 item 6): UAMT-3D vs the ACTUAL
# train_uncertainty_aware_mean_teacher_3D.py at reduced volume geometry
# (40^3 volumes / 32^3 patches — the smallest the reference unet_3D trains
# at; see tests/test_fit_parity.py:246-248), MATCHED torch inits for both
# the student and the independently-initialized EMA teacher (the
# reference's create_model(ema=True) is a FRESH random init, :96-97).
# ---------------------------------------------------------------------------

VOL3, PATCH3 = 40, 32


def _torch_uamt3d_inits():
    """Replicate the trainer's construction order from the seed (model then
    ema_model — the first two torch-RNG consumers after seeding, :96-97)."""
    import torch

    import reference_shim as rs
    rs.install_stubs()
    if rs.REFERENCE not in sys.path:
        sys.path.insert(0, rs.REFERENCE)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from networks.net_factory_3d import net_factory_3d as ref_factory

    torch.manual_seed(SEED)
    m_s = ref_factory(net_type="unet_3D", in_chns=1, class_num=2)
    m_t = ref_factory(net_type="unet_3D", in_chns=1, class_num=2)
    sd_s = {k: v.detach().numpy() for k, v in m_s.state_dict().items()}
    sd_t = {k: v.detach().numpy() for k, v in m_t.state_dict().items()}
    return sd_s, sd_t


def run_uamt_3d(root3, iters):
    import logging
    import random

    import torch

    import reference_shim as rs

    sd_s, sd_t = _torch_uamt3d_inits()

    mod = rs.import_reference_trainer(
        "train_uncertainty_aware_mean_teacher_3D")
    args = mod.args
    args.root_path = root3
    args.max_iterations = iters
    args.batch_size = 4
    args.labeled_bs = 2
    args.labeled_num = 4
    args.patch_size = [PATCH3] * 3
    args.seed = SEED

    rs.reset_recorders()
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    logging.disable(logging.INFO)
    snapshot = tempfile.mkdtemp(prefix="ref_uamt3d_")
    try:
        mod.train(args, snapshot)
    finally:
        logging.disable(logging.NOTSET)
    ref = rs.recorded_scalars()
    # val fires at iter%200 — absent on short smoke runs
    ref_vals = [v for _, v in ref.get("info/val_dice_score", [])]

    ours = _run_ours_uamt_3d(root3, iters, sd_s, sd_t)
    return {
        "iters": iters,
        "geometry": {"vol": VOL3, "patch": PATCH3, "batch": 4},
        "ref": {"ce_late": _late([v for _, v in ref["info/loss_ce"]]),
                "dice_late": _late([v for _, v in ref["info/loss_dice"]]),
                "val_dice_series": ref_vals,
                "val_dice_late": _late(ref_vals)},
        "ours": ours,
    }


def _run_ours_uamt_3d(root3, iters, sd_s, sd_t):
    import jax.numpy as jnp

    from cvssl_tpu.data.pipeline import DataPipeline
    from cvssl_tpu.models.torch_convert import convert_unet3d_checkpoint
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine, build_3d_data

    cfg = TrainConfig(root_path=root3, method="uamt", model="unet_3D",
                      dim=3, num_classes=2, batch_size=4, labeled_bs=2,
                      labeled_num=4, labeled_slices_override=4,
                      total_num=250, patch_size=(PATCH3,) * 3, seed=SEED,
                      max_iterations=iters, device_data=False,
                      dtype="float32", s2d_levels=0, num_devices=1)
    engine = Engine(cfg)
    train_ds, sampler, val_ds = build_3d_data(cfg, False)
    pipe = DataPipeline(train_ds, sampler, num_workers=2)
    stream = pipe.stream()
    batch = next(stream)
    state = engine.init_state(jax.random.PRNGKey(SEED), batch)

    p_s = convert_unet3d_checkpoint(sd_s)
    p_t = convert_unet3d_checkpoint(sd_t)
    jput = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    state = state.replace(
        params={**state.params, "model": jput(p_s)},
        teacher_params={**state.teacher_params, "model": jput(p_t)})

    curves = {"loss_ce": [], "loss_dice": []}
    vals = []
    for it in range(1, iters + 1):
        state, metrics = engine.train_step(state, batch)
        batch = next(stream)
        for k in curves:
            curves[k].append(float(metrics[k]))
        if it % 200 == 0:
            perf = engine.validate(state, val_ds)
            vals.append(float(perf[:, 0].mean()))
            print(f"[ours uamt3d] iter {it} val={vals[-1]:.4f}", flush=True)
    return {"ce_late": _late(curves["loss_ce"]),
            "dice_late": _late(curves["loss_dice"]),
            "val_dice_series": vals, "val_dice_late": _late(vals)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--legs", nargs="+",
                    default=["mean_teacher", "cross_teaching"])
    ap.add_argument("--out", default="docs/parity_long_r4.json")
    ap.add_argument("--cases", type=int, default=80)
    ap.add_argument("--val", type=int, default=16)
    a = ap.parse_args()

    from cvssl_tpu.data.synthetic import make_synthetic_acdc
    tmp = tempfile.mkdtemp(prefix="parity_long_")
    root = None
    root3 = None
    results = {}
    if os.path.exists(a.out):
        with open(a.out) as f:
            results = json.load(f)
    for leg in a.legs:
        print(f"=== {leg} ({a.iters} iters) ===", flush=True)
        if leg == "uamt_3d":
            if root3 is None:
                from cvssl_tpu.data.synthetic import make_synthetic_brats
                # the reference hardcodes a 250-volume unlabeled pool (:112)
                root3 = make_synthetic_brats(
                    os.path.join(tmp, "BraTS2019"), num_train=250,
                    num_val=a.val, size=VOL3)
            results[leg] = run_uamt_3d(root3, a.iters)
            _report(results[leg], a.out, results)
            continue
        if root is None:
            root = make_synthetic_acdc(os.path.join(tmp, "ACDC"),
                                       num_cases=a.cases, slices_per_case=4,
                                       num_val=a.val, size=PATCH)
        fn = {"mean_teacher": run_mean_teacher,
              "cross_teaching": run_cross_teaching}[leg]
        results[leg] = fn(root, a.iters)
        _report(results[leg], a.out, results)


def _report(r, out, results):
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    ours, ref = r["ours"], r["ref"]
    for k in ours:
        if k.endswith("_late") and k in ref:
            print(f"  {k}: ours={ours[k]:.4f} ref={ref[k]:.4f} "
                  f"delta={abs(ours[k]-ref[k]):.4f}", flush=True)


if __name__ == "__main__":
    main()
