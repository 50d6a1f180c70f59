"""Produce the docs/PARITY_RUNS.md numbers: run the reference trainers and
our engine per tests/test_fit_parity.py's protocol and print the compared
quantities. Run on CPU: python scripts/parity_trajectory.py"""
import os
import sys
import tempfile

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

import test_fit_parity as tp  # noqa: E402


def main():
    tmp = tempfile.mkdtemp(prefix="parity_")
    root = tp.make_synthetic_acdc(os.path.join(tmp, "ACDC"), num_cases=40,
                                  slices_per_case=4, num_val=4, size=64)
    for script, method in (("train_mean_teacher_2D", "mean_teacher"),
                           ("train_fully_supervised_2D", "supervised")):
        ref = tp._run_reference(script, root, os.path.join(tmp, script))
        curves, our_dice = tp._run_ours(root, method)
        ref_ce = tp._late_mean([v for _, v in ref["info/loss_ce"]])
        ref_dice_l = tp._late_mean([v for _, v in ref["info/loss_dice"]])
        ref_vd = ref["info/val_mean_dice"][-1][1]
        print(f"## {method}")
        print(f"ref  CE(late)={ref_ce:.4f} DiceLoss(late)={ref_dice_l:.4f} "
              f"val_dice={ref_vd:.4f}")
        print(f"ours CE(late)={tp._late_mean(curves['loss_ce']):.4f} "
              f"DiceLoss(late)={tp._late_mean(curves['loss_dice']):.4f} "
              f"val_dice={our_dice:.4f}")


if __name__ == "__main__":
    main()
