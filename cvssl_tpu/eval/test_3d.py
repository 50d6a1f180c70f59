"""3D test CLI — parity with ``code/test_3D.py`` (+ ``test_3D_util.py``):
sliding-window inference (patch 96^3 stride 64), per-case
dice/ravd/hd95/asd rows + mean, prediction export.

    python -m cvssl_tpu.eval.test_3d --root_path ../data/BraTS2019 \
        --exp BraTS2019/Mean_Teacher --model unet_3D --labeled_num 25
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/BraTS2019")
    p.add_argument("--exp", type=str, default="BraTS2019/Fully_Supervised")
    p.add_argument("--model", type=str, default="unet_3D")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--labeled_num", type=int, default=25)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--stride_xy", type=int, default=64)
    p.add_argument("--stride_z", type=int, default=64)
    p.add_argument("--snapshot_root", type=str, default="../model")
    # reference test_3D.py:33 hardcodes test_list="test.txt"; --split lets
    # environments without a test list fall back to the val split.
    p.add_argument("--split", type=str, default="test",
                   choices=["test", "val"])
    return p


def load_predictor(flags, ckpt_path=None):
    import jax
    import jax.numpy as jnp
    from cvssl_tpu.models import net_factory_3d
    from cvssl_tpu.utils import checkpoint as ckpt

    net = net_factory_3d(flags.model, in_chns=1, class_num=flags.num_classes)
    d, h, w = flags.patch_size
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         jnp.zeros((1, d, h, w, 1)), train=False)
    if ckpt_path is None:
        snapshot = os.path.join(flags.snapshot_root,
                                f"{flags.exp}_{flags.labeled_num}_labeled",
                                flags.model)
        ckpt_path = os.path.join(snapshot, f"{flags.model}_best_model.ckpt")
    params = ckpt.load_weights(ckpt_path, variables["params"])
    variables = {**variables, "params": params}
    print(f"init weight from {ckpt_path}")

    @jax.jit
    def predict(x):
        out = net.apply(variables, x, train=False)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return predict


def inference(flags, predictor=None):
    from cvssl_tpu.data.datasets import VolumeDataset
    from cvssl_tpu.eval.val3d import test_all_case_full_metrics

    snapshot = os.path.join(flags.snapshot_root,
                            f"{flags.exp}_{flags.labeled_num}_labeled",
                            flags.model)
    test_ds = VolumeDataset(flags.root_path, getattr(flags, "split", "test"))
    predict = predictor or load_predictor(flags)
    rows, mean = test_all_case_full_metrics(
        predict, test_ds, flags.num_classes, tuple(flags.patch_size),
        flags.stride_xy, flags.stride_z,
        export_dir=os.path.join(snapshot + "_predictions"))
    # reference per-case txt rows (test_3D_util.py:98-109)
    with open(os.path.join(snapshot + "_predictions", "metrics.txt"),
              "w") as f:
        for i, row in enumerate(rows):
            f.write(f"{i},{','.join(str(v) for v in row.ravel())}\n")
        f.write(f"mean,{','.join(str(v) for v in mean.ravel())}\n")
    print("per-class (dice, ravd, hd95, asd) mean:\n", mean)
    return mean


if __name__ == "__main__":
    inference(build_parser().parse_args())
