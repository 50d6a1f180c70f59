"""2D test CLI — parity with ``code/test_2D_fully.py``: loads
``{model}_best_model.ckpt`` from the snapshot dir, runs the per-volume slice
loop over ``test.list`` at 256^2 (configurable), reports per-class dice
(+hd95/asd optionally, which the reference has commented out), exports
predictions as ``.nii.gz`` (from-scratch NIfTI-1 writer, utils/nifti.py).

    python -m cvssl_tpu.eval.test_2d --root_path ../data/ACDC \
        --exp ACDC/Fully_Supervised --model unet --num_classes 4 --labeled_num 3
"""
from __future__ import annotations

import argparse
import os
import shutil

import h5py
import numpy as np
from scipy.ndimage import zoom

from cvssl_tpu.ops import metrics as M


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Fully_Supervised")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labeled_num", type=int, default=3)
    p.add_argument("--patch_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--snapshot_root", type=str, default="../model")
    p.add_argument("--list_name", type=str, default="test.list")
    p.add_argument("--full_metrics", action="store_true",
                   help="also compute hd95/asd (reference comments these out)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint path (e.g. a dual-model run's "
                        "unet_best_model1.ckpt — replaces test_CNNVIT.py's "
                        "interactive prompt)")
    return p


def load_predictor(flags, ckpt_path=None):
    """Build a jitted batched argmax predictor from a saved checkpoint."""
    import jax
    import jax.numpy as jnp
    from cvssl_tpu.models import net_factory
    from cvssl_tpu.utils import checkpoint as ckpt

    net = net_factory(flags.model, in_chns=1, class_num=flags.num_classes)
    h, w = flags.patch_size
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         jnp.zeros((1, h, w, 1)), train=False)
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
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return predict


def test_single_volume(case, predict, test_save_path, flags):
    from cvssl_tpu.eval.val2d import test_single_volume as tsv
    with h5py.File(os.path.join(flags.root_path, "data",
                                f"{case}.h5"), "r") as f:
        image = f["image"][:]
        label = f["label"][:]
    # full-volume batched prediction via the val2d engine
    s, x, y = image.shape
    zoomed = zoom(image, (1, flags.patch_size[0] / x,
                          flags.patch_size[1] / y), order=0)
    from cvssl_tpu.eval.val2d import _bucket
    b = _bucket(s)
    batch = np.zeros((b, *flags.patch_size, 1), np.float32)
    batch[:s, ..., 0] = zoomed
    pred_patch = np.asarray(predict(batch))[:s]
    prediction = zoom(pred_patch, (1, x / flags.patch_size[0],
                                   y / flags.patch_size[1]), order=0)
    if test_save_path:
        # reference export contract (test_2D_fully.py:73-81): float32
        # volumes, spacing (1, 1, 10), {case}_{pred,img,gt}.nii.gz
        from cvssl_tpu.utils.nifti import save_nifti
        sp = (1.0, 1.0, 10.0)
        save_nifti(os.path.join(test_save_path, f"{case}_pred.nii.gz"),
                   prediction.astype(np.float32), sp)
        save_nifti(os.path.join(test_save_path, f"{case}_img.nii.gz"),
                   image.astype(np.float32), sp)
        save_nifti(os.path.join(test_save_path, f"{case}_gt.nii.gz"),
                   label.astype(np.float32), sp)
    out = []
    for c in range(1, flags.num_classes):
        p, g = prediction == c, label == c
        if flags.full_metrics and p.sum() > 0 and g.sum() > 0:
            out.append((M.dc(p, g), M.hd95(p, g), M.asd(p, g)))
        else:
            out.append((M.dc(p, g),))
    return out


def inference(flags, predictor=None):
    with open(os.path.join(flags.root_path, flags.list_name)) as f:
        image_list = sorted(ln.strip().split(".")[0] for ln in f
                            if ln.strip())
    snapshot = os.path.join(flags.snapshot_root,
                            f"{flags.exp}_{flags.labeled_num}_labeled",
                            flags.model)
    test_save_path = os.path.join(snapshot + "_predictions")
    if os.path.exists(test_save_path):
        shutil.rmtree(test_save_path)
    os.makedirs(test_save_path)
    predict = predictor or load_predictor(
        flags, ckpt_path=getattr(flags, "ckpt", None))
    totals = None
    for case in image_list:
        m = np.asarray(test_single_volume(case, predict, test_save_path,
                                          flags), dtype=np.float64)
        totals = m if totals is None else totals + m
    avg = totals / len(image_list)
    for c in range(avg.shape[0]):
        print(f"class {c + 1}: {avg[c]}")
    print("mean:", avg.mean(axis=0))
    return avg


if __name__ == "__main__":
    inference(build_parser().parse_args())
