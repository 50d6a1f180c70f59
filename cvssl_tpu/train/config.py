"""Training configuration.

One dataclass carrying the union of the reference's per-script argparse flags
(superset at ``train_mean_teacher_2D.py:43-103``), with the same names and
defaults so reference invocations translate 1:1. ``patch_size`` is a real
tuple (the reference's ``type=list`` flag is broken from the CLI — SURVEY §8).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # paths / bookkeeping
    root_path: str = "../data/ACDC"
    exp: str = "ACDC/experiment"
    model: str = "unet"
    model2: str = "swin_unet"          # second model for dual-model methods
    method: str = "supervised"
    snapshot_root: str = "../model"

    # core hyperparameters (reference defaults)
    num_classes: int = 4
    in_channels: int = 1
    max_iterations: int = 30000
    batch_size: int = 24
    base_lr: float = 0.01
    patch_size: Tuple[int, ...] = (256, 256)
    seed: int = 1337
    deterministic: bool = True

    # semi-supervision
    labeled_bs: int = 12
    labeled_num: int = 7               # patients; mapped via patients_to_slices
    labeled_slices_override: Optional[int] = None  # bypass the table
    total_num: Optional[int] = None    # unlabeled pool size (3D: 250)
    ema_decay: float = 0.99
    consistency: float = 0.1
    consistency1: float = 1.0          # contrastive_consistency weights
    consistency2: float = 0.1
    consistency_rampup: float = 200.0
    consistency_type: str = "mse"
    conf_thresh: float = 0.8           # FixMatch confidence threshold

    # method extras
    uncertainty_T: int = 8             # UAMT MC passes
    ict_alpha: float = 0.2             # ICT Beta(alpha, alpha)
    dan_lr: float = 1e-4               # discriminator Adam LR

    # engine
    device_data: bool = True           # 2D: dataset resident in HBM,
                                       # augmentation jitted into the step
    fused_loss: bool = True            # Pallas fused Dice+CE on TPU
    scan_steps: int = 1                # >1: fuse K train steps into one XLA
                                       # program (lax.scan; store path only)
    log_every: int = 20
    val_every: int = 200
    ckpt_every: int = 3000
    num_workers: int = 8
    # Model compute stays float32: measured on v5e, bf16 UNet fwd+bwd is
    # SLOWER (0.41 vs 0.30 ms) — tiny channel counts are layout-bound and
    # bf16's (16,128) tiling hurts. Device-store images are stored bf16.
    dtype: str = "float32"
    dim: int = 2                       # 2 or 3 (dataset/model family)
    num_devices: Optional[int] = None  # mesh size (default: all)
    profile_dir: Optional[str] = None  # jax.profiler trace output

    @property
    def labeled_slices(self) -> int:
        if self.labeled_slices_override is not None:
            return self.labeled_slices_override
        from cvssl_tpu.data.datasets import patients_to_slices
        return patients_to_slices(self.root_path, self.labeled_num)

    def snapshot_path(self) -> str:
        import os
        return os.path.join(self.snapshot_root,
                            f"{self.exp}_{self.labeled_num}_labeled",
                            self.model)
