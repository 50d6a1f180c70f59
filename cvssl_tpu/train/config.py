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
    # optional val-time patch size for the "model2" slot (dual CNN+ViT runs
    # validate the ViT at 224^2 while the CNN stays at 256^2); None =
    # reference behavior (both at patch_size)
    patch_size2: Optional[Tuple[int, ...]] = None
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
    # Pallas fused Dice+CE on TPU. None = auto: ON except when the step
    # runs s2d grouped-logits losses (s2d_loss_on()) — there the kernel's
    # (N, C) boundary layout copies cost MORE than the fusion saves
    # (device trace: unfused 24.2 vs fused 25.9 ms/step at the bench
    # config; scripts/probe_grad_profile.py fused_loss=0).
    fused_loss: Optional[bool] = None
    scan_steps: int = 1                # >1: fuse K train steps into one XLA
                                       # program (lax.scan; store path only)
    log_every: int = 20
    val_every: int = 200
    ckpt_every: int = 3000
    num_workers: int = 8
    # PRNG implementation for the training step's dropout/augmentation
    # streams. "auto" = XLA RngBitGenerator ("rbg") on TPU — measured ~2 ms
    # faster per grad step than threefry at the bench config
    # (scripts/probe_wgrad.py) — threefry elsewhere. Streams change with
    # the impl (they already differ from the torch reference); set
    # "threefry" for cross-backend reproducibility. Key shapes differ
    # between impls, so resuming a checkpoint across an impl change is
    # not supported (pass the old impl explicitly to resume).
    rng_impl: str = "auto"
    # Model compute dtype. "auto" = bfloat16 on TPU, float32 on CPU.
    # (Round-1 note "bf16 slower" was measured at 32^2 toy shapes; at the
    # production 256^2 shapes bf16 convs are 1.6-1.8x faster —
    # scripts/probe_s2d.py.) Params/BN stats/logits always stay f32.
    dtype: str = "auto"
    # Space-to-depth fast path for the plain UNet's lane-padding-bound top
    # levels (ops/s2d.py — exact reformulation). None = auto: 2 on TPU,
    # 0 on CPU. Requires patch dims divisible by 2**levels.
    s2d_levels: Optional[int] = None
    # Keep 2D UNet logits in their s2d grouped view (B, H/2, W/2, 4, C)
    # through the TRAIN losses — same pixels, no depth_to_space transpose
    # (the d2s chain + original-layout slices cost ~4-6 ms/step through
    # 3%-occupied (..., 4) lanes; scripts/probe_grad_profile.py). Labels
    # are re-indexed to match inside the step; validation/inference always
    # sees original-layout logits. "auto" = on for per-pixel-loss methods
    # on plain UNet models; "off" disables.
    s2d_loss: str = "auto"
    dim: int = 2                       # 2 or 3 (dataset/model family)
    num_devices: Optional[int] = None  # mesh size (default: all)
    dcn_slices: Optional[int] = None   # fold the mesh as (dcn, data) —
                                       # outer axis = hosts/pod slices
    profile_dir: Optional[str] = None  # jax.profiler trace output
    compile_cache: Optional[str] = "auto"  # persistent XLA compilation
    # cache dir; "auto" = ~/.cache/cvssl_tpu/jax (works over the axon
    # relay: remote compiles are ~650 s cold for the full train step, and
    # the serialized executable replays in <1 s — this is what makes
    # kill+resume production-viable). None/"off" disables.

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

    # constructor overrides for the ViT slot (SwinUnet) — e.g. a thin
    # embed_dim for CPU smokes; production runs leave this None
    vit_kwargs: Optional[dict] = None
    # local torch .pth with ImageNet weights for preunet/efficient_unet
    # encoders (the reference URL-downloads these; offline needs a file)
    pretrained_ckpt: Optional[str] = None

    def model_kwargs(self, net_type: str) -> dict:
        """Per-family constructor knobs: TPU fast path for the plain UNets
        (resolved compute dtype + s2d levels — exact reformulations; 2D
        s2d's both spatial axes, 3D s2d's H/W only), and ``vit_kwargs``
        overrides for the SwinUnet slot."""
        if net_type in ("ViT_Seg", "swin_unet"):
            # Round-2 recorded "bf16 SLOWER for SwinUnet" from per-step
            # engine timings — those drift +-15% through the axon tunnel
            # and two later A/Bs REVERSED between repeats. Scan-amortized
            # measurements (the only reliable kind here; K steps inside
            # one jit, single fetch — scripts/probe_ct.py) say bf16 wins:
            # cross-teaching step 85.1/85.1 ms bf16 vs 88.7/96.9 ms f32
            # after the one-hot bias-matmul fix (isolated swin grad 45.1
            # vs 49.2 ms — scripts/probe_swin.py). So "auto" applies bf16
            # to the ViT slot on TPU too. Override via vit_kwargs.
            kw = {}
            if self.dtype != "float32":
                import jax
                import jax.numpy as jnp
                if self.dtype == "bfloat16" or \
                        jax.default_backend() != "cpu":
                    kw["dtype"] = jnp.bfloat16
            kw.update(self.vit_kwargs or {})
            return kw
        if net_type not in ("unet", "unet_3D", "unet_3D_dv_semi"):
            return {}
        import jax
        import jax.numpy as jnp
        on_tpu = jax.default_backend() != "cpu"
        s2d = self.s2d_levels
        if s2d is None:
            s2d = 2 if on_tpu else 0
        # s2d'd axes must divide 2**levels (3D: the trailing H/W only)
        checked = self.patch_size if net_type == "unet" \
            else self.patch_size[-2:]
        if any(p % (2 ** max(s2d, 1)) for p in checked):
            s2d = 0
        dt = self.dtype
        if dt == "auto":
            dt = "bfloat16" if on_tpu else "float32"
        kw = {}
        if s2d:
            kw["s2d_levels"] = s2d
        if dt != "float32":
            kw["dtype"] = jnp.dtype(dt)
        return kw

    # methods whose losses are purely per-pixel over the logit map (class
    # axis -1, no spatial ops on logits) — safe under the s2d grouped view
    S2D_LOSS_METHODS = ("supervised", "mean_teacher", "uamt", "cps", "ict",
                        "fixmatch")

    def fused_loss_on(self) -> bool:
        """Resolve the ``fused_loss`` tri-state (see the field comment)."""
        if self.fused_loss is None:
            return not self.s2d_loss_on()
        return bool(self.fused_loss)

    def s2d_loss_on(self) -> bool:
        """Whether the train step runs losses in the s2d grouped-logits
        domain (see the ``s2d_loss`` field). Requires: 2D, every model a
        plain UNet actually running the s2d path, and a method from
        ``S2D_LOSS_METHODS``."""
        if self.s2d_loss == "off" or self.dim != 2:
            return False
        if self.method not in self.S2D_LOSS_METHODS:
            return False
        # every model these methods build comes from cfg.model (cps builds
        # two copies of it); model2 is only read by non-whitelisted methods
        if self.model != "unet":
            return False
        return bool(self.model_kwargs("unet").get("s2d_levels", 0))

    def swin_s2d_loss_on(self) -> bool:
        """Grouped-logits train mode for the SwinUnet slot of
        cross-teaching (SwinUnet.s2d_logits): the x4 depth-to-space + LN +
        1x1 head at full 224^2 resolution are the hottest ops of that step
        (probe_hlo_ct census, round 4); in grouped (B, H/4, W/4, 16, C)
        coordinates they shrink 16-fold. Exact reformulation — labels /
        pseudo-labels are re-indexed in-step (methods/cross_teaching.py);
        gated by the same ``s2d_loss`` knob, TPU-or-not alike. Patch dims
        must divide by 4 (SwinUnet requires /32 anyway)."""
        return (self.s2d_loss != "off" and self.dim == 2
                and self.method == "cross_teaching"
                and self.model2 in ("ViT_Seg", "swin_unet"))
