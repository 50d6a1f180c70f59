"""The training engine.

One engine replaces the reference's 27 hand-copied training loops: it owns
state construction, the single jitted+sharded train step (forwards, losses,
grads, optimizer, EMA teacher, BatchNorm state), validation cadence, best /
periodic checkpointing, and logging. Strategy differences live entirely in
Method modules (``cvssl_tpu/train/methods``).

TPU design notes:
* The whole step is one XLA program; host work per iteration is a dict
  lookup and an (async) dispatch. Metrics are only fetched at log points —
  no per-step device sync (the reference syncs every iteration).
* Data parallelism: batch sharded over a 1-D ``data`` mesh, params
  replicated; XLA inserts the gradient/BN-stat collectives (psum over ICI).
* Two-optimizer strategies (CPS/cross-teaching: SURVEY §2.5) become one
  ``optax.multi_transform`` over the model-name partition of the param tree.
* Adversarial strategies run a second grad phase (discriminator) inside the
  same jitted step — method sets ``adversarial_models`` and ``loss_d``.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvssl_tpu.data import transforms as T
from cvssl_tpu.data.datasets import SliceDataset, VolumeDataset
from cvssl_tpu.data.pipeline import DataPipeline
from cvssl_tpu.data.sampler import ShuffleBatchSampler, TwoStreamBatchSampler
from cvssl_tpu.eval import val2d, val3d
from cvssl_tpu.ops.ema import ema_decay_schedule, ema_update
from cvssl_tpu.parallel import mesh as pmesh
from cvssl_tpu.train.config import TrainConfig
from cvssl_tpu.train.methods.base import Method, get_method
from cvssl_tpu.train.state import StepCtx, TrainState
from cvssl_tpu.utils import checkpoint as ckpt
from cvssl_tpu.utils.logging import MetricsWriter, setup_logging


class Engine:
    def __init__(self, cfg: TrainConfig, method: Optional[Method] = None):
        self.cfg = cfg
        impl = getattr(cfg, "rng_impl", "auto")
        if impl == "auto":
            impl = "rbg" if jax.default_backend() not in ("cpu",) \
                else "threefry2x32"
        elif impl == "threefry":
            impl = "threefry2x32"
        # old-style raw uint32 keys under the chosen impl: serializable in
        # checkpoints, and every split/bernoulli in the step inherits it
        jax.config.update("jax_default_prng_impl", impl)
        self.method = method or get_method(cfg.method, cfg)
        self.modules = self.method.build_models()
        ndev = cfg.num_devices
        if ndev is None:
            # largest device count that divides the batch (data-parallel
            # sharding needs batch % mesh == 0)
            avail = len(jax.devices())
            ndev = max(d for d in range(1, avail + 1)
                       if cfg.batch_size % d == 0)
        self.mesh = pmesh.make_mesh(ndev, dcn=cfg.dcn_slices)
        self._txs = self.method.optimizers()
        self.tx = None  # built at init_state once params exist
        self._train_step = None
        self._train_step_indexed = None
        self._train_scan_step = None
        self._train_step_fixed = None
        self.store = None  # optional device-resident data store
        self._predict_fns: Dict[str, callable] = {}
        # device-resident val set + fused forward->metrics programs: the
        # host-rebuilt val batch costs a 33 MB H2D re-upload per val pass
        # (~0.8 s of a ~1.15 s pass through the ~70 MB/s tunnel,
        # scripts/probe_val.py); resident arrays + one fused dispatch fetch
        # only the (classes-1, 2) metric table.
        self._val_store: Dict[tuple, Optional[dict]] = {}
        self._val_fns: Dict[tuple, callable] = {}
        self._resident_val = jax.default_backend() != "cpu"

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        cfg = self.cfg
        params, batch_stats = {}, {}
        for name, module in self.modules.items():
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            args = self.method.init_inputs(name, sample_batch)
            # jit the init: flax init otherwise executes eagerly, which on
            # a tunneled TPU is hundreds of ~30ms round-trips (measured
            # 250s for SwinUnet); jitted it's one compile + one dispatch.
            init_fn = jax.jit(functools.partial(module.init, train=False))
            variables = init_fn(
                {"params": k1, "dropout": k2, "perturb": k3}, *args)
            params[name] = variables["params"]
            batch_stats[name] = variables.get("batch_stats", {})

        # pretrained CNN encoders from a local torch checkpoint (the
        # reference URL-downloads these — net unavailable here)
        if cfg.pretrained_ckpt:
            from cvssl_tpu.models import cnn_checkpoint as cc
            sd = cc.load_torch_state_dict(cfg.pretrained_ckpt)
            for name, module in self.modules.items():
                params[name], batch_stats[name], loaded = \
                    cc.maybe_load_encoder(module, params[name],
                                          batch_stats[name], sd)
                if loaded:
                    import logging
                    logging.getLogger(__name__).info(
                        "loaded pretrained encoder into %s from %s",
                        name, cfg.pretrained_ckpt)

        # optimizer over the combined tree, partitioned by model name
        labels = {name: jax.tree_util.tree_map(lambda _: name, params[name])
                  for name in params}
        self.tx = optax.multi_transform(self._txs, labels)
        opt_state = self.tx.init(params)

        teacher_params = {name: jax.tree_util.tree_map(jnp.copy, params[name])
                          for name in self.method.teacher_names}
        teacher_stats = {name: jax.tree_util.tree_map(
            jnp.copy, batch_stats[name]) for name in self.method.teacher_names}

        rng, extra_rng, state_rng = jax.random.split(rng, 3)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state,
            teacher_params=teacher_params, teacher_batch_stats=teacher_stats,
            extra=self.method.init_extra(extra_rng), rng=state_rng)
        return pmesh.replicate_state(self.mesh, state)

    # ------------------------------------------------------------------
    # the jitted step
    # ------------------------------------------------------------------
    def _build_train_step(self):
        return functools.partial(jax.jit, donate_argnums=(0,))(
            self._build_train_step_body())

    def _build_train_step_body(self):
        cfg, method, modules = self.cfg, self.method, self.modules
        tx = self.tx
        adv_names = tuple(getattr(method, "adversarial_models", ()))
        main_names = tuple(n for n in method.model_names
                           if n not in adv_names)

        s2d_loss = cfg.s2d_loss_on()
        if s2d_loss:
            # train forwards emit grouped s2d logits (no depth_to_space —
            # see TrainConfig.s2d_loss); identical params, different output
            # VIEW, so the same state drives eval in original layout.
            # logits_f32=False additionally keeps the logits in compute
            # dtype — every train-loss consumer casts to f32 at entry
            # (ops/losses.py + every method body), so values are
            # bit-identical while the materialized f32 relayout of the
            # largest activation (and its backward mirror) disappears.
            modules = {n: m.clone(s2d_logits=True, logits_f32=False)
                       for n, m in modules.items()}
        else:
            # same bit-identical-consumers argument without the s2d view:
            # EVERY method's logit consumers cast to f32 at entry (audited:
            # ops/losses.py entry points, all method softmax/CE/MSE sites,
            # and projector Dense whose flax dtype promotion is the same
            # exact bf16->f32 cast). Covers 3D UAMT — the (T*u, D, H, W, C)
            # MC-teacher logit tensor halves its HBM bytes — and the
            # cross-teaching SwinUnet slot. Only models that expose the
            # knob (UNet/UNet3D/SwinUnet) are touched.
            modules = {n: (m.clone(logits_f32=False)
                           if "logits_f32" in getattr(
                               m, "__dataclass_fields__", {}) else m)
                       for n, m in modules.items()}
        if cfg.swin_s2d_loss_on():
            # cross-teaching ViT slot: grouped (B, H/4, W/4, 16, C) train
            # logits (SwinUnet.s2d_logits) — the method re-indexes labels
            # and pseudo-labels; eval keeps original modules/layout.
            from cvssl_tpu.models.swin_unet import SwinUnet
            modules = {n: (m.clone(s2d_logits=True)
                           if isinstance(m, SwinUnet) else m)
                       for n, m in modules.items()}

        def make_ctx(params, state, batch_stats, rng):
            return StepCtx(cfg, modules, params, batch_stats,
                           state.teacher_params, state.teacher_batch_stats,
                           rng, state.step)

        def loss_fn(main_params, frozen_adv_params, state, batch, rng):
            params = dict(main_params)
            params.update(frozen_adv_params)
            ctx = make_ctx(params, state, state.batch_stats, rng)
            ctx.extra = state.extra
            loss, metrics = method.loss(ctx, batch)
            new_extra = getattr(ctx, "new_extra", state.extra)
            return loss, (metrics, ctx.stats, ctx.teacher_stats, new_extra)

        def d_loss_fn(adv_params, main_params, state, batch_stats, batch, rng):
            params = dict(main_params)
            params.update(adv_params)
            ctx = make_ctx(params, state, batch_stats, rng)
            ctx.extra = state.extra
            loss, metrics = method.loss_d(ctx, batch)
            return loss, (metrics, ctx.stats)

        def step_fn(state: TrainState, batch: dict):
            if s2d_loss:
                from cvssl_tpu.ops.s2d import space_to_depth_labels
                batch = {**batch}
                for k in ("label", "label_aug"):  # fixmatch sups on label_aug
                    if k in batch:
                        batch[k] = space_to_depth_labels(batch[k])
            rng, g_rng, d_rng = jax.random.split(state.rng, 3)
            main_params = {n: state.params[n] for n in main_names}
            adv_params = {n: state.params[n] for n in adv_names}

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                main_params, adv_params, state, batch, g_rng)
            metrics, new_stats, new_teacher_stats, new_extra = aux

            if adv_names:
                (d_loss, d_aux), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(
                        adv_params, main_params, state, new_stats, batch,
                        d_rng)
                d_metrics, new_stats = d_aux
                metrics = {**metrics, **d_metrics, "loss_d": d_loss}
                grads = {**grads, **d_grads}

            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            teacher_params = {}
            for name in method.teacher_names:
                decay = ema_decay_schedule(state.step, cfg.ema_decay)
                teacher_params[name] = ema_update(
                    state.teacher_params[name], new_params[name], decay)

            # in-params EMA links (e.g. contrastive_consistency's
            # projector1 <- EMA(projector3), reference :536-541)
            for dst, src in getattr(method, "param_ema_map", {}).items():
                decay = ema_decay_schedule(state.step, cfg.ema_decay)
                new_params = dict(new_params)
                new_params[dst] = ema_update(new_params[dst],
                                             new_params[src], decay)

            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
                teacher_params=teacher_params,
                teacher_batch_stats=new_teacher_stats,
                extra=new_extra, rng=rng)
            return new_state, metrics

        return step_fn

    def train_step(self, state: TrainState, batch: dict):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step(state, pmesh.shard_batch(self.mesh, batch))

    # -- device-store path: only indices cross the host boundary ----------
    def attach_store(self, store):
        self.store = store

    def _build_indexed_step(self):
        base_step = self._build_train_step_body()
        batch_fn = self.store.batch_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state, arrays, indices):
            rng, aug_rng = jax.random.split(state.rng)
            batch = batch_fn(arrays, indices, aug_rng)
            state = state.replace(rng=rng)
            return base_step(state, batch)

        return step_fn

    def train_step_indices(self, state: TrainState, indices):
        """One step from a device-resident store; transfers only ~B int32s.
        Augmentation (2D rot90/flip/rotate; 3D crop+rotflip) runs inside the
        same XLA program as the model step."""
        assert self.store is not None, "attach_store() first"
        if self._train_step_indexed is None:
            self._train_step_indexed = self._build_indexed_step()
        idx = jax.device_put(np.asarray(indices, np.int32),
                             pmesh.batch_sharding(self.mesh))
        return self._train_step_indexed(state, self.store.arrays(), idx)

    def _build_scan_step(self):
        base_step = self._build_train_step_body()
        batch_fn = self.store.batch_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def steps_fn(state, arrays, indices_k):  # indices_k: (K, B)
            def body(state, idx):
                rng, aug_rng = jax.random.split(state.rng)
                batch = batch_fn(arrays, idx, aug_rng)
                state = state.replace(rng=rng)
                return base_step(state, batch)

            state, metrics = jax.lax.scan(body, state, indices_k)
            # report the LAST step's metrics (log-cadence contract)
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

        return steps_fn

    def train_steps_scan(self, state: TrainState, indices_matrix):
        """K fused steps as ONE XLA program (lax.scan over the step body) —
        amortizes per-dispatch overhead on tunneled/remote TPUs. Returns
        (state, last-step metrics)."""
        assert self.store is not None, "attach_store() first"
        if self._train_scan_step is None:
            self._train_scan_step = self._build_scan_step()
        idx = jnp.asarray(np.asarray(indices_matrix, np.int32))
        return self._train_scan_step(state, self.store.arrays(), idx)

    def train_steps_fixed(self, state: TrainState, batch: dict, k: int):
        """K fused steps over ONE (host-provided) batch — lax.scan over the
        step body inside a single XLA program. For benchmarking/probing on
        tunneled TPUs: per-step dispatch timings drift +-15-30% with relay
        stalls, while a scanned program measures pure device time (and the
        dispatch amortization is exactly what ``scan_steps`` buys the
        store-backed production path)."""
        if self._train_step_fixed is None:
            body = self._build_train_step_body()

            @functools.partial(jax.jit, static_argnums=(2,),
                               donate_argnums=(0,))
            def steps_fn(state, batch, n):
                def step(s, _):
                    return body(s, batch)

                state, metrics = jax.lax.scan(step, state, None, length=n)
                return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

            self._train_step_fixed = steps_fn
        batch = jax.device_put(batch, pmesh.batch_sharding(self.mesh))
        return self._train_step_fixed(state, batch, k)

    # ------------------------------------------------------------------
    # prediction / validation
    # ------------------------------------------------------------------
    def _predict_base(self, name: str, kind: str):
        module = self.modules[name]
        method = self.method
        key = (name, kind)
        if key not in self._predict_fns:
            @jax.jit
            def _predict(params, batch_stats, x):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out = module.apply(variables, x, train=False)
                logits = method.primary_logits(out).astype(jnp.float32)
                if kind == "argmax":
                    # uint8 keeps the device->host fetch 4x smaller (D2H is
                    # the expensive direction on tunneled TPUs)
                    return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                return jax.nn.softmax(logits, axis=-1)
            self._predict_fns[key] = _predict
        return self._predict_fns[key]

    def _weights(self, name: str, state: TrainState, teacher: bool):
        if teacher:
            return state.teacher_params[name], state.teacher_batch_stats[name]
        return state.params[name], state.batch_stats[name]

    def predict_fn(self, name: str, state: TrainState, teacher: bool = False):
        """Batched argmax predictor for 2D validation (weights captured)."""
        fn = self._predict_base(name, "argmax")
        params, stats = self._weights(name, state, teacher)
        return lambda x: fn(params, stats, x)

    def predict_probs_fn(self, name: str, state: TrainState,
                         teacher: bool = False):
        """Batched softmax predictor (3D sliding window)."""
        fn = self._predict_base(name, "softmax")
        params, stats = self._weights(name, state, teacher)
        return lambda x: fn(params, stats, x)

    def validate(self, state: TrainState, val_dataset, name: str = None):
        """Per-class (dice, hd95) means over the val set (2D slice loop or
        3D sliding window per cfg.dim). Dual CNN+ViT runs may validate each
        model slot at its own resolution via ``cfg.patch_size2`` (the
        reference evaluates both at one size and its stale-signature
        keeps patch_size fixed — SURVEY §8; we fix that)."""
        name = name or self.method.eval_model_names()[0]
        size = self.cfg.patch_size
        if self.cfg.patch_size2 and name == "model2":
            size = self.cfg.patch_size2
        if self.cfg.dim == 3:
            # cached evaluator + weights as program ARGUMENTS: one
            # compiled sliding-window program serves every validation
            # pass (a per-pass closure bakes the weights in as constants
            # -> full remote recompile each pass)
            key = ("sw3d", name, tuple(size))
            if key not in self._val_fns:
                base = self._predict_base(name, "softmax")
                self._val_fns[key] = val3d.SlidingWindowEvaluator(
                    lambda pargs, x: base(pargs[0], pargs[1], x),
                    size, self.cfg.num_classes, 64, 64,
                    predict_takes_args=True)
            params, stats = self._weights(name, state, teacher=False)
            return val3d.test_all_case(
                None, val_dataset, self.cfg.num_classes, size,
                stride_xy=64, stride_z=64, evaluator=self._val_fns[key],
                predict_args=(params, stats))
        if self._resident_val:
            store = self._val_resident_store(val_dataset, tuple(size))
            if store is not None:
                fn = self._val_fused_fn(name, store["shape"], store["n"])
                params, stats = self._weights(name, state, teacher=False)
                out = np.asarray(fn(params, stats, store["images"],
                                    store["labels"]))
                return out / store["n"]
        return val2d.evaluate(val_dataset, self.predict_fn(name, state),
                              self.cfg.num_classes, size)

    def _val_resident_store(self, val_dataset, size):
        """Upload the (uniform-shape, patch-resolution) val set ONCE; None
        if the set needs per-volume zoom (falls back to val2d.evaluate).
        Numerically identical to val2d.evaluate's all-device path — same
        bucket padding, same jitted EDT metrics — minus the per-pass host
        rebuild + 33 MB re-upload."""
        key = (id(val_dataset), size)
        if key not in self._val_store:
            samples = [val_dataset[i] for i in range(len(val_dataset))]
            shapes = {tuple(s["image"].shape) for s in samples}
            if len(shapes) != 1 or next(iter(shapes))[1:] != size:
                self._val_store[key] = None
            else:
                n = len(samples)
                sv, xv, yv = next(iter(shapes))
                flat = val2d._bucket(n * sv)
                batch = np.zeros((flat, xv, yv, 1), np.float32)
                batch[:n * sv, ..., 0] = np.stack(
                    [s["image"] for s in samples]).reshape(n * sv, xv, yv)
                labels = np.stack([np.asarray(s["label"])
                                   for s in samples]).astype(np.uint8)
                self._val_store[key] = {
                    "images": jnp.asarray(batch),
                    "labels": jnp.asarray(labels),
                    "n": n, "shape": (sv, xv, yv)}
        return self._val_store[key]

    def _val_fused_fn(self, name: str, vol_shape, n: int):
        """forward + argmax + per-class EDT dice/HD95, one XLA program;
        returns the SUMMED (classes-1, 2) table (divide by n on host).
        Only the 8-float table crosses the D2H tunnel."""
        key = (name, vol_shape, n)
        if key not in self._val_fns:
            module = self.modules[name]
            method = self.method
            classes = self.cfg.num_classes
            from cvssl_tpu.ops import edt

            @jax.jit
            def run(params, batch_stats, images, labels):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                out = module.apply(variables, images, train=False)
                logits = method.primary_logits(out).astype(jnp.float32)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                sv, xv, yv = vol_shape
                pred = pred[:n * sv].reshape(n, sv, xv, yv)
                outs = []
                for c in range(1, classes):
                    d, h = edt.surface_metrics_batch(
                        pred == c, labels == c, (-3, -2, -1))
                    outs.append(jnp.stack([d, h], axis=-1))
                return jnp.stack(outs, axis=1).sum(axis=0)

            self._val_fns[key] = run
        return self._val_fns[key]


# ---------------------------------------------------------------------------
# The full training loop (reference ``train()`` parity)
# ---------------------------------------------------------------------------

def build_3d_data(cfg: TrainConfig, supervised_only: bool,
                  raw: bool = False):
    """BraTS-style recipe (``train_mean_teacher_3D.py:98-113``): RandomRotFlip
    + RandomCrop(patch); labeled_num counts volumes; unlabeled pool is
    total_num (reference hardcodes 250). ``raw=True`` skips host transforms
    (device-store path)."""
    rng = np.random.default_rng(cfg.seed)
    transform = None if raw else T.Compose(
        [T.RandomRotFlip3D(rng), T.RandomCrop(cfg.patch_size, rng=rng)])
    if supervised_only:
        train_ds = VolumeDataset(cfg.root_path, "train", num=cfg.labeled_num,
                                 transform=transform)
        sampler = ShuffleBatchSampler(len(train_ds), cfg.batch_size, rng)
    else:
        train_ds = VolumeDataset(cfg.root_path, "train", transform=transform)
        total = cfg.total_num or len(train_ds)
        labeled = list(range(cfg.labeled_num))
        unlabeled = list(range(cfg.labeled_num, total))
        sampler = TwoStreamBatchSampler(labeled, unlabeled, cfg.batch_size,
                                        cfg.batch_size - cfg.labeled_bs, rng)
    val_ds = VolumeDataset(cfg.root_path, "val")
    return train_ds, sampler, val_ds


def build_2d_data(cfg: TrainConfig, supervised_only: bool,
                  transform_name: str = "default", raw: bool = False):
    """Datasets + sampler per the reference recipe. ``raw=True`` skips the
    host transform (device-store path: augmentation runs on device)."""
    rng = np.random.default_rng(cfg.seed)
    if raw:
        transform = None
    elif transform_name == "weak_strong":
        transform = T.WeakStrongAugment(cfg.patch_size, rng)
    elif transform_name == "weak":
        transform = T.RandomGeneratorWeak(cfg.patch_size, rng)
    else:
        transform = T.RandomGenerator(cfg.patch_size, rng)
    if supervised_only:
        train_ds = SliceDataset(cfg.root_path, "train",
                                num=cfg.labeled_slices, transform=transform)
        sampler = ShuffleBatchSampler(len(train_ds), cfg.batch_size, rng)
    else:
        train_ds = SliceDataset(cfg.root_path, "train", transform=transform)
        labeled = list(range(cfg.labeled_slices))
        unlabeled = list(range(cfg.labeled_slices, len(train_ds)))
        sampler = TwoStreamBatchSampler(labeled, unlabeled, cfg.batch_size,
                                        cfg.batch_size - cfg.labeled_bs, rng)
    val_ds = SliceDataset(cfg.root_path, "val")
    return train_ds, sampler, val_ds


def fit(cfg: TrainConfig, engine: Optional[Engine] = None,
        max_steps: Optional[int] = None) -> dict:
    """Train per the reference protocol: val every ``val_every`` iters, best
    checkpoint on mean dice, periodic full-state checkpoints."""
    from cvssl_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(cfg.compile_cache)
    engine = engine or Engine(cfg)
    snapshot = cfg.snapshot_path()
    logger = setup_logging(snapshot)
    writer = MetricsWriter(os.path.join(snapshot, "log"))
    if not cfg.deterministic:
        # reference --deterministic 0 trades reproducibility away (cudnn
        # benchmark mode); on TPU compute is always bit-deterministic, so
        # the honest analog is an entropy-drawn seed for RNG + sampling.
        import dataclasses as _dc
        entropy_seed = int.from_bytes(os.urandom(4), "little")
        cfg = _dc.replace(cfg, seed=entropy_seed)
        logger.info("--deterministic 0: entropy seed %d", entropy_seed)
    logger.info("config: %s", cfg)

    use_store = (cfg.device_data and
                 engine.method.transform in ("default", "weak",
                                             "weak_strong"))
    if cfg.dim == 3:
        if use_store:
            from cvssl_tpu.data.device_store import DeviceVolumeStore
            probe = VolumeDataset(cfg.root_path, "train")
            use_store = (DeviceVolumeStore.estimated_bytes(
                probe, cfg.patch_size) < 8 * 1024 ** 3)
        train_ds, sampler, val_ds = build_3d_data(
            cfg, engine.method.supervised_only, raw=use_store)
    elif engine.method.transform == "cta":
        # CTAugment data path: the method owns the (host-side) policy state
        rng_np = np.random.default_rng(cfg.seed)
        transform, ops_weak, ops_strong = engine.method.create_transform(
            cfg, rng_np)
        train_ds = SliceDataset(cfg.root_path, "train", transform=transform,
                                ops_weak=ops_weak, ops_strong=ops_strong)
        labeled = list(range(cfg.labeled_slices))
        unlabeled = list(range(cfg.labeled_slices, len(train_ds)))
        sampler = TwoStreamBatchSampler(labeled, unlabeled, cfg.batch_size,
                                        cfg.batch_size - cfg.labeled_bs,
                                        rng_np)
        val_ds = SliceDataset(cfg.root_path, "val")
    else:
        train_ds, sampler, val_ds = build_2d_data(
            cfg, engine.method.supervised_only, engine.method.transform,
            raw=use_store)

    if use_store:
        if cfg.dim == 3:
            from cvssl_tpu.data.device_store import DeviceVolumeStore
            store = DeviceVolumeStore(train_ds, cfg.patch_size)
        else:
            from cvssl_tpu.data.device_store import DeviceSliceStore
            store = DeviceSliceStore(train_ds, cfg.patch_size,
                                     mode=engine.method.transform)
        engine.attach_store(store)
        index_stream = sampler.epochs()
        logger.info("device-resident dataset: %d samples in HBM",
                    len(train_ds))
        b, ps = cfg.batch_size, tuple(cfg.patch_size)
        first = {"image": np.zeros((b, *ps, 1), np.float32),
                 "label": np.zeros((b, *ps), np.int32),
                 "idx": np.arange(b, dtype=np.int32)}
        if engine.method.transform == "weak_strong":
            first["image_weak"] = first["image"]
            first["image_strong"] = first["image"]
            first["label_aug"] = first["label"]
        stream = None
    else:
        pipe = DataPipeline(train_ds, sampler, num_workers=cfg.num_workers)
        stream = pipe.stream()
        first = next(stream)

    rng = jax.random.PRNGKey(cfg.seed)
    state = engine.init_state(rng, first)

    # resume if a full-state checkpoint exists (incl. best_dice, so the
    # best-checkpoint contract survives restarts)
    best_dice = {n: 0.0 for n in engine.method.eval_model_names()}
    restored, start_it, meta = ckpt.restore_latest(
        snapshot, state, meta_target={"best_dice": dict(best_dice)})
    if restored is not None:
        state = pmesh.replicate_state(engine.mesh, restored)
        best_dice.update(meta.get("best_dice", {}))
        logger.info("resumed from iteration %d (best_dice %s)",
                    start_it, best_dice)

    max_iterations = max_steps or cfg.max_iterations
    batch = first
    saver = ckpt.AsyncWriter()
    t0 = time.time()
    images_seen = 0

    # --profile_dir: capture a TB-viewable XLA trace of steps ~10-20
    # (post-compile) — the working replacement for the reference's dormant
    # CUDA timing helpers (networks_other.py:203-259).
    profiler = None
    if cfg.profile_dir:
        from cvssl_tpu.utils.profiler import StepWindowProfiler
        profiler = StepWindowProfiler(cfg.profile_dir)
        logger.info("profiling steps %d-%d into %s", profiler.start,
                    profiler.stop, cfg.profile_dir)

    has_cta_hooks = hasattr(engine.method, "on_epoch_start")
    iters_per_epoch = max(len(sampler), 1)
    if has_cta_hooks:
        engine.method.on_epoch_start(train_ds, int(state.step))

    scan_k = cfg.scan_steps if use_store else 1

    it = int(state.step)
    try:
        while it < max_iterations:
            if use_store and scan_k > 1:
                def _dist(c):
                    return c - (it % c)
                n = min(scan_k, _dist(cfg.log_every), _dist(cfg.val_every),
                        _dist(cfg.ckpt_every), max_iterations - it)
                idx_mat = [next(index_stream) for _ in range(n)]
                state, metrics = engine.train_steps_scan(state, idx_mat)
                it += n - 1
                images_seen += (n - 1) * cfg.batch_size
            elif use_store:
                state, metrics = engine.train_step_indices(
                    state, next(index_stream))
            else:
                if has_cta_hooks:
                    engine.method.on_batch(batch, train_ds)
                state, metrics = engine.train_step(state, batch)
                batch = next(stream)
            it += 1
            images_seen += cfg.batch_size

            if profiler is not None:
                profiler.tick(it, metrics)

            if has_cta_hooks:
                engine.method.on_step_metrics(metrics)
                if it % iters_per_epoch == 0:
                    engine.method.on_epoch_end(train_ds)
                    engine.method.on_epoch_start(train_ds, it)

            if it % cfg.log_every == 0 or it == 1:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                writer.add_scalars({f"info/{k}": v for k, v in host.items()}, it)
                logger.info("iteration %d : %s", it, " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(host.items())))

            if it % cfg.val_every == 0:
                for name in engine.method.eval_model_names():
                    perf = engine.validate(state, val_ds, name)
                    mean_dice, mean_hd95 = perf[:, 0].mean(), perf[:, 1].mean()
                    writer.add_scalar(f"info/{name}_val_mean_dice", mean_dice, it)
                    writer.add_scalar(f"info/{name}_val_mean_hd95", mean_hd95, it)
                    logger.info("iteration %d : %s mean_dice %.4f mean_hd95 %.4f",
                                it, name, mean_dice, mean_hd95)
                    if mean_dice > best_dice[name]:
                        best_dice[name] = float(mean_dice)
                        # device-side copy + background write: the D2H fetch no
                        # longer stalls the step loop (see ckpt.AsyncWriter)
                        snap_params = ckpt.device_snapshot(state.params[name])
                        # reference naming: iter_{k}_dice_{d} + {model}_best_model
                        # (dual-model runs prefix with the model slot name,
                        # train_cross_pseudo_supervision_2D.py:260-266)
                        prefix = "" if name == "model" else f"{name}_"
                        dice_path = os.path.join(
                            snapshot,
                            f"{prefix}iter_{it}_dice_{mean_dice:.4f}.ckpt")
                        best_name = (f"{cfg.model}_best_model.ckpt"
                                     if name == "model"
                                     else f"{cfg.model}_best_{name}.ckpt")
                        best_path = os.path.join(snapshot, best_name)

                        def _save_best(p=snap_params, a=dice_path, b=best_path):
                            host_params = ckpt.to_host(p)
                            ckpt.save_weights(a, host_params)
                            ckpt.save_weights(b, host_params)
                        saver.submit(_save_best)

            if it % cfg.ckpt_every == 0:
                # one device-side state copy, then fetch + serialize + write +
                # prune on the background writer (the synchronous version
                # stalled stepping ~9 s per event through the tunnel)
                snap_state = ckpt.device_snapshot(state)
                eval_names = list(engine.method.eval_model_names())
                teacher_names = list(engine.method.teacher_names)
                meta = {"best_dice": dict(best_dice)}

                def _save_state(s=snap_state, k=it, m=meta):
                    host = ckpt.to_host(s)
                    ckpt.save_train_state(snapshot, host, k, meta=m)
                    # reference weights-file contract
                    # (train_mean_teacher_2D.py:295-304): alongside the full
                    # train state, raw per-interval weights for each student
                    # and, for teacher-bearing methods, its EMA teacher
                    # (ema_model_iter_{k}); dual-model slots keep their prefix.
                    for name in eval_names:
                        prefix = "" if name == "model" else f"{name}_"
                        ckpt.save_weights(
                            os.path.join(snapshot, f"{prefix}iter_{k}.ckpt"),
                            host.params[name])
                    for name in teacher_names:
                        prefix = "" if name == "model" else f"{name}_"
                        ckpt.save_weights(
                            os.path.join(snapshot,
                                         f"{prefix}ema_model_iter_{k}.ckpt"),
                            host.teacher_params[name])
                    ckpt.prune_old(snapshot)
                saver.submit(_save_state)
    except BaseException:
        # a failed step/validation must not strand queued checkpoint jobs
        # on the daemon thread (the latest full-state ckpt would silently
        # never land); drain the writer but never mask the original error.
        try:
            saver.close()
        except Exception:
            logger.exception("async checkpoint writer also failed "
                             "during abort")
        raise

    elapsed = time.time() - t0
    throughput = images_seen / elapsed if elapsed > 0 else 0.0
    saver.close()  # join outstanding checkpoint writes before returning
    if profiler is not None:
        profiler.close()
    writer.close()
    result = {"best_dice": best_dice, "iterations": it,
              "slices_per_sec": throughput, "state": state}
    logger.info("training finished: %.2f slices/sec, best dice %s",
                throughput, best_dice)
    return result
