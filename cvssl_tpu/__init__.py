"""cvssl_tpu — TPU-native semi-supervised medical image segmentation framework.

A from-scratch JAX/Flax/Optax rebuild of the capabilities of
ziyangwang007/CV-SSL-MIS (PyTorch, single-GPU). Design goals:

* One jitted training engine; SSL strategies are composable method modules
  (the reference duplicates a ~300-line loop across 27 ``train_*.py`` scripts).
* NHWC / NDHWC data layout (TPU-native; the reference is NCHW).
* Data parallelism via ``jax.sharding.Mesh`` + NamedSharding over a ``data``
  axis (the reference is strictly single-device).
* Explicit RNG threading everywhere (the reference relies on global seeds).

Subpackages
-----------
ops       losses / ramp schedules / EMA / metrics / Pallas kernels
models    2D + 3D model zoo (UNet family, SwinUnet, VNet, UNETR, ...)
data      h5 datasets, two-stream sampling, augmentations (host-side)
train     engine + SSL method modules + CLI
eval      2D per-volume and 3D sliding-window evaluation
parallel  device mesh and sharding helpers
utils     checkpointing (orbax), logging, profiling
"""

__version__ = "0.1.0"
