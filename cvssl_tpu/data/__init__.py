"""Data layer: h5 datasets, two-stream sampling, host-side augmentation,
synthetic fixtures, prefetching pipeline."""

from cvssl_tpu.data.datasets import (  # noqa: F401
    SliceDataset, VolumeDataset, patients_to_slices)
from cvssl_tpu.data.sampler import (  # noqa: F401
    TwoStreamBatchSampler, ShuffleBatchSampler)
from cvssl_tpu.data.pipeline import DataPipeline, collate  # noqa: F401
