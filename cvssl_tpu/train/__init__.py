"""Training engine + SSL methods + CLI."""
from cvssl_tpu.train.config import TrainConfig  # noqa: F401
