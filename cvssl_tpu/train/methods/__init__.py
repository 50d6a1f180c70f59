"""SSL method modules. Importing this package registers all methods."""

from cvssl_tpu.train.methods.base import (  # noqa: F401
    Method, get_method, register_method, available_methods)
from cvssl_tpu.train.methods import supervised  # noqa: F401
from cvssl_tpu.train.methods import mean_teacher  # noqa: F401

for _mod in ("uamt", "cps", "cross_teaching", "ict", "fixmatch",
             "co_training", "adversarial", "contrastive", "tripleview",
             "cnn_meet_vit", "exam", "cct", "urpc", "adversarial_consistency",
             "contrastive_consistency"):
    try:
        __import__(f"cvssl_tpu.train.methods.{_mod}")
    except ImportError:
        pass
del _mod
