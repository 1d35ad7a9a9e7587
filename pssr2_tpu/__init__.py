"""PSSR2-TPU: a TPU-native (JAX/XLA/Pallas) framework for point-scanning
super-resolution microscopy, with the full capability surface of PSSR2
(reference: ucsdmanorlab/PSSR2) re-designed TPU-first.

Public API mirrors the reference package layout (``pssr/__init__.py``):
datasets, crappifiers, models, training loops and prediction utilities.
"""

__version__ = "0.1.0"

from .crappifiers import (
    Crappifier,
    MultiCrappifier,
    AdditiveGaussian,
    Poisson,
    SaltPepper,
    Blur,
)

__all__ = [
    "__version__",
    "models",
    "crappifiers",
    "data",
    "predict",
    "train",
    "util",
    "ops",
    "parallel",
    "optim",
    "checkpoint",
    "quant",
    "Crappifier",
    "MultiCrappifier",
    "AdditiveGaussian",
    "Poisson",
    "SaltPepper",
    "Blur",
]


def __getattr__(name):
    # Lazy submodule access (keeps `import pssr2_tpu` light: no jax/flax
    # import cost until models/training are actually used).
    import importlib

    if name in ("data", "models", "ops", "parallel", "train", "predict", "util", "optim", "bayes", "checkpoint", "quant", "export"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
