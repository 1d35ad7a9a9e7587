"""Differentiable histogram (sigmoid-binned) for learned-crappifier training.

JAX port of the reference's GradHist module
(reference: pssr/models/_blocks.py:94-112): soft-assigns values to bins via
sigmoid CDF differences, so noise-profile histograms admit gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np


class GradHist:
    def __init__(self, bins: int = 512, range=(-256, 256), sigma: float = 5.0):
        assert range[1] > range[0]
        self.delta = float(range[1] - range[0]) / float(bins)
        self.centers = jnp.asarray(
            float(range[0]) + self.delta * (np.arange(bins, dtype=np.float32) + 0.5)
        )
        self.sigma = sigma
        self.bins = bins

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, ...) -> (B, bins) soft histogram of per-sample values."""
        batch = x.shape[0]
        size = int(np.prod(x.shape[1:]))
        flat = x.reshape(batch, 1, size) - self.centers.reshape(1, -1, 1)
        s = jax.nn.sigmoid(flat * self.sigma)  # (B, bins, N)
        upper = jnp.concatenate([jnp.ones((batch, 1, size), s.dtype), s], axis=1)
        lower = jnp.concatenate([s, jnp.zeros((batch, 1, size), s.dtype)], axis=1)
        diff = (upper - lower).sum(axis=-1)  # (B, bins+1)
        return diff[:, :-1]


def make_gradhist(bins: int = 512, range=(-256, 256), sigma: float = 5.0):
    """Best available GradHist: the streaming Pallas kernel on TPU (O(B*bins)
    live memory), the XLA formulation elsewhere."""
    import jax

    if jax.default_backend() == "tpu":
        from .pallas.gradhist import GradHistPallas

        return GradHistPallas(bins, range, sigma)
    return GradHist(bins, range, sigma)
