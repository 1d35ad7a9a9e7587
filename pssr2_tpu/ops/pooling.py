"""2x2/stride-2 max pooling as a reshape-max.

``nnx.max_pool`` lowers to reduce_window (forward) + select_and_scatter
(backward); the r4 profile attributes ~0.9 ms/step of the canonical
ResUNet train step to that pair (flax pooling.py:73 + the
select-and-scatter category).  For the non-overlapping 2x2/2 case the
reshape formulation is element-identical on the forward pass and
autodiffs through plain max-reduce transposes instead of
select_and_scatter.  Gradient tie-routing differs only where a window's
maxima tie; post-ReLU zero ties don't matter (the ReLU mask kills the
routed cotangent either way — z < 0 on every tied-zero input), and
positive ties are measure-zero in float activations.

Reference semantics: torch MaxPool2d(2) (pssr/models/resunet.py:76).
"""

import jax.numpy as jnp
from flax import nnx

# Probe50 isolation flag (trace-time): False = reduce_window/
# select_and_scatter via nnx.max_pool (the pre-7f724ea form).
RESHAPE_MAX = True


def max_pool_2x2(x):
    """Channels-last (N, H, W, C) -> (N, H/2, W/2, C), max over each
    non-overlapping 2x2 window.  Falls back to ``nnx.max_pool`` for odd
    spatial sizes (reference pads nothing either — torch floors)."""
    n, h, w, c = x.shape
    if not RESHAPE_MAX or h % 2 or w % 2:
        return nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))
