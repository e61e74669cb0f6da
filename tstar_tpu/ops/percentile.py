"""Masked percentile with NumPy 'linear' interpolation semantics.

The reference computes ``np.percentile(x, 75)`` in two hot spots of the search
loop (reference ``TStar/interface_searcher.py:229,346``).  On TPU every array
is padded to a static length, so the percentile has to ignore padded entries;
this implements the same linear-interpolation rule over only the valid prefix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_percentile(x: jax.Array, q: float, valid: jax.Array) -> jax.Array:
    """Percentile of ``x[valid]`` matching ``np.percentile(x, q)``.

    Args:
        x: 1-D float array (padded).
        q: percentile in [0, 100] (static).
        valid: boolean mask, same shape as ``x``; invalid entries are ignored.

    Returns:
        Scalar percentile value (dtype of ``x``).
    """
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    sorted_x = jnp.sort(jnp.where(valid, x, big))
    n = jnp.sum(valid)
    # np.percentile 'linear': pos = (n-1) * q/100; interpolate neighbours.
    pos = (n - 1).astype(x.dtype) * (q / 100.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    frac = pos - lo.astype(x.dtype)
    return sorted_x[lo] * (1.0 - frac) + sorted_x[hi] * frac
