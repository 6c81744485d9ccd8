"""Median reductions — the reference leans on medians everywhere
(noise floor ``create_pdws.m:44``, pulse magnitude ``:70``, phase difference
``:86``, PRI ``predict_event.m:135``).  MATLAB ``median`` semantics: middle
element for odd length, mean of the two middle elements for even length.

On TPU, medians are sort-based; for masked fixed-width windows (per-pulse
statistics under static shapes) we sort with +inf padding and index the
middle by the true count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def median(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exact MATLAB-semantics median along ``axis`` (jnp.median matches)."""
    return jnp.median(x, axis=axis)


def masked_median(x: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Median of ``x`` where ``mask`` is True along ``axis``.

    Static-shape friendly: pads masked-out entries with +inf, sorts, and
    averages the two middle order statistics (equal for odd counts).
    Returns NaN where the mask is empty.
    """
    x = jnp.where(mask, x, jnp.inf)
    x = jnp.sort(x, axis=axis)
    n = jnp.sum(mask, axis=axis, keepdims=True)
    lo_idx = jnp.maximum((n - 1) // 2, 0)
    hi_idx = jnp.maximum(n // 2, 0)
    lo = jnp.take_along_axis(x, lo_idx, axis=axis)
    hi = jnp.take_along_axis(x, hi_idx, axis=axis)
    med = 0.5 * (lo + hi)
    med = jnp.where(jnp.squeeze(n, axis) > 0, jnp.squeeze(med, axis), jnp.nan)
    return med
