"""Dense two-level rank search over monotone cumulative counts.

``jnp.searchsorted`` over a (T,) cumsum lowers to a ~log2(T)-step binary
search of scalar gathers; on TPU the gathers run on the scalar core and
dominate PDW edge extraction (~13 ms of a 37 ms step at 16.7M samples,
measured in-graph by ``tools/tpu_bisect.py``).  This formulation uses only
dense vector ops plus one contiguous block gather:

* split the cumsum row into ``block``-sample blocks; a block lies wholly
  below rank ``r`` iff its last value is (< r) — monotonicity — so the
  count of full blocks is a dense compare+reduce over block ends (no
  gathers);
* gather each rank's single partial block (one contiguous ``block``-f32
  slice per (channel, rank) — a sliced gather, not elementwise) and count
  its below-rank entries with another dense compare.

``pos = full_blocks * block + partial_count`` equals
``searchsorted(cum, r, side="left")`` exactly (counts and ranks are
integer-valued f32, exact below 2^24).  Callers hand in channel-major
cumsums so both the block ends and the partial-block slices are contiguous.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def find_ranks_cm(
    cum_cm: jax.Array,   # (M, T) f32, monotone along T (T % block == 0)
    ranks: jax.Array,    # (M, R) f32 query ranks
    t_len: int,
    block: int = 512,
) -> jax.Array:
    """First index with ``cum >= rank`` per (channel, rank); ``t_len`` when
    the rank is never reached (identical to ``jnp.searchsorted(...,
    side="left")`` clamped to ``t_len``).

    ``cum_cm`` may extend past ``t_len`` (e.g. the latch kernel's padded
    tail); positions are clamped so the sentinel stays ``t_len``.
    """
    m, t = cum_cm.shape
    assert t % block == 0, (t, block)
    n_b = t // block
    cb = cum_cm.reshape(m, n_b, block)
    ends = cb[:, :, block - 1]                     # (M, n_b)
    below = ends[:, None, :] < ranks[:, :, None]   # (M, R, n_b)
    full = jnp.sum(below, axis=2).astype(jnp.int32)
    idx = jnp.minimum(full, n_b - 1)

    def take_block(col_blocks, i):  # (n_b, block), () -> (block,)
        return jax.lax.dynamic_index_in_dim(col_blocks, i, 0, keepdims=False)

    part = jax.vmap(jax.vmap(take_block, in_axes=(None, 0)))(cb, idx)
    cnt = jnp.sum(part < ranks[:, :, None], axis=2).astype(jnp.int32)
    return jnp.minimum(idx * block + cnt, t_len)


def take_at_cm(
    vals_cm: jax.Array,  # (M, T) f32 (T % block == 0)
    chan: jax.Array,     # (P,) i32
    idx: jax.Array,      # (P,) i32 in-range sample indices
    block: int = 128,
) -> jax.Array:
    """``vals_cm[chan, idx]`` per query without elementwise gathers.

    Each query reads its one contiguous ``block``-f32 slice
    (``dynamic_index_in_dim`` — the same sliced-gather primitive
    :func:`find_ranks_cm` uses) and picks its lane with a dense one-hot
    compare + reduce, so nothing lowers to per-element scalar-core
    gathers.  Same values as the elementwise formulation.
    """
    m, t = vals_cm.shape
    assert t % block == 0, (t, block)
    vb = vals_cm.reshape(m * (t // block), block)
    flat_blk = chan * (t // block) + idx // block

    def take_block(i):  # () -> (block,)
        return jax.lax.dynamic_index_in_dim(vb, i, 0, keepdims=False)

    rows = jax.vmap(take_block)(flat_blk)                    # (P, block)
    within = (idx - (idx // block) * block)[:, None]
    onehot = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == within
    return jnp.sum(jnp.where(onehot, rows, 0.0), axis=1)
