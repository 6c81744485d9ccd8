"""``ops.rank_find.find_ranks_cm`` must equal ``jnp.searchsorted(...,
side="left")`` (clamped to t_len) on monotone integer-valued cumsums —
the dense two-level search replaces the gather-based binary search in the
PDW edge extraction, so any divergence shifts pulse TOAs."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm


def _ref(cum_cm, ranks, t_len):
    out = np.empty(ranks.shape, np.int32)
    for c in range(ranks.shape[0]):
        out[c] = np.minimum(
            np.searchsorted(cum_cm[c], ranks[c], side="left"), t_len
        )
    return out


@pytest.mark.parametrize("seed,m,t_len,r,block", [
    (0, 4, 4096, 64, 512),
    (1, 8, 2048, 128, 256),
    (2, 3, 8192, 32, 1024),
])
def test_matches_searchsorted(seed, m, t_len, r, block):
    rng = np.random.default_rng(seed)
    # Sparse 0/1 edge indicators -> monotone integer cumsums, different
    # densities per channel (some channels exceed the rank range, some
    # never reach it).
    dens = rng.uniform(0.001, 0.1, m)
    edges = rng.random((m, t_len)) < dens[:, None]
    cum = np.cumsum(edges, axis=1).astype(np.float32)
    ranks = np.arange(1, r + 1, dtype=np.float32)[None, :].repeat(m, 0)
    # Per-channel rank offsets (the trailing-edge entry_active skip).
    ranks += rng.integers(0, 2, (m, 1)).astype(np.float32)

    got = np.asarray(find_ranks_cm(jnp.asarray(cum), jnp.asarray(ranks),
                                   t_len, block=block))
    np.testing.assert_array_equal(got, _ref(cum, ranks, t_len))


@pytest.mark.parametrize("seed,m,t_len,p,block", [
    (0, 4, 4096, 500, 128),
    (1, 3, 1024, 257, 256),
])
def test_take_at_cm_matches_elementwise(seed, m, t_len, p, block):
    from sdr_channelizer_tpu.ops.rank_find import take_at_cm

    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((m, t_len)).astype(np.float32)
    chan = rng.integers(0, m, p).astype(np.int32)
    idx = rng.integers(0, t_len, p).astype(np.int32)
    got = np.asarray(take_at_cm(jnp.asarray(vals), jnp.asarray(chan),
                                jnp.asarray(idx), block=block))
    np.testing.assert_array_equal(got, vals[chan, idx])


def test_padded_tail_and_edge_cases():
    """Cumsum columns past t_len (the latch kernel's pad) must not push
    positions past the t_len sentinel; all-zero and step-at-0 columns hit
    the first/last-block corner cases."""
    t_len, t_pad, block = 1000, 1024, 256
    cum = np.zeros((3, t_pad), np.float32)
    cum[1, :] = 1.0                      # edge at t=0
    cum[2, t_len:] = 5.0                 # pad-only jump (open-pulse close)
    ranks = np.arange(1.0, 9.0, dtype=np.float32)[None, :].repeat(3, 0)
    got = np.asarray(find_ranks_cm(jnp.asarray(cum), jnp.asarray(ranks),
                                   t_len, block=block))
    assert (got[0] == t_len).all()            # no edges at all
    assert got[1, 0] == 0                     # first edge at index 0
    assert (got[1, 1:] == t_len).all()
    assert (got[2] == t_len).all()            # pad jump clamps to sentinel
