"""Channel-major transpose kernel parity: ``pallas_cm_streams`` must be
bit-identical to the XLA formulation (wrapped phase diff + ``.T``) on the
real rows/columns, with zero padding beyond ``t_len`` and channel 128."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.ops.pallas.transpose_kernel import (
    LANES,
    T_BLK,
    pallas_cm_streams,
)


def _xla_cm(mag, ph, sat):
    dph = ph[1:] - ph[:-1]
    dph = jnp.where(dph < -180.0, dph + 360.0, dph)
    dph = jnp.where(dph > 180.0, dph - 360.0, dph)
    dph = jnp.concatenate([dph, jnp.zeros((1, ph.shape[1]), dph.dtype)])
    return mag.T, dph.T, sat.T


@pytest.mark.parametrize("seed,t_len,m", [
    (0, T_BLK, 8),            # exactly one block, narrow channel count
    (1, 3 * T_BLK, 128),      # full lane width, multiple blocks
    (2, 2 * T_BLK + 257, 60), # ragged time length -> zero-padded tail
])
def test_cm_streams_match_xla(seed, t_len, m):
    rng = np.random.default_rng(seed)
    mag = jnp.asarray(np.abs(rng.standard_normal((t_len, m))).astype(np.float32))
    ph = jnp.asarray(rng.uniform(-180.0, 180.0, (t_len, m)).astype(np.float32))
    sat = jnp.asarray((rng.random((t_len, m)) < 0.1).astype(np.float32))

    got_mag, got_dph, got_sat = pallas_cm_streams(mag, ph, sat, interpret=True)
    ref_mag, ref_dph, ref_sat = _xla_cm(mag, ph, sat)

    t_pad = (-t_len) % T_BLK
    assert got_mag.shape == (LANES, t_len + t_pad)
    for got, ref in [(got_mag, ref_mag), (got_dph, ref_dph),
                     (got_sat, ref_sat)]:
        got = np.asarray(got)
        np.testing.assert_array_equal(got[:m, :t_len], np.asarray(ref))
        # Padding contract: zero rows past m, zero columns past t_len.
        assert not got[m:].any()
        assert not got[:, t_len:].any()
