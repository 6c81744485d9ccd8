"""Per-pulse statistics Pallas kernel: masked medians without HBM churn.

The PDW emitter needs, per detected pulse, the median magnitude, the median
wrapped phase difference, and a saturation flag over the pulse extent
(``create_pdws.m:70,86,100``).  The XLA formulation gathers a fixed window
per pulse and runs a 32-step radix selection over it — every step streams
the gathered windows through HBM, which dominates the whole pipeline on
TPU.  This kernel keeps the selection on-chip:

* streams are laid out channel-major ``(M, T/128, 128)`` so any pulse
  window is covered by a lane-aligned ``(rows, 128)`` block — the Mosaic
  slice rule is satisfied by construction and the *mask*, not extraction,
  delimits the pulse: each sample's absolute index is reconstructed from
  (row, lane) iota and compared to the pulse extent;
* one grid step processes a 128-pulse tile of one channel: 128 block DMAs
  are issued back-to-back on shared semaphores, then the dual radix
  selection (k_lo / k_hi order statistics of f32-as-u32 monotone keys) runs
  vectorized across the tile — 32 passes over VMEM-resident data, and the
  128-wide result rows store lane-aligned;
* invalid slots (sentinel ``toa = t_len``) mask to empty and come back NaN,
  exactly like ``ops.medians.masked_median`` on an empty mask.

Exactness: identical order statistics and mean-of-two-middles as the XLA
path, so PDWs match bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 128  # pulses per grid step (= output lane alignment)


def _keys_from_f32(x):
    """Order-preserving u32 keys (ops.medians._sortable_u32, in-kernel)."""
    u = pltpu.bitcast(x, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _f32_from_keys(u):
    neg = (u >> 31) == 0
    raw = jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))
    return pltpu.bitcast(raw, jnp.float32)


def _select_two(keys, mask, k_lo, k_hi):
    """(k_lo, k_hi)-th smallest masked keys per tile slice.

    keys/mask: (TILE, R, LANES); k_*: (TILE, 1, 1) i32.
    Runs both radix descents in one pass loop (shared live-mask compute).
    """
    t = keys.shape[0]
    pref_lo = jnp.zeros((t, 1, 1), jnp.uint32)
    pref_hi = jnp.zeros((t, 1, 1), jnp.uint32)
    klo = k_lo.astype(jnp.int32)
    khi = k_hi.astype(jnp.int32)
    for b in range(31, -1, -1):
        bit = np.uint32(1 << b)
        above = np.uint32((0xFFFFFFFF << (b + 1)) & 0xFFFFFFFF) if b < 31 else np.uint32(0)
        zero_here = (keys & bit) == 0
        for which in (0, 1):
            pref = pref_lo if which == 0 else pref_hi
            kk = klo if which == 0 else khi
            live = mask & ((keys & above) == (pref & above))
            cnt0 = jnp.sum((live & zero_here).astype(jnp.int32),
                           axis=(1, 2)).reshape(t, 1, 1)
            take1 = kk >= cnt0
            kk = jnp.where(take1, kk - cnt0, kk)
            pref = jnp.where(take1, pref | bit, pref)
            if which == 0:
                pref_lo, klo = pref, kk
            else:
                pref_hi, khi = pref, kk
    return pref_lo, pref_hi


def _median_from_prefixes(n, pref_lo, pref_hi):
    med = 0.5 * (_f32_from_keys(pref_lo) + _f32_from_keys(pref_hi))
    return jnp.where(n > 0, med, jnp.nan)


def _stats_kernel(toa_sm, te_sm, mag_hbm, dph_hbm, sat_hbm,
                  mag_out, dph_out, sat_out,
                  mag_buf, dph_buf, sat_buf, sems,
                  *, rows: int, window: int, t_len: int):
    """Grid (M, P_slots // TILE): channel c, pulse tile j.

    ``t_len`` is the number of VALID samples; the arrays may be row-padded
    beyond it (mask kills padded positions via ``idx < t_len``).
    """
    c = pl.program_id(0)
    j = pl.program_id(1)
    n_rows_total = mag_hbm.shape[1]

    copies = []
    toa_scalars = []
    te_scalars = []
    for s in range(TILE):
        slot = j * TILE + s
        toa = toa_sm[c, slot]
        te = te_sm[c, slot]
        toa_scalars.append(toa)
        te_scalars.append(te)
        r0 = jnp.clip(toa // LANES, 0, n_rows_total - rows)
        for hbm, buf, k in ((mag_hbm, mag_buf, 0), (dph_hbm, dph_buf, 1),
                            (sat_hbm, sat_buf, 2)):
            cp = pltpu.make_async_copy(
                hbm.at[c, pl.ds(r0, rows), :], buf.at[s], sems.at[k],
            )
            cp.start()
            copies.append(cp)
    for cp in copies:
        cp.wait()

    toa_v = jnp.stack(toa_scalars).reshape(TILE, 1, 1)
    te_v = jnp.stack(te_scalars).reshape(TILE, 1, 1)
    r0_v = jnp.clip(toa_v // LANES, 0, n_rows_total - rows)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, rows, LANES), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, rows, LANES), 2)
    idx = (r0_v + row_ids) * LANES + lane_ids

    # Reference window semantics (dsp/pdw.py:_emit_batch).
    plen = jnp.minimum(te_v - toa_v + 1, window)
    pos = idx - toa_v
    in_any = (pos >= 0) & (idx < t_len)
    m_mask = in_any & (pos < plen)
    d_mask = in_any & (pos < plen - 1)
    s_mask = in_any & (pos >= 1) & (pos < plen - 1)

    def med(buf, mask):
        keys = _keys_from_f32(buf[...])
        n = jnp.sum(mask.astype(jnp.int32), axis=(1, 2)).reshape(TILE, 1, 1)
        k_lo = jnp.maximum((n - 1) // 2, 0)
        k_hi = jnp.maximum(n // 2, 0)
        lo, hi = _select_two(keys, mask, k_lo, k_hi)
        return _median_from_prefixes(n, lo, hi).reshape(1, TILE)

    mag_out[c, pl.ds(j * TILE, TILE)] = med(mag_buf, m_mask)[0]
    dph_out[c, pl.ds(j * TILE, TILE)] = med(dph_buf, d_mask)[0]
    sat_any = jnp.max(jnp.where(s_mask, sat_buf[...], jnp.float32(0.0)),
                      axis=(1, 2))
    sat_out[c, pl.ds(j * TILE, TILE)] = sat_any


@functools.partial(
    jax.jit,
    static_argnames=("window", "interpret"),
)
def pulse_stats(
    mag_cm: jax.Array,   # (M, T) f32 channel-major magnitude
    dph_cm: jax.Array,   # (M, T) f32 channel-major wrapped phase diff
    sat_cm: jax.Array,   # (M, T) f32 channel-major saturation mask (0/1)
    toa: jax.Array,      # (M, P_slots) i32 leading-edge indices (t_len = invalid)
    te: jax.Array,       # (M, P_slots) i32 trailing-edge indices
    *,
    window: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-pulse (median mag, median dph, saturated) of shape (M, P_slots).

    ``T`` must be a multiple of 128, ``window`` a multiple of 128, and
    ``P_slots`` a multiple of 128 (tile/lane alignment).
    """
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m, t_len = mag_cm.shape
    p_slots = toa.shape[1]
    assert p_slots % TILE == 0, p_slots
    # Row-pad the time axis to whole 128-lane rows (mask excludes the pad).
    t_pad = (-t_len) % LANES
    if t_pad:
        pad = ((0, 0), (0, t_pad))
        mag_cm = jnp.pad(mag_cm, pad)
        dph_cm = jnp.pad(dph_cm, pad)
        sat_cm = jnp.pad(sat_cm, pad)
    t_stored = t_len + t_pad
    # Block coverage: window samples starting anywhere within a row.
    rows = (window + LANES - 1) // LANES + 1
    assert t_stored >= rows * LANES, (t_stored, rows)
    view = (m, t_stored // LANES, LANES)

    kernel = functools.partial(
        _stats_kernel, rows=rows, window=window, t_len=t_len,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m, p_slots // TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # Whole-array blocks: Mosaic requires sublane-divisible or full
            # blocks; each step stores its (channel, tile) row slice.
            pl.BlockSpec((m, p_slots), lambda c, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, p_slots), lambda c, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, p_slots), lambda c, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, rows, LANES), jnp.float32),
            pltpu.VMEM((TILE, rows, LANES), jnp.float32),
            pltpu.VMEM((TILE, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    mag_med, dph_med, sat_any = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, p_slots), jnp.float32),
            jax.ShapeDtypeStruct((m, p_slots), jnp.float32),
            jax.ShapeDtypeStruct((m, p_slots), jnp.float32),
        ],
        interpret=interpret,
    )(toa, te,
      mag_cm.reshape(view), dph_cm.reshape(view), sat_cm.reshape(view))
    return mag_med, dph_med, sat_any
