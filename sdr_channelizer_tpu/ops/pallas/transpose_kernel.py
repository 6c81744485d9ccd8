"""Detection-stream transpose kernel: time-major -> channel-major + dph.

The pulse-stats kernel wants channel-major ``(M, T)`` streams (lane-aligned
per-pulse windows), but the channelizer emits time-major ``(T, M)`` blocks
(frames are the matmul rows).  XLA's transpose of this shape costs ~8 ms on
a 16.7M-sample capture — an order of magnitude over its HBM bound — so this
kernel does the layout flip itself:

* one grid step transposes a ``(T_BLK, 128)`` block as ``T_BLK/128``
  MXU ``dot_general`` ops against the identity (``C[i,j] = sum_k A[k,i]
  I[k,j]`` — the lhs-contracting-dim-0 form the MXU computes natively;
  Mosaic has no vector transpose op).  f32 identity matmuls at HIGHEST
  precision are exact (bf16x3 splitting is lossless), so the flip is
  bit-identical to ``x.T``;
* the wrapped phase difference ``dph[t] = wrap(ph[t+1] - ph[t])`` fuses in:
  ``ph`` arrives via a windowed DMA with one look-ahead row (blocked
  BlockSpecs cannot express overlapping windows), the subtraction and the
  +/-180 wraps run in time-major space, and the result rides the same
  transpose — saving a separate XLA pass over the phase stream;
* ``dph`` columns at and past ``t_len - 1`` are zeroed (the reference
  appends a zero row: ``dsp/pdw.py`` to_cm), and output columns past
  ``t_len`` are zero-padded up to the block grid.

Outputs are ``(128, T_pad)`` with ``T_pad = ceil(T / T_BLK) * T_BLK``;
callers pass the true ``t_len`` to ``pulse_stats(..., t_len=...)`` instead
of slicing (a lane-dim slice would copy all three streams again).
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
T_BLK = 1024  # time rows per grid step (must be a multiple of 128)

_TDOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((0,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _cm_kernel(mag_ref, sat_ref, ph_hbm, eye_ref,
               mag_out, dph_out, sat_out,
               ph_buf, sems, *, t_len: int, win: int):
    """Grid (T_pad // T_BLK,): block i covers time rows [i*T_BLK, +T_BLK)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def ph_dma(slot, blk):
        return pltpu.make_async_copy(
            ph_hbm.at[pl.ds(blk * T_BLK, win), :],
            ph_buf.at[slot], sems.at[slot],
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        ph_dma(slot, i).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        ph_dma(nxt, i + 1).start()

    ph_dma(slot, i).wait()

    # Wrapped phase diff in time-major space (same op order as the XLA
    # path -> bit-identical), zeroed at/past the reference's trailing
    # zero row t_len - 1.
    d = ph_buf[slot, 1 : 1 + T_BLK, :] - ph_buf[slot, 0:T_BLK, :]
    d = jnp.where(d < -180.0, d + 360.0, d)
    d = jnp.where(d > 180.0, d - 360.0, d)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    live = (t_iota + i * T_BLK) < (t_len - 1)
    d = jnp.where(live, d, 0.0)

    eye = eye_ref[...]

    def flip(blk_tm, out_ref):
        # (T_BLK, 128) -> (128, T_BLK): per-128-row-tile MXU transpose.
        tiles = [
            _TDOT(blk_tm[k * LANES : (k + 1) * LANES, :], eye)
            for k in range(T_BLK // LANES)
        ]
        out_ref[...] = jnp.concatenate(tiles, axis=1)

    flip(mag_ref[...], mag_out)
    flip(d, dph_out)
    flip(sat_ref[...], sat_out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cm_streams(
    mag: jax.Array,  # (T, M) f32 time-major magnitude
    ph: jax.Array,   # (T, M) f32 time-major phase (degrees)
    sat: jax.Array,  # (T, M) f32 time-major saturation mask (0/1)
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(mag, ph, sat) time-major -> (mag_cm, dph_cm, sat_cm) channel-major.

    Returns ``(128k, T_pad)`` arrays (lanes padded to 128, time padded to
    the block grid with zeros); pass the true ``t_len`` downstream instead
    of slicing.  Bit-identical to ``to_cm`` + ``.T`` on the XLA path.
    """
    interpret = interpret or jax.devices()[0].platform == "cpu"
    t_len, m = mag.shape
    m_pad = max(((m + LANES - 1) // LANES) * LANES, LANES)
    t_pad = (-t_len) % T_BLK
    win = T_BLK + 16  # one look-ahead row, sublane-tile aligned

    def prep(v, extra_rows=0):
        return jnp.pad(v, ((0, t_pad + extra_rows), (0, m_pad - m)))

    mag_p = prep(mag)
    sat_p = prep(sat)
    ph_p = prep(ph, extra_rows=win - T_BLK)  # DMA window overrun pad
    t_stored = t_len + t_pad
    n_blocks = t_stored // T_BLK

    kernel = functools.partial(_cm_kernel, t_len=t_len, win=win)
    out_spec = pl.BlockSpec((m_pad, T_BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((T_BLK, m_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            blk_spec,                               # mag (blocked)
            blk_spec,                               # sat (blocked)
            pl.BlockSpec(memory_space=pl.ANY),      # ph (windowed DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # identity
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, t_stored), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, t_stored), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, t_stored), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, m_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mag_p, sat_p, ph_p, jnp.asarray(np.eye(LANES, dtype=np.float32)))
    return outs[0], outs[1], outs[2]
