"""Pulse-latch + edge-count Pallas kernel: the hysteresis scan in one pass.

The detector's pulse-active latch (set when ``mag >= lead``, reset when
``mag <= trail``, hold otherwise — ``create_pdws.m:51-105``) is function
composition over 2-bit boolean transfer functions (``dsp/pdw.py``).  XLA's
``associative_scan`` evaluates it in log2(T) materializing passes over HBM
(~27 ms at 16.7M samples); this kernel does ONE pass: a sequential grid
over time blocks, the in-block prefix composed in VMEM with a Hillis-Steele
ladder over sublane rolls, and the latch state + cumulative edge counts
carried across blocks in scratch (TPU Pallas grids execute sequentially, so
scratch is a legal loop carry).

Outputs are the **inclusive cumulative counts** of leading and trailing
edges per channel — exactly ``cumsum(lead_edge)`` / ``cumsum(trail_edge)``
of the XLA formulation — emitted **channel-major** ``(128k, T_pad)``: the
caller finds each rank's edge position with the dense two-level search
(``ops.rank_find``), whose block-end compares and partial-block slices need
contiguous per-channel rows.  The layout flip rides the same MXU
identity-matmul transpose as ``ops/pallas/transpose_kernel.py`` (exact:
f32 HIGHEST-precision identity matmuls are lossless), so no separate XLA
transpose pass touches the (T, M) arrays.

Arithmetic notes: transfer functions and masks are carried as f32 0/1
(Mosaic cannot carry i1 vectors through loops), and counts stay exact in
f32 for T < 2^24 (the ``pulse_stats`` kernel has the same bound).
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

_TDOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((0,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _latch_kernel(mag_ref, lead_ref, trail_ref, entry_ref, eye_ref,
                  cl_ref, ct_ref, carry,
                  *, t_blk: int, log_steps: int, m_real: int):
    """Grid (T // t_blk,), sequential.  carry rows: 0 = entry state,
    1 = lead-count base, 2 = trail-count base (per channel; with the
    packed-pair layout row 1 holds both bases and row 2 is unused).

    The element transfer functions are encoded as ONE 3-state value
    ``t = (mag >= lead) - (mag <= trail)`` (+1 set, -1 reset, 0 hold):
    with ``lead > trail`` elementwise (the reference's strictly separated
    dB thresholds guarantee it) the toggle state cannot occur, and
    composition is ``later + (1 - later^2) * earlier`` — ONE roll and ~5
    VPU ops per ladder step instead of the two-roll (f(0), f(1)) form.
    (Only corner: a channel whose lead == trail threshold AND an exactly
    threshold-valued sample — e.g. an all-zero channel with a zero noise
    floor — holds instead of toggling; the XLA scan's toggle there is
    detector noise, not signal.)

    When ``2 * m_real <= 128`` the lead/trail edge cumsums share one
    128-lane ladder (trail parked in lanes [m_real, 2*m_real)) and one
    MXU flip — half the rolls and transpose matmuls of two chains."""
    i = pl.program_id(0)
    m = mag_ref.shape[1]
    pair = 2 * m_real <= m

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        carry[0:1, :] = entry_ref[0:1, :]

    mag = mag_ref[...]
    t = ((mag >= lead_ref[0:1, :]).astype(jnp.float32)
         - (mag <= trail_ref[0:1, :]).astype(jnp.float32))

    row = jax.lax.broadcasted_iota(jnp.int32, (t_blk, m), 0)
    # Inclusive prefix composition (identity = hold = 0, so the keep-mask
    # multiply doubles as the boundary fill).
    for k in range(log_steps):
        s = 1 << k
        keep = (row >= s).astype(jnp.float32)
        te = keep * pltpu.roll(t, s, axis=0)
        t = t + (1.0 - t * t) * te

    entry = carry[0:1, :]
    state = 0.5 * t * (t + 1.0) + (1.0 - t * t) * entry
    prev = pltpu.roll(state, 1, axis=0)
    is0 = (row < 1).astype(jnp.float32)
    prev = is0 * entry + (1.0 - is0) * prev
    lead = state * (1.0 - prev)
    trail = prev * (1.0 - state)

    eye = eye_ref[...]

    def flip(blk_tm):
        # (t_blk, m) -> (m, t_blk): per-128-row-tile MXU transpose
        # (transpose_kernel.py's trick; m is lane-padded to 128 here).
        tiles = [
            _TDOT(blk_tm[k * LANES:(k + 1) * LANES, :], eye)
            for k in range(t_blk // LANES)
        ]
        return jnp.concatenate(tiles, axis=1)

    if pair:
        # Park the trail chain in lanes [m_real, 2*m_real): pad lanes are
        # all-zero, so the cyclic lane roll wraps zeros into [0, m_real).
        packed = lead + pltpu.roll(trail, m_real, axis=1)
        for k in range(log_steps):
            s = 1 << k
            keep = (row >= s).astype(jnp.float32)
            packed = packed + keep * pltpu.roll(packed, s, axis=0)
        packed = carry[1:2, :] + packed
        packed_cm = flip(packed)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (m, t_blk), 0)
        keep_m = (rowi < m_real).astype(jnp.float32)
        cl_ref[...] = keep_m * packed_cm
        ct_ref[...] = keep_m * pltpu.roll(packed_cm, m - m_real, axis=0)
        carry[0:1, :] = state[t_blk - 1 : t_blk, :]
        carry[1:2, :] = packed[t_blk - 1 : t_blk, :]
    else:
        for k in range(log_steps):
            s = 1 << k
            keep = (row >= s).astype(jnp.float32)
            lead = lead + keep * pltpu.roll(lead, s, axis=0)
            trail = trail + keep * pltpu.roll(trail, s, axis=0)
        cl = carry[1:2, :] + lead
        ct = carry[2:3, :] + trail
        cl_ref[...] = flip(cl)
        ct_ref[...] = flip(ct)
        carry[0:1, :] = state[t_blk - 1 : t_blk, :]
        carry[1:2, :] = cl[t_blk - 1 : t_blk, :]
        carry[2:3, :] = ct[t_blk - 1 : t_blk, :]


def _latch_cm_kernel(mag_ref, lead_ref, trail_ref, entry_ref,
                     packed_ref, carry, *, t_blk: int, log_steps: int):
    """Channel-major latch: grid over time blocks of a (R, T) channel-major
    magnitude, prefix composition ladders along LANES (time), carry in
    scratch — same algebra as :func:`_latch_kernel` but zero MXU flips and
    slimmer traffic: the streams arrive channel-major from the fused
    channelizer kernel and the cumsums leave channel-major for the rank
    search, so no layout change happens at all.

    Lead and trail cumulative counts stack into ONE (2R, t_blk) output by
    row concatenation — rows [0, R) = lead, [R, 2R) = trail — for ANY
    channel count (no lane-roll pair packing, no non-pair split), and the
    edge-cumsum ladder runs once over the stacked array.  Carry scratch
    (2R, LANES): col 0 = packed count base, col 1 rows [0, R) = latch
    state.
    """
    i = pl.program_id(0)
    r = mag_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        carry[0:r, 1:2] = entry_ref[:, 0:1]

    mag = mag_ref[...]
    t = ((mag >= lead_ref[:, 0:1]).astype(jnp.float32)
         - (mag <= trail_ref[:, 0:1]).astype(jnp.float32))

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, t_blk), 1)
    for k in range(log_steps):
        s = 1 << k
        keep = (lane >= s).astype(jnp.float32)
        te = keep * pltpu.roll(t, s, axis=1)
        t = t + (1.0 - t * t) * te

    entry = carry[0:r, 1:2]
    state = 0.5 * t * (t + 1.0) + (1.0 - t * t) * entry
    prev = pltpu.roll(state, 1, axis=1)
    is0 = (lane < 1).astype(jnp.float32)
    prev = is0 * entry + (1.0 - is0) * prev
    lead = state * (1.0 - prev)
    trail = prev * (1.0 - state)

    bits = jnp.concatenate([lead, trail], axis=0)  # (2r, t_blk)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * r, t_blk), 1)
    for k in range(log_steps):
        s = 1 << k
        keep = (lane2 >= s).astype(jnp.float32)
        bits = bits + keep * pltpu.roll(bits, s, axis=1)
    packed = carry[:, 0:1] + bits
    packed_ref[...] = packed
    carry[:, 0:1] = packed[:, t_blk - 1 : t_blk]
    carry[0:r, 1:2] = state[:, t_blk - 1 : t_blk]


@functools.partial(jax.jit, static_argnames=("t_blk", "interpret"))
def _latch_cm_call(mag_cm, lead_col, trail_col, entry_col, *, t_blk: int,
                   interpret: bool):
    r, t_len = mag_cm.shape
    assert t_len % t_blk == 0, (t_len, t_blk)
    assert r % 8 == 0, r
    log_steps = int(np.log2(t_blk))
    assert (1 << log_steps) == t_blk
    kernel = functools.partial(_latch_cm_kernel, t_blk=t_blk,
                               log_steps=log_steps)
    blk = pl.BlockSpec((r, t_blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((2 * r, t_blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((r, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t_len // t_blk,),
        in_specs=[blk, col, col, col],
        out_specs=[blk2],
        out_shape=[jax.ShapeDtypeStruct((2 * r, t_len), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2 * r, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(mag_cm, lead_col, trail_col, entry_col)[0]


def pallas_latch_cumsums_cm(
    mag_cm: jax.Array,
    lead_thresh: jax.Array,
    trail_thresh: jax.Array,
    m_real: int,
    entry_active=None,
    t_blk: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Channel-major latch cumsums straight from channel-major magnitudes.

    ``mag_cm``: (R, T) float32 with the first ``m_real`` rows real channels
    (the fused channelizer kernel's slim cm output, R = 8-aligned M; pad
    rows and pad columns past the capture are zero — zero pad columns
    close any open pulse with one trailing edge at the first pad column,
    and an exactly-zero threshold holds rather than toggles, per the
    3-state encoding note in :func:`_latch_kernel`).
    ``lead_thresh``/``trail_thresh``: (m_real,) per-channel absolute
    thresholds.  T must be a multiple of ``t_blk`` (the channelizer kernel
    pads to its block grid; pass its padded T).

    Returns ONE (2R, T) array: rows [0, R) = ``cumsum(lead_edge)``, rows
    [R, 2R) = ``cumsum(trail_edge)`` — any channel count, one rank-search
    call.  Versus :func:`pallas_latch_cumsums` this skips the MXU
    transpose flips entirely and reads/writes no 128-row padding.
    """
    interpret = interpret or jax.devices()[0].platform == "cpu"
    r, t_len = mag_cm.shape
    while t_len % t_blk:
        t_blk //= 2

    def prep_col(v, fill):
        colv = jnp.full((r,), fill, jnp.float32).at[:m_real].set(
            v.astype(jnp.float32))
        return jnp.broadcast_to(colv[:, None], (r, LANES))

    lead_col = prep_col(lead_thresh, np.inf)
    trail_col = prep_col(trail_thresh, np.inf)
    if entry_active is None:
        entry_col = jnp.zeros((r, LANES), jnp.float32)
    else:
        entry_col = prep_col(entry_active, 0.0)
    return _latch_cm_call(mag_cm, lead_col, trail_col, entry_col,
                          t_blk=t_blk, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("t_blk", "interpret", "m_real"))
def _latch_call(mag, lead_row, trail_row, entry_row, *, t_blk: int,
                interpret: bool, m_real: int):
    t_len, m = mag.shape
    assert t_len % t_blk == 0
    assert m % LANES == 0, m
    log_steps = int(np.log2(t_blk))
    assert (1 << log_steps) == t_blk
    kernel = functools.partial(_latch_kernel, t_blk=t_blk, log_steps=log_steps,
                               m_real=m_real)
    blk = pl.BlockSpec((t_blk, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((8, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((m, t_blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t_len // t_blk,),
        in_specs=[blk, row, row, row,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # identity
        out_specs=[out, out],
        out_shape=[
            jax.ShapeDtypeStruct((m, t_len), jnp.float32),
            jax.ShapeDtypeStruct((m, t_len), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, m), jnp.float32)],
        # Double-buffered (t_blk, m) in + two (m, t_blk) outs top the 16 MB
        # default scoped-VMEM budget for t_blk >= 8192; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(mag, lead_row, trail_row, entry_row,
      jnp.asarray(np.eye(LANES, dtype=np.float32)))


def pallas_latch_cumsums(
    mag: jax.Array,
    lead_thresh: jax.Array,
    trail_thresh: jax.Array,
    entry_active=None,
    t_blk: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Channel-major inclusive cumulative lead/trail edge counts.

    ``mag``: (T, M) float32 time-major detection magnitudes.
    ``lead_thresh`` / ``trail_thresh``: (M,) per-channel absolute thresholds
    (``noise_floor * 10^(dB/10)``).  ``entry_active``: optional (M,) bool
    latch state entering the block (default inactive — the whole-capture
    case).  Returns two ``(128k, T_pad)`` float32 arrays whose first M rows
    and T columns equal ``cumsum(lead_edge, axis=0).T`` /
    ``cumsum(trail_edge, axis=0).T`` of the XLA formulation (T must stay
    below 2^24 for the counts to be f32-exact).

    Padded tail semantics (columns in [T, T_pad)): the pad magnitude is
    -inf, so no lead edges fire there and a pulse open at T closes with one
    trailing edge at column T exactly — ``ops.rank_find.find_ranks_cm``
    clamped to ``t_len`` therefore returns the same sentinel positions as
    a search over the unpadded arrays.  Pad channels (rows in [M, 128k))
    see a +inf lead threshold and count nothing.
    """
    interpret = interpret or jax.devices()[0].platform == "cpu"
    t_len, m = mag.shape
    m_pad = max(((m + LANES - 1) // LANES) * LANES, LANES)
    pad_t = (-t_len) % t_blk
    if pad_t or m_pad != m:
        mag = jnp.pad(mag, ((0, pad_t), (0, m_pad - m)),
                      constant_values=-np.inf)

    def prep_row(v, fill):
        row = jnp.full((8, m_pad), fill, jnp.float32)
        return row.at[:, :m].set(v.astype(jnp.float32)[None, :])

    lead_row = prep_row(lead_thresh, np.inf)
    trail_row = prep_row(trail_thresh, np.inf)
    if entry_active is None:
        entry_row = jnp.zeros((8, m_pad), jnp.float32)
    else:
        entry_row = prep_row(entry_active, 0.0)
    return _latch_call(mag, lead_row, trail_row, entry_row, t_blk=t_blk,
                       interpret=interpret, m_real=m)
