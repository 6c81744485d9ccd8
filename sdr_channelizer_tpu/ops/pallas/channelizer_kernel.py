"""Fused polyphase-channelizer Pallas kernel.

One pass over the capture computes, per hop ``n`` and band ``k``:

    u[n, rho] = sum_p Hr[p, rho] * F[n + P-1 - p, rho]      (branch FIR, VPU)
    y[n, k]   = sum_rho u[n, rho] * W[rho, k]               (DFT, MXU)

where ``F`` is the frame view of the input with ``P-1`` zero history frames
prepended (MATLAB System-object zero initial state) and ``W`` is the
fftshift-folded DFT matrix (``dsp/channelizer.py:dft_matrix``).  Complex
arithmetic is split into f32 planes — four ``(T_blk, M) @ (M, M)`` real
matmuls per block — because the MXU is a real systolic array.

The FIR needs overlapping input windows (``T_blk + P - 1`` frames per
``T_blk``-frame output block), which blocked ``BlockSpec`` indexing cannot
express; inputs therefore stay in HBM (``memory_space=ANY``) and each grid
step DMAs its window into a double-buffered VMEM scratch, overlapping the
next window's DMA with the current block's compute.  Outputs use regular
blocked specs so Mosaic pipelines the stores.

Semantics match ``dsp.channelizer.channelize(x, chan, method="dft")``
exactly (same op order per element); the win is fusion — one HBM read of
the capture instead of XLA's separate FIR/matmul passes — on the dominant
bandwidth-bound workload (reference workload shape:
``create_pdws_channelized.m:57``, M = 56..560 bands at 56 Msps).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_TDOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((0,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)

# Precision of the four DFT matmuls in the streams kernels.  HIGHEST =
# 6-pass bf16 (bit-parity with the jnp DFT oracle on real TPUs);
# "bf16x3" = a hand-rolled 3-limb product (a_hi@b_hi + a_lo@b_hi +
# a_hi@b_lo over bf16 limbs, ~1e-6 relative — well inside the reference's
# SNR contract; Mosaic does not lower Precision.HIGH) that roughly halves
# the kernel's MXU time.  The identity-transpose flips are NOT governed
# by this (they must stay HIGHEST to remain exact).  Interpret mode (CPU
# tests) executes HIGHEST as exact f32.
DFT_PRECISION = jax.lax.Precision.HIGHEST

# Round-5 v3 cm2 route default: transpose the complex planes before the
# elementwise stream math (see _streams_kernel transpose_first).  Module
# knob so the TPU probes can A/B both forms full-graph; wrappers treat
# ``transpose_first=None`` as this value.
CM2_TRANSPOSE_FIRST = True

# MXU identity-transpose precision: the HIGHEST f32 matmul costs ~6 bf16
# passes; a 3-limb Dekker split (a = hi + mid + lo with 8-bit-mantissa
# limbs, each multiplied by the exactly-representable 0/1 identity and
# accumulated in f32) reconstructs every NORMAL f32 exactly in 3 passes:
# each limb product is exact, hi+mid spans <= 18 mantissa bits (exact),
# and the final add's true sum IS the original representable value, so
# round-to-nearest returns it bit-exactly.  Values below ~2^-110 would
# lose limb bits to bf16 subnormal flushing — the TPU flushes f32
# subnormals anyway, and the detection streams are dequantized Q11/Q7
# data far above that range.  Shipped on: -0.17 ms dense / -0.26 sparse
# full-graph on v5e (PROBE_r05 G).
TRANSPOSE_LIMB3 = True


def _flip_tile(a, eye):
    """(128, m_pad) tile -> (m_pad, 128) via identity matmul (see
    TRANSPOSE_LIMB3 for the 3-pass exact mode)."""
    if TRANSPOSE_LIMB3:
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        eye_b = eye.astype(jnp.bfloat16)
        d = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return d(hi, eye_b) + d(mid, eye_b) + d(lo, eye_b)
    return _TDOT(a, eye)

# Grid time-block cap of the cm2 streams kernels (frames per grid step).
# Swept full-graph in tools/tpu_probe_r4.py part I: 4096 is -0.2 ms/step
# vs 1024 at M=64 (fewer grid-sequencing steps).  The per-call default
# (_default_cm2_block) caps at 1024 for lane-padded M > 128 (VMEM: the
# DMA window scratch scales with m_pad) and shrinks for short captures
# (padding to the grid would dominate them).
CM2_BLOCK_FRAMES = 4096


def _tf_wins(n_bands: int, m_pad: int) -> bool:
    """Shape heuristic for the transpose-first form: it halves the
    elementwise stream math only when the EMITTED rows (the shard's band
    slice under channel sharding) are a small fraction of the lane pad,
    and costs an extra 128 look-ahead rows of FIR/DFT either way.
    Measured crossover on v5e (PROBE_r05 A vs M560_r05 knobs):
    M=64/m_pad=128 (ratio 0.5) wins -0.36 ms; M=560/m_pad=640 (ratio
    0.875) loses +0.28 ms."""
    return (((n_bands + 7) // 8) * 8) * 5 <= m_pad * 3


def _default_cm2_block(n_frames: int, m_pad: int) -> int:
    cap = CM2_BLOCK_FRAMES if m_pad <= 128 else 1024
    b = 256
    while b < cap and b < n_frames:
        b *= 2
    return min(b, cap)


def _dot_dft(a, b):
    """One DFT matmul at the configured precision (see DFT_PRECISION)."""
    if DFT_PRECISION == "bf16x3":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=DFT_PRECISION)


def _win_rows(t_blk: int, p: int, tile: int = 16) -> int:
    """DMA window rows, rounded up to the sublane tiling (16 covers both
    f32 and int16 scratch — Mosaic requires tile-aligned slice shapes)."""
    win = t_blk + p - 1
    return ((win + tile - 1) // tile) * tile


def _kernel(xr_ref, xi_ref, taps_ref, wr_ref, wi_ref, yr_ref, yi_ref,
            buf_r, buf_i, sems, *, block_frames: int, taps_per_band: int):
    """Grid step i: window rows [i*T, i*T + T + P - 1) -> block i output."""
    t_blk = block_frames
    p = taps_per_band
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    win = _win_rows(t_blk, p)  # sublane-tiling-aligned DMA window

    def window_dma(slot, blk_idx):
        return (
            pltpu.make_async_copy(
                xr_ref.at[pl.ds(blk_idx * t_blk, win), :],
                buf_r.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                xi_ref.at[pl.ds(blk_idx * t_blk, win), :],
                buf_i.at[slot], sems.at[slot, 1],
            ),
        )

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():  # warm-up: start this block's own window
        for dma in window_dma(slot, i):
            dma.start()

    @pl.when(i + 1 < n_blocks)
    def _():  # overlap: start the next window while we compute
        for dma in window_dma(next_slot, i + 1):
            dma.start()

    for dma in window_dma(slot, i):
        dma.wait()

    # Branch FIR: P shifted multiply-accumulates over the window.
    m = xr_ref.shape[1]
    ur = jnp.zeros((t_blk, m), jnp.float32)
    ui = jnp.zeros((t_blk, m), jnp.float32)
    for pp in range(p):
        tap = taps_ref[pp : pp + 1, :]  # (1, m): keep 2-D for Mosaic
        sl = slice(p - 1 - pp, p - 1 - pp + t_blk)
        ur = ur + tap * buf_r[slot, sl, :]
        ui = ui + tap * buf_i[slot, sl, :]

    # Channel extraction: complex DFT as four real MXU matmuls.
    wr = wr_ref[...]
    wi = wi_ref[...]
    yr_ref[...] = (
        jnp.dot(ur, wr, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        - jnp.dot(ui, wi, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    )
    yi_ref[...] = (
        jnp.dot(ur, wi, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(ui, wr, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "interpret"),
)
def _pallas_fir_dft(
    xr: jax.Array,      # (n_frames_padded + P - 1, M) f32, history-prepended
    xi: jax.Array,
    taps: jax.Array,    # (P, M) f32 frame-aligned polyphase taps
    wr: jax.Array,      # (M, M) f32 Re(DFT), shift folded in
    wi: jax.Array,      # (M, M) f32 Im(DFT)
    *,
    block_frames: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    p, m = taps.shape
    win = _win_rows(block_frames, p)
    n_frames = xr.shape[0] - (win - block_frames)
    assert n_frames % block_frames == 0
    n_blocks = n_frames // block_frames

    kernel = functools.partial(
        _kernel, block_frames=block_frames, taps_per_band=p
    )
    yr, yi = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xr stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # xi stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wi
        ],
        out_specs=[
            pl.BlockSpec((block_frames, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_frames, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_frames, m), jnp.float32),
            jax.ShapeDtypeStruct((n_frames, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, m), jnp.float32),
            pltpu.VMEM((2, win, m), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xr, xi, taps, wr, wi)
    return yr, yi


def _lane_pad(m: int, lanes: int = 128) -> int:
    """Channel count padded up to the TPU lane width (Mosaic slice rule)."""
    return max(((m + lanes - 1) // lanes) * lanes, lanes)


def _pad_weights(taps_rev: np.ndarray, w: np.ndarray, m_pad: int):
    """Zero-pad taps (P, M)->(P, M_pad) and the DFT matrix (M, M)->
    (M_pad, M_pad) (zero rows/cols: padded branches contribute nothing and
    padded channels read back zero)."""
    p, m = taps_rev.shape
    taps_p = np.zeros((p, m_pad), np.float32)
    taps_p[:, :m] = taps_rev
    wr = np.zeros((m_pad, m_pad), np.float32)
    wi = np.zeros((m_pad, m_pad), np.float32)
    wr[:m, :m] = np.real(w)
    wi[:m, :m] = np.imag(w)
    return jnp.asarray(taps_p), jnp.asarray(wr), jnp.asarray(wi)


def _pad_weight_slice(taps_rev: np.ndarray, wr, wi, m_pad: int):
    """Like :func:`_pad_weights` but for an externally supplied (possibly
    traced, possibly column-sliced) DFT matrix pair ``wr/wi`` of shape
    (M, n_bands) — the channel-sharded fused pipeline hands each mesh
    column its band slice.  Pads rows to ``m_pad`` and columns up to the
    lane width.  The contraction still runs over the same ``m_pad`` rows in
    the same order as the full-matrix kernel, so each emitted band is
    bit-identical to the unsharded kernel's."""
    p, m = taps_rev.shape
    taps_p = np.zeros((p, m_pad), np.float32)
    taps_p[:, :m] = taps_rev
    nb = wr.shape[1]
    nb_pad = _lane_pad(nb)
    pad = ((0, m_pad - wr.shape[0]), (0, nb_pad - nb))
    return (jnp.asarray(taps_p),
            jnp.pad(jnp.asarray(wr, jnp.float32), pad),
            jnp.pad(jnp.asarray(wi, jnp.float32), pad))


def _atan_poly(z):
    """Cephes single-precision atan kernel, |z| <= tan(pi/8); ~1e-7 abs err."""
    s = z * z
    return ((((8.05374449538e-2 * s - 1.38776856032e-1) * s + 1.99777106478e-1)
             * s - 3.33329491539e-1) * s * z + z)


def _atan2(y, x):
    """Elementwise atan2 built from compares + the Cephes polynomial.

    Mosaic (Pallas TPU) has no ``atan2`` primitive; this is the standard
    three-interval range reduction (z, (z-1)/(z+1), 1/z) + quadrant fixup,
    matching ``jnp.arctan2`` to ~1e-6 rad.  Handles x=y=0 -> 0 and the
    +/-pi boundaries like the IEEE convention (sign of y).
    """
    pi = jnp.float32(np.pi)
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    # t = atan(abs_y / abs_x) on [0, inf) via three-way reduction.
    safe_x = jnp.where(abs_x == 0.0, jnp.float32(1.0), abs_x)
    z = abs_y / safe_x
    z = jnp.where(abs_x == 0.0, jnp.float32(jnp.inf), z)
    t_hi = jnp.float32(2.414213562373095)  # tan(3*pi/8)
    t_lo = jnp.float32(0.4142135623730950)  # tan(pi/8)
    inv = jnp.where(z > t_hi, 1.0 / jnp.maximum(z, jnp.float32(1e-30)), z)
    mid = (z - 1.0) / (z + 1.0)
    arg = jnp.where(z > t_hi, inv, jnp.where(z > t_lo, mid, z))
    base = _atan_poly(arg)
    t = jnp.where(
        z > t_hi, pi / 2 - base,
        jnp.where(z > t_lo, pi / 4 + base, base),
    )
    t = jnp.where(jnp.isinf(z), pi / 2, t)
    # Quadrants: x >= 0 -> sign(y) * t;  x < 0 -> sign(y) * (pi - t).
    ang = jnp.where(x < 0.0, pi - t, t)
    ang = jnp.where(y < 0.0, -ang, ang)
    # x<0, y==0 -> +pi; origin -> 0 (atan2 conventions)
    ang = jnp.where((y == 0.0) & (x < 0.0), pi, ang)
    ang = jnp.where((y == 0.0) & (x == 0.0), jnp.float32(0.0), ang)
    return ang


def _streams_kernel(xr_ref, xi_ref, taps_ref, wr_ref, wi_ref,
                    *refs, block_frames: int, taps_per_band: int,
                    scale: float, sat_level: float, packed: bool = False,
                    channel_major: bool = False, t_len: int = 0,
                    cm2: bool = False, m_out: int = 0,
                    transpose_first: bool = False):
    """Fused channelize + detection-stream kernel: int16 (or f32) planes in;
    magnitude, phase (degrees), and saturation-mask blocks out.

    Fuses the dequant (``x * 2^-(bw-1)``), branch FIR, DFT matmuls, and the
    ``_prep_streams`` math (|y|, angle in degrees, |Re|,|Im| >= level) of
    the PDW front-end into one pass — the capture is read from HBM exactly
    once (SURVEY.md section 7 step 3).

    With ``channel_major`` the kernel additionally emits the transposed
    detection streams the pulse-stats stage wants — ``(128, T)`` magnitude,
    wrapped phase diff, and saturation — straight from VMEM via the MXU
    identity-transpose trick (``transpose_kernel.py``), replacing the
    separate transpose pass (3 stream writes + 3 reads + 3 writes of HBM
    traffic become 1 write + 3 writes; ~2.2 ms of a 12.7 ms step on v5e).
    The phase diff needs one look-ahead frame, so the FIR/DFT run over
    ``t_blk + 8`` rows (sublane-aligned) and the outputs take rows
    [0, t_blk); ``dph`` columns at/past ``t_len - 1`` are zeroed (the
    reference's trailing zero row, ``dsp/pdw.py``).
    """
    t_blk = block_frames
    p = taps_per_band
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    # transpose_first (round-5 v3 cm2 route) needs a whole extra 128-row
    # transpose tile of look-ahead for the channel-major phase diff; the
    # transpose-last form needs only 8 (sublane-aligned) rows.
    extra = (128 if transpose_first else 8) if channel_major else 0
    win = _win_rows(t_blk + extra, p)  # sublane-tiling-aligned DMA window
    if cm2:
        # v2 cm route: NO time-major magnitude output (the noise floor and
        # latch read the cm stream), saturation emitted as an inclusive
        # per-channel CUMSUM along time (carried across blocks) so the
        # stats stage can flag pulses with two gathers instead of a third
        # whole-window DMA per slot.
        eye_ref = refs[0]
        mag_cm_ref, dph_cm_ref, satcs_cm_ref = refs[1:4]
        buf_r, buf_i, sems, sat_carry = refs[4:]
    elif channel_major:
        eye_ref = refs[0]
        mag_ref, mag_cm_ref, dph_cm_ref, sat_cm_ref = refs[1:5]
        buf_r, buf_i, sems = refs[5:]
    else:
        mag_ref, ph_ref, sat_ref = refs[0:3]
        buf_r, buf_i, sems = refs[3:]

    def window_dma(slot, blk_idx):
        copies = [
            pltpu.make_async_copy(
                xr_ref.at[pl.ds(blk_idx * t_blk, win), :],
                buf_r.at[slot], sems.at[slot, 0],
            ),
        ]
        if not packed:
            copies.append(pltpu.make_async_copy(
                xi_ref.at[pl.ds(blk_idx * t_blk, win), :],
                buf_i.at[slot], sems.at[slot, 1],
            ))
        return copies

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        for dma in window_dma(slot, i):
            dma.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for dma in window_dma(next_slot, i + 1):
            dma.start()

    for dma in window_dma(slot, i):
        dma.wait()

    m = xr_ref.shape[1]
    # Dequantize the whole window ONCE when a conversion is needed (the P
    # tap windows overlap almost entirely — per-tap dequant re-converts
    # every row P times and costs ~2.5x on the packed path).  Already-f32
    # unscaled inputs slice the scratch directly (a hoisted copy only adds
    # a full-window pass there).
    dequant = packed or scale != 1.0 or buf_r.dtype != jnp.float32
    if packed and buf_r.dtype == jnp.int32:
        # int32-packed int16 I/Q pair: low half = I, high half = Q
        # (little-endian interleave), sign-extended by arithmetic shifts.
        v = buf_r[slot]
        vi_win = ((v << 16) >> 16).astype(jnp.float32) * scale
        vq_win = (v >> 16).astype(jnp.float32) * scale
    elif packed:
        # int16-packed int8 I/Q pair (8-bit recordings): low byte = I,
        # high byte = Q.  Widen to i32 first — Mosaic's 16-bit shift
        # support is narrower than its 32-bit support.
        v = buf_r[slot].astype(jnp.int32)
        vi_win = ((v << 24) >> 24).astype(jnp.float32) * scale
        vq_win = (v >> 8).astype(jnp.float32) * scale
    elif dequant:
        vi_win = buf_r[slot].astype(jnp.float32) * scale
        vq_win = buf_i[slot].astype(jnp.float32) * scale
    rows = t_blk + extra  # look-ahead frames for the cm phase diff
    ur = jnp.zeros((rows, m), jnp.float32)
    ui = jnp.zeros((rows, m), jnp.float32)
    for pp in range(p):
        tap = taps_ref[pp : pp + 1, :]  # (1, m): keep 2-D for Mosaic
        sl = slice(p - 1 - pp, p - 1 - pp + rows)
        if dequant:
            ur = ur + tap * vi_win[sl]
            ui = ui + tap * vq_win[sl]
        else:
            ur = ur + tap * buf_r[slot, sl, :]
            ui = ui + tap * buf_i[slot, sl, :]

    wr = wr_ref[...]
    wi = wi_ref[...]
    yr = _dot_dft(ur, wr) - _dot_dft(ui, wi)
    yi = _dot_dft(ur, wi) + _dot_dft(ui, wr)

    if cm2 and transpose_first:
        # v3 route: transpose the complex PLANES (two MXU identity flips)
        # instead of the three derived streams, then run the elementwise
        # stream math channel-major on the m_out real rows only — at M=64
        # that is half the sqrt/atan2/compare work of the 128-lane-padded
        # time-major slab, for ~3% more FIR/DFT rows (the 128-row
        # look-ahead).  Identical op order per element -> bit-identical
        # streams to the transpose-last form.
        eye = eye_ref[...]
        n_ext = t_blk + extra

        def flip(blk_tm):  # (n_ext, m_pad) -> (m_pad, n_ext)
            tiles = [
                _flip_tile(blk_tm[k * 128 : (k + 1) * 128, :], eye)
                for k in range(n_ext // 128)
            ]
            return jnp.concatenate(tiles, axis=1)

        yr_cm = flip(yr)[:m_out]
        yi_cm = flip(yi)[:m_out]
        mag_f = jnp.sqrt(yr_cm * yr_cm + yi_cm * yi_cm)
        ph_cm = _atan2(yi_cm, yr_cm) * jnp.float32(180.0 / np.pi)
        sat_f = jnp.where(
            (jnp.abs(yr_cm) >= sat_level) | (jnp.abs(yi_cm) >= sat_level),
            jnp.float32(1.0), jnp.float32(0.0),
        )
        # Wrapped phase diff along lanes (the cyclic roll's wrap-around
        # column falls in the discarded look-ahead tail).
        d = pltpu.roll(ph_cm, n_ext - 1, axis=1) - ph_cm
        d = jnp.where(d < -180.0, d + 360.0, d)
        d = jnp.where(d > 180.0, d - 360.0, d)
        lane = jax.lax.broadcasted_iota(jnp.int32, (m_out, t_blk), 1)
        pos = lane + i * t_blk
        d = jnp.where(pos < (t_len - 1), d[:, :t_blk], 0.0)
        live_col = (pos < t_len).astype(jnp.float32)
        mag_live = mag_f[:, :t_blk] * live_col
        sat_live = sat_f[:, :t_blk] * live_col

        mag_cm_ref[...] = mag_live
        dph_cm_ref[...] = d

        @pl.when(i == 0)
        def _():
            sat_carry[...] = jnp.zeros_like(sat_carry)

        sc = sat_live
        s = 1
        while s < t_blk:
            sc = sc + jnp.where(lane >= s, pltpu.roll(sc, s, axis=1), 0.0)
            s <<= 1
        sc = sc + sat_carry[:, 0:1]
        satcs_cm_ref[...] = sc
        sat_carry[:, 0:1] = sc[:, t_blk - 1 : t_blk]
        return

    mag = jnp.sqrt(yr * yr + yi * yi)
    ph = _atan2(yi, yr) * jnp.float32(180.0 / np.pi)
    sat = jnp.where(
        (jnp.abs(yr) >= sat_level) | (jnp.abs(yi) >= sat_level),
        jnp.float32(1.0), jnp.float32(0.0),
    )
    if not channel_major:
        mag_ref[...] = mag
        ph_ref[...] = ph
        sat_ref[...] = sat
        return

    if not cm2:
        mag_ref[...] = mag[:t_blk]
    # Wrapped phase diff (same op order as the XLA path -> bit-identical),
    # zeroed at/past the reference's trailing zero row t_len - 1.
    d = ph[1 : 1 + t_blk, :] - ph[0:t_blk, :]
    d = jnp.where(d < -180.0, d + 360.0, d)
    d = jnp.where(d > 180.0, d - 360.0, d)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    live = (t_iota + i * t_blk) < (t_len - 1)
    d = jnp.where(live, d, 0.0)
    # Frames at/past t_len see real trailing samples through their FIR
    # windows; zero them so the cm pad columns keep the transpose-kernel
    # contract (columns past t_len are zero).
    live_col = ((t_iota + i * t_blk) < t_len).astype(jnp.float32)
    mag_live = mag[:t_blk] * live_col
    sat_live = sat[:t_blk] * live_col

    eye = eye_ref[...]

    def flip_val(blk_tm):
        # (t_blk, 128) -> (128, t_blk): per-128-row-tile MXU transpose
        # (f32 identity matmuls at HIGHEST precision are exact).
        tiles = [
            _TDOT(blk_tm[k * 128 : (k + 1) * 128, :], eye)
            for k in range(t_blk // 128)
        ]
        return jnp.concatenate(tiles, axis=1)

    if not cm2:
        mag_cm_ref[...] = flip_val(mag_live)
        dph_cm_ref[...] = flip_val(d)
        sat_cm_ref[...] = flip_val(sat_live)
        return

    # Slim outputs: only the first m_out (8-aligned real-channel) rows are
    # written — for M=64 that halves the stream HBM traffic vs emitting
    # the full 128 lane-pad rows.
    mag_cm_ref[...] = flip_val(mag_live)[:m_out]
    dph_cm_ref[...] = flip_val(d)[:m_out]

    # Inclusive per-channel saturation cumsum along time, carried across
    # the (sequential) grid: counts < 2^24 stay f32-exact.
    @pl.when(i == 0)
    def _():
        sat_carry[...] = jnp.zeros_like(sat_carry)

    sc = flip_val(sat_live)[:m_out]
    lane = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    s = 1
    while s < t_blk:
        sc = sc + jnp.where(lane >= s, pltpu.roll(sc, s, axis=1), 0.0)
        s <<= 1
    sc = sc + sat_carry[:, 0:1]
    satcs_cm_ref[...] = sc
    sat_carry[:, 0:1] = sc[:, t_blk - 1 : t_blk]


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "scale", "sat_level", "interpret", "packed"),
)
def _pallas_fir_dft_streams(
    xr, xi, taps, wr, wi, *,
    block_frames: int, scale: float, sat_level: float, interpret: bool = False,
    packed: bool = False,
):
    p, m = taps.shape
    win = _win_rows(block_frames, p)
    n_frames = xr.shape[0] - (win - block_frames)
    assert n_frames % block_frames == 0
    n_blocks = n_frames // block_frames

    kernel = functools.partial(
        _streams_kernel, block_frames=block_frames, taps_per_band=p,
        scale=scale, sat_level=sat_level, packed=packed,
    )
    n_out = wr.shape[1]  # may be a 128-padded band slice (channel sharding)
    out_block = pl.BlockSpec((block_frames, n_out), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block, out_block, out_block],
        out_shape=[
            jax.ShapeDtypeStruct((n_frames, n_out), jnp.float32),
            jax.ShapeDtypeStruct((n_frames, n_out), jnp.float32),
            jax.ShapeDtypeStruct((n_frames, n_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, m), xr.dtype),
            pltpu.VMEM((2, win, m), xi.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xr, xi, taps, wr, wi)


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "scale", "sat_level", "interpret",
                     "packed", "t_len"),
)
def _pallas_fir_dft_streams_cm(
    xr, xi, taps, wr, wi, *,
    block_frames: int, scale: float, sat_level: float, t_len: int,
    interpret: bool = False, packed: bool = False,
):
    """Channel-major variant: returns (mag_tm, mag_cm, dph_cm, sat_cm) with
    ``mag_tm`` shaped (n_frames, M) and the cm streams (M, n_frames) —
    ``n_frames`` here is the padded block grid; callers slice/pass t_len."""
    p, m = taps.shape
    win = _win_rows(block_frames + 8, p)
    n_frames = xr.shape[0] - (win - block_frames)
    assert n_frames % block_frames == 0
    n_blocks = n_frames // block_frames

    kernel = functools.partial(
        _streams_kernel, block_frames=block_frames, taps_per_band=p,
        scale=scale, sat_level=sat_level, packed=packed,
        channel_major=True, t_len=t_len,
    )
    out_tm = pl.BlockSpec((block_frames, m), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_cm = pl.BlockSpec((m, block_frames), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # identity
        ],
        out_specs=[out_tm, out_cm, out_cm, out_cm],
        out_shape=[
            jax.ShapeDtypeStruct((n_frames, m), jnp.float32),
            jax.ShapeDtypeStruct((m, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((m, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((m, n_frames), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, m), xr.dtype),
            pltpu.VMEM((2, win, m), xi.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi, taps, wr, wi,
      jnp.asarray(np.eye(128, dtype=np.float32)))


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "scale", "sat_level", "interpret",
                     "packed", "t_len", "m_out", "transpose_first"),
)
def _pallas_fir_dft_streams_cm2(
    xr, xi, taps, wr, wi, *,
    block_frames: int, scale: float, sat_level: float, t_len: int,
    m_out: int, interpret: bool = False, packed: bool = False,
    transpose_first: bool = True,
):
    """v2 channel-major variant: returns ``(mag_cm, dph_cm, satcs_cm)`` as
    SLIM ``(m_out, T_pad)`` arrays (m_out = 8-aligned real channels — for
    M=64 half the HBM of 128-lane-pad rows), NO time-major output (the
    noise floor and latch consume the cm stream directly), and saturation
    as an inclusive per-channel cumsum (the stats stage then needs two
    gathers per pulse instead of a third whole-window DMA per slot)."""
    p, m = taps.shape
    win = _win_rows(block_frames + (128 if transpose_first else 8), p)
    n_frames = xr.shape[0] - (win - block_frames)
    assert n_frames % block_frames == 0
    assert m_out % 8 == 0 and m_out <= m
    n_blocks = n_frames // block_frames

    kernel = functools.partial(
        _streams_kernel, block_frames=block_frames, taps_per_band=p,
        scale=scale, sat_level=sat_level, packed=packed,
        channel_major=True, t_len=t_len, cm2=True, m_out=m_out,
        transpose_first=transpose_first,
    )
    out_cm = pl.BlockSpec((m_out, block_frames), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # identity
        ],
        out_specs=[out_cm, out_cm, out_cm],
        out_shape=[
            jax.ShapeDtypeStruct((m_out, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((m_out, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((m_out, n_frames), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, m), xr.dtype),
            pltpu.VMEM((2, win, m), xi.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((m_out, 128), jnp.float32),  # sat cumsum carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, xi, taps, wr, wi,
      jnp.asarray(np.eye(128, dtype=np.float32)))


def pallas_channelize_streams_packed_cm2(
    xq: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 12,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: Optional[int] = None,
    interpret: bool = False,
    history: Optional[jax.Array] = None,
    w_parts: Optional[Tuple[jax.Array, jax.Array]] = None,
    transpose_first: Optional[bool] = None,
):
    """Packed ingest -> v2 channel-major detection streams.

    Returns ``(mag_cm, dph_cm, satcs_cm)``: the three slim ``(m_out,
    T_pad)`` channel-major streams with saturation as an inclusive time
    cumsum and NO time-major magnitude (the v2 PDW route's whole front
    end — ``dsp/pdw.py:_extract_channelized_cm2``).  ``xq`` packs one
    (I, Q) pair per element as in
    :func:`pallas_channelize_streams_packed`; ``history`` is the previous
    block/shard's (P-1, M) packed FIR tail; ``w_parts`` a (possibly
    traced) column slice of the shift-folded DFT matrix for band-sharded
    emission (each band bit-identical to the full-matrix kernel)."""
    p, m = taps_rev.shape
    n_frames = xq.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1))
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)
    if block_frames is None:
        block_frames = _default_cm2_block(n_frames, m_pad)
    # The heuristic compares the EMITTED rows (n_bands — a band-sharded
    # shard emits only its slice) against the lane pad, not the full
    # channel count.
    n_bands = m if w_parts is None else w_parts[0].shape[1]
    if transpose_first is None:
        transpose_first = CM2_TRANSPOSE_FIRST and _tf_wins(n_bands, m_pad)

    fr = xq[..., : n_frames * m].reshape(n_frames, m)
    n_pad = (-n_frames) % block_frames
    extra = 128 if transpose_first else 8
    tail = n_pad + (_win_rows(block_frames + extra, p)
                    - (block_frames + p - 1))
    if history is not None:
        fr = jnp.concatenate([history.reshape(p - 1, m).astype(fr.dtype), fr])
        fr = jnp.pad(fr, ((0, tail), (0, m_pad - m)))
    else:
        fr = jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    if w_parts is not None:
        taps_p, wr_p, wi_p = _pad_weight_slice(taps_rev, *w_parts, m_pad)
    else:
        from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

        w = dft_matrix(m, shifted=shift)
        taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    return _pallas_fir_dft_streams_cm2(
        fr, fr, taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        t_len=n_frames, m_out=((n_bands + 7) // 8) * 8, interpret=interpret,
        packed=True, transpose_first=transpose_first,
    )


def pallas_channelize_streams_cm2(
    xr: jax.Array,
    xi: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 0,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: Optional[int] = None,
    interpret: bool = False,
    history: Optional[Tuple[jax.Array, jax.Array]] = None,
    w_parts: Optional[Tuple[jax.Array, jax.Array]] = None,
    transpose_first: Optional[bool] = None,
):
    """Planes-ingest variant of
    :func:`pallas_channelize_streams_packed_cm2` (``history`` is the
    previous shard's ``(hist_r, hist_i)`` (P-1, M) frame pair)."""
    p, m = taps_rev.shape
    n_frames = xr.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1)) if bit_width else 1.0
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)
    if block_frames is None:
        block_frames = _default_cm2_block(n_frames, m_pad)
    n_bands = m if w_parts is None else w_parts[0].shape[1]
    if transpose_first is None:
        transpose_first = CM2_TRANSPOSE_FIRST and _tf_wins(n_bands, m_pad)

    extra = 128 if transpose_first else 8

    def prep(v, hist=None):
        fr = v[..., : n_frames * m].reshape(n_frames, m)
        n_pad = (-n_frames) % block_frames
        tail = n_pad + (_win_rows(block_frames + extra, p)
                        - (block_frames + p - 1))
        if hist is not None:
            fr = jnp.concatenate([hist.reshape(p - 1, m).astype(fr.dtype), fr])
            return jnp.pad(fr, ((0, tail), (0, m_pad - m)))
        return jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    if w_parts is not None:
        taps_p, wr_p, wi_p = _pad_weight_slice(taps_rev, *w_parts, m_pad)
    else:
        from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

        w = dft_matrix(m, shifted=shift)
        taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    hr, hi = history if history is not None else (None, None)
    return _pallas_fir_dft_streams_cm2(
        prep(xr, hr), prep(xi, hi), taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        t_len=n_frames, m_out=((n_bands + 7) // 8) * 8, interpret=interpret,
        transpose_first=transpose_first,
    )


def pallas_channelize_streams_cm(
    xr: jax.Array,
    xi: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 0,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: int = 1024,
    interpret: bool = False,
):
    """Planes-ingest variant of :func:`pallas_channelize_streams_packed_cm`:
    f32 (or int16, with ``bit_width``) sample planes in, ``(mag, mag_cm,
    dph_cm, sat_cm)`` out."""
    p, m = taps_rev.shape
    n_frames = xr.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1)) if bit_width else 1.0
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)

    def prep(v):
        fr = v[..., : n_frames * m].reshape(n_frames, m)
        n_pad = (-n_frames) % block_frames
        tail = n_pad + (_win_rows(block_frames + 8, p) - (block_frames + p - 1))
        return jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

    w = dft_matrix(m, shifted=shift)
    taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    mag, mag_cm, dph_cm, sat_cm = _pallas_fir_dft_streams_cm(
        prep(xr), prep(xi), taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        t_len=n_frames, interpret=interpret,
    )
    return mag[:n_frames, :m], mag_cm, dph_cm, sat_cm


def pallas_channelize_streams_packed_cm(
    xq: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 12,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: int = 1024,
    interpret: bool = False,
    history: Optional[jax.Array] = None,
):
    """Packed ingest + channel-major streams in one kernel pass.

    Like :func:`pallas_channelize_streams_packed` but returns
    ``(mag, mag_cm, dph_cm, sat_cm)``: time-major magnitude (n_frames, M)
    for the latch/noise-floor stages plus the three channel-major
    ``(128k, T_pad)`` detection streams the pulse-stats stage consumes
    (``transpose_kernel.py`` semantics: wrapped phase diff with a zero row
    at ``t_len - 1``, columns past ``t_len`` zero).  Replaces the separate
    transpose kernel pass on the headline path.

    ``history``: optional ``(P-1, M)`` packed frames of FIR state entering
    this block (the previous streaming block's tail, same packed dtype as
    ``xq``); default zeros (the MATLAB System-object initial state).
    """
    p, m = taps_rev.shape
    n_frames = xq.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1))
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)

    fr = xq[..., : n_frames * m].reshape(n_frames, m)
    n_pad = (-n_frames) % block_frames
    tail = n_pad + (_win_rows(block_frames + 8, p) - (block_frames + p - 1))
    if history is not None:
        fr = jnp.concatenate([history.reshape(p - 1, m).astype(fr.dtype), fr])
        fr = jnp.pad(fr, ((0, tail), (0, m_pad - m)))
    else:
        fr = jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

    w = dft_matrix(m, shifted=shift)
    taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    mag, mag_cm, dph_cm, sat_cm = _pallas_fir_dft_streams_cm(
        fr, fr, taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        t_len=n_frames, interpret=interpret, packed=True,
    )
    return mag[:n_frames, :m], mag_cm, dph_cm, sat_cm


def pallas_channelize_streams(
    xr: jax.Array,
    xi: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 0,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: int = 1024,
    interpret: bool = False,
    history: Optional[Tuple[jax.Array, jax.Array]] = None,
    w_parts: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """Capture planes -> (mag, phase_deg, sat) detection streams, fused.

    ``xr, xi``: 1-D planes, either int16 raw payloads (set ``bit_width`` for
    in-kernel dequant by ``2^-(bw-1)``) or already-normalized float32
    (``bit_width=0``).  Returns three ``(N // M, M)`` float32 arrays ready
    for ``dsp.pdw.extract_pdws_channelized_streams`` (``sat`` is a 0/1
    mask).

    ``history``: optional ``(hist_r, hist_i)`` pair of ``(P-1, M)`` frames
    of FIR state entering this capture block (the previous time shard's
    tail, same dtype as the planes) — overlap-save for sharded/streamed
    runs.  Default zeros = the MATLAB System-object zero initial state.

    ``w_parts``: optional ``(wr, wi)`` real/imag parts of a **column slice**
    of the shift-folded DFT matrix, shape (M, n_bands) — the kernel then
    emits streams for those bands only (channel-sharded fused pipeline;
    each band bit-identical to the full-matrix kernel).  May be traced
    (e.g. a ``dynamic_slice`` by mesh position).
    """
    p, m = taps_rev.shape
    n_frames = xr.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1)) if bit_width else 1.0
    # Pallas TPU kernels only interpret on CPU backends.
    interpret = interpret or jax.devices()[0].platform == "cpu"
    # Mosaic requires 128-aligned lane slices: zero-pad the channel axis.
    m_pad = _lane_pad(m)

    def prep(v, hist=None):
        fr = v[..., : n_frames * m].reshape(n_frames, m)
        n_pad = (-n_frames) % block_frames
        tail = n_pad + (_win_rows(block_frames, p) - (block_frames + p - 1))
        if hist is not None:
            fr = jnp.concatenate([hist.reshape(p - 1, m).astype(fr.dtype), fr])
            return jnp.pad(fr, ((0, tail), (0, m_pad - m)))
        return jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    if w_parts is not None:
        n_bands = w_parts[0].shape[1]
        taps_p, wr_p, wi_p = _pad_weight_slice(taps_rev, *w_parts, m_pad)
    else:
        from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

        n_bands = m
        w = dft_matrix(m, shifted=shift)
        taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    hr, hi = history if history is not None else (None, None)
    mag, ph, sat = _pallas_fir_dft_streams(
        prep(xr, hr), prep(xi, hi), taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        interpret=interpret,
    )
    return mag[:n_frames, :n_bands], ph[:n_frames, :n_bands], sat[:n_frames, :n_bands]


def pallas_channelize_streams_packed(
    xq: jax.Array,
    taps_rev: np.ndarray,
    bit_width: int = 12,
    sat_level: float = 0.9999,
    shift: bool = True,
    block_frames: int = 1024,
    interpret: bool = False,
    history: Optional[jax.Array] = None,
    w_parts: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """Packed-payload variant of :func:`pallas_channelize_streams`.

    ``xq``: 1-D plane where each element packs one interleaved (I, Q)
    pair: int32 for int16 payloads (``samples.view(np.int32)`` of an
    ``(N, 2)`` int16 recording, 12/16-bit) or int16 for int8 payloads
    (``samples.view(np.int16)`` of an ``(N, 2)`` int8 recording, 8-bit,
    ``blade_record_iq_08bit.cpp`` SC8_Q7 wire format).  The on-disk bytes
    go to the device untouched and the kernel does the sign-extension and
    Q-format dequant — half (int16) or a quarter (int8) of the
    host->device traffic of the f32-planes path.

    ``history``: optional ``(P-1, M)`` packed frames of FIR state entering
    this block (the previous time shard's tail, same packed dtype as
    ``xq``); default zeros.  ``w_parts`` as in
    :func:`pallas_channelize_streams` (band-slice emission).
    """
    p, m = taps_rev.shape
    n_frames = xq.shape[-1] // m
    scale = float(2.0 ** -(bit_width - 1))
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)

    fr = xq[..., : n_frames * m].reshape(n_frames, m)
    n_pad = (-n_frames) % block_frames
    tail = n_pad + (_win_rows(block_frames, p) - (block_frames + p - 1))
    if history is not None:
        fr = jnp.concatenate([history.reshape(p - 1, m).astype(fr.dtype), fr])
        fr = jnp.pad(fr, ((0, tail), (0, m_pad - m)))
    else:
        fr = jnp.pad(fr, ((p - 1, tail), (0, m_pad - m)))

    if w_parts is not None:
        n_bands = w_parts[0].shape[1]
        taps_p, wr_p, wi_p = _pad_weight_slice(taps_rev, *w_parts, m_pad)
    else:
        from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

        n_bands = m
        w = dft_matrix(m, shifted=shift)
        taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    mag, ph, sat = _pallas_fir_dft_streams(
        fr, fr, taps_p, wr_p, wi_p,
        block_frames=block_frames, scale=scale, sat_level=float(sat_level),
        interpret=interpret, packed=True,
    )
    return mag[:n_frames, :n_bands], ph[:n_frames, :n_bands], sat[:n_frames, :n_bands]


def pallas_channelize(
    x: jax.Array,
    taps_rev: np.ndarray,
    shift: bool = True,
    block_frames: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Channelize a 1-D complex capture with the fused kernel.

    Drop-in equal to ``channelize(x, chan, method="dft")`` for
    ``taps_rev = chan.taps_rev``.  Returns ``(N // M, M)`` complex64.
    """
    from sdr_channelizer_tpu.dsp.channelizer import dft_matrix

    p, m = taps_rev.shape
    n_frames = x.shape[-1] // m
    frames = x[..., : n_frames * m].reshape(n_frames, m)
    interpret = interpret or jax.devices()[0].platform == "cpu"
    m_pad = _lane_pad(m)

    n_pad = (-n_frames) % block_frames
    n_pad += _win_rows(block_frames, p) - (block_frames + p - 1)
    xr = jnp.real(frames).astype(jnp.float32)
    xi = jnp.imag(frames).astype(jnp.float32)
    pad = ((p - 1, n_pad), (0, m_pad - m))
    xr = jnp.pad(xr, pad)
    xi = jnp.pad(xi, pad)

    w = dft_matrix(m, shifted=shift)
    taps_p, wr_p, wi_p = _pad_weights(taps_rev, w, m_pad)
    yr, yi = _pallas_fir_dft(
        xr, xi, taps_p, wr_p, wi_p,
        block_frames=block_frames,
        interpret=interpret,
    )
    y = jax.lax.complex(yr, yi)
    return y[:n_frames, :m]
