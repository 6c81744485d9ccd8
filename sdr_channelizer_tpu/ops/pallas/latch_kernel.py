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
of the XLA formulation; the caller finds each rank's edge position with a
binary search (``jnp.searchsorted``), which is cheap.

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


def _latch_kernel(mag_ref, lead_ref, trail_ref, entry_ref, cl_ref, ct_ref,
                  carry, *, t_blk: int, log_steps: int):
    """Grid (T // t_blk,), sequential.  carry rows: 0 = entry state,
    1 = lead-count base, 2 = trail-count base (per channel)."""
    i = pl.program_id(0)
    m = mag_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        carry[0:1, :] = entry_ref[0:1, :]

    mag = mag_ref[...]
    # Element transfer functions (f(0), f(1)) as f32 0/1: set / reset / hold
    # / toggle (dsp/pdw.py:hysteresis_fns).
    a = (mag >= lead_ref[0:1, :]).astype(jnp.float32)
    b = 1.0 - (mag <= trail_ref[0:1, :]).astype(jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (t_blk, m), 0)
    # Inclusive prefix composition: compose(earlier, later) has
    # a' = a_l + a_e*(b_l - a_l), b' = a_l + b_e*(b_l - a_l).
    for k in range(log_steps):
        s = 1 << k
        keep = (row >= s).astype(jnp.float32)
        sa = keep * pltpu.roll(a, s, axis=0)            # identity a = 0
        sb = 1.0 - keep * (1.0 - pltpu.roll(b, s, axis=0))  # identity b = 1
        d = b - a
        a, b = a + sa * d, a + sb * d

    entry = carry[0:1, :]
    state = a + entry * (b - a)
    prev = pltpu.roll(state, 1, axis=0)
    is0 = (row < 1).astype(jnp.float32)
    prev = is0 * entry + (1.0 - is0) * prev
    lead = state * (1.0 - prev)
    trail = prev * (1.0 - state)

    # In-block inclusive cumsums (same ladder, additive).
    for k in range(log_steps):
        s = 1 << k
        keep = (row >= s).astype(jnp.float32)
        lead = lead + keep * pltpu.roll(lead, s, axis=0)
        trail = trail + keep * pltpu.roll(trail, s, axis=0)

    cl_ref[...] = carry[1:2, :] + lead
    ct_ref[...] = carry[2:3, :] + trail
    carry[0:1, :] = state[t_blk - 1 : t_blk, :]
    carry[1:2, :] = carry[1:2, :] + lead[t_blk - 1 : t_blk, :]
    carry[2:3, :] = carry[2:3, :] + trail[t_blk - 1 : t_blk, :]


@functools.partial(jax.jit, static_argnames=("t_blk", "interpret"))
def _latch_call(mag, lead_row, trail_row, entry_row, *, t_blk: int,
                interpret: bool):
    t_len, m = mag.shape
    assert t_len % t_blk == 0
    log_steps = int(np.log2(t_blk))
    assert (1 << log_steps) == t_blk
    kernel = functools.partial(_latch_kernel, t_blk=t_blk, log_steps=log_steps)
    blk = pl.BlockSpec((t_blk, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((8, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t_len // t_blk,),
        in_specs=[blk, row, row, row],
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, m), jnp.float32),
            jax.ShapeDtypeStruct((t_len, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, m), jnp.float32)],
        interpret=interpret,
    )(mag, lead_row, trail_row, entry_row)


def pallas_latch_cumsums(
    mag: jax.Array,
    lead_thresh: jax.Array,
    trail_thresh: jax.Array,
    entry_active=None,
    t_blk: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Inclusive cumulative lead/trail edge counts of the hysteresis latch.

    ``mag``: (T, M) float32 time-major detection magnitudes.
    ``lead_thresh`` / ``trail_thresh``: (M,) per-channel absolute thresholds
    (``noise_floor * 10^(dB/10)``).  ``entry_active``: optional (M,) bool
    latch state entering the block (default inactive — the whole-capture
    case).  Returns two (T, M) float32 arrays equal to
    ``cumsum(lead_edge, axis=0)`` / ``cumsum(trail_edge, axis=0)`` of the
    XLA formulation (T must stay below 2^24 for the counts to be f32-exact).
    """
    interpret = interpret or jax.devices()[0].platform == "cpu"
    t_len, m = mag.shape
    pad = (-t_len) % t_blk
    if pad:
        # -inf magnitude: below every trail threshold -> latch resets, no
        # lead edges; one trailing edge may fire in the pad if a pulse was
        # open, which the caller never reads (rows beyond t_len).
        mag = jnp.pad(mag, ((0, pad), (0, 0)), constant_values=-np.inf)
    lead_row = jnp.broadcast_to(lead_thresh[None, :], (8, m))
    trail_row = jnp.broadcast_to(trail_thresh[None, :], (8, m))
    if entry_active is None:
        entry_row = jnp.zeros((8, m), jnp.float32)
    else:
        entry_row = jnp.broadcast_to(
            entry_active.astype(jnp.float32)[None, :], (8, m)
        )
    cl, ct = _latch_call(mag, lead_row, trail_row, entry_row, t_blk=t_blk,
                         interpret=interpret)
    return cl[:t_len], ct[:t_len]
