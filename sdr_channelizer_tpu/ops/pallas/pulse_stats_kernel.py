"""Per-pulse statistics Pallas kernel: masked medians without HBM churn.

The PDW emitter needs, per detected pulse, the median magnitude, the median
wrapped phase difference, and a saturation flag over the pulse extent
(``create_pdws.m:70,86,100``).  The XLA formulation gathers a fixed window
per pulse and runs a 32-step radix selection over it — every step streams
the gathered windows through HBM, which dominates the whole pipeline on
TPU.  This kernel keeps the selection on-chip.

Mosaic-friendly design (every construct below survived real-TPU lowering;
the "obvious" versions did not):

* streams are channel-major ``(M, T/128, 128)`` so any pulse window is
  covered by a lane-aligned ``(rows, 128)`` block; the *mask*, not
  extraction, delimits the pulse (absolute sample index rebuilt from iota);
* pulses form one flat **dense slot list** with a per-slot channel id,
  walked by an in-kernel ``fori_loop`` — one iteration = one 128-pulse
  tile, from any mix of channels.  The kernel's cost scales with *occupied
  tiles*: per-tile ``live`` flags (prefetched scalars) reduce an empty
  tile to a scalar load + branch (a gridded one-step-per-tile formulation
  paid ~40 us of block-DMA/sequencing overhead per DEAD tile — the
  dominant cost at ``M * max_pulses`` slot capacity).  Callers compact
  their pulses to the front (``extract_pdws_channelized_streams`` packs
  all channels' pulses together per window tier) so sparse captures pay
  for the pulses they have, with no ordering contract on the slots;
* the tile's windows are DMA'd into a 2-D ``(TILE*rows, 128)`` scratch
  (3-D scratch indexing and scalar->vector ``stack`` both fail to lower);
* per-pulse constants (toa/te) reach vector-land through (1, TILE) VMEM
  blocks (transposed to columns with a diagonal mask) plus a constant 0/1
  ``EXPAND (TILE*rows, TILE)`` matrix that broadcasts a per-pulse column
  to its row group — an MXU matmul instead of unsupported reshapes (all
  integer payloads < 2^24 so f32 matmuls are exact);
* inside the radix loop every per-pulse scalar lives in *row space*
  (a ``(g, 1)`` column with the value replicated across its group) and
  group reductions are log-tree sublane rolls (Hillis-Steele prefix +
  doubling tail broadcast, ``2*ceil(log2(rows))`` rolls) — the earlier
  EXPAND/SEL matmul formulation serialized a VPU<->MXU round-trip per
  radix bit and dominated the kernel's runtime, and naive roll chains
  scale linearly with the window;
* the magnitude and phase-difference median descents share ONE 32-step
  fori_loop (independent chains interleave to fill VPU pipeline stalls);
* the final ``(TILE, 1) -> (1, TILE)`` transpose is ``ones(1,TILE) @
  diag(vals)`` after a one-hot group-head extraction.

Exactness: identical order statistics and mean-of-two-middles as
``ops.medians.masked_median`` — PDWs match the XLA path bit-for-bit.
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
# Pulses per tile-loop step.  128 (round 4): under the no-compaction
# per-channel slot grids most slots in a live tile are dead sentinels, and
# the smaller tile halves the ungated window DMAs per live tile — measured
# -0.18 ms dense / -0.15 ms sparse end-to-end vs 256 on v5e
# (PROBE_r04.json G part; 256 had been chosen in round 2 for compacted
# dense lists where live slots filled whole tiles).  Flat slot lists
# shorter than a tile are padded by the wrappers.
TILE = 128

# Reference batch width for the OPT-IN batched descent kernel
# (``batch_tiles=STATS_BATCH_TILES``): live tiles' windows stack in one
# scratch and ONE descent over (n*TILE*rows, LANES) serves all of them,
# bit-identically (groups never span tiles; dead slots in a ragged final
# batch point at an appended all-sentinel tile).  Built on the round-4
# hypothesis that the per-tile descent was latency-bound; the round-5
# full-graph A/B REFUTED that (+0.45 ms dense at n=8, PROBE_r05 A — the
# descent is throughput-bound on its masked counting passes), so the
# shipped default is the per-tile kernel and this stays as the measured
# reference point for other chip generations.
STATS_BATCH_TILES = 8

_DOT = functools.partial(
    jnp.dot, preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def _keys_from_f32(x):
    """Order-preserving u32 keys (ops.medians._sortable_u32, in-kernel)."""
    u = pltpu.bitcast(x, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _f32_from_keys(u):
    neg = (u >> 31) == 0
    raw = jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))
    return pltpu.bitcast(raw, jnp.float32)


def _group_ops(rows: int, g: int):
    """Row-space group arithmetic over a ``(g, LANES)`` stacked-window
    scratch whose axis 0 is consecutive ``rows``-row groups (one pulse
    each).  Shared by the per-tile and batched kernels — per-group results
    depend only on the group's own rows (rolls are guarded by the
    within-group index), so the batched kernel's larger ``g`` changes
    nothing about any group's arithmetic.  Returns ``(gsum, median_pair)``.
    """
    wcol = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    wcol = wcol - (wcol // rows) * rows  # row index within its group

    def gsum_col(col):
        """(g, 1) -> (g, 1): per-group total, replicated to the group.

        Log-tree: a Hillis-Steele inclusive prefix within the group
        followed by a doubling broadcast of the group-tail value —
        2*ceil(log2(rows)) rolls instead of the 2*(rows-1) of the
        naive chain."""
        out = col
        s = 1
        while s < rows:
            out = out + jnp.where(wcol >= s,
                                  pltpu.roll(out, s, axis=0), 0.0)
            s <<= 1
        s = 1
        while s < rows:
            out = jnp.where(wcol + s <= rows - 1,
                            pltpu.roll(out, g - s, axis=0), out)
            s <<= 1
        return out

    def gmin_col(col, big):
        out = col
        s = 1
        while s < rows:
            out = jnp.minimum(
                out, jnp.where(wcol >= s, pltpu.roll(out, s, axis=0), big)
            )
            s <<= 1
        s = 1
        while s < rows:
            out = jnp.where(wcol + s <= rows - 1,
                            pltpu.roll(out, g - s, axis=0), out)
            s <<= 1
        return out

    def gsum(x_f32):  # (g, LANES) -> (g, 1) group totals
        return gsum_col(jnp.sum(x_f32, axis=1, keepdims=True))

    def select_kth_pair(keys_a, mask_a, k_a, keys_b, mask_b, k_b):
        """k-th smallest masked key per pulse for TWO independent
        selections (magnitude and phase-diff medians) in one fori_loop
        over the 32 bits — the chains have no data dependence on each
        other, so interleaving them fills the VPU pipeline stalls of
        each one's serial count->compare->narrow chain and halves the
        loop-control overhead.  (A fully unrolled version blows the
        Mosaic stack-VMEM budget.)  All per-pulse state (prefix,
        remaining rank) stays in row space so the body is matmul-free;
        live masks are carried as f32 0/1 — Mosaic cannot legalize i1
        vector carries through scf.for."""

        def body(i, carry):
            la, pa, ka, lb, pb, kb = carry
            bit = jnp.uint32(1) << (31 - i)
            za = (keys_a & bit) == 0
            zb = (keys_b & bit) == 0
            ca = gsum(la * za.astype(jnp.float32))
            cb = gsum(lb * zb.astype(jnp.float32))
            ta = ka >= ca  # (g, 1) bool, uniform within a group
            tb = kb >= cb
            ka = jnp.where(ta, ka - ca, ka)
            kb = jnp.where(tb, kb - cb, kb)
            pa = jnp.where(ta, pa | bit, pa)
            pb = jnp.where(tb, pb | bit, pb)
            la = la * (za ^ ta).astype(jnp.float32)
            lb = lb * (zb ^ tb).astype(jnp.float32)
            return la, pa, ka, lb, pb, kb

        z = jnp.zeros((g, 1), jnp.uint32)
        _, pa, _, _, pb, _ = jax.lax.fori_loop(
            0, 32, body,
            (mask_a.astype(jnp.float32), z, k_a,
             mask_b.astype(jnp.float32), z, k_b),
        )
        return pa, pb

    def median_pair(xa, mask_a, xb, mask_b):
        """Masked medians of two fields sharing one radix descent loop.

        ONE radix select finds each k_lo-th order statistic v; the
        k_hi-th (n even) is then either v again (when duplicates of v
        cover rank k_hi) or the smallest masked value strictly above v
        — a single masked min, not a second descent.  Returns two
        (med0, n) row-space column pairs (NaN-free: the group-head
        extraction is a matmul and 0 * NaN = NaN would poison every
        pulse in the tile; the empty-pulse NaN is applied after
        extraction via the n column)."""
        keys_a = _keys_from_f32(xa)
        keys_b = _keys_from_f32(xb)
        na = gsum(mask_a.astype(jnp.float32))
        nb = gsum(mask_b.astype(jnp.float32))
        k_lo = lambda n: jnp.maximum(jnp.floor((n - 1.0) / 2.0), 0.0)
        pa, pb = select_kth_pair(keys_a, mask_a, k_lo(na),
                                 keys_b, mask_b, k_lo(nb))

        def finish(x, keys, mask, n, pref):
            k_hi = jnp.maximum(jnp.floor(n / 2.0), 0.0)
            lo = _f32_from_keys(pref)  # (g, 1)
            cnt_le = gsum((mask & (keys <= pref)).astype(jnp.float32))
            # min over {x : mask, key > v}; finite sentinel — masked
            # roll reduction must never see inf (0 * inf = NaN).
            big = jnp.float32(3.0e38)
            cand = jnp.where(mask & (keys > pref), x, big)
            nxt = gmin_col(jnp.min(cand, axis=1, keepdims=True), big)
            hi = jnp.where(cnt_le > k_hi, lo, nxt)
            med = 0.5 * (lo + hi)
            return jnp.where(n > 0, med, 0.0), n  # (g, 1) x2

        return (finish(xa, keys_a, mask_a, na, pa),
                finish(xb, keys_b, mask_b, nb, pb))

    return gsum, median_pair


def _stats_kernel(live_sm, *refs,
                  n_tiles: int, rows: int, window: int, t_len: int,
                  with_sat: bool = True, gate_slots: bool = False,
                  double_buffer: bool = False):
    """One invocation, ``fori_loop`` over the 128-pulse tiles.

    A tile with no valid slots costs one scalar load + branch — NOT a grid
    step (an earlier gridded formulation paid ~40 us of block-DMA/sequencing
    overhead per dead tile, which dominated at M * max_pulses slot capacity
    with a handful of live tiles).

    Per-slot toa/chan scalars arrive as (8, P) ANY-space arrays and are
    DMA'd ONE LIVE TILE AT A TIME into SMEM scratch (~1 KB per live tile).
    Only the per-tile ``live`` flags ride scalar prefetch: SMEM ingress on
    this part is ~130 MB/s, so prefetching the full M*max_pulses slot
    lists (384 KB+) serialized ~11 ms of S(1) copies in front of the
    kernel whenever the lists were computed in-graph (profiler-traced;
    parameters hid the same cost by overlapping with earlier stages).

    The streams stay separate 128-lane arrays: Mosaic gives
    exactly-128-lane HBM memrefs a flat layout where arbitrary-row DMA
    slices are legal; wider (e.g. lane-fused 384) arrays get a tiled
    layout that rejects non-8-aligned row counts.

    ``with_sat=False`` (the v2 cm route) drops the saturation stream
    entirely — one third fewer window DMAs per slot; the caller flags
    saturated pulses from the channelizer kernel's saturation cumsum with
    two gathers instead."""
    if with_sat:
        (mag_hbm, dph_hbm, sat_hbm, toa_any, chan_any, toa_vm, te_vm,
         expand_vm, head_vm, mag_out, dph_out, sat_out,
         mag_buf, dph_buf, sat_buf, toa_sm, chan_sm, sems) = refs
    else:
        (mag_hbm, dph_hbm, toa_any, chan_any, toa_vm, te_vm,
         expand_vm, head_vm, mag_out, dph_out,
         mag_buf, dph_buf, toa_sm, chan_sm, sems) = refs
        sat_hbm = sat_out = sat_buf = None
    n_rows_total = mag_hbm.shape[1]
    g = TILE * rows  # stacked scratch rows

    # Dead tiles leave zeros (downstream masks by slot validity either way).
    mag_out[...] = jnp.zeros_like(mag_out)
    dph_out[...] = jnp.zeros_like(dph_out)
    if with_sat:
        sat_out[...] = jnp.zeros_like(sat_out)

    # ``double_buffer``: buffers/SMEM/sems carry a leading slot axis of 2;
    # each live tile prefetches the NEXT live tile's windows before its own
    # radix descent, overlapping the window DMAs with compute.
    def buf_at(buf, slot):
        return buf.at[slot] if double_buffer else buf

    def sem_at(k, slot):
        return sems.at[slot, k] if double_buffer else sems.at[k]

    def _issue_tile(j, slot):
        """Stage tile j's slot scalars into SMEM (lane slice is
        TILE-aligned, full 8 sublanes — legal DMA shape), then start its
        window DMAs (scalar toa/chan reads drive the offsets).  Copies are
        UNGATED unless ``gate_slots``: invalid slots read clamped-offset
        rows (their masks are all-false, so the stale data never
        matters)."""
        for any_ref, sm_ref, k in ((toa_any, toa_sm, 3), (chan_any, chan_sm, 4)):
            pltpu.make_async_copy(
                any_ref.at[:, pl.ds(j * TILE, TILE)], buf_at(sm_ref, slot),
                sem_at(k, slot),
            ).start()
        for any_ref, sm_ref, k in ((toa_any, toa_sm, 3), (chan_any, chan_sm, 4)):
            pltpu.make_async_copy(
                any_ref.at[:, pl.ds(j * TILE, TILE)], buf_at(sm_ref, slot),
                sem_at(k, slot),
            ).wait()

        for s in range(TILE):
            if gate_slots:
                pl.when(buf_at(toa_sm, slot)[0, s] < t_len)(
                    lambda s=s: _start_slot(s, slot))
            else:
                _start_slot(s, slot)

    streams = [(mag_hbm, mag_buf, 0), (dph_hbm, dph_buf, 1)]
    if with_sat:
        streams.append((sat_hbm, sat_buf, 2))

    def _slot_copies(s, slot):
        c = buf_at(chan_sm, slot)[0, s]
        toa = buf_at(toa_sm, slot)[0, s]
        r0 = jnp.clip(toa // LANES, 0, n_rows_total - rows)
        return [
            pltpu.make_async_copy(
                hbm.at[c, pl.ds(r0, rows), :],
                buf_at(buf, slot).at[pl.ds(s * rows, rows), :],
                sem_at(k, slot),
            )
            for hbm, buf, k in streams
        ]

    def _start_slot(s, slot):
        for cp in _slot_copies(s, slot):
            cp.start()

    def _wait_slot(s, slot):
        for cp in _slot_copies(s, slot):
            cp.wait()

    def _tile_body(j, slot=0):
        if not double_buffer:
            _issue_tile(j, slot)

        # Per-pulse toa/te as (TILE, 1) f32 columns from the (8, P) VMEM
        # arrays (row replicated 8x — TPU block sublane dims must be
        # multiples of 8; the lane slice is TILE-aligned by construction):
        # broadcast down, keep the diagonal, row-sum (Mosaic has no
        # (1, N) -> (N, 1) reshape/transpose).
        off = pl.multiple_of(j * TILE, TILE)
        diag = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1))
        ones_col = jnp.ones((TILE, 1), jnp.float32)

        def to_col(row_vm):  # (8, P) VMEM ref -> this tile's (TILE, 1)
            b = ones_col * row_vm[0:1, pl.ds(off, TILE)]
            return jnp.sum(jnp.where(diag, b, 0.0), axis=1, keepdims=True)

        toa_col = to_col(toa_vm)
        te_col = to_col(te_vm)

        # Broadcast to row groups with the constant EXPAND matmul.
        expand = expand_vm[...]
        toa_rows = _DOT(expand, toa_col)          # (g, 1) f32, exact ints
        te_rows = _DOT(expand, te_col)
        r0_rows = jnp.clip(jnp.floor(toa_rows / LANES),
                           0.0, float(n_rows_total - rows))

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (g, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (g, LANES), 1)
        within = (row_iota - (row_iota // rows) * rows).astype(jnp.float32)
        idx = (r0_rows + within) * LANES + lane_iota.astype(jnp.float32)

        # Reference window semantics (dsp/pdw.py:_emit_batch).
        plen = jnp.minimum(te_rows - toa_rows + 1.0, float(window))
        pos = idx - toa_rows
        in_any = (pos >= 0.0) & (idx < float(t_len))
        m_mask = in_any & (pos < plen)
        d_mask = in_any & (pos < plen - 1.0)
        s_mask = in_any & (pos >= 1.0) & (pos < plen - 1.0)

        for s in range(TILE):
            if gate_slots:
                pl.when(buf_at(toa_sm, slot)[0, s] < t_len)(
                    lambda s=s: _wait_slot(s, slot))
            else:
                _wait_slot(s, slot)

        # --- row-space group arithmetic (no MXU in the hot loop) ---
        # Every per-pulse scalar lives as a (g, 1) column with the value
        # replicated across its `rows`-row group.  Group reductions are
        # roll-chains over the column (cheap VPU ops on a 1-lane vector)
        # instead of EXPAND/SEL matmuls: the matmul formulation serialized a
        # VPU<->MXU ping-pong per radix bit, which dominated the kernel.
        gsum, median_pair = _group_ops(rows, g)

        head = head_vm[...]  # (TILE, g) one-hot group-head selector

        def to_row(col):  # (g, 1) row-space column -> (1, TILE)
            vals = _DOT(head, col)  # (TILE, 1) group-head extraction
            return _DOT(jnp.ones((1, TILE), jnp.float32),
                        jnp.where(diag, vals, 0.0))

        def med_row(med_n):  # (med0, n) row-space -> (1, TILE) with NaNs
            med0, n = med_n
            return jnp.where(to_row(n) > 0.0, to_row(med0),
                             jnp.float32(np.nan))

        mag_mn, dph_mn = median_pair(buf_at(mag_buf, slot)[...], m_mask,
                                     buf_at(dph_buf, slot)[...], d_mask)

        # Mosaic dynamic stores need 8-aligned sublane offsets: outputs are
        # (8, P) with every row identical; the wrapper takes row 0.
        eight = jnp.ones((8, 1), jnp.float32)
        mag_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * med_row(mag_mn)
        dph_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * med_row(dph_mn)
        if with_sat:
            sat_col = gsum(jnp.where(s_mask, buf_at(sat_buf, slot)[...], 0.0))
            sat_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * to_row(
                jnp.where(sat_col > 0.5, 1.0, 0.0)
            )

    if double_buffer:
        def _loop(j, carry):
            @pl.when(live_sm[j] > 0)
            def _():
                slot = jax.lax.rem(j, 2)
                # self-fetch unless the previous (live) tile prefetched us
                fetched = jnp.logical_and(
                    j > 0, live_sm[jnp.maximum(j - 1, 0)] > 0)

                @pl.when(jnp.logical_not(fetched))
                def _():
                    _issue_tile(j, slot)

                # prefetch the next live tile into the other buffer so its
                # window DMAs overlap this tile's radix descent
                @pl.when(jnp.logical_and(
                    j + 1 < n_tiles,
                    live_sm[jnp.minimum(j + 1, n_tiles - 1)] > 0))
                def _():
                    _issue_tile(j + 1, 1 - slot)

                _tile_body(j, slot)
            return carry
    else:
        def _loop(j, carry):
            @pl.when(live_sm[j] > 0)
            def _():
                _tile_body(j)
            return carry

    jax.lax.fori_loop(0, n_tiles, _loop, jnp.int32(0))


def _stats_kernel_batched(batch_live_sm, tile_ids_sm, *refs,
                          n_batches: int, nt: int, rows: int, window: int,
                          t_len: int, with_sat: bool = True):
    """Batched variant of :func:`_stats_kernel`: one ``fori_loop`` step
    processes ``nt`` LIVE tiles at once — their windows stack into one
    ``(nt*TILE*rows, LANES)`` scratch and ONE radix descent serves all of
    them (see ``STATS_BATCH_TILES``).

    ``tile_ids_sm`` is the prefetched compacted list of live tile indices,
    padded with the index of an appended all-sentinel tile (every slot
    ``toa = t_len``), so ragged final batches run uniform code: dead
    segments gather clamped rows under all-false masks and store unused
    zeros/NaNs at the sentinel tile's output slice (cropped by the
    wrapper).  ``batch_live_sm[b]`` gates whole batches past the live
    count.  Group arithmetic is :func:`_group_ops` — identical per-group
    FLOPs to the per-tile kernel, so outputs are bit-identical."""
    if with_sat:
        (mag_hbm, dph_hbm, sat_hbm, toa_any, chan_any, toa_vm, te_vm,
         expand_vm, head_vm, mag_out, dph_out, sat_out,
         mag_buf, dph_buf, sat_buf, toa_sm, chan_sm, sems) = refs
    else:
        (mag_hbm, dph_hbm, toa_any, chan_any, toa_vm, te_vm,
         expand_vm, head_vm, mag_out, dph_out,
         mag_buf, dph_buf, toa_sm, chan_sm, sems) = refs
        sat_hbm = sat_out = sat_buf = None
    n_rows_total = mag_hbm.shape[1]
    g = TILE * rows
    g_all = nt * g

    mag_out[...] = jnp.zeros_like(mag_out)
    dph_out[...] = jnp.zeros_like(dph_out)
    if with_sat:
        sat_out[...] = jnp.zeros_like(sat_out)

    streams = [(mag_hbm, mag_buf, 0), (dph_hbm, dph_buf, 1)]
    if with_sat:
        streams.append((sat_hbm, sat_buf, 2))

    def _stage_copies(tid, j2):
        off = pl.multiple_of(tid * TILE, TILE)
        return [
            pltpu.make_async_copy(
                any_ref.at[:, pl.ds(off, TILE)], sm_ref.at[j2], sems.at[k]
            )
            for any_ref, sm_ref, k in ((toa_any, toa_sm, 3),
                                       (chan_any, chan_sm, 4))
        ]

    def _slot_copies(j2, s):
        c = chan_sm[j2, 0, s]
        toa = toa_sm[j2, 0, s]
        r0 = jnp.clip(toa // LANES, 0, n_rows_total - rows)
        return [
            pltpu.make_async_copy(
                hbm.at[c, pl.ds(r0, rows), :],
                buf.at[pl.ds((j2 * TILE + s) * rows, rows), :],
                sems.at[k],
            )
            for hbm, buf, k in streams
        ]

    def _batch_body(b):
        # Stage every segment's slot scalars, then issue all window DMAs.
        for j2 in range(nt):
            tid = tile_ids_sm[b * nt + j2]
            for cp in _stage_copies(tid, j2):
                cp.start()
            for cp in _stage_copies(tid, j2):
                cp.wait()
            for s in range(TILE):
                for cp in _slot_copies(j2, s):
                    cp.start()

        # Per-pulse toa/te columns for all nt segments (see _tile_body for
        # the diagonal-mask + EXPAND-matmul construction).
        diag = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1))
        ones_col = jnp.ones((TILE, 1), jnp.float32)
        expand = expand_vm[...]

        def to_col(row_vm, off):
            bb = ones_col * row_vm[0:1, pl.ds(off, TILE)]
            return jnp.sum(jnp.where(diag, bb, 0.0), axis=1, keepdims=True)

        toa_segs, te_segs = [], []
        for j2 in range(nt):
            tid = tile_ids_sm[b * nt + j2]
            off = pl.multiple_of(tid * TILE, TILE)
            toa_segs.append(_DOT(expand, to_col(toa_vm, off)))
            te_segs.append(_DOT(expand, to_col(te_vm, off)))
        toa_rows = jnp.concatenate(toa_segs, axis=0)  # (g_all, 1)
        te_rows = jnp.concatenate(te_segs, axis=0)
        r0_rows = jnp.clip(jnp.floor(toa_rows / LANES),
                           0.0, float(n_rows_total - rows))

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (g_all, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (g_all, LANES), 1)
        within = (row_iota - (row_iota // rows) * rows).astype(jnp.float32)
        idx = (r0_rows + within) * LANES + lane_iota.astype(jnp.float32)

        plen = jnp.minimum(te_rows - toa_rows + 1.0, float(window))
        pos = idx - toa_rows
        in_any = (pos >= 0.0) & (idx < float(t_len))
        m_mask = in_any & (pos < plen)
        d_mask = in_any & (pos < plen - 1.0)
        s_mask = in_any & (pos >= 1.0) & (pos < plen - 1.0)

        for j2 in range(nt):
            for s in range(TILE):
                for cp in _slot_copies(j2, s):
                    cp.wait()

        gsum, median_pair = _group_ops(rows, g_all)
        head = head_vm[...]  # (TILE, g) one-hot group-head selector

        def to_row(col_seg):  # one segment's (g, 1) column -> (1, TILE)
            vals = _DOT(head, col_seg)
            return _DOT(jnp.ones((1, TILE), jnp.float32),
                        jnp.where(diag, vals, 0.0))

        def med_row(med_n, j2):
            med0, n = med_n
            seg = slice(j2 * g, (j2 + 1) * g)
            return jnp.where(to_row(n[seg]) > 0.0, to_row(med0[seg]),
                             jnp.float32(np.nan))

        mag_mn, dph_mn = median_pair(mag_buf[...], m_mask,
                                     dph_buf[...], d_mask)
        if with_sat:
            sat_col = gsum(jnp.where(s_mask, sat_buf[...], 0.0))

        eight = jnp.ones((8, 1), jnp.float32)
        for j2 in range(nt):
            tid = tile_ids_sm[b * nt + j2]
            off = pl.multiple_of(tid * TILE, TILE)
            mag_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * med_row(mag_mn, j2)
            dph_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * med_row(dph_mn, j2)
            if with_sat:
                seg = slice(j2 * g, (j2 + 1) * g)
                sat_flag = jnp.where(sat_col[seg] > 0.5, 1.0, 0.0)
                sat_out[pl.ds(0, 8), pl.ds(off, TILE)] = eight * to_row(sat_flag)

    def _loop(b, carry):
        @pl.when(batch_live_sm[b] > 0)
        def _():
            _batch_body(b)
        return carry

    jax.lax.fori_loop(0, n_batches, _loop, jnp.int32(0))


def stats_kernel_feasible(t_len: int, window: int) -> bool:
    """Static-shape constraints of :func:`pulse_stats`.

    The kernel broadcasts sample indices through f32 matmuls (exact only
    below 2^24) and DMAs ``ceil(window/128)+1`` whole 128-lane rows per
    pulse, so the stored stream must hold at least that many rows.  Callers
    on the ``stats="auto"`` path fall back to the XLA formulation when this
    returns False (short captures, or blocks past 0.3 s at the reference's
    56 Msps — route those through ``dsp.streaming``)."""
    rows = (window + LANES - 1) // LANES + 1
    t_stored = ((t_len + LANES - 1) // LANES) * LANES
    return t_len < (1 << 24) and t_stored >= rows * LANES


def _feasibility_error(t_len: int, window: int) -> str:
    return (
        f"pulse_stats cannot run on a {t_len}-sample block with "
        f"window={window}: blocks must be < 2^24 samples (f32-exact "
        f"index arithmetic) and at least (ceil(window/128)+1)*128 "
        f"samples (whole-row DMA windows).  Use stats='xla', or stream "
        f"long captures in blocks (dsp.streaming)."
    )


def _pulse_stats_flat(
    mag_cm: jax.Array,
    dph_cm: jax.Array,
    sat_cm: jax.Array,
    toa: jax.Array,   # (P,) i32 flat slot list (t_len = invalid)
    te: jax.Array,    # (P,) i32
    chan: jax.Array,  # (P,) i32 channel of each slot (0 for invalid slots)
    *,
    window: int,
    interpret: bool,
    t_len: int,
    gate_slots: bool = False,
    double_buffer: bool = False,
    batch_tiles: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense-slot kernel driver shared by the 2-D and dense wrappers.

    ``t_len`` is the true capture length; the stream arrays may carry
    extra zero-padded columns beyond it (e.g. from the channel-major
    transpose kernel's block grid) — masks and sentinels use ``t_len``.
    ``batch_tiles``: live tiles whose descents run as one batched group
    reduction (0 or 1 = the shipped per-tile kernel; >1 opts into the
    batched kernel — measured slower on v5e, kept for other chips —
    and requires ``gate_slots``/``double_buffer`` off)."""
    if batch_tiles == 0:
        # Per-tile descents are the shipped default: batching (see
        # STATS_BATCH_TILES) measured +0.45 ms dense end-to-end
        # (PROBE_r05 A) — opt in explicitly to use it.
        batch_tiles = 1
    if gate_slots or double_buffer:
        batch_tiles = 1
    rows = (window + LANES - 1) // LANES + 1
    # Scoped-VMEM cap: the batched descent peaks at ~12 KB of scoped VMEM
    # per scratch row (measured: nt*rows=45 compiled to 70.4 MB on v5e),
    # so nt*rows <= 48 stays inside the 100 MB scoped limit below
    # (rows=3 -> nt<=16, rows=9 -> nt<=5).
    batch_tiles = min(batch_tiles, max(1, 48 // rows))
    with_sat = sat_cm is not None
    m, t_arr = mag_cm.shape
    p_orig = toa.shape[0]
    p_flat = ((p_orig + TILE - 1) // TILE) * TILE
    if p_flat != p_orig:  # pad the slot list to whole tiles (dead slots)
        pad = (0, p_flat - p_orig)
        toa = jnp.pad(toa, pad, constant_values=t_len)
        te = jnp.pad(te, pad, constant_values=t_len)
        chan = jnp.pad(chan, pad)
    nt = min(batch_tiles, p_flat // TILE)
    if nt > 1:
        # Batched path: append one all-sentinel tile for ragged batches
        # (see _stats_kernel_batched).
        pad = (0, TILE)
        toa = jnp.pad(toa, pad, constant_values=t_len)
        te = jnp.pad(te, pad, constant_values=t_len)
        chan = jnp.pad(chan, pad)
        p_flat += TILE
    assert t_len <= t_arr, (t_len, t_arr)
    # Row-pad the time axis to whole 128-lane rows (mask excludes the pad).
    t_pad = (-t_arr) % LANES
    if t_pad:
        pad = ((0, 0), (0, t_pad))
        mag_cm = jnp.pad(mag_cm, pad)
        dph_cm = jnp.pad(dph_cm, pad)
        if with_sat:
            sat_cm = jnp.pad(sat_cm, pad)
    t_stored = t_arr + t_pad
    view = (m, t_stored // LANES, LANES)
    g = TILE * rows
    n_tiles = p_flat // TILE

    n_real = n_tiles - 1 if nt > 1 else n_tiles  # exclude the sentinel tile
    live = jnp.max(
        (toa[: n_real * TILE] < t_len).astype(jnp.int32).reshape(
            n_real, TILE), axis=1
    )
    # Row replicated 8x: TPU VMEM arrays need 8-divisible sublane dims, and
    # the in-kernel SMEM staging DMA needs full-sublane slices.
    toa_v = jnp.broadcast_to(toa.astype(jnp.float32)[None, :], (8, p_flat))
    te_v = jnp.broadcast_to(te.astype(jnp.float32)[None, :], (8, p_flat))
    toa_8 = jnp.broadcast_to(toa[None, :], (8, p_flat))
    chan_8 = jnp.broadcast_to(chan[None, :], (8, p_flat))

    expand = np.zeros((g, TILE), np.float32)
    expand[np.arange(g), np.arange(g) // rows] = 1.0
    head = np.zeros((TILE, g), np.float32)  # one-hot group-head rows
    head[np.arange(TILE), np.arange(TILE) * rows] = 1.0

    n_out = 3 if with_sat else 2
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if nt > 1:
        # Compact the live tile indices (same scatter-by-rank trick as
        # dsp.pdw._edge_indices); pad with the sentinel tile's index.
        n_batches = (n_real + nt - 1) // nt
        rank = jnp.cumsum(live) - 1
        rank = jnp.where(live > 0, rank, n_batches * nt)
        tile_ids = jnp.full((n_batches * nt,), n_real, jnp.int32)
        tile_ids = tile_ids.at[rank].set(
            jnp.arange(n_real, dtype=jnp.int32), mode="drop")
        n_live = jnp.sum(live)
        batch_live = (jnp.arange(n_batches, dtype=jnp.int32) * nt
                      < n_live).astype(jnp.int32)
        kernel = functools.partial(
            _stats_kernel_batched, n_batches=n_batches, nt=nt, rows=rows,
            window=window, t_len=t_len, with_sat=with_sat,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # batch-live flags + live tile ids (~1 KB)
            grid=(1,),
            in_specs=(
                [any_spec] * (n_out + 2)  # streams + toa/chan (8, P) i32
                + [vmem_spec] * 4         # toa/te f32, expand, head
            ),
            out_specs=[vmem_spec] * n_out,
            scratch_shapes=(
                [pltpu.VMEM((nt * g, LANES), jnp.float32)] * n_out
                + [pltpu.SMEM((nt, 8, TILE), jnp.int32),
                   pltpu.SMEM((nt, 8, TILE), jnp.int32),
                   pltpu.SemaphoreType.DMA((5,))]
            ),
        )
        prefetch_args = (batch_live, tile_ids)
    else:
        kernel = functools.partial(
            _stats_kernel, n_tiles=n_tiles, rows=rows, window=window,
            t_len=t_len, with_sat=with_sat, gate_slots=gate_slots,
            double_buffer=double_buffer,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # live flags only (~1 KB; SMEM ingress is slow)
            grid=(1,),
            in_specs=(
                [any_spec] * (n_out + 2)      # streams + toa/chan (8, P) i32
                + [vmem_spec] * 4             # toa/te f32, expand, head
            ),
            out_specs=[vmem_spec] * n_out,
            scratch_shapes=(
                ([pltpu.VMEM((2, g, LANES), jnp.float32)] * n_out
                 + [pltpu.SMEM((2, 8, TILE), jnp.int32),
                    pltpu.SMEM((2, 8, TILE), jnp.int32),
                    pltpu.SemaphoreType.DMA((2, 5))])
                if double_buffer else
                ([pltpu.VMEM((g, LANES), jnp.float32)] * n_out
                 + [pltpu.SMEM((8, TILE), jnp.int32),
                    pltpu.SMEM((8, TILE), jnp.int32),
                    pltpu.SemaphoreType.DMA((5,))])
            ),
        )
        prefetch_args = (live,)
    stream_args = [mag_cm.reshape(view), dph_cm.reshape(view)]
    if with_sat:
        stream_args.append(sat_cm.reshape(view))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, p_flat), jnp.float32)] * n_out,
        # The merged dual-median descent carries ~a dozen (g_all, LANES)
        # live arrays; the batched kernel at nt*rows=45 measured 70.4 MB of
        # scoped VMEM (v5e compile log), over the round-4 64 MB setting.
        # v5e has 128 MB VMEM — 100 MB leaves room for the pipeline buffers.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*prefetch_args, *stream_args,
      toa_8, chan_8, toa_v, te_v, jnp.asarray(expand), jnp.asarray(head))
    if with_sat:
        mag_med, dph_med, sat_any = outs
        return mag_med[0, :p_orig], dph_med[0, :p_orig], sat_any[0, :p_orig]
    mag_med, dph_med = outs
    return mag_med[0, :p_orig], dph_med[0, :p_orig], None


@functools.partial(
    jax.jit,
    static_argnames=("window", "interpret", "t_len", "gate_slots",
                     "double_buffer", "batch_tiles"),
)
def pulse_stats(
    mag_cm: jax.Array,   # (M, T) f32 channel-major magnitude
    dph_cm: jax.Array,   # (M, T) f32 channel-major wrapped phase diff
    sat_cm,              # (M, T) f32 cm saturation mask, or None (no sat)
    toa: jax.Array,      # (M, P_slots) i32 leading-edge indices (t_len = invalid)
    te: jax.Array,       # (M, P_slots) i32 trailing-edge indices
    *,
    window: int,
    interpret: bool = False,
    t_len: int | None = None,
    gate_slots: bool = False,
    double_buffer: bool = False,
    batch_tiles: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-pulse (median mag, median dph, saturated) of shape (M, P_slots).

    Sample indices must stay below 2^24 per capture block (f32-exact
    integer broadcasting).  Valid slots may appear anywhere (no ordering
    contract); wholly-empty slot tiles are skipped, so callers that can compact pulses to the front should
    (see :func:`pulse_stats_dense`).  ``t_len`` overrides the capture
    length when the streams carry zero-padded columns beyond it."""
    interpret = interpret or jax.devices()[0].platform == "cpu"
    # Channel count comes from the slot grid: the streams may carry extra
    # zero-padded rows (the transpose kernel pads lanes to 128).
    m = toa.shape[0]
    t_len = mag_cm.shape[1] if t_len is None else t_len
    p_slots = toa.shape[1]
    if not stats_kernel_feasible(t_len, window):
        raise ValueError(_feasibility_error(t_len, window))
    chan = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, p_slots)
    )
    mm, dd, ss = _pulse_stats_flat(
        mag_cm, dph_cm, sat_cm,
        toa.reshape(-1), te.reshape(-1), chan.reshape(-1),
        window=window, interpret=interpret, t_len=t_len,
        gate_slots=gate_slots, double_buffer=double_buffer,
        batch_tiles=batch_tiles,
    )
    return (mm.reshape(m, p_slots), dd.reshape(m, p_slots),
            ss.reshape(m, p_slots) if ss is not None else None)


@functools.partial(
    jax.jit,
    static_argnames=("window", "interpret", "t_len", "gate_slots",
                     "double_buffer", "batch_tiles"),
)
def pulse_stats_dense(
    mag_cm: jax.Array,   # (M, T) f32 channel-major magnitude
    dph_cm: jax.Array,   # (M, T) f32 channel-major wrapped phase diff
    sat_cm,              # (M, T) f32 cm saturation mask, or None (no sat)
    toa: jax.Array,      # (P,) i32 flat leading edges (t_len = invalid)
    te: jax.Array,       # (P,) i32 flat trailing edges
    chan: jax.Array,     # (P,) i32 channel id per slot (0 for invalid)
    *,
    window: int,
    interpret: bool = False,
    t_len: int | None = None,
    gate_slots: bool = False,
    double_buffer: bool = False,
    batch_tiles: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense-list variant of :func:`pulse_stats`: one flat slot list
    mixing all channels, shape (P,) outputs.

    Kernel work scales with *occupied slot tiles* (TILE pulses each):
    callers compact their valid pulses to the front (rank = cumsum of the
    selection mask) so a sparse capture over many channels costs
    ceil(pulses/TILE) tiles instead of ``M * ceil(max_pulses/TILE)``."""
    interpret = interpret or jax.devices()[0].platform == "cpu"
    t_len = mag_cm.shape[1] if t_len is None else t_len
    if not stats_kernel_feasible(t_len, window):
        raise ValueError(_feasibility_error(t_len, window))
    return _pulse_stats_flat(
        mag_cm, dph_cm, sat_cm, toa, te, chan,
        window=window, interpret=interpret, t_len=t_len,
        gate_slots=gate_slots, double_buffer=double_buffer,
        batch_tiles=batch_tiles,
    )
