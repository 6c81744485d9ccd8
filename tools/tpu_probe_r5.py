"""Round-5 perf probe: the two kernel attacks, A/B'd full-graph.

Attacks (VERDICT r4 next #1):

* **batched stats descents** (``pulse_stats_kernel.STATS_BATCH_TILES``):
  the short-tier marginal was 5.01 ms because the dense worst case pays
  ~n_live_tiles SERIAL per-tile radix descents (part-J r4 proved the
  descent, not the DMA, dominates); batching runs one descent per
  ``nt`` live tiles.
* **transpose-first streams kernel** (``CM2_TRANSPOSE_FIRST``): flip the
  complex planes (2 MXU transposes) instead of the 3 derived streams and
  run sqrt/atan2/compare on the ``(m_out, T)`` slab — half the
  elementwise work at M=64.

Both are bit-identical re-formulations (CPU suite asserts it), so only
speed is at stake.  Protocol = the corrected round-4 one (distinct-K
dispatches, pilot-calibrated K1 past the transport flat region,
KSWEEP_r04.json).  Parts (env PROBE_PARTS, default "AB"):

A. Full-graph 2x2: {r4 baseline, +transpose_first, +batch, both} x
   {dense, sparse}.
B. Prefix bisect of the SHIPPED round-5 graph (streams -> nf -> latch ->
   edges -> tiny/sat -> short kernel -> long kernel -> full) — the
   PROBE_r05 marginals artifact (done-criterion: short-tier <= 2.5 ms).
C. batch_tiles sweep {4, 8, 16} full-graph dense at transpose_first on.
D. Noise-floor bits {2, 4} full-graph dense (bits=4 shipped in r4; the
   stats fix may re-rank it).

Writes PROBE_r05.json at the repo root.  Single TPU process only.
"""
import json
import os
import sys
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_scalar(x):
    leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(leaf))[0])


REPS = int(os.environ.get("PROBE_REPS", 3))


def _salted(a, salt):
    idx = (0,) * a.ndim
    if a.dtype == jnp.bool_ or jnp.issubdtype(a.dtype, jnp.integer):
        return a.at[idx].set(a[idx] ^ salt.astype(a.dtype))
    return a.at[idx].add(salt.astype(a.dtype))


def make_looped(fn, n_salt=1):
    @jax.jit
    def run(K, *args):
        def body(i, acc):
            salt = jnp.isnan(acc).astype(jnp.int32) + i * 0
            sargs = tuple(
                _salted(a, salt) if j < n_salt else a
                for j, a in enumerate(args)
            )
            return acc * 0.5 + fn(*sargs)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def graph_time(name, fn, *args, n_salt=1, reps=None):
    """Corrected protocol (KSWEEP_r04.json): distinct K per dispatch;
    pilot-calibrated K1 past the flat region where device execution hides
    under the ~0.43 s transport round trip; median of per-rep differences
    over a >= 1.2 s signal span; every dispatch < ~8 s device time."""
    reps = REPS if reps is None else reps
    run = make_looped(fn, n_salt=n_salt)

    def dispatch(k):
        t0 = time.perf_counter()
        fetch_scalar(run(k, *args))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    fetch_scalar(run(3, *args))
    compile_s = time.perf_counter() - t0
    t_floor = dispatch(4)
    pk = 16
    t_pilot = dispatch(pk)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = dispatch(pk)
    s_pilot = t_pilot / pk
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(40, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = dispatch(k1 + r)
        t2 = dispatch(k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    spread = (max(ests) - min(ests)) / max(dt, 1e-9)
    log(f"{name:<30s} {dt*1e3:9.3f} ms/iter   (compile {compile_s:.0f}s, "
        f"K1={k1}, span={span}, rep spread {spread*100:.0f}%)")
    return dt


from bench import _make_capture, _quantize  # noqa: E402
from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops.pallas import channelizer_kernel as ck
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed_cm2,
)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums_cm
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats,
)
from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

log("devices:", jax.devices())
BANDS = 64
FRAMES = int(os.environ.get("PROBE_FRAMES", 262144))
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)
taps = pipe.channelizer.taps_rev
THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
SW = pdwmod._SHORT_WINDOW
P_SLOTS = ((cfg.max_pulses + TILE - 1) // TILE) * TILE

dev = jax.devices()[0]
xq_dense = jax.device_put(np.ascontiguousarray(
    _quantize(_make_capture(N, BANDS))).view(np.int32).ravel(), dev)
xq_sparse = jax.device_put(np.ascontiguousarray(
    _quantize(_make_capture(N, BANDS, sparse=True))).view(np.int32).ravel(),
    dev)

results = {}


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def full_route(route="cm2"):
    def fn(q):
        nf, _, batch = pipe.forward_packed(q, bit_width=12, route=route)
        return touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                     batch.toa_idx.astype(jnp.float32))
    return fn


def set_knobs(tf: bool, batch: int):
    ck.CM2_TRANSPOSE_FIRST = tf
    pdwmod._STATS_BATCH = batch


def run_part_a():
    variants = (("r4", False, 1), ("tf", True, 1), ("bt", False, 0),
                ("both", True, 0))
    for tag, tf, batch in variants:
        set_knobs(tf, batch)
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"A.{tag}_{label}", full_route(), q)
            results[f"A_{tag}_{label}_ms"] = round(dt * 1e3, 3)
    set_knobs(True, 0)


# ---- cm2 graph stages (hand mirror of dsp/pdw.py:_extract_channelized_cm2)

def stage_streams(q):
    return pallas_channelize_streams_packed_cm2(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)


def stage_nf(mag_cm, bits=4):
    return pdwmod.noise_floor_cm(mag_cm, BANDS, FRAMES, bits=bits)


def stage_latch(mag_cm, nf, t_blk=2048):
    return pallas_latch_cumsums_cm(mag_cm, nf * THR, nf * THR, BANDS,
                                   t_blk=t_blk)


def stage_edges(packed, t_len):
    r = packed.shape[0]
    ranks = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (r, P_SLOTS))
    idx = find_ranks_cm(packed, ranks, t_len, block=pdwmod._RANK_BLOCK)
    return idx[:BANDS], idx[r // 2:r // 2 + BANDS]


def build_prefixes(nf_bits=4, t_blk=2048):
    m, t_len = BANDS, FRAMES

    def b0(q):
        return touch(*stage_streams(q))

    def b1(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        return touch(mag_cm, dph_cm, satcs, stage_nf(mag_cm, nf_bits))

    def b2(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        return touch(mag_cm, dph_cm, satcs, nf,
                     stage_latch(mag_cm, nf, t_blk))

    def b3(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        packed = stage_latch(mag_cm, nf, t_blk)
        toa, te = stage_edges(packed, t_len)
        return touch(mag_cm, dph_cm, satcs, nf, packed, toa, te)

    def tail(q, tiers=()):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        packed = stage_latch(mag_cm, nf, t_blk)
        toa, te = stage_edges(packed, t_len)
        toa, te = jax.lax.optimization_barrier((toa, te))
        plen = te - toa + 1
        valid_slot = toa < t_len
        closed = valid_slot & (te < t_len)
        safe_toa = jnp.minimum(toa, t_len - 1)
        safe_te = jnp.minimum(te, t_len - 1)
        mag_a = jnp.take_along_axis(mag_cm[:m], safe_toa, axis=1)
        mag_b = jnp.take_along_axis(mag_cm[:m], safe_te, axis=1)
        tiny_mag = jnp.where(plen >= 2, 0.5 * (mag_a + mag_b), mag_a)
        tiny_dph = jnp.where(plen >= 2,
                             jnp.take_along_axis(dph_cm[:m], safe_toa, axis=1),
                             jnp.float32(np.nan))
        s_hi = jnp.take_along_axis(satcs[:m], jnp.maximum(safe_te - 1, 0),
                                   axis=1)
        s_lo = jnp.take_along_axis(satcs[:m], safe_toa, axis=1)
        sat_any = (s_hi - s_lo) > 0.5
        is_tiny = closed & (plen <= 2)
        is_short = closed & ~is_tiny & (plen <= SW)
        is_long = valid_slot & ~is_tiny & ~is_short
        acc = [mag_cm, dph_cm, nf, toa, te, tiny_mag, tiny_dph, sat_any,
               is_tiny]
        sentinel = jnp.int32(t_len)
        for sel, window in tiers:
            sel_m = {"short": is_short, "long": is_long}[sel]
            t_sel = jnp.where(sel_m, toa, sentinel)
            e_sel = jnp.where(sel_m, te, sentinel)
            mm, dd, _ = pulse_stats(mag_cm, dph_cm, None, t_sel, e_sel,
                                    window=window, t_len=t_len,
                                    batch_tiles=pdwmod._STATS_BATCH)
            acc += [mm, dd]
        return touch(*acc)

    return [("b0_streams", b0), ("b1_nf", b1), ("b2_latch", b2),
            ("b3_edges", b3),
            ("b4_tiny_sat", lambda q: tail(q)),
            ("b5_short", lambda q: tail(q, (("short", SW),))),
            ("b6_long", lambda q: tail(
                q, (("short", SW), ("long", cfg.max_pulse_samples)))),
            ("b7_full", full_route("cm2"))]


def run_part_b():
    set_knobs(True, 1)  # the shipped defaults (per-tile descents)
    prev = 0.0
    for name, fn in build_prefixes():
        dt = graph_time("B." + name, fn, xq_dense)
        results["B_" + name + "_ms"] = round(dt * 1e3, 3)
        results["B_marg_" + name + "_ms"] = round((dt - prev) * 1e3, 3)
        prev = dt


def run_part_c():
    for nt in (4, 8, 16):
        set_knobs(True, nt)
        dt = graph_time(f"C.bt{nt}_dense", full_route(), xq_dense)
        results[f"C_bt{nt}_dense_ms"] = round(dt * 1e3, 3)
    set_knobs(True, 0)


def run_part_d():
    import functools as ft

    set_knobs(True, 0)
    orig_nf = pdwmod.noise_floor_cm
    for bits in (2, 4):
        pdwmod.noise_floor_cm = ft.partial(orig_nf, bits=bits)
        try:
            dt = graph_time(f"D.nf_bits{bits}_dense", full_route(), xq_dense)
            results[f"D_nf_bits{bits}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            pdwmod.noise_floor_cm = orig_nf


def run_part_e():
    """Round-5 second-wave knobs, each toggled off the shipped defaults
    (tf on, per-tile descents, w128 tier on, VMEM-resident nf kernel on):
    E.ship = all defaults; E.no_w128; E.no_nfk."""
    set_knobs(True, 1)
    for tag, w128, nfk in (("ship", True, True), ("no_w128", False, True),
                           ("no_nfk", True, False)):
        pdwmod._TIER_W128 = w128
        pdwmod._NF_KERNEL = nfk
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"E.{tag}_{label}", full_route(), q)
            results[f"E_{tag}_{label}_ms"] = round(dt * 1e3, 3)
    pdwmod._TIER_W128 = True
    pdwmod._NF_KERNEL = True


def run_part_f():
    """Tail knobs at the round-5 ship config: merged picks, latch t_blk,
    rank-search block."""
    set_knobs(True, 1)
    import sdr_channelizer_tpu.ops.pallas.latch_kernel as lk

    for tag, merged in (("ship2", True), ("no_merge", False)):
        pdwmod._MERGED_PICKS = merged
        dt = graph_time(f"F.{tag}_dense", full_route(), xq_dense)
        results[f"F_{tag}_dense_ms"] = round(dt * 1e3, 3)
    pdwmod._MERGED_PICKS = True

    orig_latch = lk.pallas_latch_cumsums_cm
    for t_blk in (1024, 4096):
        def patched(mag_cm, lead, trail, m_real, t_blk=t_blk, **kw):
            return orig_latch(mag_cm, lead, trail, m_real, t_blk=t_blk, **kw)
        lk.pallas_latch_cumsums_cm = patched
        try:
            dt = graph_time(f"F.latch{t_blk}_dense", full_route(), xq_dense)
            results[f"F_latch{t_blk}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            lk.pallas_latch_cumsums_cm = orig_latch

    for rb in (128,):
        pdwmod._RANK_BLOCK = rb
        dt = graph_time(f"F.rb{rb}_dense", full_route(), xq_dense)
        results[f"F_rb{rb}_dense_ms"] = round(dt * 1e3, 3)
    pdwmod._RANK_BLOCK = 256


def run_part_g():
    """Third-wave knobs: 3-limb exact transpose (half the flip passes),
    the 3-tier alternative (short window 128, no separate 256 tier), and
    an 8192-frame streams-kernel grid block."""
    set_knobs(True, 1)
    ck.TRANSPOSE_LIMB3 = True
    for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
        dt = graph_time(f"G.limb3_{label}", full_route(), q)
        results[f"G_limb3_{label}_ms"] = round(dt * 1e3, 3)
    ck.TRANSPOSE_LIMB3 = False

    orig_sw, orig_w128 = pdwmod._SHORT_WINDOW, pdwmod._TIER_W128
    pdwmod._SHORT_WINDOW, pdwmod._TIER_W128 = 128, False
    try:
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"G.tier3_{label}", full_route(), q)
            results[f"G_tier3_{label}_ms"] = round(dt * 1e3, 3)
    finally:
        pdwmod._SHORT_WINDOW, pdwmod._TIER_W128 = orig_sw, orig_w128

    ck.CM2_BLOCK_FRAMES = 8192
    dt = graph_time("G.bf8192_dense", full_route(), xq_dense)
    results["G_bf8192_dense_ms"] = round(dt * 1e3, 3)
    ck.CM2_BLOCK_FRAMES = 4096


def run_part_h():
    """Decompose the b4 (tiny/sat) marginal: which of its pieces —
    barrier+masks, the three stream gathers, or the count/valid tail —
    carries the ~1.9 ms.  Prefixes share the b3 base."""
    set_knobs(True, 1)
    m, t_len = BANDS, FRAMES

    def base(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm)
        packed = stage_latch(mag_cm, nf)
        toa, te = stage_edges(packed, t_len)
        toa, te = jax.lax.optimization_barrier((toa, te))
        return mag_cm, dph_cm, satcs, nf, toa, te

    def h0(q):  # + masks/plen only (no gathers)
        mag_cm, dph_cm, satcs, nf, toa, te = base(q)
        plen = te - toa + 1
        closed = (toa < t_len) & (te < t_len)
        is_tiny = closed & (plen <= 2)
        return touch(mag_cm, dph_cm, satcs, nf, toa, te, plen, is_tiny)

    def h1(q):  # + ONE stream gather (mag at toa)
        mag_cm, dph_cm, satcs, nf, toa, te = base(q)
        safe_toa = jnp.minimum(toa, t_len - 1)
        g1 = jnp.take_along_axis(mag_cm[:m], safe_toa, axis=1)
        return touch(mag_cm, dph_cm, satcs, nf, toa, te, g1)

    def h2(q):  # + all five picks (merged form)
        mag_cm, dph_cm, satcs, nf, toa, te = base(q)
        safe_toa = jnp.minimum(toa, t_len - 1)
        safe_te = jnp.minimum(te, t_len - 1)
        mg = jnp.take_along_axis(
            mag_cm[:m], jnp.concatenate([safe_toa, safe_te], axis=1), axis=1)
        dg = jnp.take_along_axis(dph_cm[:m], safe_toa, axis=1)
        sg = jnp.take_along_axis(
            satcs[:m],
            jnp.concatenate([jnp.maximum(safe_te - 1, 0), safe_toa], axis=1),
            axis=1)
        return touch(mag_cm, dph_cm, satcs, nf, toa, te, mg, dg, sg)

    for name, fn in (("h0_masks", h0), ("h1_1gather", h1), ("h2_5picks", h2)):
        dt = graph_time("H." + name, fn, xq_dense)
        results["H_" + name + "_ms"] = round(dt * 1e3, 3)


PARTS = os.environ.get("PROBE_PARTS", "AB").upper()
t_all = time.time()
for part, runner in (("A", run_part_a), ("B", run_part_b),
                     ("C", run_part_c), ("D", run_part_d),
                     ("E", run_part_e), ("F", run_part_f),
                     ("G", run_part_g), ("H", run_part_h)):
    if part in PARTS:
        log(f"=== part {part} ===")
        runner()

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(repo, "PROBE_r05.json")
payload = {
    "shape": {"bands": BANDS, "frames": FRAMES},
    "protocol": "corrected in-graph (distinct-K, pilot K1 past flat region)",
    "results": results,
    "notes": os.environ.get("PROBE_NOTES", ""),
}
if os.path.exists(path):
    with open(path) as f:
        old = json.load(f)
    old["results"].update(results)
    if payload["notes"]:
        old["notes"] = (old.get("notes", "") + " | " + payload["notes"]).strip(" |")
    payload = old
with open(path, "w") as f:
    json.dump(payload, f, indent=1, sort_keys=True)
log(f"wrote {path} ({time.time()-t_all:.0f}s total)")
