"""Bisect the round-3 tail regression: which of {barrier, merged tier,
blocked picks} blew the full step from 10.6 ms to 17.2 ms (tpu_tail_ab.py).

Hand-mirrors the full packed pipeline with the OLD (round-2) tail as v_old,
then toggles each change independently.  In-graph fori_loop protocol from
tpu_probe_r3.  Writes TAIL_BISECT_r03.json.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_probe_r3 import (  # noqa: E402  (device setup at import)
    BANDS, FRAMES, P_SLOTS, SW, THR, cfg, graph_time, log,
    stage_edges, stage_latch, stage_streams_cm, tier_masks,
    tiny_picks_tala, touch, part_scatter, xq,
)
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.rank_find import take_at_cm
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    pulse_stats_dense,
)

results = {}
m, t_len = BANDS, FRAMES
n_flat = m * P_SLOTS
W = cfg.max_pulse_samples


def front(q, barrier):
    mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
    nf = medians.median(mag, axis=0)
    cl, ct = stage_latch(mag, nf)
    toa, te = stage_edges(cl, ct, m, t_len)
    if barrier:
        toa, te = jax.lax.optimization_barrier((toa, te))
    return nf, mag_cm, dph_cm, sat_cm, toa, te


def tiny_blocked(mag_cm, dph_cm, flat_toa, flat_te, plen2):
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    sa = jnp.minimum(flat_toa, t_len - 1)
    sb = jnp.minimum(flat_te, t_len - 1)
    mag_a = take_at_cm(mag_cm, chan_f, sa).reshape(m, P_SLOTS)
    mag_b = take_at_cm(mag_cm, chan_f, sb).reshape(m, P_SLOTS)
    dph_a = take_at_cm(dph_cm, chan_f, sa).reshape(m, P_SLOTS)
    tiny_mag = jnp.where(plen2 >= 2, 0.5 * (mag_a + mag_b), mag_a)
    tiny_dph = jnp.where(plen2 >= 2, dph_a, jnp.float32(np.nan))
    return tiny_mag, tiny_dph


def emit(nf, toa, te, med_mag, med_dph, sat_any):
    snr = 10.0 * jnp.log10(med_mag / nf[:, None])
    return touch(nf, toa.astype(jnp.float32), te.astype(jnp.float32),
                 med_mag, snr, med_dph / 360.0, sat_any)


def make_variant(barrier, merged, blocked):
    def run(q):
        nf, mag_cm, dph_cm, sat_cm, toa, te = front(q, barrier)
        tiers = tier_masks(toa, te, t_len, m)
        _, flat_toa, flat_te, chan_f, plen, is_tiny, is_s, is_l = tiers
        plen2 = plen.reshape(m, P_SLOTS)
        if blocked:
            tm, td = tiny_blocked(mag_cm, dph_cm, flat_toa, flat_te, plen2)
        else:
            tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        is_tiny_2d = is_tiny.reshape(m, P_SLOTS)
        zeros2d = jnp.zeros((m, P_SLOTS), jnp.float32)
        if merged:
            is_k = is_s | is_l
            toa_k, te_k, ch_k, rank_k = part_scatter(
                is_k, n_flat, flat_toa, flat_te, chan_f, t_len)
            outs_k = pulse_stats_dense(mag_cm, dph_cm, sat_cm,
                                       toa_k, te_k, ch_k,
                                       window=W, t_len=t_len)
            rank_2d = rank_k.reshape(m, P_SLOTS)
            meds = [jnp.where(is_tiny_2d, tiny, vk[rank_2d])
                    for vk, tiny in zip(outs_k, (tm, td, zeros2d))]
        else:
            toa_s, te_s, ch_s, rank_s = part_scatter(
                is_s, n_flat, flat_toa, flat_te, chan_f, t_len)
            toa_l, te_l, ch_l, rank_l = part_scatter(
                is_l, n_flat, flat_toa, flat_te, chan_f, t_len)
            outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm,
                                       toa_s, te_s, ch_s,
                                       window=SW, t_len=t_len)
            outs_l = pulse_stats_dense(mag_cm, dph_cm, sat_cm,
                                       toa_l, te_l, ch_l,
                                       window=W, t_len=t_len)
            rank_c = jnp.where(is_s, rank_s, rank_l + n_flat).reshape(
                m, P_SLOTS)
            meds = [jnp.where(is_tiny_2d, tiny,
                              jnp.concatenate([vs, vl])[rank_c])
                    for (vs, vl), tiny in zip(zip(outs_s, outs_l),
                                              (tm, td, zeros2d))]
        return emit(nf, toa, te, *meds)

    return run


VARIANTS = [
    ("v_old", dict(barrier=False, merged=False, blocked=False)),
    ("v_bar", dict(barrier=True, merged=False, blocked=False)),
    ("v_merge", dict(barrier=False, merged=True, blocked=False)),
    ("v_picks", dict(barrier=False, merged=False, blocked=True)),
    ("v_all", dict(barrier=True, merged=True, blocked=True)),
]


def main():
    only = os.environ.get("TAIL_VARIANTS")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, kw in VARIANTS:
        if only and name not in only.split(","):
            continue
        t0 = time.perf_counter()
        dt = graph_time(name, make_variant(**kw), xq)
        results[name + "_ms"] = round(dt * 1e3, 3)
        results[name + "_wall_s"] = round(time.perf_counter() - t0, 1)
        with open(os.path.join(repo, "TAIL_BISECT_r03.json"), "w") as f:
            json.dump({"shape": {"bands": BANDS, "frames": FRAMES},
                       "results": results}, f, indent=1, sort_keys=True)
    log("wrote TAIL_BISECT_r03.json")


if __name__ == "__main__":
    main()
