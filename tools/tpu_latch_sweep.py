"""Sweep the latch kernel's time-block size in the FULL pipeline.

TAIL_BISECT_r03.json taught that isolated stage micros don't predict
composition here, so each t_blk is timed end-to-end: the v_bar variant
(round-2 tail + rank-search barrier — the shipped formulation) with
``pallas_latch_cumsums(t_blk=...)``.  In-graph fori_loop protocol.
Writes LATCH_SWEEP_r03.json.
"""
import json
import os

import jax
import jax.numpy as jnp

from tpu_probe_r3 import (  # noqa: E402
    BANDS, FRAMES, P_SLOTS, SW, THR, cfg, graph_time, log,
    stage_streams_cm, stage_edges, tier_masks, tiny_picks_tala,
    part_scatter, touch, xq,
)
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    pulse_stats_dense,
)

m, t_len = BANDS, FRAMES
n_flat = m * P_SLOTS
W = cfg.max_pulse_samples
results = {}


def make_full(t_blk):
    def run(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = pallas_latch_cumsums(mag, nf * THR, nf * THR, t_blk=t_blk)
        toa, te = stage_edges(cl, ct, m, t_len)
        toa, te = jax.lax.optimization_barrier((toa, te))
        tiers = tier_masks(toa, te, t_len, m)
        _, flat_toa, flat_te, chan_f, plen, is_tiny, is_s, is_l = tiers
        plen2 = plen.reshape(m, P_SLOTS)
        tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        toa_s, te_s, ch_s, rank_s = part_scatter(
            is_s, n_flat, flat_toa, flat_te, chan_f, t_len)
        toa_l, te_l, ch_l, rank_l = part_scatter(
            is_l, n_flat, flat_toa, flat_te, chan_f, t_len)
        outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                                   window=SW, t_len=t_len)
        outs_l = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_l, te_l, ch_l,
                                   window=W, t_len=t_len)
        is_tiny_2d = is_tiny.reshape(m, P_SLOTS)
        rank_c = jnp.where(is_s, rank_s, rank_l + n_flat).reshape(m, P_SLOTS)
        meds = [jnp.where(is_tiny_2d, tiny, jnp.concatenate([vs, vl])[rank_c])
                for (vs, vl), tiny in zip(
                    zip(outs_s, outs_l),
                    (tm, td, jnp.zeros((m, P_SLOTS), jnp.float32)))]
        snr = 10.0 * jnp.log10(meds[0] / nf[:, None])
        return touch(nf, toa.astype(jnp.float32), te.astype(jnp.float32),
                     meds[0], snr, meds[1] / 360.0, meds[2])

    return run


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for t_blk in (1024, 2048, 4096, 8192):
        dt = graph_time(f"full_tblk{t_blk}", make_full(t_blk), xq)
        results[f"full_tblk{t_blk}_ms"] = round(dt * 1e3, 3)
        with open(os.path.join(repo, "LATCH_SWEEP_r03.json"), "w") as f:
            json.dump({"shape": {"bands": BANDS, "frames": FRAMES},
                       "results": results}, f, indent=1, sort_keys=True)
    log("wrote LATCH_SWEEP_r03.json")


if __name__ == "__main__":
    main()
