""">2^24-sample capture streamed through the real TPU with checkpoint/resume.

Round-4 evidence for SURVEY §5.7 at production scale: a 36.7M-sample
(0.655 s at 56 Msps, past the 2^24 single-block bound) multi-file `.iq`
capture run through ``StreamingExtractor.extract_segment_fused`` — the
packed fused-kernel streaming path (per-block Pallas channelize+streams
kernel, overlap-save FIR history, cross-block latch chaining, exact
two-pass noise floor, per-block ``.npz`` checkpoints):

1. cold run: wall time + Msps, per-phase split (noise floor / blocks);
2. resume run (same checkpoint dir): must be block-resumed and
   bit-identical;
3. interrupted resume: tail checkpoints deleted, re-run, bit-identical.

Writes STREAM_r04.json.  Single TPU process only (see CLAUDE.md).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer
    from sdr_channelizer_tpu.dsp.streaming import CaptureSet, StreamingExtractor
    from sdr_channelizer_tpu.io import iqpacket

    dev = jax.devices()[0]
    log("device:", dev.platform, dev.device_kind)

    FS = 56e6
    M = 56  # 1 MHz bins at 56 Msps — the reference operating point
    frames = 655360
    n = frames * M  # 36.7M samples > 2^24
    rng = np.random.default_rng(0)
    t = np.arange(n)
    sig = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
           ).astype(np.complex64)
    for f0, pw, pri in ((5e6, 100e-6, 5e-3), (-11e6, 50e-6, 3e-3)):
        tone = (0.7 * np.exp(2j * np.pi * f0 / FS * t)).astype(np.complex64)
        pw_n, pri_n = int(pw * FS), int(pri * FS)
        for s in range(911, n - pw_n, pri_n):
            sig[s:s + pw_n] = tone[s:s + pw_n]
    samples = iqpacket.from_complex(sig, 12)
    del sig

    work = tempfile.mkdtemp(prefix="stream_r4_")
    chunk = n // 3
    for k in range(3):
        part = samples[k * chunk:(k + 1) * chunk if k < 2 else n]
        hdr = iqpacket.IqHeader(
            frequency_hz=2.4e9, bandwidth_hz=FS, sample_rate_sps=FS,
            rx_gain_db=40, num_samples=len(part), bit_width=12,
            sample_start_time=1723800000.0 + k * chunk / FS,
        )
        iqpacket.write_iq(os.path.join(work, f"d{k}.iq"), hdr, part)
    del samples
    seg = CaptureSet.from_dir(work).segments[0]
    assert seg.num_samples == n

    cfg = PdwConfig.channelized(max_pulses=256, max_pulse_samples=1024)
    chan = Channelizer.create(M)
    ext = StreamingExtractor(chan, cfg, block_frames=131072)
    ck = os.path.join(work, "ck")

    t0 = time.perf_counter()
    cold = ext.extract_segment_fused(seg, fc=2.4e9, checkpoint_dir=ck)
    cold_wall = time.perf_counter() - t0
    log(f"cold run: {cold_wall:.1f}s  ({n / cold_wall / 1e6:.0f} Msps incl. "
        f"compile)  {len(cold['toa'])} pdws")

    c0 = dict(ext.counters.snapshot()["counters"])
    t0 = time.perf_counter()
    warm = ext.extract_segment_fused(seg, fc=2.4e9, checkpoint_dir=ck)
    resume_wall = time.perf_counter() - t0
    c1 = dict(ext.counters.snapshot()["counters"])
    resumed_blocks = c1.get("blocks_resumed_from_checkpoint", 0) - \
        c0.get("blocks_resumed_from_checkpoint", 0)
    equal = all(np.array_equal(cold[k], warm[k]) for k in cold)
    log(f"full resume: {resume_wall:.1f}s, {int(resumed_blocks)} blocks "
        f"resumed, equal={equal}")

    # Interrupted resume: drop the last two block checkpoints.
    import glob

    blocks = sorted(glob.glob(os.path.join(ck, "block_*.npz")))
    for b in blocks[-2:]:
        os.unlink(b)
    t0 = time.perf_counter()
    part = ext.extract_segment_fused(seg, fc=2.4e9, checkpoint_dir=ck)
    partial_wall = time.perf_counter() - t0
    equal2 = all(np.array_equal(cold[k], part[k]) for k in cold)
    log(f"interrupted resume (2 blocks recomputed): {partial_wall:.1f}s, "
        f"equal={equal2}")

    # Warm throughput without checkpoint reads: fresh dir, compiled cache.
    ck2 = os.path.join(work, "ck2")
    t0 = time.perf_counter()
    ext.extract_segment_fused(seg, fc=2.4e9, checkpoint_dir=ck2)
    warm_wall = time.perf_counter() - t0
    log(f"warm full run (compiled): {warm_wall:.1f}s = "
        f"{n / warm_wall / 1e6:.0f} Msps end-to-end (disk+h2d+TPU+fetch)")

    payload = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "samples": n,
        "gt_2pow24": n > (1 << 24),
        "bands": M,
        "fs_msps": FS / 1e6,
        "block_frames": 131072,
        "n_blocks": 5,
        "files": 3,
        "pdws": len(cold["toa"]),
        "cold_wall_s_incl_compile": round(cold_wall, 1),
        "warm_wall_s": round(warm_wall, 1),
        "warm_msps_end_to_end": round(n / warm_wall / 1e6, 1),
        "full_resume_wall_s": round(resume_wall, 1),
        "full_resume_blocks": int(resumed_blocks),
        "full_resume_bit_identical": bool(equal),
        "interrupted_resume_wall_s": round(partial_wall, 1),
        "interrupted_resume_bit_identical": bool(equal2),
        "path": "extract_segment_fused (packed Pallas kernel per block)",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "STREAM_r04.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    log("wrote STREAM_r04.json")
    log(json.dumps(payload, indent=1, sort_keys=True))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
