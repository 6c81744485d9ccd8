"""CLI entry point — one subcommand per reference workflow."""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import List, Optional

import numpy as np


def _out_path(in_path: str, out_dir: Optional[str], new_ext: str) -> str:
    base = os.path.basename(in_path)
    stem = base.rsplit(".", 1)[0]
    d = out_dir or os.path.dirname(in_path) or "."
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, stem + new_ext)


def cmd_generate(args) -> int:
    """generate_training_iq.m parity: random (or explicit) pulse trains
    written as v1 .iq with the ground truth encoded in the filename
    (``generate_training_iq.m:107``)."""
    from sdr_channelizer_tpu.signal import synth

    os.makedirs(args.out_dir, exist_ok=True)
    for k in range(args.count):
        if args.freq_mhz is None:
            spec = synth.random_pulse_train_spec(
                args.seed + k, sample_rate_sps=args.fs_msps * 1e6,
                duration_sec=args.duration_sec,
            )
        else:
            spec = synth.PulseTrainSpec(
                sample_rate_sps=args.fs_msps * 1e6,
                duration_sec=args.duration_sec,
                frequency_hz=args.freq_mhz * 1e6,
                pulse_width_sec=args.pw_us * 1e-6,
                pri_sec=args.pri_us * 1e-6,
                noise_std=args.noise_std,
            )
        name = (f"{spec.frequency_hz/1e6:.1f}_MHz_{spec.pulse_width_sec*1e6:.1f}"
                f"_us_{spec.pri_sec*1e6:.1f}_us.iq")
        path = os.path.join(args.out_dir, name)
        synth.write_training_iq(path, spec, seed=args.seed + k)
        print(path)
    return 0


def cmd_record(args) -> int:
    """The recorders' 7-arg contract against the emulator (native binary if
    built, else the in-process radio)."""
    from sdr_channelizer_tpu.capture.emulator import EmulatedRadio, NativeEmulator
    from sdr_channelizer_tpu.config import CaptureConfig
    from sdr_channelizer_tpu.io import iqpacket

    cfg = CaptureConfig(
        frequency_mhz=args.freq_mhz, bandwidth_mhz=args.bw_mhz,
        sample_rate_msps=args.rate_msps, rx_gain_db=args.gain_db,
        dwell_sec=args.dwell_sec, duration_sec=args.duration_sec,
        filter_delay_samples=args.filter_delay, bit_width=args.bit_width,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    native = NativeEmulator()
    if native.available() and not args.python_emulator:
        files = native.record(cfg, args.out_dir, offset_mhz=args.offset_mhz,
                              pw_us=args.pw_us, pri_us=args.pri_us,
                              noise_db=args.noise_db)
        for f in files:
            print(f)
        return 0
    import time

    radio = EmulatedRadio(
        sample_rate_sps=cfg.sample_rate_sps, tone_offset_hz=args.offset_mhz * 1e6,
        pulse_width_sec=args.pw_us * 1e-6, pri_sec=args.pri_us * 1e-6,
        noise_db=args.noise_db, gain_db=cfg.rx_gain_db,
        bit_width=cfg.bit_width, start_epoch=time.time(),
    )
    from sdr_channelizer_tpu.capture.hardware import DwellError

    n_dwells = int(cfg.duration_sec / cfg.dwell_sec)
    for _ in range(n_dwells):
        try:
            iq, t0 = radio.receive(cfg.dwell_samples + cfg.filter_delay_samples)
        except DwellError as e:
            # drop-don't-corrupt (usrp_record_iq_12bit.cpp:201-227): log,
            # count, keep looping; only whole dwells are written.
            print(f"dwell dropped: {e}", file=sys.stderr)
            radio.counters.add(f"dwell_errors_{e.code}")
            continue
        iq = iq[cfg.filter_delay_samples:]
        t0 += cfg.filter_delay_samples / cfg.sample_rate_sps
        samples = iqpacket.from_complex(iq, cfg.bit_width)
        hdr = iqpacket.IqHeader(
            frequency_hz=cfg.frequency_mhz * 1e6, bandwidth_hz=cfg.bandwidth_mhz * 1e6,
            sample_rate_sps=cfg.sample_rate_sps, rx_gain_db=cfg.rx_gain_db,
            num_samples=len(iq), bit_width=cfg.bit_width, sample_start_time=t0,
            board_name="emulated-py", serial_number="emu0",
        )
        path = os.path.join(args.out_dir, iqpacket.utc_filename(t0))
        iqpacket.write_iq(path, hdr, samples)
        print(path)
    if args.metrics:
        print(radio.counters.to_json())
    return 0


def cmd_gain_search(args) -> int:
    from sdr_channelizer_tpu.capture import EmulatedRadio, find_max_unsaturated_gain

    radio = EmulatedRadio(
        sample_rate_sps=args.rate_msps * 1e6, tone_offset_hz=args.offset_mhz * 1e6,
        gain_db=args.gain_db, rel_amplitude=args.amplitude, noise_db=args.noise_db,
    )
    dwell_n = int(args.dwell_sec * radio.sample_rate_sps)
    n = int(args.duration_sec / args.dwell_sec)
    from sdr_channelizer_tpu.utils.metrics import Counters

    counters = Counters()
    final, history = find_max_unsaturated_gain(radio, dwell_n, n,
                                               counters=counters)
    for gain, sat in history:
        print(f"gain {gain:5.1f} dB  {'SATURATED' if sat else 'ok'}")
    print(f"Max unsaturated gain: {final:.1f} dB")
    if args.metrics:
        print(counters.to_json())
    return 0


def cmd_convert(args) -> int:
    from sdr_channelizer_tpu.io import convert

    for path in args.files:
        if path.endswith(".bin"):
            iq, fs, fc, idx = convert.read_legacy_bin(path)
            out = _out_path(path, args.out_dir, ".npz")
            np.savez(out, iq=iq, fs=fs, fc=fc, index=idx)
        elif args.mat:
            out = _out_path(path, args.out_dir, ".mat")
            convert.iq_to_mat(path, out, normalize=not args.raw,
                              v73=args.v73)
        else:
            out = _out_path(path, args.out_dir, ".npz")
            convert.iq_to_npz(path, out, normalize=not args.raw)
        print(out)
    return 0


def _bands_for(args, fs: float) -> int:
    from sdr_channelizer_tpu.config import bands_for_bin_width

    if args.bands:
        return args.bands
    return bands_for_bin_width(fs, args.bin_width_hz)


def cmd_channelize(args) -> int:
    """channelizer_example.m parity: channelize and render the waterfall."""
    import jax
    import jax.numpy as jnp

    from sdr_channelizer_tpu.dsp.channelizer import (
        Channelizer,
        channelize,
        channelize_planes,
    )
    from sdr_channelizer_tpu.io.convert import load_capture

    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    for path in args.files:
        iq, meta = load_capture(path)
        fs = float(meta["fs"])
        m = _bands_for(args, fs)
        chan = Channelizer.create(m, taps_per_band=args.taps_per_band)
        n = len(iq) // m * m
        if platform != "cpu":
            # Complex device-to-host copies are unimplemented on some TPU
            # transports: run the complex-free planes graph and assemble
            # the complex spectra on the host.
            yr, yi = channelize_planes(
                jnp.asarray(np.ascontiguousarray(np.real(iq[:n]), np.float32)),
                jnp.asarray(np.ascontiguousarray(np.imag(iq[:n]), np.float32)),
                chan,
            )
            y = np.asarray(yr) + 1j * np.asarray(yi)
        else:
            y = np.asarray(channelize(jnp.asarray(iq[:n]), chan))
        if args.out or len(args.files) == 1:
            out = args.out or _out_path(path, args.out_dir, "_chan.npz")
            np.savez(out, chan_iq=y, fs=fs / m,
                     center_frequencies=chan.center_frequencies(fs) + meta.get("fc", 0.0),
                     sample_start_time=meta.get("sampleStartTime", 0.0))
            print(out)
        if args.png:
            from sdr_channelizer_tpu.viz import waterfall_png

            png = args.png if args.png != "auto" else _out_path(path, args.out_dir, "_waterfall.png")
            waterfall_png(png, np.abs(y), fs, meta.get("fc", 0.0),
                          title=os.path.basename(path))
            print(png)
        if args.frames_dir or args.video:
            import tempfile

            from sdr_channelizer_tpu.viz import waterfall_window_pngs

            frames_dir = args.frames_dir or tempfile.mkdtemp(
                prefix="waterfall_frames_")
            frames = waterfall_window_pngs(
                frames_dir, iq[:n], fs, m, meta.get("fc", 0.0),
                window_sec=args.frame_window_sec, limit=args.frame_limit,
            )
            if args.frames_dir:
                for p in frames:
                    print(p)
            if args.video:
                from sdr_channelizer_tpu.viz import waterfall_video

                video = (args.video if args.video != "auto"
                         else _out_path(path, args.out_dir, "_waterfall.mp4"))
                print(waterfall_video(video, frames, fps=args.video_fps))
    return 0


def cmd_pdw(args) -> int:
    """create_pdws.m / create_pdws_channelized.m parity."""
    import jax
    import jax.numpy as jnp

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.io.convert import load_capture
    from sdr_channelizer_tpu.models import ChannelizerPipeline, WidebandPdwPipeline
    from sdr_channelizer_tpu.utils.metrics import Counters

    counters = Counters()
    all_pdws = []
    if args.stream:
        # Blockwise streaming extraction over contiguous multi-file capture
        # segments (dsp/streaming.py): O(block) memory, exact two-pass
        # noise floor, optional checkpoint/resume — the path for capture
        # series and files too large for one device buffer.
        from sdr_channelizer_tpu.dsp.channelizer import Channelizer
        from sdr_channelizer_tpu.dsp.streaming import (
            CaptureSet,
            StreamingExtractor,
        )

        cset = CaptureSet.from_paths([os.fspath(p) for p in args.files])
        for si, seg in enumerate(cset.segments):
            hdr = seg.headers[0]
            fs = hdr.sample_rate_sps
            if args.channelized:
                m = _bands_for(args, fs)
                cfg = PdwConfig.channelized(
                    max_pulses=args.max_pulses,
                    max_pulse_samples=args.max_pulse_samples)
                chan = Channelizer.create(m)
            else:
                cfg = PdwConfig.wideband(
                    max_pulses=args.max_pulses,
                    max_pulse_samples=args.max_pulse_samples)
                chan = None
            if args.threshold_db is not None:
                cfg = dataclasses.replace(cfg, snr_threshold_db=args.threshold_db)
            ext = StreamingExtractor(channelizer=chan, pdw_cfg=cfg,
                                     block_frames=args.block_frames,
                                     counters=counters)
            ck = (os.path.join(args.checkpoint_dir, f"seg{si:03d}")
                  if args.checkpoint_dir else None)
            # On sort-free (TPU) backends, channelized segments route
            # through the packed fused-kernel block path: raw payload
            # bytes to the device, per-block Pallas kernels, no complex
            # arithmetic (some TPU transports cannot lower it).
            from sdr_channelizer_tpu.dsp import pdw as _pdwmod
            from sdr_channelizer_tpu.ops import medians as _medians

            use_fused = (
                chan is not None and _medians.use_sort_free()
                and _pdwmod._pallas_stats_ok(
                    args.block_frames + cfg.max_pulse_samples, cfg)
            )
            if use_fused:
                pdws = ext.extract_segment_fused(seg, fc=hdr.frequency_hz,
                                                 checkpoint_dir=ck)
            else:
                pdws = ext.extract_segment(seg, fc=hdr.frequency_hz,
                                           checkpoint_dir=ck)
            all_pdws.append(pdws)
            print(f"segment {si} ({len(seg.paths)} files, "
                  f"{seg.num_samples} samples): {len(pdws['toa'])} pulses")
        counters.add("files_processed", len(args.files))
        counters.add("pulses_emitted",
                     sum(len(p["toa"]) for p in all_pdws))
        args_files = ()  # the per-file loop below is skipped
    else:
        args_files = args.files
    for path in args_files:
        iq, meta = load_capture(path)
        fs = float(meta["fs"])
        fc = float(meta.get("fc", 0.0))
        t0 = float(meta.get("sampleStartTime", 0.0))
        if args.channelized:
            m = _bands_for(args, fs)
            cfg = PdwConfig.channelized(max_pulses=args.max_pulses,
                                        max_pulse_samples=args.max_pulse_samples)
            if args.threshold_db is not None:
                cfg = dataclasses.replace(cfg, snr_threshold_db=args.threshold_db)
            # Integer-payload containers feed the packed-ingest fused
            # kernels (on-disk bytes to the device, in-kernel dequant);
            # float containers go as f32 planes through the same path.
            from sdr_channelizer_tpu.io.convert import load_capture_raw

            raw, bw, _ = load_capture_raw(path)
            if raw is None:
                bw = 0
            if args.shards > 1:
                # Multi-device extraction: fused per-shard kernels over a
                # time-sharded mesh (parallel/pipeline.py).
                from sdr_channelizer_tpu.dsp.channelizer import Channelizer
                from sdr_channelizer_tpu.parallel import make_mesh
                from sdr_channelizer_tpu.parallel.pipeline import ShardedPipeline

                mesh = make_mesh(n_time=args.shards, n_chan=1)
                spipe = ShardedPipeline(
                    mesh, Channelizer.create(m), cfg,
                    halo_mode="strict" if args.strict_halo else "warn")
                n = len(iq) // (args.shards * m) * (args.shards * m)
                samples = raw[:n] if raw is not None else np.stack(
                    [np.real(iq[:n]), np.imag(iq[:n])], -1).astype(np.float32)
                pdws = spipe.extract_fused(samples, bit_width=bw, fs=fs, fc=fc,
                                           sample_start_time=t0)
                all_pdws.append(pdws)
                counters.add("files_processed")
                counters.add("samples_ingested", n)
                counters.add("pulses_emitted", len(pdws["toa"]))
                print(f"{path}: {len(pdws['toa'])} pulses "
                      f"({args.shards} shards)")
                continue
            pipe = ChannelizerPipeline.create(m, pdw_cfg=cfg)
            n = len(iq) // m * m
            try:
                platform = jax.devices()[0].platform
            except RuntimeError:
                platform = "cpu"
            if raw is not None and platform != "cpu":
                # The single-chip headline path (bench.py): packed ingest,
                # fused Pallas kernels.  On CPU the interpret-mode kernels
                # are slower than the XLA oracle path — keep extract().
                pdws = pipe.extract_fused(raw[:n], bit_width=bw, fs=fs,
                                          fc=fc, sample_start_time=t0)
            else:
                pdws = pipe.extract(jnp.asarray(iq[:n]), fs=fs, fc=fc,
                                    sample_start_time=t0)
        else:
            cfg = PdwConfig.wideband(max_pulses=args.max_pulses,
                                     max_pulse_samples=args.max_pulse_samples)
            if args.threshold_db is not None:
                cfg = dataclasses.replace(cfg, snr_threshold_db=args.threshold_db)
            if args.shards > 1:
                from sdr_channelizer_tpu.dsp.pdw import finalize_pdws
                from sdr_channelizer_tpu.parallel import make_mesh
                from sdr_channelizer_tpu.parallel.pipeline import (
                    merge_block_batches,
                    sharded_extract_pdws,
                )

                mesh = make_mesh(n_time=args.shards, n_chan=1)
                n = len(iq) // args.shards * args.shards
                batch, block_len = sharded_extract_pdws(
                    jnp.asarray(iq[:n]), cfg, mesh,
                    strict_halo=args.strict_halo)
                merged = merge_block_batches(batch, block_len)
                pdws = finalize_pdws(merged, fs=fs, fc=fc, sample_start_time=t0)
            else:
                pipe = WidebandPdwPipeline(pdw_cfg=cfg)
                pdws = pipe.extract(jnp.asarray(iq), fs=fs, fc=fc,
                                    sample_start_time=t0)
        all_pdws.append(pdws)
        counters.add("files_processed")
        counters.add("samples_ingested", len(iq))
        counters.add("pulses_emitted", len(pdws["toa"]))
        print(f"{path}: {len(pdws['toa'])} pulses")

    merged = {k: np.concatenate([p[k] for p in all_pdws]) for k in all_pdws[0]}
    order = np.argsort(merged["toa"], kind="stable")
    merged = {k: v[order] for k, v in merged.items()}
    out = args.out or "pdw.npz"
    np.savez(out, **merged)
    print(out)
    if args.png:
        from sdr_channelizer_tpu.viz import pdw_plot_png

        pdw_plot_png(args.png, merged)
        print(args.png)
    if args.metrics:
        print(counters.to_json())
    return 0


def cmd_predict(args) -> int:
    """predict_event.m parity: per-file quadratic fits -> next-event time."""
    import jax.numpy as jnp

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp.events import EventPredictor
    from sdr_channelizer_tpu.io.convert import load_capture
    from sdr_channelizer_tpu.models import WidebandPdwPipeline

    cfg = PdwConfig.event(max_pulses=args.max_pulses,
                          max_pulse_samples=args.max_pulse_samples)
    pipe = WidebandPdwPipeline(pdw_cfg=cfg)
    pred = EventPredictor()
    base_time = None
    next_event = None
    all_toa: list = []
    all_snr: list = []
    for path in args.files:
        iq, meta = load_capture(path)
        t0 = float(meta.get("sampleStartTime", 0.0))
        if base_time is None:
            base_time = t0
        pdws = pipe.extract(jnp.asarray(iq), fs=float(meta["fs"]),
                            sample_start_time=t0 - base_time)
        nxt = pred.update(pdws["toa"], pdws["snr"],
                          max_abs_iq=float(np.max(np.abs(iq))))
        if nxt is not None:
            next_event = nxt
            # The reference plot accumulates the fitted captures' pulse
            # samples (predict_event.m:146-148) — keep them for the PNG.
            all_toa.extend(np.asarray(pdws["toa"], float).tolist())
            all_snr.extend(np.asarray(pdws["snr"], float).tolist())
            print(f"{path}: event at +{pred.events[-1]:.6f}s, "
                  f"next predicted +{nxt:.6f}s")
        else:
            print(f"{path}: gated out / too few pulses")
    if next_event is not None:
        print(f"Next event: {base_time + next_event:.6f} (epoch)")
        if args.png:
            from sdr_channelizer_tpu.viz import event_fit_png

            # Samples + per-capture fitted (t_max, y_max) + current/next
            # event — the predict_event.m:140-150 live diagnostic.
            event_fit_png(args.png, np.asarray(all_toa), np.asarray(all_snr),
                          event_time=pred.events[-1],
                          next_event_time=next_event,
                          fits=np.asarray(pred.fits, float))
    return 0


def cmd_track(args) -> int:
    """usrp_predict_event parity against the emulated radio."""
    from sdr_channelizer_tpu.capture import EmulatedRadio, EventTracker

    radio = EmulatedRadio(
        sample_rate_sps=args.rate_msps * 1e6, tone_offset_hz=args.offset_mhz * 1e6,
        pulse_width_sec=args.pw_us * 1e-6, pri_sec=args.pri_us * 1e-6,
        gain_db=args.gain_db, rel_amplitude=args.amplitude, noise_db=args.noise_db,
        scan_period_sec=args.scan_period_sec, scan_phase_sec=args.scan_phase_sec,
        scan_curvature_db_per_s2=args.scan_curvature,
    )
    tracker = EventTracker(radio=radio, dwell_sec=args.dwell_sec)
    n = int(args.duration_sec / args.dwell_sec)
    for rep in tracker.run(n):
        line = (f"t={rep.start_time:9.3f}s pulses={rep.num_pulses:4d} "
                f"gain={rep.gain_db:5.1f}dB")
        if rep.event_time is not None:
            line += f" event={rep.event_time:9.3f}s"
        if rep.next_event_time is not None:
            line += f" next={rep.next_event_time:9.3f}s"
        if rep.saturated:
            line += " SATURATED"
        print(line)
    if args.metrics:
        import json

        print(json.dumps({"tracker": tracker.counters.snapshot(),
                          "radio": radio.counters.snapshot()}, sort_keys=True))
    return 0


def cmd_txrx(args) -> int:
    """tx_rx_pulses parity: timed pulse bursts through the loopback channel,
    both sides written as .iq."""
    from sdr_channelizer_tpu.capture.txrx import TxRxSpec, run_txrx

    spec = TxRxSpec(
        sample_rate_sps=args.rate_msps * 1e6,
        chip_width_sec=args.chip_width_sec,
        pri_sec=args.pri_sec,
        duration_sec=args.duration_sec,
        barker13=args.barker13,
        frequency_hz=args.freq_mhz * 1e6,
        delay_samples=args.delay_samples,
        attenuation_db=args.attenuation_db,
        noise_std=args.noise_std,
    )
    tx_path, rx_path = run_txrx(spec, args.out_dir)
    print(tx_path)
    print(rx_path)
    return 0


def cmd_spectrogram(args) -> int:
    import jax.numpy as jnp

    from sdr_channelizer_tpu.config import SpectrogramConfig
    from sdr_channelizer_tpu.dsp.spectrogram import (
        save_png, stft_power, stft_power_packed,
    )
    from sdr_channelizer_tpu.io.convert import load_capture, load_capture_raw

    cfg = SpectrogramConfig(window_length=args.window)
    for path in args.files:
        samples, bit_width, meta = load_capture_raw(path)
        if samples is not None and samples.dtype in (np.int16, np.int8):
            # Integer .iq payload: ship the packed bytes, dequant on device
            # (same ingest as `pdw` — no host float conversion).
            samples = np.ascontiguousarray(samples)
            packed = (samples.view(np.int32) if samples.dtype == np.int16
                      else samples.view(np.int16)).ravel()
            power = np.asarray(
                stft_power_packed(jnp.asarray(packed), bit_width, cfg=cfg))
        else:
            iq, meta = load_capture(path)
            power = np.asarray(stft_power(jnp.asarray(iq), cfg=cfg))
        out = _out_path(path, args.out_dir, "_spectrogram.png")
        save_png(out, power, float(meta["fs"]), float(meta.get("fc", 0.0)),
                 cfg=cfg, title=os.path.basename(path))
        print(out)
    return 0


def cmd_plot(args) -> int:
    from sdr_channelizer_tpu.io.convert import load_capture
    from sdr_channelizer_tpu.viz import plot_iq_png

    for path in args.files:
        iq, meta = load_capture(path)
        out = _out_path(path, args.out_dir, "_iq.png")
        plot_iq_png(out, iq, float(meta["fs"]), title=os.path.basename(path))
        print(out)
    return 0


def cmd_provision(args) -> int:
    """loadFpgaA5/loadFpgaA9 parity: bladeRF FPGA bitstream + firmware load
    via bladeRF-cli (reference component #12)."""
    from sdr_channelizer_tpu.capture.hardware import (
        provision_bladerf,
        provision_bladerf_commands,
    )

    if args.dry_run:
        for cmd in provision_bladerf_commands(args.board, args.workarea):
            print(" ".join(cmd))
        return 0
    return provision_bladerf(args.board, args.workarea)


def cmd_bench(args) -> int:
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cmd = [sys.executable, os.path.join(repo, "bench.py")] + args.bench_args
    return subprocess.call(cmd)


def _add_capture_args(p, with_signal=True):
    p.add_argument("--metrics", action="store_true",
                   help="print a structured-counters JSON line at exit")
    p.add_argument("freq_mhz", type=float)
    p.add_argument("bw_mhz", type=float)
    p.add_argument("rate_msps", type=float)
    p.add_argument("gain_db", type=float)
    p.add_argument("dwell_sec", type=float)
    p.add_argument("duration_sec", type=float)
    if with_signal:
        p.add_argument("--offset-mhz", type=float, default=5.0)
        p.add_argument("--pw-us", type=float, default=100.0)
        p.add_argument("--pri-us", type=float, default=1000.0)
        p.add_argument("--noise-db", type=float, default=-60.0)
        p.add_argument("--amplitude", type=float, default=1.0)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sdr_channelizer_tpu",
        description="TPU-native wideband channelizer + pulse-detection framework",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("generate", help="write synthetic training .iq captures")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--count", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fs-msps", type=float, default=56.0)
    p.add_argument("--duration-sec", type=float, default=100e-3)
    p.add_argument("--freq-mhz", type=float, default=None,
                   help="fix the tone frequency (default: random per file)")
    p.add_argument("--pw-us", type=float, default=100.0)
    p.add_argument("--pri-us", type=float, default=1000.0)
    p.add_argument("--noise-std", type=float, default=0.0)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("record", help="emulated recorder (7-arg CLI contract)")
    _add_capture_args(p)
    p.add_argument("filter_delay", type=int, nargs="?", default=0)
    p.add_argument("--out-dir", default=".")
    p.add_argument("--bit-width", type=int, default=12)
    p.add_argument("--python-emulator", action="store_true")
    p.set_defaults(fn=cmd_record)

    p = sub.add_parser("gain-search", help="max-unsaturated-gain search")
    _add_capture_args(p)
    p.set_defaults(fn=cmd_gain_search)

    p = sub.add_parser("convert", help=".iq/.bin -> .npz or .mat")
    p.add_argument("files", nargs="+")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--mat", action="store_true")
    p.add_argument("--v73", action="store_true",
                   help="with --mat: write a v7.3 (HDF5) container like the "
                        "reference's save -v7.3")
    p.add_argument("--raw", action="store_true", help="keep integer payload")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("channelize", help="polyphase channelize + waterfall")
    p.add_argument("files", nargs="+")
    p.add_argument("--bands", type=int, default=None)
    p.add_argument("--bin-width-hz", type=float, default=1e6)
    p.add_argument("--taps-per-band", type=int, default=12)
    p.add_argument("--out", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--png", default=None, const="auto", nargs="?")
    p.add_argument("--video", default=None, nargs="?", const="auto",
                   help="assemble the windowed waterfall into an MPEG-4 "
                        "(channelizer_example.m video parity); optional "
                        "output path")
    p.add_argument("--video-fps", type=float, default=20.0)
    p.add_argument("--frames-dir", default=None,
                   help="write a waterfall PNG sequence (video parity)")
    p.add_argument("--frame-window-sec", type=float, default=5e-3)
    p.add_argument("--frame-limit", type=int, default=None)
    p.set_defaults(fn=cmd_channelize)

    p = sub.add_parser("pdw", help="extract pulse descriptor words")
    p.add_argument("files", nargs="+")
    p.add_argument("--channelized", action="store_true")
    p.add_argument("--bands", type=int, default=None)
    p.add_argument("--bin-width-hz", type=float, default=1e6)
    p.add_argument("--threshold-db", type=float, default=None)
    p.add_argument("--max-pulses", type=int, default=512)
    p.add_argument("--max-pulse-samples", type=int, default=4096)
    p.add_argument("--shards", type=int, default=1,
                   help="time-shard the extraction over this many devices "
                        "(channelized: fused per-shard kernels; wideband: "
                        "sharded latch chaining)")
    p.add_argument("--strict-halo", action="store_true",
                   help="refuse (instead of warn) when the pulse-stitching "
                        "halo does not fit the per-shard block — guarantees "
                        "sharded output == single-device output")
    p.add_argument("--stream", action="store_true",
                   help="blockwise streaming extraction over contiguous "
                        "multi-file segments (O(block) memory, exact "
                        "two-pass noise floor)")
    p.add_argument("--block-frames", type=int, default=65536,
                   help="frames per streaming block (--stream)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-block checkpoint/resume directory (--stream)")
    p.add_argument("--out", default=None)
    p.add_argument("--png", default=None)
    p.add_argument("--metrics", action="store_true",
                   help="print a structured-counters JSON line at exit")
    p.set_defaults(fn=cmd_pdw)

    p = sub.add_parser("predict", help="offline event prediction over captures")
    p.add_argument("files", nargs="+")
    p.add_argument("--max-pulses", type=int, default=512)
    p.add_argument("--max-pulse-samples", type=int, default=65536)
    p.add_argument("--png", default=None)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("track", help="closed-loop event tracker (emulated)")
    _add_capture_args(p)
    p.add_argument("--scan-period-sec", type=float, default=0.5)
    p.add_argument("--scan-phase-sec", type=float, default=0.1)
    p.add_argument("--scan-curvature", type=float, default=2000.0)
    p.set_defaults(fn=cmd_track)

    p = sub.add_parser("txrx", help="pulsed TX/RX loopback (emulated channel)")
    p.add_argument("freq_mhz", type=float)
    p.add_argument("bw_mhz", type=float)
    p.add_argument("rate_msps", type=float)
    p.add_argument("gain_db", type=float)
    p.add_argument("dwell_sec", type=float)
    p.add_argument("duration_sec", type=float)
    p.add_argument("chip_width_sec", type=float)
    p.add_argument("pri_sec", type=float)
    p.add_argument("--barker13", action="store_true")
    p.add_argument("--delay-samples", type=int, default=100)
    p.add_argument("--attenuation-db", type=float, default=20.0)
    p.add_argument("--noise-std", type=float, default=1e-3)
    p.add_argument("--out-dir", default=".")
    p.set_defaults(fn=cmd_txrx)

    p = sub.add_parser("spectrogram", help="STFT power PNG per capture")
    p.add_argument("files", nargs="+")
    p.add_argument("--window", type=int, default=768)
    p.add_argument("--out-dir", default=None)
    p.set_defaults(fn=cmd_spectrogram)

    p = sub.add_parser("plot", help="magnitude/phase PNG per capture")
    p.add_argument("files", nargs="+")
    p.add_argument("--out-dir", default=None)
    p.set_defaults(fn=cmd_plot)

    p = sub.add_parser("provision",
                       help="bladeRF FPGA/firmware provisioning (loadFpgaA5/A9)")
    p.add_argument("board", choices=["A5", "A9"])
    p.add_argument("--workarea", default="~/workarea")
    p.add_argument("--dry-run", action="store_true",
                   help="print the bladeRF-cli commands without running them")
    p.set_defaults(fn=cmd_provision)

    p = sub.add_parser("bench", help="run the repo benchmark")
    p.add_argument("bench_args", nargs="*")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)
