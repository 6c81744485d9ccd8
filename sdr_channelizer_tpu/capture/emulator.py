"""Emulated SDR receivers.

:class:`EmulatedRadio` is the in-process stand-in for the reference's
hardware receive path (``bladerf_sync_rx`` / ``rx_stream->recv`` dwells):
a deterministic pulse-train emitter with receiver gain modeled as amplitude
scaling that clips at the ADC full scale, timed dwells (the
``STREAM_MODE_NUM_SAMPS_AND_DONE`` analog, ``usrp_record_iq_12bit.cpp:
145-149``), and an optional scanning-beam envelope so SNR-vs-time traces a
parabola around periodic events — the signal model behind
``predict_event.m``'s quadratic fit.

:class:`NativeEmulator` wraps the C++ ``sdr_record_emulator`` binary
(``native/record_emulator.cc``), which writes real ``.iq`` files with the
recorders' CLI contract.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

from sdr_channelizer_tpu.config import CaptureConfig
from sdr_channelizer_tpu.utils.metrics import Counters


@dataclasses.dataclass
class EmulatedRadio:
    """Dwell-based receive emulator with absolute-time phase continuity.

    ``receive(n, start_time=None)`` returns ``(iq, t0)``: normalized
    complex64 samples (ADC-quantized, saturating at full scale) and the
    actual dwell start epoch.  A requested ``start_time`` in the future
    fast-forwards the stream (timed dwell); ``None`` receives "now" (i.e.,
    immediately after the previous dwell).
    """

    sample_rate_sps: float = 56e6
    tone_offset_hz: float = 5e6
    pulse_width_sec: float = 100e-6
    pri_sec: float = 1e-3
    rel_amplitude: float = 1.0
    noise_db: float = -60.0
    gain_ref_db: float = 60.0
    gain_db: float = 60.0
    bit_width: int = 12
    start_epoch: float = 0.0
    seed: int = 1234
    # Scanning-beam event model: SNR(dB) falls quadratically with distance
    # from the nearest event at k*scan_period + scan_phase (0 = no scan).
    scan_period_sec: float = 0.0
    scan_phase_sec: float = 0.0
    scan_curvature_db_per_s2: float = 0.0
    # Observability (SURVEY.md section 5.5): the counters the reference
    # prints as free-form stdout (received-sample counts, overruns).
    counters: Counters = dataclasses.field(default_factory=Counters)

    def __post_init__(self):
        self._abs_index = 0
        self._rng = np.random.default_rng(self.seed)

    @property
    def full_scale(self) -> float:
        return float(2 ** (self.bit_width - 1))

    def _envelope_db(self, t: np.ndarray) -> np.ndarray:
        if self.scan_period_sec <= 0:
            return np.zeros_like(t)
        dt = (t - self.scan_phase_sec + self.scan_period_sec / 2) % self.scan_period_sec
        dt = dt - self.scan_period_sec / 2
        return -self.scan_curvature_db_per_s2 * dt * dt

    def receive(
        self, num_samples: int, start_time: Optional[float] = None
    ) -> Tuple[np.ndarray, float]:
        fs = self.sample_rate_sps
        idx = self._abs_index
        if start_time is not None:
            want = int(round((start_time - self.start_epoch) * fs))
            if want > idx:
                # Timed dwell in the future: the skipped span is data the
                # radio produced but nobody received — the emulator's
                # overrun analog (blade_record_iq_12bit.cpp:304-307).
                self.counters.add("samples_skipped", want - idx)
            idx = max(idx, want)
        k = idx + np.arange(num_samples, dtype=np.int64)
        t = k / fs
        pri_n = max(int(round(self.pri_sec * fs)), 1)
        pw_n = int(round(self.pulse_width_sec * fs))
        on = (k % pri_n) < pw_n
        if self.rel_amplitude > 0:
            amp_db = 20 * np.log10(self.rel_amplitude) + (self.gain_db - self.gain_ref_db)
            amp = 10.0 ** ((amp_db + self._envelope_db(t)) / 20.0)
        else:
            amp = np.zeros_like(t)
        ph = 2 * np.pi * self.tone_offset_hz / fs * (k % pri_n)
        sig = np.where(on, amp * np.exp(1j * ph), 0.0)
        nstd = 10.0 ** ((self.noise_db + self.gain_db - self.gain_ref_db) / 20.0)
        noise = nstd * (
            self._rng.standard_normal(num_samples)
            + 1j * self._rng.standard_normal(num_samples)
        ) / np.sqrt(2)
        raw = (sig + noise) * self.full_scale
        # ADC quantization with saturation (int16-style clip at full scale).
        fsc = self.full_scale
        i = np.clip(np.round(raw.real), -fsc, fsc - 1)
        q = np.clip(np.round(raw.imag), -fsc, fsc - 1)
        iq = ((i + 1j * q) / fsc).astype(np.complex64)
        ri, rq = np.round(raw.real), np.round(raw.imag)
        clipped = int(np.sum((ri > fsc - 1) | (ri < -fsc) | (rq > fsc - 1) | (rq < -fsc)))
        self.counters.add("dwells_received")
        self.counters.add("samples_received", num_samples)
        if clipped:
            self.counters.add("saturated_samples", clipped)
        self._abs_index = idx + num_samples
        return iq, self.start_epoch + idx / fs


@dataclasses.dataclass
class NativeEmulator:
    """Driver for the C++ ``sdr_record_emulator`` binary.

    Runs the 7-positional-argument CLI (``blade_record_iq_12bit.cpp:33-48``
    contract) and returns the paths of the ``.iq`` dwell files it wrote.
    """

    binary: str = ""
    extra_args: Sequence[str] = ()

    def __post_init__(self):
        if not self.binary:
            repo = os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            self.binary = os.path.join(repo, "native", "build", "sdr_record_emulator")

    def available(self) -> bool:
        return os.path.exists(self.binary)

    def record(self, cfg: CaptureConfig, out_dir: str, **signal_kwargs) -> list:
        args = [
            self.binary,
            str(cfg.frequency_mhz),
            str(cfg.bandwidth_mhz),
            str(cfg.sample_rate_msps),
            str(cfg.rx_gain_db),
            str(cfg.dwell_sec),
            str(cfg.duration_sec),
            str(cfg.filter_delay_samples),
            "--out-dir", out_dir,
            "--bit-width", str(cfg.bit_width),
        ]
        for key, val in signal_kwargs.items():
            args += [f"--{key.replace('_', '-')}", str(val)]
        args += list(self.extra_args)
        before = set(os.listdir(out_dir))
        subprocess.run(args, check=True, capture_output=True)
        new = sorted(set(os.listdir(out_dir)) - before)
        return [os.path.join(out_dir, f) for f in new if f.endswith(".iq")]
