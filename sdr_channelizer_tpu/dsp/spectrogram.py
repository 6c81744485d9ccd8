"""Spectrogram / STFT rendering (``matlab/spectrogram_my_iq.m:114-129``).

Reference configuration: ``stft(iq, fs, 'Window', hamming(768),
'OverlapLength', 0)`` — symmetric Hamming window, zero overlap, squared
magnitude power, frequency axis centered on the tuned frequency
(``y = (f + fc) MHz``), one PNG per capture.

Zero overlap means the STFT is a plain reshape -> window -> FFT, which XLA
fuses cleanly; a DFT-as-matmul Pallas path exists for the fused int->f32
dequant + window + DFT case (window length 768 = 6*128 lanes, MXU-friendly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdr_channelizer_tpu.config import SpectrogramConfig


def hamming(length: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hamming window, MATLAB ``hamming(L)`` semantics."""
    n = np.arange(length, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (length - 1))
    return w.astype(dtype)


def stft_power(
    iq: jax.Array,
    window: Optional[jax.Array] = None,
    cfg: SpectrogramConfig = SpectrogramConfig(),
    method: str = "auto",
) -> jax.Array:
    """Squared-magnitude STFT with zero overlap.

    Returns ``(num_frames, window_length)`` float32 power, frequency axis in
    FFT-shifted (ascending, DC-centered) order to match the reference's
    'centered' display.  ``method`` follows
    :func:`dsp.channelizer.resolve_method`: the TPU path computes the DFT as
    a windowed matmul on the MXU (window folded into the DFT matrix).
    """
    from sdr_channelizer_tpu.dsp.channelizer import dft_matrix, resolve_method

    w = jnp.asarray(hamming(cfg.window_length) if window is None else window)
    length = w.shape[0]
    frames = iq.shape[-1] // length
    x = iq[..., : frames * length].reshape(*iq.shape[:-1], frames, length)
    if resolve_method(method) == "dft":
        # Complex-free windowed DFT (four real MXU matmuls) — the TPU
        # transport here cannot lower FFTs or complex matmuls.
        wm = np.asarray(dft_matrix(length, shifted=True)) * np.asarray(w)[:, None]
        wr = jnp.asarray(np.real(wm).astype(np.float32))
        wi = jnp.asarray(np.imag(wm).astype(np.float32))
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
        sr = xr @ wr - xi @ wi
        si = xr @ wi + xi @ wr
        return (sr * sr + si * si).astype(jnp.float32)
    spec = jnp.fft.fftshift(jnp.fft.fft(x * w, axis=-1), axes=-1)
    return jnp.square(jnp.abs(spec)).astype(jnp.float32)


def axes_for(
    num_frames: int, fs: float, fc: float, cfg: SpectrogramConfig = SpectrogramConfig()
) -> Tuple[np.ndarray, np.ndarray]:
    """(time_sec, freq_hz) axes; freq absolute (f + fc) ascending, as in
    ``spectrogram_my_iq.m:118-123``."""
    t = np.arange(num_frames) * cfg.window_length / fs
    f = np.fft.fftshift(np.fft.fftfreq(cfg.window_length)) * fs + fc
    return t, f


def save_png(
    path,
    power: np.ndarray,
    fs: float,
    fc: float = 0.0,
    cfg: SpectrogramConfig = SpectrogramConfig(),
    db_floor: float = -120.0,
    title: Optional[str] = None,
) -> None:
    """Render the power mesh to a PNG (parity with the reference's per-file
    PNG export, ``spectrogram_my_iq.m:129``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    power = np.asarray(power)
    t, f = axes_for(power.shape[0], fs, fc, cfg)
    db = 10.0 * np.log10(np.maximum(power, 10.0 ** (db_floor / 10.0)))
    fig, ax = plt.subplots(figsize=(10, 6), dpi=100)
    im = ax.pcolormesh(
        f * 1e-6, t * 1e3, db, shading="nearest", cmap="viridis", rasterized=True
    )
    ax.set_xlabel("Frequency (MHz)")
    ax.set_ylabel("Time (ms)")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax, label="Power (dB)")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
