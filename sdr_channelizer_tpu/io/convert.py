"""Capture conversion — the reference's MATLAB ingest scripts as library
functions.

* :func:`iq_to_npz` — ``convert_my_iq_to_mat.m`` parity: parse a versioned
  ``.iq`` file and save every header field plus the payload under the same
  variable names (``iq``, ``fs``, ``fc``, ``bw``, ``gain``, ``bitWidth``,
  ``sampleStartTime``, ...; ``convert_my_iq_to_mat.m:104-118``).  NPZ is the
  native container; ``.mat`` export is available via :func:`iq_to_mat`
  (MATLAB v5 container — readable by the reference scripts' ``load``).
* :func:`read_legacy_bin` — ``convert_iq_to_mat.m`` parity: the headerless
  float32 format with metadata encoded in the filename
  ``"<rate>M_<fc>_MHz_<n>.bin"`` (``convert_iq_to_mat.m:20-28``).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

from sdr_channelizer_tpu.io import iqpacket


def header_vars(hdr: iqpacket.IqHeader) -> dict:
    """Header fields under the reference's .mat variable names."""
    return {
        "fs": float(hdr.sample_rate_sps),
        "fc": float(hdr.frequency_hz),
        "bw": float(hdr.bandwidth_hz),
        "gain": float(hdr.rx_gain_db),
        "bitWidth": int(hdr.bit_width),
        "numSamples": int(hdr.num_samples),
        "sampleStartTime": float(hdr.sample_start_time),
        "linkSpeed": int(hdr.link_speed),
        "boardName": hdr.board_name,
        "serialNumber": hdr.serial_number,
        "fpgaVersion": hdr.fpga_version,
        "fwVersion": hdr.fw_version,
        "fileFormat": int(hdr.file_format),
    }


def iq_to_npz(iq_path, npz_path, normalize: bool = True) -> iqpacket.IqHeader:
    """Convert one ``.iq`` file to ``.npz``.

    ``normalize=True`` stores complex64 in [-1, 1) (``iq / 2^(bitWidth-1)``,
    ``create_pdws.m:30-32``); ``False`` stores the raw integer (N, 2) I/Q.
    Asserts the payload length like the reference
    (``convert_my_iq_to_mat.m:102`` — enforced inside ``read_iq``).
    """
    hdr, samples = iqpacket.read_iq(iq_path)
    arrays = header_vars(hdr)
    if normalize:
        arrays["iq"] = iqpacket.to_complex(np.asarray(samples), hdr.bit_width)
    else:
        arrays["iq_raw"] = np.asarray(samples)
    np.savez(npz_path, **arrays)
    return hdr


def iq_to_mat(iq_path, mat_path, normalize: bool = True) -> iqpacket.IqHeader:
    """Convert one ``.iq`` file to a MATLAB ``.mat`` (v5 container)."""
    from scipy.io import savemat

    hdr, samples = iqpacket.read_iq(iq_path)
    data = header_vars(hdr)
    if normalize:
        data["iq"] = iqpacket.to_complex(np.asarray(samples), hdr.bit_width)
    else:
        data["iq"] = np.asarray(samples).T  # 2 x N like the MATLAB fread
    savemat(mat_path, data)
    return hdr


_LEGACY_RE = re.compile(r"^(\d+)M_(\d+)_MHz_(\d+)\.bin$")


def read_legacy_bin(path) -> Tuple[np.ndarray, float, float, int]:
    """Read a legacy headerless capture: interleaved float32 I/Q with
    ``"<rateM>M_<fcMHz>_MHz_<index>.bin"`` filename metadata.

    Returns ``(iq complex64, fs, fc, index)``.
    """
    name = os.path.basename(os.fspath(path))
    m = _LEGACY_RE.match(name)
    if not m:
        raise ValueError(
            f"legacy filename {name!r} does not match '<rate>M_<fc>_MHz_<n>.bin'"
        )
    fs = float(m.group(1)) * 1e6
    fc = float(m.group(2)) * 1e6
    idx = int(m.group(3))
    raw = np.fromfile(os.fspath(path), dtype="<f4")
    if raw.size % 2:
        raw = raw[:-1]
    iq = raw[0::2] + 1j * raw[1::2]
    return iq.astype(np.complex64), fs, fc, idx


def load_capture(path) -> Tuple[np.ndarray, dict]:
    """Load any supported capture container -> (complex64 iq, metadata).

    Accepts ``.iq`` (versioned binary), ``.npz`` (converted), or legacy
    ``.bin`` — the three ingest paths of the reference scripts
    (``plot_my_iq.m:24-99``, ``convert_iq_to_mat.m``).
    """
    p = os.fspath(path)
    if p.endswith(".iq"):
        hdr, samples = iqpacket.read_iq(p)
        iq = iqpacket.to_complex(np.asarray(samples), hdr.bit_width)
        return iq, header_vars(hdr)
    if p.endswith(".npz"):
        z = np.load(p, allow_pickle=False)
        meta = {k: z[k].item() if z[k].ndim == 0 else z[k] for k in z.files
                if k not in ("iq", "iq_raw")}
        if "iq" in z.files:
            return np.asarray(z["iq"], np.complex64), meta
        raw = z["iq_raw"]
        return iqpacket.to_complex(raw, int(meta["bitWidth"])), meta
    if p.endswith(".bin"):
        iq, fs, fc, idx = read_legacy_bin(p)
        return iq, {"fs": fs, "fc": fc, "index": idx, "bitWidth": 32,
                    "sampleStartTime": 0.0}
    raise ValueError(f"unsupported capture container: {p}")


def load_capture_raw(path) -> Tuple[Optional[np.ndarray], int, Optional[dict]]:
    """Like :func:`load_capture` but returns the raw integer payload when
    the container has one: ``(samples (N, 2) int8/int16, bit_width,
    metadata)``, or ``(None, 0, None)`` for float containers.

    The raw payload feeds the packed-ingest fused pipeline
    (``models.ChannelizerPipeline.extract_fused``) — the on-disk bytes go
    to the device untouched and the dequant happens in-kernel, which
    halves/quarters the host->device traffic of the complex path.
    """
    p = os.fspath(path)
    if p.endswith(".iq"):
        hdr, samples = iqpacket.read_iq(p)
        return np.asarray(samples), hdr.bit_width, header_vars(hdr)
    if p.endswith(".npz"):
        z = np.load(p, allow_pickle=False)
        if "iq_raw" in z.files:
            meta = {k: z[k].item() if z[k].ndim == 0 else z[k]
                    for k in z.files if k not in ("iq", "iq_raw")}
            return np.asarray(z["iq_raw"]), int(meta["bitWidth"]), meta
    return None, 0, None
