// Capture-emulator recorder — the reference recorders' CLI contract without
// hardware (reference cpp/usrp_record_iq_12bit.cpp:24-30 argument order,
// cpp/blade_record_iq_12bit.cpp:287-325 dwell loop):
//
//   sdr_record_emulator <freqMhz> <bwMhz> <sampleRateMsps> <gainDb>
//                       <dwellSec> <durationSec> <filter delay> [options]
//
// Per dwell it synthesizes `dwell*fs + filterDelay` samples from the
// deterministic emitter in emu_common.h, trims the leading filterDelay
// samples (the recorders' filter-delay trim, blade_record_iq_12bit.cpp:314),
// and writes one v3 .iq file named by the UTC-millisecond convention
// (cpp/Helper.cpp:6-23).  Incomplete dwells would be dropped, not written —
// the reference's drop-don't-corrupt policy; the emulator never produces
// them but the branch is kept.  Prints per-dwell progress and an exit
// summary (received counts / overruns) like the recorders do.
//
// Options (beyond the 7-arg contract):
//   --out-dir D       output directory (default .)
//   --bit-width N     8, 12, or 16 (default 12 — SC16_Q11-style int16/2048)
//   --offset-mhz F    emitter tone offset from center (default 5.0)
//   --pw-us F         emitter pulse width (default 100)
//   --pri-us F        emitter PRI (default 1000)
//   --amplitude F     emitter relative amplitude (default 1.0)
//   --noise-db F      noise level dBFS (default -60)
//   --start-epoch F   deterministic start time instead of wall clock
//   --realtime        sleep each dwell (default: as fast as possible)

#include <chrono>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "emu_common.h"

extern "C" {
struct IqHeaderC;
int iq_filename_utc(double epoch_sec, char* buf, uint64_t len);
}

// Local mirror of the codec header (kept in sync with iqpacket.cc).
#pragma pack(push, 1)
struct IqHeaderC {
  uint32_t file_format;
  uint32_t big_endian;
  uint32_t link_speed;
  uint64_t frequency_hz;
  uint32_t bandwidth_hz;
  uint32_t sample_rate_sps;
  float rx_gain_db;
  uint32_t num_samples;
  uint32_t bit_width;
  uint32_t spare0;
  char board_name[17];
  char serial_number[17];
  char fpga_version[17];
  char fw_version[17];
  double sample_start_time;
};
#pragma pack(pop)

extern "C" int iq_write_file(const char* path, const IqHeaderC* hdr,
                             const void* payload);

int main(int argc, char** argv) {
  if (argc < 8) {
    std::fprintf(stderr,
                 "Usage: %s <freqMhz> <bwMhz> <sampleRateMsps> <gainDb> "
                 "<dwellSec> <durationSec> <filter delay> [options]\n",
                 argv[0]);
    return 1;
  }
  const double freq_mhz = std::atof(argv[1]);
  const double bw_mhz = std::atof(argv[2]);
  const double rate_msps = std::atof(argv[3]);
  double gain_db = std::atof(argv[4]);
  const double dwell_sec = std::atof(argv[5]);
  const double duration_sec = std::atof(argv[6]);
  const uint64_t filter_delay = std::strtoull(argv[7], nullptr, 10);

  std::string out_dir = ".";
  uint32_t bit_width = 12;
  bool realtime = false;
  double start_epoch = -1.0;
  emu::SignalSpec sig;
  sig.sample_rate_sps = rate_msps * 1e6;
  for (int i = 8; i < argc; ++i) {
    auto is = [&](const char* f) { return std::strcmp(argv[i], f) == 0; };
    if (is("--out-dir") && i + 1 < argc) out_dir = argv[++i];
    else if (is("--bit-width") && i + 1 < argc) bit_width = std::atoi(argv[++i]);
    else if (is("--offset-mhz") && i + 1 < argc) sig.tone_offset_hz = std::atof(argv[++i]) * 1e6;
    else if (is("--pw-us") && i + 1 < argc) sig.pulse_width_sec = std::atof(argv[++i]) * 1e-6;
    else if (is("--pri-us") && i + 1 < argc) sig.pri_sec = std::atof(argv[++i]) * 1e-6;
    else if (is("--amplitude") && i + 1 < argc) sig.rel_amplitude = std::atof(argv[++i]);
    else if (is("--noise-db") && i + 1 < argc) sig.noise_db = std::atof(argv[++i]);
    else if (is("--start-epoch") && i + 1 < argc) start_epoch = std::atof(argv[++i]);
    else if (is("--realtime")) realtime = true;
    else { std::fprintf(stderr, "Unknown option %s\n", argv[i]); return 1; }
  }

  const double fs = rate_msps * 1e6;
  const uint64_t dwell_n = static_cast<uint64_t>(dwell_sec * fs);
  if (start_epoch < 0) {
    start_epoch = std::chrono::duration<double>(
                      std::chrono::system_clock::now().time_since_epoch())
                      .count();
  }

  IqHeaderC hdr{};
  hdr.file_format = 3;
  hdr.link_speed = 5000;  // emulated SuperSpeed
  hdr.frequency_hz = static_cast<uint64_t>(freq_mhz * 1e6);
  hdr.bandwidth_hz = static_cast<uint32_t>(bw_mhz * 1e6);
  hdr.sample_rate_sps = static_cast<uint32_t>(fs);
  hdr.rx_gain_db = static_cast<float>(gain_db);
  hdr.bit_width = bit_width;
  std::snprintf(hdr.board_name, sizeof(hdr.board_name), "emulated");
  std::snprintf(hdr.serial_number, sizeof(hdr.serial_number), "emu0");
  std::snprintf(hdr.fpga_version, sizeof(hdr.fpga_version), "0.0.0");
  std::snprintf(hdr.fw_version, sizeof(hdr.fw_version), "0.0.0");

  uint64_t abs_index = 0;
  uint64_t dwells = 0, overruns = 0;
  uint64_t total_received = 0;
  std::vector<int16_t> buf16;
  std::vector<int8_t> buf8;
  const uint64_t n_dwells =
      dwell_sec > 0 ? static_cast<uint64_t>(duration_sec / dwell_sec) : 0;

  for (uint64_t d = 0; d < n_dwells; ++d) {
    const double t0 = start_epoch + static_cast<double>(abs_index) / fs;
    const uint64_t req_n = dwell_n + filter_delay;
    const void* payload;
    if (bit_width <= 8) {
      emu::fill_dwell_i8(sig, gain_db, abs_index, req_n, bit_width, buf8);
      payload = buf8.data() + 2 * filter_delay;
    } else {
      emu::fill_dwell_i16(sig, gain_db, abs_index, req_n, bit_width, buf16);
      payload = buf16.data() + 2 * filter_delay;
    }
    const uint64_t received = req_n;  // the emulated radio never drops
    total_received += received;
    if (received == req_n) {  // full dwell: write; else drop (never corrupt)
      hdr.num_samples = static_cast<uint32_t>(received - filter_delay);
      hdr.sample_start_time =
          t0 + static_cast<double>(filter_delay) / fs;  // delay-corrected TOA
      char name[96];
      iq_filename_utc(hdr.sample_start_time, name, sizeof(name));
      std::string path = out_dir + "/" + name;
      int rc = iq_write_file(path.c_str(), &hdr, payload);
      if (rc != 0) {
        std::fprintf(stderr, "write failed (%d): %s\n", rc, path.c_str());
        return 2;
      }
      std::printf("Received %" PRIu64 " samples -> %s\n", received, name);
    }
    abs_index += req_n;
    ++dwells;
    if (realtime) {
      std::this_thread::sleep_for(std::chrono::duration<double>(dwell_sec));
    }
  }
  std::printf("Dwells: %" PRIu64 "  Samples: %" PRIu64 "  Overruns: %" PRIu64
              "\n",
              dwells, total_received, overruns);
  return 0;
}
