// Max-unsaturated-gain search against the emulated receiver — the
// closed-loop algorithm of the reference's
// cpp/blade_find_max_unsaturated_gain.cpp:227-277 /
// cpp/usrp_find_max_unsaturated_gain.cpp:120-152:
//
//   receive one dwell at the current gain; if any raw sample reaches
//   >= 0.98 * full scale, decrement the gain by 1 dB and repeat; stop when
//   the total duration elapses.  Prints the per-dwell decisions and the
//   final (max unsaturated) gain.
//
//   sdr_gain_search <freqMhz> <bwMhz> <sampleRateMsps> <startGainDb>
//                   <dwellSec> <durationSec> [--amplitude F] [--noise-db F]
//                   [--offset-mhz F] [--bit-width N]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "emu_common.h"

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "Usage: %s <freqMhz> <bwMhz> <sampleRateMsps> <gainDb> "
                 "<dwellSec> <durationSec> [options]\n",
                 argv[0]);
    return 1;
  }
  const double rate_msps = std::atof(argv[3]);
  double gain_db = std::atof(argv[4]);
  const double dwell_sec = std::atof(argv[5]);
  const double duration_sec = std::atof(argv[6]);

  emu::SignalSpec sig;
  sig.sample_rate_sps = rate_msps * 1e6;
  uint32_t bit_width = 12;
  for (int i = 7; i < argc; ++i) {
    auto is = [&](const char* f) { return std::strcmp(argv[i], f) == 0; };
    if (is("--amplitude") && i + 1 < argc) sig.rel_amplitude = std::atof(argv[++i]);
    else if (is("--noise-db") && i + 1 < argc) sig.noise_db = std::atof(argv[++i]);
    else if (is("--offset-mhz") && i + 1 < argc) sig.tone_offset_hz = std::atof(argv[++i]) * 1e6;
    else if (is("--bit-width") && i + 1 < argc) bit_width = std::atoi(argv[++i]);
    else { std::fprintf(stderr, "Unknown option %s\n", argv[i]); return 1; }
  }

  const double fs = rate_msps * 1e6;
  const uint64_t dwell_n = static_cast<uint64_t>(dwell_sec * fs);
  const uint64_t n_dwells =
      dwell_sec > 0 ? static_cast<uint64_t>(duration_sec / dwell_sec) : 0;
  uint64_t abs_index = 0;
  std::vector<int16_t> buf;
  for (uint64_t d = 0; d < n_dwells; ++d) {
    const bool sat =
        emu::fill_dwell_i16(sig, gain_db, abs_index, dwell_n, bit_width, buf);
    if (sat) {
      std::printf("Dwell %llu: saturated at %.1f dB -> %.1f dB\n",
                  static_cast<unsigned long long>(d), gain_db, gain_db - 1.0);
      gain_db -= 1.0;  // the reference's 1 dB step
    } else {
      std::printf("Dwell %llu: unsaturated at %.1f dB\n",
                  static_cast<unsigned long long>(d), gain_db);
    }
    abs_index += dwell_n;
  }
  std::printf("Max unsaturated gain: %.1f dB\n", gain_db);
  return 0;
}
