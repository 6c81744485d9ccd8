// Shared signal synthesis for the capture emulator + gain search binaries.
//
// Stands in for the SDR hardware behind the reference recorders' dwell loop
// (reference cpp/usrp_record_iq_12bit.cpp:184-231): a deterministic pulse
// train (tone offset / PW / PRI) plus Gaussian noise, phase-continuous
// across dwells via the absolute sample index, with receiver gain modeled
// as amplitude scaling that clips (saturates) at the quantizer full scale.

#pragma once

#include <cmath>
#include <cstdint>
#include <vector>

namespace emu {

struct SignalSpec {
  double sample_rate_sps = 56e6;
  double tone_offset_hz = 5e6;    // baseband tone frequency
  double pulse_width_sec = 100e-6;
  double pri_sec = 1e-3;
  double rel_amplitude = 1.0;     // emitter amplitude at reference gain
  double noise_db = -60.0;        // noise power rel. full scale (dB)
  double gain_ref_db = 60.0;      // gain at which rel_amplitude hits full scale
  uint64_t seed = 0x5DEECE66Dull;
};

// xorshift64* PRNG — deterministic, seedable, no libc state.
inline uint64_t next_rand(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1Dull;
}

inline double uniform01(uint64_t& s) {
  return static_cast<double>(next_rand(s) >> 11) * (1.0 / 9007199254740992.0);
}

// One complex sample of the emulated receiver at absolute index n.
// Returns (i, q) in full-scale units [-1, 1] before clipping.
inline void sample_at(const SignalSpec& sig, double gain_db, uint64_t n,
                      uint64_t& rng, double& i, double& q) {
  const double amp =
      sig.rel_amplitude * std::pow(10.0, (gain_db - sig.gain_ref_db) / 20.0);
  const uint64_t pri_n =
      static_cast<uint64_t>(sig.pri_sec * sig.sample_rate_sps);
  const uint64_t pw_n =
      static_cast<uint64_t>(sig.pulse_width_sec * sig.sample_rate_sps);
  const bool on = pri_n == 0 || (n % pri_n) < pw_n;
  double si = 0.0, sq = 0.0;
  if (on) {
    const double ph =
        2.0 * M_PI * sig.tone_offset_hz / sig.sample_rate_sps *
        static_cast<double>(n % (pri_n ? pri_n : 1));
    si = amp * std::cos(ph);
    sq = amp * std::sin(ph);
  }
  // Box-Muller noise at noise_db relative to full scale (also gain-scaled).
  const double nstd = std::pow(10.0, (sig.noise_db + gain_db - sig.gain_ref_db) / 20.0);
  if (nstd > 0.0) {
    double u1 = uniform01(rng), u2 = uniform01(rng);
    if (u1 < 1e-300) u1 = 1e-300;
    const double r = std::sqrt(-2.0 * std::log(u1)) * nstd * M_SQRT1_2;
    si += r * std::cos(2.0 * M_PI * u2);
    sq += r * std::sin(2.0 * M_PI * u2);
  }
  i = si;
  q = sq;
}

// Fill an interleaved int16 dwell buffer; returns true if any raw sample
// reached >= sat_frac of full scale (the reference's saturation test,
// cpp/blade_find_max_unsaturated_gain.cpp:266-274).
inline bool fill_dwell_i16(const SignalSpec& sig, double gain_db,
                           uint64_t start_index, uint64_t nsamp,
                           uint32_t bit_width, std::vector<int16_t>& out,
                           double sat_frac = 0.98) {
  out.resize(nsamp * 2);
  const double fs = static_cast<double>(1 << (bit_width - 1));
  const double sat = sat_frac * fs;
  uint64_t rng = sig.seed ^ (start_index * 0x9E3779B97F4A7C15ull + 1);
  bool saturated = false;
  for (uint64_t k = 0; k < nsamp; ++k) {
    double i, q;
    sample_at(sig, gain_db, start_index + k, rng, i, q);
    double ri = i * fs, rq = q * fs;
    if (std::fabs(ri) >= sat || std::fabs(rq) >= sat) saturated = true;
    const double lo = -fs, hi = fs - 1;
    ri = ri < lo ? lo : (ri > hi ? hi : ri);
    rq = rq < lo ? lo : (rq > hi ? hi : rq);
    out[2 * k] = static_cast<int16_t>(std::lround(ri));
    out[2 * k + 1] = static_cast<int16_t>(std::lround(rq));
  }
  return saturated;
}

inline bool fill_dwell_i8(const SignalSpec& sig, double gain_db,
                          uint64_t start_index, uint64_t nsamp,
                          uint32_t bit_width, std::vector<int8_t>& out,
                          double sat_frac = 0.98) {
  std::vector<int16_t> tmp;
  bool sat = fill_dwell_i16(sig, gain_db, start_index, nsamp, bit_width, tmp,
                            sat_frac);
  out.resize(nsamp * 2);
  for (uint64_t k = 0; k < nsamp * 2; ++k)
    out[k] = static_cast<int8_t>(tmp[k]);
  return sat;
}

}  // namespace emu
