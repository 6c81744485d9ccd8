// Timestamped-filename helper — native twin of the reference's
// cpp/Helper.cpp:6-23: UTC millisecond-precision capture filenames
// "%04d_%02d_%02d_%02d_%02d_%02d_%03d.iq".

#include <cstdint>
#include <cstdio>
#include <ctime>

extern "C" {

// Format the UTC filename for a capture starting at `epoch_sec` (fractional
// UNIX seconds) into buf. Returns chars written (excl. NUL) or <0.
int iq_filename_utc(double epoch_sec, char* buf, uint64_t len) {
  time_t secs = static_cast<time_t>(epoch_sec);
  int millis = static_cast<int>((epoch_sec - static_cast<double>(secs)) * 1e3);
  if (millis < 0) { millis += 1000; secs -= 1; }
  struct tm tmv;
  if (!gmtime_r(&secs, &tmv)) return -1;
  int n = std::snprintf(buf, len, "%04d_%02d_%02d_%02d_%02d_%02d_%03d.iq",
                        tmv.tm_year + 1900, tmv.tm_mon + 1, tmv.tm_mday,
                        tmv.tm_hour, tmv.tm_min, tmv.tm_sec, millis);
  return (n > 0 && static_cast<uint64_t>(n) < len) ? n : -1;
}

}  // extern "C"
