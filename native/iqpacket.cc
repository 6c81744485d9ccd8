// IqPacket binary codec — native twin of sdr_channelizer_tpu/io/iqpacket.py.
//
// Parses and writes all three on-disk format versions of the reference's
// .iq container (reference cpp/IqPacket.h:9-25; versioned parse semantics
// per matlab/convert_my_iq_to_mat.m:40-98):
//   magic 0x00000000 = big-endian (assumed v2), 0x01010101 = LE v1 (u32
//   frequency + u32 gain, no spare0, 104-byte header), 0x02020202 = LE v2,
//   0x03030303 = LE v3 (f32 gain).  Payload: interleaved I,Q int8 when
//   bitWidth <= 8 else int16.
//
// Exposed as a C ABI for ctypes (sdr_channelizer_tpu/io/native.py).  The
// reader is zero-copy-friendly: parse_header returns the payload offset so
// Python can mmap the file and view the payload in place.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Normalized header, independent of on-disk version. Packed, little-endian
// host assumed (x86-64 / aarch64).
#pragma pack(push, 1)
struct IqHeaderC {
  uint32_t file_format;   // 1, 2, or 3
  uint32_t big_endian;    // payload/header byte order flag
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

enum {
  IQ_ERR_SHORT = -1,
  IQ_ERR_MAGIC = -2,
  IQ_ERR_BITWIDTH = -3,
  IQ_ERR_IO = -4,
  IQ_ERR_FORMAT = -5,
};

static uint32_t swap32(uint32_t v) { return __builtin_bswap32(v); }
static uint64_t swap64(uint64_t v) { return __builtin_bswap64(v); }

static uint32_t rd32(const uint8_t* p, bool be) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return be ? swap32(v) : v;
}

static uint64_t rd64(const uint8_t* p, bool be) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return be ? swap64(v) : v;
}

// Parse an IqPacket header from `buf`. Returns the payload byte offset
// (104 for v1, 112 for v2/v3) or a negative IQ_ERR_* code.
int iq_parse_header(const uint8_t* buf, uint64_t len, IqHeaderC* out) {
  if (len < 104) return IQ_ERR_SHORT;
  uint32_t magic = rd32(buf, false);
  bool be = false;
  uint32_t fmt;
  switch (magic) {
    case 0x00000000u: fmt = 2; be = true; break;  // acknowledged-gap default
    case 0x01010101u: fmt = 1; break;
    case 0x02020202u: fmt = 2; break;
    case 0x03030303u: fmt = 3; break;
    default: return IQ_ERR_MAGIC;
  }
  if (fmt >= 2 && len < 112) return IQ_ERR_SHORT;

  const uint8_t* p = buf + 4;
  std::memset(out, 0, sizeof(*out));
  out->file_format = fmt;
  out->big_endian = be ? 1 : 0;
  out->link_speed = rd32(p, be); p += 4;
  if (fmt == 1) {
    out->frequency_hz = rd32(p, be); p += 4;  // v1: u32 frequency
  } else {
    out->frequency_hz = rd64(p, be); p += 8;
  }
  out->bandwidth_hz = rd32(p, be); p += 4;
  out->sample_rate_sps = rd32(p, be); p += 4;
  if (fmt >= 3) {
    uint32_t g = rd32(p, be);
    std::memcpy(&out->rx_gain_db, &g, 4);
  } else {
    out->rx_gain_db = static_cast<float>(rd32(p, be));  // v<3: u32 gain
  }
  p += 4;
  out->num_samples = rd32(p, be); p += 4;
  out->bit_width = rd32(p, be); p += 4;
  if (fmt >= 2) { out->spare0 = rd32(p, be); p += 4; }
  char* strs[4] = {out->board_name, out->serial_number, out->fpga_version,
                   out->fw_version};
  for (auto* s : strs) {
    std::memcpy(s, p, 16);
    s[16] = '\0';
    p += 16;
  }
  uint64_t t = rd64(p, be);
  std::memcpy(&out->sample_start_time, &t, 8);
  p += 8;
  return static_cast<int>(p - buf);
}

// Serialize `hdr` into `buf` (>= 112 bytes). Returns header size or <0.
int iq_encode_header(const IqHeaderC* hdr, uint8_t* buf, uint64_t len) {
  uint32_t fmt = hdr->file_format;
  bool be = hdr->big_endian != 0;
  uint64_t need = (fmt == 1) ? 104 : 112;
  if (len < need) return IQ_ERR_SHORT;
  if (!be && (fmt < 1 || fmt > 3)) return IQ_ERR_FORMAT;

  auto wr32 = [&](uint8_t* p, uint32_t v) {
    if (be) v = swap32(v);
    std::memcpy(p, &v, 4);
  };
  auto wr64 = [&](uint8_t* p, uint64_t v) {
    if (be) v = swap64(v);
    std::memcpy(p, &v, 8);
  };

  uint8_t* p = buf;
  uint32_t magic = be ? 0x00000000u
                      : (fmt == 1 ? 0x01010101u
                                  : (fmt == 2 ? 0x02020202u : 0x03030303u));
  wr32(p, be ? swap32(magic) : magic); p += 4;  // magic is byte-symmetric
  wr32(p, hdr->link_speed); p += 4;
  if (fmt == 1) {
    wr32(p, static_cast<uint32_t>(hdr->frequency_hz)); p += 4;
  } else {
    wr64(p, hdr->frequency_hz); p += 8;
  }
  wr32(p, hdr->bandwidth_hz); p += 4;
  wr32(p, hdr->sample_rate_sps); p += 4;
  if (fmt >= 3) {
    uint32_t g;
    std::memcpy(&g, &hdr->rx_gain_db, 4);
    wr32(p, g);
  } else {
    wr32(p, static_cast<uint32_t>(hdr->rx_gain_db));
  }
  p += 4;
  wr32(p, hdr->num_samples); p += 4;
  wr32(p, hdr->bit_width); p += 4;
  if (fmt >= 2) { wr32(p, hdr->spare0); p += 4; }
  const char* strs[4] = {hdr->board_name, hdr->serial_number,
                         hdr->fpga_version, hdr->fw_version};
  for (auto* s : strs) {
    char tmp[16] = {0};
    size_t n = strnlen(s, 16);
    std::memcpy(tmp, s, n);
    std::memcpy(p, tmp, 16);
    p += 16;
  }
  uint64_t t;
  std::memcpy(&t, &hdr->sample_start_time, 8);
  wr64(p, t);
  p += 8;
  return static_cast<int>(p - buf);
}

// Write a complete .iq file (header + interleaved payload). `payload` points
// to num_samples*2 int8 or int16 values per bit_width. Returns 0 or <0.
int iq_write_file(const char* path, const IqHeaderC* hdr, const void* payload) {
  uint32_t bw = hdr->bit_width;
  if (bw == 0 || bw > 16) return IQ_ERR_BITWIDTH;
  uint64_t item = bw <= 8 ? 1 : 2;
  uint8_t hbuf[112];
  int hlen = iq_encode_header(hdr, hbuf, sizeof(hbuf));
  if (hlen < 0) return hlen;
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return IQ_ERR_IO;
  uint64_t nbytes = static_cast<uint64_t>(hdr->num_samples) * 2 * item;
  bool ok = std::fwrite(hbuf, 1, hlen, f) == static_cast<size_t>(hlen) &&
            (nbytes == 0 || std::fwrite(payload, 1, nbytes, f) == nbytes);
  std::fclose(f);
  return ok ? 0 : IQ_ERR_IO;
}

// Read an entire .iq file: parses the header and copies the payload into
// `payload_out` (caller-allocated, >= num_samples*2*itemsize bytes; pass
// max_samples to bound). Byte-swaps big-endian int16 payloads to host order.
// Returns number of samples read or <0.
long long iq_read_file(const char* path, IqHeaderC* hdr, void* payload_out,
                       uint64_t max_samples) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return IQ_ERR_IO;
  uint8_t hbuf[112];
  size_t got = std::fread(hbuf, 1, sizeof(hbuf), f);
  int off = iq_parse_header(hbuf, got, hdr);
  if (off < 0) { std::fclose(f); return off; }
  if (hdr->bit_width == 0 || hdr->bit_width > 16) {
    std::fclose(f);
    return IQ_ERR_BITWIDTH;
  }
  uint64_t n = hdr->num_samples;
  if (n > max_samples) { std::fclose(f); return IQ_ERR_SHORT; }
  uint64_t item = hdr->bit_width <= 8 ? 1 : 2;
  uint64_t nbytes = n * 2 * item;
  if (std::fseek(f, off, SEEK_SET) != 0 ||
      std::fread(payload_out, 1, nbytes, f) != nbytes) {
    std::fclose(f);
    return IQ_ERR_IO;
  }
  std::fclose(f);
  if (hdr->big_endian && item == 2) {
    auto* v = static_cast<uint16_t*>(payload_out);
    for (uint64_t i = 0; i < n * 2; ++i) v[i] = __builtin_bswap16(v[i]);
  }
  return static_cast<long long>(n);
}

}  // extern "C"
