// Native DICOM reader for the data pipeline.
//
// Replaces the reference's pydicom dependency (/root/reference/dataset.py:4,
// 93-112,162-180) with a small C++ parser exposed over a C ABI (ctypes).
// Scope: DICOM Part 10 files with uncompressed ("native") pixel data in
// Explicit or Implicit VR Little Endian — the format mammography exports in
// this pipeline use.  Extracted fields mirror exactly what the reference
// reads: Rows, Columns, BitsStored, PixelRepresentation, PatientID,
// PatientAge ('dddY'), ImageLaterality, PixelData.
//
// Build:  g++ -O2 -shared -fPIC -o libmcgmil_dicom.so dicom.cc
// The Python wrapper (montecarlo_gated_mil_tpu/data/dicom_native.py) builds
// this lazily if the shared object is missing.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct DicomResult {
  // Pixel data (owned by this struct; release with mcgmil_dicom_free).
  uint8_t* pixels;        // raw little-endian samples
  uint64_t pixel_bytes;   // size of `pixels`
  uint32_t rows;
  uint32_t cols;
  uint32_t bits_allocated;  // 8 or 16
  uint32_t bits_stored;
  uint32_t pixel_representation;  // 0 unsigned, 1 signed
  char patient_id[65];
  char patient_age[17];  // e.g. "042Y"
  char laterality[17];   // e.g. "L" / "R"
  char error[128];       // empty on success
};

}  // extern "C"

namespace {

constexpr uint16_t kGroupPixel = 0x7FE0;
constexpr uint16_t kElemPixelData = 0x0010;

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t off = 0;

  bool have(size_t k) const { return off + k <= n; }
  uint16_t u16() {
    uint16_t v = static_cast<uint16_t>(p[off]) |
                 (static_cast<uint16_t>(p[off + 1]) << 8);
    off += 2;
    return v;
  }
  uint32_t u32() {
    uint32_t v = static_cast<uint32_t>(p[off]) |
                 (static_cast<uint32_t>(p[off + 1]) << 8) |
                 (static_cast<uint32_t>(p[off + 2]) << 16) |
                 (static_cast<uint32_t>(p[off + 3]) << 24);
    off += 4;
    return v;
  }
};

bool is_short_vr(const char vr[2]) {
  // VRs with 2-byte length in explicit encoding; everything else
  // (OB, OW, OF, SQ, UT, UN, ...) uses 4-byte length after 2 reserved bytes.
  static const char* kShort[] = {"AE", "AS", "AT", "CS", "DA", "DS", "DT",
                                 "FL", "FD", "IS", "LO", "LT", "PN", "SH",
                                 "SL", "SS", "ST", "TM", "UI", "UL", "US"};
  for (const char* s : kShort) {
    if (vr[0] == s[0] && vr[1] == s[1]) return true;
  }
  return false;
}

bool looks_like_vr(uint8_t a, uint8_t b) {
  return a >= 'A' && a <= 'Z' && b >= 'A' && b <= 'Z';
}

void copy_trimmed(char* dst, size_t cap, const uint8_t* src, size_t len) {
  while (len > 0 && (src[len - 1] == ' ' || src[len - 1] == '\0')) --len;
  size_t start = 0;
  while (start < len && src[start] == ' ') ++start;
  size_t k = len - start;
  if (k >= cap) k = cap - 1;
  memcpy(dst, src + start, k);
  dst[k] = '\0';
}

uint32_t parse_uint_value(const uint8_t* data, size_t len, bool is_us) {
  if (is_us && len >= 2) {
    return static_cast<uint32_t>(data[0]) | (static_cast<uint32_t>(data[1]) << 8);
  }
  // IS (integer string) fallback
  char buf[32] = {0};
  size_t k = len < 31 ? len : 31;
  memcpy(buf, data, k);
  return static_cast<uint32_t>(strtoul(buf, nullptr, 10));
}

}  // namespace

extern "C" {

// Parse the file at `path`. Returns 0 on success, nonzero on error (with
// result->error filled). Caller must call mcgmil_dicom_free on success.
int mcgmil_dicom_read(const char* path, DicomResult* result) {
  memset(result, 0, sizeof(*result));
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(result->error, sizeof(result->error), "cannot open %s", path);
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 132 + 8) {
    fclose(f);
    snprintf(result->error, sizeof(result->error), "file too small");
    return 2;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    snprintf(result->error, sizeof(result->error), "short read");
    return 3;
  }
  fclose(f);

  Cursor c{buf.data(), buf.size()};
  // 128-byte preamble + "DICM"; tolerate raw streams without it.
  if (memcmp(buf.data() + 128, "DICM", 4) == 0) {
    c.off = 132;
  }

  bool explicit_vr = true;
  bool vr_decided = false;

  while (c.have(8)) {
    uint16_t group = c.u16();
    uint16_t elem = c.u16();
    if (!vr_decided && group != 0x0002) {
      // First non-meta element decides the transfer syntax encoding.
      explicit_vr = looks_like_vr(c.p[c.off], c.p[c.off + 1]);
      vr_decided = true;
    }
    char vr[3] = {0, 0, 0};
    uint64_t len;
    bool elem_explicit = explicit_vr || group == 0x0002;
    if (elem_explicit) {
      vr[0] = static_cast<char>(c.p[c.off]);
      vr[1] = static_cast<char>(c.p[c.off + 1]);
      c.off += 2;
      if (is_short_vr(vr)) {
        if (!c.have(2)) break;
        len = c.u16();
      } else {
        if (!c.have(6)) break;
        c.off += 2;  // reserved
        len = c.u32();
      }
    } else {
      if (!c.have(4)) break;
      len = c.u32();
    }

    if (group == kGroupPixel && elem == kElemPixelData) {
      if (len == 0xFFFFFFFFu) {
        snprintf(result->error, sizeof(result->error),
                 "encapsulated (compressed) pixel data unsupported");
        return 4;
      }
      if (!c.have(len)) {
        snprintf(result->error, sizeof(result->error), "truncated pixel data");
        return 5;
      }
      result->pixels = static_cast<uint8_t*>(malloc(len));
      if (!result->pixels) {
        snprintf(result->error, sizeof(result->error), "alloc failed");
        return 6;
      }
      memcpy(result->pixels, c.p + c.off, len);
      result->pixel_bytes = len;
      c.off += len;
      continue;
    }

    if (len == 0xFFFFFFFFu) {
      // Undefined-length sequence: skip item-by-item until the sequence
      // delimiter (FFFE,E0DD).
      while (c.have(8)) {
        uint16_t g2 = c.u16();
        uint16_t e2 = c.u16();
        uint32_t l2 = c.u32();
        if (g2 == 0xFFFE && e2 == 0xE0DD) break;
        if (g2 == 0xFFFE && (e2 == 0xE000 || e2 == 0xE00D)) {
          if (l2 != 0xFFFFFFFFu) c.off += l2;
          continue;
        }
        if (l2 != 0xFFFFFFFFu) c.off += l2;
      }
      continue;
    }
    if (!c.have(len)) break;
    const uint8_t* data = c.p + c.off;

    if (group == 0x0028) {
      bool is_us = !elem_explicit || (vr[0] == 'U' && vr[1] == 'S');
      switch (elem) {
        case 0x0010: result->rows = parse_uint_value(data, len, is_us); break;
        case 0x0011: result->cols = parse_uint_value(data, len, is_us); break;
        case 0x0100: result->bits_allocated = parse_uint_value(data, len, is_us); break;
        case 0x0101: result->bits_stored = parse_uint_value(data, len, is_us); break;
        case 0x0103: result->pixel_representation = parse_uint_value(data, len, is_us); break;
        default: break;
      }
    } else if (group == 0x0010) {
      if (elem == 0x0020) copy_trimmed(result->patient_id, sizeof(result->patient_id), data, len);
      if (elem == 0x1010) copy_trimmed(result->patient_age, sizeof(result->patient_age), data, len);
    } else if (group == 0x0020 && elem == 0x0062) {
      copy_trimmed(result->laterality, sizeof(result->laterality), data, len);
    }
    c.off += len;
  }

  if (!result->pixels) {
    snprintf(result->error, sizeof(result->error), "no PixelData element");
    return 7;
  }
  if (result->rows == 0 || result->cols == 0) {
    free(result->pixels);
    result->pixels = nullptr;
    snprintf(result->error, sizeof(result->error), "missing Rows/Columns");
    return 8;
  }
  if (result->bits_allocated == 0) result->bits_allocated = 16;
  if (result->bits_stored == 0) result->bits_stored = result->bits_allocated;
  uint64_t expect =
      static_cast<uint64_t>(result->rows) * result->cols * (result->bits_allocated / 8);
  if (result->pixel_bytes < expect) {
    free(result->pixels);
    result->pixels = nullptr;
    snprintf(result->error, sizeof(result->error),
             "pixel data smaller than Rows*Cols (%llu < %llu)",
             static_cast<unsigned long long>(result->pixel_bytes),
             static_cast<unsigned long long>(expect));
    return 9;
  }
  return 0;
}

void mcgmil_dicom_free(DicomResult* result) {
  if (result && result->pixels) {
    free(result->pixels);
    result->pixels = nullptr;
  }
}

}  // extern "C"
