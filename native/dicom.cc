// Native DICOM reader for the data pipeline.
//
// Replaces the reference's pydicom dependency (/root/reference/dataset.py:4,
// 93-112,162-180) with a small C++ parser exposed over a C ABI (ctypes).
// Scope: DICOM Part 10 files with uncompressed ("native") pixel data in
// Explicit or Implicit VR Little Endian — the format mammography exports in
// this pipeline use — plus RLE Lossless (1.2.840.10008.1.2.5, PS3.5 Annex
// G), a transfer syntax common in clinical archives.  Other compressed
// syntaxes (JPEG family) fail with an error NAMING the TransferSyntaxUID so
// the gap is diagnosable (pydicom would decode those,
// /root/reference/dataset.py:93-112).  Extracted fields mirror exactly what
// the reference reads: Rows, Columns, BitsStored, PixelRepresentation,
// PatientID, PatientAge ('dddY'), ImageLaterality, PixelData.
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
  char transfer_syntax[65];  // (0002,0010) UID, empty if absent
  char error[256];       // empty on success
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

const char* syntax_name(const char* uid) {
  // Human names for the transfer syntaxes a clinical archive is likely to
  // hand us, so the unsupported-syntax error reads like pydicom's would.
  static const struct { const char* uid; const char* name; } kKnown[] = {
      {"1.2.840.10008.1.2", "Implicit VR Little Endian"},
      {"1.2.840.10008.1.2.1", "Explicit VR Little Endian"},
      {"1.2.840.10008.1.2.1.99", "Deflated Explicit VR Little Endian"},
      {"1.2.840.10008.1.2.2", "Explicit VR Big Endian"},
      {"1.2.840.10008.1.2.4.50", "JPEG Baseline (Process 1)"},
      {"1.2.840.10008.1.2.4.51", "JPEG Extended (Process 2&4)"},
      {"1.2.840.10008.1.2.4.57", "JPEG Lossless (Process 14)"},
      {"1.2.840.10008.1.2.4.70", "JPEG Lossless SV1 (Process 14)"},
      {"1.2.840.10008.1.2.4.80", "JPEG-LS Lossless"},
      {"1.2.840.10008.1.2.4.81", "JPEG-LS Near-Lossless"},
      {"1.2.840.10008.1.2.4.90", "JPEG 2000 Lossless"},
      {"1.2.840.10008.1.2.4.91", "JPEG 2000"},
      {"1.2.840.10008.1.2.5", "RLE Lossless"},
  };
  for (const auto& k : kKnown) {
    if (strcmp(uid, k.uid) == 0) return k.name;
  }
  return "unrecognized transfer syntax";
}

// PackBits-decode one RLE segment (DICOM PS3.5 Annex G.3.1) into the byte
// plane `plane_index` of little-endian composite samples in `out`.
// Segment 0 holds the MOST significant byte of each sample.
bool rle_decode_segment(const uint8_t* seg, size_t seg_len, uint8_t* out,
                        size_t npix, uint32_t bytes_per_sample,
                        uint32_t plane_index) {
  const size_t lane = bytes_per_sample - 1 - plane_index;  // LE byte offset
  size_t i = 0, w = 0;
  while (i < seg_len && w < npix) {
    uint8_t n = seg[i++];
    if (n <= 127) {  // literal run of n+1 bytes
      size_t k = static_cast<size_t>(n) + 1;
      if (i + k > seg_len) return false;
      if (w + k > npix) k = npix - w;
      for (size_t j = 0; j < k; ++j) {
        out[(w + j) * bytes_per_sample + lane] = seg[i + j];
      }
      i += static_cast<size_t>(n) + 1;
      w += k;
    } else if (n >= 129) {  // replicate next byte 257-n times
      if (i >= seg_len) return false;
      size_t k = 257 - static_cast<size_t>(n);
      uint8_t v = seg[i++];
      if (w + k > npix) k = npix - w;
      for (size_t j = 0; j < k; ++j) {
        out[(w + j) * bytes_per_sample + lane] = v;
      }
      w += k;
    }  // n == 128: no-op per Annex G
  }
  return w == npix;
}

// Decode one RLE frame (64-byte header: u32 segment count + 15 u32 segment
// offsets from the start of the frame) into `out` (npix little-endian
// samples of `bytes_per_sample` bytes).
bool rle_decode_frame(const uint8_t* frame, size_t frame_len, uint8_t* out,
                      size_t npix, uint32_t bytes_per_sample, char* err,
                      size_t err_cap) {
  if (frame_len < 64) {
    snprintf(err, err_cap, "RLE frame shorter than its 64-byte header");
    return false;
  }
  auto u32at = [&](size_t off) {
    return static_cast<uint32_t>(frame[off]) |
           (static_cast<uint32_t>(frame[off + 1]) << 8) |
           (static_cast<uint32_t>(frame[off + 2]) << 16) |
           (static_cast<uint32_t>(frame[off + 3]) << 24);
  };
  uint32_t nseg = u32at(0);
  if (nseg != bytes_per_sample) {
    snprintf(err, err_cap,
             "RLE segment count %u != %u bytes/sample (only 1 sample/pixel "
             "grayscale is supported)",
             nseg, bytes_per_sample);
    return false;
  }
  for (uint32_t s = 0; s < nseg; ++s) {
    uint64_t start = u32at(4 + 4 * s);
    uint64_t end = (s + 1 < nseg) ? u32at(4 + 4 * (s + 1)) : frame_len;
    if (start < 64 || end > frame_len || start > end) {
      snprintf(err, err_cap, "RLE segment %u offsets out of range", s);
      return false;
    }
    if (!rle_decode_segment(frame + start, end - start, out, npix,
                            bytes_per_sample, s)) {
      snprintf(err, err_cap,
               "RLE segment %u truncated (decoded fewer than Rows*Cols "
               "samples)",
               s);
      return false;
    }
  }
  return true;
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
      // The meta group is over; syntaxes that re-encode the whole main
      // dataset can't be parsed element-by-element — say which one this is.
      if (strcmp(result->transfer_syntax, "1.2.840.10008.1.2.1.99") == 0 ||
          strcmp(result->transfer_syntax, "1.2.840.10008.1.2.2") == 0) {
        snprintf(result->error, sizeof(result->error),
                 "unsupported transfer syntax %s (%s)",
                 result->transfer_syntax, syntax_name(result->transfer_syntax));
        return 4;
      }
      // First non-meta element decides the VR encoding.
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
        // Encapsulated pixel data: items (FFFE,E000) — the Basic Offset
        // Table first, then one fragment per frame (PS3.5 A.4; RLE requires
        // exactly one fragment per frame, and mammography exports are
        // single-frame, so the first fragment is the image).
        if (strcmp(result->transfer_syntax, "1.2.840.10008.1.2.5") != 0) {
          snprintf(result->error, sizeof(result->error),
                   "encapsulated pixel data in unsupported transfer syntax "
                   "%s (%s); only RLE Lossless (1.2.840.10008.1.2.5) and "
                   "uncompressed little-endian are supported",
                   result->transfer_syntax[0] ? result->transfer_syntax
                                              : "(missing 0002,0010)",
                   syntax_name(result->transfer_syntax));
          return 4;
        }
        if (result->rows == 0 || result->cols == 0) {
          snprintf(result->error, sizeof(result->error),
                   "RLE pixel data precedes Rows/Columns");
          return 4;
        }
        uint32_t bps = (result->bits_allocated ? result->bits_allocated : 16) / 8;
        if (bps < 1 || bps > 2) {
          snprintf(result->error, sizeof(result->error),
                   "RLE with BitsAllocated %u unsupported",
                   result->bits_allocated);
          return 4;
        }
        size_t npix = static_cast<size_t>(result->rows) * result->cols;
        size_t item_index = 0;
        while (c.have(8)) {
          uint16_t g2 = c.u16();
          uint16_t e2 = c.u16();
          uint32_t l2 = c.u32();
          if (g2 == 0xFFFE && e2 == 0xE0DD) break;
          if (g2 != 0xFFFE || e2 != 0xE000 || !c.have(l2)) {
            if (result->pixels) { free(result->pixels); result->pixels = nullptr; }
            snprintf(result->error, sizeof(result->error),
                     "malformed encapsulated pixel-data item");
            return 4;
          }
          if (item_index++ > 0 && !result->pixels) {  // first fragment
            result->pixels = static_cast<uint8_t*>(malloc(npix * bps));
            if (!result->pixels) {
              snprintf(result->error, sizeof(result->error), "alloc failed");
              return 6;
            }
            char err[128] = {0};
            if (!rle_decode_frame(c.p + c.off, l2, result->pixels, npix, bps,
                                  err, sizeof(err))) {
              free(result->pixels);
              result->pixels = nullptr;
              snprintf(result->error, sizeof(result->error), "%s", err);
              return 4;
            }
            result->pixel_bytes = npix * bps;
          }
          c.off += l2;
        }
        if (!result->pixels) {
          snprintf(result->error, sizeof(result->error),
                   "encapsulated pixel data held no fragment");
          return 4;
        }
        continue;
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

    if (group == 0x0002 && elem == 0x0010) {
      copy_trimmed(result->transfer_syntax, sizeof(result->transfer_syntax),
                   data, len);
    } else if (group == 0x0028) {
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
