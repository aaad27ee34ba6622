// Native TFRecord reader for the host-side video pipeline.
//
// Role: the reference feeds its attack from TFRecord shards via TF's C++
// tf.data runtime (i3d_adversarial_main_universal.py:231-248).  This library
// is the equivalent native component for the TPU framework: it parses the
// TFRecord framing ({u64 len, u32 masked crc32c, bytes, u32 crc}) and the
// tf.train.Example wire format (the 'train/label' int64 + 'train/video'
// raw-uint8-bytes schema of utils/pre_process_rgb_flow.py:211-236) straight
// into caller-provided buffers — no TensorFlow, no Python-loop overhead, no
// intermediate copies beyond one memcpy per record.  Exposed to Python via
// ctypes (flickering_adversarial_video_tpu/data/native_reader.py).
//
// Thread-safety: each Reader instance owns one file handle; use one instance
// per worker thread.  CRC verification is optional (off on the hot path; the
// trailing CRCs are still read and skipped).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---- crc32c (Castagnoli), slice-by-1 table; enough for optional checks ----

uint32_t g_crc_table[256];
bool g_crc_init = false;

void InitCrcTable() {
  if (g_crc_init) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
    g_crc_table[i] = c;
  }
  g_crc_init = true;
}

uint32_t Crc32c(const uint8_t* data, size_t n) {
  InitCrcTable();
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    crc = (crc >> 8) ^ g_crc_table[(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc32c(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---- minimal protobuf wire parsing ----

struct Slice {
  const uint8_t* p;
  size_t n;
};

bool ReadVarint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

bool SkipField(const uint8_t*& p, const uint8_t* end, uint32_t wire_type) {
  uint64_t tmp;
  switch (wire_type) {
    case 0:
      return ReadVarint(p, end, &tmp);
    case 1:
      if (end - p < 8) return false;
      p += 8;
      return true;
    case 2:
      if (!ReadVarint(p, end, &tmp) || static_cast<uint64_t>(end - p) < tmp)
        return false;
      p += tmp;
      return true;
    case 5:
      if (end - p < 4) return false;
      p += 4;
      return true;
    default:
      return false;
  }
}

// Parse one Example: find features map (field 1), iterate entries, match
// key strings, extract int64 label + bytes video.
struct ParsedExample {
  Slice video = {nullptr, 0};
  int64_t label = -1;
  bool has_video = false;
  bool has_label = false;
};

bool ParseFeature(const uint8_t* p, const uint8_t* end, ParsedExample* out,
                  bool is_video) {
  // Feature { bytes_list=1 | float_list=2 | int64_list=3 }
  while (p < end) {
    uint64_t tag;
    if (!ReadVarint(p, end, &tag)) return false;
    uint32_t field = tag >> 3, wt = tag & 7;
    if (field == 1 && wt == 2 && is_video) {  // BytesList
      uint64_t len;
      if (!ReadVarint(p, end, &len)) return false;
      const uint8_t* bl = p;
      const uint8_t* bl_end = p + len;
      p += len;
      while (bl < bl_end) {
        uint64_t t2;
        if (!ReadVarint(bl, bl_end, &t2)) return false;
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {
          uint64_t blen;
          if (!ReadVarint(bl, bl_end, &blen)) return false;
          out->video = {bl, static_cast<size_t>(blen)};
          out->has_video = true;
          bl += blen;
        } else if (!SkipField(bl, bl_end, t2 & 7)) {
          return false;
        }
      }
    } else if (field == 3 && wt == 2 && !is_video) {  // Int64List (packed)
      uint64_t len;
      if (!ReadVarint(p, end, &len)) return false;
      const uint8_t* il = p;
      const uint8_t* il_end = p + len;
      p += len;
      while (il < il_end) {
        uint64_t t2;
        if (!ReadVarint(il, il_end, &t2)) return false;
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // packed payload
          uint64_t plen;
          if (!ReadVarint(il, il_end, &plen)) return false;
          const uint8_t* vp = il;
          const uint8_t* vp_end = il + plen;
          il += plen;
          uint64_t v;
          if (ReadVarint(vp, vp_end, &v)) {
            out->label = static_cast<int64_t>(v);
            out->has_label = true;
          }
        } else if ((t2 >> 3) == 1 && (t2 & 7) == 0) {  // unpacked varint
          uint64_t v;
          if (!ReadVarint(il, il_end, &v)) return false;
          out->label = static_cast<int64_t>(v);
          out->has_label = true;
        } else if (!SkipField(il, il_end, t2 & 7)) {
          return false;
        }
      }
    } else if (!SkipField(p, end, wt)) {
      return false;
    }
  }
  return true;
}

bool ParseExample(const uint8_t* data, size_t n, const char* label_key,
                  const char* video_key, ParsedExample* out) {
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  size_t label_key_len = strlen(label_key);
  size_t video_key_len = strlen(video_key);
  while (p < end) {
    uint64_t tag;
    if (!ReadVarint(p, end, &tag)) return false;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // Features
      uint64_t flen;
      if (!ReadVarint(p, end, &flen)) return false;
      const uint8_t* fp = p;
      const uint8_t* fend = p + flen;
      p += flen;
      while (fp < fend) {
        uint64_t t2;
        if (!ReadVarint(fp, fend, &t2)) return false;
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // map entry
          uint64_t elen;
          if (!ReadVarint(fp, fend, &elen)) return false;
          const uint8_t* ep = fp;
          const uint8_t* eend = fp + elen;
          fp += elen;
          Slice key = {nullptr, 0};
          Slice value = {nullptr, 0};
          while (ep < eend) {
            uint64_t t3;
            if (!ReadVarint(ep, eend, &t3)) return false;
            uint64_t len;
            if ((t3 >> 3) == 1 && (t3 & 7) == 2) {
              if (!ReadVarint(ep, eend, &len)) return false;
              key = {ep, static_cast<size_t>(len)};
              ep += len;
            } else if ((t3 >> 3) == 2 && (t3 & 7) == 2) {
              if (!ReadVarint(ep, eend, &len)) return false;
              value = {ep, static_cast<size_t>(len)};
              ep += len;
            } else if (!SkipField(ep, eend, t3 & 7)) {
              return false;
            }
          }
          if (key.p && value.p) {
            if (key.n == video_key_len &&
                memcmp(key.p, video_key, video_key_len) == 0) {
              if (!ParseFeature(value.p, value.p + value.n, out, true))
                return false;
            } else if (key.n == label_key_len &&
                       memcmp(key.p, label_key, label_key_len) == 0) {
              if (!ParseFeature(value.p, value.p + value.n, out, false))
                return false;
            }
          }
        } else if (!SkipField(fp, fend, t2 & 7)) {
          return false;
        }
      }
    } else if (!SkipField(p, end, tag & 7)) {
      return false;
    }
  }
  return out->has_video && out->has_label;
}

struct Reader {
  FILE* f = nullptr;
  std::vector<uint8_t> buf;
  bool verify_crc = false;
};

}  // namespace

extern "C" {

void* tfr_open(const char* path, int verify_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  Reader* r = new Reader();
  r->f = f;
  r->verify_crc = verify_crc != 0;
  return r;
}

void tfr_close(void* handle) {
  if (!handle) return;
  Reader* r = static_cast<Reader*>(handle);
  if (r->f) fclose(r->f);
  delete r;
}

// Read the next record's parsed (video bytes, label).
// Returns: 1 ok, 0 EOF, negative error codes.
// video buffer is owned by the reader and valid until the next call.
long tfr_next(void* handle, const uint8_t** video_out, long* video_len_out,
              long long* label_out) {
  Reader* r = static_cast<Reader*>(handle);
  uint8_t header[12];
  if (fread(header, 1, 12, r->f) != 12) return 0;  // EOF
  uint64_t len;
  memcpy(&len, header, 8);
  if (r->verify_crc) {
    uint32_t expect;
    memcpy(&expect, header + 8, 4);
    if (MaskedCrc32c(header, 8) != expect) return -2;
  }
  r->buf.resize(len);
  if (fread(r->buf.data(), 1, len, r->f) != len) return -1;  // truncated
  uint8_t footer[4];
  if (fread(footer, 1, 4, r->f) != 4) return -1;
  if (r->verify_crc) {
    uint32_t expect;
    memcpy(&expect, footer, 4);
    if (MaskedCrc32c(r->buf.data(), len) != expect) return -2;
  }
  ParsedExample ex;
  if (!ParseExample(r->buf.data(), len, "train/label", "train/video", &ex))
    return -3;
  *video_out = ex.video.p;
  *video_len_out = static_cast<long>(ex.video.n);
  *label_out = ex.label;
  return 1;
}

// Bulk fill: read up to `count` records, copying video bytes (each expected
// exactly `record_bytes` long after tail-cropping to the last `record_bytes`)
// into dst (count*record_bytes) and labels into labels_out.
// Returns number of records filled (clips shorter than record_bytes are
// skipped, mirroring the reference writer's skip-short-videos rule,
// kinetics_to_tf_record_uint8.py:75-86).
long tfr_read_batch(void* handle, uint8_t* dst, long record_bytes,
                    long long* labels_out, long count) {
  const uint8_t* video;
  long vlen;
  long long label;
  long filled = 0;
  while (filled < count) {
    long rc = tfr_next(handle, &video, &vlen, &label);
    if (rc <= 0) break;
    if (vlen < record_bytes) continue;  // too short: skip
    // keep trailing record_bytes (last-N-frames convention)
    memcpy(dst + filled * record_bytes, video + (vlen - record_bytes),
           record_bytes);
    labels_out[filled] = label;
    ++filled;
  }
  return filled;
}

}  // extern "C"

// Space-to-depth pack of one clip during the copy out of the record buffer.
//
// src: [T, H, W, C] uint8 (contiguous); dst: [T/2, H/2, W/2, 8C] with
// channel order (parity_t, parity_h, parity_w, c) — exactly
// ops/space_to_depth.pack_input(x, axes=(1,2,3)).  This layout is what the
// TPU attack step's prepacked path consumes (ops/packed_apply.py); doing the
// relayout here, inside the per-record copy the reader performs anyway, is
// free on the host and removes an 8 ms/step sub-tile-granularity transpose
// from the device program (PERF.md round 2).
static inline void Store6(uint8_t* dst, const uint8_t* src) {
  // 6-byte atom as one u32 + one u16 store (x86 unaligned access is fine;
  // beats a memcpy call and lets the compiler keep everything in registers)
  uint32_t a;
  uint16_t b;
  memcpy(&a, src, 4);
  memcpy(&b, src + 4, 2);
  memcpy(dst, &a, 4);
  memcpy(dst + 4, &b, 2);
}

static void PackClip(const uint8_t* src, uint8_t* dst, long T, long H, long W,
                     long C) {
  const long W2 = W / 2, H2 = H / 2, T2 = T / 2;
  const long atom = 2 * C;             // (parity_w, c) stays contiguous
  const long out_ch = 8 * C;           // packed channel count
  const long src_row = W * C;          // one (t, h) row
  const long src_plane = H * src_row;  // one t slice
  if (C == 3) {
    // hot case: one pass per output row, all four source rows interleaved
    // with register-width stores — sequential writes, 4 sequential reads
    for (long tt = 0; tt < T2; ++tt) {
      for (long hh = 0; hh < H2; ++hh) {
        const uint8_t* s00 = src + (2 * tt) * src_plane + (2 * hh) * src_row;
        const uint8_t* s01 = s00 + src_row;
        const uint8_t* s10 = s00 + src_plane;
        const uint8_t* s11 = s10 + src_row;
        uint8_t* o = dst + ((tt * H2 + hh) * W2) * out_ch;
        for (long ww = 0; ww < W2; ++ww) {
          const long si = ww * atom;
          Store6(o, s00 + si);
          Store6(o + 6, s01 + si);
          Store6(o + 12, s10 + si);
          Store6(o + 18, s11 + si);
          o += out_ch;
        }
      }
    }
    return;
  }
  for (long tt = 0; tt < T2; ++tt) {
    for (long hh = 0; hh < H2; ++hh) {
      uint8_t* orow = dst + ((tt * H2 + hh) * W2) * out_ch;
      for (long pt = 0; pt < 2; ++pt) {
        for (long ph = 0; ph < 2; ++ph) {
          const uint8_t* irow =
              src + (2 * tt + pt) * src_plane + (2 * hh + ph) * src_row;
          uint8_t* obase = orow + (pt * 2 + ph) * atom;
          for (long ww = 0; ww < W2; ++ww) {
            memcpy(obase + ww * out_ch, irow + ww * atom, atom);
          }
        }
      }
    }
  }
}

extern "C" {

// tfr_read_batch with on-the-fly space-to-depth packing.
// dst: count * (record_bytes) uint8, laid out [n, T/2, H/2, W/2, 8C].
// record_bytes = T*H*W*C must match frames*height*width*channels.
long tfr_read_batch_packed(void* handle, uint8_t* dst, long frames,
                           long height, long width, long channels,
                           long long* labels_out, long count) {
  const long record_bytes = frames * height * width * channels;
  const uint8_t* video;
  long vlen;
  long long label;
  long filled = 0;
  while (filled < count) {
    long rc = tfr_next(handle, &video, &vlen, &label);
    if (rc <= 0) break;
    if (vlen < record_bytes) continue;  // too short: skip
    PackClip(video + (vlen - record_bytes), dst + filled * record_bytes,
             frames, height, width, channels);
    labels_out[filled] = label;
    ++filled;
  }
  return filled;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batch-in-lanes view assembly: [B, T, H, W, C] -> [H, W, C, T*B], lane
// l = t*B + b.  This is the T-major layout the full-depth I3D program runs
// in (ops/stem_tmajor.py).  Emitting it on the host removes the device's
// last layout crossing — on TPU this orientation (major dims -> lanes) is
// the toolchain's worst relayout (three measured negatives, PERF.md); on
// the host it is a cache-blocked byte transpose.
//
// Per h-slab the job is a (T*B) x (W*C) byte-matrix transpose where source
// row l lives at src[((b*T + t)*H + h)*W*C].  64x64 blocking: each block
// reads 64 resident cache lines and writes 64 contiguous runs.

#include <algorithm>
#include <thread>
#include <vector>

#if defined(__SSE2__)
#include <immintrin.h>

// The 4-stage unpacklo/hi network with (i, i+8) output indexing transposes a
// 16x16 byte tile; output register j holds column bitrev4(j) with rows in
// order (verified by simulation; exactness pinned in
// tests/test_packing_view.py against numpy).
static const int kBitrev16[16] = {0, 8,  4, 12, 2, 10, 6, 14,
                                  1, 9,  5, 13, 3, 11, 7, 15};

static inline void T16x16(const uint8_t* const* rows, long off, uint8_t* dst,
                          long dst_stride) {
  __m128i x[16], t[16];
  for (int i = 0; i < 16; ++i)
    x[i] = _mm_loadu_si128((const __m128i*)(rows[i] + off));
  for (int i = 0; i < 8; ++i) {
    t[i] = _mm_unpacklo_epi8(x[2 * i], x[2 * i + 1]);
    t[i + 8] = _mm_unpackhi_epi8(x[2 * i], x[2 * i + 1]);
  }
  for (int i = 0; i < 8; ++i) {
    x[i] = _mm_unpacklo_epi16(t[2 * i], t[2 * i + 1]);
    x[i + 8] = _mm_unpackhi_epi16(t[2 * i], t[2 * i + 1]);
  }
  for (int i = 0; i < 8; ++i) {
    t[i] = _mm_unpacklo_epi32(x[2 * i], x[2 * i + 1]);
    t[i + 8] = _mm_unpackhi_epi32(x[2 * i], x[2 * i + 1]);
  }
  for (int i = 0; i < 8; ++i) {
    x[i] = _mm_unpacklo_epi64(t[2 * i], t[2 * i + 1]);
    x[i + 8] = _mm_unpackhi_epi64(t[2 * i], t[2 * i + 1]);
  }
  for (int j = 0; j < 16; ++j)
    _mm_storeu_si128((__m128i*)(dst + (long)kBitrev16[j] * dst_stride), x[j]);
}
#endif  // __SSE2__

static void BatchToViewSlabs(const uint8_t* src, uint8_t* dst, long B, long T,
                             long H, long W, long C, long h0, long h1) {
  const long TB = T * B;
  const long WC = W * C;
  constexpr long BL = 64;
  const uint8_t* rows[BL];
  for (long h = h0; h < h1; ++h) {
    uint8_t* dslab = dst + h * WC * TB;
    for (long l0 = 0; l0 < TB; l0 += BL) {
      const long ln = std::min(BL, TB - l0);
      for (long i = 0; i < ln; ++i) {
        const long l = l0 + i;
        rows[i] = src + (((l % B) * T + (l / B)) * H + h) * WC;
      }
      long wc0 = 0;
#if defined(__SSE2__)
      if (ln == BL) {
        for (; wc0 + 16 <= WC; wc0 += 16)
          for (long i0 = 0; i0 < BL; i0 += 16)
            T16x16(rows + i0, wc0, dslab + wc0 * TB + l0 + i0, TB);
      }
#endif
      for (; wc0 < WC; ++wc0) {
        uint8_t* d = dslab + wc0 * TB + l0;
        for (long i = 0; i < ln; ++i) d[i] = rows[i][wc0];
      }
    }
  }
}

extern "C" {

void tfr_batch_view(const uint8_t* src, uint8_t* dst, long B, long T, long H,
                    long W, long C, long nthreads) {
  if (nthreads < 1) nthreads = 1;
  nthreads = std::min(nthreads, H);
  if (nthreads == 1) {
    BatchToViewSlabs(src, dst, B, T, H, W, C, 0, H);
    return;
  }
  std::vector<std::thread> ts;
  const long chunk = (H + nthreads - 1) / nthreads;
  for (long k = 0; k < nthreads; ++k) {
    const long h0 = k * chunk;
    const long h1 = std::min(H, h0 + chunk);
    if (h0 >= h1) break;
    ts.emplace_back(BatchToViewSlabs, src, dst, B, T, H, W, C, h0, h1);
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
