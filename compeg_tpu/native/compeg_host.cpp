// compeg_tpu native host library.
//
// C++ implementations of the host-side hot paths, exposed through a C ABI
// for the ctypes loader in __init__.py:
//
//  * scan preprocessing (destuff + restart split + TPU block packing) — the
//    CPU hot loop the reference spends ~2ms/4K-frame on in Rust
//    (reference: src/scan.rs:33-128, README.md:4-5). Ours packs straight
//    into the [G, W, 8, 128] MSB-first word layout the Pallas entropy
//    kernel consumes, so Python never touches the scan bytes.
//
// Build: `make` in this directory (or the ctypes loader builds it lazily).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Scan the entropy-coded data once: count restart intervals and measure the
// longest destuffed segment. Returns 0 on success.
int compeg_scan_info(const uint8_t* scan, int64_t len, int64_t* n_intervals,
                     int64_t* max_seg_bytes) {
  if (len <= 0) return -1;
  int64_t count = 1;
  int64_t cur = 0, mx = 0;
  for (int64_t i = 0; i < len;) {
    uint8_t b = scan[i];
    if (b != 0xFF) {
      cur++;
      i++;
      continue;
    }
    uint8_t nxt = (i + 1 < len) ? scan[i + 1] : 0;
    if (nxt == 0x00) {  // stuffed FF
      cur++;
      i += 2;
    } else if (nxt >= 0xD0 && nxt <= 0xD7) {  // RST: segment boundary
      if (cur > mx) mx = cur;
      cur = 0;
      count++;
      i += 2;
    } else {  // stray FF (fill byte or trailing marker prefix): keep it
      cur++;
      i++;
    }
  }
  if (cur > mx) mx = cur;
  *n_intervals = count;
  *max_seg_bytes = mx;
  return 0;
}

namespace {

constexpr int kSublanes = 8;
constexpr int kLanes = 128;
constexpr int kSegsPerBlock = kSublanes * kLanes;

// Pack one destuffed byte into segment `seg`'s stream at byte offset `off`.
// words layout: [G][W][8][128], MSB-first within each u32.
inline void put_byte(uint32_t* words, int32_t W, int64_t seg, int64_t off,
                     uint8_t v) {
  int64_t g = seg / kSegsPerBlock;
  int64_t s = (seg % kSegsPerBlock) / kLanes;
  int64_t l = seg % kLanes;
  int64_t w = off >> 2;
  int shift = 24 - 8 * (off & 3);
  words[((g * W + w) * kSublanes + s) * kLanes + l] |=
      static_cast<uint32_t>(v) << shift;
}

struct SegSpan {
  int64_t begin;  // raw scan offset of first byte
  int64_t end;    // raw scan offset past the segment (before the RST)
};

// Pack the raw bytes [begin, end) of segment `seg` (destuffing inline).
// Returns destuffed byte count, or -1 if it overflows W*4 - guard bytes.
int64_t pack_segment(const uint8_t* scan, SegSpan span, uint32_t* words,
                     int32_t W, int64_t seg, int64_t max_bytes) {
  int64_t off = 0;
  for (int64_t i = span.begin; i < span.end;) {
    uint8_t b = scan[i];
    if (b == 0xFF && i + 1 < span.end && scan[i + 1] == 0x00) {
      i += 2;
    } else {
      i += 1;
    }
    if (off >= max_bytes) return -1;
    put_byte(words, W, seg, off++, b);
  }
  return off;
}

}  // namespace

// Destuff + split + pack into the TPU block layout.
//   words:  zeroed buffer of G*W*8*128 u32 (caller allocates)
//   active: buffer of G*8*128 i32 (caller allocates)
// Returns 0, or -2 segment overflow, -3 interval count mismatch.
int compeg_pack(const uint8_t* scan, int64_t len, int64_t expected, int32_t W,
                int32_t G, uint32_t* words, int32_t* active, int32_t n_threads) {
  if (len <= 0) return -1;
  // Pass 1: find segment spans (RST boundaries) on the raw bytes.
  std::vector<SegSpan> spans;
  spans.reserve(static_cast<size_t>(expected));
  int64_t start = 0;
  for (int64_t i = 0; i < len;) {
    if (scan[i] != 0xFF) {
      i++;
      continue;
    }
    uint8_t nxt = (i + 1 < len) ? scan[i + 1] : 0;
    if (nxt == 0x00) {
      i += 2;
    } else if (nxt >= 0xD0 && nxt <= 0xD7) {
      spans.push_back({start, i});
      i += 2;
      start = i;
    } else {
      i++;
    }
  }
  spans.push_back({start, len});
  if (static_cast<int64_t>(spans.size()) != expected) return -3;

  const int64_t max_bytes = static_cast<int64_t>(W) * 4 - 8;  // guard words
  const int64_t nseg = spans.size();

  std::memset(words, 0,
              sizeof(uint32_t) * static_cast<size_t>(G) * W * kSegsPerBlock);
  std::memset(active, 0, sizeof(int32_t) * static_cast<size_t>(G) * kSegsPerBlock);

  int rc = 0;
  int nt = n_threads > 0 ? n_threads : 1;
  if (nt > 1) {
    std::vector<std::thread> ts;
    std::vector<int> rcs(nt, 0);
    int64_t chunk = (nseg + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
      ts.emplace_back([&, t]() {
        int64_t lo = t * chunk, hi = std::min<int64_t>(nseg, lo + chunk);
        for (int64_t s = lo; s < hi; s++) {
          if (pack_segment(scan, spans[s], words, W, s, max_bytes) < 0) {
            rcs[t] = -2;
            return;
          }
          active[s] = 1;
        }
      });
    }
    for (auto& th : ts) th.join();
    for (int r : rcs)
      if (r) rc = r;
  } else {
    for (int64_t s = 0; s < nseg; s++) {
      if (pack_segment(scan, spans[s], words, W, s, max_bytes) < 0) return -2;
      active[s] = 1;
    }
  }
  return rc;
}

}  // extern "C"
