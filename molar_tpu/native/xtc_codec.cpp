// XTC (XDR 3dfcoord) codec: decoder, indexer, and a simple valid encoder.
//
// Implements the public-domain GROMACS xdrfile XTC format from its spec:
// big-endian XDR framing (magic 1995, natoms, step, time, 3x3 box rows),
// followed by the 3dfcoord block: natoms, precision, minint[3], maxint[3],
// smallidx, nbytes, bit-packed multi-radix integers with delta-coded
// "small" runs (water-swap interchange on the first run element).
//
// Role: TPU-era replacement of the reference's `molly` Rust crate
// (molar/src/io/xtc_handler.rs) — host-side serial bit-twiddling belongs in
// native code feeding the device prefetch queue. Exposed as a C ABI for
// ctypes.
//
// Frames are independent after indexing, so decode parallelism is
// frame-level: xtc_decode_frame_buf is thread-safe (no shared state), and the
// Python side fans frames out over a thread pool (GIL released via ctypes).
//
// Build: g++ -O3 -shared -fPIC xtc_codec.cpp -o libmolar_xtc.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t XTC_MAGIC = 1995;
constexpr int FIRSTIDX = 9;

const int magicints[] = {
    0,       0,       0,       0,       0,        0,        0,        0,
    0,       8,       10,      12,      16,       20,       25,       32,
    40,      50,      64,      80,      101,      128,      161,      203,
    256,     322,     406,     512,     645,      812,      1024,     1290,
    1625,    2048,    2580,    3250,    4096,     5060,     6501,     8192,
    10321,   13003,   16384,   20642,   26007,    32768,    41285,    52015,
    65536,   82570,   104031,  131072,  165140,   208063,   262144,   330280,
    416127,  524287,  660561,  832255,  1048576,  1321122,  1664510,  2097152,
    2642245, 3329021, 4194304, 5284491, 6658042,  8388607,  10568983, 13316085,
    16777216};
constexpr int LASTIDX = sizeof(magicints) / sizeof(int) - 1;

// ---------------------------------------------------------------------------
// Big-endian primitive IO over an in-memory buffer
// ---------------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  size_t len;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > len) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
  int32_t i32() { return (int32_t)u32(); }
  float f32() {
    uint32_t v = u32();
    float f;
    std::memcpy(&f, &v, 4);
    return f;
  }
};

// ---------------------------------------------------------------------------
// Bit reader/writer (xdrfile bit stream: MSB-first within bytes)
// ---------------------------------------------------------------------------

struct BitReader {
  // MSB-first bit stream over the compressed blob, buffered in a 64-bit
  // accumulator (refill up to 56 bits at a time) — ~2x the throughput of a
  // per-byte feed in the water-run hot loop.
  const uint8_t* data;
  size_t len;
  size_t cnt = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool ok = true;

  size_t bits_read = 0;

  inline void fill() {
    // Zero-pad virtually past the end; over-reads are caught by the
    // bits_read accounting in decodebits.
    while (nbits <= 56) {
      uint8_t b = cnt < len ? data[cnt++] : 0;
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }

  inline int decodebits(int num_of_bits) {
    if (nbits < num_of_bits) fill();
    nbits -= num_of_bits;
    bits_read += num_of_bits;
    if (bits_read > len * 8) ok = false;
    return (int)((acc >> nbits) & (((uint64_t)1 << num_of_bits) - 1));
  }

  void decodeints(int num_of_bits, const uint32_t sizes[3], int nums[3]) {
    // Fast path: the whole multi-radix number fits u64 (chunk i is the i-th
    // base-256 "digit", the trailing partial chunk included), so the byte-
    // array long division collapses to two u64 divmods. Covers every real
    // trajectory (bits <= 56 unless all three box extents approach 2^24).
    if (num_of_bits <= 56) {
      uint64_t big = 0;
      int shift = 0;
      int left = num_of_bits;
      while (left > 8) {
        big |= (uint64_t)(uint8_t)decodebits(8) << shift;
        shift += 8;
        left -= 8;
      }
      if (left > 0) big |= (uint64_t)(uint32_t)decodebits(left) << shift;
      uint64_t q = big / sizes[2];
      nums[2] = (int)(big - q * sizes[2]);
      big = q;
      q = big / sizes[1];
      nums[1] = (int)(big - q * sizes[1]);
      nums[0] = (int)q;
      return;
    }
    int bytes[32];
    bytes[0] = bytes[1] = bytes[2] = bytes[3] = 0;
    int num_of_bytes = 0;
    while (num_of_bits > 8) {
      bytes[num_of_bytes++] = decodebits(8);
      num_of_bits -= 8;
    }
    if (num_of_bits > 0) bytes[num_of_bytes++] = decodebits(num_of_bits);
    for (int i = 2; i > 0; i--) {
      int num = 0;
      for (int j = num_of_bytes - 1; j >= 0; j--) {
        num = (num << 8) | bytes[j];
        int q = num / (int)sizes[i];
        bytes[j] = q;
        num -= q * (int)sizes[i];
      }
      nums[i] = num;
    }
    nums[0] = bytes[0] | (bytes[1] << 8) | (bytes[2] << 16) | (bytes[3] << 24);
  }
};

struct BitWriter {
  std::vector<uint8_t> out;
  uint32_t lastbits = 0;
  uint64_t lastbyte = 0;

  void encodebits(int value, int num_of_bits) {
    // Accumulate MSB-first.
    lastbyte = (lastbyte << num_of_bits) | ((uint64_t)value & ((1ull << num_of_bits) - 1));
    lastbits += num_of_bits;
    while (lastbits >= 8) {
      lastbits -= 8;
      out.push_back((uint8_t)(lastbyte >> lastbits));
    }
  }

  void encodeints(int num_of_bits, const uint32_t sizes[3], const int nums[3]) {
    // Multi-radix big number, little-endian bytes, then emitted MSB-first in
    // 8-bit chunks (mirror of decodeints).
    uint8_t bytes[32];
    int num_of_bytes = 0;
    uint32_t tmp = (uint32_t)nums[0];
    do {
      bytes[num_of_bytes++] = tmp & 0xff;
      tmp >>= 8;
    } while (tmp != 0);
    for (int i = 1; i < 3; i++) {
      // bytes = bytes * sizes[i] + nums[i]
      uint32_t carry = (uint32_t)nums[i];
      for (int j = 0; j < num_of_bytes; j++) {
        uint32_t v = (uint32_t)bytes[j] * sizes[i] + carry;
        bytes[j] = v & 0xff;
        carry = v >> 8;
      }
      while (carry != 0) {
        bytes[num_of_bytes++] = carry & 0xff;
        carry >>= 8;
      }
    }
    int bits_left = num_of_bits;
    int bi = 0;
    while (bits_left > 8) {
      encodebits(bi < num_of_bytes ? bytes[bi] : 0, 8);
      bi++;
      bits_left -= 8;
    }
    if (bits_left > 0) encodebits(bi < num_of_bytes ? bytes[bi] : 0, bits_left);
  }

  void flush() {
    if (lastbits > 0) {
      out.push_back((uint8_t)(lastbyte << (8 - lastbits)));
      lastbits = 0;
      lastbyte = 0;
    }
  }
};

int sizeofint(uint32_t size) {
  int num_of_bits = 0;
  uint32_t num = 1;
  while (size >= num && num_of_bits < 32) {
    num_of_bits++;
    num <<= 1;
  }
  return num_of_bits;
}

int sizeofints(int num_of_ints, const uint32_t sizes[]) {
  uint32_t num_of_bytes = 1;
  uint32_t bytes[32];
  bytes[0] = 1;
  int num_of_bits = 0;
  for (int i = 0; i < num_of_ints; i++) {
    uint32_t tmp = 0;
    uint32_t bytecnt;
    for (bytecnt = 0; bytecnt < num_of_bytes; bytecnt++) {
      tmp = bytes[bytecnt] * sizes[i] + tmp;
      bytes[bytecnt] = tmp & 0xff;
      tmp >>= 8;
    }
    while (tmp != 0) {
      bytes[bytecnt++] = tmp & 0xff;
      tmp >>= 8;
    }
    num_of_bytes = bytecnt;
  }
  uint32_t num = 1;
  num_of_bytes--;
  while (bytes[num_of_bytes] >= num) {
    num_of_bits++;
    num *= 2;
  }
  return num_of_bits + num_of_bytes * 8;
}

// Output policies for the frame decoder: the XDR3DFR stream carries
// quantized int coordinates; FloatStore reproduces the canonical
// int * (1/precision) floats, I16Store emits the raw quantized ints as
// int16 (lossless when they fit — the device multiplies by 1/precision
// and gets bit-identical f32, at half the host->device bytes).
struct FloatStore {
  float* p;
  float inv = 1.0f;
  bool ok = true;
  void set_inv(float precision) { inv = 1.0f / precision; }
  inline void store3(const int* c) {
    p[0] = c[0] * inv;
    p[1] = c[1] * inv;
    p[2] = c[2] * inv;
    p += 3;
  }
  bool tiny(Cursor& c, int natoms) {  // uncompressed small-frame case
    for (int i = 0; i < natoms * 3; i++) p[i] = c.f32();
    return c.ok;
  }
};

struct I16Store {
  int16_t* p;
  bool ok = true;
  void set_inv(float) {}
  inline void store3(const int* c) {
    for (int d = 0; d < 3; d++) {
      int v = c[d];
      if (v < -32768 || v > 32767) { ok = false; v = 0; }
      p[d] = (int16_t)v;
    }
    p += 3;
  }
  bool tiny(Cursor&, int) { return false; }  // no ints exist; caller falls back
};

// Core frame decoder.
//
// `sticky_runs` selects between the two run-flag dialects in the wild:
//   * false — canonical xdrfile/GROMACS 3dfcoord: `flag == 0` means "no
//     run for this record".
//   * true — the dialect written by molly (the Rust XTC codec the
//     reference links for both reading and writing,
//     molar/src/io/xtc_handler.rs:1-40): `flag == 0` means "repeat the
//     PREVIOUS record's run length" (a 1-bit shorthand for the common
//     same-length-run case; smallidx is unchanged). Reverse-engineered
//     bit-exactly from the reference fixture tests/new.xtc, whose 4295
//     atoms decode exactly to tests/protein.pdb under this rule and
//     derail under the canonical one.
//
// The two dialects share every other rule, and each one misparses the
// other's streams — so the caller decodes canonically first and retries
// sticky if validation fails (see xtc_decode_frame_buf). Validation is
// strict: every absolute coordinate must lie in the header's
// [minint, maxint] envelope (true of any correctly-decoded stream, since
// the writer derives the envelope from the full frame), the atom count
// must land exactly on lsize, and the bit cursor must stay in bounds.
// `n_want`: decode only the first n_want atoms and stop (clamped to the
// frame's atom count; pass INT32_MAX for a full decode). XDR3DFR is a
// sequential per-atom stream, so a selection confined to low atom indices
// (e.g. protein-first GROMACS topologies) skips the tail entirely — full
// strict validation (i == lsize) is impossible then, so early-stop callers
// must already know the run-flag dialect. A run group may overshoot the
// requested count by up to 10 atoms (run <= 30, 3 ints/atom): the output
// buffer needs 10 atoms of slack beyond n_want.
template <class Store>
static int xtc_decode_core(const uint8_t* buf, long buflen, Store& st,
                           float* box9, int32_t* step, float* time,
                           float* precision_out, bool sticky_runs,
                           int32_t n_want) {
  Cursor c{buf, (size_t)buflen};
  int32_t magic = c.i32();
  if (!c.ok || magic != XTC_MAGIC) return -1;
  int32_t natoms = c.i32();
  *step = c.i32();
  *time = c.f32();
  for (int i = 0; i < 9; i++) box9[i] = c.f32();
  int32_t lsize = c.i32();
  if (!c.ok || lsize != natoms || natoms < 0) return -1;
  if (n_want > lsize) n_want = lsize;

  if (natoms <= 9) {
    if (precision_out) *precision_out = 0.0f;
    return st.tiny(c, natoms) ? natoms : -1;
  }

  float precision = c.f32();
  if (precision_out) *precision_out = precision;
  st.set_inv(precision);
  int32_t minint[3], maxint[3];
  for (int i = 0; i < 3; i++) minint[i] = c.i32();
  for (int i = 0; i < 3; i++) maxint[i] = c.i32();
  int smallidx = c.i32();
  if (!c.ok || smallidx < 0 || smallidx >= LASTIDX) return -1;

  uint32_t sizeint[3], sizesmall[3];
  int bitsizeint[3] = {0, 0, 0};
  int bitsize;
  for (int i = 0; i < 3; i++) sizeint[i] = (uint32_t)(maxint[i] - minint[i]) + 1;
  if ((sizeint[0] | sizeint[1] | sizeint[2]) > 0xffffff) {
    bitsizeint[0] = sizeofint(sizeint[0]);
    bitsizeint[1] = sizeofint(sizeint[1]);
    bitsizeint[2] = sizeofint(sizeint[2]);
    bitsize = 0;
  } else {
    bitsize = sizeofints(3, sizeint);
  }

  int tmp = smallidx - 1;
  tmp = (FIRSTIDX > tmp) ? FIRSTIDX : tmp;
  int smaller = magicints[tmp] / 2;
  int smallnum = magicints[smallidx] / 2;
  sizesmall[0] = sizesmall[1] = sizesmall[2] = (uint32_t)magicints[smallidx];

  int32_t nbytes = c.i32();
  if (!c.ok || nbytes < 0 || c.off + (size_t)nbytes > c.len) return -1;

  BitReader br{buf + c.off, (size_t)((nbytes + 3) / 4) * 4};

  // Envelope validation (coords within [minint, maxint]) — accumulated
  // branch-free; checked once at the end.
  int env_lo[3] = {minint[0], minint[1], minint[2]};
  int env_hi[3] = {maxint[0], maxint[1], maxint[2]};
  int env_ok = 1;
#define MOLAR_ENV_CHECK(coord3)                                   \
  env_ok &= ((coord3)[0] >= env_lo[0]) & ((coord3)[0] <= env_hi[0]) & \
            ((coord3)[1] >= env_lo[1]) & ((coord3)[1] <= env_hi[1]) & \
            ((coord3)[2] >= env_lo[2]) & ((coord3)[2] <= env_hi[2])

  int thiscoord[3], prevcoord[3] = {0, 0, 0};
  int i = 0;
  int run = 0;
  int prev_run = 0;
  while (i < lsize) {
    if (bitsize == 0) {
      thiscoord[0] = br.decodebits(bitsizeint[0]);
      thiscoord[1] = br.decodebits(bitsizeint[1]);
      thiscoord[2] = br.decodebits(bitsizeint[2]);
    } else {
      br.decodeints(bitsize, sizeint, thiscoord);
    }
    i++;
    thiscoord[0] += minint[0];
    thiscoord[1] += minint[1];
    thiscoord[2] += minint[2];
    MOLAR_ENV_CHECK(thiscoord);
    prevcoord[0] = thiscoord[0];
    prevcoord[1] = thiscoord[1];
    prevcoord[2] = thiscoord[2];

    int flag = br.decodebits(1);
    int is_smaller = 0;
    if (flag == 1) {
      run = br.decodebits(5);
      is_smaller = run % 3;
      run -= is_smaller;
      is_smaller--;
    } else if (sticky_runs) {
      run = prev_run;  // molly dialect: 0-flag repeats the last run length
    }
    if (!br.ok) return -1;
    prev_run = run;
    if (run > 0) {
      // A run at a degenerate small size would divide by zero; files only
      // reach sizesmall==0 on atoms with no runs, so check lazily here.
      if (sizesmall[0] == 0) return -1;
      // The run writes run/3 extra atoms; reject streams that would
      // overshoot the output buffer (corrupt or mis-dialected input).
      if (i + run / 3 > lsize) return -1;
      for (int k = 0; k < run; k += 3) {
        br.decodeints(smallidx, sizesmall, thiscoord);
        i++;
        thiscoord[0] += prevcoord[0] - smallnum;
        thiscoord[1] += prevcoord[1] - smallnum;
        thiscoord[2] += prevcoord[2] - smallnum;
        MOLAR_ENV_CHECK(thiscoord);
        if (k == 0) {
          // Interchange first with second atom (water-molecule optimization
          // in the original compressor).
          int t0 = thiscoord[0]; thiscoord[0] = prevcoord[0]; prevcoord[0] = t0;
          int t1 = thiscoord[1]; thiscoord[1] = prevcoord[1]; prevcoord[1] = t1;
          int t2 = thiscoord[2]; thiscoord[2] = prevcoord[2]; prevcoord[2] = t2;
          st.store3(prevcoord);
        } else {
          prevcoord[0] = thiscoord[0];
          prevcoord[1] = thiscoord[1];
          prevcoord[2] = thiscoord[2];
        }
        st.store3(thiscoord);
      }
      run = 0;
    } else {
      st.store3(thiscoord);
    }
    smallidx += is_smaller;
    if (is_smaller < 0) {
      smallnum = smaller;
      smaller = (smallidx > FIRSTIDX) ? magicints[smallidx - 1] / 2 : 0;
    } else if (is_smaller > 0) {
      smaller = smallnum;
      smallnum = magicints[smallidx] / 2;
    }
    if (smallidx < 0 || smallidx > LASTIDX) return -1;
    sizesmall[0] = sizesmall[1] = sizesmall[2] = (uint32_t)magicints[smallidx];
    if (!br.ok) return -1;
    if (i >= n_want) break;  // early stop: caller wanted only a prefix
  }
#undef MOLAR_ENV_CHECK
  if (!env_ok || i < n_want) return -3;  // decoded, but fails validation:
                                         // caller retries the other dialect
  return st.ok ? natoms : -2;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Parse one frame header from `buf` (>= 56 bytes). Outputs natoms/step/time/
// box (row-major rows = box vectors, GROMACS convention) and the total frame
// size in bytes (header+payload, 4-byte aligned). Returns 1 on success,
// 0 if magic mismatches / truncated.
int xtc_parse_header(const uint8_t* buf, long buflen, int32_t* natoms,
                     int32_t* step, float* time, float* box9,
                     long* frame_bytes) {
  Cursor c{buf, (size_t)buflen};
  int32_t magic = c.i32();
  if (!c.ok || magic != XTC_MAGIC) return 0;
  int32_t n = c.i32();
  *natoms = n;
  *step = c.i32();
  *time = c.f32();
  for (int i = 0; i < 9; i++) box9[i] = c.f32();
  int32_t n2 = c.i32();
  if (!c.ok || n2 != n) return 0;
  if (n <= 9) {
    *frame_bytes = (long)c.off + 12L * n;
  } else {
    c.f32();                      // precision
    for (int i = 0; i < 6; i++) c.i32();  // minint+maxint
    c.i32();                      // smallidx
    int32_t nbytes = c.i32();
    if (!c.ok || nbytes < 0) return 0;
    *frame_bytes = (long)c.off + ((nbytes + 3L) / 4L) * 4L;
  }
  return c.ok ? 1 : 0;
}

// Decode one complete frame held in `buf`. coords: natoms*3 floats out.
// Returns number of atoms decoded, or -1 on error. Thread-safe.
//
// Tries the canonical GROMACS run-flag dialect first; if the stream fails
// strict validation (coordinate outside the header envelope, run overshoot,
// bit-cursor overrun), re-decodes under the molly sticky-run dialect (see
// xtc_decode_core) — files written by the reference's Rust codec only parse
// under the latter.
int xtc_decode_frame_buf(const uint8_t* buf, long buflen, float* coords,
                         float* box9, int32_t* step, float* time,
                         float* precision_out) {
  FloatStore st{coords};
  int n = xtc_decode_core(buf, buflen, st, box9, step, time, precision_out,
                          /*sticky_runs=*/false, INT32_MAX);
  if (n < 0) {
    FloatStore st2{coords};
    n = xtc_decode_core(buf, buflen, st2, box9, step, time, precision_out,
                        /*sticky_runs=*/true, INT32_MAX);
  }
  return n < 0 ? -1 : n;
}

// Full strict decode that also reports which run-flag dialect parsed the
// stream (0 canonical, 1 sticky/molly) — callers that will follow up with
// prefix decodes need it, since a prefix cannot be dialect-validated.
int xtc_decode_frame_detect(const uint8_t* buf, long buflen, float* coords,
                            float* box9, int32_t* step, float* time,
                            float* precision_out, int32_t* sticky_out) {
  FloatStore st{coords};
  int n = xtc_decode_core(buf, buflen, st, box9, step, time, precision_out,
                          /*sticky_runs=*/false, INT32_MAX);
  if (n >= 0) {
    *sticky_out = 0;
    return n;
  }
  FloatStore st2{coords};
  n = xtc_decode_core(buf, buflen, st2, box9, step, time, precision_out,
                      /*sticky_runs=*/true, INT32_MAX);
  if (n >= 0) *sticky_out = 1;
  return n < 0 ? -1 : n;
}

// Decode only the first `n_want` atoms of a frame under a KNOWN dialect
// (from xtc_decode_frame_detect on any full frame of the same file) and
// stop — a selection confined to low atom indices skips decoding the tail
// entirely. `coords` must hold n_want + 10 atoms (run-group overshoot
// slack; see xtc_decode_core). Returns the frame's total atom count on
// success (only the first n_want rows of coords are valid), -1 on error.
int xtc_decode_frame_prefix(const uint8_t* buf, long buflen, float* coords,
                            int32_t n_want, float* box9, int32_t* step,
                            float* time, int32_t sticky_runs) {
  if (n_want < 1) return -1;
  FloatStore st{coords};
  float prec;
  int n = xtc_decode_core(buf, buflen, st, box9, step, time, &prec,
                          sticky_runs != 0, n_want);
  return n < 0 ? -1 : n;
}

// Prefix decode to the raw quantized int16 ints under a KNOWN dialect
// (from xtc_decode_frame_detect on any full frame of the same file) — the
// transport form for subset window streams: a selection confined to low
// atom indices decodes only max(selection)+1 atoms per frame and ships
// i8/i16 deltas of exactly those ints. `coords` must hold n_want + 10
// atoms of slack (run-group overshoot; see xtc_decode_core). Returns the
// frame's total atom count on success (only the first n_want rows are
// valid), -1 on stream error, -2 when the int16 transport can't represent
// the frame (caller falls back to the float path).
int xtc_decode_frame_prefix_i16(const uint8_t* buf, long buflen,
                                int16_t* coords, int32_t n_want, float* box9,
                                int32_t* step, float* time,
                                float* precision_out, int32_t sticky_runs) {
  if (n_want < 1) return -1;
  I16Store st{coords};
  int n = xtc_decode_core(buf, buflen, st, box9, step, time, precision_out,
                          sticky_runs != 0, n_want);
  if (n == -3) n = -1;
  if (n >= 0 && (precision_out && *precision_out == 0.0f)) return -2;
  return n;
}

// Decode one frame to the raw quantized int coordinates as int16 (natoms*3).
// Returns natoms, -1 on stream error, -2 if a coordinate exceeds int16 range
// or the frame is a tiny uncompressed one (no quantized ints exist) — the
// caller falls back to the float decoder. Same dialect retry as the float
// entry point.
int xtc_decode_frame_buf_i16(const uint8_t* buf, long buflen, int16_t* coords,
                             float* box9, int32_t* step, float* time,
                             float* precision_out) {
  I16Store st{coords};
  int n = xtc_decode_core(buf, buflen, st, box9, step, time, precision_out,
                          /*sticky_runs=*/false, INT32_MAX);
  if (n == -1 || n == -3) {
    I16Store st2{coords};
    n = xtc_decode_core(buf, buflen, st2, box9, step, time, precision_out,
                        /*sticky_runs=*/true, INT32_MAX);
  }
  if (n == -3) n = -1;
  if (n >= 0 && (precision_out && *precision_out == 0.0f)) return -2;
  return n;
}

// Encode one frame into a malloc'd buffer (caller frees with xtc_free).
// Always uses large-coordinate encoding (flag=0 per atom) — a valid, simple
// subset of the format that every conforming decoder accepts.
// box9 is row-major rows-as-vectors. Returns buffer length or -1.
long xtc_encode_frame(const float* coords, int natoms, const float* box9,
                      int32_t step, float time, float precision,
                      uint8_t** out_buf) {
  std::vector<uint8_t> head;
  auto put_u32 = [&head](uint32_t v) {
    head.push_back((uint8_t)(v >> 24));
    head.push_back((uint8_t)(v >> 16));
    head.push_back((uint8_t)(v >> 8));
    head.push_back((uint8_t)v);
  };
  auto put_f32 = [&put_u32](float f) {
    uint32_t v;
    std::memcpy(&v, &f, 4);
    put_u32(v);
  };
  put_u32((uint32_t)XTC_MAGIC);
  put_u32((uint32_t)natoms);
  put_u32((uint32_t)step);
  put_f32(time);
  for (int i = 0; i < 9; i++) put_f32(box9[i]);
  put_u32((uint32_t)natoms);

  if (natoms <= 9) {
    for (int i = 0; i < natoms * 3; i++) put_f32(coords[i]);
  } else {
    if (precision <= 0) precision = 1000.0f;
    std::vector<int32_t> ints(natoms * 3);
    int32_t minint[3] = {INT32_MAX, INT32_MAX, INT32_MAX};
    int32_t maxint[3] = {INT32_MIN, INT32_MIN, INT32_MIN};
    for (int i = 0; i < natoms; i++) {
      for (int d = 0; d < 3; d++) {
        float x = coords[i * 3 + d] * precision;
        // Match xdrfile rounding: x >= 0 ? x + 0.5 : x - 0.5, truncated.
        int32_t v = (int32_t)(x >= 0 ? x + 0.5f : x - 0.5f);
        ints[i * 3 + d] = v;
        if (v < minint[d]) minint[d] = v;
        if (v > maxint[d]) maxint[d] = v;
      }
    }
    uint32_t sizeint[3];
    int bitsizeint[3] = {0, 0, 0};
    int bitsize;
    for (int d = 0; d < 3; d++) sizeint[d] = (uint32_t)(maxint[d] - minint[d]) + 1;
    if ((sizeint[0] | sizeint[1] | sizeint[2]) > 0xffffff) {
      bitsizeint[0] = sizeofint(sizeint[0]);
      bitsizeint[1] = sizeofint(sizeint[1]);
      bitsizeint[2] = sizeofint(sizeint[2]);
      bitsize = 0;
    } else {
      bitsize = sizeofints(3, sizeint);
    }
    put_f32(precision);
    for (int d = 0; d < 3; d++) put_u32((uint32_t)minint[d]);
    for (int d = 0; d < 3; d++) put_u32((uint32_t)maxint[d]);
    put_u32((uint32_t)FIRSTIDX);  // smallidx: unused by flag=0 encoding

    BitWriter bw;
    for (int i = 0; i < natoms; i++) {
      int nums[3] = {ints[i * 3] - minint[0], ints[i * 3 + 1] - minint[1],
                     ints[i * 3 + 2] - minint[2]};
      if (bitsize == 0) {
        bw.encodebits(nums[0], bitsizeint[0]);
        bw.encodebits(nums[1], bitsizeint[1]);
        bw.encodebits(nums[2], bitsizeint[2]);
      } else {
        bw.encodeints(bitsize, sizeint, nums);
      }
      bw.encodebits(0, 1);  // flag = 0: no small run
    }
    bw.flush();
    put_u32((uint32_t)bw.out.size());
    head.insert(head.end(), bw.out.begin(), bw.out.end());
    while (head.size() % 4 != 0) head.push_back(0);
  }

  uint8_t* buf = (uint8_t*)std::malloc(head.size());
  std::memcpy(buf, head.data(), head.size());
  *out_buf = buf;
  return (long)head.size();
}

void xtc_free(uint8_t* buf) { std::free(buf); }

// Scan a whole file image and emit frame offsets/steps/times.
// Returns number of frames found (capped at max_frames), -1 on corrupt lead
// frame. A corrupt *tail* just ends the scan (trajectory-tail tolerance).
long xtc_index(const uint8_t* data, long len, long* offsets, int32_t* steps,
               float* times, long max_frames, int32_t* natoms_out) {
  long off = 0;
  long count = 0;
  int32_t natoms = -1;
  while (off + 56 <= len && count < max_frames) {
    int32_t n, step;
    float time, box9[9];
    long fbytes;
    if (!xtc_parse_header(data + off, len - off, &n, &step, &time, box9,
                          &fbytes))
      break;
    if (natoms < 0) natoms = n;
    if (n != natoms || off + fbytes > len) break;
    offsets[count] = off;
    steps[count] = step;
    times[count] = time;
    count++;
    off += fbytes;
  }
  *natoms_out = natoms;
  return count;
}

}  // extern "C"
