// dietTPU native host codec: bit-exact CPU implementation of the DietGPU
// archive format (interleaved rANS + float split codec).
//
// This is the TPU framework's native runtime layer — the analogue of the
// reference's C++ host side (/root/reference/dietgpu/DietGpu.cpp,
// utils/StackDeviceMemory.cpp): fast host-side archive encode/decode for
// persistence / checkpoint IO and an independent (second-language) lock on
// the container format. Archives produced here are byte-identical with the
// NumPy oracle (dietgpu_tpu/ref/ans_ref.py) and with the Pallas/XLA device
// paths, hence with the reference format:
//   ANSCoalescedHeader  /root/reference/dietgpu/ans/GpuANSUtils.cuh:67-229
//   GpuFloatHeader      /root/reference/dietgpu/float/GpuFloatUtils.cuh:20-74
//
// Design: one 4096-byte block = 32 interleaved rANS lanes; blocks are
// independent, so encode/decode parallelize across blocks with OpenMP.
// C ABI only (consumed via ctypes from dietgpu_tpu/hostcodec.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr uint32_t kNumSymbols = 256;
constexpr uint32_t kBlockSize = 4096;           // GpuANSUtils.cuh:37
constexpr uint32_t kNumInterleaved = 32;        // GpuANSUtils.cuh:62-65
constexpr uint32_t kStateBits = 31;             // GpuANSUtils.cuh:41
constexpr uint32_t kStartState = 1u << 15;      // GpuANSUtils.cuh:46-49
constexpr uint32_t kMinState = kStartState;
constexpr uint32_t kAnsMagic = 0xd00d;          // GpuANSUtils.cuh:52-55
constexpr uint32_t kAnsVersion = 0x0001;
constexpr uint32_t kFloatMagic = 0xf00f;        // GpuFloatUtils.cuh:20-23
constexpr uint32_t kFloatVersion = 0x0001;
// roundUp(4096 + 4096/4, 16) / 2 u16 words    // GpuANSEncode.cuh:31-36
constexpr uint32_t kMaxCompWordsPerBlock = 2560;
constexpr uint32_t kWordsPerAlign = 8;          // 16B / sizeof(u16)

inline uint64_t divUp(uint64_t a, uint64_t b) { return (a + b - 1) / b; }
inline uint64_t roundUp(uint64_t a, uint64_t b) { return divUp(a, b) * b; }

// Archive bytes before the compressed payload (GpuANSUtils.cuh:68-81).
inline uint64_t compressedOverhead(uint64_t numBlocks) {
  return 32 + 2 * kNumSymbols + 4 * kNumInterleaved * numBlocks +
         8 * roundUp(numBlocks, 2);
}

// Loose guaranteed bound, replicating the reference's use of
// overhead(kBlockSize) — i.e. as if there were 4096 blocks
// (GpuANSEncode.cu:13-25).
inline uint64_t maxCompressedSize(uint64_t bytes) {
  uint64_t blocks = divUp(bytes, kBlockSize);
  uint64_t raw = compressedOverhead(kBlockSize);
  raw += roundUp(kBlockSize + kBlockSize / 4, 16) * blocks;
  return roundUp(raw, 16);
}

uint8_t checksumBytes(const uint8_t* data, uint64_t n) {
  // Byte-order-insensitive folded XOR (GpuChecksum.cuh:27-93): XOR of all
  // bytes. Vectorize via u64 lanes then fold.
  uint64_t acc = 0;
  uint64_t i = 0;
  const uint64_t n8 = n / 8 * 8;
  for (; i < n8; i += 8) {
    uint64_t v;
    std::memcpy(&v, data + i, 8);
    acc ^= v;
  }
  uint8_t c = 0;
  for (int b = 0; b < 8; ++b) c ^= uint8_t(acc >> (8 * b));
  for (; i < n; ++i) c ^= data[i];
  return c;
}

// Quantize a histogram to weights summing to exactly 2^probBits, replicating
// normalizeProbabilitiesFromHistogram (GpuANSStatistics.cuh:179-367)
// bit-for-bit, including the f32 rounding of the initial estimate and the
// sort-order rebalancing quirks.
void normalizeProbs(const uint64_t* hist, uint64_t total, int probBits,
                    uint16_t* pdf) {
  const uint32_t K = 1u << probBits;
  if (total == 0) {
    std::memset(pdf, 0, kNumSymbols * sizeof(uint16_t));
    return;
  }
  int64_t q[kNumSymbols];
  int64_t sum = 0;
  for (uint32_t s = 0; s < kNumSymbols; ++s) {
    // IEEE f32: ratio rounds to nearest, product truncates on u32 cast —
    // identical to the device code (GpuANSStatistics.cuh:210-221). Built
    // with -ffp-contract=off so no FMA changes the rounding.
    float ratio = float(hist[s]) / float(total);
    uint32_t qi = uint32_t(float(K) * ratio);
    if (hist[s] > 0 && qi == 0) qi = 1;
    q[s] = qi;
    sum += qi;
  }
  int64_t diff = int64_t(K) - sum;
  if (diff > 0) {
    // +1 per symbol value in ascending order, wrapping in 256-wide passes
    // (GpuANSStatistics.cuh:258-273).
    for (uint32_t s = 0; s < kNumSymbols; ++s)
      q[s] += diff / kNumSymbols + (int64_t(s) < (diff % kNumSymbols) ? 1 : 0);
  } else if (diff < 0) {
    // -1 to the smallest weights > 1, in the fixed descending order of the
    // packed key (q<<16)|sym (GpuANSStatistics.cuh:274-315).
    uint32_t order[kNumSymbols];
    for (uint32_t s = 0; s < kNumSymbols; ++s) order[s] = s;
    std::sort(order, order + kNumSymbols, [&](uint32_t a, uint32_t b) {
      return ((q[a] << 16) | a) > ((q[b] << 16) | b);
    });
    int64_t vals[kNumSymbols];
    for (uint32_t i = 0; i < kNumSymbols; ++i) vals[i] = q[order[i]];
    int64_t need = -diff;
    while (need > 0) {
      int64_t gt1 = 0;
      for (uint32_t i = 0; i < kNumSymbols; ++i) gt1 += vals[i] > 1;
      int64_t itr = std::min(need, gt1);
      if (itr <= 0) return;  // cannot reduce further (caller validates sum)
      for (int64_t i = gt1 - itr; i < gt1; ++i) vals[i] -= 1;
      need -= itr;
    }
    for (uint32_t i = 0; i < kNumSymbols; ++i) q[order[i]] = vals[i];
  }
  for (uint32_t s = 0; s < kNumSymbols; ++s) pdf[s] = uint16_t(q[s]);
}

struct BlockResult {
  uint32_t states[kNumInterleaved];
  uint32_t words;  // emitted u16 count (pre-alignment)
};

// Per-symbol encode table: pdf/cdf plus the reference's constant-division
// pair (GpuANSStatistics.cuh:345-358) so the hot loop is divide-free.
struct EncodeEntry {
  uint32_t pdf;
  uint32_t cdf;
  uint32_t magic;   // ((2^32 * (2^shift - pdf)) / pdf) + 1
  uint32_t shift;   // bit width of (pdf - 1)
};

inline uint32_t magicDiv(uint32_t x, const EncodeEntry& e) {
  const uint32_t t = uint32_t((uint64_t(x) * e.magic) >> 32);
  return (t + x) >> e.shift;
}

// Encode one 4096-byte (or tail) block: 32 interleaved lanes, flushes in
// ascending-lane order within a step (encodeOneWarp, GpuANSEncode.cuh:49-90).
// Returns false on per-block payload overflow (reference device assert,
// GpuANSEncode.cuh:355-360).
bool encodeBlock(const uint8_t* data, uint32_t uncomp, const EncodeEntry* tab,
                 int probBits, uint16_t* stream, BlockResult* res) {
  uint32_t state[kNumInterleaved];
  for (uint32_t l = 0; l < kNumInterleaved; ++l) state[l] = kStartState;
  uint32_t words = 0;
  const uint32_t checkShift = kStateBits - uint32_t(probBits);
  const uint32_t steps = uint32_t(divUp(uncomp, kNumInterleaved));
  for (uint32_t k = 0; k < steps; ++k) {
    const uint32_t base = k * kNumInterleaved;
    const uint32_t lanes =
        std::min(kNumInterleaved, uncomp - base);
    for (uint32_t l = 0; l < lanes; ++l) {
      const EncodeEntry e = tab[data[base + l]];
      uint32_t st = state[l];
      // Branchless flush: the write is unconditional (slot is overwritten by
      // the next flush when not taken), only the cursor/shift depend on it.
      const uint32_t flush = st >= (e.pdf << checkShift);
      stream[words] = uint16_t(st & 0xffff);
      words += flush;
      st >>= 16 * flush;
      const uint32_t div = magicDiv(st, e);
      state[l] = (div << probBits) + (st - div * e.pdf) + e.cdf;
    }
    if (words > kMaxCompWordsPerBlock) return false;
  }
  if (words > kMaxCompWordsPerBlock) return false;
  for (uint32_t l = 0; l < kNumInterleaved; ++l) res->states[l] = state[l];
  res->words = words;
  return true;
}

// Decode one block backwards (decodeOneWarp, GpuANSDecode.cuh:55-105):
// stream consumed from the tail with descending-lane priority. The LUT is
// the reference's packed u32 form (GpuANSDecode.cuh:29-53):
// (sminus << 20) | (pdf << 8) | sym — one L1-resident load per symbol.
//
// Renormalization reads are branchless: every lane loads `stream[pos-rank]`
// unconditionally and folds the value in via flag arithmetic. Lanes that
// don't read may load up to 64 bytes before the block's payload — always
// inside the archive (the payload region is preceded by >= 552 header
// bytes), and the value is discarded.
void decodeBlock(const uint32_t* statesIn, const uint16_t* stream,
                 uint32_t cwords, uint32_t uncomp, const uint32_t* lut,
                 int probBits, uint8_t* out) {
  uint32_t state[kNumInterleaved];
  for (uint32_t l = 0; l < kNumInterleaved; ++l) state[l] = statesIn[l];
  int64_t pos = cwords;
  const uint32_t mask = (1u << probBits) - 1;
  const uint32_t steps = uint32_t(divUp(uncomp, kNumInterleaved));
  const uint32_t rem = uncomp % kNumInterleaved;
  for (int64_t k = int64_t(steps) - 1; k >= 0; --k) {
    const uint32_t lanes =
        (k == int64_t(steps) - 1 && rem > 0) ? rem : kNumInterleaved;
    const uint32_t base = uint32_t(k) * kNumInterleaved;
    uint32_t take[kNumInterleaved];
    for (uint32_t l = 0; l < lanes; ++l) {
      const uint32_t t = lut[state[l] & mask];
      out[base + l] = uint8_t(t);
      const uint32_t st =
          ((t >> 8) & 0xfff) * (state[l] >> probBits) + (t >> 20);
      state[l] = st;
      take[l] = st < kMinState;
    }
    // Descending-lane read priority via suffix ranks (the warp-ballot
    // analogue): rank[l] = #reads at lanes >= l, so every stream load is
    // independent of the serial `pos -= take` chain.
    uint32_t rank = 0;
    for (int64_t l = int64_t(lanes) - 1; l >= 0; --l) {
      rank += take[l];
      const uint32_t st = state[l];
      const uint32_t v = stream[pos - rank];
      state[l] = take[l] ? (st << 16) + v : st;
    }
    pos -= rank;
  }
}

struct AnsInfo {
  uint64_t numBlocks = 0;
  uint64_t uncompressedBytes = 0;
  uint64_t totalCompressedWords = 0;
  int probBits = 0;
  bool useChecksum = false;
  uint8_t checksum = 0;
  uint64_t dataStart = 0;       // byte offset of payload
  uint64_t totalArchiveBytes = 0;
};

// status codes shared with the ctypes wrapper
enum Status : int {
  kOk = 0,
  kErrCapacity = 1,     // output too small; required size reported
  kErrChecksum = 2,
  kErrFormat = 3,       // bad magic/version/probBits
  kErrOverflow = 4,     // per-block payload bound exceeded during encode
};

int parseAnsHeader(const uint8_t* arc, uint64_t arcSize, AnsInfo* info) {
  if (arcSize < 32) return kErrFormat;
  uint32_t h[8];
  std::memcpy(h, arc, 32);
  if ((h[0] >> 16) != kAnsMagic || (h[0] & 0xffff) != kAnsVersion)
    return kErrFormat;
  info->numBlocks = h[1];
  info->uncompressedBytes = h[2];
  info->totalCompressedWords = h[3];
  info->probBits = int(h[4] & 0xf);
  info->useChecksum = (h[4] >> 4) & 1;
  info->checksum = uint8_t(h[5]);
  info->dataStart = compressedOverhead(info->numBlocks);
  info->totalArchiveBytes = info->dataStart + 2 * info->totalCompressedWords;
  if (info->probBits < 9 || info->probBits > 11) return kErrFormat;
  return kOk;
}

int ansEncodeImpl(const uint8_t* data, uint64_t n, int probBits,
                  int useChecksum, const uint64_t* precomputedHist,
                  uint8_t* out, uint64_t outCap, uint64_t* outSize) {
  if (probBits < 9 || probBits > 11) return kErrFormat;
  const uint64_t nb = divUp(n, kBlockSize);
  const uint64_t overhead = compressedOverhead(nb);

  uint64_t hist[kNumSymbols] = {0};
  if (precomputedHist) {
    std::memcpy(hist, precomputedHist, sizeof(hist));
  } else {
    // Per-thread sub-histograms over 1 MiB chunks.
#if defined(_OPENMP)
#pragma omp parallel
    {
      uint64_t local[kNumSymbols] = {0};
#pragma omp for schedule(static) nowait
      for (int64_t c = 0; c < int64_t(divUp(n, 1 << 20)); ++c) {
        const uint64_t lo = uint64_t(c) << 20;
        const uint64_t hi = std::min(n, lo + (uint64_t(1) << 20));
        for (uint64_t i = lo; i < hi; ++i) local[data[i]]++;
      }
#pragma omp critical
      for (uint32_t s = 0; s < kNumSymbols; ++s) hist[s] += local[s];
    }
#else
    for (uint64_t i = 0; i < n; ++i) hist[data[i]]++;
#endif
  }

  uint16_t pdf[kNumSymbols];
  normalizeProbs(hist, n, probBits, pdf);
  EncodeEntry tab[kNumSymbols];
  uint32_t cdf = 0;
  for (uint32_t s = 0; s < kNumSymbols; ++s) {
    const uint32_t p = std::max<uint32_t>(pdf[s], 1);
    uint32_t shift = 0;
    while ((1u << shift) < p) ++shift;  // bit width of (p - 1)
    tab[s] = {pdf[s], cdf,
              uint32_t(((uint64_t(1) << 32) * ((uint64_t(1) << shift) - p)) / p + 1),
              shift};
    cdf += pdf[s];
  }

  std::vector<BlockResult> results(nb);
  // +kNumInterleaved slack per block: the branchless flush can run up to one
  // 32-lane step past the bound before the overflow check fires.
  const uint64_t streamStride = kMaxCompWordsPerBlock + kNumInterleaved;
  std::vector<uint16_t> streams(nb * streamStride);
  bool overflow = false;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 16)
#endif
  for (int64_t b = 0; b < int64_t(nb); ++b) {
    const uint64_t off = uint64_t(b) * kBlockSize;
    const uint32_t uncomp = uint32_t(std::min<uint64_t>(kBlockSize, n - off));
    if (!encodeBlock(data + off, uncomp, tab, probBits,
                     streams.data() + uint64_t(b) * streamStride,
                     &results[b])) {
#if defined(_OPENMP)
#pragma omp atomic write
#endif
      overflow = true;
    }
  }
  if (overflow) return kErrOverflow;

  // Per-block 16B-aligned payload prefix (BatchPrefixSum analogue).
  std::vector<uint64_t> prefix(nb + 1);
  prefix[0] = 0;
  for (uint64_t b = 0; b < nb; ++b)
    prefix[b + 1] = prefix[b] + roundUp(results[b].words, kWordsPerAlign);
  const uint64_t totalWords = prefix[nb];
  const uint64_t totalBytes = overhead + 2 * totalWords;
  *outSize = totalBytes;
  if (totalBytes > outCap) return kErrCapacity;

  std::memset(out, 0, totalBytes);
  uint32_t h[8] = {(kAnsMagic << 16) | kAnsVersion,
                   uint32_t(nb),
                   uint32_t(n),
                   uint32_t(totalWords),
                   uint32_t((probBits & 0xf) | (useChecksum ? 1 << 4 : 0)),
                   useChecksum ? checksumBytes(data, n) : 0u,
                   0,
                   0};
  std::memcpy(out, h, 32);
  std::memcpy(out + 32, pdf, 2 * kNumSymbols);
  uint8_t* statesOut = out + 32 + 2 * kNumSymbols;
  uint8_t* bwOut = statesOut + 4 * kNumInterleaved * nb;
  uint8_t* payloadOut = out + overhead;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t b = 0; b < int64_t(nb); ++b) {
    std::memcpy(statesOut + uint64_t(b) * 128, results[b].states, 128);
    const uint64_t off = uint64_t(b) * kBlockSize;
    const uint32_t uncomp = uint32_t(std::min<uint64_t>(kBlockSize, n - off));
    // uint2 blockWords: .x = (uncompWords<<16)|compWords, .y = prefix
    // (GpuANSEncode.cuh:595-608)
    uint32_t bw2[2] = {(uncomp << 16) | results[b].words,
                       uint32_t(prefix[b])};
    std::memcpy(bwOut + uint64_t(b) * 8, bw2, 8);
    std::memcpy(payloadOut + 2 * prefix[b],
                streams.data() + uint64_t(b) * streamStride,
                2 * uint64_t(results[b].words));
  }
  return kOk;
}

int ansDecodeImpl(const uint8_t* arc, uint64_t arcSize, uint8_t* out,
                  uint64_t outCap, uint64_t* outN) {
  AnsInfo info;
  int st = parseAnsHeader(arc, arcSize, &info);
  if (st != kOk) return st;
  const uint64_t n = info.uncompressedBytes;
  *outN = n;
  if (outCap < n) return kErrCapacity;
  if (n == 0) return kOk;

  const int probBits = info.probBits;
  const uint32_t K = 1u << probBits;
  const uint16_t* pdf = reinterpret_cast<const uint16_t*>(arc + 32);
  // Decode LUT: slot j in [cdf[s], cdf[s]+pdf[s]) -> (s, pdf[s], j-cdf[s]),
  // packed (sminus<<20)|(pdf<<8)|sym (ansDecodeTable, GpuANSDecode.cuh:29-53,
  // :405-476).
  std::vector<uint32_t> lut(K);
  {
    uint32_t j = 0;
    for (uint32_t s = 0; s < kNumSymbols; ++s) {
      for (uint32_t i = 0; i < pdf[s]; ++i, ++j)
        lut[j] = (i << 20) | (uint32_t(pdf[s]) << 8) | s;
    }
    if (j != K) return kErrFormat;
  }

  const uint64_t nb = info.numBlocks;
  const uint8_t* statesIn = arc + 32 + 2 * kNumSymbols;
  const uint8_t* bwIn = statesIn + 4 * kNumInterleaved * nb;
  const uint16_t* payload =
      reinterpret_cast<const uint16_t*>(arc + info.dataStart);

  bool malformed = false;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 16)
#endif
  for (int64_t b = 0; b < int64_t(nb); ++b) {
    uint32_t states[kNumInterleaved];
    std::memcpy(states, statesIn + uint64_t(b) * 128, 128);
    uint32_t bw2[2];
    std::memcpy(bw2, bwIn + uint64_t(b) * 8, 8);
    const uint32_t uncomp = bw2[0] >> 16;
    const uint32_t cwords = bw2[0] & 0xffff;
    const uint64_t off = uint64_t(b) * kBlockSize;
    // Bounds-check hostile headers before touching payload/output memory.
    if (uncomp > kBlockSize || off + uncomp > n ||
        cwords > kMaxCompWordsPerBlock ||
        uint64_t(bw2[1]) + cwords > info.totalCompressedWords) {
#if defined(_OPENMP)
#pragma omp atomic write
#endif
      malformed = true;
      continue;
    }
    decodeBlock(states, payload + bw2[1], cwords, uncomp, lut.data(),
                probBits, out + off);
  }
  if (malformed) return kErrFormat;

  if (info.useChecksum && checksumBytes(out, n) != info.checksum)
    return kErrChecksum;
  return kOk;
}

// ---- float codec ----------------------------------------------------------

// Bytes of the raw-stored plane(s) past the float header
// (GpuFloatUtils.cuh:123-127, :163-167, :194-203).
inline uint64_t floatNoncompBytes(int ft, uint64_t n) {
  if (ft == 1 || ft == 2) return roundUp(n, 16);
  return 2 * roundUp(n, 8) + roundUp(n, 16);  // f32: u16 low + u8 high planes
}

inline int floatWordSize(int ft) { return ft == 3 ? 4 : 2; }

struct FloatInfo {
  uint64_t size = 0;  // float words
  int floatType = 0;
  bool useChecksum = false;
  uint8_t checksum = 0;
  uint64_t ansStart = 0;
};

int parseFloatHeader(const uint8_t* arc, uint64_t arcSize, FloatInfo* info) {
  if (arcSize < 16) return kErrFormat;
  uint32_t h[4];
  std::memcpy(h, arc, 16);
  if ((h[0] >> 16) != kFloatMagic || (h[0] & 0xffff) != kFloatVersion)
    return kErrFormat;
  info->size = h[1];
  info->floatType = int(h[2] & 0xf);
  info->useChecksum = (h[2] >> 4) & 1;
  info->checksum = uint8_t(h[3]);
  if (info->floatType < 1 || info->floatType > 3) return kErrFormat;
  info->ansStart = 16 + floatNoncompBytes(info->floatType, info->size);
  return kOk;
}

// Split transforms (FloatTypeInfo<FT>::split, GpuFloatUtils.cuh:111-203).
void floatSplit(const uint8_t* words, uint64_t n, int ft, uint8_t* comp,
                uint8_t* plane) {
  if (ft == 1) {  // f16: comp = high byte, nonComp = low byte
    const uint16_t* w = reinterpret_cast<const uint16_t*>(words);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i) {
      comp[i] = uint8_t(w[i] >> 8);
      plane[i] = uint8_t(w[i]);
    }
  } else if (ft == 2) {  // bf16: rotl16(w,1) -> comp = exponent byte
    const uint16_t* w = reinterpret_cast<const uint16_t*>(words);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i) {
      const uint16_t r = uint16_t((w[i] << 1) | (w[i] >> 15));
      comp[i] = uint8_t(r >> 8);
      plane[i] = uint8_t(r);
    }
  } else {  // f32: rotl32(w,1); u16 low plane then u8 high plane
    const uint32_t* w = reinterpret_cast<const uint32_t*>(words);
    uint16_t* lo = reinterpret_cast<uint16_t*>(plane);
    uint8_t* hi = plane + 2 * roundUp(n, 8);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i) {
      const uint32_t v = (w[i] << 1) | (w[i] >> 31);
      comp[i] = uint8_t(v >> 24);
      lo[i] = uint16_t(v);
      hi[i] = uint8_t(v >> 16);
    }
  }
}

void floatJoin(const uint8_t* comp, const uint8_t* plane, uint64_t n, int ft,
               uint8_t* words) {
  if (ft == 1) {
    uint16_t* w = reinterpret_cast<uint16_t*>(words);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i)
      w[i] = uint16_t((uint16_t(comp[i]) << 8) | plane[i]);
  } else if (ft == 2) {
    uint16_t* w = reinterpret_cast<uint16_t*>(words);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i) {
      const uint16_t r = uint16_t((uint16_t(comp[i]) << 8) | plane[i]);
      w[i] = uint16_t((r >> 1) | (r << 15));
    }
  } else {
    uint32_t* w = reinterpret_cast<uint32_t*>(words);
    const uint16_t* lo = reinterpret_cast<const uint16_t*>(plane);
    const uint8_t* hi = plane + 2 * roundUp(n, 8);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < int64_t(n); ++i) {
      const uint32_t v =
          (uint32_t(comp[i]) << 24) | (uint32_t(hi[i]) << 16) | lo[i];
      w[i] = (v >> 1) | (v << 31);
    }
  }
}

}  // namespace

extern "C" {

uint64_t dg_max_compressed_size(uint64_t bytes) {
  return maxCompressedSize(bytes);
}

uint64_t dg_max_float_compressed_size(int floatType, uint64_t n) {
  return 16 + maxCompressedSize(n) + floatNoncompBytes(floatType, n);
}

// Compress n bytes into an ANS archive. Returns a Status; *outSize is the
// archive size (or the required size on kErrCapacity).
int dg_ans_encode(const uint8_t* data, uint64_t n, int probBits,
                  int useChecksum, uint8_t* out, uint64_t outCap,
                  uint64_t* outSize) {
  return ansEncodeImpl(data, n, probBits, useChecksum, nullptr, out, outCap,
                       outSize);
}

// Decode an ANS archive. *outN is the uncompressed byte count (also set on
// kErrCapacity so callers can size-discover with outCap = 0).
int dg_ans_decode(const uint8_t* arc, uint64_t arcSize, uint8_t* out,
                  uint64_t outCap, uint64_t* outN) {
  return ansDecodeImpl(arc, arcSize, out, outCap, outN);
}

// Archive info (ansGetCompressedInfo analogue, GpuANSInfo.cuh:16-37).
int dg_ans_info(const uint8_t* arc, uint64_t arcSize, uint64_t* outBytes,
                uint64_t* archiveBytes, int* probBits, int* useChecksum,
                uint32_t* checksum) {
  AnsInfo info;
  int st = parseAnsHeader(arc, arcSize, &info);
  if (st != kOk) return st;
  *outBytes = info.uncompressedBytes;
  *archiveBytes = info.totalArchiveBytes;
  *probBits = info.probBits;
  *useChecksum = info.useChecksum;
  *checksum = info.checksum;
  return kOk;
}

// Compress n float words (floatType 1=f16, 2=bf16, 3=f32) into a float
// archive: [GpuFloatHeader][nonComp plane(s)][ANS archive of exponents].
int dg_float_compress(const uint8_t* words, uint64_t n, int floatType,
                      int probBits, int useChecksum, uint8_t* out,
                      uint64_t outCap, uint64_t* outSize) {
  if (floatType < 1 || floatType > 3) return kErrFormat;
  const uint64_t planeBytes = floatNoncompBytes(floatType, n);
  const uint64_t headerAndPlane = 16 + planeBytes;
  if (outCap < headerAndPlane) {
    *outSize = dg_max_float_compressed_size(floatType, n);
    return kErrCapacity;
  }
  std::vector<uint8_t> comp(n);
  std::memset(out + 16, 0, planeBytes);
  floatSplit(words, n, floatType, comp.data(), out + 16);

  uint64_t ansSize = 0;
  // ANS-level checksum is disallowed under the float codec; the float header
  // carries its own (GpuFloatCodec.h:55-77).
  int st = ansEncodeImpl(comp.data(), n, probBits, 0, nullptr,
                         out + headerAndPlane, outCap - headerAndPlane,
                         &ansSize);
  if (st == kErrCapacity) {
    *outSize = headerAndPlane + ansSize;
    return kErrCapacity;
  }
  if (st != kOk) return st;
  const uint64_t wordBytes = uint64_t(floatWordSize(floatType)) * n;
  uint32_t h[4] = {
      (kFloatMagic << 16) | kFloatVersion, uint32_t(n),
      uint32_t((floatType & 0xf) | (useChecksum ? 1 << 4 : 0)),
      useChecksum ? checksumBytes(words, wordBytes) : 0u};
  std::memcpy(out, h, 16);
  *outSize = headerAndPlane + ansSize;
  return kOk;
}

// Decode a float archive into raw float words. outCapWords in float words;
// *outN reports the word count (also on kErrCapacity).
int dg_float_decompress(const uint8_t* arc, uint64_t arcSize, uint8_t* out,
                        uint64_t outCapWords, uint64_t* outN) {
  FloatInfo info;
  int st = parseFloatHeader(arc, arcSize, &info);
  if (st != kOk) return st;
  *outN = info.size;
  if (outCapWords < info.size) return kErrCapacity;

  std::vector<uint8_t> comp(info.size);
  uint64_t ansN = 0;
  st = ansDecodeImpl(arc + info.ansStart, arcSize - info.ansStart, comp.data(),
                     comp.size(), &ansN);
  if (st != kOk) return st;
  // ANS payload length must match the float header
  // (GpuFloatDecompress.cuh:304-313).
  if (ansN != info.size) return kErrFormat;
  floatJoin(comp.data(), arc + 16, info.size, info.floatType, out);
  if (info.useChecksum) {
    const uint64_t wordBytes =
        uint64_t(floatWordSize(info.floatType)) * info.size;
    if (checksumBytes(out, wordBytes) != info.checksum) return kErrChecksum;
  }
  return kOk;
}

// Float archive info (floatGetCompressedInfo analogue, GpuFloatInfo.cuh:18-41).
int dg_float_info(const uint8_t* arc, uint64_t arcSize, uint64_t* outWords,
                  int* floatType, int* useChecksum, uint32_t* checksum) {
  FloatInfo info;
  int st = parseFloatHeader(arc, arcSize, &info);
  if (st != kOk) return st;
  *outWords = info.size;
  *floatType = info.floatType;
  *useChecksum = info.useChecksum;
  *checksum = info.checksum;
  return kOk;
}

int dg_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
