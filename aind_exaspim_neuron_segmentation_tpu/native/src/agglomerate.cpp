// Affinity watershed + hierarchical supervoxel agglomeration.
//
// Native equivalent of the reference's waterz dependency, matching the
// call-site contract at reference inference.py:224-233:
//   agglomerate(affs float32 (3, D, H, W), thresholds,
//               aff_threshold_low=0.1, aff_threshold_high=0.9999)
// yielding one label volume per threshold (ascending), of which the
// reference keeps only the last.
//
// Affinity convention (matches core.affinities): aff[c][z][y][x] is the
// edge weight between voxel v=(z,y,x) and v + e_c, where e_0=(1,0,0),
// e_1=(0,1,0), e_2=(0,0,1); entries in the last plane along axis c are
// out-of-range and ignored.
//
// Algorithm:
//  1. Fragments: steepest-ascent affinity watershed. Every edge with
//     aff >= high is unioned outright (seeding); every voxel whose max
//     incident affinity m(v) >= low is unioned with its steepest
//     neighbor (deterministic tie-break by edge enumeration order).
//     Voxels with m(v) < low are background (0). This follows the
//     watershed construction of Zlateski & Seung (zwatershed), which
//     waterz embeds.
//  2. Region adjacency graph with a 256-bin affinity histogram per edge.
//  3. Hierarchical agglomeration: edges are merged in order of
//     increasing score = 1 - quantile(affinities, q) (q = 85th
//     percentile by default, waterz's default scoring function
//     OneMinus<QuantileAffinity<85>>), with lazy-deletion priority
//     queue and histogram merging. After exhausting scores <= t for
//     each requested threshold t (ascending), the current labeling is
//     snapshotted.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdio>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <thread>
#include <unordered_map>
#include <vector>

#include "common.hpp"

namespace {

constexpr int kBins = 256;

// Worker-pool over contiguous Z-ranges (the TEASAR pattern,
// teasar.cpp:443-476): results are written to disjoint per-block or
// per-voxel slots, so output is deterministic for any thread count.
// EXA_NUM_THREADS overrides (0/unset = hardware concurrency).
int num_threads() {
  if (const char* env = std::getenv("EXA_NUM_THREADS")) {
    const int v = std::atoi(env);
    if (v > 0) return v;
  }
  const unsigned hc = std::thread::hardware_concurrency();
  return hc > 0 ? static_cast<int>(hc) : 1;
}

template <typename Fn>
void parallel_blocks(int64_t n_blocks, Fn&& fn) {
  const int threads = std::min<int64_t>(num_threads(), n_blocks);
  if (threads <= 1) {
    for (int64_t b = 0; b < n_blocks; ++b) fn(b);
    return;
  }
  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    while (true) {
      const int64_t b = next.fetch_add(1);
      if (b >= n_blocks) return;
      fn(b);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

struct EdgeKey {
  uint32_t a, b;  // a < b (fragment root ids at creation time)
  bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
  uint64_t packed() const {
    return (static_cast<uint64_t>(a) << 32) | b;
  }
};

// Open-addressing uint64 -> uint32 map. The RAG merge loop performs
// tens of millions of erase/find/insert operations; std::unordered_map's
// node allocations dominated the single-core profile, so edge keys live
// in one flat probe array (linear probing, tombstone deletes, grow at
// 60% load).
// Deterministic FlatMap rebuild accounting, reported under
// EXA_DEBUG_TIMING: wall-clock A/Bs on the shared dev host are
// steal-noise-dominated, so rebuild-policy changes are validated
// against these counters (rebuild count, entries reinserted, capacity
// allocated) as well. Only touched inside grow(), never on the probe
// hot path.
static std::atomic<uint64_t> g_flat_rebuilds{0};
static std::atomic<uint64_t> g_flat_reinserted{0};
static std::atomic<uint64_t> g_flat_cap_allocated{0};
// Histogram promotions (inline sample buffer -> dense 256-bin
// histogram, a 1 KiB allocation each) -- same diagnostic role.
static std::atomic<uint64_t> g_hist_promotions{0};

class FlatMap {
  // Sentinels exploit the key domain: every key is EdgeKey::packed(),
  // i.e. (min << 32) | max with 1 <= min < max, so neither 0 nor ~0
  // can ever be a real key. Empty == 0 lets fresh tables come from
  // calloc: large allocations are lazily-faulted zero pages, so
  // (re)building a table costs O(entries touched), not an O(capacity)
  // memset -- the explicit fill was 60% of the merge loop's CPU time
  // at SURVEY-scale RAGs.
  static constexpr uint64_t kEmpty = 0;
  static constexpr uint64_t kTomb = ~0ull;

  struct Entry {
    uint64_t key;
    uint32_t val;
    uint32_t pad;
  };  // 16 B: one cache line covers four slots -- a probe touches one
      // line instead of two separate key/value arrays

  Entry* slots_ = nullptr;
  size_t cap_ = 0;
  size_t mask_ = 0;
  size_t used_ = 0;   // live + tombstones
  size_t live_ = 0;

  static Entry* alloc(size_t cap) {
    return static_cast<Entry*>(std::calloc(cap, sizeof(Entry)));
  }

  static size_t mix(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 29;
    return static_cast<size_t>(k);
  }

  void grow() {
    // Size to LIVE entries (<=25% load after the rebuild): the merge
    // loop erases tens of millions of keys, so by the time the load
    // trigger fires most occupied slots are usually tombstones. The
    // rebuild both sweeps them (short probe chains again) and SHRINKS
    // the table as its component's edges die off, instead of scaling
    // capacity with cumulative insert traffic. Capacity decays at most
    // 2x per rebuild: shrinking straight to 4*live would leave only
    // ~live spare slots before the next trigger, making rebuilds too
    // frequent to amortize.
    size_t cap = 16;
    while (cap < (live_ + 1) * 4) cap <<= 1;
    if (cap < cap_ / 2) cap = cap_ / 2;
    g_flat_rebuilds.fetch_add(1, std::memory_order_relaxed);
    g_flat_reinserted.fetch_add(live_, std::memory_order_relaxed);
    g_flat_cap_allocated.fetch_add(cap, std::memory_order_relaxed);
    Entry* old = slots_;
    const size_t old_cap = cap_;
    slots_ = alloc(cap);
    cap_ = cap;
    mask_ = cap - 1;
    used_ = live_ = 0;
    for (size_t i = 0; i < old_cap; ++i) {
      const Entry& e = old[i];
      if (e.key != kEmpty && e.key != kTomb) insert(e.key, e.val);
    }
    std::free(old);
  }

 public:
  explicit FlatMap(size_t hint = 16) {
    size_t cap = 16;
    while (cap < hint * 2) cap <<= 1;
    slots_ = alloc(cap);
    cap_ = cap;
    mask_ = cap - 1;
  }

  FlatMap(const FlatMap&) = delete;
  FlatMap& operator=(const FlatMap&) = delete;
  FlatMap(FlatMap&& o) noexcept
      : slots_(o.slots_), cap_(o.cap_), mask_(o.mask_), used_(o.used_),
        live_(o.live_) {
    o.slots_ = nullptr;
    o.cap_ = 0;
  }
  FlatMap& operator=(FlatMap&& o) noexcept {
    if (this != &o) {
      std::free(slots_);
      slots_ = o.slots_;
      cap_ = o.cap_;
      mask_ = o.mask_;
      used_ = o.used_;
      live_ = o.live_;
      o.slots_ = nullptr;
      o.cap_ = 0;
    }
    return *this;
  }
  ~FlatMap() { std::free(slots_); }

  // Returns pointer to value or nullptr.
  uint32_t* find(uint64_t key) {
    size_t i = mix(key) & mask_;
    while (true) {
      Entry& e = slots_[i];
      if (e.key == key) return &e.val;
      if (e.key == kEmpty) return nullptr;
      i = (i + 1) & mask_;
    }
  }

  // One probe sequence: existing slot, or insert val_if_new.
  // Returns (value pointer, inserted?).
  std::pair<uint32_t*, bool> find_or_insert(uint64_t key,
                                            uint32_t val_if_new) {
    if ((used_ + 1) * 2 > cap_) grow();
    size_t i = mix(key) & mask_;
    size_t tomb = SIZE_MAX;
    while (true) {
      Entry& e = slots_[i];
      if (e.key == key) return {&e.val, false};
      if (e.key == kTomb && tomb == SIZE_MAX) tomb = i;
      if (e.key == kEmpty) {
        size_t slot = tomb != SIZE_MAX ? tomb : i;
        if (tomb == SIZE_MAX) ++used_;
        slots_[slot] = Entry{key, val_if_new, 0};
        ++live_;
        return {&slots_[slot].val, true};
      }
      i = (i + 1) & mask_;
    }
  }

  void insert(uint64_t key, uint32_t val) {
    auto [ptr, inserted] = find_or_insert(key, val);
    if (!inserted) *ptr = val;
  }

  void erase(uint64_t key) {
    size_t i = mix(key) & mask_;
    while (true) {
      Entry& e = slots_[i];
      if (e.key == key) {
        e.key = kTomb;
        --live_;
        return;
      }
      if (e.key == kEmpty) return;
      i = (i + 1) & mask_;
    }
  }

  // Clear and resize for `hint` expected entries (the component-merge
  // workers reset one scratch map per RAG component). free + calloc is
  // cheaper than clearing in place: the kernel hands back zero pages.
  void reset(size_t hint) {
    size_t cap = 16;
    while (cap < hint * 2) cap <<= 1;
    std::free(slots_);
    slots_ = alloc(cap);
    cap_ = cap;
    mask_ = cap - 1;
    used_ = live_ = 0;
  }
};

// Memory-compact affinity distribution per RAG edge. Fragment counts
// reach millions on noisy affinities (SURVEY-scale volumes), so a dense
// 256-bin uint32 histogram per edge (1 KiB) is prohibitive. Edges keep
// raw u8-quantized samples inline while small and convert to a dense
// histogram only when they grow past kInlineMax (merged supervoxel
// boundaries) -- identical quantile results either way, since both
// representations hold the same 256-level quantization.
struct Edge {
  // Inline sample buffer: most RAG edges between watershed fragments
  // carry a handful of boundary voxels, so quantized samples live
  // inside the struct (no per-edge heap allocation); edges that grow
  // past kInlineMax (merged supervoxel boundaries) switch to a dense
  // 256-bin histogram. Identical quantile results either way.
  static constexpr size_t kInlineMax = 24;

  // NOTE: liveness is NOT stored here -- the merge loop keeps it in a
  // compact side bitvector so its hot path (skipping dead lazy-deletion
  // queue entries and scanning adjacency lists) never has to pull these
  // 72-byte structs through the cache: at SURVEY-scale RAGs (22M edges
  // = 1.6 GB of Edge data) the liveness checks dominated DRAM traffic.
  uint32_t a, b;
  uint64_t count = 0;
  std::vector<uint32_t> hist;  // dense histogram once large
  uint8_t inl[kInlineMax];     // quantized affinities while small
  uint8_t n_inl = 0;
  int16_t cached_bin = -1;     // invalidated on add/absorb

  Edge(uint32_t a_, uint32_t b_) : a(a_), b(b_) {}

  static uint8_t quantize(float aff) {
    int bin = static_cast<int>(aff * kBins);
    if (bin < 0) bin = 0;
    if (bin >= kBins) bin = kBins - 1;
    return static_cast<uint8_t>(bin);
  }

  void to_hist() {
    g_hist_promotions.fetch_add(1, std::memory_order_relaxed);
    hist.assign(kBins, 0);
    for (int i = 0; i < n_inl; ++i) ++hist[inl[i]];
    n_inl = 0;
  }

  void add_bin(uint8_t q) {
    if (hist.empty()) {
      if (n_inl == kInlineMax) to_hist();
    }
    if (hist.empty()) {
      inl[n_inl++] = q;
    } else {
      ++hist[q];
    }
    ++count;
    cached_bin = -1;
  }

  void add(float aff) { add_bin(quantize(aff)); }

  void absorb(Edge& o) {
    if (hist.empty() && o.hist.empty() &&
        size_t(n_inl) + o.n_inl <= kInlineMax) {
      std::memcpy(inl + n_inl, o.inl, o.n_inl);
      n_inl = static_cast<uint8_t>(n_inl + o.n_inl);
    } else if (hist.empty() && !o.hist.empty()) {
      // Steal o's dense histogram instead of allocating a fresh 1 KiB
      // buffer and adding 256 bins: counts are commutative sums, so
      // dropping our inline samples into o's buffer yields the
      // identical distribution.
      hist = std::move(o.hist);
      for (int i = 0; i < n_inl; ++i) ++hist[inl[i]];
      n_inl = 0;
    } else {
      if (hist.empty()) to_hist();
      if (!o.hist.empty()) {
        for (int i = 0; i < kBins; ++i) hist[i] += o.hist[i];
      } else {
        for (int i = 0; i < o.n_inl; ++i) ++hist[o.inl[i]];
      }
    }
    count += o.count;
    cached_bin = -1;
    o.n_inl = 0;
    o.hist.clear();
    o.hist.shrink_to_fit();
  }

  // Quantile bin of the affinity distribution; cached until the
  // distribution changes. score = 1 - (bin + 0.5)/256.
  int score_bin(int quantile_pct) {
    if (cached_bin >= 0) return cached_bin;
    if (count == 0) return -1;  // empty: score 1.0
    const uint64_t target = (count - 1) * quantile_pct / 100;
    int bin;
    if (hist.empty()) {
      uint8_t tmp[kInlineMax];
      std::memcpy(tmp, inl, n_inl);
      std::nth_element(tmp, tmp + target, tmp + n_inl);
      bin = tmp[target];
    } else {
      uint64_t seen = 0;
      bin = kBins - 1;
      for (int i = 0; i < kBins; ++i) {
        seen += hist[i];
        if (seen > target) {
          bin = i;
          break;
        }
      }
    }
    cached_bin = static_cast<int16_t>(bin);
    return bin;
  }

  float score(int quantile_pct) {
    const int bin = score_bin(quantile_pct);
    if (bin < 0) return 1.0f;
    return 1.0f - (bin + 0.5f) / kBins;
  }
};

// Append-only chunked Edge storage. At SURVEY-scale RAGs (tens of
// millions of 72-byte entries) std::vector reallocation both moved
// every Edge O(log E) times (26% of the single-core RAG-build profile)
// and transiently held old+new buffers (2.4 GB extra peak at E=22M).
// Fixed-size blocks keep Edge addresses stable and append O(1); each
// block reservation is one large malloc, so untouched tail pages cost
// only address space.
class EdgeStore {
  static constexpr size_t kShift = 20;  // 2^20 edges (~75 MB) per block
  static constexpr size_t kMask = (size_t(1) << kShift) - 1;
  std::vector<std::vector<Edge>> blocks_;
  size_t size_ = 0;

 public:
  size_t size() const { return size_; }
  Edge& operator[](size_t i) { return blocks_[i >> kShift][i & kMask]; }
  const Edge& operator[](size_t i) const {
    return blocks_[i >> kShift][i & kMask];
  }
  void emplace_back(uint32_t a, uint32_t b) {
    if ((size_ & kMask) == 0) {
      blocks_.emplace_back();
      blocks_.back().reserve(kMask + 1);
    }
    blocks_.back().emplace_back(a, b);
    ++size_;
  }
  void release() {
    blocks_.clear();
    blocks_.shrink_to_fit();
    size_ = 0;
  }
};

// Pooled chunked incident lists. The merge loop appends ~3x E entries
// into per-root adjacency lists and discards each dropped root's list
// right after scanning it; as std::vector<std::vector<uint32_t>> that
// was millions of malloc/realloc/free calls plus O(entries) memcpy on
// every growth -- the allocator and memmove together dominated the
// digest-path profile. Lists are now chains of 64-byte chunks drawn
// from bump arenas with freelist recycling. Semantics-preserving by
// construction: append order and gross entry counts (including
// lazily-skipped dead edges, which the smaller-side heuristic
// deliberately counts, matching the vectors this replaces) are
// identical.
struct IncChunk {
  static constexpr int kCap = 13;
  IncChunk* next;
  uint8_t n;
  uint32_t v[kCap];  // member order packs the chunk into 64 bytes
};
static_assert(sizeof(IncChunk) == 64, "one cache line per chunk");

class ChunkArena {
  static constexpr size_t kBlock = size_t(1) << 16;  // 4 MiB of chunks
  std::vector<std::unique_ptr<IncChunk[]>> blocks_;
  size_t used_ = kBlock;
  IncChunk* free_ = nullptr;

 public:
  IncChunk* get() {
    IncChunk* c;
    if (free_ != nullptr) {
      c = free_;
      free_ = c->next;
    } else {
      if (used_ == kBlock) {
        blocks_.emplace_back(new IncChunk[kBlock]);
        used_ = 0;
      }
      c = &blocks_.back()[used_++];
    }
    c->n = 0;
    c->next = nullptr;
    return c;
  }
  // Recycles a whole chain. Chunks may have been allocated by ANY
  // arena, so every arena must outlive every list that could hold its
  // chunks (all arenas live at agglomerate_over_fragments scope).
  void recycle(IncChunk* head) {
    while (head != nullptr) {
      IncChunk* nx = head->next;
      head->next = free_;
      free_ = head;
      head = nx;
    }
  }
};

struct IncList {
  IncChunk* head = nullptr;
  IncChunk* tail = nullptr;
  uint32_t gross = 0;  // total appended, dead entries included
};

inline void inc_append(IncList& l, uint32_t val, ChunkArena& arena) {
  if (l.tail == nullptr || l.tail->n == IncChunk::kCap) {
    IncChunk* c = arena.get();
    if (l.tail != nullptr) {
      l.tail->next = c;
    } else {
      l.head = c;
    }
    l.tail = c;
  }
  l.tail->v[l.tail->n++] = val;
  ++l.gross;
}

inline int64_t vox(int64_t z, int64_t y, int64_t x, int64_t H, int64_t W) {
  return (z * H + y) * W + x;
}

// Pass 1b + renumber: replay recorded union decisions (one byte per
// voxel: bits 0-2 outgoing >= high flags, bits 3-5 steepest direction)
// and renumber foreground roots 1..K in scan order. Shared by the
// float path (exa_watershed, which builds the bytes in pass 1a) and
// the device pre-digest path (exa_watershed_plan, where the TPU built
// them).
int64_t watershed_replay(const uint8_t* plan, int64_t D, int64_t H,
                         int64_t W, uint32_t* out) {
  const int64_t N = D * H * W;
  const int64_t strides[3] = {H * W, W, 1};
  exa::UnionFind uf(static_cast<size_t>(N));
  std::vector<uint8_t> foreground(N, 0);
  for (int64_t v = 0; v < N; ++v) {
    const uint8_t pb = plan[v];
    for (int c = 0; c < 3; ++c) {
      if (pb & (1 << c)) {
        uf.unite(static_cast<uint32_t>(v),
                 static_cast<uint32_t>(v + strides[c]));
      }
    }
    const int dir = pb >> 3;
    if (dir != 0) {
      const int c = (dir - 1) % 3;
      const int64_t u = dir <= 3 ? v + strides[c] : v - strides[c];
      foreground[v] = 1;
      uf.unite(static_cast<uint32_t>(v), static_cast<uint32_t>(u));
    }
  }

  // Renumber fragment roots (foreground only) to 1..K in scan order.
  std::unordered_map<uint32_t, uint32_t> root_to_id;
  root_to_id.reserve(1024);
  uint32_t next = 1;
  for (int64_t v = 0; v < N; ++v) {
    if (!foreground[v]) {
      out[v] = 0;
      continue;
    }
    uint32_t r = uf.find(static_cast<uint32_t>(v));
    auto it = root_to_id.find(r);
    if (it == root_to_id.end()) it = root_to_id.emplace(r, next++).first;
    out[v] = it->second;
  }
  return static_cast<int64_t>(next - 1);
}

// RAG build + hierarchical agglomeration over precomputed fragments.
// SampleFn(c, v) -> uint8 quantized affinity bin of the outgoing edge
// along axis c stored at voxel v; the merge machinery operates purely
// on 256-level bins, so float and u8-pre-digested sources share this
// path bit-for-bit.
// last_only: snapshot only the final threshold into out[0..N) (the
// reference keeps only the last labeling, inference.py:229-233); out
// then needs N entries instead of n_thresholds * N -- the beyond-RAM
// path's contract.
template <typename SampleFn>
int64_t agglomerate_over_fragments(
    const uint32_t* frag, int64_t K, int64_t D, int64_t H, int64_t W,
    const float* thresholds, int64_t n_thresholds, int32_t quantile_pct,
    uint32_t* out, SampleFn&& sample, bool last_only = false) {
  const int64_t N = D * H * W;
  const bool dbg = std::getenv("EXA_DEBUG_TIMING") != nullptr;
  auto now = []() { return std::chrono::steady_clock::now(); };
  auto secs = [](auto a, auto b) {
    return std::chrono::duration<double>(b - a).count();
  };
  const int64_t strides[3] = {H * W, W, 1};

  auto t1 = now();
  // Build the RAG over fragments: each Z-slab builds a local edge map
  // in scan order (parallel), then slabs merge in ascending-Z order.
  // A voxel owns only its OUTGOING edges, so every RAG contribution is
  // counted by exactly one slab (reads of frag[] across the slab
  // boundary are fine -- frag is read-only here), and first-appearance
  // edge numbering under block-major merge equals the global scan
  // order: edge indices, sample order, and therefore quantile
  // tie-breaks are bit-identical to the serial build for ANY thread or
  // block count.
  const int64_t zz_per_block = std::max<int64_t>(1, D / 64);
  const int64_t n_blocks = (D + zz_per_block - 1) / zz_per_block;
  FlatMap edge_index(1024);
  EdgeStore edges;
  const bool serial = std::min<int64_t>(num_threads(), n_blocks) <= 1;
  // Scans one block's voxels, accumulating its outgoing-edge samples
  // into (index, store) -- per-block locals in the threaded path, the
  // global pair directly in the serial path.
  auto scan_block = [&](int64_t blk, FlatMap& index, EdgeStore& store) {
    const int64_t z_lo = blk * zz_per_block;
    const int64_t z_hi = std::min(D, z_lo + zz_per_block);
    for (int64_t z = z_lo; z < z_hi; ++z) {
      for (int64_t y = 0; y < H; ++y) {
        for (int64_t x = 0; x < W; ++x) {
          const int64_t v = vox(z, y, x, H, W);
          const uint32_t fa = frag[v];
          if (fa == 0) continue;
          const int64_t coord[3] = {z, y, x};
          const int64_t dims[3] = {D, H, W};
          for (int c = 0; c < 3; ++c) {
            if (coord[c] + 1 >= dims[c]) continue;
            const uint32_t fb = frag[v + strides[c]];
            if (fb == 0 || fb == fa) continue;
            EdgeKey key{std::min(fa, fb), std::max(fa, fb)};
            auto [slot, fresh] = index.find_or_insert(
                key.packed(), static_cast<uint32_t>(store.size()));
            if (fresh) store.emplace_back(key.a, key.b);
            store[*slot].add_bin(sample(c, v));
          }
        }
      }
    }
  };

  if (serial) {
    // Single worker: the per-block local-map + merge structure below
    // is pure overhead (a second full insert+absorb pass over every
    // edge and a transient second copy of the RAG). Build the global
    // map directly in scan order -- identical first-appearance edge
    // numbering and sample order by construction.
    for (int64_t blk = 0; blk < n_blocks; ++blk) {
      scan_block(blk, edge_index, edges);
    }
    auto t2s = now();
    if (dbg) {
      std::fprintf(stderr, "[exa] rag-local %.2fs (serial direct) E=%zu\n",
                   secs(t1, t2s), edges.size());
    }
  } else {
    std::vector<FlatMap> loc_index;
    loc_index.reserve(n_blocks);
    for (int64_t b = 0; b < n_blocks; ++b) loc_index.emplace_back(1024);
    std::vector<EdgeStore> loc_edges(n_blocks);
    parallel_blocks(n_blocks, [&](int64_t blk) {
      scan_block(blk, loc_index[blk], loc_edges[blk]);
    });

    auto t2 = now();
    if (dbg) std::fprintf(stderr, "[exa] rag-local %.2fs\n", secs(t1, t2));
    // Merge per-block maps in ascending-Z order (preserves global
    // scan-order edge numbering). Pre-size to the upper bound (sum of
    // per-block uniques): FlatMap regrowth re-hashes every entry and
    // vector regrowth copies every Edge -- at tens of millions of
    // edges both dominated this phase.
    size_t edge_upper = 0;
    for (const auto& le : loc_edges) edge_upper += le.size();
    edge_index = FlatMap(edge_upper + 1);
    for (int64_t blk = 0; blk < n_blocks; ++blk) {
      EdgeStore& les = loc_edges[blk];
      for (size_t li = 0; li < les.size(); ++li) {
        Edge& le = les[li];
        EdgeKey key{le.a, le.b};
        auto [slot, fresh] = edge_index.find_or_insert(
            key.packed(), static_cast<uint32_t>(edges.size()));
        if (fresh) edges.emplace_back(key.a, key.b);
        edges[*slot].absorb(le);
      }
      les.release();
    }
    loc_index.clear();

    auto t3m = now();
    if (dbg) {
      std::fprintf(stderr, "[exa] rag-merge %.2fs E=%zu\n", secs(t2, t3m),
                   edges.size());
    }
  }

  auto t3 = now();
  if (n_thresholds == 0) return K;
  const uint32_t E = static_cast<uint32_t>(edges.size());
  // Hot-path side arrays (see the Edge struct note): 1 byte of
  // liveness + 8 bytes of packed original endpoints per edge, so the
  // merge loop's dead-entry skips and root lookups stay in small
  // sequential arrays instead of striding the 72-byte Edge structs.
  // Built first so the adjacency/component passes below read endpoints
  // from it too.
  std::vector<uint8_t> alive(E, 1);
  std::vector<uint64_t> ends(E);
  for (uint32_t ei = 0; ei < E; ++ei) {
    ends[ei] = (static_cast<uint64_t>(edges[ei].a) << 32) | edges[ei].b;
  }
  // Adjacency: fragment root -> incident edge indices (chunk chains;
  // every arena outlives the merge phase -- see ChunkArena::recycle).
  exa::UnionFind uf(static_cast<size_t>(K) + 1);
  ChunkArena build_arena;
  std::vector<IncList> incident(K + 1);
  for (uint32_t ei = 0; ei < E; ++ei) {
    inc_append(incident[static_cast<uint32_t>(ends[ei] >> 32)], ei,
               build_arena);
    inc_append(incident[static_cast<uint32_t>(ends[ei])], ei, build_arena);
  }

  // Connected components of the RAG. Merges in different components
  // never interact: an edge's score is a function of intra-component
  // affinity distributions only, and unions touch disjoint fragment
  // sets. Each component's merge loop is therefore an independent
  // serial program, and the set of merges executed below any threshold
  // is invariant to how components are interleaved -- so components run
  // on the worker pool (neurites separated by background form separate
  // components in production volumes). Each component logs its executed
  // (keep, drop) unions plus, per threshold, how many had executed when
  // the threshold was crossed (crossing = the component's next-lowest
  // score strictly exceeds it, the exact flush rule of the fused serial
  // loop this replaces). Global snapshots replay event prefixes:
  // parent[drop] = keep in per-component order rebuilds the identical
  // union forest, so labelings are bit-identical for ANY worker count
  // (pinned by TestThreadedDeterminism + the golden fixtures).
  exa::UnionFind comp_uf(static_cast<size_t>(K) + 1);
  for (uint32_t ei = 0; ei < E; ++ei) {
    comp_uf.unite(static_cast<uint32_t>(ends[ei] >> 32),
                  static_cast<uint32_t>(ends[ei]));
  }
  std::vector<uint32_t> comp_of(E);
  std::vector<uint32_t> comp_sizes;  // edge count per component
  {
    std::unordered_map<uint32_t, uint32_t> root_to_comp;
    root_to_comp.reserve(1024);
    for (uint32_t ei = 0; ei < E; ++ei) {
      const uint32_t r = comp_uf.find(static_cast<uint32_t>(ends[ei] >> 32));
      auto it = root_to_comp.find(r);
      if (it == root_to_comp.end()) {
        it = root_to_comp
                 .emplace(r, static_cast<uint32_t>(comp_sizes.size()))
                 .first;
        comp_sizes.push_back(0);
      }
      comp_of[ei] = it->second;
      ++comp_sizes[it->second];
    }
  }
  const uint32_t n_comps = static_cast<uint32_t>(comp_sizes.size());
  // CSR edge lists per component, ascending edge index within each
  // (keeps the serial loop's FIFO ascending-edge-index tie-break:
  // buckets never mix components, so relative order is preserved).
  std::vector<uint32_t> comp_start(n_comps + 1, 0);
  for (uint32_t c = 0; c < n_comps; ++c) {
    comp_start[c + 1] = comp_start[c] + comp_sizes[c];
  }
  std::vector<uint32_t> comp_edges(E);
  {
    std::vector<uint32_t> fill(comp_start.begin(), comp_start.end() - 1);
    for (uint32_t ei = 0; ei < E; ++ei) comp_edges[fill[comp_of[ei]]++] = ei;
  }
  comp_of.clear();
  comp_of.shrink_to_fit();
  // Largest components first: workers pull from an atomic counter, so
  // the long-running components start before the tail of tiny ones.
  std::vector<uint32_t> order(n_comps);
  for (uint32_t c = 0; c < n_comps; ++c) order[c] = c;
  std::stable_sort(order.begin(), order.end(),
                   [&](uint32_t a, uint32_t b) {
                     return comp_sizes[a] > comp_sizes[b];
                   });
  if (n_comps > 1) {
    // The RAG-build map is keyed by initial fragment pairs globally;
    // workers use per-component maps instead. Free it (16 B/edge).
    edge_index = FlatMap(16);
  }

  std::vector<std::vector<std::pair<uint32_t, uint32_t>>> comp_events(
      n_comps);
  std::vector<uint32_t> cutoffs(static_cast<size_t>(n_comps) *
                                n_thresholds);

  auto t4 = now();
  if (dbg) {
    std::fprintf(stderr, "[exa] adjacency+components %.2fs C=%u\n",
                 secs(t3, t4), n_comps);
  }

  auto run_component = [&](uint32_t comp, FlatMap& local,
                           std::vector<std::vector<uint32_t>>& buckets,
                           std::vector<size_t>& heads, ChunkArena& arena) {
    const uint32_t e_lo = comp_start[comp];
    const uint32_t e_hi = comp_start[comp + 1];
    // Bucket queue: scores are 256-level quantized, so a min-heap is
    // overkill -- one FIFO bucket per score bin (ascending score
    // order; bucket 256 holds empty-distribution edges at score 1.0).
    // An edge is (re-)pushed into its current bucket whenever its
    // distribution changes; pops whose bucket no longer matches the
    // edge's bin are stale duplicates and skipped.
    auto bucket_of = [&](Edge& e) {
      const int bin = e.score_bin(quantile_pct);
      return bin < 0 ? kBins : (kBins - 1 - bin);
    };
    FlatMap* index;
    if (n_comps == 1) {
      index = &edge_index;  // the RAG-build map, keyed identically
    } else {
      local.reset(e_hi - e_lo);
      for (uint32_t i = e_lo; i < e_hi; ++i) {
        const uint32_t ei = comp_edges[i];
        local.insert(ends[ei], ei);
      }
      index = &local;
    }
    for (uint32_t i = e_lo; i < e_hi; ++i) {
      const uint32_t ei = comp_edges[i];
      buckets[bucket_of(edges[ei])].push_back(ei);
    }

    auto& evs = comp_events[comp];
    uint32_t* cut = &cutoffs[static_cast<size_t>(comp) * n_thresholds];
    int64_t t_idx = 0;
    auto flush = [&](float next_score) {
      while (t_idx < n_thresholds && next_score > thresholds[t_idx]) {
        cut[t_idx] = static_cast<uint32_t>(evs.size());
        ++t_idx;
      }
    };

    int cur = 0;
    while (cur <= kBins && t_idx < n_thresholds) {
      if (heads[cur] >= buckets[cur].size()) {
        buckets[cur].clear();
        heads[cur] = 0;
        ++cur;
        continue;
      }
      const uint32_t eidx = buckets[cur][heads[cur]++];
      if (!alive[eidx]) continue;
      const uint64_t ee = ends[eidx];
      const uint32_t ra = uf.find(static_cast<uint32_t>(ee >> 32));
      const uint32_t rb = uf.find(static_cast<uint32_t>(ee));
      if (ra == rb) {
        alive[eidx] = 0;
        continue;
      }
      Edge& e = edges[eidx];
      if (bucket_of(e) != cur) continue;  // stale: fresh entry elsewhere
      flush(e.score(quantile_pct));
      if (t_idx >= n_thresholds) break;

      // Merge the side with the SMALLER adjacency list into the
      // larger: only the small side's edges are re-keyed, so each edge
      // endpoint moves O(log K) times total (near-linear
      // agglomeration; rebuilding the large list per merge was
      // quadratic in fragments).
      uint32_t keep = ra, drop = rb;
      if (incident[keep].gross < incident[drop].gross) {
        std::swap(keep, drop);
      }
      uf.unite_into(keep, drop);
      evs.emplace_back(keep, drop);
      alive[eidx] = 0;
      index->erase(EdgeKey{std::min(ra, rb), std::max(ra, rb)}.packed());

      for (IncChunk* ch = incident[drop].head; ch != nullptr;
           ch = ch->next) {
        for (uint8_t k = 0; k < ch->n; ++k) {
        const uint32_t ei = ch->v[k];
        if (!alive[ei]) continue;
        const uint64_t fe = ends[ei];
        const uint32_t fa = uf.find(static_cast<uint32_t>(fe >> 32));
        const uint32_t fb = uf.find(static_cast<uint32_t>(fe));
        if (fa == fb) {
          alive[ei] = 0;
          continue;
        }
        const uint32_t peer = (fa == keep) ? fb : fa;
        index->erase(
            EdgeKey{std::min(drop, peer), std::max(drop, peer)}.packed());
        const EdgeKey new_key{std::min(keep, peer), std::max(keep, peer)};
        uint32_t* slot = index->find(new_key.packed());
        if (slot == nullptr || !alive[*slot]) {
          index->insert(new_key.packed(), ei);
          inc_append(incident[keep], ei, arena);
        } else if (*slot != ei) {
          Edge& g = edges[*slot];
          const uint32_t gi = *slot;
          g.absorb(edges[ei]);
          alive[ei] = 0;
          const int b = bucket_of(g);
          buckets[b].push_back(gi);
          if (b < cur) cur = b;  // score dropped: revisit earlier bucket
        }
        }
      }
      arena.recycle(incident[drop].head);
      incident[drop] = IncList{};
    }
    // Thresholds never crossed (all remaining scores <= them): every
    // executed event belongs to each remaining threshold's prefix.
    while (t_idx < n_thresholds) {
      cut[t_idx++] = static_cast<uint32_t>(evs.size());
    }
    // Scrub bucket state for the next component on this worker (early
    // break can leave entries behind).
    for (int b = 0; b <= kBins; ++b) {
      if (!buckets[b].empty()) buckets[b].clear();
      heads[b] = 0;
    }
  };

  {
    const int workers =
        static_cast<int>(std::min<int64_t>(num_threads(), n_comps));
    // Per-worker arenas at this scope: workers may recycle (and then
    // re-issue) chunks originally allocated by build_arena or another
    // worker's arena, so all arenas must outlive the whole pool.
    std::vector<ChunkArena> arenas(std::max(workers, 1));
    if (workers <= 1) {
      FlatMap local(16);
      std::vector<std::vector<uint32_t>> buckets(kBins + 1);
      std::vector<size_t> heads(kBins + 1, 0);
      for (uint32_t oi = 0; oi < n_comps; ++oi) {
        run_component(order[oi], local, buckets, heads, arenas[0]);
      }
    } else {
      std::atomic<uint32_t> next_comp{0};
      std::atomic<int> next_worker{0};
      auto worker = [&]() {
        ChunkArena& arena = arenas[next_worker.fetch_add(1)];
        FlatMap local(16);
        std::vector<std::vector<uint32_t>> buckets(kBins + 1);
        std::vector<size_t> heads(kBins + 1, 0);
        while (true) {
          const uint32_t oi = next_comp.fetch_add(1);
          if (oi >= n_comps) return;
          run_component(order[oi], local, buckets, heads, arena);
        }
      };
      std::vector<std::thread> pool;
      for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
      for (auto& t : pool) t.join();
    }
  }
  auto t5 = now();
  if (dbg) {
    std::fprintf(stderr, "[exa] merge-loop %.2fs\n", secs(t4, t5));
    std::fprintf(
        stderr,
        "[exa] flatmap rebuilds=%llu reinserted=%llu cap-allocated=%llu "
        "hist-promotions=%llu\n",
        static_cast<unsigned long long>(
            g_flat_rebuilds.load(std::memory_order_relaxed)),
        static_cast<unsigned long long>(
            g_flat_reinserted.load(std::memory_order_relaxed)),
        static_cast<unsigned long long>(
            g_flat_cap_allocated.load(std::memory_order_relaxed)),
        static_cast<unsigned long long>(
            g_hist_promotions.load(std::memory_order_relaxed)));
  }

  // Replay snapshots: advance one parent forest threshold by
  // threshold. Events record (keep, drop) root pairs at execution
  // time; within a component the replayed prefix is exactly the
  // executed prefix, so `drop` is still its own root when its event
  // applies and parent[drop] = keep reproduces unite_into.
  std::vector<uint32_t> rparent(static_cast<size_t>(K) + 1);
  for (int64_t f = 0; f <= K; ++f) rparent[f] = static_cast<uint32_t>(f);
  std::vector<uint32_t> applied(n_comps, 0);
  auto rfind = [&](uint32_t x) {
    while (rparent[x] != x) {
      rparent[x] = rparent[rparent[x]];
      x = rparent[x];
    }
    return x;
  };
  std::vector<uint32_t> lut(static_cast<size_t>(K) + 1);
  for (int64_t k = 0; k < n_thresholds; ++k) {
    for (uint32_t c = 0; c < n_comps; ++c) {
      const uint32_t to = cutoffs[static_cast<size_t>(c) * n_thresholds + k];
      const auto& evs = comp_events[c];
      for (uint32_t i = applied[c]; i < to; ++i) {
        rparent[evs[i].second] = evs[i].first;
      }
      applied[c] = to;
    }
    if (last_only && k != n_thresholds - 1) continue;
    // Flatten roots once (K entries, path-compressing), then the O(N)
    // relabel is a pure gather -- parallel over Z-slabs.
    lut[0] = 0;
    for (int64_t f = 1; f <= K; ++f) {
      lut[f] = rfind(static_cast<uint32_t>(f));
    }
    uint32_t* dst = out + (last_only ? 0 : k * N);
    const int64_t chunk = std::max<int64_t>(1, N / 64);
    const int64_t blocks = (N + chunk - 1) / chunk;
    parallel_blocks(blocks, [&](int64_t b) {
      const int64_t lo = b * chunk;
      const int64_t hi = std::min(N, lo + chunk);
      for (int64_t v = lo; v < hi; ++v) dst[v] = lut[frag[v]];
    });
  }
  if (dbg) std::fprintf(stderr, "[exa] snapshots %.2fs\n", secs(t5, now()));
  return K;
}

}  // namespace

// Watershed fragments only (exposed for testing / reuse).
// out: uint32 (D*H*W), 0 = background, fragments renumbered 1..K.
// Returns K.
EXA_API int64_t exa_watershed(const float* affs, int64_t D, int64_t H,
                              int64_t W, float low, float high,
                              uint32_t* out) {
  const int64_t N = D * H * W;
  const int64_t strides[3] = {H * W, W, 1};
  const float* aff_c[3] = {affs, affs + N, affs + 2 * N};

  // Pass 1a (parallel over Z-slabs): the affinity scan -- ~7 float
  // reads + compares per voxel, the bandwidth-bound part -- records
  // each voxel's decisions in one byte: bits 0-2 flag outgoing
  // >= high edges along z/y/x; bits 3-5 encode the steepest >= low
  // neighbor as a direction (0 = background, 1..6 = +z,+y,+x,-z,-y,-x).
  // Per-voxel writes are disjoint, so any thread count gives identical
  // bytes. Pass 1b (serial, watershed_replay) replays the recorded
  // unions -- cheap integer work with no affinity reads. The TPU
  // pre-digest path (ops/predigest.py) computes the identical bytes on
  // device and enters at exa_watershed_plan, skipping 1a entirely.
  std::vector<uint8_t> plan_bytes(N, 0);
  parallel_blocks(D, [&](int64_t z) {
    for (int64_t y = 0; y < H; ++y) {
      for (int64_t x = 0; x < W; ++x) {
        const int64_t v = vox(z, y, x, H, W);
        float best = -1.0f;
        int dir = 0;
        const int64_t coord[3] = {z, y, x};
        const int64_t dims[3] = {D, H, W};
        uint8_t flags = 0;
        // outgoing edges (v, v+e_c) stored at v; incoming stored at v-e_c
        for (int c = 0; c < 3; ++c) {
          if (coord[c] + 1 < dims[c]) {
            float a = aff_c[c][v];
            if (a >= high) flags |= static_cast<uint8_t>(1 << c);
            if (a >= low && a > best) {
              best = a;
              dir = 1 + c;
            }
          }
          if (coord[c] - 1 >= 0) {
            float a = aff_c[c][v - strides[c]];
            if (a >= low && a > best) {
              best = a;
              dir = 4 + c;
            }
          }
        }
        plan_bytes[v] = flags | static_cast<uint8_t>(dir << 3);
      }
    }
  });

  return watershed_replay(plan_bytes.data(), D, H, W, out);
}

// Watershed from device-predigested plan bytes (ops/predigest.py):
// pure integer replay, zero float reads. Same output contract as
// exa_watershed.
EXA_API int64_t exa_watershed_plan(const uint8_t* plan, int64_t D,
                                   int64_t H, int64_t W, uint32_t* out) {
  return watershed_replay(plan, D, H, W, out);
}

// Full pipeline: watershed + agglomeration snapshots.
// out: uint32 (n_thresholds * D*H*W), one labeling per threshold
// (thresholds must be ascending). Returns the fragment count K (>=0) or
// -1 on error.
EXA_API int64_t exa_agglomerate(const float* affs, int64_t D, int64_t H,
                                int64_t W, const float* thresholds,
                                int64_t n_thresholds, float low, float high,
                                int32_t quantile_pct, uint32_t* out) {
  const int64_t N = D * H * W;
  const bool dbg = std::getenv("EXA_DEBUG_TIMING") != nullptr;
  auto now = []() { return std::chrono::steady_clock::now(); };
  auto secs = [](auto a, auto b) {
    return std::chrono::duration<double>(b - a).count();
  };
  auto t0 = now();
  std::vector<uint32_t> frag(N);
  const int64_t K = exa_watershed(affs, D, H, W, low, high, frag.data());
  if (K < 0) return -1;
  auto t1 = now();
  if (dbg) std::fprintf(stderr, "[exa] watershed %.2fs K=%lld\n", secs(t0, t1), (long long)K);

  const float* aff_c[3] = {affs, affs + N, affs + 2 * N};
  return agglomerate_over_fragments(
      frag.data(), K, D, H, W, thresholds, n_thresholds, quantile_pct,
      out, [&](int c, int64_t v) { return Edge::quantize(aff_c[c][v]); });
}

// Full pipeline from device pre-digests (ops/predigest.py): plan bytes
// drive the watershed replay (zero float reads) and u8-quantized
// affinities feed the RAG histograms directly (1 byte per sample
// instead of 4). Bit-identical to exa_agglomerate on the same float
// volume: the plan bytes replicate pass 1a's f32 compares on device
// and qaff replicates Edge::quantize.
EXA_API int64_t exa_agglomerate_pre(const uint8_t* plan,
                                    const uint8_t* qaff, int64_t D,
                                    int64_t H, int64_t W,
                                    const float* thresholds,
                                    int64_t n_thresholds,
                                    int32_t quantile_pct, uint32_t* out) {
  const int64_t N = D * H * W;
  const bool dbg = std::getenv("EXA_DEBUG_TIMING") != nullptr;
  auto now = []() { return std::chrono::steady_clock::now(); };
  auto secs = [](auto a, auto b) {
    return std::chrono::duration<double>(b - a).count();
  };
  auto t0 = now();
  std::vector<uint32_t> frag(N);
  const int64_t K = watershed_replay(plan, D, H, W, frag.data());
  if (K < 0) return -1;
  auto t1 = now();
  if (dbg) std::fprintf(stderr, "[exa] watershed-replay %.2fs K=%lld\n", secs(t0, t1), (long long)K);

  const uint8_t* q_c[3] = {qaff, qaff + N, qaff + 2 * N};
  return agglomerate_over_fragments(
      frag.data(), K, D, H, W, thresholds, n_thresholds, quantile_pct,
      out, [&](int c, int64_t v) { return q_c[c][v]; });
}

// Beyond-RAM variant: identical to exa_agglomerate_pre but only the
// FINAL threshold's labeling is materialized (out needs N entries, not
// n_thresholds * N) -- at 1024^3 with three thresholds this saves
// 8.6 GB of output buffers.
EXA_API int64_t exa_agglomerate_pre_last(const uint8_t* plan,
                                         const uint8_t* qaff, int64_t D,
                                         int64_t H, int64_t W,
                                         const float* thresholds,
                                         int64_t n_thresholds,
                                         int32_t quantile_pct,
                                         uint32_t* out) {
  const int64_t N = D * H * W;
  std::vector<uint32_t> frag(N);
  const int64_t K = watershed_replay(plan, D, H, W, frag.data());
  if (K < 0) return -1;
  const uint8_t* q_c[3] = {qaff, qaff + N, qaff + 2 * N};
  return agglomerate_over_fragments(
      frag.data(), K, D, H, W, thresholds, n_thresholds, quantile_pct,
      out, [&](int c, int64_t v) { return q_c[c][v]; },
      /*last_only=*/true);
}
