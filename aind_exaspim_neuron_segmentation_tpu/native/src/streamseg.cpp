// Slab-streaming affinity watershed + agglomeration.
//
// The dense engine (agglomerate.cpp) holds the whole fragment volume,
// a voxel-granular union-find, and the output labels in RAM
// simultaneously -- ~12-16 bytes/voxel of transient state on top of
// the 4 bytes/voxel of device pre-digests. This engine implements the
// identical pipeline (reference inference.py:196-237 semantics via the
// shared merge loop in rag.hpp) as three streaming passes over Z
// slabs, so peak host RAM is O(RAG + slab), not O(volume):
//
//  pass 1 (feed):     per-slab watershed on the device-built plan
//                     bytes (ops/predigest.py) with a slab-local
//                     union-find; connected pieces are stitched across
//                     slab boundaries through a piece-granular
//                     union-find (one entry per piece, not per voxel).
//                     Emits provisional piece labels per slab; the
//                     caller parks them in a temp store.
//  pass 2 (rag_feed): re-streams provisional labels + u8 affinities,
//                     maps pieces to final watershed fragment ids, and
//                     builds the RAG in global scan order. Then the
//                     shared component-parallel merge loop runs and the
//                     requested thresholds + min-size filter compose
//                     into ONE piece->final-label lut.
//  pass 3 (map):      relabels provisional slabs through the lut.
//
// Bit parity with the dense engine (pinned by tests/test_streamseg.py):
//  * the watershed PARTITION is the connected components of the union
//    graph, independent of union order;
//  * fragment NUMBERING follows first foreground appearance in global
//    scan order: pieces record the scan index of their first
//    foreground voxel and final fragments sort by the min over their
//    pieces -- exactly the dense replay's first-appearance renumber;
//  * RAG edge numbering and per-edge sample order equal the dense scan
//    because pass 2 visits voxels in the same global scan order with
//    the same (z, y, x) edge enumeration;
//  * the merge loop is the same code (exa_rag::run_merge);
//  * the min-size filter composes the remove_small_segments rule
//    (keep strictly greater, renumber by first appearance) into the
//    final lut: iterating fragments in ascending id IS first-appearance
//    order of the merged segments.
//
// Requires aff_threshold_low <= aff_threshold_high (the pipeline
// default 0.1 <= 0.9999): then every union endpoint is a foreground
// voxel (an incident affinity >= high >= low makes both endpoints
// foreground), background components are singletons, and cross-slab
// connectivity through background is impossible. The Python driver
// validates this. On-demand piece creation below still tolerates
// targeted background voxels for robustness.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "common.hpp"
#include "rag.hpp"

namespace {

using exa_rag::Edge;
using exa_rag::EdgeKey;
using exa_rag::EdgeStore;
using exa_rag::FlatMap;

constexpr uint64_t kNoFg = ~0ull;

struct StreamSeg {
  int64_t D, H, W;

  // ---- pass 1 state ----
  int64_t z_done = 0;
  std::vector<uint32_t> prev_ids;   // piece id per last-plane voxel (0=none)
  std::vector<uint8_t> prev_plan;   // plan bytes of the last plane
  // Piece-granular union-find (1-based; grows as slabs arrive).
  std::vector<uint32_t> piece_parent;
  std::vector<uint32_t> piece_size;
  std::vector<uint64_t> piece_first_fg;  // global scan index, kNoFg=none
  std::vector<uint64_t> piece_fg_count;

  // ---- after fragments_done ----
  bool frags_done = false;
  int64_t K = 0;
  std::vector<uint32_t> ws_of_piece;  // piece -> watershed fragment id
  std::vector<uint64_t> frag_fg;      // fragment voxel counts (1..K)

  // ---- pass 2 state ----
  int64_t z_rag = 0;
  bool have_pending = false;
  std::vector<uint32_t> pending_frag;  // previous plane, watershed ids
  std::vector<uint8_t> pending_q;      // previous plane qaff (3, H, W)
  FlatMap edge_index{1024};
  EdgeStore edges;

  // ---- after merge ----
  int64_t n_segments = -1;
  std::vector<uint32_t> final_lut;  // piece -> final segment label

  StreamSeg(int64_t d, int64_t h, int64_t w) : D(d), H(h), W(w) {
    piece_parent.push_back(0);  // index 0 unused (background)
    piece_size.push_back(0);
    piece_first_fg.push_back(kNoFg);
    piece_fg_count.push_back(0);
  }

  uint32_t piece_find(uint32_t x) {
    while (piece_parent[x] != x) {
      piece_parent[x] = piece_parent[piece_parent[x]];
      x = piece_parent[x];
    }
    return x;
  }

  void piece_unite(uint32_t a, uint32_t b) {
    a = piece_find(a);
    b = piece_find(b);
    if (a == b) return;
    if (piece_size[a] < piece_size[b] ||
        (piece_size[a] == piece_size[b] && a > b)) {
      std::swap(a, b);
    }
    piece_parent[b] = a;
    piece_size[a] += piece_size[b];
  }

  uint32_t new_piece() {
    const uint32_t p = static_cast<uint32_t>(piece_parent.size());
    piece_parent.push_back(p);
    piece_size.push_back(1);
    piece_first_fg.push_back(kNoFg);
    piece_fg_count.push_back(0);
    return p;
  }
};

// One plane of RAG contributions, in the dense engine's scan order:
// per voxel the (z, y, x) outgoing edges, z first (fnext == nullptr for
// the volume's final plane, which has no outgoing z edges). q3 is the
// plane's quantized affinities laid out (3, H, W).
void rag_plane(StreamSeg& s, const uint32_t* fp, const uint8_t* q3,
               const uint32_t* fnext) {
  const int64_t H = s.H, W = s.W, HW = s.H * s.W;
  for (int64_t y = 0; y < H; ++y) {
    for (int64_t x = 0; x < W; ++x) {
      const int64_t i = y * W + x;
      const uint32_t fa = fp[i];
      if (fa == 0) continue;
      // c = 0 (z), 1 (y), 2 (x) -- same enumeration as the dense scan.
      for (int c = 0; c < 3; ++c) {
        uint32_t fb;
        if (c == 0) {
          if (fnext == nullptr) continue;
          fb = fnext[i];
        } else if (c == 1) {
          if (y + 1 >= H) continue;
          fb = fp[i + W];
        } else {
          if (x + 1 >= W) continue;
          fb = fp[i + 1];
        }
        if (fb == 0 || fb == fa) continue;
        EdgeKey key{std::min(fa, fb), std::max(fa, fb)};
        auto [slot, fresh] = s.edge_index.find_or_insert(
            key.packed(), static_cast<uint32_t>(s.edges.size()));
        if (fresh) s.edges.emplace_back(key.a, key.b);
        s.edges[*slot].add_bin(q3[c * HW + i]);
      }
    }
  }
}

}  // namespace

EXA_API void* exa_streamseg_new(int64_t D, int64_t H, int64_t W) {
  if (D <= 0 || H <= 0 || W <= 0) return nullptr;
  return new StreamSeg(D, H, W);
}

EXA_API void exa_streamseg_free(void* handle) {
  delete static_cast<StreamSeg*>(handle);
}

// Pass 1: watershed one Z slab of plan bytes (uint8, nz*H*W). Writes
// provisional piece labels (0 = background) into frag_out. Slabs must
// arrive in ascending Z order and cover the volume exactly.
EXA_API int64_t exa_streamseg_feed(void* handle, const uint8_t* plan,
                                   int64_t nz, uint32_t* frag_out) {
  StreamSeg& s = *static_cast<StreamSeg*>(handle);
  if (nz <= 0 || s.z_done + nz > s.D || s.frags_done) return -1;
  const int64_t H = s.H, W = s.W, HW = s.H * s.W;
  const int64_t n = nz * HW;

  // Slab-local voxel union-find; unions replay the plan bytes exactly
  // as the dense watershed_replay does, except that unions crossing
  // the slab's Z faces go through the piece union-find: +z edges out
  // of the previous slab's last plane were deferred to now, and -z
  // edges out of this slab's first plane are collected and resolved
  // against prev_ids after local components are known.
  exa::UnionFind local(static_cast<size_t>(n));
  std::vector<int64_t> cross_prev;  // plane-0 voxels with dir == -z
  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < H; ++y) {
      for (int64_t x = 0; x < W; ++x) {
        const int64_t v = (z * H + y) * W + x;
        const uint8_t pb = plan[v];
        if (pb == 0) continue;
        if ((pb & 1) && z + 1 < nz) {
          local.unite(static_cast<uint32_t>(v),
                      static_cast<uint32_t>(v + HW));
        }
        // +z flag on the slab's last plane: deferred to the next
        // feed (prev_plan replays it); on the volume's last plane the
        // digest guarantees no such flag.
        if (pb & 2) {
          local.unite(static_cast<uint32_t>(v),
                      static_cast<uint32_t>(v + W));
        }
        if (pb & 4) {
          local.unite(static_cast<uint32_t>(v),
                      static_cast<uint32_t>(v + 1));
        }
        const int dir = pb >> 3;
        switch (dir) {
          case 1:
            if (z + 1 < nz) {
              local.unite(static_cast<uint32_t>(v),
                          static_cast<uint32_t>(v + HW));
            }
            break;  // last plane: deferred (prev_plan)
          case 2:
            local.unite(static_cast<uint32_t>(v),
                        static_cast<uint32_t>(v + W));
            break;
          case 3:
            local.unite(static_cast<uint32_t>(v),
                        static_cast<uint32_t>(v + 1));
            break;
          case 4:
            if (z > 0) {
              local.unite(static_cast<uint32_t>(v),
                          static_cast<uint32_t>(v - HW));
            } else {
              cross_prev.push_back(v);  // into the previous slab
            }
            break;
          case 5:
            local.unite(static_cast<uint32_t>(v),
                        static_cast<uint32_t>(v - W));
            break;
          case 6:
            local.unite(static_cast<uint32_t>(v),
                        static_cast<uint32_t>(v - 1));
            break;
          default:
            break;
        }
      }
    }
  }

  // Assign pieces to foreground components in scan order (recording
  // each piece's first foreground scan index for the global
  // first-appearance numbering) and write provisional labels.
  std::vector<uint32_t> prov_of_root(n, 0);
  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < H; ++y) {
      for (int64_t x = 0; x < W; ++x) {
        const int64_t v = (z * H + y) * W + x;
        if ((plan[v] >> 3) == 0) {
          frag_out[v] = 0;
          continue;
        }
        const uint32_t r = local.find(static_cast<uint32_t>(v));
        uint32_t p = prov_of_root[r];
        if (p == 0) {
          p = s.new_piece();
          prov_of_root[r] = p;
        }
        if (s.piece_first_fg[p] == kNoFg) {
          s.piece_first_fg[p] =
              static_cast<uint64_t>((s.z_done + z) * HW + y * W + x);
        }
        ++s.piece_fg_count[p];
        frag_out[v] = p;
      }
    }
  }

  // Cross-slab stitching. Forward (+z) unions recorded on the previous
  // slab's last plane target this slab's plane 0; -z unions from this
  // slab's plane 0 target the previous slab's last plane. Both reduce
  // to piece-level unions. A target with no piece is a background
  // singleton (see header note) -- the union is a no-op and is skipped
  // unless the target can still matter (it is in THIS slab, where a
  // piece can be created on demand).
  if (s.z_done > 0) {
    for (int64_t i = 0; i < HW; ++i) {
      const uint8_t pb = s.prev_plan[i];
      if ((pb & 1) || (pb >> 3) == 1) {
        const uint32_t r = local.find(static_cast<uint32_t>(i));
        uint32_t p = prov_of_root[r];
        if (p == 0) {
          p = s.new_piece();
          prov_of_root[r] = p;
        }
        s.piece_unite(s.prev_ids[i], p);
      }
    }
    for (const int64_t v : cross_prev) {
      const uint32_t target = s.prev_ids[v];  // v < HW: plane-0 index
      if (target == 0) continue;              // background singleton
      s.piece_unite(prov_of_root[local.find(static_cast<uint32_t>(v))],
                    target);
    }
  }

  // Park the last plane for the next slab's stitching.
  s.prev_ids.resize(HW);
  s.prev_plan.resize(HW);
  const int64_t last = (nz - 1) * HW;
  for (int64_t i = 0; i < HW; ++i) {
    s.prev_ids[i] = prov_of_root[local.find(static_cast<uint32_t>(last + i))];
    s.prev_plan[i] = plan[last + i];
  }
  s.z_done += nz;
  return 0;
}

// Finish pass 1: stitch pieces into final watershed fragments and
// number them 1..K by first foreground appearance in global scan order
// (bit-identical to the dense replay's renumber). Returns K.
EXA_API int64_t exa_streamseg_fragments_done(void* handle) {
  StreamSeg& s = *static_cast<StreamSeg*>(handle);
  if (s.z_done != s.D || s.frags_done) return -1;
  s.frags_done = true;
  const uint32_t P = static_cast<uint32_t>(s.piece_parent.size() - 1);

  std::vector<uint64_t> min_fg(P + 1, kNoFg);
  std::vector<uint64_t> cnt(P + 1, 0);
  for (uint32_t p = 1; p <= P; ++p) {
    const uint32_t r = s.piece_find(p);
    min_fg[r] = std::min(min_fg[r], s.piece_first_fg[p]);
    cnt[r] += s.piece_fg_count[p];
  }
  std::vector<std::pair<uint64_t, uint32_t>> roots;
  for (uint32_t p = 1; p <= P; ++p) {
    if (s.piece_parent[p] == p && min_fg[p] != kNoFg) {
      roots.emplace_back(min_fg[p], p);
    }
  }
  std::sort(roots.begin(), roots.end());  // first-fg indices are unique
  s.K = static_cast<int64_t>(roots.size());

  std::vector<uint32_t> ws_of_root(P + 1, 0);
  s.frag_fg.assign(static_cast<size_t>(s.K) + 1, 0);
  for (size_t k = 0; k < roots.size(); ++k) {
    ws_of_root[roots[k].second] = static_cast<uint32_t>(k + 1);
    s.frag_fg[k + 1] = cnt[roots[k].second];
  }
  s.ws_of_piece.assign(P + 1, 0);
  for (uint32_t p = 1; p <= P; ++p) {
    s.ws_of_piece[p] = ws_of_root[s.piece_find(p)];
  }

  // Pass-1 state is no longer needed (map() uses ws_of_piece).
  s.piece_parent.clear();
  s.piece_parent.shrink_to_fit();
  s.piece_size.clear();
  s.piece_size.shrink_to_fit();
  s.piece_first_fg.clear();
  s.piece_first_fg.shrink_to_fit();
  s.piece_fg_count.clear();
  s.piece_fg_count.shrink_to_fit();
  s.prev_ids.clear();
  s.prev_ids.shrink_to_fit();
  s.prev_plan.clear();
  s.prev_plan.shrink_to_fit();
  return s.K;
}

// Pass 2: stream provisional labels + u8 affinities back through in
// ascending Z order. qaff layout is plane-major (nz, 3, H, W) so slab
// slices of a (D, 3, H, W) temp store are contiguous.
EXA_API int64_t exa_streamseg_rag_feed(void* handle, const uint32_t* frag,
                                       const uint8_t* qaff, int64_t nz) {
  StreamSeg& s = *static_cast<StreamSeg*>(handle);
  if (!s.frags_done || nz <= 0 || s.z_rag + nz > s.D ||
      s.n_segments >= 0) {
    return -1;
  }
  const int64_t HW = s.H * s.W;
  std::vector<uint32_t> cur(HW);
  for (int64_t j = 0; j < nz; ++j) {
    // After the swap below, `cur` holds the previous pending buffer
    // (initially empty) -- restore its extent before overwriting.
    cur.resize(HW);
    const uint32_t* fp = frag + j * HW;
    for (int64_t i = 0; i < HW; ++i) cur[i] = s.ws_of_piece[fp[i]];
    if (s.have_pending) {
      rag_plane(s, s.pending_frag.data(), s.pending_q.data(), cur.data());
    }
    s.pending_frag.swap(cur);
    s.pending_q.assign(qaff + j * 3 * HW, qaff + (j + 1) * 3 * HW);
    s.have_pending = true;
  }
  s.z_rag += nz;
  return 0;
}

// Run the shared merge loop over the streamed RAG, then compose
// thresholds + the min-size filter (keep strictly greater; renumber by
// first appearance -- remove_small_segments parity) into the final
// piece -> label lut. Returns the number of segments.
EXA_API int64_t exa_streamseg_merge(void* handle, const float* thresholds,
                                    int64_t n_thresholds,
                                    int32_t quantile_pct, int64_t min_size) {
  StreamSeg& s = *static_cast<StreamSeg*>(handle);
  if (!s.frags_done || s.z_rag != s.D || n_thresholds <= 0 ||
      s.n_segments >= 0) {
    return -1;
  }
  for (int64_t i = 1; i < n_thresholds; ++i) {
    if (thresholds[i] < thresholds[i - 1]) return -1;
  }
  if (s.have_pending) {  // the volume's final plane: no outgoing z edges
    rag_plane(s, s.pending_frag.data(), s.pending_q.data(), nullptr);
    s.have_pending = false;
    s.pending_frag.clear();
    s.pending_frag.shrink_to_fit();
    s.pending_q.clear();
    s.pending_q.shrink_to_fit();
  }

  exa_rag::MergeEvents me = exa_rag::run_merge(
      s.edge_index, s.edges, s.K, thresholds, n_thresholds, quantile_pct);
  s.edge_index.reset(16);
  s.edges.release();

  // Advance the replay forest through every threshold (the reference
  // keeps only the last labeling, inference.py:229-233).
  std::vector<uint32_t> rparent(static_cast<size_t>(s.K) + 1);
  for (int64_t f = 0; f <= s.K; ++f) rparent[f] = static_cast<uint32_t>(f);
  std::vector<uint32_t> applied(me.n_comps, 0);
  for (int64_t k = 0; k < n_thresholds; ++k) {
    exa_rag::apply_threshold(me, k, rparent, applied);
  }
  me.comp_events.clear();
  auto rfind = [&](uint32_t x) {
    while (rparent[x] != x) {
      rparent[x] = rparent[rparent[x]];
      x = rparent[x];
    }
    return x;
  };

  // Segment sizes = summed fragment foreground counts.
  std::vector<uint64_t> sizes(static_cast<size_t>(s.K) + 1, 0);
  for (int64_t ws = 1; ws <= s.K; ++ws) {
    sizes[rfind(static_cast<uint32_t>(ws))] += s.frag_fg[ws];
  }
  // Number kept segments by first appearance: ascending fragment id IS
  // ascending first-foreground scan order, and a segment first appears
  // with its lowest-numbered fragment.
  std::vector<uint32_t> seg_of_root(static_cast<size_t>(s.K) + 1, 0);
  std::vector<uint32_t> lut_ws(static_cast<size_t>(s.K) + 1, 0);
  uint32_t next = 1;
  for (int64_t ws = 1; ws <= s.K; ++ws) {
    const uint32_t r = rfind(static_cast<uint32_t>(ws));
    if (sizes[r] <= static_cast<uint64_t>(min_size)) continue;
    if (seg_of_root[r] == 0) seg_of_root[r] = next++;
    lut_ws[ws] = seg_of_root[r];
  }
  s.final_lut.assign(s.ws_of_piece.size(), 0);
  for (size_t p = 0; p < s.ws_of_piece.size(); ++p) {
    s.final_lut[p] = lut_ws[s.ws_of_piece[p]];
  }
  s.n_segments = static_cast<int64_t>(next - 1);
  return s.n_segments;
}

// Pass 3: relabel a chunk of provisional labels through the final lut.
EXA_API int64_t exa_streamseg_map(void* handle, const uint32_t* frag,
                                  int64_t n, uint32_t* out) {
  StreamSeg& s = *static_cast<StreamSeg*>(handle);
  if (s.n_segments < 0 || n < 0) return -1;
  for (int64_t i = 0; i < n; ++i) out[i] = s.final_lut[frag[i]];
  return 0;
}
