// tpurt native runtime pieces: BVH builder + OBJ parser (C ABI, ctypes).
//
// The reference implements these host-side hot paths in Rust
// (ref: src/instance.rs:175-310 recursive median-split BVH build,
//  src/instance.rs:56-106 OBJ load via tobj). This is the tpurt
// counterpart: same algorithms, C++ behind a C ABI so the Python layer
// loads it with ctypes (no pybind11 dependency). The Python/NumPy builder
// in tpurt/accel.py remains the reference implementation and fallback;
// tests assert bit-identical output between the two.
//
// Build: make -C native   ->  libtpurt_native.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BVH builder
//
// Exact mirror of tpurt/accel.py::build_bvh (which itself mirrors
// instance.rs:198-283): iterative depth-first median split on the longest
// centroid axis with >= tie-breaking (x over y over z), stable sort, leaves
// hold <= max_prims triangles, children allocated eagerly (left then right),
// right subtree pushed first so the left is processed first.
//
// Outputs are written into caller-allocated arrays sized for the worst case
// (max_nodes >= 2*T, order: T entries). Returns the node count, or -1 if
// max_nodes would be exceeded.
// ---------------------------------------------------------------------------

int tpurt_build_bvh(
    const float* tri_min,   // (T, 3)
    const float* tri_max,   // (T, 3)
    int64_t n_tris,
    int max_prims,
    float* bbox_min,        // (max_nodes, 3) out
    float* bbox_max,        // (max_nodes, 3) out
    int32_t* left,          // (max_nodes,) out
    int32_t* right,         // (max_nodes,) out
    int32_t* first,         // (max_nodes,) out
    int32_t* count,         // (max_nodes,) out
    int32_t* order,         // (T,) out — triangle permutation, leaf order
    int64_t max_nodes)
{
    if (max_prims < 1) max_prims = 1;
    if (n_tris == 0) {
        if (max_nodes < 1) return -1;
        for (int c = 0; c < 3; ++c) { bbox_min[c] = 0.f; bbox_max[c] = 0.f; }
        left[0] = right[0] = first[0] = count[0] = 0;
        return 1;
    }

    std::vector<float> centroid(static_cast<size_t>(n_tris) * 3);
    for (int64_t i = 0; i < n_tris; ++i)
        for (int c = 0; c < 3; ++c)
            centroid[i * 3 + c] =
                0.5f * tri_min[i * 3 + c] + 0.5f * tri_max[i * 3 + c];

    std::vector<int64_t> idx(n_tris);
    for (int64_t i = 0; i < n_tris; ++i) idx[i] = i;

    int64_t n_nodes = 0;
    auto alloc = [&]() -> int64_t {
        if (n_nodes >= max_nodes) return -1;
        int64_t n = n_nodes++;
        for (int c = 0; c < 3; ++c) {
            bbox_min[n * 3 + c] = 0.f;
            bbox_max[n * 3 + c] = 0.f;
        }
        left[n] = right[n] = first[n] = count[n] = 0;
        return n;
    };

    struct Task { int64_t node, lo, hi; };  // idx[lo, hi) belongs to node
    std::vector<Task> stack;
    int64_t root = alloc();
    if (root < 0) return -1;
    stack.push_back({root, 0, n_tris});
    int64_t order_len = 0;

    while (!stack.empty()) {
        Task t = stack.back();
        stack.pop_back();
        int64_t n = t.hi - t.lo;

        float bmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float bmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int64_t k = t.lo; k < t.hi; ++k) {
            int64_t i = idx[k];
            for (int c = 0; c < 3; ++c) {
                bmin[c] = std::min(bmin[c], tri_min[i * 3 + c]);
                bmax[c] = std::max(bmax[c], tri_max[i * 3 + c]);
            }
        }
        for (int c = 0; c < 3; ++c) {
            bbox_min[t.node * 3 + c] = bmin[c];
            bbox_max[t.node * 3 + c] = bmax[c];
        }

        if (n <= max_prims) {
            first[t.node] = static_cast<int32_t>(order_len);
            count[t.node] = static_cast<int32_t>(n);
            for (int64_t k = t.lo; k < t.hi; ++k)
                order[order_len++] = static_cast<int32_t>(idx[k]);
            continue;
        }

        float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int64_t k = t.lo; k < t.hi; ++k) {
            int64_t i = idx[k];
            for (int c = 0; c < 3; ++c) {
                cmin[c] = std::min(cmin[c], centroid[i * 3 + c]);
                cmax[c] = std::max(cmax[c], centroid[i * 3 + c]);
            }
        }
        float d[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1], cmax[2] - cmin[2]};
        // >= tie-breaking: x over y over z (instance.rs:167-172)
        int dim = (d[0] >= d[1] && d[0] >= d[2]) ? 0 : (d[1] >= d[2] ? 1 : 2);

        std::stable_sort(idx.begin() + t.lo, idx.begin() + t.hi,
                         [&](int64_t a, int64_t b) {
                             return centroid[a * 3 + dim] < centroid[b * 3 + dim];
                         });
        int64_t mid = t.lo + n / 2;

        int64_t lchild = alloc();
        int64_t rchild = alloc();
        if (lchild < 0 || rchild < 0) return -1;
        left[t.node] = static_cast<int32_t>(lchild);
        right[t.node] = static_cast<int32_t>(rchild);
        // right first so left pops (and numbers its leaves) first
        stack.push_back({rchild, mid, t.hi});
        stack.push_back({lchild, t.lo, mid});
    }
    return static_cast<int>(n_nodes);
}

// ---------------------------------------------------------------------------
// SAH BVH builder
//
// Exact mirror of tpurt/accel.py::_build_bvh_py(sah=True): binned
// surface-area-heuristic splits with the walk-matched cost model
// (ceil(n / max_prims) sweep units, area + tile-union floor), a median
// candidate scored under the same model (SAH is taken only when it strictly
// wins), and a depth cap past which subtrees median-split. Bit-identical to
// the NumPy builder (tests/test_native.py) including its precision mixing:
// bin boxes and bin costs in float64, the median candidate's boxes in
// float32 with a float32 area that is only then widened to float64.
// ---------------------------------------------------------------------------

namespace {

constexpr int kSahBins = 16;
constexpr int kSahDepthCap = 40;  // accel._SAH_DEPTH_CAP
constexpr double kSahFloorFrac = 0.25;  // accel._SAH_FLOOR

// (area + floor) * ceil(n / max_prims), all-double (accel._leaf_area_cost on
// the float64 bin boxes).
inline double leaf_cost_d(const double lo[3], const double hi[3], int64_t n,
                          int max_prims, double floor_term) {
    double d0 = std::max(hi[0] - lo[0], 0.0);
    double d1 = std::max(hi[1] - lo[1], 0.0);
    double d2 = std::max(hi[2] - lo[2], 0.0);
    double area = d0 * d1 + d1 * d2 + d2 * d0;
    int64_t units = (n + max_prims - 1) / max_prims;
    return (area + floor_term) * static_cast<double>(units);
}

// The median-candidate variant: NumPy feeds float32 boxes straight into
// _leaf_area_cost, so the extents and area stay float32 and only the
// (area + floor) sum promotes to float64.
inline double leaf_cost_f(const float lo[3], const float hi[3], int64_t n,
                          int max_prims, double floor_term) {
    float d0 = std::max(hi[0] - lo[0], 0.0f);
    float d1 = std::max(hi[1] - lo[1], 0.0f);
    float d2 = std::max(hi[2] - lo[2], 0.0f);
    float area = d0 * d1 + d1 * d2 + d2 * d0;
    int64_t units = (n + max_prims - 1) / max_prims;
    return (static_cast<double>(area) + floor_term)
        * static_cast<double>(units);
}

struct SahSplit {
    bool take = false;                  // false -> caller median-splits
    std::vector<int64_t> left, right;   // original relative order preserved
};

// accel._sah_split: best binned split across the three axes, or "median"
// when every candidate is degenerate or the median scores >= as well.
SahSplit sah_split(const float* tri_min, const float* tri_max,
                   const float* centroid, const std::vector<int64_t>& idx,
                   int max_prims, double floor_term) {
    SahSplit out;
    const int64_t n = static_cast<int64_t>(idx.size());
    float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t i : idx)
        for (int c = 0; c < 3; ++c) {
            cmin[c] = std::min(cmin[c], centroid[i * 3 + c]);
            cmax[c] = std::max(cmax[c], centroid[i * 3 + c]);
        }
    float ext[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1], cmax[2] - cmin[2]};

    double best_cost = std::numeric_limits<double>::infinity();
    int best_dim = -1, best_k = -1;
    for (int dim = 0; dim < 3; ++dim) {
        if (!(ext[dim] > 0.0f)) continue;
        int64_t counts[kSahBins] = {0};
        double bmin[kSahBins][3], bmax[kSahBins][3];
        for (int b = 0; b < kSahBins; ++b)
            for (int c = 0; c < 3; ++c) {
                bmin[b][c] = std::numeric_limits<double>::infinity();
                bmax[b][c] = -std::numeric_limits<double>::infinity();
            }
        for (int64_t i : idx) {
            // float32 throughout, truncation towards zero — matches
            // (_SAH_BINS * (c - cmin) / ext).astype(np.int64)
            float t = (16.0f * (centroid[i * 3 + dim] - cmin[dim]))
                / ext[dim];
            int64_t b = std::min(static_cast<int64_t>(t),
                                 static_cast<int64_t>(kSahBins - 1));
            counts[b]++;
            for (int c = 0; c < 3; ++c) {
                bmin[b][c] = std::min(bmin[b][c],
                                      static_cast<double>(tri_min[i * 3 + c]));
                bmax[b][c] = std::max(bmax[b][c],
                                      static_cast<double>(tri_max[i * 3 + c]));
            }
        }
        // prefix/suffix boxes (min/max are order-independent, so plain
        // accumulation matches NumPy's accumulate exactly)
        double lmin[kSahBins][3], lmax[kSahBins][3];
        double rmin[kSahBins][3], rmax[kSahBins][3];
        for (int c = 0; c < 3; ++c) {
            lmin[0][c] = bmin[0][c];
            lmax[0][c] = bmax[0][c];
            rmin[kSahBins - 1][c] = bmin[kSahBins - 1][c];
            rmax[kSahBins - 1][c] = bmax[kSahBins - 1][c];
        }
        for (int b = 1; b < kSahBins; ++b)
            for (int c = 0; c < 3; ++c) {
                lmin[b][c] = std::min(lmin[b - 1][c], bmin[b][c]);
                lmax[b][c] = std::max(lmax[b - 1][c], bmax[b][c]);
            }
        for (int b = kSahBins - 2; b >= 0; --b)
            for (int c = 0; c < 3; ++c) {
                rmin[b][c] = std::min(rmin[b + 1][c], bmin[b][c]);
                rmax[b][c] = std::max(rmax[b + 1][c], bmax[b][c]);
            }
        double dim_best = std::numeric_limits<double>::infinity();
        int dim_k = -1;
        int64_t nl = 0;
        for (int k = 0; k < kSahBins - 1; ++k) {
            nl += counts[k];
            int64_t nr = n - nl;
            if (nl <= 0 || nr <= 0) continue;
            double cost = leaf_cost_d(lmin[k], lmax[k], nl, max_prims,
                                      floor_term)
                + leaf_cost_d(rmin[k + 1], rmax[k + 1], nr, max_prims,
                              floor_term);
            if (cost < dim_best) { dim_best = cost; dim_k = k; }
        }
        if (dim_k >= 0 && dim_best < best_cost) {
            best_cost = dim_best;
            best_dim = dim;
            best_k = dim_k;
        }
    }
    if (best_dim < 0) return out;  // every candidate degenerate -> median

    // Median candidate under the SAME cost model; take SAH only if it
    // strictly wins (accel.py:140-152).
    int dmed = (ext[0] >= ext[1] && ext[0] >= ext[2]) ? 0
        : (ext[1] >= ext[2] ? 1 : 2);
    std::vector<int64_t> pos(idx.size());
    for (size_t i = 0; i < idx.size(); ++i) pos[i] = static_cast<int64_t>(i);
    std::stable_sort(pos.begin(), pos.end(), [&](int64_t a, int64_t b) {
        return centroid[idx[a] * 3 + dmed] < centroid[idx[b] * 3 + dmed];
    });
    int64_t mid = n / 2;
    float lomin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float lomax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    float himin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float himax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t p = 0; p < n; ++p) {
        int64_t i = idx[pos[p]];
        float* mn = p < mid ? lomin : himin;
        float* mx = p < mid ? lomax : himax;
        for (int c = 0; c < 3; ++c) {
            mn[c] = std::min(mn[c], tri_min[i * 3 + c]);
            mx[c] = std::max(mx[c], tri_max[i * 3 + c]);
        }
    }
    double med_cost =
        leaf_cost_f(lomin, lomax, mid, max_prims, floor_term)
        + leaf_cost_f(himin, himax, n - mid, max_prims, floor_term);
    if (med_cost <= best_cost) return out;

    // Partition by bin <= best_k on best_dim, preserving original order
    // (boolean-mask semantics of idx[go_left] / idx[~go_left]).
    out.take = true;
    for (int64_t i : idx) {
        float t = (16.0f * (centroid[i * 3 + best_dim] - cmin[best_dim]))
            / ext[best_dim];
        int64_t b = std::min(static_cast<int64_t>(t),
                             static_cast<int64_t>(kSahBins - 1));
        (b <= best_k ? out.left : out.right).push_back(i);
    }
    return out;
}

}  // namespace

int tpurt_build_bvh_sah(
    const float* tri_min,   // (T, 3)
    const float* tri_max,   // (T, 3)
    int64_t n_tris,
    int max_prims,
    float* bbox_min,        // (max_nodes, 3) out
    float* bbox_max,        // (max_nodes, 3) out
    int32_t* left,          // (max_nodes,) out
    int32_t* right,         // (max_nodes,) out
    int32_t* first,         // (max_nodes,) out
    int32_t* count,         // (max_nodes,) out
    int32_t* order,         // (T,) out
    int64_t max_nodes)
{
    if (max_prims < 1) max_prims = 1;
    if (n_tris == 0) {
        if (max_nodes < 1) return -1;
        for (int c = 0; c < 3; ++c) { bbox_min[c] = 0.f; bbox_max[c] = 0.f; }
        left[0] = right[0] = first[0] = count[0] = 0;
        return 1;
    }

    std::vector<float> centroid(static_cast<size_t>(n_tris) * 3);
    for (int64_t i = 0; i < n_tris; ++i)
        for (int c = 0; c < 3; ++c)
            centroid[i * 3 + c] =
                0.5f * tri_min[i * 3 + c] + 0.5f * tri_max[i * 3 + c];

    // floor = _SAH_FLOOR * half-area of the whole-scene box; NumPy computes
    // the float32 column extrema, widens to float64, then subtracts.
    float gmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float gmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int64_t i = 0; i < n_tris; ++i)
        for (int c = 0; c < 3; ++c) {
            gmin[c] = std::min(gmin[c], tri_min[i * 3 + c]);
            gmax[c] = std::max(gmax[c], tri_max[i * 3 + c]);
        }
    double gd[3];
    for (int c = 0; c < 3; ++c)
        gd[c] = std::max(static_cast<double>(gmax[c])
                         - static_cast<double>(gmin[c]), 0.0);
    double floor_term = kSahFloorFrac
        * (gd[0] * gd[1] + gd[1] * gd[2] + gd[2] * gd[0]);

    int64_t n_nodes = 0;
    auto alloc = [&]() -> int64_t {
        if (n_nodes >= max_nodes) return -1;
        int64_t n = n_nodes++;
        for (int c = 0; c < 3; ++c) {
            bbox_min[n * 3 + c] = 0.f;
            bbox_max[n * 3 + c] = 0.f;
        }
        left[n] = right[n] = first[n] = count[n] = 0;
        return n;
    };

    struct Task { int64_t node; std::vector<int64_t> idx; int depth; };
    std::vector<Task> stack;
    int64_t root = alloc();
    if (root < 0) return -1;
    std::vector<int64_t> all(n_tris);
    for (int64_t i = 0; i < n_tris; ++i) all[i] = i;
    stack.push_back({root, std::move(all), 0});
    int64_t order_len = 0;

    while (!stack.empty()) {
        Task t = std::move(stack.back());
        stack.pop_back();
        const int64_t n = static_cast<int64_t>(t.idx.size());

        float bmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float bmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int64_t i : t.idx)
            for (int c = 0; c < 3; ++c) {
                bmin[c] = std::min(bmin[c], tri_min[i * 3 + c]);
                bmax[c] = std::max(bmax[c], tri_max[i * 3 + c]);
            }
        for (int c = 0; c < 3; ++c) {
            bbox_min[t.node * 3 + c] = bmin[c];
            bbox_max[t.node * 3 + c] = bmax[c];
        }

        if (n <= max_prims) {
            first[t.node] = static_cast<int32_t>(order_len);
            count[t.node] = static_cast<int32_t>(n);
            for (int64_t i : t.idx)
                order[order_len++] = static_cast<int32_t>(i);
            continue;
        }

        std::vector<int64_t> lidx, ridx;
        bool have_split = false;
        if (t.depth < kSahDepthCap) {
            SahSplit s = sah_split(tri_min, tri_max, centroid.data(), t.idx,
                                   max_prims, floor_term);
            if (s.take) {
                lidx = std::move(s.left);
                ridx = std::move(s.right);
                have_split = true;
            }
        }
        if (!have_split) {
            float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
            float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
            for (int64_t i : t.idx)
                for (int c = 0; c < 3; ++c) {
                    cmin[c] = std::min(cmin[c], centroid[i * 3 + c]);
                    cmax[c] = std::max(cmax[c], centroid[i * 3 + c]);
                }
            float d[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1],
                          cmax[2] - cmin[2]};
            int dim = (d[0] >= d[1] && d[0] >= d[2]) ? 0
                : (d[1] >= d[2] ? 1 : 2);
            std::stable_sort(t.idx.begin(), t.idx.end(),
                             [&](int64_t a, int64_t b) {
                                 return centroid[a * 3 + dim]
                                     < centroid[b * 3 + dim];
                             });
            int64_t mid = n / 2;
            lidx.assign(t.idx.begin(), t.idx.begin() + mid);
            ridx.assign(t.idx.begin() + mid, t.idx.end());
        }

        int64_t lchild = alloc();
        int64_t rchild = alloc();
        if (lchild < 0 || rchild < 0) return -1;
        left[t.node] = static_cast<int32_t>(lchild);
        right[t.node] = static_cast<int32_t>(rchild);
        // right first so left pops (and numbers its leaves) first
        stack.push_back({rchild, std::move(ridx), t.depth + 1});
        stack.push_back({lchild, std::move(lidx), t.depth + 1});
    }
    return static_cast<int>(n_nodes);
}

// ---------------------------------------------------------------------------
// OBJ parser
//
// Capability mirror of tpurt/utils/obj.py::parse_obj (= the reference's tobj
// usage with single_index + triangulate, instance.rs:56-106): vertex
// positions only, fan triangulation, 1-based and negative indices.
//
// Two-call protocol so the caller owns all memory:
//   1) tpurt_obj_open(path) -> handle (parses the file), or NULL
//      tpurt_obj_counts(handle, &n_vertices, &n_triangles)
//   2) tpurt_obj_fill(handle, positions, indices); tpurt_obj_close(handle)
// ---------------------------------------------------------------------------

struct ObjData {
    std::vector<float> positions;   // 3 per vertex
    std::vector<int32_t> indices;   // 3 per triangle
};

// Returns NULL on any input the Python parser would reject (bad float on a
// >=3-coordinate vertex line, non-numeric face index on a >=3-vertex face,
// or a line longer than the read buffer — Python has no line cap): the
// caller then falls back to tpurt/utils/obj.py, which raises the same
// error either way, keeping the "identical output" contract instead of
// silently mis-indexing (strtol would return 0 for garbage tokens).
void* tpurt_obj_open(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* d = new ObjData();
    std::vector<int64_t> face;
    char line[8192];
    bool ok = true;
    while (ok && std::fgets(line, sizeof line, f)) {
        if (!std::strchr(line, '\n') && !std::feof(f)) {
            ok = false;  // truncated long line: defer to the Python parser
            break;
        }
        char* p = line;
        while (*p == ' ' || *p == '\t') ++p;
        if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            // Python parses only when >= 3 coordinate tokens are present,
            // and then a malformed float is an error (float(tok) raises)
            float xyz[3];
            int ntok = 0;
            bool bad = false;
            char* tok = std::strtok(p + 1, " \t\r\n");
            while (tok) {
                if (ntok < 3) {
                    char* end = nullptr;
                    float v = std::strtof(tok, &end);
                    // strtof accepts hex floats ("0x1p3"); Python float()
                    // does not — defer those to the Python parser too
                    if (end == tok || *end != '\0' ||
                        std::strpbrk(tok, "xX")) bad = true;
                    else xyz[ntok] = v;
                }
                ++ntok;
                tok = std::strtok(nullptr, " \t\r\n");
            }
            if (ntok >= 3) {
                if (bad) { ok = false; break; }
                d->positions.push_back(xyz[0]);
                d->positions.push_back(xyz[1]);
                d->positions.push_back(xyz[2]);
            }
        } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
            face.clear();
            bool bad = false;
            char* tok = std::strtok(p + 1, " \t\r\n");
            while (tok) {
                char* end = nullptr;
                long i = std::strtol(tok, &end, 10);
                // int(tok.split('/')[0]) semantics: the first slash
                // segment must be fully numeric
                if (end == tok || (*end != '\0' && *end != '/')) bad = true;
                int64_t nverts = static_cast<int64_t>(d->positions.size()) / 3;
                face.push_back(i > 0 ? i - 1 : nverts + i);
                tok = std::strtok(nullptr, " \t\r\n");
            }
            // Python attempts the parse only for faces with >= 3 vertices
            if (face.size() >= 3 && bad) { ok = false; break; }
            if (!bad) {
                for (size_t k = 1; k + 1 < face.size(); ++k) {  // fan
                    d->indices.push_back(static_cast<int32_t>(face[0]));
                    d->indices.push_back(static_cast<int32_t>(face[k]));
                    d->indices.push_back(static_cast<int32_t>(face[k + 1]));
                }
            }
        }
    }
    std::fclose(f);
    if (!ok) { delete d; return nullptr; }
    return d;
}

void tpurt_obj_counts(void* handle, int64_t* n_vertices, int64_t* n_triangles) {
    auto* d = static_cast<ObjData*>(handle);
    *n_vertices = static_cast<int64_t>(d->positions.size()) / 3;
    *n_triangles = static_cast<int64_t>(d->indices.size()) / 3;
}

void tpurt_obj_fill(void* handle, float* positions, int32_t* indices) {
    auto* d = static_cast<ObjData*>(handle);
    std::memcpy(positions, d->positions.data(),
                d->positions.size() * sizeof(float));
    std::memcpy(indices, d->indices.data(),
                d->indices.size() * sizeof(int32_t));
}

void tpurt_obj_close(void* handle) {
    delete static_cast<ObjData*>(handle);
}

}  // extern "C"
