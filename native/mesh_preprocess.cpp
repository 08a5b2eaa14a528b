// Native mesh-preprocessing kernels for safeincave-tpu.
//
// Plays the role dolfinx's C++ core + graph partitioner (ParMETIS/SCOTCH)
// play for the reference (SafeInCave Grid.py:275-283): spatial partitioning
// and locality reordering of tetrahedral meshes, plus adjacency construction.
// Exposed through a plain C ABI consumed via ctypes (no pybind11 needed).
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libsicpre.so mesh_preprocess.cpp
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Morton (Z-order) locality ordering of element centroids.
// order_out[i] = index of the element in position i of the new ordering.
// ---------------------------------------------------------------------------
static inline uint64_t expand_bits_21(uint64_t v) {
    v &= 0x1fffff;  // 21 bits
    v = (v | (v << 32)) & 0x1f00000000ffffULL;
    v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
    v = (v | (v << 8))  & 0x100f00f00f00f00fULL;
    v = (v | (v << 4))  & 0x10c30c30c30c30c3ULL;
    v = (v | (v << 2))  & 0x1249249249249249ULL;
    return v;
}

void morton_order(const double* centroids, int64_t n, int64_t* order_out) {
    double lo[3] = {1e300, 1e300, 1e300};
    double hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            double c = centroids[3 * i + d];
            if (c < lo[d]) lo[d] = c;
            if (c > hi[d]) hi[d] = c;
        }
    }
    double scale[3];
    for (int d = 0; d < 3; ++d) {
        double ext = hi[d] - lo[d];
        scale[d] = ext > 0 ? (2097151.0 / ext) : 0.0;  // 2^21 - 1
    }
    std::vector<uint64_t> codes(n);
    for (int64_t i = 0; i < n; ++i) {
        uint64_t key = 0;
        for (int d = 0; d < 3; ++d) {
            uint64_t q = (uint64_t)((centroids[3 * i + d] - lo[d]) * scale[d]);
            key |= expand_bits_21(q) << d;
        }
        codes[i] = key;
    }
    std::vector<int64_t> idx(n);
    std::iota(idx.begin(), idx.end(), 0);
    std::stable_sort(idx.begin(), idx.end(),
                     [&](int64_t a, int64_t b) { return codes[a] < codes[b]; });
    std::memcpy(order_out, idx.data(), n * sizeof(int64_t));
}

// ---------------------------------------------------------------------------
// Recursive coordinate bisection: nparts spatially compact, equal-size parts.
// part_out[i] = partition id of element i; order_out = elements sorted by
// (partition, position along the local split axis).
// ---------------------------------------------------------------------------
static void rcb_recurse(const double* centroids, std::vector<int64_t>& ids,
                        int64_t lo, int64_t hi, int parts, int part_base,
                        int32_t* part_out) {
    if (parts <= 1) {
        for (int64_t k = lo; k < hi; ++k) part_out[ids[k]] = part_base;
        return;
    }
    // widest axis of this subset
    double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t k = lo; k < hi; ++k) {
        const double* c = centroids + 3 * ids[k];
        for (int d = 0; d < 3; ++d) {
            if (c[d] < mn[d]) mn[d] = c[d];
            if (c[d] > mx[d]) mx[d] = c[d];
        }
    }
    int axis = 0;
    double best = mx[0] - mn[0];
    for (int d = 1; d < 3; ++d)
        if (mx[d] - mn[d] > best) { best = mx[d] - mn[d]; axis = d; }

    int left_parts = parts / 2;
    int right_parts = parts - left_parts;
    int64_t split = lo + (hi - lo) * left_parts / parts;
    std::nth_element(ids.begin() + lo, ids.begin() + split, ids.begin() + hi,
                     [&](int64_t a, int64_t b) {
                         return centroids[3 * a + axis] < centroids[3 * b + axis];
                     });
    rcb_recurse(centroids, ids, lo, split, left_parts, part_base, part_out);
    rcb_recurse(centroids, ids, split, hi, right_parts,
                part_base + left_parts, part_out);
}

void rcb_partition(const double* centroids, int64_t n, int32_t nparts,
                   int32_t* part_out, int64_t* order_out) {
    std::vector<int64_t> ids(n);
    std::iota(ids.begin(), ids.end(), 0);
    rcb_recurse(centroids, ids, 0, n, nparts, 0, part_out);
    // stable order: by partition id, preserving RCB spatial order within
    std::stable_sort(ids.begin(), ids.end(), [&](int64_t a, int64_t b) {
        return part_out[a] < part_out[b];
    });
    std::memcpy(order_out, ids.data(), n * sizeof(int64_t));
}

// ---------------------------------------------------------------------------
// Node first-touch reordering: nodes renumbered in order of first appearance
// in the (already element-reordered) connectivity. Improves gather locality.
// perm_out[old_node] = new_node ; n_nodes entries.
// ---------------------------------------------------------------------------
void node_first_touch(const int32_t* conn, int64_t n_elems, int64_t n_nodes,
                      int64_t* perm_out) {
    std::fill(perm_out, perm_out + n_nodes, (int64_t)-1);
    int64_t next = 0;
    for (int64_t i = 0; i < 4 * n_elems; ++i) {
        int32_t v = conn[i];
        if (perm_out[v] < 0) perm_out[v] = next++;
    }
    for (int64_t v = 0; v < n_nodes; ++v)
        if (perm_out[v] < 0) perm_out[v] = next++;
}

// ---------------------------------------------------------------------------
// Tet-tet adjacency via shared faces (each tet has <= 4 neighbors).
// neighbors_out: (n_elems, 4) int64, -1 where no neighbor (boundary face).
// Faces are matched with a hash map on sorted vertex triples.
// ---------------------------------------------------------------------------
void tet_adjacency(const int32_t* conn, int64_t n_elems,
                   int64_t* neighbors_out) {
    struct FaceRec { uint64_t key; int64_t elem; int8_t face; };
    const int fidx[4][3] = {{1, 2, 3}, {0, 2, 3}, {0, 1, 3}, {0, 1, 2}};
    std::vector<FaceRec> recs;
    recs.reserve(4 * n_elems);
    for (int64_t e = 0; e < n_elems; ++e) {
        for (int f = 0; f < 4; ++f) {
            uint64_t a = conn[4 * e + fidx[f][0]];
            uint64_t b = conn[4 * e + fidx[f][1]];
            uint64_t c = conn[4 * e + fidx[f][2]];
            if (a > b) std::swap(a, b);
            if (b > c) std::swap(b, c);
            if (a > b) std::swap(a, b);
            // pack three 21-bit ids (meshes < 2M nodes per shard)
            uint64_t key = (a << 42) | (b << 21) | c;
            recs.push_back({key, e, (int8_t)f});
        }
    }
    std::sort(recs.begin(), recs.end(),
              [](const FaceRec& x, const FaceRec& y) { return x.key < y.key; });
    std::fill(neighbors_out, neighbors_out + 4 * n_elems, (int64_t)-1);
    for (size_t i = 0; i + 1 < recs.size(); ++i) {
        if (recs[i].key == recs[i + 1].key) {
            neighbors_out[4 * recs[i].elem + recs[i].face] = recs[i + 1].elem;
            neighbors_out[4 * recs[i + 1].elem + recs[i + 1].face] = recs[i].elem;
            ++i;
        }
    }
}

}  // extern "C"
