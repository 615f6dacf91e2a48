// Native layout/graph-builder kernels (C++ side of the prover runtime).
//
// Role parity: the reference's layout/assembly machinery is native Rust
// (halo2's permutation Assembly built while the layouter runs,
// SURVEY.md §2.2 D-PROOF2); here the copy-constraint graph of a compiled
// circuit is folded into permutation cycles in C++ — union-find over
// millions of cells dominates keygen host time in pure python.
//
// Exposed via ctypes (no pybind11 in this image; see builder docs):
//   permutation_mapping(m, n, copies, n_copies, out)
//     copies: int64[n_copies*4] as (col_a, row_a, col_b, row_b)
//     out:    int32[m*n*2] filled with (image_col, image_row) per cell
//
// Build: make -C native (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <vector>
#include <numeric>

namespace {

struct UnionFind {
    std::vector<int64_t> parent;
    explicit UnionFind(int64_t n) : parent(n) {
        std::iota(parent.begin(), parent.end(), 0);
    }
    int64_t find(int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    }
    void unite(int64_t a, int64_t b) {
        int64_t ra = find(a), rb = find(b);
        if (ra != rb) parent[ra] = rb;
    }
};

}  // namespace

extern "C" {

// Builds the sigma mapping: each copy-equivalence class becomes one cycle,
// cells not in any class map to themselves.
void permutation_mapping(int64_t m, int64_t n, const int64_t* copies,
                         int64_t n_copies, int32_t* out) {
    const int64_t total = m * n;
    UnionFind uf(total);
    for (int64_t i = 0; i < n_copies; ++i) {
        const int64_t a = copies[4 * i + 0] * n + copies[4 * i + 1];
        const int64_t b = copies[4 * i + 2] * n + copies[4 * i + 3];
        uf.unite(a, b);
    }
    // single pass: chain cells of each class into a cycle.
    // head[root] = first member seen; prev[root] = latest member seen.
    std::vector<int64_t> head(total, -1), prev(total, -1);
    for (int64_t cell = 0; cell < total; ++cell) {
        const int64_t r = uf.find(cell);
        if (head[r] < 0) {
            head[r] = cell;
            prev[r] = cell;
        } else {
            // previous member points to this cell
            out[2 * prev[r] + 0] = static_cast<int32_t>(cell / n);
            out[2 * prev[r] + 1] = static_cast<int32_t>(cell % n);
            prev[r] = cell;
        }
    }
    // close each cycle: last member points to the head
    for (int64_t cell = 0; cell < total; ++cell) {
        const int64_t r = uf.find(cell);
        if (prev[r] == cell) {
            out[2 * cell + 0] = static_cast<int32_t>(head[r] / n);
            out[2 * cell + 1] = static_cast<int32_t>(head[r] % n);
        }
    }
}

}  // extern "C"
