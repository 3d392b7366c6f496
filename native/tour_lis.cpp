// Weighted-LIS agreement between a fast-sort tour and a GA tour, over
// every rotation of the fast-sort tour — the native fast path of the
// arbiter (compare_fast_sort_and_allhic semantics, reference
// scripts/HapHiC_sort.py:645-724).
//
// The reference's DP is O(n^2) per rotation and tries n-1 rotations
// (O(n^3) total, quadratic Python per rotation). Here each rotation
// runs a Fenwick-tree max-weight-increasing-subsequence in
// O(n log n), with an epoch-stamped tree so per-rotation resets are
// O(1): O(n^2 log n) worst case, with an early exit as soon as any
// rotation reaches the agreement threshold.
//
// The signed order list is rotation-invariant (rotating the tour only
// rotates the sequence), so callers pass it once:
//   values[i]  = +(ga_pos+1) when orientations agree, -(ga_pos+1)
//                otherwise (distinct, nonzero, |v| <= n)
//   weights[i] = contig length
//
// lis_any_rotation_exceeds returns 1 iff some checked rotation has
// max(forward_wlis, backward_wlis) / group_len >= ratio (the same
// IEEE-double comparison the Python reference makes).

#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

// Fenwick tree for prefix max with O(1) reset via epoch stamps.
struct MaxBIT {
    std::vector<int64_t> tree;
    std::vector<uint32_t> stamp;
    uint32_t epoch = 0;
    int64_t n = 0;

    void init(int64_t size) {
        n = size;
        tree.assign(static_cast<size_t>(size) + 1, 0);
        stamp.assign(static_cast<size_t>(size) + 1, 0);
        epoch = 0;
    }
    void reset() { ++epoch; }
    int64_t get(int64_t i) const {
        return stamp[static_cast<size_t>(i)] == epoch
                   ? tree[static_cast<size_t>(i)]
                   : 0;
    }
    void set(int64_t i, int64_t v) {
        tree[static_cast<size_t>(i)] = v;
        stamp[static_cast<size_t>(i)] = epoch;
    }
    // a[pos] = max(a[pos], v)
    void update(int64_t pos, int64_t v) {
        for (int64_t i = pos; i <= n; i += i & (-i))
            if (get(i) < v) set(i, v);
    }
    // max over a[1..pos] (0 when pos < 1)
    int64_t query(int64_t pos) const {
        int64_t best = 0;
        for (int64_t i = pos; i > 0; i -= i & (-i)) {
            int64_t g = get(i);
            if (g > best) best = g;
        }
        return best;
    }
};

// Max-weight strictly-increasing subsequence of ranks[0..m) (ranks in
// [1, maxrank], distinct) with weights w[0..m).
int64_t wlis(const int64_t* ranks, const int64_t* w, int64_t m,
             MaxBIT& bit) {
    bit.reset();
    int64_t best = 0;
    for (int64_t i = 0; i < m; ++i) {
        int64_t d = bit.query(ranks[i] - 1) + w[i];
        if (d > best) best = d;
        bit.update(ranks[i], d);
    }
    return best;
}

}  // namespace

extern "C" {

// values/weights: length n (rotation-0 order). group_len: sum of
// weights. ratio: the agreement cutoff (0.9 in the reference).
// Checks rotations r = 0 .. n-2 like the reference loop
// (range(len(ctgs) - 1); zero rotations for n = 1). Returns 1 on the
// first rotation whose max(forward, backward) / group_len >= ratio,
// else 0.
int lis_any_rotation_exceeds(const int64_t* values,
                             const int64_t* weights, int64_t n,
                             double group_len, double ratio) {
    if (n <= 0) return 0;
    int64_t maxabs = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t a = values[i] < 0 ? -values[i] : values[i];
        if (a > maxabs) maxabs = a;
    }
    MaxBIT bit;
    bit.init(maxabs + 1);
    // rotation-r sequence = values[r:], values[:r]; build each
    // rotation's positive-rank and negative-rank streams in order
    std::vector<int64_t> pr(static_cast<size_t>(n));
    std::vector<int64_t> pw(static_cast<size_t>(n));
    std::vector<int64_t> nr(static_cast<size_t>(n));
    std::vector<int64_t> nw(static_cast<size_t>(n));
    int64_t nrot = n - 1;
    for (int64_t r = 0; r < nrot; ++r) {
        int64_t np = 0, nn = 0;
        for (int64_t k = 0; k < n; ++k) {
            int64_t idx = k + r;
            if (idx >= n) idx -= n;
            int64_t v = values[idx];
            if (v > 0) {
                pr[static_cast<size_t>(np)] = v;
                pw[static_cast<size_t>(np)] = weights[idx];
                ++np;
            } else {
                // increasing over negatives -v (toward zero) ==
                // increasing rank maxabs + 1 + v
                nr[static_cast<size_t>(nn)] = maxabs + 1 + v;
                nw[static_cast<size_t>(nn)] = weights[idx];
                ++nn;
            }
        }
        int64_t f = wlis(pr.data(), pw.data(), np, bit);
        int64_t b = wlis(nr.data(), nw.data(), nn, bit);
        int64_t m = f > b ? f : b;
        if (static_cast<double>(m) / group_len >= ratio) return 1;
    }
    return 0;
}

}  // extern "C"
