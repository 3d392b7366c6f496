// Native tour-GA kernel for small ordering problems.
//
// The TPU batched GA (haphic_tpu/order/optimize.py) is the production
// path for large groups, but a fresh-process XLA compile on the tunnel
// TPU backend costs tens of seconds — far more than a toy genome's
// entire evolution. This kernel plays the role the bundled Go `allhic`
// binary plays in the reference (invoked at
// reference scripts/HapHiC_sort.py:618-642): a fast native evolutionary
// optimizer for problems too small to amortize an accelerator launch.
//
// Semantics mirror the device GA: (mu + lambda) selection over a
// population of (permutation, orientation) tours, OX1 order crossover,
// mutation ops {slot swap, segment inversion (flips orientations),
// block rotation, segment orientation flip}, monotone incumbent in row
// 0. The score of a tour is sum_r w_r / max(gap_r + d_r[combo], 1) with
// the four orientation-combination distances from the CLM records
// (reference scripts/HapHiC_cluster.py:376-401).
//
// Scoring is multithreaded over the offspring population; all random
// draws happen on the driver thread so results are deterministic for a
// given seed regardless of thread count.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Problem {
    int k;                       // contigs
    int64_t R;                   // CLM records
    const int64_t* lengths;      // [k]
    const int32_t* pa;           // [R] local id, a < b
    const int32_t* pb;           // [R]
    const float* d;              // [4*R] row-major: combo * R + r
    const float* w;              // [R]
};

struct Tour {
    std::vector<int32_t> order;  // slot -> contig
    std::vector<int32_t> ori;    // slot -> 1 if '-'
};

double score_tour(const Problem& p, const int32_t* order,
                  const int32_t* ori) {
    const int k = p.k;
    // slot offsets and inverse permutation
    std::vector<double> start_of(k);
    std::vector<int32_t> pos_of(k), ori_of(k);
    double off = 0.0;
    for (int s = 0; s < k; ++s) {
        int c = order[s];
        pos_of[c] = s;
        ori_of[c] = ori[s];
        start_of[c] = off;
        off += (double)p.lengths[c];
    }
    double total = 0.0;
    for (int64_t r = 0; r < p.R; ++r) {
        int a = p.pa[r], b = p.pb[r];
        int pav = pos_of[a];
        int pbv = pos_of[b];
        double sa = start_of[a], sb = start_of[b];
        double la = (double)p.lengths[a], lb = (double)p.lengths[b];
        bool a_first = pav < pbv;
        double gap = a_first ? sb - (sa + la) : sa - (sb + lb);
        int combo = 2 * ori_of[a] + ori_of[b];
        if (!a_first) combo = 3 - combo;
        double dist = gap + (double)p.d[(size_t)combo * p.R + r];
        if (dist < 1.0) dist = 1.0;
        total += (double)p.w[r] / dist;
    }
    return total;
}

void mutate(std::mt19937& rng, Tour& t, int k, double mutprob) {
    std::uniform_real_distribution<double> u01(0.0, 1.0);
    std::uniform_int_distribution<int> uk(0, k - 1), uop(0, 3);
    if (u01(rng) >= mutprob) { (void)uk(rng); (void)uk(rng);
        (void)uk(rng); (void)uop(rng); return; }
    int op = uop(rng);
    int e1 = uk(rng), e2 = uk(rng), e3 = uk(rng);
    int i = std::min(e1, e2), j = std::max(e1, e2);
    if (u01(rng) < 0.5) {
        // local move: geometric span (mean ~4) — near-optimal tours
        // need small repairs far more often than global rearrangements
        int span = 1 + (int)(std::log(1.0 - u01(rng)) / std::log(0.75));
        i = e1;
        j = std::min(e1 + span, k - 1);
        e3 = j;
    }
    switch (op) {
    case 0:  // swap
        std::swap(t.order[i], t.order[j]);
        std::swap(t.ori[i], t.ori[j]);
        break;
    case 1:  // inversion, flips orientations
        std::reverse(t.order.begin() + i, t.order.begin() + j + 1);
        std::reverse(t.ori.begin() + i, t.ori.begin() + j + 1);
        for (int s = i; s <= j; ++s) t.ori[s] = 1 - t.ori[s];
        break;
    case 2: {  // block rotation of [i, t) by (j - i)
        int tt = std::max(j, e3);
        if (tt > i + 1) {
            std::rotate(t.order.begin() + i, t.order.begin() + j,
                        t.order.begin() + tt);
            std::rotate(t.ori.begin() + i, t.ori.begin() + j,
                        t.ori.begin() + tt);
        }
        break;
    }
    default:  // orientation flip of the span
        for (int s = i; s <= j; ++s) t.ori[s] = 1 - t.ori[s];
    }
}

void ox_crossover(std::mt19937& rng, const std::vector<Tour>& pop,
                  int self_idx, int k, double xoprob, Tour& child) {
    std::uniform_real_distribution<double> u01(0.0, 1.0);
    std::uniform_int_distribution<int> up(0, (int)pop.size() - 1),
        uk(0, k - 1);
    const Tour& a = pop[self_idx];
    bool do_xo = u01(rng) < xoprob;
    int partner = up(rng);
    int e1 = uk(rng), e2 = uk(rng);
    child = a;
    if (!do_xo) return;
    int i = std::min(e1, e2), j = std::max(e1, e2);
    const Tour& b = pop[partner];
    std::vector<char> in_span_gene(k, 0);
    for (int s = i; s <= j; ++s) in_span_gene[a.order[s]] = 1;
    int slot = 0;
    for (int s = 0; s < k; ++s) {
        if (slot == i) slot = j + 1;          // skip the kept span
        if (slot >= k) break;
        int g = b.order[s];
        if (in_span_gene[g]) continue;
        child.order[slot] = g;
        child.ori[slot] = b.ori[s];
        ++slot;
    }
}

}  // namespace

extern "C" {

// Evolve one group. Returns the number of history entries written.
// hist arrays must hold at least ngen / log_every + 2 entries.
int tour_ga_run(
    int k, int64_t R,
    const int64_t* lengths, const int32_t* pa, const int32_t* pb,
    const float* d, const float* w,
    int npop, int ngen, double mutprob, double xoprob,
    uint64_t seed, int log_every, int nthreads,
    const int32_t* init_order, const int32_t* init_ori, int shuffle_init,
    int32_t* out_order, int32_t* out_ori, double* out_score,
    int32_t* hist_gen, double* hist_score) {
    Problem prob{k, R, lengths, pa, pb, d, w};
    std::mt19937 rng((uint32_t)seed);
    if (nthreads <= 0)
        nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads <= 0) nthreads = 1;

    std::vector<Tour> pop(npop);
    for (int i = 0; i < npop; ++i) {
        pop[i].order.assign(init_order, init_order + k);
        pop[i].ori.assign(init_ori, init_ori + k);
        if (shuffle_init && i > 0) {
            // shuffle order together with orientations
            for (int s = k - 1; s > 0; --s) {
                std::uniform_int_distribution<int> us(0, s);
                int t = us(rng);
                std::swap(pop[i].order[s], pop[i].order[t]);
                std::swap(pop[i].ori[s], pop[i].ori[t]);
            }
        }
    }

    std::vector<double> scores(npop);
    auto score_range = [&](std::vector<Tour>& ts, std::vector<double>& out) {
        std::atomic<size_t> next(0);
        auto worker = [&]() {
            for (size_t i; (i = next.fetch_add(1)) < ts.size();)
                out[i] = score_tour(prob, ts[i].order.data(),
                                    ts[i].ori.data());
        };
        std::vector<std::thread> threads;
        int nt = std::min<int>(nthreads, (int)ts.size());
        threads.reserve(nt);
        for (int t = 1; t < nt; ++t) threads.emplace_back(worker);
        worker();
        for (auto& th : threads) th.join();
    };
    score_range(pop, scores);

    // sort best-first (stable for determinism)
    auto sort_pop = [&](std::vector<Tour>& ts, std::vector<double>& sc) {
        std::vector<int> idx(ts.size());
        std::iota(idx.begin(), idx.end(), 0);
        std::stable_sort(idx.begin(), idx.end(), [&](int x, int y) {
            return sc[x] > sc[y];
        });
        std::vector<Tour> ts2(ts.size());
        std::vector<double> sc2(ts.size());
        for (size_t i = 0; i < idx.size(); ++i) {
            ts2[i] = std::move(ts[idx[i]]);
            sc2[i] = sc[idx[i]];
        }
        ts = std::move(ts2);
        sc = std::move(sc2);
    };
    sort_pop(pop, scores);

    int nhist = 0;
    hist_gen[nhist] = 0;
    hist_score[nhist++] = scores[0];

    std::vector<Tour> offspring(npop);
    std::vector<double> off_scores(npop);
    std::vector<Tour> merged(2 * npop);
    std::vector<double> merged_scores(2 * npop);
    for (int gen = 1; gen <= ngen; ++gen) {
        for (int i = 0; i < npop; ++i) {
            ox_crossover(rng, pop, i, k, xoprob, offspring[i]);
            mutate(rng, offspring[i], k, mutprob);
        }
        score_range(offspring, off_scores);
        for (int i = 0; i < npop; ++i) {
            merged[i] = std::move(pop[i]);
            merged_scores[i] = scores[i];
            merged[npop + i] = std::move(offspring[i]);
            merged_scores[npop + i] = off_scores[i];
        }
        sort_pop(merged, merged_scores);
        for (int i = 0; i < npop; ++i) {
            pop[i] = std::move(merged[i]);
            scores[i] = merged_scores[i];
        }
        if (gen % log_every == 0 || gen == ngen) {
            hist_gen[nhist] = gen;
            hist_score[nhist++] = scores[0];
        }
    }

    std::memcpy(out_order, pop[0].order.data(), sizeof(int32_t) * k);
    std::memcpy(out_ori, pop[0].ori.data(), sizeof(int32_t) * k);
    *out_score = scores[0];
    return nhist;
}

}  // extern "C"
