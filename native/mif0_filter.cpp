// Threaded mif0 (mutual-information) filter-value computation.
//
// Math identical to ipk_tpu/core/filter.py::mif0_filter_values_entries,
// which replicates the reference's mif0_filter (ipk/src/filter.cpp:60-119):
//
//   lin_i      = min(10^score_i, 1)                       (double)
//   S_w        = sum_i lin_i + (N - cnt) * thr
//   tt         = shannon(thr / S_w),  shannon(x) = -x * log2(x)
//   tv_sum     = sum_i shannon(lin_i / S_w)
//   fv         = S_w * ((N*tt + (tv_sum - cnt*tt)) - log2(N))
//
// The accumulation order equals np.bincount's (ascending entry index) and
// every elementwise step is the same mathematical function, but numpy's
// SIMD pow/log2 kernels round differently from libm in the last ulp, so
// values agree to ~2 ulp rather than bit-exactly (measured: ~0.03% of
// entries differ in the final bit; the DB stores filter values as f32,
// which absorbs the difference — committed goldens are unchanged).
// tests/test_filter.py bounds the ulp error. Keys are independent, so the
// key axis is trivially threadable (the parallelism the reference left on
// the table: its filter loop is sequential, filter.cpp:66-116).
//
// Exposed via ctypes (no pybind11 in this image): see
// ipk_tpu/core/filter.py::_load_native.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline double shannon(double x) { return -x * std::log2(x); }

void run_range(const float* scores, const int64_t* offsets, int64_t k0,
               int64_t k1, double N, double thr, double log2N, double* fv) {
    // lin cache: pow(10, s) dominates the filter's time and was computed
    // twice per entry (once per accumulation loop); caching halves that
    // while keeping the accumulation order — and therefore the values —
    // bit-identical
    std::vector<double> lin_buf;
    for (int64_t k = k0; k < k1; ++k) {
        const int64_t e0 = offsets[k], e1 = offsets[k + 1];
        const double cnt = static_cast<double>(e1 - e0);
        lin_buf.resize(static_cast<size_t>(e1 - e0));
        double ssum = 0.0;
        for (int64_t e = e0; e < e1; ++e) {
            double lin = std::pow(10.0, static_cast<double>(scores[e]));
            lin = std::fmin(lin, 1.0);
            lin_buf[static_cast<size_t>(e - e0)] = lin;
            ssum += lin;
        }
        const double score_sum = ssum + (N - cnt) * thr;
        const double tt = shannon(thr / score_sum);
        double tv_sum = 0.0;
        for (int64_t e = e0; e < e1; ++e)
            tv_sum += shannon(lin_buf[static_cast<size_t>(e - e0)] /
                              score_sum);
        const double HcBw1 = N * tt + (tv_sum - cnt * tt);
        fv[k] = score_sum * (HcBw1 - log2N);
    }
}

}  // namespace

extern "C" {

// scores: [num_entries] f32 log10 scores, grouped by key.
// offsets: [num_keys + 1] entry offsets per key (ascending).
void ipk_mif0_entries(const float* scores, const int64_t* offsets,
                      int64_t num_keys, double N, double thr,
                      double* fv_out, int32_t num_threads) {
    const double log2N = std::log2(N);
    if (num_threads <= 1 || num_keys < (1 << 14)) {
        run_range(scores, offsets, 0, num_keys, N, thr, log2N, fv_out);
        return;
    }
    // split on key boundaries; balance by entry count, not key count
    // (entry-heavy keys dominate the pow/log2 work)
    const int64_t total_entries = offsets[num_keys];
    std::vector<std::thread> threads;
    threads.reserve(num_threads);
    int64_t k0 = 0;
    for (int32_t t = 0; t < num_threads && k0 < num_keys; ++t) {
        const int64_t target =
            (total_entries * (t + 1)) / num_threads;
        int64_t k1 = (t == num_threads - 1) ? num_keys : k0;
        while (k1 < num_keys && offsets[k1] < target) ++k1;
        if (k1 > k0) {
            threads.emplace_back(run_range, scores, offsets, k0, k1, N, thr,
                                 log2N, fv_out);
            k0 = k1;
        }
    }
    for (auto& th : threads) th.join();
}

// Entry-section permutation for _sort_batch (builder.py): concatenate the
// entry ranges [offs[order[i]], offs[order[i]] + counts[order[i]]) in order,
// applying the permutation directly to the branch/score(/position) columns.
// Pure memory movement → threads split the *output* rows evenly and each
// walks its own key range (out_offs gives every thread its start).
void ipk_range_gather_apply(const int64_t* offs, const int64_t* counts,
                            const int64_t* order, const int64_t* out_offs,
                            int64_t n_keys, const uint32_t* br_in,
                            const float* sc_in, const uint32_t* pos_in,
                            uint32_t* br_out, float* sc_out,
                            uint32_t* pos_out, int32_t num_threads) {
    const int64_t total = out_offs[n_keys];
    auto run = [&](int64_t k0, int64_t k1) {
        for (int64_t i = k0; i < k1; ++i) {
            const int64_t src = offs[order[i]];
            const int64_t cnt = counts[order[i]];
            const int64_t dst = out_offs[i];
            for (int64_t e = 0; e < cnt; ++e) {
                br_out[dst + e] = br_in[src + e];
                sc_out[dst + e] = sc_in[src + e];
            }
            if (pos_in) {
                for (int64_t e = 0; e < cnt; ++e)
                    pos_out[dst + e] = pos_in[src + e];
            }
        }
    };
    if (num_threads <= 1 || total < (1 << 18)) {
        run(0, n_keys);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(num_threads);
    int64_t k0 = 0;
    for (int32_t t = 0; t < num_threads && k0 < n_keys; ++t) {
        const int64_t target = (total * (t + 1)) / num_threads;
        int64_t k1 = (t == num_threads - 1) ? n_keys : k0;
        while (k1 < n_keys && out_offs[k1] < target) ++k1;
        if (k1 > k0) {
            threads.emplace_back(run, k0, k1);
            k0 = k1;
        }
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
