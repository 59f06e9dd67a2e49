// Native batch gatherer: assemble fixed-shape epoch batches from the
// preprocessed [C, T_total] recording memmap.
//
// This is the host-side hot path of the input pipeline: at batch 256 x
// 273ch x 361 samples each batch is ~100 MB of strided copies plus a
// per-epoch baseline correction (mean over the [tmin, 0] window
// subtracted per channel, bm/dataset.py mne.Epochs baseline semantics).
// numpy does this single-threaded per item inside the GIL; here it is
// one OpenMP-style parallel pass at memory bandwidth.
//
// The *_bf16 entry points assemble bfloat16 DIRECTLY (round to nearest
// even): when the wire format is bf16 (parallel.transfer_dtype), the
// fp32-assemble-then-numpy-cast pipeline writes + rereads the full
// fp32 batch for nothing — direct bf16 assembly halves the host memory
// traffic the loader-sufficiency budget is built on.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Layout contracts:
//   raw:   [n_channels, total_samples] float32 (row-major, the memmap)
//   out:   [batch, out_channels, n_times] row-major, pre-allocated,
//          float32 or bfloat16(uint16); out_channels >= n_channels,
//          tail rows zero-padded
//   starts:[batch] int64 epoch start sample (already offset by tmin)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    if ((x & 0x7fffffffu) > 0x7f800000u)        // NaN: keep quiet bit
        return static_cast<uint16_t>((x >> 16) | 0x0040u);
    const uint32_t lsb = (x >> 16) & 1u;        // round to nearest even
    x += 0x7fffu + lsb;
    return static_cast<uint16_t>(x >> 16);
}

template <typename OutT>
inline OutT store_f32(float v);
template <>
inline float store_f32<float>(float v) { return v; }
template <>
inline uint16_t store_f32<uint16_t>(float v) { return f32_to_bf16(v); }

template <typename OutT>
int gather_epochs_impl(const float* raw, int64_t n_channels,
                       int64_t total_samples, const int64_t* starts,
                       int64_t batch, int64_t n_times,
                       int64_t out_channels, int64_t baseline_len,
                       OutT* out, int n_threads) {
    if (out_channels < n_channels || baseline_len > n_times) return -1;
    for (int64_t b = 0; b < batch; ++b) {
        if (starts[b] < 0 || starts[b] + n_times > total_samples) return -1;
    }
    if (n_threads <= 0) {
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 4;
    }

    std::atomic<int64_t> next(0);
    const int64_t n_jobs = batch * n_channels;

    auto worker = [&]() {
        // one job = one (epoch, channel) row: copy + baseline subtract
        for (;;) {
            int64_t job = next.fetch_add(8, std::memory_order_relaxed);
            if (job >= n_jobs) return;
            int64_t end = job + 8 < n_jobs ? job + 8 : n_jobs;
            for (; job < end; ++job) {
                const int64_t b = job / n_channels;
                const int64_t c = job % n_channels;
                const float* src = raw + c * total_samples + starts[b];
                OutT* dst = out + (b * out_channels + c) * n_times;
                if (job + 1 < n_jobs) {
                    // rows are short (~1.5 KB) and strided by a whole
                    // channel: ask for the next row's first lines early
                    const int64_t b2 = (job + 1) / n_channels;
                    const int64_t c2 = (job + 1) % n_channels;
                    const float* nxt =
                        raw + c2 * total_samples + starts[b2];
                    __builtin_prefetch(nxt, 0, 1);
                    __builtin_prefetch(nxt + 16, 0, 1);
                }
                if (baseline_len > 0) {
                    // single fused pass: mean from SRC, then
                    // dst = src - m (the memcpy-then-fixup form reads
                    // dst back twice; this writes each line once)
                    double mean = 0.0;
                    for (int64_t t = 0; t < baseline_len; ++t)
                        mean += src[t];
                    const float m =
                        static_cast<float>(mean / baseline_len);
                    for (int64_t t = 0; t < n_times; ++t)
                        dst[t] = store_f32<OutT>(src[t] - m);
                } else if (sizeof(OutT) == sizeof(float)) {
                    std::memcpy(dst, src, sizeof(float) * n_times);
                } else {
                    for (int64_t t = 0; t < n_times; ++t)
                        dst[t] = store_f32<OutT>(src[t]);
                }
            }
        }
    };

    std::vector<std::thread> threads;
    const int use = n_threads > 1 ? n_threads - 1 : 0;
    for (int k = 0; k < use; ++k) threads.emplace_back(worker);
    worker();
    for (auto& t : threads) t.join();

    // zero the channel padding rows
    if (out_channels > n_channels) {
        for (int64_t b = 0; b < batch; ++b) {
            OutT* pad = out + (b * out_channels + n_channels) * n_times;
            std::memset(pad, 0,
                        sizeof(OutT) * (out_channels - n_channels)
                            * n_times);
        }
    }
    return 0;
}

}  // namespace

extern "C" {

// Gather epochs + optional baseline correction (float32 out).
//   baseline_len: samples from epoch start to average & subtract
//                 (0 = no baseline correction)
// Returns 0 on success, -1 on bounds error.
int gather_epochs(const float* raw, int64_t n_channels,
                  int64_t total_samples, const int64_t* starts,
                  int64_t batch, int64_t n_times, int64_t out_channels,
                  int64_t baseline_len, float* out, int n_threads) {
    return gather_epochs_impl<float>(raw, n_channels, total_samples,
                                     starts, batch, n_times,
                                     out_channels, baseline_len, out,
                                     n_threads);
}

// Same, assembling bfloat16 (as uint16 bit patterns) directly.
int gather_epochs_bf16(const float* raw, int64_t n_channels,
                       int64_t total_samples, const int64_t* starts,
                       int64_t batch, int64_t n_times,
                       int64_t out_channels, int64_t baseline_len,
                       uint16_t* out, int n_threads) {
    return gather_epochs_impl<uint16_t>(raw, n_channels, total_samples,
                                        starts, batch, n_times,
                                        out_channels, baseline_len, out,
                                        n_threads);
}

// Dense track slicing: gather [batch, dim, n_times] windows from a
// feature track [dim, total_samples] (no baseline).
int gather_track(const float* track, int64_t dim, int64_t total_samples,
                 const int64_t* starts, int64_t batch, int64_t n_times,
                 float* out, int n_threads) {
    return gather_epochs_impl<float>(track, dim, total_samples, starts,
                                     batch, n_times, dim, 0, out,
                                     n_threads);
}

int gather_track_bf16(const float* track, int64_t dim,
                      int64_t total_samples, const int64_t* starts,
                      int64_t batch, int64_t n_times, uint16_t* out,
                      int n_threads) {
    return gather_epochs_impl<uint16_t>(track, dim, total_samples,
                                        starts, batch, n_times, dim, 0,
                                        out, n_threads);
}

}  // extern "C"
