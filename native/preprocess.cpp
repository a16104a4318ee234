// Native host-side preprocessing for the data-ingest pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// HOST side of dataset construction (reference:utils/data_utils.py:78-156
// does this with sklearn/scipy loops): per-block z-score over ragged trial
// lists, Gaussian time-smoothing, and pad/truncate — the three passes that
// dominate .mat ingest for the 12k-trial corpus. Exposed as a plain C ABI
// consumed via ctypes (no Python headers needed); data/native.py falls back
// to numpy when the shared library is absent.
//
// Build: make -C native   (produces libfkpreproc.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Per-block z-score over concatenated trials.
//   data:      [total_rows, channels] float32, all trials concatenated
//   row_block: [total_rows] int32 block id per row (pre-expanded by caller)
//   out:       [total_rows, channels] float32
// Matches sklearn StandardScaler semantics: ddof=0; zero-std columns pass
// through unscaled (reference:utils/data_utils.py:100-108).
void zscore_by_blocks(const float* data, const int32_t* row_block,
                      int64_t total_rows, int64_t channels,
                      int32_t num_blocks, float* out) {
    std::vector<double> sum((size_t)num_blocks * channels, 0.0);
    std::vector<double> sumsq((size_t)num_blocks * channels, 0.0);
    std::vector<int64_t> count(num_blocks, 0);

    for (int64_t r = 0; r < total_rows; ++r) {
        const int32_t b = row_block[r];
        const float* row = data + r * channels;
        double* s = sum.data() + (size_t)b * channels;
        double* q = sumsq.data() + (size_t)b * channels;
        for (int64_t c = 0; c < channels; ++c) {
            s[c] += row[c];
            q[c] += (double)row[c] * row[c];
        }
        count[b]++;
    }

    std::vector<float> mean((size_t)num_blocks * channels);
    std::vector<float> inv_std((size_t)num_blocks * channels);
    for (int32_t b = 0; b < num_blocks; ++b) {
        const double n = count[b] > 0 ? (double)count[b] : 1.0;
        for (int64_t c = 0; c < channels; ++c) {
            const size_t i = (size_t)b * channels + c;
            const double m = sum[i] / n;
            double var = sumsq[i] / n - m * m;
            if (var < 0) var = 0;
            const double sd = std::sqrt(var);
            mean[i] = (float)m;
            inv_std[i] = sd == 0.0 ? 1.0f : (float)(1.0 / sd);
        }
    }

    for (int64_t r = 0; r < total_rows; ++r) {
        const int32_t b = row_block[r];
        const float* row = data + r * channels;
        float* orow = out + r * channels;
        const float* m = mean.data() + (size_t)b * channels;
        const float* is = inv_std.data() + (size_t)b * channels;
        for (int64_t c = 0; c < channels; ++c)
            orow[c] = (row[c] - m[c]) * is[c];
    }
}

// Gaussian smoothing along time (axis 0) of one [rows, channels] trial,
// scipy.ndimage.gaussian_filter1d semantics: truncate=4.0, 'reflect'
// boundary (edge sample duplicated).
void gaussian_smooth(const float* data, int64_t rows, int64_t channels,
                     float sigma, float* out) {
    const int radius = (int)(4.0f * sigma + 0.5f);
    std::vector<float> k(2 * radius + 1);
    double ksum = 0.0;
    for (int i = -radius; i <= radius; ++i) {
        const double v = std::exp(-0.5 * (double)i * i / (sigma * sigma));
        k[i + radius] = (float)v;
        ksum += v;
    }
    for (auto& v : k) v = (float)(v / ksum);

    for (int64_t r = 0; r < rows; ++r) {
        float* orow = out + r * channels;
        std::memset(orow, 0, sizeof(float) * channels);
        for (int i = -radius; i <= radius; ++i) {
            int64_t src = r + i;
            // scipy 'reflect': (d c b a | a b c d | d c b a)
            if (src < 0) src = -src - 1;
            if (src >= rows) src = 2 * rows - src - 1;
            if (src < 0) src = 0;           // degenerate tiny rows
            if (src >= rows) src = rows - 1;
            const float w = k[i + radius];
            const float* srow = data + src * channels;
            for (int64_t c = 0; c < channels; ++c)
                orow[c] += w * srow[c];
        }
    }
}

// Zero-pad or truncate one [rows, channels] trial to [max_len, channels].
void pad_truncate(const float* data, int64_t rows, int64_t channels,
                  int64_t max_len, float* out) {
    const int64_t keep = rows < max_len ? rows : max_len;
    std::memcpy(out, data, sizeof(float) * keep * channels);
    if (keep < max_len)
        std::memset(out + keep * channels, 0,
                    sizeof(float) * (max_len - keep) * channels);
}

}  // extern "C"
