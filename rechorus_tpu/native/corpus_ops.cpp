// Native host-side corpus kernels.
//
// The TPU compute path is JAX/XLA/Pallas; this is the C++ runtime layer
// for the host input pipeline -- the transforms that turn a parsed corpus
// into fixed-shape device arrays. They replace per-row Python loops in
// data/readers.py (history_arrays, dual_history_arrays) that dominate
// corpus build time on large datasets (the reference offloads the same
// work to torch DataLoader worker processes per batch, every epoch;
// here it runs once per corpus).
//
// Build: g++ -O3 -march=native -shared -fPIC corpus_ops.cpp -o libcorpus_ops.so
// ABI: plain C, called through ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Left-aligned truncated history per row.
//   users[n], positions[n]: row user id + index into that user's history
//   his_items_flat / his_times_flat: concatenated per-user histories
//   user_offsets[n_users + 1]: start offset of each user's history
// Outputs (pre-allocated by caller):
//   out_items [n, H] int32 (0-padded), out_times [n, H] int64, out_len [n]
void build_history_arrays(
    const int64_t* users, const int64_t* positions, int64_t n,
    const int64_t* his_items_flat, const int64_t* his_times_flat,
    const int64_t* user_offsets,
    int64_t history_max,
    int32_t* out_items, int64_t* out_times, int32_t* out_len) {
  const int64_t H = history_max;
  for (int64_t r = 0; r < n; ++r) {
    const int64_t p = positions[r];
    if (p <= 0) { out_len[r] = 0; continue; }
    const int64_t base = user_offsets[users[r]];
    const int64_t start = p > H ? p - H : 0;
    const int64_t L = p - start;
    const int64_t* src_i = his_items_flat + base + start;
    const int64_t* src_t = his_times_flat + base + start;
    int32_t* dst_i = out_items + r * H;
    int64_t* dst_t = out_times + r * H;
    for (int64_t j = 0; j < L; ++j) {
      dst_i[j] = static_cast<int32_t>(src_i[j]);
      dst_t[j] = src_t[j];
    }
    out_len[r] = static_cast<int32_t>(L);
  }
}

// Padded per-user clicked matrix: rows of sorted item ids, 0-padded.
//   clicked_flat: concatenated sorted per-user clicked ids
//   offsets[n_users + 1]
//   out [n_users, max_len] int32 pre-zeroed by caller
void fill_clicked_matrix(
    const int64_t* clicked_flat, const int64_t* offsets, int64_t n_users,
    int64_t max_len, int32_t* out) {
  for (int64_t u = 0; u < n_users; ++u) {
    const int64_t s = offsets[u], e = offsets[u + 1];
    int32_t* dst = out + u * max_len;
    for (int64_t j = s; j < e; ++j) dst[j - s] = static_cast<int32_t>(clicked_flat[j]);
  }
}

}  // extern "C"
