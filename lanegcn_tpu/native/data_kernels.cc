// Native data-pipeline kernels for the host side of the framework.
//
// The reference delegates these to scipy sparse SpGEMM (dilated neighbors,
// reference data.py:520-534), a GPU dense N^2 pass (left/right cross-edge
// inference, preprocess_data.py:287-392), and on-GPU thresholding (fusion
// edges, lanegcn.py:672-689). Here they are tight C++ loops invoked via
// ctypes from lanegcn_tpu.native, keeping the input pipeline off the
// critical path of TPU training.
//
// Build: g++ -O3 -shared -fPIC -o libdata_kernels.so data_kernels.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Boolean CSR self-product (A*A) repeated: scale i holds exact 2^i-hop
// reachability pairs. Outputs are concatenated (u, v) per scale into
// out_u/out_v with per-scale counts in out_counts; returns total edges
// written, or -1 if out_cap would be exceeded.
int64_t dilated_nbrs(
    const int32_t* u, const int32_t* v, int64_t num_edges, int32_t num_nodes,
    int32_t num_scales, int32_t* out_u, int32_t* out_v, int64_t out_cap,
    int64_t* out_counts) {
  // Build CSR of the scale-0 adjacency.
  std::vector<int64_t> indptr(num_nodes + 1, 0);
  std::vector<int32_t> indices(num_edges);
  for (int64_t e = 0; e < num_edges; ++e) indptr[u[e] + 1]++;
  for (int32_t i = 0; i < num_nodes; ++i) indptr[i + 1] += indptr[i];
  {
    std::vector<int64_t> fill(indptr.begin(), indptr.end() - 1);
    for (int64_t e = 0; e < num_edges; ++e) indices[fill[u[e]]++] = v[e];
  }

  std::vector<int32_t> marker(num_nodes, -1);
  int64_t total = 0;
  for (int32_t s = 1; s < num_scales; ++s) {
    // C = A * A (boolean) with a per-row marker.
    std::vector<int64_t> new_indptr(num_nodes + 1, 0);
    std::vector<int32_t> new_indices;
    new_indices.reserve(indices.size());
    for (int32_t i = 0; i < num_nodes; ++i) {
      int64_t row_start = new_indices.size();
      for (int64_t jj = indptr[i]; jj < indptr[i + 1]; ++jj) {
        int32_t j = indices[jj];
        for (int64_t kk = indptr[j]; kk < indptr[j + 1]; ++kk) {
          int32_t k = indices[kk];
          if (marker[k] != i) {
            marker[k] = i;
            new_indices.push_back(k);
          }
        }
      }
      new_indptr[i + 1] = new_indices.size() - row_start;
    }
    for (int32_t i = 0; i < num_nodes; ++i) new_indptr[i + 1] += new_indptr[i];
    std::fill(marker.begin(), marker.end(), -1);

    int64_t count = new_indices.size();
    if (total + count > out_cap) return -1;
    // Emit COO sorted by row (CSR order — matches scipy's tocoo()).
    int64_t w = total;
    for (int32_t i = 0; i < num_nodes; ++i) {
      for (int64_t jj = new_indptr[i]; jj < new_indptr[i + 1]; ++jj) {
        out_u[w] = i;
        out_v[w] = new_indices[jj];
        ++w;
      }
    }
    out_counts[s - 1] = count;
    total += count;
    indptr.swap(new_indptr);
    indices.swap(new_indices);
  }
  return total;
}

// Left/right cross-lane edge inference. For each node i with an allowed lane
// set (reach[lane_idcs[i]][lane_idcs[j]]), find the nearest j within
// cross_dist whose direction differs by < pi/4. Returns edge count.
int64_t cross_edges(
    const float* ctrs,      // [N, 2]
    const float* feats,     // [N, 2]
    const int64_t* lane_idcs,  // [N]
    const uint8_t* reach,   // [L, L] row-major
    int32_t num_nodes, int32_t num_lanes, float cross_dist,
    int32_t* out_u, int32_t* out_v, int64_t out_cap) {
  const float max_dt = 0.25f * static_cast<float>(M_PI);
  const float two_pi = 2.0f * static_cast<float>(M_PI);
  int64_t count = 0;
  for (int32_t i = 0; i < num_nodes; ++i) {
    const uint8_t* row = reach + lane_idcs[i] * num_lanes;
    float best = 1e6f;
    int32_t best_j = -1;
    const float xi = ctrs[2 * i], yi = ctrs[2 * i + 1];
    for (int32_t j = 0; j < num_nodes; ++j) {
      if (!row[lane_idcs[j]]) continue;
      const float dx = xi - ctrs[2 * j], dy = yi - ctrs[2 * j + 1];
      const float d = std::sqrt(dx * dx + dy * dy);
      if (d < best) {
        best = d;
        best_j = j;
      }
    }
    if (best_j < 0 || best >= cross_dist) continue;
    const float t1 = std::atan2(feats[2 * i + 1], feats[2 * i]);
    const float t2 = std::atan2(feats[2 * best_j + 1], feats[2 * best_j]);
    float dt = std::fabs(t1 - t2);
    if (dt > static_cast<float>(M_PI)) dt = std::fabs(dt - two_pi);
    if (dt < max_dt) {
      if (count >= out_cap) return -1;
      out_u[count] = i;
      out_v[count] = best_j;
      ++count;
    }
  }
  return count;
}

// All (i, j) with ||dst[i] - src[j]|| <= th, row-major order.
int64_t threshold_edges(
    const float* dst, int32_t num_dst, const float* src, int32_t num_src,
    float th, int32_t* out_u, int32_t* out_v, int64_t out_cap) {
  const float th2 = th * th;
  int64_t count = 0;
  for (int32_t i = 0; i < num_dst; ++i) {
    const float xi = dst[2 * i], yi = dst[2 * i + 1];
    for (int32_t j = 0; j < num_src; ++j) {
      const float dx = xi - src[2 * j], dy = yi - src[2 * j + 1];
      if (dx * dx + dy * dy <= th2) {
        if (count >= out_cap) return -1;
        out_u[count] = i;
        out_v[count] = j;
        ++count;
      }
    }
  }
  return count;
}

}  // extern "C"
