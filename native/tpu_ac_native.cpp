// tpu_ac native host-side kernels (C ABI, loaded via ctypes).
//
// The reference leans on two native host libraries the TPU build replaces:
// munkres (Hungarian assignment, Anomaly-Clustering/examples/test.py:124-126)
// and FAISS flat L2 search on the host (models/patchcore/common.py:14-117).
// Device-side search runs as tiled MXU matmuls (tpu_ac.ops.distances); this
// library covers the host-side needs: an O(n^3) shortest-augmenting-path
// Hungarian solver and a std::thread-parallel exact k-NN for CPU-resident
// memory banks (index persistence / serving without a device).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//            tpu_ac_native.cpp -o libtpu_ac_native.so

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Hungarian algorithm (Jonker-Volgenant shortest augmenting path, O(n^3)).
// cost: row-major [n x n]; assignment[i] = column assigned to row i.
// Minimizes total cost. Returns the optimal total cost.
double tpu_ac_hungarian(const double* cost, int32_t n, int32_t* assignment) {
  // potentials u (rows), v (cols); way[j] = previous column on the
  // augmenting path; p[j] = row matched to column j (1-indexed internally).
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int32_t> p(n + 1, 0), way(n + 1, 0);
  for (int32_t i = 1; i <= n; ++i) {
    p[0] = i;
    int32_t j0 = 0;
    std::vector<double> minv(n + 1, DBL_MAX);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int32_t i0 = p[j0], j1 = 0;
      double delta = DBL_MAX;
      for (int32_t j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int32_t j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int32_t j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  double total = 0.0;
  for (int32_t j = 1; j <= n; ++j) {
    if (p[j] > 0) {
      assignment[p[j] - 1] = j - 1;
      total += cost[(p[j] - 1) * n + (j - 1)];
    }
  }
  return total;
}

// Exact k-NN by squared L2 distance, multithreaded over query rows.
// query: [m x d], bank: [n x d]; out_d2/out_idx: [m x k] row-major.
// Matches FAISS IndexFlatL2.search semantics (squared distances,
// ascending).
void tpu_ac_knn_l2(const float* query, int64_t m, const float* bank,
                   int64_t n, int64_t d, int64_t k, float* out_d2,
                   int32_t* out_idx, int32_t n_threads) {
  if (k > n) k = n;
  std::vector<float> bank_sq(n);
  for (int64_t j = 0; j < n; ++j) {
    double s = 0.0;
    const float* b = bank + j * d;
    for (int64_t t = 0; t < d; ++t) s += (double)b[t] * b[t];
    bank_sq[j] = (float)s;
  }
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<std::pair<float, int32_t>> heap;  // max-heap of size k
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= m) break;
      const float* q = query + i * d;
      double q_sq = 0.0;
      for (int64_t t = 0; t < d; ++t) q_sq += (double)q[t] * q[t];
      heap.clear();
      for (int64_t j = 0; j < n; ++j) {
        const float* b = bank + j * d;
        double dot = 0.0;
        for (int64_t t = 0; t < d; ++t) dot += (double)q[t] * b[t];
        float d2 = (float)(q_sq - 2.0 * dot + bank_sq[j]);
        if (d2 < 0.0f) d2 = 0.0f;
        if ((int64_t)heap.size() < k) {
          heap.emplace_back(d2, (int32_t)j);
          std::push_heap(heap.begin(), heap.end());
        } else if (d2 < heap.front().first) {
          std::pop_heap(heap.begin(), heap.end());
          heap.back() = {d2, (int32_t)j};
          std::push_heap(heap.begin(), heap.end());
        }
      }
      std::sort_heap(heap.begin(), heap.end());
      for (int64_t r = 0; r < k; ++r) {
        out_d2[i * k + r] = heap[r].first;
        out_idx[i * k + r] = heap[r].second;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Greedy coreset selection on the host (sampler.py:100-115 semantics):
// anchor[i] starts as the caller-provided init; each of n_select rounds
// picks argmax(anchor) and relaxes anchor with distances to the pick.
void tpu_ac_greedy_coreset(const float* feats, int64_t n, int64_t d,
                           float* anchor, int64_t n_select,
                           int32_t* selected, int32_t n_threads) {
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> threads;
  for (int64_t s = 0; s < n_select; ++s) {
    int64_t best = 0;
    float best_v = -FLT_MAX;
    for (int64_t i = 0; i < n; ++i) {
      if (anchor[i] > best_v) {
        best_v = anchor[i];
        best = i;
      }
    }
    selected[s] = (int32_t)best;
    const float* c = feats + best * d;
    std::atomic<int64_t> next(0);
    const int64_t chunk = 4096;
    auto relax = [&]() {
      for (;;) {
        int64_t start = next.fetch_add(chunk);
        if (start >= n) break;
        int64_t end = std::min(start + chunk, n);
        for (int64_t i = start; i < end; ++i) {
          const float* f = feats + i * d;
          double dist = 0.0;
          for (int64_t t = 0; t < d; ++t) {
            double diff = (double)f[t] - c[t];
            dist += diff * diff;
          }
          float dd = (float)std::sqrt(std::max(0.0, dist));
          if (dd < anchor[i]) anchor[i] = dd;
        }
      }
    };
    threads.clear();
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(relax);
    for (auto& th : threads) th.join();
  }
}

}  // extern "C"
