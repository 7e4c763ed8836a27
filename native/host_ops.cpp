// Native host-side ops for photogrammetry_tpu.
//
// The TPU owns every dense/batched computation (JAX/XLA/Pallas); these are
// the inherently *sequential* host algorithms where the reference relied on
// its compiled C# tier:
//   * exact agglomerative keypoint clustering (reference semantics of
//     python_src/photogrammetry/clustering/hierarchical.py:16-136 — stable
//     distance-then-insertion-order merge queue, weighted centroids,
//     city-block distance)
//   * greedy global mutual match assignment
//     (dotnet_src/ImageProcessing/KeypointMatching.cs:38-66)
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libphoto_host.so
// Python binding: ctypes (photogrammetry_tpu/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact hierarchical clustering.
//   coords:  n x 2 int32 (row, col)
//   out:     n x 2 double buffer; receives cluster centers
//   returns: number of clusters written
// ---------------------------------------------------------------------------
int pg_cluster_exact(const int32_t* coords, int n, double max_merge_dist,
                     double* out) {
  if (n <= 0) return 0;

  struct Pair {
    double dist;
    int64_t seq;
    int32_t c1, c2;
    bool operator>(const Pair& o) const {
      if (dist != o.dist) return dist > o.dist;
      return seq > o.seq;  // stable: earlier insertion pops first
    }
  };

  std::vector<double> cx(2 * n), cy;  // grows as clusters merge
  std::vector<double> centers_r, centers_c;
  std::vector<int64_t> counts;
  std::vector<uint8_t> alive;
  centers_r.reserve(2 * n);
  centers_c.reserve(2 * n);
  counts.reserve(2 * n);
  alive.reserve(2 * n);
  for (int i = 0; i < n; ++i) {
    centers_r.push_back(static_cast<double>(coords[2 * i]));
    centers_c.push_back(static_cast<double>(coords[2 * i + 1]));
    counts.push_back(1);
    alive.push_back(1);
  }

  std::priority_queue<Pair, std::vector<Pair>, std::greater<Pair>> heap;
  int64_t seq = 0;
  for (int j = 0; j < n; ++j) {
    for (int i = 0; i < j; ++i) {
      double d = std::abs(centers_r[i] - centers_r[j]) +
                 std::abs(centers_c[i] - centers_c[j]);
      if (d <= max_merge_dist) heap.push({d, seq++, i, j});
    }
  }

  int num_alive = n;
  while (!heap.empty()) {
    Pair p = heap.top();
    heap.pop();
    if (!alive[p.c1] || !alive[p.c2]) continue;  // lazy deletion
    alive[p.c1] = alive[p.c2] = 0;
    num_alive -= 2;
    int64_t cnt = counts[p.c1] + counts[p.c2];
    double r = (centers_r[p.c1] * counts[p.c1] +
                centers_r[p.c2] * counts[p.c2]) / cnt;
    double c = (centers_c[p.c1] * counts[p.c1] +
                centers_c[p.c2] * counts[p.c2]) / cnt;
    int cid = static_cast<int>(centers_r.size());
    // pair distances to all live clusters (insertion-ordered, matching the
    // reference's append-then-stable-sort, hierarchical.py:70-78)
    for (int other = 0; other < cid; ++other) {
      if (!alive[other]) continue;
      double d = std::abs(centers_r[other] - r) +
                 std::abs(centers_c[other] - c);
      if (d <= max_merge_dist) heap.push({d, seq++, other, cid});
    }
    centers_r.push_back(r);
    centers_c.push_back(c);
    counts.push_back(cnt);
    alive.push_back(1);
    num_alive += 1;
  }

  int m = 0;
  for (size_t i = 0; i < alive.size(); ++i) {
    if (!alive[i]) continue;
    out[2 * m] = centers_r[i];
    out[2 * m + 1] = centers_c[i];
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Greedy global mutual assignment (KeypointMatching.cs:38-66): repeatedly
// take the smallest remaining (i, j) distance, removing row i and column j.
//   dist:        n1 x n2 int32 matrix
//   num_matches: entries to emit (<= min(n1, n2))
//   out_i/out_j/out_d: num_matches int32
//   returns: matches written
// Ties break deterministically by (distance, i, j) ascending.
// ---------------------------------------------------------------------------
int pg_greedy_match(const int32_t* dist, int n1, int n2, int num_matches,
                    int32_t* out_i, int32_t* out_j, int32_t* out_d) {
  struct Edge {
    int32_t d;
    int32_t i, j;
  };
  std::vector<Edge> edges(static_cast<size_t>(n1) * n2);
  for (int i = 0; i < n1; ++i)
    for (int j = 0; j < n2; ++j)
      edges[static_cast<size_t>(i) * n2 + j] = {dist[i * n2 + j], i, j};
  std::sort(edges.begin(), edges.end(), [](const Edge& a, const Edge& b) {
    if (a.d != b.d) return a.d < b.d;
    if (a.i != b.i) return a.i < b.i;
    return a.j < b.j;
  });

  std::vector<uint8_t> used_i(n1, 0), used_j(n2, 0);
  int m = 0;
  for (const Edge& e : edges) {
    if (m >= num_matches) break;
    if (used_i[e.i] || used_j[e.j]) continue;
    used_i[e.i] = used_j[e.j] = 1;
    out_i[m] = e.i;
    out_j[m] = e.j;
    out_d[m] = e.d;
    ++m;
  }
  return m;
}

}  // extern "C"
