// Exact Earth Mover's Distance (transportation problem) solver.
//
// Native replacement for the reference's POT `ot.emd` network simplex
// (reference utils.py:1074-1113 calls it on histogram masses + sqeuclidean
// costs).  Algorithm: successive shortest augmenting paths with node
// potentials (Dijkstra on the reduced costs).  In the uncapacitated bipartite
// transportation problem every augmentation exhausts a source or a sink, so
// at most n+m-1 augmentations run, each O(n*m + V log V).
//
// C ABI for ctypes:
//   int emd_solve(int n, int m, const double* mu,  // source masses [n]
//                 const double* nu,                // target masses [m]
//                 const double* cost,              // row-major [n*m]
//                 double* plan);                   // out, row-major [n*m]
// Returns 0 on success, nonzero on failure (mass mismatch).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libxsdba_emd.so emd.cpp

#include <cmath>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct HeapItem {
  double dist;
  int node;
  bool operator<(const HeapItem& o) const { return dist > o.dist; }
};

}  // namespace

extern "C" int emd_solve(int n, int m, const double* mu, const double* nu,
                         const double* cost, double* plan) {
  const int V = n + m;
  std::vector<double> supply(mu, mu + n);
  std::vector<double> demand(nu, nu + m);

  double total_s = 0, total_d = 0;
  for (int i = 0; i < n; ++i) total_s += supply[i];
  for (int j = 0; j < m; ++j) total_d += demand[j];
  if (std::fabs(total_s - total_d) > 1e-6 * std::max(total_s, total_d)) return 1;

  std::memset(plan, 0, sizeof(double) * static_cast<size_t>(n) * m);

  // Node potentials keep reduced costs nonnegative so Dijkstra stays valid.
  std::vector<double> pot(V, 0.0);
  std::vector<double> dist(V);
  std::vector<int> prev(V);  // predecessor node along the shortest path
  std::vector<char> active_src(n), active_dst(m);

  const double eps = 1e-15 * std::max(1.0, total_s);

  while (true) {
    int n_src = 0;
    for (int i = 0; i < n; ++i) active_src[i] = supply[i] > eps, n_src += active_src[i];
    int n_dst = 0;
    for (int j = 0; j < m; ++j) active_dst[j] = demand[j] > eps, n_dst += active_dst[j];
    if (n_src == 0 || n_dst == 0) break;

    // Multi-source Dijkstra from all active sources over the residual graph,
    // on reduced costs (c_ij - pot_i + pot_j for forward arcs; arcs carrying
    // flow have reduced cost exactly 0 by complementary slackness, so their
    // backward arcs cost 0 too).  All nodes are settled before potentials
    // are updated — early termination would leave tentative distances that
    // corrupt the reduced-cost invariant.
    std::fill(dist.begin(), dist.end(), kInf);
    std::fill(prev.begin(), prev.end(), -1);
    std::priority_queue<HeapItem> heap;
    for (int i = 0; i < n; ++i) {
      if (active_src[i]) {
        dist[i] = 0.0;
        heap.push({0.0, i});
      }
    }
    while (!heap.empty()) {
      HeapItem top = heap.top();
      heap.pop();
      int u = top.node;
      if (top.dist > dist[u] + 1e-18) continue;
      if (u < n) {
        // forward arcs u -> all sinks
        const double* crow = cost + static_cast<size_t>(u) * m;
        for (int j = 0; j < m; ++j) {
          double rc = crow[j] + pot[u] - pot[n + j];
          double nd = dist[u] + (rc > 0 ? rc : 0);
          if (nd + 1e-18 < dist[n + j]) {
            dist[n + j] = nd;
            prev[n + j] = u;
            heap.push({nd, n + j});
          }
        }
      } else {
        // backward arcs sink -> sources with positive flow (reduced cost 0)
        int j = u - n;
        for (int i = 0; i < n; ++i) {
          if (plan[static_cast<size_t>(i) * m + j] > eps) {
            double rc = -(cost[static_cast<size_t>(i) * m + j] + pot[i] - pot[n + j]);
            double nd = dist[u] + (rc > 0 ? rc : 0);
            if (nd + 1e-18 < dist[i]) {
              dist[i] = nd;
              prev[i] = u;
              heap.push({nd, i});
            }
          }
        }
      }
    }
    int reached_sink = -1;
    double best = kInf;
    for (int j = 0; j < m; ++j) {
      if (active_dst[j] && dist[n + j] < best) {
        best = dist[n + j];
        reached_sink = j;
      }
    }
    if (reached_sink < 0) return 2;  // disconnected (should not happen)

    // Update potentials (cap at the chosen sink's distance so unreachable /
    // farther nodes keep valid potentials).
    for (int v = 0; v < V; ++v) {
      pot[v] += std::min(dist[v], best);
    }

    // Trace the path back, find the bottleneck.
    int sink = n + reached_sink;
    double bottleneck = demand[reached_sink];
    for (int v = sink; prev[v] != -1; v = prev[v]) {
      int u = prev[v];
      if (u >= n) {  // backward arc v(source) <- u(sink): limited by flow
        bottleneck = std::min(bottleneck, plan[static_cast<size_t>(v) * m + (u - n)]);
      }
    }
    {
      // path root is a source
      int v = sink;
      while (prev[v] != -1) v = prev[v];
      bottleneck = std::min(bottleneck, supply[v]);
    }

    // Apply the augmentation.
    for (int v = sink; prev[v] != -1; v = prev[v]) {
      int u = prev[v];
      if (u < n) {  // forward arc u(source) -> v(sink)
        plan[static_cast<size_t>(u) * m + (v - n)] += bottleneck;
      } else {  // backward arc u(sink) -> v(source): reduce flow v->u
        plan[static_cast<size_t>(v) * m + (u - n)] -= bottleneck;
      }
    }
    {
      int v = sink;
      while (prev[v] != -1) v = prev[v];
      supply[v] -= bottleneck;
    }
    demand[reached_sink] -= bottleneck;
  }
  return 0;
}
