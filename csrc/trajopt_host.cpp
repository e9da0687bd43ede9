// Host-side native runtime for trajopt_tpu.
//
// TPU-native replacements for the reference's host-bound native components:
//   * uniform voxel-grid broad phase  (role of the vendored aabbcc AABB trees,
//     /root/reference/HighOrderCCD/BVH/) — built once per static point cloud,
//     queried with batches of fattened AABBs to produce fixed-K candidate
//     tables for the device solver;
//   * RRT-Connect initial-guess planner with greedy shortcutting (role of the
//     OMPL dependency, /root/reference/HighOrderCCD/OMPL/OMPL.cpp:170-256,
//     and simplify_path, Main/admmPathPlanning3D.cpp:154-194);
//   * vertices-only OBJ reader (role of Mesh::readOBJ, CCDUtils.h:317-391).
//
// Exposed as a C ABI consumed via ctypes (trajopt_tpu/runtime/native.py).
// Everything here is outside the jitted hot loop, exactly as in the
// reference's architecture: trees/planners on host, math on device.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelGrid {
  std::vector<double> pts;          // n x 3
  int64_t n = 0;
  double cell = 1.0;
  double lo[3] = {0, 0, 0};
  int64_t dims[3] = {0, 0, 0};
  std::vector<int64_t> cell_start;  // CSR over flattened cells
  std::vector<int64_t> cell_pts;

  int64_t cell_index(int64_t ix, int64_t iy, int64_t iz) const {
    return (ix * dims[1] + iy) * dims[2] + iz;
  }
  void coord(const double* p, int64_t* c) const {
    for (int k = 0; k < 3; ++k) {
      int64_t v = (int64_t)std::floor((p[k] - lo[k]) / cell);
      c[k] = std::min(std::max(v, (int64_t)0), dims[k] - 1);
    }
  }
};

std::unordered_map<int64_t, VoxelGrid*> g_grids;
int64_t g_next_handle = 1;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Voxel grid
// ---------------------------------------------------------------------------

int64_t tg_grid_build(const double* points, int64_t n, double cell) {
  auto* g = new VoxelGrid();
  g->pts.assign(points, points + 3 * n);
  g->n = n;
  g->cell = cell > 0 ? cell : 1.0;
  double hi[3];
  for (int k = 0; k < 3; ++k) {
    g->lo[k] = 1e300;
    hi[k] = -1e300;
  }
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      g->lo[k] = std::min(g->lo[k], points[3 * i + k]);
      hi[k] = std::max(hi[k], points[3 * i + k]);
    }
  for (int k = 0; k < 3; ++k) {
    if (n == 0) g->lo[k] = 0, hi[k] = 0;
    g->dims[k] =
        std::max<int64_t>(1, (int64_t)std::floor((hi[k] - g->lo[k]) / g->cell) + 1);
  }
  int64_t ncells = g->dims[0] * g->dims[1] * g->dims[2];
  std::vector<int64_t> count(ncells + 1, 0);
  std::vector<int64_t> ci(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    g->coord(&points[3 * i], c);
    ci[i] = g->cell_index(c[0], c[1], c[2]);
    count[ci[i] + 1]++;
  }
  for (int64_t i = 0; i < ncells; ++i) count[i + 1] += count[i];
  g->cell_start = count;
  g->cell_pts.resize(n);
  std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g->cell_pts[cursor[ci[i]]++] = i;

  int64_t h = g_next_handle++;
  g_grids[h] = g;
  return h;
}

void tg_grid_free(int64_t handle) {
  auto it = g_grids.find(handle);
  if (it != g_grids.end()) {
    delete it->second;
    g_grids.erase(it);
  }
}

// For each query AABB (fattened by `radius`), write up to max_k point indices
// whose positions lie within the fattened box, nearest-box-distance first;
// pad with -1.  Returns 0, or -1 on bad handle.
int32_t tg_grid_query_aabbs(int64_t handle, const double* lo, const double* hi,
                            int64_t m, double radius, int64_t max_k,
                            int64_t* out_idx, int64_t* out_count) {
  auto it = g_grids.find(handle);
  if (it == g_grids.end()) return -1;
  const VoxelGrid& g = *it->second;

  std::vector<std::pair<double, int64_t>> cand;
  for (int64_t q = 0; q < m; ++q) {
    cand.clear();
    double qlo[3], qhi[3];
    for (int k = 0; k < 3; ++k) {
      qlo[k] = lo[3 * q + k] - radius;
      qhi[k] = hi[3 * q + k] + radius;
    }
    int64_t c0[3], c1[3];
    g.coord(qlo, c0);
    g.coord(qhi, c1);
    for (int64_t ix = c0[0]; ix <= c1[0]; ++ix)
      for (int64_t iy = c0[1]; iy <= c1[1]; ++iy)
        for (int64_t iz = c0[2]; iz <= c1[2]; ++iz) {
          int64_t ci = g.cell_index(ix, iy, iz);
          for (int64_t s = g.cell_start[ci]; s < g.cell_start[ci + 1]; ++s) {
            int64_t pid = g.cell_pts[s];
            const double* p = &g.pts[3 * pid];
            double d2 = 0;
            bool inside = true;
            for (int k = 0; k < 3; ++k) {
              if (p[k] < qlo[k] || p[k] > qhi[k]) inside = false;
              double d = std::max({lo[3 * q + k] - p[k], p[k] - hi[3 * q + k], 0.0});
              d2 += d * d;
            }
            if (inside) cand.emplace_back(d2, pid);
          }
        }
    int64_t keep = std::min<int64_t>(cand.size(), max_k);
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    for (int64_t k = 0; k < max_k; ++k)
      out_idx[q * max_k + k] = k < keep ? cand[k].second : -1;
    out_count[q] = (int64_t)cand.size();
  }
  return 0;
}

// Min distance from each query point to the cloud (exact, grid-accelerated
// ring search).  Used for clearance validation of large scenes.
int32_t tg_grid_min_dist(int64_t handle, const double* query, int64_t m,
                         double* out_dist) {
  auto it = g_grids.find(handle);
  if (it == g_grids.end()) return -1;
  const VoxelGrid& g = *it->second;
  for (int64_t q = 0; q < m; ++q) {
    const double* p = &query[3 * q];
    double best = 1e300;
    int64_t c[3];
    g.coord(p, c);
    int64_t max_ring = std::max({g.dims[0], g.dims[1], g.dims[2]});
    for (int64_t ring = 0; ring < max_ring; ++ring) {
      if (best < 1e300 && (double)(ring - 1) * g.cell > std::sqrt(best)) break;
      int64_t x0 = std::max<int64_t>(0, c[0] - ring),
              x1 = std::min(g.dims[0] - 1, c[0] + ring);
      int64_t y0 = std::max<int64_t>(0, c[1] - ring),
              y1 = std::min(g.dims[1] - 1, c[1] + ring);
      int64_t z0 = std::max<int64_t>(0, c[2] - ring),
              z1 = std::min(g.dims[2] - 1, c[2] + ring);
      for (int64_t ix = x0; ix <= x1; ++ix)
        for (int64_t iy = y0; iy <= y1; ++iy)
          for (int64_t iz = z0; iz <= z1; ++iz) {
            // only the shell of this ring
            if (ring > 0 && ix != x0 && ix != x1 && iy != y0 && iy != y1 &&
                iz != z0 && iz != z1)
              continue;
            int64_t ci = g.cell_index(ix, iy, iz);
            for (int64_t s = g.cell_start[ci]; s < g.cell_start[ci + 1]; ++s) {
              const double* o = &g.pts[3 * g.cell_pts[s]];
              double d2 = 0;
              for (int k = 0; k < 3; ++k) d2 += (p[k] - o[k]) * (p[k] - o[k]);
              best = std::min(best, d2);
            }
          }
    }
    out_dist[q] = g.n ? std::sqrt(best) : 1e300;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// OBJ reader (vertices only)
// ---------------------------------------------------------------------------

// First call with out=nullptr to get the vertex count; second call fills out.
int64_t tg_read_obj(const char* path, double* out, int64_t capacity) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  char line[4096];
  int64_t n = 0;
  while (fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      double x, y, z;
      if (sscanf(line + 1, "%lf %lf %lf", &x, &y, &z) == 3) {
        if (out) {
          if (n >= capacity) break;
          out[3 * n] = x;
          out[3 * n + 1] = y;
          out[3 * n + 2] = z;
        }
        ++n;
      }
    }
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// RRT-Connect with shortcutting
// ---------------------------------------------------------------------------

namespace {

struct Edge {
  double a[3], b[3];
};

double seg_point_dist2(const double* a, const double* b, const double* p) {
  double ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
  double ap[3] = {p[0] - a[0], p[1] - a[1], p[2] - a[2]};
  double denom = ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2];
  double t = denom > 1e-12
                 ? std::clamp((ap[0] * ab[0] + ap[1] * ab[1] + ap[2] * ab[2]) / denom,
                              0.0, 1.0)
                 : 0.0;
  double d2 = 0;
  for (int k = 0; k < 3; ++k) {
    double d = a[k] + t * ab[k] - p[k];
    d2 += d * d;
  }
  return d2;
}

struct Checker {
  const VoxelGrid* grid;
  double clearance;
  const std::vector<Edge>* prev;

  bool point_free(const double* p) const {
    if (grid && grid->n) {
      double d;
      // inline single-point grid min-dist with early exit via candidates
      int64_t c[3];
      grid->coord(p, c);
      double best2 = 1e300;
      int64_t reach = (int64_t)std::ceil(clearance / grid->cell) + 1;
      int64_t x0 = std::max<int64_t>(0, c[0] - reach),
              x1 = std::min(grid->dims[0] - 1, c[0] + reach);
      int64_t y0 = std::max<int64_t>(0, c[1] - reach),
              y1 = std::min(grid->dims[1] - 1, c[1] + reach);
      int64_t z0 = std::max<int64_t>(0, c[2] - reach),
              z1 = std::min(grid->dims[2] - 1, c[2] + reach);
      for (int64_t ix = x0; ix <= x1; ++ix)
        for (int64_t iy = y0; iy <= y1; ++iy)
          for (int64_t iz = z0; iz <= z1; ++iz) {
            int64_t ci = grid->cell_index(ix, iy, iz);
            for (int64_t s = grid->cell_start[ci]; s < grid->cell_start[ci + 1];
                 ++s) {
              const double* o = &grid->pts[3 * grid->cell_pts[s]];
              double d2 = 0;
              for (int k = 0; k < 3; ++k) d2 += (p[k] - o[k]) * (p[k] - o[k]);
              best2 = std::min(best2, d2);
            }
          }
      d = std::sqrt(best2);
      if (d <= clearance) return false;
    }
    if (prev)
      for (const auto& e : *prev)
        if (seg_point_dist2(e.a, e.b, p) <= clearance * clearance) return false;
    return true;
  }

  bool edge_free(const double* a, const double* b) const {
    double len = 0;
    for (int k = 0; k < 3; ++k) len += (b[k] - a[k]) * (b[k] - a[k]);
    len = std::sqrt(len);
    int n = std::max(2, (int)std::ceil(len / (0.5 * clearance)) + 1);
    for (int i = 0; i <= n; ++i) {
      double t = (double)i / n;
      double p[3] = {a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]),
                     a[2] + t * (b[2] - a[2])};
      if (!point_free(p)) return false;
    }
    return true;
  }
};

struct Tree {
  std::vector<double> pts;  // flat xyz
  std::vector<int64_t> parent;
  int64_t size() const { return (int64_t)parent.size(); }
  const double* at(int64_t i) const { return &pts[3 * i]; }
  void add(const double* p, int64_t par) {
    pts.insert(pts.end(), p, p + 3);
    parent.push_back(par);
  }
  int64_t nearest(const double* p) const {
    int64_t best = 0;
    double bd = 1e300;
    for (int64_t i = 0; i < size(); ++i) {
      double d2 = 0;
      for (int k = 0; k < 3; ++k) d2 += (at(i)[k] - p[k]) * (at(i)[k] - p[k]);
      if (d2 < bd) bd = d2, best = i;
    }
    return best;
  }
};

// returns index of last added node, and whether target reached
std::pair<int64_t, bool> extend(Tree& t, const double* target,
                                const Checker& ck, double step) {
  int64_t i = t.nearest(target);
  double node[3];
  std::memcpy(node, t.at(i), sizeof node);
  int64_t parent = i;
  while (true) {
    double d[3] = {target[0] - node[0], target[1] - node[1], target[2] - node[2]};
    double dist = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    double nxt[3];
    if (dist <= step)
      std::memcpy(nxt, target, sizeof nxt);
    else
      for (int k = 0; k < 3; ++k) nxt[k] = node[k] + d[k] / dist * step;
    if (!ck.edge_free(node, nxt)) return {parent, false};
    t.add(nxt, parent);
    parent = t.size() - 1;
    std::memcpy(node, nxt, sizeof node);
    if (dist <= step) return {parent, true};
  }
}

}  // namespace

// Plan from start to goal.  prev_edges: e x 6 doubles (segments of earlier
// robots' paths).  Writes up to max_out waypoints into out (x,y,z rows);
// returns the number of waypoints, 0 if no path, -1 on bad handle.
int64_t tg_rrt_plan(int64_t grid_handle, const double* start, const double* goal,
                    double clearance, const double* lo_in, const double* hi_in,
                    const double* prev_edges, int64_t n_prev, double step,
                    int64_t max_samples, uint64_t seed, double* out,
                    int64_t max_out) {
  const VoxelGrid* grid = nullptr;
  if (grid_handle) {
    auto it = g_grids.find(grid_handle);
    if (it == g_grids.end()) return -1;
    grid = it->second;
  }
  std::vector<Edge> prev(n_prev);
  for (int64_t i = 0; i < n_prev; ++i) {
    std::memcpy(prev[i].a, &prev_edges[6 * i], 3 * sizeof(double));
    std::memcpy(prev[i].b, &prev_edges[6 * i + 3], 3 * sizeof(double));
  }
  Checker ck{grid, clearance, &prev};
  if (!ck.point_free(start) || !ck.point_free(goal)) return 0;

  Tree ta, tb;
  ta.add(start, -1);
  tb.add(goal, -1);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  std::vector<double> path;
  bool a_is_start = true;
  for (int64_t it = 0; it < max_samples; ++it) {
    double sample[3];
    for (int k = 0; k < 3; ++k)
      sample[k] = lo_in[k] + uni(rng) * (hi_in[k] - lo_in[k]);
    extend(ta, sample, ck, step);
    const double* target = ta.at(ta.size() - 1);
    auto [ib, joined] = extend(tb, target, ck, step);
    if (joined) {
      std::vector<const double*> pa, pb;
      for (int64_t i = ta.size() - 1; i >= 0; i = ta.parent[i]) pa.push_back(ta.at(i));
      for (int64_t i = ib; i >= 0; i = tb.parent[i]) pb.push_back(tb.at(i));
      std::reverse(pa.begin(), pa.end());
      if (!a_is_start) {
        std::swap(pa, pb);
        std::reverse(pa.begin(), pa.end());
        std::reverse(pb.begin(), pb.end());
      }
      for (auto* p : pa) path.insert(path.end(), p, p + 3);
      for (auto* p : pb) path.insert(path.end(), p, p + 3);
      break;
    }
    std::swap(ta, tb);
    a_is_start = !a_is_start;
  }
  if (path.empty()) return 0;

  // greedy shortcutting (simplify_path)
  int64_t n = (int64_t)path.size() / 3;
  std::vector<int64_t> keep;
  keep.push_back(0);
  int64_t i = 0;
  while (i < n - 1) {
    int64_t j = n - 1;
    while (j > i + 1 && !ck.edge_free(&path[3 * i], &path[3 * j])) --j;
    keep.push_back(j);
    i = j;
  }
  int64_t m = std::min<int64_t>((int64_t)keep.size(), max_out);
  for (int64_t k = 0; k < m; ++k)
    std::memcpy(&out[3 * k], &path[3 * keep[k]], 3 * sizeof(double));
  return m;
}

}  // extern "C"
