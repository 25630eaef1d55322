// Native BVH builder: the host-side runtime component of the TPU renderer.
//
// Mirrors the reference build algorithm (reference src/scene/bvh.cpp:51-129:
// spatial-midpoint split on the largest-extent centroid axis, leaf size
// capped) but emits a flattened pre-order layout with escape links for
// stackless device traversal, and runs iteratively with an explicit stack
// so multi-million-primitive scenes build fast without recursion limits.
//
// C ABI, consumed from Python via ctypes (ops/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct BuildTask {
  int64_t begin, end;   // range into the primitive order array
  int64_t parent_slot;  // node id whose escape to patch after subtree, or -1
};

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on error.
// Inputs: lo/hi [n,3] float64 primitive bounds.
// Outputs (caller-allocated, capacity 2n+2 nodes / n order entries):
//   bounds_lo/bounds_hi [cap,3] float32, is_leaf [cap] uint8,
//   prim_start/prim_count/escape [cap] int32, order [n] int64.
int64_t bvh_build(const double* lo, const double* hi, int64_t n,
                  int64_t max_leaf, float* bounds_lo, float* bounds_hi,
                  uint8_t* is_leaf, int32_t* prim_start, int32_t* prim_count,
                  int32_t* escape, int64_t* order) {
  if (n <= 0) return -1;
  std::vector<double> cx(n), cy(n), cz(n);
  for (int64_t i = 0; i < n; i++) {
    cx[i] = (lo[3 * i] + hi[3 * i]) * 0.5;
    cy[i] = (lo[3 * i + 1] + hi[3 * i + 1]) * 0.5;
    cz[i] = (lo[3 * i + 2] + hi[3 * i + 2]) * 0.5;
  }
  const double* cents[3] = {cx.data(), cy.data(), cz.data()};
  std::iota(order, order + n, 0);

  int64_t n_nodes = 0;
  // explicit DFS producing pre-order node ids; children pushed right-first
  std::vector<BuildTask> stack;
  stack.push_back({0, n, -1});
  std::vector<int64_t> open_subtrees;  // node ids awaiting escape patch

  // escape patching: when a subtree [id..] is fully emitted, escape[id] =
  // next node id.  We instead record, for every node, its subtree extent
  // by a second pass: store parent ranges.  Simpler: since layout is
  // pre-order, process tasks with an auxiliary marker entry.
  struct Frame { int64_t begin, end; int64_t node_id; int state; };
  std::vector<Frame> fs;
  fs.push_back({0, n, -1, 0});
  while (!fs.empty()) {
    Frame f = fs.back();
    fs.pop_back();
    if (f.state == 1) {  // post: patch escape
      escape[f.node_id] = (int32_t)n_nodes;
      continue;
    }
    int64_t id = n_nodes++;
    // node bounds
    double blo[3] = {1e300, 1e300, 1e300}, bhi[3] = {-1e300, -1e300, -1e300};
    for (int64_t k = f.begin; k < f.end; k++) {
      int64_t p = order[k];
      for (int a = 0; a < 3; a++) {
        blo[a] = std::min(blo[a], lo[3 * p + a]);
        bhi[a] = std::max(bhi[a], hi[3 * p + a]);
      }
    }
    for (int a = 0; a < 3; a++) {
      bounds_lo[3 * id + a] = (float)blo[a];
      bounds_hi[3 * id + a] = (float)bhi[a];
    }
    // escape patch marker runs after the whole subtree is emitted
    fs.push_back({0, 0, id, 1});

    int64_t count = f.end - f.begin;
    if (count <= max_leaf) {
      is_leaf[id] = 1;
      prim_start[id] = (int32_t)f.begin;
      prim_count[id] = (int32_t)count;
      continue;
    }
    is_leaf[id] = 0;
    prim_start[id] = 0;
    prim_count[id] = 0;
    // split axis: largest centroid extent
    double cmin[3] = {1e300, 1e300, 1e300}, cmax[3] = {-1e300, -1e300, -1e300};
    for (int64_t k = f.begin; k < f.end; k++) {
      int64_t p = order[k];
      double c[3] = {cx[p], cy[p], cz[p]};
      for (int a = 0; a < 3; a++) {
        cmin[a] = std::min(cmin[a], c[a]);
        cmax[a] = std::max(cmax[a], c[a]);
      }
    }
    int axis = 0;
    double best = -1;
    for (int a = 0; a < 3; a++) {
      if (cmax[a] - cmin[a] > best) { best = cmax[a] - cmin[a]; axis = a; }
    }
    double mid = (cmin[axis] + cmax[axis]) * 0.5;
    const double* c = cents[axis];
    int64_t* first = order + f.begin;
    int64_t* last = order + f.end;
    int64_t* split = std::partition(first, last,
                                    [&](int64_t p) { return c[p] < mid; });
    if (split == first || split == last) {
      // degenerate: median split (stable by centroid)
      int64_t half = count / 2;
      std::nth_element(first, first + half, last,
                       [&](int64_t a, int64_t b) { return c[a] < c[b]; });
      split = first + half;
    }
    int64_t m = split - order;
    // pre-order: left child next; push right AFTER left so left pops first
    fs.push_back({m, f.end, -1, 0});
    fs.push_back({f.begin, m, -1, 0});
  }
  return n_nodes;
}

}  // extern "C"
