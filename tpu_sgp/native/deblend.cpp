// Native multi-threshold deblending for one detection segment.
//
// The reference's live detection stack delegates to C libraries (photutils'
// compiled internals / sep / SExtractor); this translation unit provides the
// framework's own native hot loop: the per-segment exponential-level marker
// tree plus an exact priority-queue watershed flood. Bound via ctypes in
// tpu_sgp/catalog/native.py; semantics mirror the Python implementation in
// tpu_sgp/catalog/segmentation.py (_deblend_one).
//
// Entry point:
//   deblend_segment(values, inseg, h, w, npixels, nlevels, contrast, out)
//     -> number of children (0 => keep as a single source)
// `out` receives per-pixel child ids 1..k over the h*w cutout (0 outside).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Pix {
  double val;
  int64_t age;  // FIFO tie-break: equal-value plateaus (saturated cores)
                // flood in insertion order, like skimage's watershed
  int32_t idx;
};
struct PixLess {
  bool operator()(const Pix& a, const Pix& b) const {
    if (a.val != b.val) return a.val < b.val;
    return a.age > b.age;  // older entries pop first among equals
  }
};

// 8-connected component labeling of mask>level via iterative DFS.
int label_components(const double* vals, const uint8_t* inseg, int h, int w,
                     double level, std::vector<int32_t>& lab,
                     std::vector<int32_t>& stack) {
  std::fill(lab.begin(), lab.end(), 0);
  int n = 0;
  const int64_t size = (int64_t)h * w;
  for (int64_t s = 0; s < size; ++s) {
    if (!inseg[s] || vals[s] <= level || lab[s]) continue;
    ++n;
    stack.clear();
    stack.push_back((int32_t)s);
    lab[s] = n;
    while (!stack.empty()) {
      int32_t p = stack.back();
      stack.pop_back();
      int y = p / w, x = p % w;
      for (int dy = -1; dy <= 1; ++dy) {
        for (int dx = -1; dx <= 1; ++dx) {
          if (!dy && !dx) continue;
          int ny = y + dy, nx = x + dx;
          if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
          int32_t q = ny * w + nx;
          if (inseg[q] && vals[q] > level && !lab[q]) {
            lab[q] = n;
            stack.push_back(q);
          }
        }
      }
    }
  }
  return n;
}

}  // namespace

extern "C" {

// Cap (or restore) this thread's OpenMP team size. Callers running these
// kernels from a host-side thread pool divide the physical cores between
// pool workers; without the cap each worker spawns a full-size team and
// the host oversubscribes ~cores^2 runnable threads. Returns the previous
// max team size (so callers can restore it); no-op returning 0 when the
// library was built without OpenMP. Per-thread in libgomp: must be called
// ON the worker thread it should affect.
int32_t tpusgp_set_omp_threads(int32_t n) {
#ifdef _OPENMP
  const int32_t prev = omp_get_max_threads();
  if (n > 0) omp_set_num_threads(n);
  return prev;
#else
  (void)n;
  return 0;
#endif
}

int32_t deblend_segment(const double* vals, const uint8_t* inseg, int32_t h,
                        int32_t w, int32_t npixels, int32_t nlevels,
                        double contrast, int32_t* out) {
  const int64_t size = (int64_t)h * w;
  double lo = 1e300, hi = -1e300, total = 0.0;
  for (int64_t i = 0; i < size; ++i) {
    if (!inseg[i]) continue;
    lo = std::min(lo, vals[i]);
    hi = std::max(hi, vals[i]);
    total += vals[i];
  }
  if (!(hi > lo)) return 0;

  // photutils 'exponential' sub-thresholds: nlevels geometric steps
  // strictly between the segment min and max (linear when min <= 0) —
  // matches segmentation.py:_deblend_levels
  std::vector<double> levels(nlevels);
  for (int k = 0; k < nlevels; ++k) {
    if (lo <= 0.0)
      levels[k] = lo + (hi - lo) * (double)(k + 1) / (nlevels + 1);
    else
      levels[k] = lo * std::pow(hi / lo, (double)(k + 1) / (nlevels + 1));
  }

  std::vector<int32_t> lab(size), stack;

  // 1. the segment "tree": every level (ascending) whose above-level
  //    components include >= 2 passing BOTH npixels and contrast; each
  //    such level's kept-component labeling is snapshotted.
  std::vector<std::vector<int32_t>> tree;
  for (int k = 0; k < nlevels; ++k) {
    int n = label_components(vals, inseg, h, w, levels[k], lab, stack);
    if (n < 2) continue;
    std::vector<int64_t> csize(n + 1, 0);
    std::vector<double> cflux(n + 1, 0.0);
    for (int64_t i = 0; i < size; ++i) {
      int c = lab[i];
      if (!c) continue;
      ++csize[c];
      cflux[c] += vals[i];
    }
    std::vector<uint8_t> keep(n + 1, 0);
    int nkeep = 0;
    for (int c = 1; c <= n; ++c) {
      if (csize[c] >= npixels && cflux[c] / total >= contrast) {
        keep[c] = 1;
        ++nkeep;
      }
    }
    if (nkeep < 2) continue;
    std::vector<int32_t> snap(size, 0);
    for (int64_t i = 0; i < size; ++i)
      if (lab[i] && keep[lab[i]]) snap[i] = lab[i];
    tree.push_back(std::move(snap));
  }
  if (tree.empty()) return 0;

  // 2. combine top-down: higher-level splits refine the lower-level
  //    components they intersect; lower-only components join as markers.
  std::vector<int32_t> segm = std::move(tree.back());
  int32_t segm_max = 0;
  for (int64_t i = 0; i < size; ++i) segm_max = std::max(segm_max, segm[i]);
  for (int j = (int)tree.size() - 2; j >= 0; --j) {
    const std::vector<int32_t>& lower = tree[j];
    int32_t lmax = 0;
    for (int64_t i = 0; i < size; ++i) lmax = std::max(lmax, lower[i]);
    std::vector<uint8_t> intersected(lmax + 1, 0), present(lmax + 1, 0);
    for (int64_t i = 0; i < size; ++i) {
      if (lower[i]) {
        present[lower[i]] = 1;
        if (segm[i]) intersected[lower[i]] = 1;
      }
    }
    int nlow = 0, ninter = 0;
    for (int c = 1; c <= lmax; ++c) {
      nlow += present[c];
      ninter += intersected[c];
    }
    if (nlow <= ninter) continue;  // lower level adds no new peaks
    for (int64_t i = 0; i < size; ++i)
      if (!segm[i] && lower[i] && !intersected[lower[i]])
        segm[i] = lower[i] + segm_max;
    segm_max += lmax;
  }

  // renumber to 1..k
  std::vector<int32_t> remap(segm_max + 1, 0);
  int32_t next_id = 1;
  for (int64_t i = 0; i < size; ++i)
    if (segm[i] && !remap[segm[i]]) remap[segm[i]] = next_id++;
  if (next_id <= 2) return 0;
  std::vector<int32_t> markers(size, 0);
  for (int64_t i = 0; i < size; ++i)
    if (segm[i]) markers[i] = remap[segm[i]];

  // exact watershed: flood unassigned pixels in descending value order,
  // seeding from markers (priority queue on pixel value)
  std::memcpy(out, markers.data(), size * sizeof(int32_t));
  std::priority_queue<Pix, std::vector<Pix>, PixLess> pq;
  int64_t age = 0;
  for (int64_t i = 0; i < size; ++i)
    if (out[i] > 0) pq.push({vals[i], age++, (int32_t)i});
  while (!pq.empty()) {
    Pix p = pq.top();
    pq.pop();
    int y = p.idx / w, x = p.idx % w;
    int32_t labp = out[p.idx];
    for (int dy = -1; dy <= 1; ++dy) {
      for (int dx = -1; dx <= 1; ++dx) {
        if (!dy && !dx) continue;
        int ny = y + dy, nx = x + dx;
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        int32_t q = ny * w + nx;
        if (inseg[q] && !out[q]) {
          out[q] = labp;
          pq.push({vals[q], age++, q});
        }
      }
    }
  }
  for (int64_t i = 0; i < size; ++i)
    if (inseg[i] && !out[i]) out[i] = 1;
  return next_id - 1;
}

// Whole-frame deblend: every segment of `seg` (labels 1..nseg) in ONE call.
// The per-segment Python/ctypes dispatch overhead (~0.1 ms x thousands of
// segments) dominated megapixel frames; here the segment loop, the bounding
// boxes, and the cutout gathers all run natively. `out` (h*w int32,
// caller-zeroed) receives the deblended segmentation with children
// renumbered sequentially in parent-label order — the exact numbering of
// catalog/segmentation.py:deblend_sources. Returns the output label count.
//
// Segments are independent, so the per-segment phase runs under OpenMP
// (when compiled with -fopenmp; OMP_NUM_THREADS controls the pool). Child
// ids are written RELATIVE (1..k) in that phase and shifted by a
// sequential prefix sum of child counts afterwards, which reproduces the
// serial parent-label-order numbering exactly for any thread count.
int32_t deblend_all(const double* data, const int32_t* seg, int32_t H,
                    int32_t W, int32_t nseg, int32_t npixels, int32_t nlevels,
                    double contrast, int32_t* out) {
  const int64_t total = (int64_t)H * W;
  // bounding boxes in one pass (x0, x1, y0, y1 inclusive)
  std::vector<int32_t> bx0(nseg + 1, W), bx1(nseg + 1, -1);
  std::vector<int32_t> by0(nseg + 1, H), by1(nseg + 1, -1);
  for (int64_t i = 0; i < total; ++i) {
    int32_t s = seg[i];
    if (s <= 0 || s > nseg) continue;
    int32_t y = (int32_t)(i / W), x = (int32_t)(i % W);
    bx0[s] = std::min(bx0[s], x);
    bx1[s] = std::max(bx1[s], x);
    by0[s] = std::min(by0[s], y);
    by1[s] = std::max(by1[s], y);
  }

  // phase 1: deblend every segment independently; relative child ids
  std::vector<int32_t> nchild(nseg + 1, 0);
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<double> vals;
    std::vector<uint8_t> inseg;
    std::vector<int32_t> sub;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int32_t s = 1; s <= nseg; ++s) {
      if (bx1[s] < bx0[s]) continue;  // label absent from the image
      const int32_t x0 = bx0[s], y0 = by0[s];
      const int32_t w = bx1[s] - x0 + 1, h = by1[s] - y0 + 1;
      const int64_t size = (int64_t)h * w;
      vals.assign(size, 0.0);
      inseg.assign(size, 0);
      sub.assign(size, 0);
      for (int32_t y = 0; y < h; ++y) {
        const int64_t grow = (int64_t)(y0 + y) * W + x0;
        const int64_t lrow = (int64_t)y * w;
        for (int32_t x = 0; x < w; ++x) {
          vals[lrow + x] = data[grow + x];
          inseg[lrow + x] = seg[grow + x] == s;
        }
      }
      const int32_t k = deblend_segment(vals.data(), inseg.data(), h, w,
                                        npixels, nlevels, contrast,
                                        sub.data());
      for (int32_t y = 0; y < h; ++y) {
        const int64_t grow = (int64_t)(y0 + y) * W + x0;
        const int64_t lrow = (int64_t)y * w;
        for (int32_t x = 0; x < w; ++x) {
          if (!inseg[lrow + x]) continue;
          out[grow + x] = k == 0 ? 1 : sub[lrow + x];
        }
      }
      nchild[s] = k == 0 ? 1 : k;
    }
  }

  // phase 2: label offsets in parent order (prefix sum), then shift
  std::vector<int32_t> start(nseg + 1, 0);
  int32_t next_label = 1;
  for (int32_t s = 1; s <= nseg; ++s) {
    start[s] = next_label;
    next_label += nchild[s];
  }
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int64_t i = 0; i < total; ++i) {
    const int32_t s = seg[i];
    if (s > 0 && s <= nseg && out[i]) out[i] += start[s] - 1;
  }
  return next_label - 1;
}

}  // extern "C"
