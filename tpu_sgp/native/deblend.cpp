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

namespace {

struct Pix {
  double val;
  int32_t idx;
};
struct PixLess {
  bool operator()(const Pix& a, const Pix& b) const { return a.val < b.val; }
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

  // exponential sub-thresholds in (lo, hi), photutils-style spacing
  std::vector<double> levels(nlevels);
  for (int k = 0; k < nlevels; ++k) {
    double t = (std::pow(100.0, (double)(k + 1) / (nlevels + 1)) - 1.0) / 99.0;
    levels[k] = lo + (hi - lo) * t;
  }

  std::vector<int32_t> lab(size), stack;
  std::vector<int32_t> markers(size, 0);
  int32_t next_id = 1;

  // top-down marker tree (see segmentation.py for the rules)
  for (int k = nlevels - 1; k >= 0; --k) {
    int n = label_components(vals, inseg, h, w, levels[k], lab, stack);
    if (!n) continue;
    // per-component census
    std::vector<int32_t> first_mark(n + 1, 0);
    std::vector<uint8_t> multi(n + 1, 0);
    std::vector<int64_t> csize(n + 1, 0);
    std::vector<double> cflux(n + 1, 0.0);
    for (int64_t i = 0; i < size; ++i) {
      int c = lab[i];
      if (!c) continue;
      ++csize[c];
      cflux[c] += vals[i];
      int m = markers[i];
      if (m) {
        if (!first_mark[c])
          first_mark[c] = m;
        else if (first_mark[c] != m)
          multi[c] = 1;
      }
    }
    std::vector<int32_t> remap(n + 1, 0);
    for (int c = 1; c <= n; ++c) {
      if (multi[c]) continue;             // merge node: keep children apart
      if (first_mark[c]) {
        remap[c] = first_mark[c];         // grow the single marker
      } else if (csize[c] >= npixels && cflux[c] > contrast * total) {
        remap[c] = next_id++;             // new peak
      }
    }
    for (int64_t i = 0; i < size; ++i) {
      int c = lab[i];
      if (c && remap[c]) markers[i] = remap[c];
    }
  }
  if (next_id <= 2) return 0;

  // exact watershed: flood unassigned pixels in descending value order,
  // seeding from markers (priority queue on pixel value)
  std::memcpy(out, markers.data(), size * sizeof(int32_t));
  std::priority_queue<Pix, std::vector<Pix>, PixLess> pq;
  for (int64_t i = 0; i < size; ++i)
    if (out[i] > 0) pq.push({vals[i], (int32_t)i});
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
          pq.push({vals[q], q});
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

  std::vector<double> vals;
  std::vector<uint8_t> inseg;
  std::vector<int32_t> sub;
  int32_t next_label = 1;
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
                                      npixels, nlevels, contrast, sub.data());
    for (int32_t y = 0; y < h; ++y) {
      const int64_t grow = (int64_t)(y0 + y) * W + x0;
      const int64_t lrow = (int64_t)y * w;
      for (int32_t x = 0; x < w; ++x) {
        if (!inseg[lrow + x]) continue;
        out[grow + x] = k == 0 ? next_label : sub[lrow + x] + next_label - 1;
      }
    }
    next_label += k == 0 ? 1 : k;
  }
  return next_label - 1;
}

}  // extern "C"
