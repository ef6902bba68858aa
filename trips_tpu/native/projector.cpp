// Native fan-/parallel-beam projector matrix builder (CSR, line model).
//
// Replaces the host-side matrix generation that the reference obtains from
// the ASTRA C++ toolbox (trips/test_problems/Tomography.py:49-68,
// astra.projector.matrix extraction at trips/utilities/cil_io.py:270-294).
// Incremental Siddon traversal: O(nx + ny) per ray with a tiny constant.
//
// Geometry conventions match trips_tpu/problems/projector.py exactly:
//   image pixel size 1 centered at the origin, row 0 at the top;
//   source S = (so*sin t, -so*cos t); detector center (-od*sin t, od*cos t);
//   detector axis u = (cos t, sin t); sinogram rows angle-major.
//
// Build: make -C trips_tpu/native   (produces libprojector.so)

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <limits>

namespace {

struct Tri {
  int64_t *rowptr;
  int32_t *col;
  double *val;
  int64_t nnz;
  int64_t cap;
};

// Trace one ray S + t*D through the nx x ny unit grid centered at origin,
// appending (pixel, length) pairs for the current CSR row.
inline bool trace_ray(double sx, double sy, double dx, double dy, int nx,
                      int ny, Tri &out) {
  const double xmin = -0.5 * nx, ymin = -0.5 * ny;
  const double xmax = 0.5 * nx, ymax = 0.5 * ny;
  const double inf = std::numeric_limits<double>::infinity();

  double t0 = -inf, t1 = inf;
  // slab clip
  if (std::fabs(dx) > 1e-300) {
    double a = (xmin - sx) / dx, b = (xmax - sx) / dx;
    t0 = std::max(t0, std::min(a, b));
    t1 = std::min(t1, std::max(a, b));
  } else if (sx < xmin || sx > xmax) {
    return true;
  }
  if (std::fabs(dy) > 1e-300) {
    double a = (ymin - sy) / dy, b = (ymax - sy) / dy;
    t0 = std::max(t0, std::min(a, b));
    t1 = std::min(t1, std::max(a, b));
  } else if (sy < ymin || sy > ymax) {
    return true;
  }
  if (t1 <= t0) return true;

  const double norm = std::sqrt(dx * dx + dy * dy);

  // entry point, nudged inside
  double eps = 1e-12 * (t1 - t0);
  double t = t0;
  double px = sx + t * dx, py = sy + t * dy;
  int ix = (int)std::floor(px - xmin);
  int iy = (int)std::floor(py - ymin);
  ix = std::min(std::max(ix, 0), nx - 1);
  iy = std::min(std::max(iy, 0), ny - 1);

  const int step_x = dx > 0 ? 1 : -1;
  const int step_y = dy > 0 ? 1 : -1;
  // t at next x/y grid crossing
  double tx = (std::fabs(dx) > 1e-300)
                  ? ((xmin + (ix + (step_x > 0 ? 1 : 0))) - sx) / dx
                  : inf;
  double ty = (std::fabs(dy) > 1e-300)
                  ? ((ymin + (iy + (step_y > 0 ? 1 : 0))) - sy) / dy
                  : inf;
  const double dtx = (std::fabs(dx) > 1e-300) ? step_x / dx : inf;
  const double dty = (std::fabs(dy) > 1e-300) ? step_y / dy : inf;

  while (t < t1 - eps) {
    double tn = std::min(std::min(tx, ty), t1);
    double seg = (tn - t) * norm;
    if (seg > 1e-12) {
      if (out.nnz >= out.cap) return false;
      int row_img = ny - 1 - iy;
      out.col[out.nnz] = row_img * nx + ix;
      out.val[out.nnz] = seg;
      out.nnz++;
    }
    if (tx <= ty) {
      ix += step_x;
      tx += dtx;
    } else {
      iy += step_y;
      ty += dty;
    }
    t = tn;
    if (ix < 0 || ix >= nx || iy < 0 || iy >= ny) break;
  }
  return true;
}

}  // namespace

extern "C" {

// Returns total nnz, or -1 on capacity overflow.
int64_t fan_beam_csr(int nx, int ny, int n_angles, const double *angles,
                     int det_count, double det_width, double so, double od,
                     int64_t *rowptr, int32_t *col, double *val,
                     int64_t cap) {
  Tri out{rowptr, col, val, 0, cap};
  rowptr[0] = 0;
  int64_t row = 0;
  for (int a = 0; a < n_angles; ++a) {
    double th = angles[a];
    double sx = so * std::sin(th), sy = -so * std::cos(th);
    double cx = -od * std::sin(th), cy = od * std::cos(th);
    double ux = std::cos(th), uy = std::sin(th);
    for (int j = 0; j < det_count; ++j) {
      double off = (j - (det_count - 1) * 0.5) * det_width;
      double ex = cx + off * ux, ey = cy + off * uy;
      if (!trace_ray(sx, sy, ex - sx, ey - sy, nx, ny, out)) return -1;
      rowptr[++row] = out.nnz;
    }
  }
  return out.nnz;
}

int64_t parallel_beam_csr(int nx, int ny, int n_angles, const double *angles,
                          int det_count, double det_width, int64_t *rowptr,
                          int32_t *col, double *val, int64_t cap) {
  Tri out{rowptr, col, val, 0, cap};
  rowptr[0] = 0;
  int64_t row = 0;
  const double far = 2.0 * (nx + ny);
  for (int a = 0; a < n_angles; ++a) {
    double th = angles[a];
    double ux = std::cos(th), uy = std::sin(th);   // detector axis
    double dx = std::sin(th), dy = -std::cos(th);  // ray direction
    for (int j = 0; j < det_count; ++j) {
      double off = (j - (det_count - 1) * 0.5) * det_width;
      double sx = -far * dx + off * ux, sy = -far * dy + off * uy;
      if (!trace_ray(sx, sy, dx * 2 * far, dy * 2 * far, nx, ny, out))
        return -1;
      rowptr[++row] = out.nnz;
    }
  }
  return out.nnz;
}

}  // extern "C"
