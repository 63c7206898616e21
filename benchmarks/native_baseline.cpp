// Single-core native baseline for the headline workload (BASELINE.md
// denominator). The published pymolar wheel is unreachable in this
// environment (no network) and there is no Rust toolchain, so this is a
// faithful single-threaded C++ reimplementation of the reference's own
// algorithms — the closest measurable stand-in for single-core MolAR:
//
//   per frame: XTC decode -> mass-weighted Kabsch fit + RMSD of the
//   selection (molar/src/measure.rs:507-643) -> PBC cell-grid `within`
//   search of all atoms vs the selection with the 14-offset half-stencil
//   plan run in both orientations and per-atom early break
//   (molar/src/distance_search.rs:39-60,217-330,560-598, serialized:
//   rayon par_iter -> plain loop).
//
// Workload matches molar/benches/comparison_small.rs:7-42 (align + within
// fused, as bench.py's device path runs them).
//
// Build (bench.py does this on demand):
//   g++ -O3 -std=c++17 native_baseline.cpp ../molar_tpu/native/xtc_codec.cpp \
//       -o native_baseline
// Run:
//   native_baseline traj.xtc <n_sel> <cutoff> [max_frames]
// Prints one JSON line: {"frames":N,"elapsed_s":T,"fps":F,"within0":C0,"rmsd0":R0}

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <vector>

extern "C" {
int xtc_parse_header(const uint8_t* buf, long buflen, int32_t* natoms,
                     int32_t* step, float* time, float* box9,
                     long* frame_bytes);
int xtc_decode_frame_buf(const uint8_t* buf, long buflen, float* coords,
                         float* box9, int32_t* step, float* time,
                         float* precision_out);
long xtc_index(const uint8_t* data, long len, long* offsets, int32_t* steps,
               float* times, long max_frames, int32_t* natoms_out);
}

namespace {

using clock_t_ = std::chrono::steady_clock;

struct V3 {
  float x, y, z;
};

// ---------------------------------------------------------------------------
// Kabsch fit via 3x3 SVD (Jacobi on the 4x4 quaternion form is equivalent;
// the reference uses nalgebra SVD — cost is negligible either way).

static void jacobi3(double a[3][3], double v[3][3], double w[3]) {
  // Cyclic Jacobi eigenvalue decomposition of a symmetric 3x3.
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; ++i) w[i] = a[i][i];
}

// R such that R * (p - com_p) best maps onto (q - com_q), mass-weighted
// (measure.rs:613-643: cov = sum m * p2 p1^T, SVD, det reflection fix).
static void kabsch(const V3* p, const V3* q, const float* m, int n,
                   double R[3][3]) {
  double mp[3] = {0, 0, 0}, mq[3] = {0, 0, 0}, M = 0;
  for (int i = 0; i < n; ++i) {
    M += m[i];
    mp[0] += m[i] * p[i].x;
    mp[1] += m[i] * p[i].y;
    mp[2] += m[i] * p[i].z;
    mq[0] += m[i] * q[i].x;
    mq[1] += m[i] * q[i].y;
    mq[2] += m[i] * q[i].z;
  }
  for (int d = 0; d < 3; ++d) {
    mp[d] /= M;
    mq[d] /= M;
  }
  double C[3][3] = {{0}};
  for (int i = 0; i < n; ++i) {
    double a[3] = {p[i].x - mp[0], p[i].y - mp[1], p[i].z - mp[2]};
    double b[3] = {q[i].x - mq[0], q[i].y - mq[1], q[i].z - mq[2]};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) C[r][c] += m[i] * b[r] * a[c];
  }
  // SVD via eigen of C^T C: C = U S V^T; V from eigenvectors of C^T C,
  // U = C V S^-1; reflection fix on the smallest singular vector.
  double CtC[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      CtC[r][c] = 0;
      for (int k = 0; k < 3; ++k) CtC[r][c] += C[k][r] * C[k][c];
    }
  double Vv[3][3], w[3], A[3][3];
  std::memcpy(A, CtC, sizeof(A));
  jacobi3(A, Vv, w);
  int ord[3] = {0, 1, 2};
  std::sort(ord, ord + 3, [&](int i, int j) { return w[i] > w[j]; });
  double V[3][3], U[3][3];
  for (int c = 0; c < 3; ++c)
    for (int r = 0; r < 3; ++r) V[r][c] = Vv[r][ord[c]];
  for (int c = 0; c < 3; ++c) {
    double s = std::sqrt(std::max(w[ord[c]], 1e-30));
    for (int r = 0; r < 3; ++r) {
      U[r][c] = 0;
      for (int k = 0; k < 3; ++k) U[r][c] += C[r][k] * V[k][c];
      U[r][c] /= s;
    }
  }
  // det(U V^T) reflection fix
  double det = 0;
  double UV[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      UV[r][c] = 0;
      for (int k = 0; k < 3; ++k) UV[r][c] += U[r][k] * V[c][k];
    }
  det = UV[0][0] * (UV[1][1] * UV[2][2] - UV[1][2] * UV[2][1]) -
        UV[0][1] * (UV[1][0] * UV[2][2] - UV[1][2] * UV[2][0]) +
        UV[0][2] * (UV[1][0] * UV[2][1] - UV[1][1] * UV[2][0]);
  double dsign = det < 0 ? -1.0 : 1.0;
  for (int r = 0; r < 3; ++r) U[r][2] *= dsign;
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      R[r][c] = 0;
      for (int k = 0; k < 3; ++k) R[r][c] += U[r][k] * V[c][k];
    }
}

static double fit_rmsd(const V3* sel, const V3* ref, const float* m, int n,
                       std::vector<V3>& scratch) {
  double R[3][3];
  kabsch(sel, ref, m, n, R);
  double mp[3] = {0, 0, 0}, mq[3] = {0, 0, 0}, M = 0;
  for (int i = 0; i < n; ++i) {
    M += m[i];
    mp[0] += m[i] * sel[i].x;
    mp[1] += m[i] * sel[i].y;
    mp[2] += m[i] * sel[i].z;
    mq[0] += m[i] * ref[i].x;
    mq[1] += m[i] * ref[i].y;
    mq[2] += m[i] * ref[i].z;
  }
  for (int d = 0; d < 3; ++d) {
    mp[d] /= M;
    mq[d] /= M;
  }
  // apply_transform (modify.rs:32-36) + rmsd_mw (measure.rs:538-557)
  double s2 = 0;
  for (int i = 0; i < n; ++i) {
    double a[3] = {sel[i].x - mp[0], sel[i].y - mp[1], sel[i].z - mp[2]};
    double f[3];
    for (int r = 0; r < 3; ++r)
      f[r] = R[r][0] * a[0] + R[r][1] * a[1] + R[r][2] * a[2] + mq[r];
    double dx = f[0] - ref[i].x, dy = f[1] - ref[i].y, dz = f[2] - ref[i].z;
    s2 += m[i] * (dx * dx + dy * dy + dz * dz);
    scratch[i] = {(float)f[0], (float)f[1], (float)f[2]};
  }
  return std::sqrt(s2 / M);
}

// ---------------------------------------------------------------------------
// Cell grid (distance_search.rs Grid + 14-offset half-stencil plan).

struct Grid {
  int dims[3];
  float lengths[3];
  std::vector<std::vector<std::pair<int, V3>>> cells;

  void init(const float box_diag[3], float cutoff) {
    for (int d = 0; d < 3; ++d) {
      dims[d] = std::max((int)std::floor(box_diag[d] / cutoff), 1);
      lengths[d] = box_diag[d];
    }
    cells.assign((size_t)dims[0] * dims[1] * dims[2], {});
  }
  void clear() {
    for (auto& c : cells) c.clear();
  }
  int loc(int x, int y, int z) const { return (x * dims[1] + y) * dims[2] + z; }
  // populate_pbc (distance_search.rs:144-210): wrap into box, store copies.
  void populate(const V3* pts, const int* ids, int n) {
    for (int i = 0; i < n; ++i) {
      V3 p = pts[ids ? ids[i] : i];
      float f[3] = {p.x, p.y, p.z};
      int c[3];
      for (int d = 0; d < 3; ++d) {
        float fr = f[d] / lengths[d];
        fr -= std::floor(fr);
        f[d] = fr * lengths[d];
        c[d] = std::min((int)(fr * dims[d]), dims[d] - 1);
      }
      cells[loc(c[0], c[1], c[2])].push_back(
          {ids ? ids[i] : i, {f[0], f[1], f[2]}});
    }
  }
};

static const int MASK[14][2][3] = {
    {{0, 0, 0}, {0, 0, 0}}, {{0, 0, 0}, {1, 0, 0}}, {{0, 0, 0}, {0, 1, 0}},
    {{0, 0, 0}, {0, 0, 1}}, {{0, 0, 0}, {1, 1, 0}}, {{0, 0, 0}, {1, 0, 1}},
    {{0, 0, 0}, {0, 1, 1}}, {{0, 0, 0}, {1, 1, 1}}, {{1, 0, 0}, {0, 1, 0}},
    {{1, 0, 0}, {0, 0, 1}}, {{0, 1, 0}, {0, 0, 1}}, {{1, 1, 0}, {0, 0, 1}},
    {{1, 0, 1}, {0, 1, 0}}, {{0, 1, 1}, {1, 0, 0}},
};

struct PlanPair {
  int c1, c2;
  uint8_t wrapped;  // bit d set = min-image dim d
};

// search_plan (distance_search.rs:217-269), full PBC.
static void build_plan(const Grid& g1, const Grid& g2,
                       std::vector<PlanPair>& plan) {
  plan.clear();
  for (int x = 0; x < g1.dims[0]; ++x)
    for (int y = 0; y < g1.dims[1]; ++y)
      for (int z = 0; z < g1.dims[2]; ++z)
        for (int m = 0; m < 14; ++m) {
          int c[2][3] = {{x + MASK[m][0][0], y + MASK[m][0][1], z + MASK[m][0][2]},
                         {x + MASK[m][1][0], y + MASK[m][1][1], z + MASK[m][1][2]}};
          uint8_t wrapped = 0;
          for (int i = 0; i < 2; ++i)
            for (int d = 0; d < 3; ++d)
              if (c[i][d] == g1.dims[d]) {
                c[i][d] = 0;
                wrapped |= 1 << d;
              }
          int i1 = g1.loc(c[0][0], c[0][1], c[0][2]);
          int i2 = g1.loc(c[1][0], c[1][1], c[1][2]);
          if ((!g1.cells[i1].empty() && !g2.cells[i2].empty()) ||
              (!g2.cells[i1].empty() && !g1.cells[i2].empty()))
            plan.push_back({i1, i2, wrapped});
        }
}

// search_cell_pair_within_pbc (distance_search.rs:295-322): mark grid1
// atoms of cell c1 with >= 1 grid2 partner in cell c2; early break.
static void search_pair(float cutoff2, const Grid& g1, const Grid& g2, int c1,
                        int c2, uint8_t wrapped, const float L[3],
                        std::vector<int>& found) {
  const auto& a = g1.cells[c1];
  const auto& b = g2.cells[c2];
  for (const auto& [i1, p1] : a) {
    for (const auto& [i2, p2] : b) {
      float dx = p2.x - p1.x, dy = p2.y - p1.y, dz = p2.z - p1.z;
      if (wrapped & 1) dx -= L[0] * std::round(dx / L[0]);
      if (wrapped & 2) dy -= L[1] * std::round(dy / L[1]);
      if (wrapped & 4) dz -= L[2] * std::round(dz / L[2]);
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 <= cutoff2) {
        found.push_back(i1);
        break;
      }
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s traj.xtc n_sel cutoff [max_frames]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  int n_sel = std::atoi(argv[2]);
  float cutoff = std::atof(argv[3]);
  long max_frames = argc > 4 ? std::atol(argv[4]) : (1L << 30);

  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 2;
  }
  long len = (long)f.tellg();
  std::vector<uint8_t> data(len);
  f.seekg(0);
  f.read((char*)data.data(), len);

  // Index frames (offsets) once; decode is timed per frame below, matching
  // the reference benches which stream decode inside the timed loop.
  std::vector<long> offsets(1 << 20);
  std::vector<int32_t> steps(1 << 20);
  std::vector<float> times(1 << 20);
  int32_t natoms = -1;
  long n_frames =
      xtc_index(data.data(), len, offsets.data(), steps.data(), times.data(),
                1 << 20, &natoms);
  if (n_frames <= 0 || natoms <= 0) {
    std::fprintf(stderr, "no frames\n");
    return 2;
  }
  n_frames = std::min(n_frames, max_frames);

  std::vector<V3> coords(natoms);
  std::vector<V3> ref(n_sel), scratch(n_sel);
  std::vector<float> masses(n_sel, 1.0f);
  std::vector<int> all_ids;  // grid populate uses implicit ids

  // Reference selection coords = frame 0 selection (as bench.py uses the
  // structure frame).
  {
    float b9[9];
    int32_t st;
    float tt, prec;
    if (xtc_decode_frame_buf(data.data() + offsets[0], len - offsets[0],
                             (float*)coords.data(), b9, &st, &tt,
                             &prec) != natoms) {
      std::fprintf(stderr, "decode failed\n");
      return 2;
    }
    std::copy(coords.begin(), coords.begin() + n_sel, ref.begin());
  }

  Grid g1, g2;
  std::vector<PlanPair> plan;
  std::vector<int> found;
  std::vector<uint8_t> seen(natoms);
  std::vector<int> sel_ids(n_sel);
  for (int i = 0; i < n_sel; ++i) sel_ids[i] = i;

  double rmsd0 = 0;
  long within0 = 0;
  auto t0 = clock_t_::now();
  for (long fr = 0; fr < n_frames; ++fr) {
    float b9[9];
    int32_t st;
    float tt, prec;
    xtc_decode_frame_buf(data.data() + offsets[fr], len - offsets[fr],
                         (float*)coords.data(), b9, &st, &tt, &prec);
    float L[3] = {b9[0], b9[4], b9[8]};  // ortho box diag

    double r = fit_rmsd(coords.data(), ref.data(), masses.data(), n_sel,
                        scratch);
    if (fr == 0) rmsd0 = r;

    g1.init(L, cutoff);
    g2.init(L, cutoff);
    g1.populate(coords.data(), nullptr, natoms);
    g2.populate(coords.data(), sel_ids.data(), n_sel);
    build_plan(g1, g2, plan);
    found.clear();
    float c2 = cutoff * cutoff;
    for (const auto& p : plan) {
      search_pair(c2, g1, g2, p.c1, p.c2, p.wrapped, L, found);
      // Self-pairs (the zero-offset mask entry) must be searched once:
      // scanning both orientations of c1==c2 doubles the densest block and
      // understates the baseline's fps.
      if (p.c1 != p.c2)
        search_pair(c2, g1, g2, p.c2, p.c1, p.wrapped, L, found);
    }
    // SVec::from_unsorted dedup analog.
    long uniq = 0;
    for (int id : found)
      if (!seen[id]) {
        seen[id] = 1;
        ++uniq;
      }
    for (int id : found) seen[id] = 0;
    if (fr == 0) within0 = uniq;
  }
  double elapsed =
      std::chrono::duration<double>(clock_t_::now() - t0).count();

  std::printf(
      "{\"frames\":%ld,\"elapsed_s\":%.3f,\"fps\":%.2f,\"within0\":%ld,"
      "\"rmsd0\":%.6f}\n",
      n_frames, elapsed, n_frames / elapsed, within0, rmsd0);
  return 0;
}
