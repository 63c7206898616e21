// Single-core native denominator for the membrane workload.
//
// A faithful single-threaded reimplementation of the per-frame membrane
// pipeline the reference runs (molar_membrane/src/lib.rs:661-760: patches,
// normal seeding, local-frame quadric fits, curvature, Voronoi cells,
// marker smoothing, tail order parameters) over the exact same frames the
// Python/device workload analyzes — the reference's own code is Rust and
// its toolchain is unavailable in this image, so this is the measured
// stand-in, like benchmarks/native_baseline.cpp for the headline.
//
// Input: a binary sidecar written by workloads.py (_write_membrane_native),
// carrying the static structure (atom->lipid map, masses, marker index
// sets, tail indices/bond orders, options) and the f32 frames.
//
// Build:  g++ -O3 -std=c++17 native_membrane.cpp -o native_membrane
// Run:    native_membrane memb.bin
// Prints: {"workload":"membrane","frames":N,"elapsed_s":T,"fps":F,
//          "check_area":A,"check_mean":M,"check_order":O}

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

namespace {

using clk = std::chrono::steady_clock;

struct V3 {
  double x = 0, y = 0, z = 0;
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  V3 cross(const V3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  V3 unit() const {
    double n = norm();
    return n == 0 ? *this : *this * (1.0 / n);
  }
};

struct Meta {
  int32_t n_atoms = 0, n_lipids = 0, n_frames = 0;
  std::vector<int32_t> first;        // per-lipid first atom index
  std::vector<int32_t> atom_first;   // per-atom: its lipid's first atom
  std::vector<float> mass;           // per atom
  std::vector<int32_t> head_i, head_s, mid_i, mid_s, tail_i, tail_s;
  int32_t tail_len = 0;
  std::vector<int32_t> tail_idx;  // (L, tail_len)
  std::vector<int32_t> bond_orders;
  double cutoff = 0, box[3] = {0, 0, 0};
  int32_t max_smooth_iter = 1, n_shells_smoothing = 0, order_code = 2;
  std::vector<float> frames;  // (F, N, 3)
};

bool read_meta(const char* path, Meta& m) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  auto ri = [&]() { int32_t v; f.read((char*)&v, 4); return v; };
  auto rvec_i = [&](std::vector<int32_t>& v) {
    int32_t n = ri();
    v.resize(n);
    f.read((char*)v.data(), 4l * n);
  };
  if (ri() != 0x4D454D42) return false;  // "MEMB"
  m.n_atoms = ri();
  m.n_lipids = ri();
  m.n_frames = ri();
  rvec_i(m.first);
  rvec_i(m.atom_first);
  m.mass.resize(m.n_atoms);
  f.read((char*)m.mass.data(), 4l * m.n_atoms);
  rvec_i(m.head_i); rvec_i(m.head_s);
  rvec_i(m.mid_i);  rvec_i(m.mid_s);
  rvec_i(m.tail_i); rvec_i(m.tail_s);
  m.tail_len = ri();
  rvec_i(m.tail_idx);
  rvec_i(m.bond_orders);
  float opts[7];
  f.read((char*)opts, 7 * 4);
  m.cutoff = opts[0];
  m.box[0] = opts[1]; m.box[1] = opts[2]; m.box[2] = opts[3];
  m.max_smooth_iter = (int)opts[4];
  m.n_shells_smoothing = (int)opts[5];
  m.order_code = (int)opts[6];
  m.frames.resize(3l * m.n_atoms * m.n_frames);
  f.read((char*)m.frames.data(), 4l * m.frames.size());
  return (bool)f;
}

inline V3 min_image(V3 d, const double box[3]) {
  d.x -= box[0] * std::nearbyint(d.x / box[0]);
  d.y -= box[1] * std::nearbyint(d.y / box[1]);
  d.z -= box[2] * std::nearbyint(d.z / box[2]);
  return d;
}

// Scalar Voronoi cell of the origin, clipped by bisector half-planes
// (molar/src/voronoi_cell.rs semantics; mirrors ops/voronoi.py VoronoiCell).
struct Cell {
  std::vector<double> vx, vy;
  std::vector<int> eid;
  Cell(double b) {
    vx = {-b, b, b, -b};
    vy = {-b, -b, b, b};
    eid = {-1, -2, -3, -4};
  }
  void add_point(double px, double py, int id) {
    double nx = 0.5 * px, ny = 0.5 * py;
    double c = nx * nx + ny * ny;
    const double TOL = 1e-10;
    if (c < TOL) return;
    size_t m = vx.size();
    std::vector<double> d(m);
    bool all_in = true, all_out = true;
    for (size_t i = 0; i < m; i++) {
      d[i] = nx * vx[i] + ny * vy[i] - c;
      if (d[i] < TOL) all_out = false; else all_in = false;
    }
    if (all_in || all_out) return;
    std::vector<double> ox, oy; std::vector<int> oid;
    for (size_t i = 0; i < m; i++) {
      size_t j = i + 1 < m ? i + 1 : 0;
      bool ia = d[i] < TOL, ib = d[j] < TOL;
      if (ia) {
        ox.push_back(vx[i]); oy.push_back(vy[i]); oid.push_back(eid[i]);
        if (!ib) {
          double t = d[i] / (d[i] - d[j]);
          ox.push_back(vx[i] + t * (vx[j] - vx[i]));
          oy.push_back(vy[i] + t * (vy[j] - vy[i]));
          oid.push_back(id);
        }
      } else if (ib) {
        double t = d[i] / (d[i] - d[j]);
        ox.push_back(vx[i] + t * (vx[j] - vx[i]));
        oy.push_back(vy[i] + t * (vy[j] - vy[i]));
        oid.push_back(eid[i]);
      }
    }
    vx = ox; vy = oy; eid = oid;
  }
};

bool chol6(const double A[6][6], const double b[6], double x[6]) {
  double L[6][6] = {};
  for (int i = 0; i < 6; i++)
    for (int j = 0; j <= i; j++) {
      double s = A[i][j];
      for (int k = 0; k < j; k++) s -= L[i][k] * L[j][k];
      if (i == j) {
        if (!(s > 0) || !std::isfinite(s)) return false;
        L[i][i] = std::sqrt(s);
      } else {
        L[i][j] = s / L[j][j];
      }
    }
  double y[6];
  for (int i = 0; i < 6; i++) {
    double s = b[i];
    for (int k = 0; k < i; k++) s -= L[i][k] * y[k];
    y[i] = s / L[i][i];
  }
  for (int i = 5; i >= 0; i--) {
    double s = y[i];
    for (int k = i + 1; k < 6; k++) s -= L[k][i] * x[k];
    x[i] = s / L[i][i];
  }
  return true;
}

double cosang(const V3& a, const V3& b) {
  double den = a.norm() * b.norm();
  if (den == 0) return 0;
  return std::clamp(a.dot(b) / den, -1.0, 1.0);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: native_membrane memb.bin\n"); return 2; }
  Meta m;
  if (!read_meta(argv[1], m)) { std::fprintf(stderr, "bad meta\n"); return 2; }
  const int L = m.n_lipids, N = m.n_atoms, TN = m.tail_len;

  double sum_area = 0, sum_mean = 0, sum_order = 0;
  long n_area = 0, n_order = 0;

  std::vector<V3> u(N), heads(L), tails(L), thv(L), normals(L), markers(L);
  std::vector<double> wh(L), wt(L);
  std::vector<std::vector<int>> patch(L);
  std::vector<char> valid(L);
  std::vector<double> meanc(L), gaussc(L), area(L);
  std::vector<std::vector<int>> neib(L);
  std::vector<V3> fitp;  // (L*L) fitted projections, indexed i*L+j

  auto t0 = clk::now();
  for (int fr = 0; fr < m.n_frames; fr++) {
    const float* C = &m.frames[3l * N * fr];
    // 1. unwrap to the lipid's first atom image
    for (int i = 0; i < N; i++) {
      int r = m.atom_first[i];
      V3 ref{C[3l * r], C[3l * r + 1], C[3l * r + 2]};
      V3 xi{C[3l * i], C[3l * i + 1], C[3l * i + 2]};
      u[i] = ref + min_image(xi - ref, m.box);
    }
    // 2. markers (mass-weighted segment means)
    auto seg_com = [&](const std::vector<int32_t>& idx,
                       const std::vector<int32_t>& seg, std::vector<V3>& out) {
      std::vector<double> w(L, 0.0);
      for (auto& o : out) o = V3{};
      for (size_t k = 0; k < idx.size(); k++) {
        double mm = m.mass[idx[k]];
        out[seg[k]] = out[seg[k]] + u[idx[k]] * mm;
        w[seg[k]] += mm;
      }
      for (int l = 0; l < L; l++) out[l] = out[l] * (1.0 / w[l]);
    };
    seg_com(m.head_i, m.head_s, heads);
    seg_com(m.tail_i, m.tail_s, tails);
    // 3. patches
    for (auto& p : patch) p.clear();
    double cut2 = m.cutoff * m.cutoff;
    for (int a = 0; a < L; a++)
      for (int b = a + 1; b < L; b++) {
        V3 d = min_image(heads[a] - heads[b], m.box);
        if (d.dot(d) <= cut2) { patch[a].push_back(b); patch[b].push_back(a); }
      }
    // 4. tail-head vectors, 2-pass normal seeding
    for (int l = 0; l < L; l++) { thv[l] = (heads[l] - tails[l]).unit(); normals[l] = thv[l]; }
    for (int pass = 0; pass < 2; pass++) {
      std::vector<V3> nv(L);
      for (int l = 0; l < L; l++) {
        V3 acc = normals[l];
        for (int j : patch[l])
          if (normals[l].dot(normals[j]) >= 0) acc = acc + normals[j];
        nv[l] = acc.unit();
      }
      normals = nv;
    }
    for (int l = 0; l < L; l++) { valid[l] = 1; markers[l] = heads[l]; }
    fitp.assign((size_t)L * L, V3{});

    // 5. smoothing passes
    for (int it = 0; it < std::max(m.max_smooth_iter, 1); it++) {
      std::vector<V3> saved = markers;
      std::vector<V3> new_normals = normals;
      for (int l = 0; l < L; l++) neib[l].clear();
      std::vector<char> owner_ok(L, 0);
      for (int l = 0; l < L; l++) {
        if (!valid[l]) continue;
        if (patch[l].empty()) { valid[l] = 0; continue; }
        V3 n = normals[l];
        V3 c0 = n.cross(V3{1, 0, 0});
        V3 c1 = n.cross(c0);
        // to_lab columns: c0, c1, -n
        double T[3][3] = {{c0.x, c1.x, -n.x}, {c0.y, c1.y, -n.y}, {c0.z, c1.z, -n.z}};
        double det = T[0][0] * (T[1][1] * T[2][2] - T[1][2] * T[2][1]) -
                     T[0][1] * (T[1][0] * T[2][2] - T[1][2] * T[2][0]) +
                     T[0][2] * (T[1][0] * T[2][1] - T[1][1] * T[2][0]);
        if (!std::isfinite(det) || std::fabs(det) < 1e-12) { valid[l] = 0; continue; }
        double I[3][3] = {
            {(T[1][1] * T[2][2] - T[1][2] * T[2][1]) / det,
             (T[0][2] * T[2][1] - T[0][1] * T[2][2]) / det,
             (T[0][1] * T[1][2] - T[0][2] * T[1][1]) / det},
            {(T[1][2] * T[2][0] - T[1][0] * T[2][2]) / det,
             (T[0][0] * T[2][2] - T[0][2] * T[2][0]) / det,
             (T[0][2] * T[1][0] - T[0][0] * T[1][2]) / det},
            {(T[1][0] * T[2][1] - T[1][1] * T[2][0]) / det,
             (T[0][1] * T[2][0] - T[0][0] * T[2][1]) / det,
             (T[0][0] * T[1][1] - T[0][1] * T[1][0]) / det}};
        int P = (int)patch[l].size();
        std::vector<double> lx(P), ly(P), lz(P);
        for (int k = 0; k < P; k++) {
          V3 rel = min_image(saved[patch[l][k]] - saved[l], m.box);
          // f32 cast parity with the host path's Float intermediate
          rel = {(float)rel.x, (float)rel.y, (float)rel.z};
          lx[k] = I[0][0] * rel.x + I[0][1] * rel.y + I[0][2] * rel.z;
          ly[k] = I[1][0] * rel.x + I[1][1] * rel.y + I[1][2] * rel.z;
          lz[k] = I[2][0] * rel.x + I[2][1] * rel.y + I[2][2] * rel.z;
        }
        double A[6][6] = {}, rhs[6] = {}, cf[6];
        for (int k = 0; k < P; k++) {
          double ph[6] = {lx[k] * lx[k], ly[k] * ly[k], lx[k] * ly[k],
                          lx[k], ly[k], 1.0};
          for (int a2 = 0; a2 < 6; a2++) {
            rhs[a2] += ph[a2] * lz[k];
            for (int b2 = 0; b2 < 6; b2++) A[a2][b2] += ph[a2] * ph[b2];
          }
        }
        if (!chol6(A, rhs, cf)) { valid[l] = 0; continue; }
        double a = cf[0], b = cf[1], c = cf[2], d = cf[3], e = cf[4], f = cf[5];
        double E = 1 + d * d, F = d * e, G = 1 + e * e;
        double Lq = 2 * a, Mq = c, Nq = 2 * b;
        double Z = E * G - F * F;
        gaussc[l] = (Lq * Nq - Mq * Mq) / Z;
        meanc[l] = 0.5 * (E * Nq - 2 * F * Mq + G * Lq) / Z;
        V3 vn = V3{d, e, -1}.unit();
        new_normals[l] = {T[0][0] * vn.x + T[0][1] * vn.y + T[0][2] * vn.z,
                          T[1][0] * vn.x + T[1][1] * vn.y + T[1][2] * vn.z,
                          T[2][0] * vn.x + T[2][1] * vn.y + T[2][2] * vn.z};
        // Voronoi in the tangent plane
        Cell cell(10.0);
        for (int k = 0; k < P; k++) cell.add_point(lx[k], ly[k], patch[l][k]);
        bool wall = false;
        for (int id : cell.eid) wall |= (id < 0);
        if (wall) { valid[l] = 0; continue; }
        for (int id : cell.eid) neib[l].push_back(id);
        // lifted polygon area
        size_t mv = cell.vx.size();
        double ar = 0;
        std::vector<V3> poly(mv);
        for (size_t k = 0; k < mv; k++) {
          double zx = a * cell.vx[k] * cell.vx[k] + b * cell.vy[k] * cell.vy[k] +
                      c * cell.vx[k] * cell.vy[k] + d * cell.vx[k] +
                      e * cell.vy[k] + f;
          poly[k] = {T[0][0] * cell.vx[k] + T[0][1] * cell.vy[k] + T[0][2] * zx,
                     T[1][0] * cell.vx[k] + T[1][1] * cell.vy[k] + T[1][2] * zx,
                     T[2][0] * cell.vx[k] + T[2][1] * cell.vy[k] + T[2][2] * zx};
        }
        for (size_t k = 0; k < mv; k++)
          ar += 0.5 * poly[k].cross(poly[(k + 1) % mv]).norm();
        area[l] = ar;
        if (std::fabs(f) > 0.5) { valid[l] = 0; continue; }
        // fitted projections of patch members (for marker smoothing)
        for (int k = 0; k < P; k++) {
          double zsk = a * lx[k] * lx[k] + b * ly[k] * ly[k] + c * lx[k] * ly[k] +
                       d * lx[k] + e * ly[k] + f;
          double dz = zsk - lz[k];
          V3 lab{T[0][2] * dz, T[1][2] * dz, T[2][2] * dz};
          fitp[(size_t)l * L + patch[l][k]] = saved[patch[l][k]] + lab;
        }
        markers[l] = saved[l] + V3{T[0][2] * f, T[1][2] * f, T[2][2] * f};
        owner_ok[l] = 1;
      }
      normals = new_normals;
      // marker smoothing: valid owners scatter fitted member projections
      std::vector<V3> sp = markers;
      std::vector<double> sn(L, 1.0);
      for (int i = 0; i < L; i++) {
        if (!owner_ok[i] || !valid[i]) continue;
        for (int j : patch[i]) {
          sp[j] = sp[j] + fitp[(size_t)i * L + j];
          sn[j] += 1.0;
        }
      }
      for (int l = 0; l < L; l++)
        if (valid[l]) markers[l] = sp[l] * (1.0 / sn[l]);
    }

    // 6. order parameters (scdcorr / scd / sz) per lipid
    if (TN >= 3) {
      for (int l = 0; l < L; l++) {
        if (!valid[l]) continue;
        const int32_t* ti = &m.tail_idx[(size_t)l * TN];
        V3 nv = normals[l];
        for (int i = 0; i < TN - 2; i++) {
          double val = 0;
          if (m.order_code == 0) {  // sz
            V3 v = u[ti[i + 2]] - u[ti[i]];
            double cth = cosang(v, nv);
            val = 1.5 * cth * cth - 0.5;
          } else if (m.bond_orders[i] == 1 && m.bond_orders[i + 1] == 1) {
            V3 p1 = u[ti[i]], p2 = u[ti[i + 1]], p3 = u[ti[i + 2]];
            V3 local_z = (p3 - p1).unit();
            V3 local_x = (p1 - p2).cross(p3 - p2).unit();
            V3 local_y = local_x.cross(local_z);
            double sxx = 0.5 * (3 * cosang(local_x, nv) * cosang(local_x, nv) - 1);
            double syy = 0.5 * (3 * cosang(local_y, nv) * cosang(local_y, nv) - 1);
            val = -(2 * sxx + syy) / 3.0;
          } else {
            continue;  // double bonds handled by the dedicated branch in the
                       // Python paths; the workload's tails are all single
          }
          sum_order += val;
          n_order++;
        }
      }
    }

    // 7. curvature smoothing over n shells of the Voronoi graph
    if (m.n_shells_smoothing >= 1) {
      std::vector<double> sm = meanc, sg = gaussc;
      for (int l = 0; l < L; l++) {
        if (!valid[l]) continue;
        std::vector<char> reach(L, 0);
        for (int j : neib[l]) reach[j] = 1;
        for (int s = 1; s < m.n_shells_smoothing; s++) {
          std::vector<char> nr = reach;
          for (int j = 0; j < L; j++)
            if (reach[j])
              for (int k : neib[j]) nr[k] = 1;
          reach = nr;
        }
        double msum = 0, gsum = 0; int cnt = 0;
        for (int j = 0; j < L; j++)
          if (reach[j] && valid[j]) { msum += meanc[j]; gsum += gaussc[j]; cnt++; }
        if (cnt) {
          sm[l] = (meanc[l] + msum) / (cnt + 1);
          sg[l] = (gaussc[l] + gsum) / (cnt + 1);
        }
      }
      meanc = sm; gaussc = sg;
    }

    for (int l = 0; l < L; l++)
      if (valid[l]) { sum_area += area[l]; sum_mean += meanc[l]; n_area++; }
  }
  double el = std::chrono::duration<double>(clk::now() - t0).count();
  std::printf(
      "{\"workload\":\"membrane\",\"frames\":%d,\"elapsed_s\":%.4f,"
      "\"fps\":%.2f,\"check_area\":%.6g,\"check_mean\":%.6g,"
      "\"check_order\":%.6g}\n",
      m.n_frames, el, m.n_frames / el,
      n_area ? sum_area / n_area : 0.0, n_area ? sum_mean / n_area : 0.0,
      n_order ? sum_order / n_order : 0.0);
  return 0;
}
