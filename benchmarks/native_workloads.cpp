// Single-core native denominators for the BASELINE config workloads.
//
// native_baseline.cpp covers the headline fit+within; this sibling gives
// every other workload in benchmarks/workloads.py a measured single-core
// native number (the round-2 lesson: numpy is a meaningless denominator —
// single-core MolAR-class native code is ~1000x numpy on these loops).
// Algorithms are faithful single-threaded reimplementations of what the
// reference would run per frame:
//
//   ca_rmsd  — XTC decode -> gather CA -> mass-weighted Kabsch + RMSD
//              (molar/src/measure.rs:507-643)
//   com_gyr  — per-residue mass-weighted COM + radius of gyration
//              (molar/src/measure.rs: center_of_mass/gyration over splits)
//   contacts — protein-ligand contact pairs within a cutoff via a cell
//              grid over the ligand set (molar/src/distance_search.rs
//              double-set search, serialized)
//   sasa     — exact Lee-Richards per-atom SASA, same slab placement and
//              slice count as ops/sasa_lr.py (the reference uses the
//              PowerSasa power diagram, molar/src/sasa.rs:14-122; LR at
//              equal slice count is this build's documented stand-in)
//   trjconv  — XTC decode -> selection -> DCD frame write
//              (molar/benches/comparison_small.rs:44-57 workload #3)
//
// The structure metadata (selection indices, masses, radii, segments,
// reference CA coords) comes from a sidecar binary written by
// workloads.py (--native), so both sides measure the identical problem.
//
// Build:  g++ -O3 -std=c++17 native_workloads.cpp \
//             ../molar_tpu/native/xtc_codec.cpp -o native_workloads
// Run:    native_workloads <cmd|all> traj.xtc meta.bin [max_frames]
// Prints one JSON line per workload:
//   {"workload":"sasa","frames":N,"elapsed_s":T,"fps":F,"check":X}

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

extern "C" {
int xtc_parse_header(const uint8_t* buf, long buflen, int32_t* natoms,
                     int32_t* step, float* time, float* box9,
                     long* frame_bytes);
int xtc_decode_frame_buf(const uint8_t* buf, long buflen, float* coords,
                         float* box9, int32_t* step, float* time,
                         float* precision_out);
}

namespace {

using clk = std::chrono::steady_clock;

double secs(clk::time_point a, clk::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

// ---------------------------------------------------------------------------
// Sidecar metadata (written by workloads.py _write_native_meta)
// ---------------------------------------------------------------------------

struct Meta {
  int32_t n_atoms = 0;
  std::vector<int32_t> ca_idx;
  std::vector<float> ref_ca;  // 3 * n_ca, frame-0 structure coords
  std::vector<float> ca_mass;
  std::vector<int32_t> sel_idx;  // the "resname ALA" selection
  std::vector<int32_t> sel_seg;  // residue segment id per sel atom
  int32_t n_seg = 0;
  std::vector<float> sel_mass;
  std::vector<float> sel_radii;  // vdw + probe
  std::vector<int32_t> lig_idx;
  float box[3] = {0, 0, 0};
  float contacts_cutoff = 0.4f;
  int32_t n_slices = 32;
};

bool read_meta(const char* path, Meta& m) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  auto ri = [&f]() { int32_t v; f.read((char*)&v, 4); return v; };
  auto rvec_i = [&](std::vector<int32_t>& v, int n) {
    v.resize(n);
    f.read((char*)v.data(), 4l * n);
  };
  auto rvec_f = [&](std::vector<float>& v, int n) {
    v.resize(n);
    f.read((char*)v.data(), 4l * n);
  };
  if (ri() != 0x4D4F4C41) return false;  // "MOLA"
  m.n_atoms = ri();
  int n_ca = ri();
  rvec_i(m.ca_idx, n_ca);
  rvec_f(m.ref_ca, 3 * n_ca);
  rvec_f(m.ca_mass, n_ca);
  int n_sel = ri();
  rvec_i(m.sel_idx, n_sel);
  rvec_i(m.sel_seg, n_sel);
  m.n_seg = ri();
  rvec_f(m.sel_mass, n_sel);
  rvec_f(m.sel_radii, n_sel);
  int n_lig = ri();
  rvec_i(m.lig_idx, n_lig);
  f.read((char*)m.box, 12);
  f.read((char*)&m.contacts_cutoff, 4);
  m.n_slices = ri();
  return (bool)f;
}

// ---------------------------------------------------------------------------
// XTC frame iteration (mmap-free simple full read; decode per frame)
// ---------------------------------------------------------------------------

struct Traj {
  std::vector<uint8_t> data;
  std::vector<long> offsets;
  int32_t natoms = 0;

  bool load(const char* path, long max_frames) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    f.seekg(0, std::ios::end);
    long len = (long)f.tellg();
    f.seekg(0);
    data.resize(len);
    f.read((char*)data.data(), len);
    long off = 0;
    while (off < len && (max_frames <= 0 || (long)offsets.size() < max_frames)) {
      int32_t na, step;
      float time, box9[9];
      long fb;
      if (!xtc_parse_header(data.data() + off, len - off, &na, &step, &time,
                            box9, &fb))
        break;
      natoms = na;
      offsets.push_back(off);
      off += fb;
    }
    return !offsets.empty();
  }

  bool decode(int k, float* coords, float* box9) const {
    int32_t step;
    float time, prec;
    int n = xtc_decode_frame_buf(data.data() + offsets[k],
                                 (long)data.size() - offsets[k], coords, box9,
                                 &step, &time, &prec);
    return n == natoms;
  }
};

// ---------------------------------------------------------------------------
// 3x3 symmetric eigen (cyclic Jacobi) + Kabsch fit (as native_baseline.cpp)
// ---------------------------------------------------------------------------

void jacobi3(double a[3][3], double v[3][3], double w[3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(a[0][1]) + std::fabs(a[0][2]) + std::fabs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
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

// Mass-weighted Kabsch RMSD of (sel -> ref); both arrays n x 3.
double kabsch_rmsd(const float* sel, const float* ref, const float* mass,
                   int n) {
  double msum = 0, cs[3] = {0, 0, 0}, cr[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i) {
    double m = mass[i];
    msum += m;
    for (int d = 0; d < 3; ++d) {
      cs[d] += m * sel[3 * i + d];
      cr[d] += m * ref[3 * i + d];
    }
  }
  for (int d = 0; d < 3; ++d) {
    cs[d] /= msum;
    cr[d] /= msum;
  }
  double H[3][3] = {{0}};
  for (int i = 0; i < n; ++i) {
    double m = mass[i];
    double a[3], b[3];
    for (int d = 0; d < 3; ++d) {
      a[d] = sel[3 * i + d] - cs[d];
      b[d] = ref[3 * i + d] - cr[d];
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) H[r][c] += m * a[r] * b[c];
  }
  // SVD of H via eigen of H^T H; rotation R = V diag(sign) U^T applied in
  // the RMSD identity: msd = (Sa + Sb - 2*sum singular, det-corrected)/msum.
  double HtH[3][3] = {{0}};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k) HtH[r][c] += H[k][r] * H[k][c];
  double V[3][3], w[3];
  double A[3][3];
  std::memcpy(A, HtH, sizeof A);
  jacobi3(A, V, w);
  for (int i = 0; i < 3; ++i) w[i] = std::sqrt(std::max(0.0, w[i]));
  double detH = H[0][0] * (H[1][1] * H[2][2] - H[1][2] * H[2][1]) -
                H[0][1] * (H[1][0] * H[2][2] - H[1][2] * H[2][0]) +
                H[0][2] * (H[1][0] * H[2][1] - H[1][1] * H[2][0]);
  // smallest singular value gets the det sign
  int mi = 0;
  for (int i = 1; i < 3; ++i)
    if (w[i] < w[mi]) mi = i;
  double ssum = 0;
  for (int i = 0; i < 3; ++i) ssum += (i == mi && detH < 0) ? -w[i] : w[i];
  double Sa = 0, Sb = 0;
  for (int i = 0; i < n; ++i) {
    double m = mass[i];
    for (int d = 0; d < 3; ++d) {
      double a = sel[3 * i + d] - cs[d], b = ref[3 * i + d] - cr[d];
      Sa += m * a * a;
      Sb += m * b * b;
    }
  }
  double msd = std::max(0.0, (Sa + Sb - 2 * ssum) / msum);
  return std::sqrt(msd);
}

// ---------------------------------------------------------------------------
// Workloads
// ---------------------------------------------------------------------------

void emit(const char* wl, long frames, double el, double check) {
  printf(
      "{\"workload\":\"%s\",\"frames\":%ld,\"elapsed_s\":%.4f,"
      "\"fps\":%.2f,\"check\":%.6g}\n",
      wl, frames, el, frames / el, check);
  fflush(stdout);
}

// Per-frame bodies, shared verbatim between the single-workload rows and
// wl_fused (one decode, all three observables — the device side's
// one-window-program ethos applied to the denominator so the comparison
// stays like-for-like). Scratch buffers live in the *Acc structs so the
// timed loops stay allocation-free.

struct CaRmsdAcc {
  std::vector<float> sel;
  double check = 0;
  explicit CaRmsdAcc(const Meta& m) : sel(3 * m.ca_idx.size()) {}
  void frame(const float* coords, const Meta& m) {
    int n_ca = (int)m.ca_idx.size();
    for (int i = 0; i < n_ca; ++i)
      for (int d = 0; d < 3; ++d)
        sel[3 * i + d] = coords[3l * m.ca_idx[i] + d];
    check += kabsch_rmsd(sel.data(), m.ref_ca.data(), m.ca_mass.data(), n_ca);
  }
};

struct ComGyrAcc {
  std::vector<double> msum, com, g2;
  double check = 0;
  explicit ComGyrAcc(const Meta& m)
      : msum(m.n_seg, 0.0), com(3l * m.n_seg), g2(m.n_seg) {
    for (size_t i = 0; i < m.sel_idx.size(); ++i)
      msum[m.sel_seg[i]] += m.sel_mass[i];
  }
  void frame(const float* coords, const Meta& m) {
    int ns = (int)m.sel_idx.size();
    std::fill(com.begin(), com.end(), 0.0);
    std::fill(g2.begin(), g2.end(), 0.0);
    for (int i = 0; i < ns; ++i) {
      int s = m.sel_seg[i];
      double mm = m.sel_mass[i];
      const float* c = &coords[3l * m.sel_idx[i]];
      com[3 * s] += mm * c[0];
      com[3 * s + 1] += mm * c[1];
      com[3 * s + 2] += mm * c[2];
    }
    for (int s = 0; s < m.n_seg; ++s)
      for (int d = 0; d < 3; ++d) com[3 * s + d] /= msum[s];
    for (int i = 0; i < ns; ++i) {
      int s = m.sel_seg[i];
      const float* c = &coords[3l * m.sel_idx[i]];
      double dx = c[0] - com[3 * s], dy = c[1] - com[3 * s + 1],
             dz = c[2] - com[3 * s + 2];
      g2[s] += m.sel_mass[i] * (dx * dx + dy * dy + dz * dz);
    }
    double acc = 0;
    for (int s = 0; s < m.n_seg; ++s) acc += std::sqrt(g2[s] / msum[s]);
    check += acc / m.n_seg;
  }
};

struct ContactsAcc {
  float cut2;
  int dims[3];
  std::vector<std::vector<int>> cells;
  double check = 0;
  explicit ContactsAcc(const Meta& m) {
    float cut = m.contacts_cutoff;
    cut2 = cut * cut;
    for (int d = 0; d < 3; ++d)
      dims[d] = std::max(1, (int)std::floor(m.box[d] / cut));
    cells.resize(dims[0] * dims[1] * dims[2]);
  }
  void frame(const float* coords, const Meta& m) {
    int nl = (int)m.lig_idx.size(), np = (int)m.sel_idx.size();
    for (auto& c : cells) c.clear();
    auto cellof = [&](const float* p) {
      int ix[3];
      for (int d = 0; d < 3; ++d) {
        float f = p[d] / m.box[d];
        f -= std::floor(f);
        ix[d] = std::min(dims[d] - 1, (int)(f * dims[d]));
      }
      return (ix[0] * dims[1] + ix[1]) * dims[2] + ix[2];
    };
    for (int i = 0; i < nl; ++i)
      cells[cellof(&coords[3l * m.lig_idx[i]])].push_back(i);
    long cnt = 0;
    for (int i = 0; i < np; ++i) {
      const float* p = &coords[3l * m.sel_idx[i]];
      int ix[3];
      for (int d = 0; d < 3; ++d) {
        float f = p[d] / m.box[d];
        f -= std::floor(f);
        ix[d] = std::min(dims[d] - 1, (int)(f * dims[d]));
      }
      for (int ox = -1; ox <= 1; ++ox)
        for (int oy = -1; oy <= 1; ++oy)
          for (int oz = -1; oz <= 1; ++oz) {
            int cx = (ix[0] + ox + dims[0]) % dims[0];
            int cy = (ix[1] + oy + dims[1]) % dims[1];
            int cz = (ix[2] + oz + dims[2]) % dims[2];
            for (int j : cells[(cx * dims[1] + cy) * dims[2] + cz]) {
              const float* q = &coords[3l * m.lig_idx[j]];
              float d2 = 0;
              for (int d = 0; d < 3; ++d) {
                float dd = p[d] - q[d];
                dd -= m.box[d] * std::nearbyint(dd / m.box[d]);
                d2 += dd * dd;
              }
              if (d2 < cut2) ++cnt;
            }
          }
    }
    check += (double)cnt;
  }
};

void wl_ca_rmsd(const Traj& t, const Meta& m) {
  std::vector<float> coords(3l * t.natoms);
  float box9[9];
  CaRmsdAcc acc(m);
  auto t0 = clk::now();
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    acc.frame(coords.data(), m);
  }
  emit("ca_rmsd", (long)t.offsets.size(), secs(t0, clk::now()),
       acc.check / t.offsets.size());
}

void wl_com_gyr(const Traj& t, const Meta& m) {
  std::vector<float> coords(3l * t.natoms);
  float box9[9];
  ComGyrAcc acc(m);
  auto t0 = clk::now();
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    acc.frame(coords.data(), m);
  }
  emit("com_gyr", (long)t.offsets.size(), secs(t0, clk::now()),
       acc.check / t.offsets.size());
}

void wl_contacts(const Traj& t, const Meta& m) {
  std::vector<float> coords(3l * t.natoms);
  float box9[9];
  ContactsAcc acc(m);
  auto t0 = clk::now();
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    acc.frame(coords.data(), m);
  }
  emit("contacts", (long)t.offsets.size(), secs(t0, clk::now()),
       acc.check / t.offsets.size());
}

// One decode, all three observables per frame — the native twin of the
// device's fused window program (workloads.py wl_fused).
void wl_fused(const Traj& t, const Meta& m) {
  std::vector<float> coords(3l * t.natoms);
  float box9[9];
  CaRmsdAcc ca(m);
  ComGyrAcc cg(m);
  ContactsAcc ct(m);
  auto t0 = clk::now();
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    ca.frame(coords.data(), m);
    cg.frame(coords.data(), m);
    ct.frame(coords.data(), m);
  }
  double el = secs(t0, clk::now());
  long n = (long)t.offsets.size();
  printf(
      "{\"workload\":\"fused\",\"frames\":%ld,\"elapsed_s\":%.6f,"
      "\"fps\":%.2f,\"check\":%.6g,\"check_com\":%.6g,"
      "\"check_contacts\":%.6g}\n",
      n, el, n / el, ca.check / n, cg.check / n, ct.check / n);
}

// Exact Lee-Richards SASA over the sel atoms: same slab placement as
// ops/sasa_host.py (dz = 2R/n_slices, mids at zi - R + dz*(k+0.5); band
// area R * dz * exposed_angle).
void wl_sasa(const Traj& t, const Meta& m) {
  int ns = (int)m.sel_idx.size();
  const std::vector<float>& radii = m.sel_radii;
  float rmax = 0;
  for (float r : radii) rmax = std::max(rmax, r);
  float cut = 2 * rmax;
  int dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max(1, (int)std::floor(m.box[d] / cut));
  int ncell = dims[0] * dims[1] * dims[2];
  std::vector<float> coords(3l * t.natoms), x(3l * ns);
  std::vector<std::vector<int>> cells(ncell);
  std::vector<int> nbr;
  std::vector<std::pair<float, float>> ivals;
  float box9[9];
  double check = 0;
  int S = m.n_slices;
  auto t0 = clk::now();
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    for (int i = 0; i < ns; ++i)
      for (int d = 0; d < 3; ++d) x[3 * i + d] = coords[3l * m.sel_idx[i] + d];
    // grid over the sel atoms (no PBC: the protein ball sits mid-box, as in
    // the device workload's open-boundary neighbor_lists_device)
    for (auto& c : cells) c.clear();
    auto cellof = [&](const float* p, int* ix) {
      for (int d = 0; d < 3; ++d) {
        float f = p[d] / m.box[d];
        f -= std::floor(f);
        ix[d] = std::min(dims[d] - 1, (int)(f * dims[d]));
      }
      return (ix[0] * dims[1] + ix[1]) * dims[2] + ix[2];
    };
    int ix[3];
    for (int i = 0; i < ns; ++i) cells[cellof(&x[3 * i], ix)].push_back(i);
    double area_total = 0;
    for (int i = 0; i < ns; ++i) {
      const float* pi = &x[3 * i];
      float Ri = radii[i];
      // neighbor list: |xi-xj| < ri + rj
      nbr.clear();
      cellof(pi, ix);
      for (int ox = -1; ox <= 1; ++ox)
        for (int oy = -1; oy <= 1; ++oy)
          for (int oz = -1; oz <= 1; ++oz) {
            int cx = ix[0] + ox, cy = ix[1] + oy, cz = ix[2] + oz;
            if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
                cz >= dims[2])
              continue;
            for (int j : cells[(cx * dims[1] + cy) * dims[2] + cz]) {
              if (j == i) continue;
              float dx = pi[0] - x[3 * j], dy = pi[1] - x[3 * j + 1],
                    dz_ = pi[2] - x[3 * j + 2];
              float rr = Ri + radii[j];
              if (dx * dx + dy * dy + dz_ * dz_ < rr * rr) nbr.push_back(j);
            }
          }
      double dz = 2.0 * Ri / S;
      double area = 0;
      for (int s = 0; s < S; ++s) {
        double z = pi[2] - Ri + dz * (s + 0.5);
        double ci2 = (double)Ri * Ri - (z - pi[2]) * (z - pi[2]);
        if (ci2 <= 0) continue;
        double ci = std::sqrt(ci2);
        ivals.clear();
        bool covered = false;
        for (int j : nbr) {
          double dzj = z - x[3 * j + 2];
          double cj2 = (double)radii[j] * radii[j] - dzj * dzj;
          if (cj2 <= 0) continue;
          double cj = std::sqrt(cj2);
          double dxj = x[3 * j] - pi[0], dyj = x[3 * j + 1] - pi[1];
          double d = std::hypot(dxj, dyj);
          if (d >= ci + cj) continue;
          if (d + ci <= cj) { covered = true; break; }
          if (d + cj <= ci) continue;
          double cos_half = (d * d + ci * ci - cj * cj) / (2 * d * ci);
          cos_half = std::min(1.0, std::max(-1.0, cos_half));
          double half = std::acos(cos_half);
          double mid = std::atan2(dyj, dxj);
          double lo = mid - half, hi = mid + half;
          // wrap into [-pi, pi], splitting if needed
          if (lo < -M_PI) {
            ivals.push_back({lo + 2 * M_PI, M_PI});
            lo = -M_PI;
          }
          if (hi > M_PI) {
            ivals.push_back({-M_PI, hi - 2 * M_PI});
            hi = M_PI;
          }
          ivals.push_back({lo, hi});
        }
        if (covered) continue;
        // union sweep
        std::sort(ivals.begin(), ivals.end());
        double covered_len = 0, cur_lo = 0, cur_hi = -1e30;
        bool open = false;
        for (auto& iv : ivals) {
          if (!open || iv.first > cur_hi) {
            if (open) covered_len += cur_hi - cur_lo;
            cur_lo = iv.first;
            cur_hi = iv.second;
            open = true;
          } else {
            cur_hi = std::max(cur_hi, (double)iv.second);
          }
        }
        if (open) covered_len += cur_hi - cur_lo;
        area += Ri * dz * (2 * M_PI - covered_len);
      }
      area_total += area;
    }
    check += area_total;
  }
  emit("sasa", (long)t.offsets.size(), secs(t0, clk::now()),
       check / t.offsets.size());
}

// trjconv: decode every frame, gather the selection, write DCD.
void wl_trjconv(const Traj& t, const Meta& m, const char* out_path) {
  int ns = (int)m.sel_idx.size();
  std::vector<float> coords(3l * t.natoms);
  std::vector<float> xs(ns), ys(ns), zs(ns);
  float box9[9];
  FILE* f = fopen(out_path, "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", out_path); exit(1); }
  auto rec = [&f](const void* p, uint32_t n) {
    fwrite(&n, 4, 1, f);
    fwrite(p, 1, n, f);
    fwrite(&n, 4, 1, f);
  };
  auto t0 = clk::now();
  {  // header
    uint8_t hdr[84] = {0};
    std::memcpy(hdr, "CORD", 4);
    uint32_t nframes = (uint32_t)t.offsets.size();
    std::memcpy(hdr + 4, &nframes, 4);
    uint32_t ver = 24;
    std::memcpy(hdr + 80, &ver, 4);
    rec(hdr, 84);
    uint32_t ntitle = 1;
    char title[4 + 80] = {0};
    std::memcpy(title, &ntitle, 4);
    std::snprintf(title + 4, 80, "native trjconv");
    rec(title, 84);
    uint32_t na = (uint32_t)ns;
    rec(&na, 4);
  }
  for (size_t k = 0; k < t.offsets.size(); ++k) {
    t.decode((int)k, coords.data(), box9);
    for (int i = 0; i < ns; ++i) {
      const float* c = &coords[3l * m.sel_idx[i]];
      xs[i] = c[0] * 10;  // nm -> Angstrom, DCD convention
      ys[i] = c[1] * 10;
      zs[i] = c[2] * 10;
    }
    rec(xs.data(), 4u * ns);
    rec(ys.data(), 4u * ns);
    rec(zs.data(), 4u * ns);
  }
  fclose(f);
  emit("trjconv", (long)t.offsets.size(), secs(t0, clk::now()), (double)ns);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: native_workloads <ca_rmsd|com_gyr|contacts|fused|sasa|"
            "trjconv|all> traj.xtc meta.bin [max_frames] [dcd_out]\n");
    return 2;
  }
  std::string cmd = argv[1];
  long max_frames = argc > 4 ? atol(argv[4]) : 0;
  const char* dcd_out = argc > 5 ? argv[5] : "/tmp/native_trjconv.dcd";
  Meta m;
  if (!read_meta(argv[3], m)) {
    fprintf(stderr, "bad meta file %s\n", argv[3]);
    return 1;
  }
  Traj t;
  if (!t.load(argv[2], max_frames)) {
    fprintf(stderr, "bad xtc %s\n", argv[2]);
    return 1;
  }
  if (t.natoms != m.n_atoms) {
    fprintf(stderr, "meta natoms %d != xtc natoms %d\n", m.n_atoms, t.natoms);
    return 1;
  }
  if (cmd == "ca_rmsd" || cmd == "all") wl_ca_rmsd(t, m);
  if (cmd == "com_gyr" || cmd == "all") wl_com_gyr(t, m);
  if (cmd == "contacts" || cmd == "all") wl_contacts(t, m);
  if (cmd == "fused" || cmd == "all") wl_fused(t, m);
  if (cmd == "sasa" || cmd == "all") wl_sasa(t, m);
  if (cmd == "trjconv" || cmd == "all") wl_trjconv(t, m, dcd_out);
  return 0;
}
