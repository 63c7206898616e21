// GROMACS TPR/CPT reader plugin for molar_tpu.
//
// Compiles against a GROMACS source + build tree (the public libgromacs API
// offers no stable ABI, so — like the reference molar_gromacs plugin design —
// this thin shim is built per GROMACS installation and dlopened at runtime).
// Build (see molar_tpu/native/build_gromacs_plugin.py):
//
//   g++ -O2 -shared -fPIC gromacs_plugin.cpp -o libmolar_gromacs.so \
//       -I$GROMACS_SOURCE_DIR/src -I$GROMACS_SOURCE_DIR/api/legacy/include \
//       -I$GROMACS_BUILD_DIR/api/legacy/include ... -lgromacs
//
// Exposed C ABI (consumed by molar_tpu.io.tpr via ctypes): flat arrays only,
// no structs, so the Python side needs no struct layout knowledge.

#include <cstdint>
#include <cstring>
#include <filesystem>
#include <string>
#include <vector>

#include "gromacs/fileio/checkpoint.h"
#include "gromacs/fileio/tpxio.h"
#include "gromacs/mdtypes/inputrec.h"
#include "gromacs/mdtypes/state.h"
#include "gromacs/topology/idef.h"
#include "gromacs/topology/ifunc.h"
#include "gromacs/topology/mtop_util.h"
#include "gromacs/topology/topology.h"
#include "gromacs/trajectory/trajectoryframe.h"

namespace {

thread_local std::string g_last_error;

struct Tpr {
  // Flattened topology, extracted once at open.
  std::vector<char> names;      // natoms * 8, NUL-padded
  std::vector<char> resnames;   // natoms * 8
  std::vector<char> type_names; // natoms * 8
  std::vector<int32_t> resid;
  std::vector<int32_t> type_id;
  std::vector<int32_t> atomic_number;
  std::vector<float> charge;
  std::vector<float> mass;
  std::vector<uint32_t> bonds;  // nbonds * 2
  std::vector<uint32_t> mols;   // nmols * 2 (inclusive ranges)
  std::vector<float> coords;    // natoms * 3 (nm)
  float box[9];                 // rows are box vectors (GROMACS convention)
};

struct Cpt {
  std::vector<float> x, v, f;
  float box[9];
  double time = 0.0;
  int64_t step = 0;
  int natoms = 0;
};

void copy8(std::vector<char>& dst, size_t i, const char* s) {
  char* p = dst.data() + i * 8;
  std::memset(p, 0, 8);
  if (s) std::strncpy(p, s, 7);
}

}  // namespace

extern "C" {

const char* molar_gmx_last_error() { return g_last_error.c_str(); }

void* tpr_open(const char* path) {
  try {
    t_inputrec ir;
    t_state state;
    gmx_mtop_t mtop;
    read_tpx_state(path, &ir, &state, &mtop);

    auto h = new Tpr();
    const int natoms = mtop.natoms;
    h->names.resize((size_t)natoms * 8);
    h->resnames.resize((size_t)natoms * 8);
    h->type_names.resize((size_t)natoms * 8);
    h->resid.resize(natoms);
    h->type_id.resize(natoms);
    h->atomic_number.resize(natoms);
    h->charge.resize(natoms);
    h->mass.resize(natoms);

    // Per-atom fields via the global-atom iterator.
    int i = 0;
    for (const AtomProxy atomP : AtomRange(mtop)) {
      const t_atom& a = atomP.atom();
      copy8(h->names, i, atomP.atomName());
      copy8(h->resnames, i, atomP.residueName());
      copy8(h->type_names, i, atomP.atomType());
      h->resid[i] = atomP.residueNumber();
      h->type_id[i] = a.type;
      h->atomic_number[i] = a.atomnumber > 0 ? a.atomnumber : 0;
      h->charge[i] = a.q;
      h->mass[i] = a.m;
      ++i;
    }

    // Bonds from the interaction lists of every molecule block.
    int offset = 0;
    for (const gmx_molblock_t& mb : mtop.molblock) {
      const gmx_moltype_t& mt = mtop.moltype[mb.type];
      const int apm = mt.atoms.nr;
      for (int m = 0; m < mb.nmol; ++m) {
        h->mols.push_back((uint32_t)offset);
        h->mols.push_back((uint32_t)(offset + apm - 1));
        for (int ftype = 0; ftype < F_NRE; ++ftype) {
          if (!(interaction_function[ftype].flags & IF_CHEMBOND)) continue;
          const InteractionList& il = mt.ilist[ftype];
          const int nratoms = interaction_function[ftype].nratoms;
          for (int k = 0; k < il.size(); k += nratoms + 1) {
            h->bonds.push_back((uint32_t)(offset + il.iatoms[k + 1]));
            h->bonds.push_back((uint32_t)(offset + il.iatoms[k + 2]));
          }
        }
        offset += apm;
      }
    }

    h->coords.resize((size_t)natoms * 3);
    for (int k = 0; k < natoms; ++k)
      for (int d = 0; d < 3; ++d) h->coords[k * 3 + d] = state.x[k][d];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) h->box[r * 3 + c] = state.box[r][c];
    return h;
  } catch (const std::exception& e) {
    g_last_error = e.what();
    return nullptr;
  } catch (...) {
    g_last_error = "unknown error reading tpr";
    return nullptr;
  }
}

void tpr_close(void* h) { delete static_cast<Tpr*>(h); }

int64_t tpr_natoms(void* h) { return (int64_t)static_cast<Tpr*>(h)->resid.size(); }
int64_t tpr_nbonds(void* h) { return (int64_t)(static_cast<Tpr*>(h)->bonds.size() / 2); }
int64_t tpr_nmolecules(void* h) { return (int64_t)(static_cast<Tpr*>(h)->mols.size() / 2); }

void tpr_get_names(void* h, char* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->names.data(), t->names.size());
}
void tpr_get_resnames(void* h, char* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->resnames.data(), t->resnames.size());
}
void tpr_get_type_names(void* h, char* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->type_names.data(), t->type_names.size());
}
void tpr_get_resid(void* h, int32_t* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->resid.data(), t->resid.size() * 4);
}
void tpr_get_type_id(void* h, int32_t* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->type_id.data(), t->type_id.size() * 4);
}
void tpr_get_atomic_number(void* h, int32_t* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->atomic_number.data(), t->atomic_number.size() * 4);
}
void tpr_get_charge(void* h, float* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->charge.data(), t->charge.size() * 4);
}
void tpr_get_mass(void* h, float* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->mass.data(), t->mass.size() * 4);
}
void tpr_get_bonds(void* h, uint32_t* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->bonds.data(), t->bonds.size() * 4);
}
void tpr_get_molecules(void* h, uint32_t* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->mols.data(), t->mols.size() * 4);
}
void tpr_get_coords(void* h, float* out) {
  auto t = static_cast<Tpr*>(h);
  std::memcpy(out, t->coords.data(), t->coords.size() * 4);
}
void tpr_get_box(void* h, float* out9) {
  std::memcpy(out9, static_cast<Tpr*>(h)->box, 36);
}

void* cpt_open(const char* path) {
  try {
    t_trxframe fr;
    std::memset(&fr, 0, sizeof(fr));
    read_checkpoint_trxframe(std::filesystem::path(path), &fr);
    auto h = new Cpt();
    h->natoms = fr.natoms;
    h->time = fr.time;
    h->step = fr.step;
    if (fr.bX && fr.x) {
      h->x.resize((size_t)fr.natoms * 3);
      std::memcpy(h->x.data(), fr.x, h->x.size() * 4);
    }
    if (fr.bV && fr.v) {
      h->v.resize((size_t)fr.natoms * 3);
      std::memcpy(h->v.data(), fr.v, h->v.size() * 4);
    }
    if (fr.bF && fr.f) {
      h->f.resize((size_t)fr.natoms * 3);
      std::memcpy(h->f.data(), fr.f, h->f.size() * 4);
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) h->box[r * 3 + c] = fr.box[r][c];
    return h;
  } catch (const std::exception& e) {
    g_last_error = e.what();
    return nullptr;
  } catch (...) {
    g_last_error = "unknown error reading cpt";
    return nullptr;
  }
}

void cpt_close(void* h) { delete static_cast<Cpt*>(h); }
int64_t cpt_natoms(void* h) { return static_cast<Cpt*>(h)->natoms; }
double cpt_time(void* h) { return static_cast<Cpt*>(h)->time; }
int64_t cpt_step(void* h) { return static_cast<Cpt*>(h)->step; }
int cpt_has_velocities(void* h) { return !static_cast<Cpt*>(h)->v.empty(); }
int cpt_has_forces(void* h) { return !static_cast<Cpt*>(h)->f.empty(); }
void cpt_get_coords(void* h, float* out) {
  auto c = static_cast<Cpt*>(h);
  std::memcpy(out, c->x.data(), c->x.size() * 4);
}
void cpt_get_velocities(void* h, float* out) {
  auto c = static_cast<Cpt*>(h);
  std::memcpy(out, c->v.data(), c->v.size() * 4);
}
void cpt_get_forces(void* h, float* out) {
  auto c = static_cast<Cpt*>(h);
  std::memcpy(out, c->f.data(), c->f.size() * 4);
}
void cpt_get_box(void* h, float* out9) {
  std::memcpy(out9, static_cast<Cpt*>(h)->box, 36);
}

}  // extern "C"
