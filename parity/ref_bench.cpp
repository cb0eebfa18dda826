// Reference CPU performance twin — fills the "Baseline to be measured"
// table of BASELINE.md.
//
// The reference's demo executables cannot be built in this environment
// (their GenericParameters external and GUI deps are not in the tree),
// so this driver times the REFERENCE KERNELS (compiled unmodified from
// /root/reference: XPBD.cpp, PositionBasedDynamics.cpp,
// PositionBasedElasticRods.cpp, TimeIntegration.cpp) under the
// reference's own execution strategy:
//  - TimeStepController::step substep loop semantics
//    (TimeStepController.cpp:75-241);
//  - greedy first-fit graph coloring into constraint groups
//    (SimulationModel::initConstraintGroups, SimulationModel.cpp:
//    1033-1094): groups sequential, members OpenMP-parallel
//    (TimeStepController.cpp:270-295, omp parallel for per group);
//  - OpenMP-parallel integration / velocity-update loops
//    (TimeStepController.cpp:95-173).
// Scenes are generated internally to mirror bench.py's workloads
// (constraint families, counts, stiffness, solver budget) so the JSON
// line this prints is directly comparable with BENCH results.
//
// Usage:
//   ref_bench cloth W H steps
//   ref_bench bar W H D steps
//   ref_bench rod N steps
//   ref_bench femtet nodeFile eleFile nInstances steps  (classic FEM,
//       ArmadilloCollisionScene budget: dt=0.01, stiffness 1.0, nu 0.2)
// Prints one JSON line: {"workload": ..., "n_particles": ...,
//   "n_constraints": ..., "threads": T, "steps_per_s": S}
#include <chrono>
#include <functional>
#include <cstdio>
#include <cstring>
#include <map>
#include <set>
#include <string>
#include <vector>
#include <array>
#ifdef _OPENMP
#include <omp.h>
#endif
#include "Common/Common.h"
#include "PositionBasedDynamics/XPBD.h"
#include "PositionBasedDynamics/PositionBasedFluids.h"
#include "PositionBasedDynamics/SPHKernels.h"
#include "Simulation/NeighborhoodSearchSpatialHashing.h"
#include "PositionBasedDynamics/PositionBasedDynamics.h"
#include "PositionBasedDynamics/PositionBasedElasticRods.h"
#include "PositionBasedDynamics/TimeIntegration.h"

using namespace PBD;

static const Vector3r GRAVITY(0.0, -9.81, 0.0);

static int num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

// Greedy first-fit coloring over constraints' particle lists — the
// SimulationModel::initConstraintGroups partition (a constraint joins
// the first group none of whose members shares a particle with it).
static std::vector<std::vector<int>> color_groups(
    const std::vector<std::vector<int>>& members, int n_particles) {
    std::vector<uint64_t> used(n_particles, 0);  // per-particle color bits
    std::vector<std::vector<int>> groups;
    for (int c = 0; c < (int)members.size(); c++) {
        uint64_t occ = 0;
        for (int p : members[c]) occ |= used[p];
        int color = 0;
        while (color < 64 && (occ >> color & 1)) color++;
        if (color == 64) { std::fprintf(stderr, ">64 colors\n"); exit(1); }
        if ((int)groups.size() <= color) groups.resize(color + 1);
        groups[color].push_back(c);
        for (int p : members[c]) used[p] |= (uint64_t)1 << color;
    }
    return groups;
}

struct PD {
    std::vector<Vector3r> x, v, old;
    std::vector<Real> mass, invMass;
    int n() const { return (int)x.size(); }
    void add(const Vector3r& p, Real m) {
        x.push_back(p); v.push_back(Vector3r::Zero());
        old.push_back(p); mass.push_back(m);
        invMass.push_back(m != 0.0 ? (Real)1.0 / m : (Real)0.0);
    }
    void integrate(Real h) {
        const int N = n();
        #pragma omp parallel for schedule(static)
        for (int i = 0; i < N; i++) {
            old[i] = x[i];
            Vector3r acc = GRAVITY;
            TimeIntegration::semiImplicitEuler(h, mass[i], x[i], v[i], acc);
        }
    }
    void velocityUpdate(Real h) {
        const int N = n();
        #pragma omp parallel for schedule(static)
        for (int i = 0; i < N; i++)
            TimeIntegration::velocityUpdateFirstOrder(h, mass[i], x[i],
                                                      old[i], v[i]);
    }
};

static double time_steps(const std::function<void()>& step, int warmup,
                         int steps) {
    for (int i = 0; i < warmup; i++) step();
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < steps; i++) step();
    auto t1 = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(t1 - t0).count() / steps;
}

// --------------------------------------------------------------------------
// cloth W H: XPBD distance per edge + XPBD isometric bending per interior
// edge on the alternating-diagonal regular grid (bench.py's 320x320 scene:
// distance stiffness 1e5, bending 0.05, 5 substeps x 1 iter, dt 0.005).
// --------------------------------------------------------------------------
static int run_cloth(int W, int H, int steps) {
    PD pd;
    const Real dx = (Real)1.0 / (W - 1), dy = (Real)1.0 / (H - 1);
    for (int i = 0; i < H; i++)
        for (int j = 0; j < W; j++)
            pd.add(Vector3r(j * dx, i * dy, 0.0), 1.0);
    pd.mass[0] = pd.invMass[0] = 0.0;
    pd.mass[W - 1] = pd.invMass[W - 1] = 0.0;

    // faces with alternating diagonals (models/builders.py twin)
    std::vector<std::array<int, 3>> faces;
    for (int i = 0; i < H - 1; i++)
        for (int j = 0; j < W - 1; j++) {
            const int h0 = (i % 2 == j % 2) ? 1 : 0;
            faces.push_back({i * W + j, i * W + j + 1,
                             (i + 1) * W + j + h0});
            faces.push_back({(i + 1) * W + j + 1, (i + 1) * W + j,
                             i * W + j + 1 - h0});
        }
    // unique edges + interior-edge bending stencils (IndexedFaceMesh
    // buildNeighbors semantics)
    std::map<std::pair<int, int>, std::vector<int>> edge_opp;
    for (auto& f : faces)
        for (int e = 0; e < 3; e++) {
            int a = f[e], b = f[(e + 1) % 3], o = f[(e + 2) % 3];
            if (a > b) std::swap(a, b);
            edge_opp[{a, b}].push_back(o);
        }
    struct DC { int i, j; Real rest; };
    struct BC { int v1, v2, v3, v4;
                Eigen::Matrix<Real, 4, 4, Eigen::DontAlign> Q; };
    std::vector<DC> dcs;
    std::vector<BC> bcs;
    for (auto& kv : edge_opp) {
        DC d{kv.first.first, kv.first.second, 0.0};
        d.rest = (pd.x[d.i] - pd.x[d.j]).norm();
        dcs.push_back(d);
        if (kv.second.size() == 2) {
            BC b{kv.second[0], kv.second[1], kv.first.first,
                 kv.first.second};
            XPBD::init_IsometricBendingConstraint(
                pd.x[b.v1], pd.x[b.v2], pd.x[b.v3], pd.x[b.v4], b.Q);
            bcs.push_back(b);
        }
    }
    std::vector<std::vector<int>> mem;
    for (auto& d : dcs) mem.push_back({d.i, d.j});
    for (auto& b : bcs) mem.push_back({b.v1, b.v2, b.v3, b.v4});
    auto groups = color_groups(mem, pd.n());

    const Real distStiff = (Real)1e5, bendStiff = (Real)0.05;
    const int substeps = 5, maxIter = 1;
    const Real dt = (Real)0.005, h = dt / substeps;
    std::vector<Real> lam(mem.size());
    const int nd = (int)dcs.size();

    auto step = [&]() {
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            std::fill(lam.begin(), lam.end(), (Real)0.0);
            for (int it = 0; it < maxIter; it++)
                for (auto& g : groups) {
                    const int gs = (int)g.size();
                    #pragma omp parallel for schedule(static)
                    for (int k = 0; k < gs; k++) {
                        const int c = g[k];
                        if (c < nd) {
                            DC& d = dcs[c];
                            Vector3r c1, c2;
                            if (XPBD::solve_DistanceConstraint(
                                    pd.x[d.i], pd.invMass[d.i],
                                    pd.x[d.j], pd.invMass[d.j], d.rest,
                                    distStiff, h, lam[c], c1, c2)) {
                                if (pd.invMass[d.i] != 0.0) pd.x[d.i] += c1;
                                if (pd.invMass[d.j] != 0.0) pd.x[d.j] += c2;
                            }
                        } else {
                            BC& b = bcs[c - nd];
                            Vector3r c1, c2, c3, c4;
                            if (XPBD::solve_IsometricBendingConstraint(
                                    pd.x[b.v1], pd.invMass[b.v1],
                                    pd.x[b.v2], pd.invMass[b.v2],
                                    pd.x[b.v3], pd.invMass[b.v3],
                                    pd.x[b.v4], pd.invMass[b.v4], b.Q,
                                    bendStiff, h, lam[c], c1, c2, c3, c4)) {
                                if (pd.invMass[b.v1] != 0.0) pd.x[b.v1] += c1;
                                if (pd.invMass[b.v2] != 0.0) pd.x[b.v2] += c2;
                                if (pd.invMass[b.v3] != 0.0) pd.x[b.v3] += c3;
                                if (pd.invMass[b.v4] != 0.0) pd.x[b.v4] += c4;
                            }
                        }
                    }
                }
            pd.velocityUpdate(h);
        }
    };
    const double sec = time_steps(step, 3, steps);
    std::printf("{\"workload\": \"cloth_%dx%d\", \"n_particles\": %d, "
                "\"n_constraints\": %zu, \"threads\": %d, "
                "\"steps_per_s\": %.4g}\n",
                W, H, pd.n(), mem.size(), num_threads(), 1.0 / sec);
    return 0;
}

// --------------------------------------------------------------------------
// bar W H D: regular 5-tet bar, XPBD FEM tets (bench.py --bar scene:
// stiffness 1e5, nu 0.3, pinned i=0 face, 5 substeps x 1 iter, dt 0.005).
// --------------------------------------------------------------------------
struct Tet { int i[4]; Real vol; Matrix3r invRest; Real E, nu; };

static void five_tet_cells(int W, int H, int D,
                           std::vector<std::array<int, 4>>& tets) {
    auto vid = [&](int i, int j, int k) { return (i * H + j) * D + k; };
    for (int i = 0; i < W - 1; i++)
        for (int j = 0; j < H - 1; j++)
            for (int k = 0; k < D - 1; k++) {
                int c[8] = {vid(i, j, k), vid(i + 1, j, k),
                            vid(i + 1, j + 1, k), vid(i, j + 1, k),
                            vid(i, j, k + 1), vid(i + 1, j, k + 1),
                            vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1)};
                if ((i + j + k) % 2 == 1) {
                    tets.push_back({c[1], c[0], c[4], c[2]});
                    tets.push_back({c[7], c[4], c[0], c[2]});
                    tets.push_back({c[4], c[7], c[5], c[2]});
                    tets.push_back({c[0], c[3], c[7], c[2]});
                    tets.push_back({c[4], c[5], c[7], c[2]});
                } else {
                    tets.push_back({c[0], c[1], c[5], c[3]});
                    tets.push_back({c[6], c[5], c[1], c[3]});
                    tets.push_back({c[5], c[6], c[4], c[3]});
                    tets.push_back({c[1], c[2], c[6], c[3]});
                    tets.push_back({c[5], c[4], c[0], c[3]});
                }
            }
}

static int run_fem(PD& pd, std::vector<Tet>& tets, bool xpbd, Real dt,
                   int steps, const char* name) {
    std::vector<std::vector<int>> mem;
    for (auto& t : tets)
        mem.push_back({t.i[0], t.i[1], t.i[2], t.i[3]});
    auto groups = color_groups(mem, pd.n());
    const int substeps = 5, maxIter = 1;
    const Real h = dt / substeps;
    std::vector<Real> lam(tets.size());

    auto step = [&]() {
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            std::fill(lam.begin(), lam.end(), (Real)0.0);
            for (int it = 0; it < maxIter; it++)
                for (auto& g : groups) {
                    const int gs = (int)g.size();
                    #pragma omp parallel for schedule(static)
                    for (int k = 0; k < gs; k++) {
                        Tet& t = tets[g[k]];
                        Vector3r& x1 = pd.x[t.i[0]];
                        Vector3r& x2 = pd.x[t.i[1]];
                        Vector3r& x3 = pd.x[t.i[2]];
                        Vector3r& x4 = pd.x[t.i[3]];
                        Vector3r c1, c2, c3, c4;
                        bool ok;
                        if (xpbd) {
                            const Real curVol = -(Real)(1.0 / 6.0)
                                * (x4 - x1).dot((x3 - x1).cross(x2 - x1));
                            const bool inv = curVol / t.vol < 0.2;
                            ok = XPBD::solve_FEMTetraConstraint(
                                x1, pd.invMass[t.i[0]], x2,
                                pd.invMass[t.i[1]], x3, pd.invMass[t.i[2]],
                                x4, pd.invMass[t.i[3]], t.vol, t.invRest,
                                t.E, t.nu, inv, h, lam[g[k]], c1, c2, c3,
                                c4);
                        } else {
                            // classic FEM (solid method 2,
                            // FEMTetConstraint::solvePositionConstraint)
                            ok = PositionBasedDynamics::
                                solve_FEMTetraConstraint(
                                    x1, pd.invMass[t.i[0]], x2,
                                    pd.invMass[t.i[1]], x3,
                                    pd.invMass[t.i[2]], x4,
                                    pd.invMass[t.i[3]], t.vol, t.invRest,
                                    t.E, t.nu, true, c1, c2, c3, c4);
                        }
                        if (ok) {
                            if (pd.invMass[t.i[0]] != 0.0) x1 += c1;
                            if (pd.invMass[t.i[1]] != 0.0) x2 += c2;
                            if (pd.invMass[t.i[2]] != 0.0) x3 += c3;
                            if (pd.invMass[t.i[3]] != 0.0) x4 += c4;
                        }
                    }
                }
            pd.velocityUpdate(h);
        }
    };
    const double sec = time_steps(step, 2, steps);
    std::printf("{\"workload\": \"%s\", \"n_particles\": %d, "
                "\"n_constraints\": %zu, \"threads\": %d, "
                "\"steps_per_s\": %.4g}\n",
                name, pd.n(), tets.size(), num_threads(), 1.0 / sec);
    return 0;
}

static int run_bar(int W, int H, int D, int steps) {
    PD pd;
    const Real sx = (Real)2.0, sy = (Real)0.5, sz = (Real)0.5;
    for (int i = 0; i < W; i++)
        for (int j = 0; j < H; j++)
            for (int k = 0; k < D; k++)
                pd.add(Vector3r(sx * i / (W - 1), sy * j / (H - 1),
                                sz * k / (D - 1)), 1.0);
    for (int j = 0; j < H; j++)
        for (int k = 0; k < D; k++) {
            const int v = j * D + k;
            pd.mass[v] = pd.invMass[v] = 0.0;
        }
    std::vector<std::array<int, 4>> ti;
    five_tet_cells(W, H, D, ti);
    std::vector<Tet> tets(ti.size());
    for (size_t c = 0; c < ti.size(); c++) {
        Tet& t = tets[c];
        for (int m = 0; m < 4; m++) t.i[m] = ti[c][m];
        t.E = (Real)1e5; t.nu = (Real)0.3;
        PositionBasedDynamics::init_FEMTetraConstraint(
            pd.x[t.i[0]], pd.x[t.i[1]], pd.x[t.i[2]], pd.x[t.i[3]],
            t.vol, t.invRest);
    }
    char name[64];
    std::snprintf(name, sizeof name, "bar_%dx%dx%d_xpbd_fem", W, H, D);
    return run_fem(pd, tets, true, (Real)0.005, steps, name);
}

static int run_tetfile(const char* nodeFile, const char* eleFile,
                       int ninst, int steps) {
    // TetGen .node/.ele (TetGenLoader semantics), classic FEM at the
    // ArmadilloCollisionScene budget (dt=0.01, stiffness 1, nu 0.2,
    // scale 2) — FEM projection only, no CD: a LOWER bound on the
    // reference's full step cost.
    FILE* f = std::fopen(nodeFile, "r");
    if (!f) { std::fprintf(stderr, "no node file\n"); return 1; }
    int nv, dim, na, nb;
    std::fscanf(f, "%d %d %d %d", &nv, &dim, &na, &nb);
    std::vector<Vector3r> verts(nv);
    for (int i = 0; i < nv; i++) {
        int id; double a, b, c;
        std::fscanf(f, "%d %lf %lf %lf", &id, &a, &b, &c);
        verts[i] = Vector3r((Real)(2 * a), (Real)(2 * b), (Real)(2 * c));
    }
    std::fclose(f);
    f = std::fopen(eleFile, "r");
    if (!f) { std::fprintf(stderr, "no ele file\n"); return 1; }
    int nt, npt, attr;
    std::fscanf(f, "%d %d %d", &nt, &npt, &attr);
    std::vector<std::array<int, 4>> ti(nt);
    for (int c = 0; c < nt; c++) {
        int id;
        std::fscanf(f, "%d %d %d %d %d", &id, &ti[c][0], &ti[c][1],
                    &ti[c][2], &ti[c][3]);
    }
    std::fclose(f);

    PD pd;
    std::vector<Tet> tets;
    for (int inst = 0; inst < ninst; inst++) {
        const int off = pd.n();
        for (int i = 0; i < nv; i++)
            pd.add(verts[i] + Vector3r(0.0, (Real)(6 * inst), 0.0), 1.0);
        for (int c = 0; c < nt; c++) {
            Tet t;
            for (int m = 0; m < 4; m++) t.i[m] = ti[c][m] + off;
            t.E = (Real)1.0; t.nu = (Real)0.2;
            PositionBasedDynamics::init_FEMTetraConstraint(
                pd.x[t.i[0]], pd.x[t.i[1]], pd.x[t.i[2]], pd.x[t.i[3]],
                t.vol, t.invRest);
            tets.push_back(t);
        }
    }
    char name[64];
    std::snprintf(name, sizeof name, "tetfile_x%d_classic_fem", ninst);
    return run_fem(pd, tets, false, (Real)0.01, steps, name);
}

// --------------------------------------------------------------------------
// rod N: Cosserat stretch-shear + bend-twist chain (CosseratRodsDemo
// class; config 3). Solved sequentially (a chain's constraints conflict
// pairwise — coloring yields 2 groups; kept per-group parallel).
// --------------------------------------------------------------------------
static int run_rod(int N, int steps) {
    PD pd;
    for (int i = 0; i < N; i++)
        pd.add(Vector3r((Real)i / (N - 1), 0.0, 0.0), 1.0);
    pd.mass[0] = pd.invMass[0] = 0.0;
    const int nq = N - 1;
    std::vector<Quaternionr> q(nq, Quaternionr::Identity()), oldQ(nq);
    std::vector<Vector3r> omega(nq, Vector3r::Zero());
    std::vector<Real> qmass(nq, 1.0), qinvMass(nq, 1.0);
    qmass[0] = qinvMass[0] = 0.0;
    std::vector<Quaternionr> restDarboux(nq - 1,
                                         Quaternionr::Identity());
    const Real rest = (Real)1.0 / (N - 1);
    const Vector3r sks(1.0, 1.0, 1.0), bks(0.5, 0.5, 0.5);
    const int substeps = 5, maxIter = 1;
    const Real dt = (Real)0.005, h = dt / substeps;

    auto step = [&]() {
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (int i = 0; i < nq; i++) {
                oldQ[i] = q[i];
                TimeIntegration::semiImplicitEulerRotation(
                    h, qmass[i], qmass[i] * Matrix3r::Identity(),
                    qinvMass[i] * Matrix3r::Identity(), q[i], omega[i],
                    Vector3r(0, 0, 0));
            }
            for (int it = 0; it < maxIter; it++) {
                for (int c = 0; c < nq; c++) {
                    Vector3r c1, c2; Quaternionr cq;
                    if (PositionBasedCosseratRods::
                            solve_StretchShearConstraint(
                                pd.x[c], pd.invMass[c], pd.x[c + 1],
                                pd.invMass[c + 1], q[c], qinvMass[c], sks,
                                rest, c1, c2, cq)) {
                        if (pd.invMass[c] != 0.0) pd.x[c] += c1;
                        if (pd.invMass[c + 1] != 0.0) pd.x[c + 1] += c2;
                        if (qinvMass[c] != 0.0) {
                            q[c].coeffs() += cq.coeffs();
                            q[c].normalize();
                        }
                    }
                }
                for (int c = 0; c < nq - 1; c++) {
                    Quaternionr c1, c2;
                    if (PositionBasedCosseratRods::
                            solve_BendTwistConstraint(
                                q[c], qinvMass[c], q[c + 1],
                                qinvMass[c + 1], bks, restDarboux[c], c1,
                                c2)) {
                        if (qinvMass[c] != 0.0) {
                            q[c].coeffs() += c1.coeffs();
                            q[c].normalize();
                        }
                        if (qinvMass[c + 1] != 0.0) {
                            q[c + 1].coeffs() += c2.coeffs();
                            q[c + 1].normalize();
                        }
                    }
                }
            }
            pd.velocityUpdate(h);
            for (int i = 0; i < nq; i++)
                TimeIntegration::angularVelocityUpdateFirstOrder(
                    h, qmass[i], q[i], oldQ[i], omega[i]);
        }
    };
    const double sec = time_steps(step, 10, steps);
    std::printf("{\"workload\": \"rod_%d\", \"n_particles\": %d, "
                "\"n_constraints\": %d, \"threads\": %d, "
                "\"steps_per_s\": %.4g}\n",
                N, pd.n(), 2 * nq - 1, num_threads(), 1.0 / sec);
    return 0;
}


// --------------------------------------------------------------------------
// fluid NX NY NZ steps: PBF breaking dam with the reference's own
// kernels AND its own spatial-hash neighborhood search
// (NeighborhoodSearchSpatialHashing.cpp:89-160), stepped with the
// TimeStepFluidModel loop (Demos/FluidDemo/TimeStepFluidModel.cpp:21-68):
// CFL dt -> semiImplicitEuler -> neighborhoodSearch -> 5x {density,
// lambda, solve} -> velocityUpdate (XSPH omitted: it only adds cost on
// our side too and the metric is the density solve).
// --------------------------------------------------------------------------
static int run_fluid_dam(int NX, int NY, int NZ, int steps) {
    const Real radius = (Real)0.025;
    const Real diam = 2 * radius;
    const Real support = 4 * radius;
    const Real rho0 = (Real)1000.0;
    CubicKernel::setRadius(support);

    std::vector<Vector3r> x, bx;
    for (int i = 0; i < NX; i++)
        for (int j = 0; j < NY; j++)
            for (int k = 0; k < NZ; k++)
                x.push_back(Vector3r(diam + i * diam, diam + j * diam,
                                     diam + k * diam));
    // boundary shell of the container box
    const Real hx = (NX + 2) * diam * 4, hy = (NY + 2) * diam * 2,
               hz = (NZ + 2) * diam;
    auto shell = [&](Real a, Real b, Real c) {
        bx.push_back(Vector3r(a, b, c));
    };
    for (Real a = 0; a <= hx; a += diam)
        for (Real b = 0; b <= hy; b += diam)
            for (Real c = 0; c <= hz; c += diam) {
                const bool on = a < diam || a > hx - diam || b < diam
                    || b > hy - diam || c < diam || c > hz - diam;
                if (on) shell(a, b, c);
            }
    const unsigned int nf = (unsigned int)x.size();
    const unsigned int nb = (unsigned int)bx.size();
    std::vector<Real> mass(nf, (Real)(0.8 * diam * diam * diam * rho0));
    // boundary psi via a brute neighbor pass over boundary cells (build
    // time only; coarse-grid buckets to keep it tractable)
    std::vector<Real> psi(nb);
    {
        PBD::NeighborhoodSearchSpatialHashing ns(nb, support);
        std::vector<Vector3r*> dummy;
        ns.neighborhoodSearch(bx.data());
        unsigned int** nbrs = ns.getNeighbors();
        unsigned int* cnt = ns.getNumNeighbors();
        #pragma omp parallel for schedule(static)
        for (int i = 0; i < (int)nb; i++) {
            Real sum = CubicKernel::W_zero();
            for (unsigned int j = 0; j < cnt[i]; j++)
                sum += CubicKernel::W(bx[i] - bx[nbrs[i][j]]);
            psi[i] = rho0 / sum;
        }
    }
    std::vector<Vector3r> v(nf, Vector3r::Zero()), old(nf);
    std::vector<Real> density(nf), lambda(nf);
    PBD::NeighborhoodSearchSpatialHashing ns(nf, support);
    ns.setRadius(support);

    Real dt = (Real)0.005;
    auto step = [&]() {
        // CFL
        Real maxV2 = (Real)0.1;
        for (unsigned int i = 0; i < nf; i++) {
            const Vector3r a = Vector3r(0, (Real)-9.81, 0);
            maxV2 = std::max(maxV2, (Real)(v[i] + a * dt).squaredNorm());
        }
        dt = std::min(std::max((Real)(0.4 * diam / sqrt(maxV2)),
                               (Real)1e-4), (Real)5e-3);
        #pragma omp parallel for schedule(static)
        for (int i = 0; i < (int)nf; i++) {
            old[i] = x[i];
            Vector3r acc(0, (Real)-9.81, 0);
            TimeIntegration::semiImplicitEuler(dt, mass[i], x[i], v[i],
                                               acc);
        }
        ns.neighborhoodSearch(x.data(), nb, bx.data());
        unsigned int** nbrs = ns.getNeighbors();
        unsigned int* cnt = ns.getNumNeighbors();
        for (int it = 0; it < 5; it++) {
            #pragma omp parallel for schedule(static)
            for (int i = 0; i < (int)nf; i++) {
                Real err;
                PositionBasedFluids::computePBFDensity(
                    i, nf, x.data(), mass.data(), bx.data(), psi.data(),
                    cnt[i], nbrs[i], rho0, true, err, density[i]);
                PositionBasedFluids::computePBFLagrangeMultiplier(
                    i, nf, x.data(), mass.data(), bx.data(), psi.data(),
                    density[i], cnt[i], nbrs[i], rho0, true, lambda[i]);
            }
            #pragma omp parallel for schedule(static)
            for (int i = 0; i < (int)nf; i++) {
                Vector3r corr;
                PositionBasedFluids::solveDensityConstraint(
                    i, nf, x.data(), mass.data(), bx.data(), psi.data(),
                    cnt[i], nbrs[i], rho0, true, lambda.data(), corr);
                x[i] += corr;
            }
        }
        #pragma omp parallel for schedule(static)
        for (int i = 0; i < (int)nf; i++)
            TimeIntegration::velocityUpdateFirstOrder(dt, mass[i], x[i],
                                                      old[i], v[i]);
    };
    const double sec = time_steps(step, 2, steps);
    std::printf("{\"workload\": \"fluid_dam_%u\", \"n_particles\": %u, "
                "\"n_boundary\": %u, \"threads\": %d, "
                "\"steps_per_s\": %.4g}\n",
                nf, nf, nb, num_threads(), 1.0 / sec);
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: see header\n"); return 1; }
    if (!std::strcmp(argv[1], "cloth") && argc >= 5)
        return run_cloth(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));
    if (!std::strcmp(argv[1], "bar") && argc >= 6)
        return run_bar(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                       atoi(argv[5]));
    if (!std::strcmp(argv[1], "rod") && argc >= 4)
        return run_rod(atoi(argv[2]), atoi(argv[3]));
    if (!std::strcmp(argv[1], "fluid") && argc >= 6)
        return run_fluid_dam(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                             atoi(argv[5]));
    if (!std::strcmp(argv[1], "femtet") && argc >= 6)
        return run_tetfile(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]));
    std::fprintf(stderr, "bad args\n");
    return 1;
}
