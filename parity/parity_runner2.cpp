// Parity oracle driver #2: FEM-tet solids, Cosserat rods, and rigid
// ball-joint chains stepped with the REFERENCE kernel implementations
// (compiled unmodified from /root/reference — XPBD.cpp,
// PositionBasedDynamics.cpp, PositionBasedElasticRods.cpp,
// PositionBasedRigidBodyDynamics.cpp, TimeIntegration.cpp) so the JAX
// engine can be compared against the actual C++ reference on BASELINE
// configs 2 (BarDemo-class) and 3 (CosseratRods-class) plus a rigid
// joint chain.
//
// The loops reproduce TimeStepController::step semantics
// (TimeStepController.cpp:75-173): substeps of semi-implicit Euler
// (linear + rotational) -> positionConstraintProjection (lambda reset
// per substep where applicable) -> first-order velocity updates.
// Constraints are solved sequentially in dump order; dumps are sorted
// by graph color, so in-place sequential updates equal the engine's
// color-batched Gauss-Seidel mode.
//
// Input (text): first line is the mode: "femtet" | "rod" | "balljoint".
// See parity/dump_scene.py for the per-mode sections.
// Output: final state, one line per DoF carrier (see each mode).
#include <cstdio>
#include <cstring>
#include <vector>
#include <array>
#include "Common/Common.h"
#include "PositionBasedDynamics/XPBD.h"
#include "PositionBasedDynamics/PositionBasedDynamics.h"
#include "PositionBasedDynamics/PositionBasedElasticRods.h"
#include "PositionBasedDynamics/PositionBasedRigidBodyDynamics.h"
#include "PositionBasedDynamics/TimeIntegration.h"

using namespace PBD;

static const Vector3r GRAVITY(0.0, -9.81, 0.0);

struct Particles {
    std::vector<Vector3r> x, v, old, acc;
    std::vector<Real> mass, invMass;
    void read(FILE* f, int n) {
        x.resize(n); v.assign(n, Vector3r::Zero());
        old.resize(n); acc.resize(n); mass.resize(n); invMass.resize(n);
        for (int i = 0; i < n; i++) {
            double px, py, pz, m;
            std::fscanf(f, "%lf %lf %lf %lf", &px, &py, &pz, &m);
            x[i] = Vector3r((Real)px, (Real)py, (Real)pz);
            mass[i] = (Real)m;
            invMass[i] = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
        }
    }
    void integrate(Real h) {
        for (size_t i = 0; i < x.size(); i++) {
            old[i] = x[i];
            acc[i] = GRAVITY;
            TimeIntegration::semiImplicitEuler(h, mass[i], x[i], v[i],
                                               acc[i]);
        }
    }
    void velocityUpdate(Real h) {
        for (size_t i = 0; i < x.size(); i++)
            TimeIntegration::velocityUpdateFirstOrder(h, mass[i], x[i],
                                                      old[i], v[i]);
    }
    void print(FILE* out) {
        for (size_t i = 0; i < x.size(); i++)
            std::fprintf(out, "%.9g %.9g %.9g\n", (double)x[i][0],
                         (double)x[i][1], (double)x[i][2]);
    }
};

static int run_femtet(FILE* f, FILE* out) {
    int n; std::fscanf(f, "%d", &n);
    Particles pd; pd.read(f, n);
    int substeps, maxIter, steps; double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int nt; std::fscanf(f, "%d", &nt);
    std::vector<std::array<int, 4>> ti(nt);
    std::vector<Real> youngs(nt), poisson(nt), lam(nt), vol(nt);
    std::vector<Matrix3r> invRest(nt);
    for (int c = 0; c < nt; c++) {
        double e, nu;
        std::fscanf(f, "%d %d %d %d %lf %lf", &ti[c][0], &ti[c][1],
                    &ti[c][2], &ti[c][3], &e, &nu);
        youngs[c] = (Real)e; poisson[c] = (Real)nu;
        // XPBD_FEMTetConstraint::initConstraint -> init_FEMTetraConstraint
        PositionBasedDynamics::init_FEMTetraConstraint(
            pd.x[ti[c][0]], pd.x[ti[c][1]], pd.x[ti[c][2]], pd.x[ti[c][3]],
            vol[c], invRest[c]);
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (int c = 0; c < nt; c++) lam[c] = 0.0;
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < nt; c++) {
                    Vector3r& x1 = pd.x[ti[c][0]];
                    Vector3r& x2 = pd.x[ti[c][1]];
                    Vector3r& x3 = pd.x[ti[c][2]];
                    Vector3r& x4 = pd.x[ti[c][3]];
                    // dynamic inversion switch, Constraints.cpp:1869-1872
                    const Real curVol = -static_cast<Real>(1.0 / 6.0)
                        * (x4 - x1).dot((x3 - x1).cross(x2 - x1));
                    const bool handleInversion = curVol / vol[c] < 0.2;
                    Vector3r c1, c2, c3, c4;
                    if (XPBD::solve_FEMTetraConstraint(
                            x1, pd.invMass[ti[c][0]], x2, pd.invMass[ti[c][1]],
                            x3, pd.invMass[ti[c][2]], x4, pd.invMass[ti[c][3]],
                            vol[c], invRest[c], youngs[c], poisson[c],
                            handleInversion, h, lam[c], c1, c2, c3, c4)) {
                        if (pd.invMass[ti[c][0]] != 0.0) x1 += c1;
                        if (pd.invMass[ti[c][1]] != 0.0) x2 += c2;
                        if (pd.invMass[ti[c][2]] != 0.0) x3 += c3;
                        if (pd.invMass[ti[c][3]] != 0.0) x4 += c4;
                    }
                }
            pd.velocityUpdate(h);
        }
    pd.print(out);
    return 0;
}

static int run_rod(FILE* f, FILE* out) {
    int np, nq; std::fscanf(f, "%d %d", &np, &nq);
    Particles pd; pd.read(f, np);
    std::vector<Quaternionr> q(nq), oldQ(nq);
    std::vector<Vector3r> omega(nq, Vector3r::Zero());
    std::vector<Real> qmass(nq), qinvMass(nq);
    for (int i = 0; i < nq; i++) {
        double w, x_, y_, z_, m;
        std::fscanf(f, "%lf %lf %lf %lf %lf", &w, &x_, &y_, &z_, &m);
        q[i] = Quaternionr((Real)w, (Real)x_, (Real)y_, (Real)z_);
        qmass[i] = (Real)m;
        qinvMass[i] = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
    }
    int substeps, maxIter, steps; double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int ns; std::fscanf(f, "%d", &ns);
    std::vector<std::array<int, 3>> si(ns);   // p0 p1 q
    std::vector<Real> srest(ns);
    std::vector<Vector3r> sks(ns);
    for (int c = 0; c < ns; c++) {
        double r, k1, k2, k3;
        std::fscanf(f, "%d %d %d %lf %lf %lf %lf", &si[c][0], &si[c][1],
                    &si[c][2], &r, &k1, &k2, &k3);
        srest[c] = (Real)r;
        sks[c] = Vector3r((Real)k1, (Real)k2, (Real)k3);
    }
    int nb; std::fscanf(f, "%d", &nb);
    std::vector<std::array<int, 2>> bi(nb);
    std::vector<Vector3r> bks(nb);
    std::vector<Quaternionr> restDarboux(nb);
    for (int c = 0; c < nb; c++) {
        double k1, k2, k3;
        std::fscanf(f, "%d %d %lf %lf %lf", &bi[c][0], &bi[c][1],
                    &k1, &k2, &k3);
        bks[c] = Vector3r((Real)k1, (Real)k2, (Real)k3);
        // BendTwistConstraint::initConstraint (Constraints.cpp:2394-2416)
        restDarboux[c] = q[bi[c][0]].conjugate() * q[bi[c][1]];
        Quaternionr op, om;
        op.coeffs() = restDarboux[c].coeffs()
            + Quaternionr(1, 0, 0, 0).coeffs();
        om.coeffs() = restDarboux[c].coeffs()
            - Quaternionr(1, 0, 0, 0).coeffs();
        if (om.squaredNorm() > op.squaredNorm())
            restDarboux[c].coeffs() *= -1.0;
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            // orientation integration, TimeStepController.cpp:123-129
            for (int i = 0; i < nq; i++) {
                oldQ[i] = q[i];
                TimeIntegration::semiImplicitEulerRotation(
                    h, qmass[i], qmass[i] * Matrix3r::Identity(),
                    qinvMass[i] * Matrix3r::Identity(), q[i], omega[i],
                    Vector3r(0, 0, 0));
            }
            for (int it = 0; it < maxIter; it++) {
                for (int c = 0; c < ns; c++) {
                    Vector3r c1, c2; Quaternionr cq;
                    if (PositionBasedCosseratRods::solve_StretchShearConstraint(
                            pd.x[si[c][0]], pd.invMass[si[c][0]],
                            pd.x[si[c][1]], pd.invMass[si[c][1]],
                            q[si[c][2]], qinvMass[si[c][2]],
                            sks[c], srest[c], c1, c2, cq)) {
                        if (pd.invMass[si[c][0]] != 0.0) pd.x[si[c][0]] += c1;
                        if (pd.invMass[si[c][1]] != 0.0) pd.x[si[c][1]] += c2;
                        if (qinvMass[si[c][2]] != 0.0) {
                            q[si[c][2]].coeffs() += cq.coeffs();
                            q[si[c][2]].normalize();
                        }
                    }
                }
                for (int c = 0; c < nb; c++) {
                    Quaternionr c1, c2;
                    if (PositionBasedCosseratRods::solve_BendTwistConstraint(
                            q[bi[c][0]], qinvMass[bi[c][0]],
                            q[bi[c][1]], qinvMass[bi[c][1]],
                            bks[c], restDarboux[c], c1, c2)) {
                        if (qinvMass[bi[c][0]] != 0.0) {
                            q[bi[c][0]].coeffs() += c1.coeffs();
                            q[bi[c][0]].normalize();
                        }
                        if (qinvMass[bi[c][1]] != 0.0) {
                            q[bi[c][1]].coeffs() += c2.coeffs();
                            q[bi[c][1]].normalize();
                        }
                    }
                }
            }
            pd.velocityUpdate(h);
            for (int i = 0; i < nq; i++)
                TimeIntegration::angularVelocityUpdateFirstOrder(
                    h, qmass[i], q[i], oldQ[i], omega[i]);
        }
    pd.print(out);
    for (int i = 0; i < nq; i++)
        std::fprintf(out, "%.9g %.9g %.9g %.9g\n", (double)q[i].w(),
                     (double)q[i].x(), (double)q[i].y(), (double)q[i].z());
    return 0;
}

static int run_balljoint(FILE* f, FILE* out) {
    int nbod; std::fscanf(f, "%d", &nbod);
    std::vector<Vector3r> x(nbod), v(nbod, Vector3r::Zero()),
        oldX(nbod), omega(nbod, Vector3r::Zero()), inertia0(nbod);
    std::vector<Quaternionr> q(nbod), oldQ(nbod);
    std::vector<Real> mass(nbod), invMass(nbod);
    std::vector<Matrix3r> inertiaW(nbod), invInertiaW(nbod);
    for (int i = 0; i < nbod; i++) {
        double px, py, pz, qw, qx, qy, qz, m, ix, iy, iz;
        std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
                    &px, &py, &pz, &qw, &qx, &qy, &qz, &m, &ix, &iy, &iz);
        x[i] = Vector3r((Real)px, (Real)py, (Real)pz);
        q[i] = Quaternionr((Real)qw, (Real)qx, (Real)qy, (Real)qz);
        mass[i] = (Real)m;
        invMass[i] = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
        inertia0[i] = Vector3r((Real)ix, (Real)iy, (Real)iz);
    }
    auto rotationUpdated = [&](int i) {
        // RigidBody::rotationUpdated / updateInertiaW (RigidBody.h:190-207)
        if (mass[i] != 0.0) {
            const Matrix3r rot = q[i].matrix();
            inertiaW[i] = rot * inertia0[i].asDiagonal() * rot.transpose();
            Vector3r inv(1.0 / inertia0[i][0], 1.0 / inertia0[i][1],
                         1.0 / inertia0[i][2]);
            invInertiaW[i] = rot * inv.asDiagonal() * rot.transpose();
        } else {
            inertiaW[i].setZero();
            invInertiaW[i].setZero();
        }
    };
    for (int i = 0; i < nbod; i++) rotationUpdated(i);

    int substeps, maxIter, steps; double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int nj; std::fscanf(f, "%d", &nj);
    std::vector<std::array<int, 2>> ji(nj);
    std::vector<Eigen::Matrix<Real, 3, 4, Eigen::DontAlign>> jinfo(nj);
    for (int c = 0; c < nj; c++) {
        double px, py, pz;
        std::fscanf(f, "%d %d %lf %lf %lf", &ji[c][0], &ji[c][1],
                    &px, &py, &pz);
        PositionBasedRigidBodyDynamics::init_BallJoint(
            x[ji[c][0]], q[ji[c][0]], x[ji[c][1]], q[ji[c][1]],
            Vector3r((Real)px, (Real)py, (Real)pz), jinfo[c]);
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            for (int i = 0; i < nbod; i++) {
                oldX[i] = x[i];
                Vector3r acc = mass[i] != 0.0 ? GRAVITY
                                              : Vector3r::Zero();
                TimeIntegration::semiImplicitEuler(h, mass[i], x[i], v[i],
                                                   acc);
                oldQ[i] = q[i];
                TimeIntegration::semiImplicitEulerRotation(
                    h, mass[i], inertiaW[i], invInertiaW[i], q[i],
                    omega[i], Vector3r(0, 0, 0));
                rotationUpdated(i);
            }
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < nj; c++) {
                    const int b0 = ji[c][0], b1 = ji[c][1];
                    // updateConstraint then solve, TimeStepController.cpp
                    // :264-285 / BallJoint::solvePositionConstraint
                    PositionBasedRigidBodyDynamics::update_BallJoint(
                        x[b0], q[b0], x[b1], q[b1], jinfo[c]);
                    Vector3r cx0, cx1; Quaternionr cq0, cq1;
                    if (PositionBasedRigidBodyDynamics::solve_BallJoint(
                            invMass[b0], x[b0], invInertiaW[b0], q[b0],
                            invMass[b1], x[b1], invInertiaW[b1], q[b1],
                            jinfo[c], cx0, cq0, cx1, cq1)) {
                        if (mass[b0] != 0.0) {
                            x[b0] += cx0;
                            q[b0].coeffs() += cq0.coeffs();
                            q[b0].normalize();
                            rotationUpdated(b0);
                        }
                        if (mass[b1] != 0.0) {
                            x[b1] += cx1;
                            q[b1].coeffs() += cq1.coeffs();
                            q[b1].normalize();
                            rotationUpdated(b1);
                        }
                    }
                }
            for (int i = 0; i < nbod; i++) {
                TimeIntegration::velocityUpdateFirstOrder(h, mass[i], x[i],
                                                          oldX[i], v[i]);
                TimeIntegration::angularVelocityUpdateFirstOrder(
                    h, mass[i], q[i], oldQ[i], omega[i]);
            }
        }
    for (int i = 0; i < nbod; i++)
        std::fprintf(out, "%.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
                     (double)x[i][0], (double)x[i][1], (double)x[i][2],
                     (double)q[i].w(), (double)q[i].x(), (double)q[i].y(),
                     (double)q[i].z());
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 3) { std::fprintf(stderr, "usage: %s in out\n", argv[0]); return 1; }
    FILE* f = std::fopen(argv[1], "r");
    if (!f) { std::fprintf(stderr, "no input\n"); return 1; }
    char mode[32];
    std::fscanf(f, "%31s", mode);
    FILE* out = std::fopen(argv[2], "w");
    int rc = 1;
    if (!std::strcmp(mode, "femtet")) rc = run_femtet(f, out);
    else if (!std::strcmp(mode, "rod")) rc = run_rod(f, out);
    else if (!std::strcmp(mode, "balljoint")) rc = run_balljoint(f, out);
    else std::fprintf(stderr, "unknown mode %s\n", mode);
    std::fclose(f);
    std::fclose(out);
    return rc;
}
