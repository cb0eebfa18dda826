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

// ---------------------------------------------------------------------------
// Contact oracle (BASELINE configs 4-5 class).
//
// The reference's Simulation layer cannot be compiled standalone (its
// GenericParameters external is not in the tree), so the narrow phase
// below re-implements DistanceFieldCollisionDetection's analytic-SDF
// semantics line-for-line from the cited sources:
//  - box distance: DistanceFieldCollisionBox::distance
//    (DistanceFieldCollisionDetection.cpp:598-605), double precision,
//    tolerance subtracted inside;
//  - sphere: the SPECIALIZED DistanceFieldCollisionSphere::collisionTest
//    (cp = (r+tol)*n exact normal, :614-631);
//  - generic collisionTest: central-difference approximateNormal with
//    eps=1e-6 in double, cp = x - dist*n (:684-728);
//  - world<->local transform with identity main-axis/initial transform:
//    x_l = R^T (x_w - com), n_w = R n_l (updateInverseTransformation,
//    RigidBody.h:172-188);
//  - pair dispatch: ordered pairs (i,k), i!=k, testMesh(i), skip if both
//    static; restitution = product, friction = sum
//    (DistanceFieldCollisionDetection.cpp:100-175);
//  - contact ordering: pair-major, vertex-major (the BVH traversal
//    order of the reference is an acceleration permutation of this).
// The contact CONSTRAINT math is the compiled reference:
// init_/velocitySolve_RigidBodyContactConstraint and the particle
// variants (PositionBasedRigidBodyDynamics.cpp:2221-2560), driven with
// TimeStepController::step semantics (substeps -> CD once per step ->
// maxIterationsV sequential velocity sweeps, TimeStepController.cpp:
// 75-241, 296-360) and SimulationModel contact stiffness defaults
// (SimulationModel.cpp:56-57).
// ---------------------------------------------------------------------------

struct ShapeSpec {
    int type;        // 1 = box (half extents), 2 = sphere (radius)
    double p[3];

    double distance(const Eigen::Vector3d& x, double tolerance) const {
        if (type == 1) {
            const Eigen::Vector3d d(std::fabs(x.x()) - p[0],
                                    std::fabs(x.y()) - p[1],
                                    std::fabs(x.z()) - p[2]);
            const Eigen::Vector3d max_d(std::max(d.x(), 0.0),
                                        std::max(d.y(), 0.0),
                                        std::max(d.z(), 0.0));
            return std::min(std::max(d.x(), std::max(d.y(), d.z())), 0.0)
                + max_d.norm() - tolerance;
        }
        return x.norm() - p[0] - tolerance;
    }

    void approximateNormal(const Eigen::Vector3d& x, double tolerance,
                           Vector3r& n) const {
        const double eps = 1.e-6;
        n.setZero();
        Eigen::Vector3d xTmp = x;
        for (unsigned int j = 0; j < 3; j++) {
            xTmp[j] += eps;
            const double e_p = distance(xTmp, tolerance);
            xTmp[j] = x[j] - eps;
            const double e_m = distance(xTmp, tolerance);
            xTmp[j] = x[j];
            n[j] = (Real)((e_p - e_m) * (1.0 / (2.0 * eps)));
        }
        const Real norm2 = n.squaredNorm();
        if (norm2 < 1.e-6) n.setZero();
        else n = n / std::sqrt(norm2);
    }

    bool collisionTest(const Vector3r& x, Real tolerance, Vector3r& cp,
                       Vector3r& n, Real& dist) const {
        if (type == 2) {
            // DistanceFieldCollisionSphere::collisionTest specialization
            const Real dl = x.norm();
            dist = dl - (Real)p[0] - tolerance;
            if (dist < 0.0) {
                if (dl < 1.e-6) n.setZero();
                else n = x / dl;
                cp = ((Real)p[0] + tolerance) * n;
                return true;
            }
            return false;
        }
        dist = (Real)distance(x.template cast<double>(), (double)tolerance);
        if (dist < 0.0) {
            approximateNormal(x.template cast<double>(), (double)tolerance, n);
            cp = x - dist * n;
            return true;
        }
        return false;
    }
};

struct ContactBody {
    Vector3r x, v, omega, oldX, inertia0;
    Quaternionr q, oldQ;
    Real mass, invMass, restitution, friction;
    int testMesh;
    ShapeSpec shape;
    std::vector<Vector3r> verts;   // body-frame surface samples
    Matrix3r inertiaW, invInertiaW;

    void rotationUpdated() {
        if (mass != 0.0) {
            const Matrix3r rot = q.matrix();
            inertiaW = rot * inertia0.asDiagonal() * rot.transpose();
            Vector3r inv(1.0 / inertia0[0], 1.0 / inertia0[1],
                         1.0 / inertia0[2]);
            invInertiaW = rot * inv.asDiagonal() * rot.transpose();
        } else {
            inertiaW.setZero();
            invInertiaW.setZero();
        }
    }
};

static void read_contact_bodies(FILE* f, std::vector<ContactBody>& bodies) {
    int nbod; std::fscanf(f, "%d", &nbod);
    bodies.resize(nbod);
    for (int i = 0; i < nbod; i++) {
        ContactBody& b = bodies[i];
        double px, py, pz, qw, qx, qy, qz, vx, vy, vz, wx, wy, wz;
        double m, ix, iy, iz, rest, fric, s0, s1, s2;
        int nverts;
        std::fscanf(f,
            "%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
            "%lf %lf %lf %lf %lf %lf %d %d %lf %lf %lf %d",
            &px, &py, &pz, &qw, &qx, &qy, &qz, &vx, &vy, &vz,
            &wx, &wy, &wz, &m, &ix, &iy, &iz, &rest, &fric,
            &b.testMesh, &b.shape.type, &s0, &s1, &s2, &nverts);
        b.x = Vector3r((Real)px, (Real)py, (Real)pz);
        b.q = Quaternionr((Real)qw, (Real)qx, (Real)qy, (Real)qz);
        b.v = Vector3r((Real)vx, (Real)vy, (Real)vz);
        b.omega = Vector3r((Real)wx, (Real)wy, (Real)wz);
        b.mass = (Real)m;
        b.invMass = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
        b.inertia0 = Vector3r((Real)ix, (Real)iy, (Real)iz);
        b.restitution = (Real)rest;
        b.friction = (Real)fric;
        b.shape.p[0] = s0; b.shape.p[1] = s1; b.shape.p[2] = s2;
        b.verts.resize(nverts);
        for (int k = 0; k < nverts; k++) {
            double ax, ay, az;
            std::fscanf(f, "%lf %lf %lf", &ax, &ay, &az);
            b.verts[k] = Vector3r((Real)ax, (Real)ay, (Real)az);
        }
        b.rotationUpdated();
    }
}

struct RbContact {
    int b0, b1;
    Real sumImpulses, friction;
    Eigen::Matrix<Real, 3, 5, Eigen::DontAlign> info;
};

// rb-rb narrow phase for one ordered pair (brute force over body0's
// vertex cloud; collisionDetectionRigidBodies semantics)
static void narrow_rb_pair(const ContactBody& b0, int i0,
                           const ContactBody& b1, int i1, Real tolerance,
                           std::vector<RbContact>& out) {
    if (b0.mass == 0.0 && b1.mass == 0.0) return;
    const Matrix3r R1t = b1.q.matrix().transpose();   // world -> local
    const Real rest = b0.restitution * b1.restitution;
    const Real fric = b0.friction + b1.friction;
    const Matrix3r R0 = b0.q.matrix();
    for (size_t k = 0; k < b0.verts.size(); k++) {
        const Vector3r x_w = R0 * b0.verts[k] + b0.x;
        const Vector3r x_l = R1t * (x_w - b1.x);
        Vector3r cp, n; Real dist;
        if (b1.shape.collisionTest(x_l, tolerance, cp, n, dist)) {
            const Vector3r cp_w = b1.q.matrix() * cp + b1.x;
            const Vector3r n_w = b1.q.matrix() * n;
            RbContact c;
            c.b0 = i0; c.b1 = i1;
            c.sumImpulses = 0.0;
            c.friction = fric;
            PositionBasedRigidBodyDynamics::init_RigidBodyContactConstraint(
                b0.invMass, b0.x, b0.v, b0.invInertiaW, b0.q, b0.omega,
                b1.invMass, b1.x, b1.v, b1.invInertiaW, b1.q, b1.omega,
                x_w, cp_w, n_w, rest, c.info);
            out.push_back(c);
        }
    }
}

static int run_rbcontact(FILE* f, FILE* out) {
    std::vector<ContactBody> bodies;
    read_contact_bodies(f, bodies);
    int substeps, maxIter, maxIterV, steps; double dt_d, tol_d, stiff_d;
    std::fscanf(f, "%d %d %d %lf %d %lf %lf", &substeps, &maxIter,
                &maxIterV, &dt_d, &steps, &tol_d, &stiff_d);
    const Real h = (Real)dt_d / (Real)substeps;
    const Real tol = (Real)tol_d;
    const Real stiffness = (Real)stiff_d;

    for (int step = 0; step < steps; step++) {
        for (int sub = 0; sub < substeps; sub++) {
            for (auto& b : bodies) {
                b.oldX = b.x;
                Vector3r acc = b.mass != 0.0 ? GRAVITY : Vector3r::Zero();
                TimeIntegration::semiImplicitEuler(h, b.mass, b.x, b.v, acc);
                b.oldQ = b.q;
                TimeIntegration::semiImplicitEulerRotation(
                    h, b.mass, b.inertiaW, b.invInertiaW, b.q, b.omega,
                    Vector3r(0, 0, 0));
                b.rotationUpdated();
            }
            // (no position constraints in this mode)
            for (auto& b : bodies) {
                TimeIntegration::velocityUpdateFirstOrder(h, b.mass, b.x,
                                                          b.oldX, b.v);
                TimeIntegration::angularVelocityUpdateFirstOrder(
                    h, b.mass, b.q, b.oldQ, b.omega);
            }
        }
        // collision detection once per step (TimeStepController.cpp:189)
        std::vector<RbContact> contacts;
        for (size_t i = 0; i < bodies.size(); i++)
            for (size_t k = 0; k < bodies.size(); k++)
                if (i != k && bodies[i].testMesh)
                    narrow_rb_pair(bodies[i], (int)i, bodies[k], (int)k,
                                   tol, contacts);
        // velocity solve: maxIterationsV sequential sweeps
        for (int it = 0; it < maxIterV; it++)
            for (auto& c : contacts) {
                ContactBody& b0 = bodies[c.b0];
                ContactBody& b1 = bodies[c.b1];
                Vector3r cv0, com0, cv1, com1;
                if (PositionBasedRigidBodyDynamics::
                        velocitySolve_RigidBodyContactConstraint(
                            b0.invMass, b0.x, b0.v, b0.invInertiaW, b0.omega,
                            b1.invMass, b1.x, b1.v, b1.invInertiaW, b1.omega,
                            stiffness, c.friction, c.sumImpulses, c.info,
                            cv0, com0, cv1, com1)) {
                    if (b0.mass != 0.0) { b0.v += cv0; b0.omega += com0; }
                    if (b1.mass != 0.0) { b1.v += cv1; b1.omega += com1; }
                }
            }
    }
    for (auto& b : bodies)
        std::fprintf(out,
            "%.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g "
            "%.9g %.9g %.9g\n",
            (double)b.x[0], (double)b.x[1], (double)b.x[2],
            (double)b.q.w(), (double)b.q.x(), (double)b.q.y(),
            (double)b.q.z(), (double)b.v[0], (double)b.v[1],
            (double)b.v[2], (double)b.omega[0], (double)b.omega[1],
            (double)b.omega[2]);
    return 0;
}

struct PrbContact {
    int pi, b1;
    Real sumImpulses, friction;
    Eigen::Matrix<Real, 3, 5, Eigen::DontAlign> info;
};

static int run_clothcontact(FILE* f, FILE* out) {
    int n; std::fscanf(f, "%d", &n);
    Particles pd; pd.read(f, n);
    int nd; std::fscanf(f, "%d", &nd);
    std::vector<std::array<int, 2>> di(nd);
    std::vector<Real> rest(nd), stiff(nd), lam(nd);
    for (int c = 0; c < nd; c++) {
        double r, s;
        std::fscanf(f, "%d %d %lf %lf", &di[c][0], &di[c][1], &r, &s);
        rest[c] = (Real)r; stiff[c] = (Real)s;
    }
    std::vector<ContactBody> bodies;
    read_contact_bodies(f, bodies);
    double grest_d, gfric_d;
    std::fscanf(f, "%lf %lf", &grest_d, &gfric_d);
    const Real grest = (Real)grest_d, gfric = (Real)gfric_d;
    int substeps, maxIter, maxIterV, steps; double dt_d, tol_d, stiff_d;
    std::fscanf(f, "%d %d %d %lf %d %lf %lf", &substeps, &maxIter,
                &maxIterV, &dt_d, &steps, &tol_d, &stiff_d);
    const Real h = (Real)dt_d / (Real)substeps;
    const Real tol = (Real)tol_d;
    const Real cstiff = (Real)stiff_d;

    for (int step = 0; step < steps; step++) {
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (auto& b : bodies) {
                b.oldX = b.x;
                Vector3r acc = b.mass != 0.0 ? GRAVITY : Vector3r::Zero();
                TimeIntegration::semiImplicitEuler(h, b.mass, b.x, b.v, acc);
                b.oldQ = b.q;
                TimeIntegration::semiImplicitEulerRotation(
                    h, b.mass, b.inertiaW, b.invInertiaW, b.q, b.omega,
                    Vector3r(0, 0, 0));
                b.rotationUpdated();
            }
            for (int c = 0; c < nd; c++) lam[c] = 0.0;  // iter==0 reset
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < nd; c++) {
                    Vector3r corr1, corr2;
                    if (XPBD::solve_DistanceConstraint(
                            pd.x[di[c][0]], pd.invMass[di[c][0]],
                            pd.x[di[c][1]], pd.invMass[di[c][1]],
                            rest[c], stiff[c], h, lam[c], corr1, corr2)) {
                        if (pd.invMass[di[c][0]] != 0.0)
                            pd.x[di[c][0]] += corr1;
                        if (pd.invMass[di[c][1]] != 0.0)
                            pd.x[di[c][1]] += corr2;
                    }
                }
            pd.velocityUpdate(h);
            for (auto& b : bodies) {
                TimeIntegration::velocityUpdateFirstOrder(h, b.mass, b.x,
                                                          b.oldX, b.v);
                TimeIntegration::angularVelocityUpdateFirstOrder(
                    h, b.mass, b.q, b.oldQ, b.omega);
            }
        }
        // CD: every particle vs every rigid SDF
        // (collisionDetectionRBSolid, body order then particle order)
        std::vector<PrbContact> contacts;
        for (size_t bi = 0; bi < bodies.size(); bi++) {
            ContactBody& b1 = bodies[bi];
            const Matrix3r R1t = b1.q.matrix().transpose();
            const Real restC = grest * b1.restitution;
            const Real fricC = gfric + b1.friction;
            for (int p = 0; p < n; p++) {
                const Vector3r x_l = R1t * (pd.x[p] - b1.x);
                Vector3r cp, nrm; Real dist;
                if (b1.shape.collisionTest(x_l, tol, cp, nrm, dist)) {
                    const Vector3r cp_w = b1.q.matrix() * cp + b1.x;
                    const Vector3r n_w = b1.q.matrix() * nrm;
                    PrbContact c;
                    c.pi = p; c.b1 = (int)bi;
                    c.sumImpulses = 0.0; c.friction = fricC;
                    PositionBasedRigidBodyDynamics::
                        init_ParticleRigidBodyContactConstraint(
                            pd.invMass[p], pd.x[p], pd.v[p],
                            b1.invMass, b1.x, b1.v, b1.invInertiaW, b1.q,
                            b1.omega, pd.x[p], cp_w, n_w, restC, c.info);
                    contacts.push_back(c);
                }
            }
        }
        for (int it = 0; it < maxIterV; it++)
            for (auto& c : contacts) {
                ContactBody& b1 = bodies[c.b1];
                Vector3r cv0, cv1, com1;
                if (PositionBasedRigidBodyDynamics::
                        velocitySolve_ParticleRigidBodyContactConstraint(
                            pd.invMass[c.pi], pd.x[c.pi], pd.v[c.pi],
                            b1.invMass, b1.x, b1.v, b1.invInertiaW, b1.omega,
                            cstiff, c.friction, c.sumImpulses, c.info,
                            cv0, cv1, com1)) {
                    if (pd.invMass[c.pi] != 0.0) pd.v[c.pi] += cv0;
                    if (b1.mass != 0.0) { b1.v += cv1; b1.omega += com1; }
                }
            }
    }
    for (int i = 0; i < n; i++)
        std::fprintf(out, "%.9g %.9g %.9g %.9g %.9g %.9g\n",
                     (double)pd.x[i][0], (double)pd.x[i][1],
                     (double)pd.x[i][2], (double)pd.v[i][0],
                     (double)pd.v[i][1], (double)pd.v[i][2]);
    return 0;
}

// ---------------------------------------------------------------------------
// PBF fluid kernel oracle: density / lambda / density-constraint
// correction from the compiled reference (PositionBasedFluids.cpp:8-141,
// SPHKernels.cpp CubicKernel) over DUMPED neighborhoods — kernel-level
// parity for fluids/model.py (neighbor sets supplied by the dump so the
// spatial-hash implementations need not agree on candidate order).
//
// Input: "fluid", then: n_fluid n_boundary support_radius density0
//   n_fluid lines:    x y z mass
//   n_boundary lines: x y z psi
//   per fluid particle: numNeighbors then indices (>= n_fluid =
//   boundary particle index - n_fluid)
// Output per particle: density lambda corr_x corr_y corr_z
// ---------------------------------------------------------------------------
#include "PositionBasedDynamics/PositionBasedFluids.h"
#include "PositionBasedDynamics/SPHKernels.h"

static int run_fluid(FILE* f, FILE* out) {
    int nf, nb; double support_d, rho0_d;
    std::fscanf(f, "%d %d %lf %lf", &nf, &nb, &support_d, &rho0_d);
    CubicKernel::setRadius((Real)support_d);
    const Real rho0 = (Real)rho0_d;
    std::vector<Vector3r> x(nf), bx(nb);
    std::vector<Real> mass(nf), psi(nb);
    for (int i = 0; i < nf; i++) {
        double a, b, c, m;
        std::fscanf(f, "%lf %lf %lf %lf", &a, &b, &c, &m);
        x[i] = Vector3r((Real)a, (Real)b, (Real)c);
        mass[i] = (Real)m;
    }
    for (int i = 0; i < nb; i++) {
        double a, b, c, p;
        std::fscanf(f, "%lf %lf %lf %lf", &a, &b, &c, &p);
        bx[i] = Vector3r((Real)a, (Real)b, (Real)c);
        psi[i] = (Real)p;
    }
    std::vector<std::vector<unsigned int>> nbrs(nf);
    for (int i = 0; i < nf; i++) {
        int k; std::fscanf(f, "%d", &k);
        nbrs[i].resize(k);
        for (int j = 0; j < k; j++) {
            int v; std::fscanf(f, "%d", &v);
            nbrs[i][j] = (unsigned int)v;
        }
    }
    std::vector<Real> density(nf), lambda(nf);
    for (int i = 0; i < nf; i++) {
        Real err;
        PositionBasedFluids::computePBFDensity(
            i, nf, x.data(), mass.data(), bx.data(), psi.data(),
            (unsigned int)nbrs[i].size(), nbrs[i].data(), rho0, true,
            err, density[i]);
        PositionBasedFluids::computePBFLagrangeMultiplier(
            i, nf, x.data(), mass.data(), bx.data(), psi.data(),
            density[i], (unsigned int)nbrs[i].size(), nbrs[i].data(),
            rho0, true, lambda[i]);
    }
    for (int i = 0; i < nf; i++) {
        Vector3r corr;
        PositionBasedFluids::solveDensityConstraint(
            i, nf, x.data(), mass.data(), bx.data(), psi.data(),
            (unsigned int)nbrs[i].size(), nbrs[i].data(), rho0, true,
            lambda.data(), corr);
        std::fprintf(out, "%.9g %.9g %.9g %.9g %.9g\n",
                     (double)density[i], (double)lambda[i],
                     (double)corr[0], (double)corr[1], (double)corr[2]);
    }
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
    else if (!std::strcmp(mode, "rbcontact")) rc = run_rbcontact(f, out);
    else if (!std::strcmp(mode, "clothcontact")) rc = run_clothcontact(f, out);
    else if (!std::strcmp(mode, "fluid")) rc = run_fluid(f, out);
    else std::fprintf(stderr, "unknown mode %s\n", mode);
    std::fclose(f);
    std::fclose(out);
    return rc;
}
