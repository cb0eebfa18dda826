// Parity oracle driver #3: the kernel families VERDICT r4 flagged as
// unproven — the rigid joint zoo with motors, the iterative
// StretchBendingTwisting rod joint, strain-based dynamics (tri + tet),
// shape matching, and particle-tet contact — stepped with the REFERENCE
// kernels compiled unmodified from /root/reference
// (PositionBasedRigidBodyDynamics.cpp:232-914,
// PositionBasedElasticRods.cpp:1136-1363,
// PositionBasedDynamics.cpp:501-958 + :1172-1340,
// TimeIntegration.cpp), reproducing TimeStepController::step semantics
// (substeps -> projection -> velocity update; velocity-level solves
// once per step with maxIterationsV passes,
// TimeStepController.cpp:75-241, 298-357).
//
// Input (text): first line mode: "joints" | "sbtrod" | "strain" |
// "shapematch" | "ptetcontact". See parity/dump_scene.py.
#include <cstdio>
#include <cstring>
#include <vector>
#include <array>
#include "Common/Common.h"
#include "PositionBasedDynamics/PositionBasedDynamics.h"
#include "PositionBasedDynamics/PositionBasedElasticRods.h"
#include "PositionBasedDynamics/PositionBasedRigidBodyDynamics.h"
#include "PositionBasedDynamics/TimeIntegration.h"

using namespace PBD;

static const Vector3r GRAVITY(0.0, -9.81, 0.0);

// ---------------------------------------------------------------------------
// rigid-body container shared by the joints/sbtrod modes
// ---------------------------------------------------------------------------

struct Bodies {
    std::vector<Vector3r> x, v, oldX, omega, inertia0;
    std::vector<Quaternionr> q, oldQ;
    std::vector<Real> mass, invMass;
    std::vector<Matrix3r> inertiaW, invInertiaW;

    void rotationUpdated(int i) {
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
    }
    void read(FILE* f, int n) {
        x.resize(n); v.assign(n, Vector3r::Zero());
        oldX.resize(n); omega.assign(n, Vector3r::Zero());
        inertia0.resize(n); q.resize(n); oldQ.resize(n);
        mass.resize(n); invMass.resize(n);
        inertiaW.resize(n); invInertiaW.resize(n);
        for (int i = 0; i < n; i++) {
            double px, py, pz, qw, qx, qy, qz, m, ix, iy, iz;
            std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
                        &px, &py, &pz, &qw, &qx, &qy, &qz, &m, &ix, &iy,
                        &iz);
            x[i] = Vector3r((Real)px, (Real)py, (Real)pz);
            q[i] = Quaternionr((Real)qw, (Real)qx, (Real)qy, (Real)qz);
            mass[i] = (Real)m;
            invMass[i] = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
            inertia0[i] = Vector3r((Real)ix, (Real)iy, (Real)iz);
            rotationUpdated(i);
        }
    }
    void integrate(Real h) {
        for (size_t i = 0; i < x.size(); i++) {
            oldX[i] = x[i];
            Vector3r acc = mass[i] != 0.0 ? GRAVITY : Vector3r::Zero();
            TimeIntegration::semiImplicitEuler(h, mass[i], x[i], v[i],
                                               acc);
            oldQ[i] = q[i];
            TimeIntegration::semiImplicitEulerRotation(
                h, mass[i], inertiaW[i], invInertiaW[i], q[i], omega[i],
                Vector3r(0, 0, 0));
            rotationUpdated(i);
        }
    }
    void velocityUpdate(Real h) {
        for (size_t i = 0; i < x.size(); i++) {
            TimeIntegration::velocityUpdateFirstOrder(h, mass[i], x[i],
                                                      oldX[i], v[i]);
            TimeIntegration::angularVelocityUpdateFirstOrder(
                h, mass[i], q[i], oldQ[i], omega[i]);
        }
    }
    void apply(int b0, int b1, const Vector3r& cx0, const Quaternionr& cq0,
               const Vector3r& cx1, const Quaternionr& cq1) {
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
    void print(FILE* out) {
        for (size_t i = 0; i < x.size(); i++)
            std::fprintf(out, "%.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
                         (double)x[i][0], (double)x[i][1], (double)x[i][2],
                         (double)q[i].w(), (double)q[i].x(),
                         (double)q[i].y(), (double)q[i].z());
    }
};

// ---------------------------------------------------------------------------
// mode "joints": hinge / universal / slider + the four motor variants
// (kinds: 0 hinge, 1 universal, 2 slider, 3 target-position motor
// slider, 4 target-velocity motor slider, 5 target-angle motor hinge,
// 6 target-velocity motor hinge)
// ---------------------------------------------------------------------------

struct Joint {
    int kind, b0, b1;
    Vector3r pos, axis0, axis1;
    Real target;
    Eigen::Matrix<Real, 4, 7, Eigen::DontAlign> hinge;
    Eigen::Matrix<Real, 3, 8, Eigen::DontAlign> universal;
    Eigen::Matrix<Real, 4, 6, Eigen::DontAlign> slider;
    Eigen::Matrix<Real, 4, 8, Eigen::DontAlign> motorHinge;
};

static int run_joints(FILE* f, FILE* out) {
    int nbod;
    std::fscanf(f, "%d", &nbod);
    Bodies rb;
    rb.read(f, nbod);
    int substeps, maxIter, maxIterV, steps;
    double dt_d;
    std::fscanf(f, "%d %d %d %lf %d", &substeps, &maxIter, &maxIterV,
                &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int nj;
    std::fscanf(f, "%d", &nj);
    std::vector<Joint> js(nj);
    for (int c = 0; c < nj; c++) {
        Joint& j = js[c];
        double px, py, pz, ax, ay, az, bx, by, bz, tg;
        std::fscanf(f, "%d %d %d %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
                    &j.kind, &j.b0, &j.b1, &px, &py, &pz, &ax, &ay, &az,
                    &bx, &by, &bz, &tg);
        j.pos = Vector3r((Real)px, (Real)py, (Real)pz);
        j.axis0 = Vector3r((Real)ax, (Real)ay, (Real)az);
        j.axis1 = Vector3r((Real)bx, (Real)by, (Real)bz);
        j.target = (Real)tg;
        const Vector3r &x0 = rb.x[j.b0], &x1 = rb.x[j.b1];
        const Quaternionr &q0 = rb.q[j.b0], &q1 = rb.q[j.b1];
        switch (j.kind) {
        case 0:
            PositionBasedRigidBodyDynamics::init_HingeJoint(
                x0, q0, x1, q1, j.pos, j.axis0, j.hinge);
            break;
        case 1:
            PositionBasedRigidBodyDynamics::init_UniversalJoint(
                x0, q0, x1, q1, j.pos, j.axis0, j.axis1, j.universal);
            break;
        case 2:
            PositionBasedRigidBodyDynamics::init_SliderJoint(
                x0, q0, x1, q1, j.axis0, j.slider);
            break;
        case 3:
            PositionBasedRigidBodyDynamics::init_TargetPositionMotorSliderJoint(
                x0, q0, x1, q1, j.axis0, j.slider);
            break;
        case 4:
            PositionBasedRigidBodyDynamics::init_TargetVelocityMotorSliderJoint(
                x0, q0, x1, q1, j.axis0, j.slider);
            break;
        case 5:
            PositionBasedRigidBodyDynamics::init_TargetAngleMotorHingeJoint(
                x0, q0, x1, q1, j.pos, j.axis0, j.motorHinge);
            break;
        case 6:
            PositionBasedRigidBodyDynamics::init_TargetVelocityMotorHingeJoint(
                x0, q0, x1, q1, j.pos, j.axis0, j.motorHinge);
            break;
        }
    }

    auto updateJoint = [&](Joint& j) {
        const Vector3r &x0 = rb.x[j.b0], &x1 = rb.x[j.b1];
        const Quaternionr &q0 = rb.q[j.b0], &q1 = rb.q[j.b1];
        switch (j.kind) {
        case 0:
            PositionBasedRigidBodyDynamics::update_HingeJoint(
                x0, q0, x1, q1, j.hinge);
            break;
        case 1:
            PositionBasedRigidBodyDynamics::update_UniversalJoint(
                x0, q0, x1, q1, j.universal);
            break;
        case 2:
            PositionBasedRigidBodyDynamics::update_SliderJoint(
                x0, q0, x1, q1, j.slider);
            break;
        case 3:
            PositionBasedRigidBodyDynamics::update_TargetPositionMotorSliderJoint(
                x0, q0, x1, q1, j.slider);
            break;
        case 4:
            PositionBasedRigidBodyDynamics::update_TargetVelocityMotorSliderJoint(
                x0, q0, x1, q1, j.slider);
            break;
        case 5:
            PositionBasedRigidBodyDynamics::update_TargetAngleMotorHingeJoint(
                x0, q0, x1, q1, j.motorHinge);
            break;
        case 6:
            PositionBasedRigidBodyDynamics::update_TargetVelocityMotorHingeJoint(
                x0, q0, x1, q1, j.motorHinge);
            break;
        }
    };

    for (int step = 0; step < steps; step++) {
        for (int sub = 0; sub < substeps; sub++) {
            rb.integrate(h);
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < nj; c++) {
                    Joint& j = js[c];
                    updateJoint(j);
                    const int b0 = j.b0, b1 = j.b1;
                    Vector3r cx0, cx1;
                    Quaternionr cq0, cq1;
                    bool res = false;
                    switch (j.kind) {
                    case 0:
                        res = PositionBasedRigidBodyDynamics::solve_HingeJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.hinge,
                            cx0, cq0, cx1, cq1);
                        break;
                    case 1:
                        res = PositionBasedRigidBodyDynamics::solve_UniversalJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.universal,
                            cx0, cq0, cx1, cq1);
                        break;
                    case 2:
                        res = PositionBasedRigidBodyDynamics::solve_SliderJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.slider,
                            cx0, cq0, cx1, cq1);
                        break;
                    case 3:
                        res = PositionBasedRigidBodyDynamics::solve_TargetPositionMotorSliderJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.target,
                            j.slider, cx0, cq0, cx1, cq1);
                        break;
                    case 4:
                        res = PositionBasedRigidBodyDynamics::solve_TargetVelocityMotorSliderJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.slider,
                            cx0, cq0, cx1, cq1);
                        break;
                    case 5:
                        res = PositionBasedRigidBodyDynamics::solve_TargetAngleMotorHingeJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.target,
                            j.motorHinge, cx0, cq0, cx1, cq1);
                        break;
                    case 6:
                        res = PositionBasedRigidBodyDynamics::solve_TargetVelocityMotorHingeJoint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], j.motorHinge,
                            cx0, cq0, cx1, cq1);
                        break;
                    }
                    if (res) rb.apply(b0, b1, cx0, cq0, cx1, cq1);
                }
            rb.velocityUpdate(h);
        }
        // velocity-level motor solves once per STEP, maxIterationsV
        // passes (TimeStepController.cpp:298-357)
        for (int c = 0; c < nj; c++) updateJoint(js[c]);
        for (int it = 0; it < maxIterV; it++)
            for (int c = 0; c < nj; c++) {
                Joint& j = js[c];
                if (j.kind != 4 && j.kind != 6) continue;
                const int b0 = j.b0, b1 = j.b1;
                Vector3r cv0, com0, cv1, com1;
                bool res = false;
                if (j.kind == 4)
                    res = PositionBasedRigidBodyDynamics::velocitySolve_TargetVelocityMotorSliderJoint(
                        rb.invMass[b0], rb.x[b0], rb.v[b0],
                        rb.invInertiaW[b0], rb.q[b0], rb.omega[b0],
                        rb.invMass[b1], rb.x[b1], rb.v[b1],
                        rb.invInertiaW[b1], rb.q[b1], rb.omega[b1],
                        j.target, j.slider, cv0, com0, cv1, com1);
                else
                    res = PositionBasedRigidBodyDynamics::velocitySolve_TargetVelocityMotorHingeJoint(
                        rb.invMass[b0], rb.x[b0], rb.v[b0],
                        rb.invInertiaW[b0], rb.omega[b0],
                        rb.invMass[b1], rb.x[b1], rb.v[b1],
                        rb.invInertiaW[b1], rb.omega[b1],
                        j.target, j.motorHinge, cv0, com0, cv1, com1);
                if (res) {
                    if (rb.mass[b0] != 0.0) {
                        rb.v[b0] += cv0;
                        rb.omega[b0] += com0;
                    }
                    if (rb.mass[b1] != 0.0) {
                        rb.v[b1] += cv1;
                        rb.omega[b1] += com1;
                    }
                }
            }
    }
    rb.print(out);
    return 0;
}

// ---------------------------------------------------------------------------
// mode "sbtrod": iterative StretchBendingTwisting joints along a chain
// of rigid rod segments (Constraints.cpp:2461-2550 semantics)
// ---------------------------------------------------------------------------

static int run_sbtrod(FILE* f, FILE* out) {
    int nbod;
    std::fscanf(f, "%d", &nbod);
    Bodies rb;
    rb.read(f, nbod);
    int substeps, maxIter, steps;
    double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int nc;
    std::fscanf(f, "%d", &nc);
    std::vector<std::array<int, 2>> ci(nc);
    std::vector<Eigen::Matrix<Real, 3, 4, Eigen::DontAlign>> info(nc);
    std::vector<Vector3r> stiffK(nc), restDarboux(nc);
    std::vector<Real> segLen(nc);
    std::vector<Vector3r> strC(nc), btC(nc);
    std::vector<Vector6r> lamSum(nc);
    for (int c = 0; c < nc; c++) {
        double px, py, pz, rad, len, ym, tm;
        std::fscanf(f, "%d %d %lf %lf %lf %lf %lf %lf %lf", &ci[c][0],
                    &ci[c][1], &px, &py, &pz, &rad, &len, &ym, &tm);
        segLen[c] = (Real)len;
        DirectPositionBasedSolverForStiffRods::init_StretchBendingTwistingConstraint(
            rb.x[ci[c][0]], rb.q[ci[c][0]], rb.x[ci[c][1]], rb.q[ci[c][1]],
            Vector3r((Real)px, (Real)py, (Real)pz), (Real)rad, (Real)len,
            (Real)ym, (Real)tm, info[c], stiffK[c], restDarboux[c]);
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            rb.integrate(h);
            // initConstraintBeforeProjection zeroes λ-sum per substep
            // with the SUBSTEP dt (Constraints.cpp:2496)
            for (int c = 0; c < nc; c++)
                DirectPositionBasedSolverForStiffRods::initBeforeProjection_StretchBendingTwistingConstraint(
                    stiffK[c], (Real)1.0 / h, segLen[c], strC[c], btC[c],
                    lamSum[c]);
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < nc; c++) {
                    const int b0 = ci[c][0], b1 = ci[c][1];
                    DirectPositionBasedSolverForStiffRods::update_StretchBendingTwistingConstraint(
                        rb.x[b0], rb.q[b0], rb.x[b1], rb.q[b1], info[c]);
                    Vector3r cx0, cx1;
                    Quaternionr cq0, cq1;
                    if (DirectPositionBasedSolverForStiffRods::solve_StretchBendingTwistingConstraint(
                            rb.invMass[b0], rb.x[b0], rb.invInertiaW[b0],
                            rb.q[b0], rb.invMass[b1], rb.x[b1],
                            rb.invInertiaW[b1], rb.q[b1], restDarboux[c],
                            segLen[c], strC[c], btC[c], info[c],
                            cx0, cq0, cx1, cq1, lamSum[c]))
                        rb.apply(b0, b1, cx0, cq0, cx1, cq1);
                }
            rb.velocityUpdate(h);
        }
    rb.print(out);
    return 0;
}

// ---------------------------------------------------------------------------
// particles container for the strain / shapematch / ptetcontact modes
// ---------------------------------------------------------------------------

struct Particles {
    std::vector<Vector3r> x, v, old, acc;
    std::vector<Real> mass, invMass;
    void read(FILE* f, int n) {
        x.resize(n);
        v.assign(n, Vector3r::Zero());
        old.resize(n);
        acc.resize(n);
        mass.resize(n);
        invMass.resize(n);
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

// mode "strain": strain-based dynamics triangles + tets
// (StrainTriangleConstraint / StrainTetConstraint solve semantics,
// Constraints.cpp; kernels PositionBasedDynamics.cpp:598-958)
static int run_strain(FILE* f, FILE* out) {
    int n;
    std::fscanf(f, "%d", &n);
    Particles pd;
    pd.read(f, n);
    int substeps, maxIter, steps;
    double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int ntri;
    std::fscanf(f, "%d", &ntri);
    std::vector<std::array<int, 3>> tri(ntri);
    std::vector<Matrix2r> invRest2(ntri);
    std::vector<std::array<Real, 3>> triK(ntri);  // xx yy xy
    for (int c = 0; c < ntri; c++) {
        double kxx, kyy, kxy;
        std::fscanf(f, "%d %d %d %lf %lf %lf", &tri[c][0], &tri[c][1],
                    &tri[c][2], &kxx, &kyy, &kxy);
        triK[c] = {(Real)kxx, (Real)kyy, (Real)kxy};
        PositionBasedDynamics::init_StrainTriangleConstraint(
            pd.x[tri[c][0]], pd.x[tri[c][1]], pd.x[tri[c][2]],
            invRest2[c]);
    }
    int ntet;
    std::fscanf(f, "%d", &ntet);
    std::vector<std::array<int, 4>> tet(ntet);
    std::vector<Matrix3r> invRest3(ntet);
    std::vector<Vector3r> stretchK(ntet), shearK(ntet);
    for (int c = 0; c < ntet; c++) {
        double sx, sy, sz, hx, hy, hz;
        std::fscanf(f, "%d %d %d %d %lf %lf %lf %lf %lf %lf", &tet[c][0],
                    &tet[c][1], &tet[c][2], &tet[c][3], &sx, &sy, &sz,
                    &hx, &hy, &hz);
        stretchK[c] = Vector3r((Real)sx, (Real)sy, (Real)sz);
        shearK[c] = Vector3r((Real)hx, (Real)hy, (Real)hz);
        PositionBasedDynamics::init_StrainTetraConstraint(
            pd.x[tet[c][0]], pd.x[tet[c][1]], pd.x[tet[c][2]],
            pd.x[tet[c][3]], invRest3[c]);
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (int it = 0; it < maxIter; it++) {
                for (int c = 0; c < ntri; c++) {
                    Vector3r c1, c2, c3;
                    if (PositionBasedDynamics::solve_StrainTriangleConstraint(
                            pd.x[tri[c][0]], pd.invMass[tri[c][0]],
                            pd.x[tri[c][1]], pd.invMass[tri[c][1]],
                            pd.x[tri[c][2]], pd.invMass[tri[c][2]],
                            invRest2[c], triK[c][0], triK[c][1],
                            triK[c][2], false, false, c1, c2, c3)) {
                        if (pd.invMass[tri[c][0]] != 0.0) pd.x[tri[c][0]] += c1;
                        if (pd.invMass[tri[c][1]] != 0.0) pd.x[tri[c][1]] += c2;
                        if (pd.invMass[tri[c][2]] != 0.0) pd.x[tri[c][2]] += c3;
                    }
                }
                for (int c = 0; c < ntet; c++) {
                    Vector3r c1, c2, c3, c4;
                    if (PositionBasedDynamics::solve_StrainTetraConstraint(
                            pd.x[tet[c][0]], pd.invMass[tet[c][0]],
                            pd.x[tet[c][1]], pd.invMass[tet[c][1]],
                            pd.x[tet[c][2]], pd.invMass[tet[c][2]],
                            pd.x[tet[c][3]], pd.invMass[tet[c][3]],
                            invRest3[c], stretchK[c], shearK[c],
                            false, false, c1, c2, c3, c4)) {
                        if (pd.invMass[tet[c][0]] != 0.0) pd.x[tet[c][0]] += c1;
                        if (pd.invMass[tet[c][1]] != 0.0) pd.x[tet[c][1]] += c2;
                        if (pd.invMass[tet[c][2]] != 0.0) pd.x[tet[c][2]] += c3;
                        if (pd.invMass[tet[c][3]] != 0.0) pd.x[tet[c][3]] += c4;
                    }
                }
            }
            pd.velocityUpdate(h);
        }
    pd.print(out);
    return 0;
}

// mode "shapematch": shape-matching clusters with the 1/numClusters
// division (ShapeMatchingConstraint::solvePositionConstraint)
static int run_shapematch(FILE* f, FILE* out) {
    int n;
    std::fscanf(f, "%d", &n);
    Particles pd;
    pd.read(f, n);
    int substeps, maxIter, steps;
    double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real h = (Real)dt_d / (Real)substeps;

    int ncl;
    std::fscanf(f, "%d", &ncl);
    std::vector<std::vector<int>> cluster(ncl);
    std::vector<std::vector<Vector3r>> x0s(ncl);
    std::vector<Vector3r> restCm(ncl);
    std::vector<Real> stiff(ncl);
    std::vector<int> numClusters(n, 0);
    for (int c = 0; c < ncl; c++) {
        int sz;
        double st;
        std::fscanf(f, "%d %lf", &sz, &st);
        stiff[c] = (Real)st;
        cluster[c].resize(sz);
        for (int i = 0; i < sz; i++) {
            std::fscanf(f, "%d", &cluster[c][i]);
            numClusters[cluster[c][i]]++;
        }
        x0s[c].resize(sz);
        std::vector<Real> w(sz);
        for (int i = 0; i < sz; i++) {
            x0s[c][i] = pd.x[cluster[c][i]];
            w[i] = pd.invMass[cluster[c][i]];
        }
        PositionBasedDynamics::init_ShapeMatchingConstraint(
            x0s[c].data(), w.data(), sz, restCm[c]);
    }

    for (int step = 0; step < steps; step++)
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (int it = 0; it < maxIter; it++)
                for (int c = 0; c < ncl; c++) {
                    const int sz = (int)cluster[c].size();
                    std::vector<Vector3r> xs(sz), corr(sz);
                    std::vector<Real> w(sz);
                    for (int i = 0; i < sz; i++) {
                        xs[i] = pd.x[cluster[c][i]];
                        w[i] = pd.invMass[cluster[c][i]];
                    }
                    if (PositionBasedDynamics::solve_ShapeMatchingConstraint(
                            x0s[c].data(), xs.data(), w.data(), sz,
                            restCm[c], stiff[c], false, corr.data())) {
                        for (int i = 0; i < sz; i++)
                            if (w[i] != 0.0)
                                pd.x[cluster[c][i]] +=
                                    ((Real)1.0 / numClusters[cluster[c][i]])
                                    * corr[i];
                    }
                }
            pd.velocityUpdate(h);
        }
    pd.print(out);
    return 0;
}

// mode "ptetcontact": one particle vs one tet, contact inputs (ref-tet
// bary of the surface contact point + normal, as the engine's detection
// produces them) read from the dump — asserting the solve /
// velocity-solve kernels and the frozen-m_x / persisted-λ semantics
// (Constraints.cpp:550, TimeStepController.cpp:288-291) with identical
// detection inputs. Contact info re-initialized once per STEP from the
// current state.
static int run_ptetcontact(FILE* f, FILE* out) {
    int n;
    std::fscanf(f, "%d", &n);
    Particles pd;
    pd.read(f, n);
    int substeps, maxIter, maxIterV, steps;
    double dt_d, fric;
    std::fscanf(f, "%d %d %d %lf %d %lf", &substeps, &maxIter, &maxIterV,
                &dt_d, &steps, &fric);
    const Real h = (Real)dt_d / (Real)substeps;
    int pidx, t0, t1, t2, t3;
    double nx, ny, nz, b1, b2, b3;
    std::fscanf(f, "%d %d %d %d %d %lf %lf %lf %lf %lf %lf", &pidx, &t0,
                &t1, &t2, &t3, &nx, &ny, &nz, &b1, &b2, &b3);
    const int ti[4] = {t0, t1, t2, t3};

    Eigen::Matrix<Real, 3, 3, Eigen::DontAlign> cinfo;
    const Vector3r bary((Real)b1, (Real)b2, (Real)b3);
    Real lambda = 0.0;
    std::array<Vector3r, 4> mx;   // frozen tet verts (m_x)
    std::array<Real, 4> minv;

    for (int step = 0; step < steps; step++) {
        {
            std::array<Vector3r, 4> mv;
            for (int i = 0; i < 4; i++) {
                mx[i] = pd.x[ti[i]];
                mv[i] = pd.v[ti[i]];
                minv[i] = pd.invMass[ti[i]];
            }
            PositionBasedDynamics::init_ParticleTetContactConstraint(
                pd.invMass[pidx], pd.x[pidx], pd.v[pidx],
                minv.data(), mx.data(), mv.data(), bary,
                Vector3r((Real)nx, (Real)ny, (Real)nz), cinfo);
        }
        for (int sub = 0; sub < substeps; sub++) {
            pd.integrate(h);
            for (int it = 0; it < maxIter; it++)
                {
                    Vector3r corr0;
                    Vector3r corr[4];
                    if (PositionBasedDynamics::solve_ParticleTetContactConstraint(
                            pd.invMass[pidx], pd.x[pidx], minv.data(),
                            mx.data(), bary, cinfo, lambda, corr0,
                            corr)) {
                        if (pd.invMass[pidx] != 0.0) pd.x[pidx] += corr0;
                        for (int i = 0; i < 4; i++)
                            if (minv[i] != 0.0) pd.x[ti[i]] += corr[i];
                    }
                }
            pd.velocityUpdate(h);
        }
        for (int it = 0; it < maxIterV; it++) {
                std::array<Vector3r, 4> xs, vs;
                for (int i = 0; i < 4; i++) {
                    xs[i] = pd.x[ti[i]];
                    vs[i] = pd.v[ti[i]];
                }
                Vector3r cv0;
                Vector3r cv[4];
                if (PositionBasedDynamics::velocitySolve_ParticleTetContactConstraint(
                        pd.invMass[pidx], pd.x[pidx], pd.v[pidx],
                        minv.data(), xs.data(), vs.data(), bary, lambda,
                        (Real)fric, cinfo, cv0, cv)) {
                    if (pd.invMass[pidx] != 0.0) pd.v[pidx] += cv0;
                    for (int i = 0; i < 4; i++)
                        if (minv[i] != 0.0) pd.v[ti[i]] += cv[i];
                }
            }
    }
    pd.print(out);
    for (size_t i = 0; i < pd.v.size(); i++)
        std::fprintf(out, "%.9g %.9g %.9g\n", (double)pd.v[i][0],
                     (double)pd.v[i][1], (double)pd.v[i][2]);
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s in out\n", argv[0]);
        return 1;
    }
    FILE* f = std::fopen(argv[1], "r");
    if (!f) return 2;
    FILE* out = std::fopen(argv[2], "w");
    if (!out) return 3;
    char mode[32];
    std::fscanf(f, "%31s", mode);
    int rc = 4;
    if (!std::strcmp(mode, "joints")) rc = run_joints(f, out);
    else if (!std::strcmp(mode, "sbtrod")) rc = run_sbtrod(f, out);
    else if (!std::strcmp(mode, "strain")) rc = run_strain(f, out);
    else if (!std::strcmp(mode, "shapematch")) rc = run_shapematch(f, out);
    else if (!std::strcmp(mode, "ptetcontact")) rc = run_ptetcontact(f, out);
    std::fclose(f);
    std::fclose(out);
    return rc;
}
