// Parity oracle driver: steps a dumped cloth scene with the REFERENCE
// kernel implementations (compiled unmodified from /root/reference —
// XPBD.cpp, TimeIntegration.cpp, MathFunctions.cpp) so our JAX engine
// can be compared against the actual C++ reference, not a re-derivation.
//
// The loop reproduces TimeStepController::step semantics for a
// particle-only scene (TimeStepController.cpp:75-173): substeps of
// semi-implicit Euler -> positionConstraintProjection (lambda reset per
// substep, Constraints.cpp:1240-1241) -> first-order velocity update.
// Constraints are solved sequentially in dump order; the dump is sorted
// by graph color, so in-place sequential updates are equivalent to the
// engine's color-batched Gauss-Seidel mode (constraints within a color
// share no particles).
//
// Input (text, from parity/dump_scene.py):
//   N
//   x y z mass            * N
//   substeps maxIter dt steps
//   D
//   i j rest stiffness    * D        (XPBD distance)
//   B
//   i0 i1 i2 i3 stiffness * B        (XPBD isometric bending; Q from
//                                     rest positions via reference init)
// Output: particle positions (x y z per line) after `steps` steps.
#include <cstdio>
#include <vector>
#include "Common/Common.h"
#include "PositionBasedDynamics/XPBD.h"
#include "PositionBasedDynamics/TimeIntegration.h"

using namespace PBD;

int main(int argc, char** argv) {
    if (argc < 3) { std::fprintf(stderr, "usage: %s in out\n", argv[0]); return 1; }
    FILE* f = std::fopen(argv[1], "r");
    if (!f) { std::fprintf(stderr, "no input\n"); return 1; }

    int n; std::fscanf(f, "%d", &n);
    std::vector<Vector3r> x(n), v(n, Vector3r::Zero()), old(n), acc(n);
    std::vector<Real> mass(n), invMass(n);
    for (int i = 0; i < n; i++) {
        double px, py, pz, m;
        std::fscanf(f, "%lf %lf %lf %lf", &px, &py, &pz, &m);
        x[i] = Vector3r((Real)px, (Real)py, (Real)pz);
        mass[i] = (Real)m;
        invMass[i] = m != 0.0 ? (Real)(1.0 / m) : (Real)0.0;
    }
    int substeps, maxIter, steps; double dt_d;
    std::fscanf(f, "%d %d %lf %d", &substeps, &maxIter, &dt_d, &steps);
    const Real dt = (Real)dt_d;

    int nd; std::fscanf(f, "%d", &nd);
    std::vector<int> di(nd), dj(nd);
    std::vector<Real> drest(nd), dstiff(nd), dlam(nd);
    for (int c = 0; c < nd; c++) {
        double r, s;
        std::fscanf(f, "%d %d %lf %lf", &di[c], &dj[c], &r, &s);
        drest[c] = (Real)r; dstiff[c] = (Real)s;
    }
    int nb; std::fscanf(f, "%d", &nb);
    std::vector<std::array<int, 4>> bidx(nb);
    std::vector<Real> bstiff(nb), blam(nb);
    std::vector<Matrix4r> Q(nb);
    for (int c = 0; c < nb; c++) {
        double s;
        std::fscanf(f, "%d %d %d %d %lf", &bidx[c][0], &bidx[c][1],
                    &bidx[c][2], &bidx[c][3], &s);
        bstiff[c] = (Real)s;
        XPBD::init_IsometricBendingConstraint(
            x[bidx[c][0]], x[bidx[c][1]], x[bidx[c][2]], x[bidx[c][3]],
            Q[c]);
    }
    std::fclose(f);

    const Vector3r gravity(0.0, -9.81, 0.0);
    const Real h = dt / (Real)substeps;
    for (int step = 0; step < steps; step++) {
        for (int sub = 0; sub < substeps; sub++) {
            for (int i = 0; i < n; i++) {
                old[i] = x[i];
                acc[i] = gravity;
                TimeIntegration::semiImplicitEuler(h, mass[i], x[i], v[i],
                                                   acc[i]);
            }
            for (int c = 0; c < nd; c++) dlam[c] = 0.0;
            for (int c = 0; c < nb; c++) blam[c] = 0.0;
            for (int it = 0; it < maxIter; it++) {
                for (int c = 0; c < nd; c++) {
                    Vector3r c0, c1;
                    if (XPBD::solve_DistanceConstraint(
                            x[di[c]], invMass[di[c]], x[dj[c]],
                            invMass[dj[c]], drest[c], dstiff[c], h,
                            dlam[c], c0, c1)) {
                        if (invMass[di[c]] != 0.0) x[di[c]] += c0;
                        if (invMass[dj[c]] != 0.0) x[dj[c]] += c1;
                    }
                }
                for (int c = 0; c < nb; c++) {
                    Vector3r c0, c1, c2, c3;
                    if (XPBD::solve_IsometricBendingConstraint(
                            x[bidx[c][0]], invMass[bidx[c][0]],
                            x[bidx[c][1]], invMass[bidx[c][1]],
                            x[bidx[c][2]], invMass[bidx[c][2]],
                            x[bidx[c][3]], invMass[bidx[c][3]],
                            Q[c], bstiff[c], h, blam[c], c0, c1, c2, c3)) {
                        if (invMass[bidx[c][0]] != 0.0) x[bidx[c][0]] += c0;
                        if (invMass[bidx[c][1]] != 0.0) x[bidx[c][1]] += c1;
                        if (invMass[bidx[c][2]] != 0.0) x[bidx[c][2]] += c2;
                        if (invMass[bidx[c][3]] != 0.0) x[bidx[c][3]] += c3;
                    }
                }
            }
            for (int i = 0; i < n; i++)
                TimeIntegration::velocityUpdateFirstOrder(h, mass[i], x[i],
                                                          old[i], v[i]);
        }
    }

    FILE* out = std::fopen(argv[2], "w");
    for (int i = 0; i < n; i++)
        std::fprintf(out, "%.9g %.9g %.9g\n", (double)x[i][0],
                     (double)x[i][1], (double)x[i][2]);
    std::fclose(out);
    return 0;
}
