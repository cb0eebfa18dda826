"""Rod-lattice fast path vs the unstructured rod batches — identical
Jacobi semantics, plane-stencil implementation."""
import numpy as np

import jax

from positionbaseddynamics_tpu.models import SceneBuilder
from positionbaseddynamics_tpu.solver import StepConfig, rollout


def _build(structured, n_rods=3, n=12):
    b = SceneBuilder(use_structured_grid=structured)
    for r in range(n_rods):
        pts = np.stack([np.linspace(0.0, 1.0, n),
                        np.full(n, 0.1 * r), np.zeros(n)], 1)
        lm = b.add_line_model(pts)
        b.set_mass(lm.offset, 0.0)
        b.set_quaternion_mass(lm.offset_q, 0.0)
        b.add_rod_constraints(lm, stretch_stiffness=(1.0, 1.0, 1.0),
                              bend_twist_stiffness=(0.5, 0.5, 0.5))
    return b.build()


def test_rod_lattice_matches_unstructured():
    state_l, cset_l = _build(True)
    state_u, cset_u = _build(False)
    assert cset_l.rod_lattices, "lattice fast path not engaged"
    assert cset_u.stretch_shear is not None

    cfg = StepConfig(dt=0.005, substeps=5, max_iterations=1)
    fl, _ = jax.jit(lambda s: rollout(s, cset_l, cfg, 30))(state_l)
    fu, _ = jax.jit(lambda s: rollout(s, cset_u, cfg, 30))(state_u)
    xl = np.asarray(fl.particles.x)
    xu = np.asarray(fu.particles.x)
    assert np.isfinite(xl).all()
    # the rods actually sagged
    assert np.abs(xl - np.asarray(state_l.particles.x)).max() > 1e-3
    np.testing.assert_allclose(xl, xu, atol=2e-5)
    ql = np.asarray(fl.orientations.q)
    qu = np.asarray(fu.orientations.q)
    qdev = np.minimum(np.abs(ql - qu), np.abs(ql + qu)).max()
    assert qdev < 2e-5


def test_rod_lattice_falls_back_on_nonuniform():
    """Anisotropic stretch stiffness must fall back to the unstructured
    batches (the lattice requires isotropy for the material-frame
    stiffness identity)."""
    b = SceneBuilder()
    for r in range(2):
        pts = np.stack([np.linspace(0.0, 1.0, 8),
                        np.full(8, 0.1 * r), np.zeros(8)], 1)
        lm = b.add_line_model(pts)
        b.add_rod_constraints(lm, stretch_stiffness=(1.0, 0.5, 1.0))
    state, cset = b.build()
    assert not cset.rod_lattices
    assert cset.stretch_shear is not None
