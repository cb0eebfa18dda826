"""Batched rigid-body joints — the TPU-native replacement for the
reference's joint constraint classes (``Simulation/Constraints.cpp:83-1220``:
BallJoint, BallOnLineJoint, HingeJoint, UniversalJoint, SliderJoint, the four
motor joints, RigidBodyParticleBallJoint, DistanceJoint/RigidBodySpring,
DamperJoint).

One :class:`JointBatch` holds all joints of one kind as struct-of-arrays.
Local connector frames and rotational projections ``Pr`` are precomputed at
build time (the ``init_X`` phase of the reference,
``PositionBasedRigidBodyDynamics.cpp``); world-space quantities are
recomputed inside the solve from the current body transforms (fusing the
reference's ``update_X`` phase into the solve — free under XLA). The solve
itself is the generic masked 6-row kernel of ``ops/rigidbody.py`` vmapped
over the batch.

Motor targets are *functions of simulation time*: the reference updates
``MotorJoint::setTarget`` from a (time,value) sequence at the END of each
step using the already-incremented time (``TimeStepController.cpp:200-236``),
which is equivalent to evaluating the sequence at the START of the next
step — so ``current_target(time)`` stays pure.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat, rigidbody as rb
from ..utils import npquat
from .coloring import greedy_color

Array = jax.Array

POSITION_KINDS = (
    "ball", "ball_on_line", "hinge", "universal", "slider",
    "target_position_motor_slider", "target_velocity_motor_slider",
    "target_angle_motor_hinge", "target_velocity_motor_hinge",
    "distance", "damper", "rb_particle_ball",
    "stretch_bending_twisting",
)
VELOCITY_KINDS = ("target_velocity_motor_slider", "target_velocity_motor_hinge")


def _register(cls):
    data, meta = [], []
    for f in dataclasses.fields(cls):
        (meta if f.metadata.get("static") else data).append(f.name)
    return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)


def _rows6(rows, alphas=None, active=None):
    """Pad a list of ≤6 rows ``(c, l0, a0, l1, a1)`` to the fixed 6-row
    layout. Returns ``(c6, l0, a0, l1, a1, alpha6, active6)``."""
    n = len(rows)
    z3 = jnp.zeros((3,), jnp.float32)
    z = jnp.zeros((), jnp.float32)
    rows = list(rows) + [(z, z3, z3, z3, z3)] * (6 - n)
    c = jnp.stack([r[0] for r in rows])
    l0 = jnp.stack([r[1] for r in rows])
    a0 = jnp.stack([r[2] for r in rows])
    l1 = jnp.stack([r[3] for r in rows])
    a1 = jnp.stack([r[4] for r in rows])
    if alphas is None:
        alpha = jnp.zeros((6,), jnp.float32)
    else:
        alpha = jnp.stack(list(alphas) + [z] * (6 - len(alphas)))
    if active is None:
        act = jnp.asarray([1.0] * n + [0.0] * (6 - n), jnp.float32)
    else:
        act = jnp.stack(
            [jnp.asarray(a, jnp.float32) for a in active]
            + [z] * (6 - len(active))
        )
    return c, l0, a0, l1, a1, alpha, act


_EYE3 = jnp.eye(3, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Per-kind row preparation (single joint; vmapped by JointBatch.solve_*)
# Each returns (c, l0, a0, l1, a1, alpha, active[, ka0, ka1]).
# ---------------------------------------------------------------------------


def _connectors(local0, local1, x0, q0, x1, q1):
    c0 = quat.rotate(q0, local0) + x0
    c1 = quat.rotate(q1, local1) + x1
    return c0, c1


def _prep_ball(d, x0, q0, x1, q1, dt, target):
    """``solve_BallJoint`` (`PositionBasedRigidBodyDynamics.cpp:212-262`)."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    rows = [(diff[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    return _rows6(rows)


def _prep_ball_on_line(d, x0, q0, x1, q1, dt, target):
    """``solve_BallOnLineJoint`` (`:501-560`): connector 0 slides along the
    line; constraint acts only in the two normal directions."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    dirw = quat.rotate(q0, d["aux0"])
    n1w = quat.rotate(q0, d["aux1"])
    n2w = jnp.cross(dirw, n1w)
    c0p = c0 + dirw * jnp.dot(c1 - c0, dirw)  # closest point on line
    r0, r1 = c0p - x0, c1 - x1
    rows = [
        (jnp.dot(n, c0p - c1),) + rb.pos_row(n, r0, r1) for n in (n1w, n2w)
    ]
    return _rows6(rows)


def _prep_hinge(d, x0, q0, x1, q1, dt, target):
    """``solve_HingeJoint`` (`:565-690`): 3 positional + 2 rotational rows
    via the precomputed projection ``Pr (2,4)``."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    rows = [(diff[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    c_rot, t = rb.rotational_rows(d["pr"], q0, q1)
    rows += [(c_rot[i],) + rb.rot_row(t[i]) for i in range(d["pr"].shape[0])]
    return _rows6(rows)


def _prep_universal(d, x0, q0, x1, q1, dt, target):
    """``solve_UniversalJoint`` (`:868-975`): 3 positional rows + one
    angular row along ``u = axis0 × axis1`` with ``C = axis0·axis1``."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    z3 = jnp.zeros((3,), jnp.float32)
    axis0 = quat.rotate(q0, d["aux0"])
    axis1 = quat.rotate(q1, d["aux1"])
    u = jnp.cross(axis0, axis1)
    rows = [(diff[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    rows.append((jnp.dot(axis0, axis1), z3, u, z3, -u))
    return _rows6(rows)


def _prep_slider(d, x0, q0, x1, q1, dt, target):
    """``solve_SliderJoint`` (`:1049-1150`): 2 positional rows in the plane
    ⟂ slider axis (COM-based, no arms) + 3 rotational rows."""
    qr0w = quat.multiply(q0, d["frame_q"])
    r0m = quat.to_matrix(qr0w)
    rows = []
    for i in (1, 2):
        p = r0m[:, i]
        rows.append(
            (jnp.dot(p, x0 - x1) - d["aux0"][i - 1],) + rb.pos_row_com(p)
        )
    c_rot, t = rb.rotational_rows(d["pr"], q0, q1)
    rows += [(c_rot[i],) + rb.rot_row(t[i]) for i in range(3)]
    return _rows6(rows)


def _prep_target_position_motor_slider(d, x0, q0, x1, q1, dt, target):
    """``solve_TargetPositionMotorSliderJoint`` (`:1225-1331`): full 3D
    COM-difference rows with the motor target offset along the axis."""
    axis = quat.rotate(q0, d["aux0"])
    cvec = (x0 - x1) - d["aux1"] + target * axis
    rows = [(cvec[i],) + rb.pos_row_com(_EYE3[i]) for i in range(3)]
    c_rot, t = rb.rotational_rows(d["pr"], q0, q1)
    rows += [(c_rot[i],) + rb.rot_row(t[i]) for i in range(3)]
    return _rows6(rows)


def _prep_target_angle_motor_hinge(d, x0, q0, x1, q1, dt, target):
    """``solve_TargetAngleMotorHingeJoint`` (`:1579-1708`): hinge rows with
    a 3-row rotational projection whose first row is driven to
    ``sin(target/2)``."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    rows = [(diff[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    c_rot, t = rb.rotational_rows(d["pr"], q0, q1)
    c_rot = c_rot.at[0].add(-jnp.sin(0.5 * target))
    rows += [(c_rot[i],) + rb.rot_row(t[i]) for i in range(3)]
    return _rows6(rows)


def _prep_distance(d, x0, q0, x1, q1, dt, target):
    """``solve_DistanceJoint`` (`:320-430`) — also the RigidBodySpring when
    ``stiffness > 0`` (XPBD compliance row with persistent λ)."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    length = jnp.linalg.norm(diff)
    valid = length > 1e-5
    direction = diff / jnp.maximum(length, 1e-5)
    stiff = d["stiffness"]
    alpha0 = jnp.where(stiff != 0.0, 1.0 / jnp.maximum(stiff * dt * dt, 1e-30), 0.0)
    rows = [(length - d["rest"],) + rb.pos_row(direction, r0, r1)]
    return _rows6(rows, alphas=[alpha0], active=[valid])


def _prep_damper(d, x0, q0, x1, q1, dt, target):
    """``solve_DamperJoint`` (`:2030-2126`): slider-frame translation rows
    + 3 rotational rows; XPBD compliance on the slider-axis row only."""
    qr0w = quat.multiply(q0, d["frame_q"])
    r0m = quat.to_matrix(qr0w)
    cvec = r0m.T @ (x0 - x1) - d["aux0"]
    rows = [(cvec[i],) + rb.pos_row_com(r0m[:, i]) for i in range(3)]
    c_rot, t = rb.rotational_rows(d["pr"], q0, q1)
    rows += [(c_rot[i],) + rb.rot_row(t[i]) for i in range(3)]
    stiff = d["stiffness"]
    alpha0 = jnp.where(stiff != 0.0, 1.0 / jnp.maximum(stiff * dt * dt, 1e-30), 0.0)
    return _rows6(rows, alphas=[alpha0])


def _prep_rb_particle_ball(d, x0, q0, x1, q1, dt, target):
    """``solve_RigidBodyParticleBallJoint`` (`:2128-2216`): rigid connector
    pinned to a particle (q1 unused — particle has no rotation)."""
    c0 = quat.rotate(q0, d["local0"]) + x0
    r0 = c0 - x0
    diff = c0 - x1
    z3 = jnp.zeros((3,), jnp.float32)
    rows = [
        (diff[i], _EYE3[i], jnp.cross(r0, _EYE3[i]), -_EYE3[i], z3)
        for i in range(3)
    ]
    return _rows6(rows)


def darboux_omega(q0, q1, length):
    """Darboux vector ``ω = (2/L) vec(q̄0 ⊗ q1)``
    (``computeDarbouxVector``, ``PositionBasedElasticRods.cpp:636-641``)."""
    return 2.0 / length * quat.multiply(quat.conjugate(q0), q1)[1:4]


def darboux_jacobian1(q0, q1, length):
    """World-frame angular Jacobian of the Darboux vector w.r.t. body 1:
    ``J1 θ = (1/L) vec(q̄0 ⊗ (0,θ) ⊗ q1)`` (from ``δq1 = ½(0,θ)⊗q1``);
    the body-0 Jacobian is its negative. Equivalent to the reference's
    ``jOmega·G`` products (``computeBendingAndTorsionJacobians`` +
    ``computeMatrixG``, ``PositionBasedElasticRods.cpp:643-670``), built
    here by basis application so no component-order convention leaks in."""
    q0c = quat.conjugate(q0)

    def col(e):
        return quat.multiply(q0c, quat.multiply(quat.from_vec(e), q1)
                             )[1:4] / length

    return jnp.stack([col(_EYE3[k]) for k in range(3)], axis=1)  # (3, 3)


def _prep_stretch_bending_twisting(d, x0, q0, x1, q1, dt, target):
    """``solve_StretchBendingTwistingConstraint``
    (``PositionBasedElasticRods.cpp:1228-1363``): 3 zero-stretch rows at
    the shared connector + 3 Darboux bend/twist rows, solved as one 6×6
    XPBD system with a persistent 6-vector λ-sum. Compliances follow
    ``initBeforeProjection_StretchBendingTwistingConstraint``
    (``:1176-1205``): stretch α = 1e-10/dt², bend/twist α =
    1/(K dt² L)."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    diff = c0 - c1
    length = d["rest"]                      # average segment length
    omega = darboux_omega(q0, q1, length)
    j1 = darboux_jacobian1(q0, q1, length)
    bend_c = omega - d["rest3"]
    z3 = jnp.zeros((3,), jnp.float32)
    rows = [(diff[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    rows += [(bend_c[i], z3, -j1[i], z3, j1[i]) for i in range(3)]
    inv_dt2 = 1.0 / (dt * dt)
    s_alpha = 1.0e-10 * inv_dt2
    b_alpha = inv_dt2 / (d["stiffness3"] * length)
    alphas = [s_alpha, s_alpha, s_alpha, b_alpha[0], b_alpha[1], b_alpha[2]]
    return _rows6(rows, alphas=alphas)


_PREPARE = {
    "ball": _prep_ball,
    "ball_on_line": _prep_ball_on_line,
    "hinge": _prep_hinge,
    "universal": _prep_universal,
    "slider": _prep_slider,
    "target_position_motor_slider": _prep_target_position_motor_slider,
    "target_velocity_motor_slider": _prep_slider,   # position part == slider
    "target_angle_motor_hinge": _prep_target_angle_motor_hinge,
    "target_velocity_motor_hinge": _prep_hinge,     # position part == hinge
    "distance": _prep_distance,
    "damper": _prep_damper,
    "rb_particle_ball": _prep_rb_particle_ball,
    "stretch_bending_twisting": _prep_stretch_bending_twisting,
}


def _prep_vel_motor_slider(d, x0, q0, v0, om0, x1, q1, v1, om1, target):
    """``velocitySolve_TargetVelocityMotorSliderJoint`` (`:1380-1460`):
    drives relative COM velocity to ``target·axis`` and relative ω to zero.
    NOTE the reference assembles the angular K block from ``t = −Pr(...)``
    but applies the impulse with identity angular rows — mirrored via the
    ``k_a`` override of :func:`ops.rigidbody.solve_rows`."""
    qr0w = quat.multiply(q0, d["frame_q"])
    axis = quat.to_matrix(qr0w)[:, 0]
    cv = (v0 - v1) + target * axis
    dom = om0 - om1
    z3 = jnp.zeros((3,), jnp.float32)
    rows = [(cv[i],) + rb.pos_row_com(_EYE3[i]) for i in range(3)]
    rows += [(dom[i], z3, _EYE3[i], z3, -_EYE3[i]) for i in range(3)]
    c, l0, a0, l1, a1, alpha, act = _rows6(rows)
    _, t = rb.rotational_rows(d["pr"], q0, q1)
    ka0 = jnp.concatenate([jnp.zeros((3, 3), jnp.float32), t], axis=0)
    return c, l0, a0, l1, a1, alpha, act, ka0, -ka0


def _prep_vel_motor_hinge(d, x0, q0, v0, om0, x1, q1, v1, om1, target):
    """``velocitySolve_TargetVelocityMotorHingeJoint`` (`:1852-1962`):
    drives relative connector velocity to zero and relative ω to
    ``−target·axis`` (C = Δω + target·axis)."""
    c0, c1 = _connectors(d["local0"], d["local1"], x0, q0, x1, q1)
    r0, r1 = c0 - x0, c1 - x1
    axis = quat.rotate(q0, d["aux0"])
    cv = v0 - v1
    dom = (om0 - om1) + target * axis
    z3 = jnp.zeros((3,), jnp.float32)
    rows = [(cv[i],) + rb.pos_row(_EYE3[i], r0, r1) for i in range(3)]
    rows += [(dom[i], z3, _EYE3[i], z3, -_EYE3[i]) for i in range(3)]
    c, l0, a0, l1, a1, alpha, act = _rows6(rows)
    return c, l0, a0, l1, a1, alpha, act, a0, a1


_PREPARE_VEL = {
    "target_velocity_motor_slider": _prep_vel_motor_slider,
    "target_velocity_motor_hinge": _prep_vel_motor_hinge,
}


# ---------------------------------------------------------------------------
# The batch
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class JointBatch:
    """All joints of one ``kind`` (struct-of-arrays). ``bodies (C,2)`` holds
    rigid-body indices — except for kind ``rb_particle_ball`` where column 1
    is a *particle* index."""

    bodies: Array                         # (C, 2) int32
    color: Array                          # (C,) int32
    kind: str = field(metadata=dict(static=True))
    num_colors: int = field(metadata=dict(static=True))
    local0: Optional[Array] = None        # (C, 3)
    local1: Optional[Array] = None        # (C, 3)
    aux0: Optional[Array] = None          # (C, 3)
    aux1: Optional[Array] = None          # (C, 3)
    frame_q: Optional[Array] = None       # (C, 4)
    pr: Optional[Array] = None            # (C, p, 4)
    rest: Optional[Array] = None          # (C,)
    rest3: Optional[Array] = None         # (C, 3) e.g. rest Darboux vector
    stiffness: Optional[Array] = None     # (C,)
    stiffness3: Optional[Array] = None    # (C, 3) e.g. SBT K coefficients
    target: Optional[Array] = None        # (C,)
    seq_times: Optional[Array] = None     # (C, S)
    seq_values: Optional[Array] = None    # (C, S)
    seq_repeat: Optional[Array] = None    # (C,) bool

    @property
    def n(self) -> int:
        return self.bodies.shape[0]

    @property
    def couples_particles(self) -> bool:
        return self.kind == "rb_particle_ball"

    @property
    def has_velocity_solve(self) -> bool:
        return self.kind in VELOCITY_KINDS

    def init_lambda(self) -> Array:
        """Per-joint 6-row λ-sum, zeroed before each projection —
        ``initConstraintBeforeProjection`` semantics
        (``Constraints.cpp:2496``). Scalar-λ kinds use row 0; rows whose
        compliance is zero ignore their λ entry entirely."""
        return jnp.zeros((self.n, 6), jnp.float32)

    def current_target(self, time) -> Array:
        """Motor target at ``time`` — static target or linear interpolation
        of the (time, value) sequence with optional wrap-around
        (``TimeStepController.cpp:200-236`` semantics)."""
        if self.target is None:
            return jnp.zeros((self.n,), jnp.float32)
        if self.seq_times is None:
            return self.target

        def interp(times, values, rep):
            duration = times[-1] - times[0]
            t = jnp.where(
                rep & (duration > 0.0),
                times[0] + jnp.mod(time - times[0], jnp.maximum(duration, 1e-30)),
                time,
            )
            return jnp.interp(t, times, values)

        return jax.vmap(interp)(self.seq_times, self.seq_values, self.seq_repeat)

    def _data(self):
        d = {}
        for name in ("local0", "local1", "aux0", "aux1", "frame_q", "pr",
                     "rest", "rest3", "stiffness", "stiffness3"):
            v = getattr(self, name)
            if v is not None:
                d[name] = v
        return d

    def _gather(self, x, q, w, iw, px, pw):
        b0 = self.bodies[:, 0]
        b1 = self.bodies[:, 1]
        x0, q0, w0, iw0 = x[b0], q[b0], w[b0], iw[b0]
        if self.couples_particles:
            x1 = px[b1]
            q1 = jnp.broadcast_to(
                jnp.asarray([1.0, 0, 0, 0], jnp.float32), q0.shape)
            w1 = pw[b1]
            iw1 = jnp.zeros_like(iw0)
        else:
            x1, q1, w1, iw1 = x[b1], q[b1], w[b1], iw[b1]
        return (x0, q0, w0, iw0), (x1, q1, w1, iw1)

    def solve_position(self, x, q, w, iw, time, dt, lam,
                       px=None, pw=None):
        """Batched position-level solve. Returns
        ``(corr_x (C,2,3), corr_q (C,2,4), new_lam (C,))``; for
        ``rb_particle_ball`` column 1 of ``corr_x`` is the particle
        correction and column 1 of ``corr_q`` is zero."""
        (x0, q0, w0, iw0), (x1, q1, w1, iw1) = self._gather(x, q, w, iw, px, pw)
        target = self.current_target(time)
        prep = _PREPARE[self.kind]
        data = self._data()

        def one(d, x0, q0, w0, iw0, x1, q1, w1, iw1, tgt, lam_j):
            out = prep(d, x0, q0, x1, q1, dt, tgt)
            c, l0, a0, l1, a1, alpha, act = out[:7]
            dlam, dx0, ot0, dx1, ot1 = rb.solve_rows(
                c, l0, a0, l1, a1, w0, iw0, w1, iw1, alpha, lam_j, act > 0.5
            )
            dq0 = rb.rotation_correction(ot0, q0)
            dq1 = rb.rotation_correction(ot1, q1)
            return dx0, dq0, dx1, dq1, lam_j + dlam

        dx0, dq0, dx1, dq1, new_lam = jax.vmap(one)(
            data, x0, q0, w0, iw0, x1, q1, w1, iw1, target, lam
        )
        if self.couples_particles:
            dq1 = jnp.zeros_like(dq1)
        corr_x = jnp.stack([dx0, dx1], axis=1)
        corr_q = jnp.stack([dq0, dq1], axis=1)
        return corr_x, corr_q, new_lam

    def solve_velocity(self, x, q, v, omega, w, iw, time):
        """Batched velocity-level motor solve. Returns
        ``(corr_v (C,2,3), corr_omega (C,2,3))``."""
        (x0, q0, w0, iw0), (x1, q1, w1, iw1) = self._gather(
            x, q, w, iw, None, None)
        b0, b1 = self.bodies[:, 0], self.bodies[:, 1]
        v0, om0 = v[b0], omega[b0]
        v1, om1 = v[b1], omega[b1]
        target = self.current_target(time)
        prep = _PREPARE_VEL[self.kind]
        data = self._data()

        def one(d, x0, q0, v0, om0, w0, iw0, x1, q1, v1, om1, w1, iw1, tgt):
            c, l0, a0, l1, a1, alpha, act, ka0, ka1 = prep(
                d, x0, q0, v0, om0, x1, q1, v1, om1, tgt)
            _, dv0, dom0, dv1, dom1 = rb.solve_rows(
                c, l0, a0, l1, a1, w0, iw0, w1, iw1, alpha,
                jnp.zeros((6,), jnp.float32), act > 0.5, k_a0=ka0, k_a1=ka1,
            )
            return dv0, dom0, dv1, dom1

        dv0, dom0, dv1, dom1 = jax.vmap(one)(
            data, x0, q0, v0, om0, w0, iw0, x1, q1, v1, om1, w1, iw1, target
        )
        return jnp.stack([dv0, dv1], axis=1), jnp.stack([dom0, dom1], axis=1)


# ---------------------------------------------------------------------------
# Build-time factories (numpy float64, mirroring the init_X functions)
# ---------------------------------------------------------------------------


def _f32(a):
    return jnp.asarray(np.asarray(a, np.float32))


def _color(bodies: np.ndarray, conflict_ids: np.ndarray):
    color, n = greedy_color(conflict_ids)
    return jnp.asarray(color), n


def _local_connectors(x0, q0, x1, q1, pos):
    """Local connector coordinates of a common world anchor
    (``init_BallJoint``, ``PositionBasedRigidBodyDynamics.cpp:160-185``)."""
    l0 = npquat.rotate(npquat.conjugate(q0), pos - x0)
    l1 = npquat.rotate(npquat.conjugate(q1), pos - x1)
    return l0, l1


def make_joint_batch(kind: str, bodies, conflict_ids, x, q, *,
                     positions=None, positions1=None, directions=None,
                     directions1=None, stiffness=None, rest=None,
                     target=None, seq_times=None, seq_values=None,
                     seq_repeat=None, particle_x=None) -> JointBatch:
    """Create a :class:`JointBatch` of ``kind`` from world-space anchors.

    ``bodies (C,2)`` body indices (column 1 = particle index for
    ``rb_particle_ball``); ``x (R,3)``, ``q (R,4)`` initial body states;
    ``positions``/``directions`` world anchors/axes per joint as required
    by the kind. All precomputation mirrors the reference ``init_X``
    functions (cited on each branch below).
    """
    bodies = np.asarray(bodies, np.int32).reshape(-1, 2)
    c = bodies.shape[0]
    x = np.asarray(x, np.float64)
    q = np.asarray(q, np.float64)
    x0, q0 = x[bodies[:, 0]], q[bodies[:, 0]]
    if kind == "rb_particle_ball":
        x1 = np.asarray(particle_x, np.float64)[bodies[:, 1]]
        q1 = np.broadcast_to(np.array([1.0, 0, 0, 0]), q0.shape)
    else:
        x1, q1 = x[bodies[:, 1]], q[bodies[:, 1]]
    color, num_colors = _color(bodies, conflict_ids)
    kw = dict(bodies=jnp.asarray(bodies), color=color, kind=kind,
              num_colors=num_colors)

    def norm(v):
        v = np.asarray(v, np.float64).reshape(c, 3)
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-300)

    if kind in ("ball", "hinge", "universal", "target_angle_motor_hinge",
                "target_velocity_motor_hinge"):
        pos = np.asarray(positions, np.float64).reshape(c, 3)
        l0, l1 = _local_connectors(x0, q0, x1, q1, pos)
        kw["local0"], kw["local1"] = _f32(l0), _f32(l1)

    if kind == "ball_on_line":
        # init_BallOnLineJoint (:432-463): local connectors + local frame
        pos = np.asarray(positions, np.float64).reshape(c, 3)
        l0, l1 = _local_connectors(x0, q0, x1, q1, pos)
        d = norm(directions)
        frames = npquat.orthonormal_basis(d)     # columns dir, n1, n2
        r0t = npquat.to_matrix(npquat.conjugate(q0))
        kw["local0"], kw["local1"] = _f32(l0), _f32(l1)
        kw["aux0"] = _f32(np.einsum("cij,cj->ci", r0t, frames[..., 0]))
        kw["aux1"] = _f32(np.einsum("cij,cj->ci", r0t, frames[..., 1]))
    elif kind in ("hinge", "target_velocity_motor_hinge"):
        d = norm(directions)
        kw["pr"] = _f32(np.stack([
            npquat.rotational_projection(q0[i], q1[i], d[i], 2)
            for i in range(c)
        ]))
        if kind == "target_velocity_motor_hinge":
            r0t = npquat.to_matrix(npquat.conjugate(q0))
            kw["aux0"] = _f32(np.einsum("cij,cj->ci", r0t, d))
    elif kind == "target_angle_motor_hinge":
        d = norm(directions)
        kw["pr"] = _f32(np.stack([
            npquat.rotational_projection(q0[i], q1[i], d[i], 3)
            for i in range(c)
        ]))
    elif kind == "universal":
        # init_UniversalJoint (:793-846): both axes stored body-local
        d0, d1 = norm(directions), norm(directions1)
        r0t = npquat.to_matrix(npquat.conjugate(q0))
        r1t = npquat.to_matrix(npquat.conjugate(q1))
        kw["aux0"] = _f32(np.einsum("cij,cj->ci", r0t, d0))
        kw["aux1"] = _f32(np.einsum("cij,cj->ci", r1t, d1))
    elif kind in ("slider", "target_velocity_motor_slider", "damper"):
        # init_SliderJoint (:977-1024) / init_DamperJoint (:1966-2014):
        # local frame quaternion + rest offset in the frame + Pr(3,4)
        d = norm(directions)
        frames = npquat.orthonormal_basis(d)
        qr0 = npquat.from_matrix(frames)
        kw["frame_q"] = _f32(npquat.multiply(npquat.conjugate(q0), qr0))
        if kind == "damper":
            kw["aux0"] = _f32(np.einsum(
                "cji,cj->ci", frames, x0 - x1))   # R0ᵀ (x0−x1), 3D
        else:
            dvec = np.einsum("cji,cj->ci", frames, x0 - x1)  # R0ᵀ (x0−x1)
            kw["aux0"] = _f32(np.concatenate(
                [dvec[:, 1:3], np.zeros((c, 1))], axis=1))   # P(x0−x1), 2D
        kw["pr"] = _f32(np.stack([
            npquat.rotational_projection(q0[i], q1[i], d[i], 3)
            for i in range(c)
        ]))
    elif kind == "target_position_motor_slider":
        # init_TargetPositionMotorSliderJoint (:1155-1202)
        d = norm(directions)
        r0t = npquat.to_matrix(npquat.conjugate(q0))
        kw["aux0"] = _f32(np.einsum("cij,cj->ci", r0t, d))
        kw["aux1"] = _f32(x0 - x1)
        kw["pr"] = _f32(np.stack([
            npquat.rotational_projection(q0[i], q1[i], d[i], 3)
            for i in range(c)
        ]))
    elif kind == "distance":
        # init_DistanceJoint (:267-294): separate anchors per body
        p0 = np.asarray(positions, np.float64).reshape(c, 3)
        p1 = np.asarray(positions1, np.float64).reshape(c, 3)
        kw["local0"] = _f32(npquat.rotate(npquat.conjugate(q0), p0 - x0))
        kw["local1"] = _f32(npquat.rotate(npquat.conjugate(q1), p1 - x1))
        kw["rest"] = _f32(np.broadcast_to(
            np.asarray(rest if rest is not None
                       else np.linalg.norm(p0 - p1, axis=-1)), (c,)))
        kw["stiffness"] = _f32(np.broadcast_to(
            np.asarray(0.0 if stiffness is None else stiffness), (c,)))
    elif kind == "rb_particle_ball":
        # init_RigidBodyParticleBallJoint (:2128-2146)
        kw["local0"] = _f32(npquat.rotate(npquat.conjugate(q0), x1 - x0))
    elif kind == "stretch_bending_twisting":
        # init_StretchBendingTwistingConstraint
        # (PositionBasedElasticRods.cpp:1136-1174): local connectors at the
        # shared constraint position; K = (EI, 2GI, EI) with I = π/4 r⁴;
        # rest Darboux from the initial orientations. Here ``positions`` is
        # the constraint position, ``rest`` = average segment length,
        # ``directions`` packs (radius, youngs, torsion) per joint.
        pos = np.asarray(positions, np.float64).reshape(c, 3)
        l0, l1 = _local_connectors(x0, q0, x1, q1, pos)
        kw["local0"], kw["local1"] = _f32(l0), _f32(l1)
        seg_len = np.broadcast_to(np.asarray(rest, np.float64), (c,))
        kw["rest"] = _f32(seg_len)
        params = np.asarray(directions, np.float64).reshape(c, 3)
        second_moment = np.pi / 4.0 * params[:, 0] ** 4
        bend_k = params[:, 1] * second_moment
        twist_k = 2.0 * params[:, 2] * second_moment
        kw["stiffness3"] = _f32(np.stack([bend_k, twist_k, bend_k], axis=1))
        rel = npquat.multiply(npquat.conjugate(q0), q1)
        kw["rest3"] = _f32(2.0 / seg_len[:, None] * rel[:, 1:4])

    if kind == "damper":
        kw["stiffness"] = _f32(np.broadcast_to(
            np.asarray(0.0 if stiffness is None else stiffness), (c,)))

    if kind in ("target_position_motor_slider", "target_velocity_motor_slider",
                "target_angle_motor_hinge", "target_velocity_motor_hinge"):
        kw["target"] = _f32(np.broadcast_to(
            np.asarray(0.0 if target is None else target), (c,)))
        if seq_times is not None:
            kw["seq_times"] = _f32(seq_times)
            kw["seq_values"] = _f32(seq_values)
            rep = (np.broadcast_to(np.asarray(seq_repeat), (c,))
                   if seq_repeat is not None else np.zeros((c,), bool))
            kw["seq_repeat"] = jnp.asarray(rep.astype(bool))

    return JointBatch(**kw)
