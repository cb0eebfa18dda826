#!/usr/bin/env python
"""Headline benchmark: XPBD solver steps/s at ~100k particles, single chip.

Scene = BASELINE.md config 1 scaled to the north-star size: a 320×320 cloth
(102,400 particles, ~306k XPBD distance + ~305k XPBD bending constraints),
5 substeps × 1 iteration at dt=0.005 (reference defaults,
``TimeStepController.cpp:28-30``), batched Jacobi projection.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 60 — the north-star per-rollout rate (≥60 sim
steps/s at 100k particles, BASELINE.json).
"""
import argparse
import json
import os
import time


def bench_mpc(args):
    """Sampling-MPC throughput: one MPPI planner update = K vmapped
    rollouts of `horizon` steps on a 32x32 XPBD cloth (the north-star
    workload shape: trajectory rollouts feeding a sampling planner)."""
    import jax
    import jax.numpy as jnp
    from positionbaseddynamics_tpu import mpc
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig

    n = 32
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(n, n)
    pin = tm.offset
    b.set_mass(pin, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    state, cset = b.build()
    cfg = StepConfig(dt=0.01, substeps=2, damping=0.01)

    ctrl = mpc.PinVelocityControl(indices=(int(pin),), max_speed=2.0)
    target = jnp.asarray(state.particles.x[pin]) + jnp.array([0.5, 0.5, 0.0])
    seq_cost = mpc.make_sequence_cost(
        cset, cfg, ctrl,
        running_cost=mpc.control_effort(1e-3),
        terminal_cost=mpc.particle_target([int(pin)], target))
    mcfg = mpc.MPPIConfig(horizon=args.mpc_horizon,
                          num_samples=args.mpc_samples, plan_iters=1)
    nominal = jnp.zeros((mcfg.horizon, ctrl.u_dim), jnp.float32)

    upd = jax.jit(lambda k, s, nom: mpc.mppi_update(k, s, nom, seq_cost,
                                                    mcfg)[0])
    key = jax.random.PRNGKey(0)
    nominal = jax.block_until_ready(upd(key, state, nominal))  # compile

    t0 = time.perf_counter()
    for i in range(args.calls):
        nominal = upd(jax.random.PRNGKey(i), state, nominal)
    jax.block_until_ready(nominal)
    dt = time.perf_counter() - t0

    rollouts = args.calls * args.mpc_samples
    print(json.dumps({
        "metric": f"mppi_cloth1k_rollouts_per_s_k{args.mpc_samples}"
                  f"_h{args.mpc_horizon}",
        "value": round(rollouts / dt, 2),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts / dt / 60.0, 3),
    }))


def bench_mpc_big(args):
    """The north-star workload end to end: an MPPI planner whose rollouts
    are the BATCHED Pallas 102k-particle cloth (one planner update =
    ``mpc_samples`` parallel 320x320 rollouts of ``mpc_horizon`` steps on
    one chip). Control = dragging the pinned corner (velocity command,
    applied to the pinned particle's position between sim steps); cost =
    squared distance of the free corner to a target."""
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig
    from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
        make_pallas_cloth_step)

    n = args.width
    k_samples = args.mpc_samples
    horizon = args.mpc_horizon
    b = SceneBuilder()
    tm = b.add_regular_triangle_model(n, n, scale=(2.0, 2.0))
    pin = tm.offset
    b.set_mass(pin, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    state, cset = b.build()
    cfg = StepConfig()
    gc = cset.grid_cloths[0]
    pstep = make_pallas_cloth_step(
        gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
        dt=cfg.dt, substeps=cfg.substeps, n_batch=k_samples, n_steps=1)

    free_corner = tm.offset + n * n - 1
    target = jnp.asarray(state.particles.x[pin]) + jnp.array([0.5, 0.5, 0.0])
    sigma, lam, max_speed = 1.0, 0.1, 2.0

    @jax.jit
    def planner_update(key, x0, v0, nominal):
        eps = sigma * jax.random.normal(key, (k_samples, horizon, 3))
        u = jnp.clip(nominal[None] + eps, -max_speed, max_speed)
        x = jnp.broadcast_to(x0, (k_samples,) + x0.shape)
        v = jnp.broadcast_to(v0, (k_samples,) + v0.shape)
        cost = jnp.zeros((k_samples,))
        for t in range(horizon):
            # velocity command on the pinned corner -> position update
            x = x.at[:, pin].add(u[:, t] * cfg.dt)
            x, v = pstep(x, v)
            cost = cost + 1e-3 * jnp.sum(u[:, t] ** 2, -1)
        cost = cost + jnp.sum((x[:, free_corner] - target) ** 2, -1)
        w = jax.nn.softmax(-cost / lam)
        return nominal + jnp.einsum("k,kh d->hd", w, eps), cost.min()

    key = jax.random.PRNGKey(0)
    nominal = jnp.zeros((horizon, 3), jnp.float32)
    x0, v0 = state.particles.x, state.particles.v
    nominal, _ = jax.block_until_ready(
        planner_update(key, x0, v0, nominal))          # compile
    t0 = time.perf_counter()
    for i in range(args.calls):
        nominal, best = planner_update(jax.random.PRNGKey(i), x0, v0,
                                       nominal)
    jax.block_until_ready(nominal)
    dt = time.perf_counter() - t0
    updates_per_s = args.calls / dt
    print(json.dumps({
        "metric": f"mppi_cloth{n * n // 1000}k_planner_updates_per_s"
                  f"_k{k_samples}_h{horizon}",
        "value": round(updates_per_s, 2),
        # north-star framing: sim-steps simulated per second across the
        # planner's rollout fan-out
        "aggregate_steps_per_s": round(
            updates_per_s * k_samples * horizon, 1),
        "unit": "planner updates/s",
        "vs_baseline": round(updates_per_s * k_samples * horizon / 60.0,
                             3),
        "path": "pallas_fused",
    }))


def bench_scene(args):
    """BASELINE configs 4/5: time a reference scene played headless
    (PileScene by default — rigid bodies + shipped-.csdf collision)."""
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.scene import load_scene
    from positionbaseddynamics_tpu.solver import make_step_fn

    path = args.scene or \
        "/root/reference/data/scenes/PileScene.json"
    name = os.path.splitext(os.path.basename(path))[0]
    s = load_scene(path, cache_dir="/tmp/pbd_bench_sdf_cache",
                   max_sdf_resolution=14)
    fn = make_step_fn(s.cset, s.config, s.pipeline)
    state = jax.block_until_ready(fn(s.state))      # compile + probe
    if s.state.rigid is not None:
        assert _np.isfinite(_np.asarray(state.rigid.x)).all()
    t0 = time.perf_counter()
    steps = args.calls * args.steps_per_call
    for _ in range(steps):
        state = fn(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps_per_s = steps / dt
    print(json.dumps({
        "metric": f"scene_{name}_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 60.0, 3),
    }))


def bench_pile_big(args, calls=None, steps_per_call=None):
    """Scalable rigid-contact metric (VERDICT r4 #1): an N-body sphere
    pile on a static box floor, batched broad phase
    (``collision/batched.py``) — the workload class the unrolled
    per-pair path could not compile past ~20 bodies."""
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.collision import sampling
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn

    n_bodies = args.pile_bodies
    rng = _np.random.default_rng(0)
    b = SceneBuilder()
    floor = b.add_rigid_body((0.0, -0.5, 0.0), mass=0.0)
    b.add_collision_box(floor, (6.0, 1.0, 6.0))
    r = 0.25
    sv = sampling.sample_sphere(r, 32)
    for i in range(n_bodies):
        gx, gz = i % 10, (i // 10) % 10
        body = b.add_rigid_body(
            (0.55 * gx - 2.5 + 0.02 * rng.standard_normal(),
             0.8 + 0.55 * (i // 100),
             0.55 * gz - 2.5 + 0.02 * rng.standard_normal()),
            mass=1.0, inertia=(0.4 * r * r,) * 3)
        b.add_collision_sphere(body, r, restitution=0.1, friction=0.3,
                               verts=sv)
    state, cset = b.build()
    pipe = b.build_collision_pipeline(tolerance=0.02,
                                      broad_phase="batched")
    fn = make_step_fn(cset, StepConfig(), pipe)
    state = jax.block_until_ready(fn(state))        # compile + probe
    assert _np.isfinite(_np.asarray(state.rigid.x)).all()
    steps = (calls or args.calls) * (steps_per_call or args.steps_per_call)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = fn(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    sps = steps / dt
    print(json.dumps({
        "metric": f"rigid_pile_{n_bodies}body_steps_per_s",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
        "capacity_overflow": float(state.overflow),
        "path": "batched_broadphase",
    }))


def bench_armadillo_batch(args):
    """VERDICT r4 #4: batched unstructured-mesh rollouts — B parallel
    full-solver ArmadilloCollisionScene rollouts vmapped on one chip
    (scatter plans + gathers shared across the batch so every scatter
    row carries B×12 useful bytes). Reports steps/s **per rollout**."""
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from positionbaseddynamics_tpu.scene import load_scene
    from positionbaseddynamics_tpu.solver.step import step as step_fn

    s = load_scene(
        "/root/reference/data/scenes/ArmadilloCollisionScene.json",
        cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
    state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline
    b = args.batch if args.batch > 1 else 32
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (b,) + a.shape), state0)
    vstep = jax.jit(jax.vmap(lambda st: step_fn(st, cset, cfg, pipe)))
    batch = jax.block_until_ready(vstep(batch))
    assert _np.isfinite(_np.asarray(batch.particles.x)).all()
    steps = args.calls * args.steps_per_call
    t0 = time.perf_counter()
    for _ in range(steps):
        batch = vstep(batch)
    jax.block_until_ready(batch)
    dt = time.perf_counter() - t0
    sps = steps / dt
    print(json.dumps({
        "metric": f"armadillo_batch{b}_steps_per_s_per_rollout",
        "value": round(sps, 2),
        "aggregate_steps_per_s": round(sps * b, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
    }))


def bench_mpc_contact(args):
    """BASELINE config-5-class MPC (VERDICT r3 weak #7): an MPPI planner
    whose rollouts are the FULL coupled-contact ArmadilloCollisionScene
    (3 deformable FEM armadillos + SDF floor + solid-solid contacts),
    vmapped over the sample batch. Control = an external velocity drag
    on the top armadillo's particles between sim steps; cost = distance
    of its centroid to a lateral target + control effort."""
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from positionbaseddynamics_tpu.scene import load_scene
    from positionbaseddynamics_tpu.solver.step import step as step_fn

    s = load_scene(
        "/root/reference/data/scenes/ArmadilloCollisionScene.json",
        cache_dir="/tmp/pbd_bench_sdf_cache", max_sdf_resolution=14)
    state0, cset, cfg, pipe = s.state, s.cset, s.config, s.pipeline
    n_model = 1180                      # particles per armadillo
    k_samples = max(args.mpc_samples // 32, 4)
    horizon = max(args.mpc_horizon // 2, 5)
    target = (jnp.mean(state0.particles.x[:n_model], 0)
              + jnp.array([1.5, -0.5, 0.0]))
    sigma, lam, max_speed = 0.5, 0.1, 2.0

    def rollout_cost(u_seq, st):
        def body(carry, u):
            st, cost = carry
            p = st.particles
            v = p.v.at[:n_model].add(
                jnp.clip(u, -max_speed, max_speed) - p.v[:n_model])
            import dataclasses
            st = dataclasses.replace(
                st, particles=dataclasses.replace(p, v=v))
            st = step_fn(st, cset, cfg, pipe)
            cost = cost + 1e-3 * jnp.sum(u ** 2)
            return (st, cost), None
        (st, cost), _ = jax.lax.scan(body, (st, 0.0), u_seq)
        com = jnp.mean(st.particles.x[:n_model], 0)
        return cost + jnp.sum((com - target) ** 2)

    @jax.jit
    def planner_update(key, st, nominal):
        eps = sigma * jax.random.normal(key, (k_samples, horizon, 3))
        u = nominal[None] + eps
        costs = jax.vmap(lambda uu: rollout_cost(uu, st))(u)
        w = jax.nn.softmax(-costs / lam)
        return nominal + jnp.einsum("k,khd->hd", w, eps), costs.min()

    key = jax.random.PRNGKey(0)
    nominal = jnp.zeros((horizon, 3), jnp.float32)
    nominal, best = jax.block_until_ready(
        planner_update(key, state0, nominal))
    t0 = time.perf_counter()
    for i in range(args.calls):
        nominal, best = planner_update(jax.random.PRNGKey(i), state0,
                                       nominal)
    jax.block_until_ready(nominal)
    dt = time.perf_counter() - t0
    upd = args.calls / dt
    assert _np.isfinite(float(best))
    print(json.dumps({
        "metric": f"mppi_contact_scene_updates_per_s_k{k_samples}"
                  f"_h{horizon}",
        "value": round(upd, 3),
        "aggregate_steps_per_s": round(upd * k_samples * horizon, 1),
        "unit": "planner updates/s",
        "vs_baseline": round(upd * k_samples * horizon / 60.0, 3),
        "scene": "ArmadilloCollisionScene (full contact pipeline)",
    }))


def bench_rods_tree(args):
    """Branched stiff-rod TREE via the scheduled tree-ordered
    elimination (VERDICT r4 #9): a ~100-constraint random tree
    (Wilberforce-class topology at 25× the scene's size) solved exactly
    every iteration."""
    import dataclasses as dc
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn

    rng = _np.random.default_rng(0)
    n_seg = args.rod_batch if args.rod_batch < 512 else 101
    seg_len, radius, density = 0.3, 0.05, 1000.0
    mass = density * _np.pi * radius**2 * seg_len
    ix = 0.5 * mass * radius**2
    iyz = mass * (3 * radius**2 + seg_len**2) / 12.0
    b = SceneBuilder()
    bodies = [b.add_rigid_body((0.0, 0.0, 0.0), mass=0.0,
                               inertia=(ix, iyz, iyz))]
    centers = [_np.zeros(3)]
    edges, positions = [], []
    for i in range(1, n_seg):
        parent = int(rng.integers(0, i))
        d = rng.standard_normal(3)
        d /= _np.linalg.norm(d)
        joint = centers[parent] + 0.5 * seg_len * d
        c = joint + 0.5 * seg_len * d
        centers.append(c)
        bodies.append(b.add_rigid_body(tuple(c), mass=mass,
                                       inertia=(ix, iyz, iyz)))
        edges.append((parent, i))
        positions.append(tuple(joint))
    b.add_direct_rod_tree(bodies, edges, positions, radius, seg_len,
                          1e6, 1e6)
    state, cset = b.build()
    db = cset.direct_rods[0]
    cset = dc.replace(cset, direct_rods=tuple([dc.replace(
        db, solver="tree")]))
    fn = make_step_fn(cset, StepConfig())
    st = jax.block_until_ready(fn(state))
    assert _np.isfinite(_np.asarray(st.rigid.x)).all()
    steps = args.calls * args.steps_per_call
    t0 = time.perf_counter()
    for _ in range(steps):
        st = fn(st)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    sps = steps / dt
    print(json.dumps({
        "metric": f"stiff_rod_tree_{n_seg - 1}c_steps_per_s",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
        "path": "tree_scheduled",
    }))


def bench_rods(args):
    """Cosserat-rod family at the production shape: B independent
    50-segment stretch-shear + bend-twist rods stepped as ONE batched
    scene (rods are rows of the same constraint batches — no vmap
    needed; the reference solves one rod at a time)."""
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, make_step_fn
    import numpy as np

    n_rods, n_seg = args.rod_batch, 51
    b = SceneBuilder()        # lattice fast path (solver/grid_rods.py)
    for rr in range(n_rods):
        pts = np.stack([np.linspace(0.0, 1.0, n_seg),
                        np.full(n_seg, 0.02 * rr), np.zeros(n_seg)], 1)
        lm = b.add_line_model(pts)
        b.set_mass(lm.offset, 0.0)
        b.set_quaternion_mass(lm.offset_q, 0.0)
        b.add_rod_constraints(lm, stretch_stiffness=(1.0, 1.0, 1.0),
                              bend_twist_stiffness=(0.5, 0.5, 0.5))
    state, cset = b.build()
    path = "rod_lattice" if cset.rod_lattices else "unstructured"
    fn = make_step_fn(cset, StepConfig())
    st = jax.block_until_ready(fn(state))
    assert _np.isfinite(_np.asarray(st.particles.x)).all()
    steps = args.calls * args.steps_per_call
    t0 = time.perf_counter()
    for _ in range(steps):
        st = fn(st)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    sps = steps / dt
    print(json.dumps({
        "metric": f"cosserat_rods_x{n_rods}_steps_per_s",
        "value": round(sps, 2),
        "unit": "steps/s",
        "aggregate_rod_steps_per_s": round(sps * n_rods, 1),
        "vs_baseline": round(sps / 60.0, 3),
        "path": path,
    }))


def bench_fluid(args):
    """PBF breaking dam (FluidDemo class, TimeStepFluidModel.cpp:21-68):
    ~100k fluid particles in a boundary box, 5 density iterations,
    CFL-adaptive dt. Metric: solver steps/s."""
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.fluids.model import (
        FluidScene, FluidState, block_positions, box_boundary,
        make_fluid_step_fn)

    radius = 0.025
    diam = 2 * radius
    nx, ny, nz = args.fluid_dims
    fluid = block_positions((diam, diam, diam), (nx, ny, nz), diam)
    lo = (0.0, 0.0, 0.0)
    hi = ((nx + 2) * diam * 4.0, (ny + 2) * diam * 2.0, (nz + 2) * diam)
    bnd = box_boundary(lo, hi, diam)
    scene = FluidScene.create(len(fluid), bnd, particle_radius=radius,
                              domain=(lo, hi))
    state = FluidState.create(fluid)
    fn = make_fluid_step_fn(scene)
    state = jax.block_until_ready(fn(state))        # compile + probe
    if not _np.isfinite(_np.asarray(state.x)).all():
        raise FloatingPointError("fluid probe produced non-finite x")
    steps = args.calls * args.steps_per_call
    t0 = time.perf_counter()
    for _ in range(steps):
        state = fn(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps_per_s = steps / dt
    overflow = float(state.overflow)
    print(json.dumps({
        "metric": f"pbf_dam_{len(fluid) // 1000}k_steps_per_s",
        "capacity_overflow": overflow,
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 60.0, 3),
        "n_fluid": len(fluid), "n_boundary": len(bnd),
        "path": "cell_dense",
    }))


def bench_bar(args):
    """BarDemo-class metric (BASELINE config 2, ``Demos/BarDemo/main.cpp``):
    a regular XPBD FEM tet bar cantilever at ~100k particles via the
    structured tet-grid path (``solver/grid_tet.py``), reference solver
    budget (5 substeps x 1 iteration, dt=0.005). XPBD stiffness preset
    1e5 as in the demo's XPBD method."""
    import jax
    import numpy as _np
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    w, h, d = args.bar_dims
    b = SceneBuilder()
    tm = b.add_regular_tet_model(w, h, d, scale=(4.0, 1.0, 1.0))
    for j in range(h):          # pin the i=0 face (cantilever)
        for k in range(d):
            b.set_mass(tm.offset + j * d + k, 0.0)
    b.add_solid_constraints(tm, method=3, stiffness=1e5, poisson_ratio=0.3)
    state, cset = b.build()
    assert cset.grid_tets, "structured tet path not engaged"
    cfg = StepConfig(max_iterations=args.max_iterations)

    use_pallas_tet = (args.pallas is True
                      or (args.pallas is None
                          and args.max_iterations == 1))
    if args.pallas is None and args.max_iterations > 1:
        # the fused kernel's multi-iteration lambda-plane path FAILS the
        # on-device check at maxIterations=5 (0.15 max|dx| over 10
        # steps, r05) — route iteration budgets >1 to the XLA grid path
        # until the divergence is root-caused; --pallas forces it back
        print(json.dumps({"note": "max_iterations>1: using XLA grid "
                          "path (Pallas lambda-plane check fails; "
                          "docs/PERF.md r05)"}), flush=True)
    if use_pallas_tet:
        # fused Pallas tet kernel (solver/grid_tet_pallas.py);
        # --no-pallas forces the XLA grid path
        from positionbaseddynamics_tpu.solver.grid_tet_pallas import (
            make_pallas_tet_step)

        gt = cset.grid_tets[0]
        pstep = make_pallas_tet_step(
            gt, state.particles.inv_mass, dt=cfg.dt,
            substeps=cfg.substeps, max_iterations=cfg.max_iterations,
            n_steps=args.steps_per_call)
        x, v = state.particles.x, state.particles.v
        if args.check:
            import sys
            fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(state)
            ps = make_pallas_tet_step(
                gt, state.particles.inv_mass, dt=cfg.dt,
                substeps=cfg.substeps,
                max_iterations=cfg.max_iterations, n_steps=10)
            xc, _vc = ps(x, v)
            dev = float(_np.abs(_np.asarray(xc)
                                - _np.asarray(fin.particles.x)).max())
            ok = dev < 1e-5
            print(json.dumps({"metric": "pallas_tet_vs_jnp_10step_dev",
                              "value": dev, "unit": "max |dx|",
                              "backend": jax.default_backend(),
                              "ok": ok}))
            return 0 if ok else sys.exit(1)
        xv = jax.block_until_ready(pstep(x, v))
        if not _np.isfinite(_np.asarray(xv[0])).all():
            raise FloatingPointError("pallas tet probe non-finite")
        t0 = time.perf_counter()
        for _ in range(args.calls):
            xv = pstep(*xv)
        jax.block_until_ready(xv)
        dt = time.perf_counter() - t0
        steps = args.calls * args.steps_per_call
        steps_per_s = steps / dt
        print(json.dumps({
            "metric": f"xpbd_fem_bar_{w * h * d // 1000}k_steps_per_s"
                      + (f"_it{cfg.max_iterations}"
                         if cfg.max_iterations != 1 else ""),
            "value": round(steps_per_s, 2),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_s / 60.0, 3),
            "path": "pallas_tet",
        }))
        return

    chunk = jax.jit(
        lambda s: rollout(s, cset, cfg, args.steps_per_call)[0])
    state = jax.block_until_ready(chunk(state))     # compile + probe
    if not _np.isfinite(_np.asarray(state.particles.x)).all():
        raise FloatingPointError("bar probe produced non-finite x")
    t0 = time.perf_counter()
    for _ in range(args.calls):
        state = chunk(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    steps = args.calls * args.steps_per_call
    steps_per_s = steps / dt
    print(json.dumps({
        "metric": f"xpbd_fem_bar_{w * h * d // 1000}k_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 60.0, 3),
        "path": "grid_tet",
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--steps-per-call", type=int, default=20)
    ap.add_argument("--max-iterations", type=int, default=1,
                    help="position-iteration budget per substep (the "
                         "reference's maxIterations; default 1) — "
                         "applied to the cloth/bar paths incl. --check")
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--timers", action="store_true",
                    help="print per-phase average times (the reference's "
                         "Timing::printAverageTimes analogue)")
    ap.add_argument("--mpc", action="store_true",
                    help="benchmark MPPI planner rollouts/s instead "
                         "(north-star sampling-MPC workload)")
    ap.add_argument("--mpc-big", action="store_true",
                    help="MPPI planner over BATCHED Pallas rollouts of "
                         "the full 102k-particle cloth (the north-star "
                         "workload end to end)")
    ap.add_argument("--mpc-samples", type=int, default=256)
    ap.add_argument("--mpc-horizon", type=int, default=10)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop "
                         "into DIR (inspect with TensorBoard/XProf)")
    ap.add_argument("--pallas", dest="pallas", action="store_true",
                    default=None,
                    help="force the fused Pallas substep kernel "
                         "(solver/grid_cloth_pallas.py) for the timed loop "
                         "(the default when the scene supports it)")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false",
                    help="force the jnp structured-grid path")
    ap.add_argument("--mpc-contact", action="store_true",
                    help="MPPI over full coupled-contact scene rollouts "
                         "(BASELINE config-5 class)")
    ap.add_argument("--armadillo-batch", action="store_true",
                    help="B batched full-solver ArmadilloCollisionScene "
                         "rollouts (per-rollout steps/s; --batch sets B)")
    ap.add_argument("--rods", action="store_true",
                    help="batched Cosserat rod scene metric")
    ap.add_argument("--rod-batch", type=int, default=1024)
    ap.add_argument("--tree", action="store_true",
                    help="with --rods: branched stiff-rod tree via the "
                         "scheduled tree-ordered elimination")
    ap.add_argument("--fluid", action="store_true",
                    help="PBF breaking-dam metric (~100k particles)")
    ap.add_argument("--fluid-dims", type=int, nargs=3,
                    default=(80, 50, 25),
                    help="fluid block particle counts (x y z)")
    ap.add_argument("--bar", action="store_true",
                    help="benchmark the BarDemo workload instead: regular "
                         "XPBD FEM tet bar via the structured tet-grid "
                         "path (BASELINE config 2)")
    ap.add_argument("--pile", action="store_true",
                    help="benchmark a reference scene played headless "
                         "(PileScene by default; BASELINE configs 4/5)")
    ap.add_argument("--pile-big", action="store_true",
                    help="N-body synthetic sphere pile on the batched "
                         "broad phase (scalable rigid-contact metric)")
    ap.add_argument("--pile-bodies", type=int, default=100)
    ap.add_argument("--no-secondary", action="store_true",
                    help="emit only the headline cloth line (skip the "
                         "bar/fluid/pile/mpc-contact secondary JSON "
                         "lines of the default run)")
    ap.add_argument("--scene", default=None,
                    help="scene JSON for --pile (default PileScene)")
    ap.add_argument("--bar-dims", type=int, nargs=3, default=(80, 36, 36),
                    metavar=("W", "H", "D"),
                    help="tet bar vertex grid (default 80x36x36 = 103k "
                         "particles)")
    ap.add_argument("--donate", action="store_true",
                    help="attempt buffer donation of the state (known to "
                         "fail with INVALID_ARGUMENT on tunneled axon "
                         "backends; reports instead of crashing)")
    ap.add_argument("--fuse", dest="fuse", action="store_true",
                    default=True,
                    help="run all substeps inside one Pallas kernel pass "
                         "per block (PERF.md lever 2; default on)")
    ap.add_argument("--no-fuse", dest="fuse", action="store_false")
    ap.add_argument("--check", action="store_true",
                    help="ON-DEVICE numerical check: run 10 steps on both "
                         "the Pallas and jnp paths on this backend and "
                         "compare trajectories. Catches hardware-only "
                         "kernel bugs (e.g. DMA aliasing races) that "
                         "interpret-mode CPU tests cannot see.")
    args = ap.parse_args()

    if args.mpc:
        return bench_mpc(args)
    if args.mpc_big:
        return bench_mpc_big(args)
    if args.mpc_contact:
        return bench_mpc_contact(args)
    if args.armadillo_batch:
        return bench_armadillo_batch(args)
    if args.rods:
        if args.tree:
            return bench_rods_tree(args)
        return bench_rods(args)
    if args.fluid:
        return bench_fluid(args)
    if args.bar:
        return bench_bar(args)
    if args.pile:
        return bench_scene(args)
    if args.pile_big:
        return bench_pile_big(args)

    # Secondary driver-visible surfaces (VERDICT r4 #6): one quick JSON
    # line each for the bar, fluid, pile and contact-MPC paths so a
    # regression in any non-cloth path shows up in BENCH_r*.json. Each
    # runs under a watchdog and never blocks the headline (errors are
    # reported as JSON, the headline cloth line always comes LAST — the
    # driver parses the last line).
    if not (args.no_secondary or args.check):
        import copy
        import signal

        sec_deadline = time.perf_counter() + 700.0   # global budget

        def _safe(name, fn, budget_s=420, **over):
            left = sec_deadline - time.perf_counter()
            if left < 30.0:
                print(json.dumps({"metric": name,
                                  "error": "skipped: secondary budget "
                                           "exhausted"}), flush=True)
                return
            budget_s = int(min(budget_s, left))
            a2 = copy.copy(args)
            for k, v in over.items():
                setattr(a2, k, v)

            def _alarm(sig, frm):
                raise TimeoutError(f"{name} exceeded {budget_s}s")

            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(budget_s)
            try:
                fn(a2)
            except Exception as e:       # noqa: BLE001 — reported loud
                print(json.dumps({"metric": name,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)

        _safe("xpbd_fem_bar_103k_steps_per_s", bench_bar,
              calls=2, steps_per_call=10, check=False, pallas=None)
        _safe("pbf_dam_12k_steps_per_s", bench_fluid,
              fluid_dims=(40, 25, 12), calls=2, steps_per_call=10)
        _safe("rigid_pile_100body_steps_per_s", bench_pile_big,
              calls=2, steps_per_call=10, pile_bodies=100)
        _safe("mppi_contact_scene_updates_per_s", bench_mpc_contact,
              calls=1, mpc_samples=128, mpc_horizon=10)

    import jax
    import jax.numpy as jnp
    from positionbaseddynamics_tpu.models import SceneBuilder
    from positionbaseddynamics_tpu.solver import StepConfig, rollout

    b = SceneBuilder()
    tm = b.add_regular_triangle_model(args.width, args.height, scale=(2.0, 2.0))
    b.set_mass(tm.offset, 0.0)
    b.set_mass(tm.offset + args.width - 1, 0.0)
    b.add_cloth_constraints(tm, method=4, distance_stiffness=1e5)
    b.add_bending_constraints(tm, method=3, stiffness=0.05)
    state, cset = b.build()
    cfg = StepConfig(max_iterations=args.max_iterations)

    def chunk(s):
        return rollout(s, cset, cfg, args.steps_per_call)[0]

    if args.check:
        import sys

        import numpy as _np

        from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
            make_pallas_cloth_step)

        gc = cset.grid_cloths[0]
        pstep = make_pallas_cloth_step(
            gc, state.particles.inv_mass, gc.inv_cnt_dist, gc.inv_cnt_bend,
            dt=cfg.dt, substeps=cfg.substeps,
            max_iterations=cfg.max_iterations, n_steps=10,
            fuse_substeps=args.fuse)
        x, v = pstep(state.particles.x, state.particles.v)
        fin, _ = jax.jit(lambda s: rollout(s, cset, cfg, 10))(state)
        dev = float(_np.abs(_np.asarray(x)
                            - _np.asarray(fin.particles.x)).max())
        ok = dev < 1e-5
        print(json.dumps({"metric": "pallas_vs_jnp_10step_dev",
                          "value": dev, "unit": "max |dx|",
                          "backend": jax.default_backend(), "ok": ok}))
        return 0 if ok else sys.exit(1)

    # Fused Pallas substep kernel (docs/PERF.md): row-block grid with
    # halo margins, one launch per substep, ~8x the jnp grid path on the
    # bench chip. Default path (auto-fallback to jnp if unsupported);
    # --no-pallas forces the jnp structured-grid path. --batch maps to
    # the kernel's batched-rollout grid (the jnp path's vmap, by
    # contrast, blows XLA compile time past 400 s even at batch=2).
    if args.pallas is not False:
        import sys

        import numpy as _np

        from positionbaseddynamics_tpu.solver.grid_cloth_pallas import (
            make_pallas_cloth_step)

        for flag in ("donate", "timers"):
            if getattr(args, flag):
                print(f"warning: --{flag} is ignored on the pallas path "
                      f"(use --no-pallas)", file=sys.stderr)
        if args.profile:
            print("warning: --profile is ignored on the pallas path "
                  "(use --no-pallas)", file=sys.stderr)

        try:
            gc = cset.grid_cloths[0] if cset.grid_cloths else None
            if gc is None:
                raise NotImplementedError("no structured grid cloth")
            pallas_chunk = make_pallas_cloth_step(
                gc, state.particles.inv_mass, gc.inv_cnt_dist,
                gc.inv_cnt_bend, dt=cfg.dt, substeps=cfg.substeps,
                max_iterations=cfg.max_iterations, n_batch=args.batch,
                n_steps=args.steps_per_call, fuse_substeps=args.fuse)
        except NotImplementedError as e:
            if args.pallas:        # explicitly forced
                raise
            print(f"pallas path unavailable ({e}); "
                  f"falling back to the jnp grid path", file=sys.stderr)
            pallas_chunk = None

    if args.pallas is not False and pallas_chunk is not None:

        x, v = state.particles.x, state.particles.v
        if args.batch > 1:
            x = jnp.broadcast_to(x, (args.batch,) + x.shape)
            v = jnp.broadcast_to(v, (args.batch,) + v.shape)
        xv = jax.block_until_ready(pallas_chunk(x, v))   # compile+probe
        if not _np.isfinite(_np.asarray(xv[0])).all():
            raise FloatingPointError("pallas probe produced non-finite x")
        t0 = time.perf_counter()
        for _ in range(args.calls):
            xv = pallas_chunk(*xv)
        jax.block_until_ready(xv)
        dt = time.perf_counter() - t0
        steps = args.calls * args.steps_per_call
        steps_per_s = steps / dt
        out = {
            "metric": f"xpbd_cloth_"
                      f"{args.width * args.height // 1000}k_steps_per_s"
                      + (f"_b{args.batch}" if args.batch > 1 else ""),
            # per-rollout rate — the north-star number (≥60 steps/s per
            # rollout, BASELINE.json); NOT multiplied by batch
            "value": round(steps_per_s, 2),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_s / 60.0, 3),
            "path": "pallas_fused",
        }
        if args.batch > 1:
            out["aggregate_steps_per_s"] = round(steps_per_s * args.batch, 2)
        print(json.dumps(out))
        return

    # NOTE: default has no donate_argnums — buffer donation triggers an
    # INVALID_ARGUMENT TPU backend error on this image's tunneled (axon)
    # backend; --donate probes it and falls back with a report.
    donate = dict(donate_argnums=(0,)) if args.donate else {}
    if args.batch > 1:
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (args.batch,) + a.shape), state)
        chunk_fn = jax.jit(jax.vmap(chunk), **donate)
    else:
        chunk_fn = jax.jit(chunk, **donate)
    if args.donate:
        import sys
        try:
            state = jax.block_until_ready(chunk_fn(state))
            print("donation: OK (state buffers aliased in-place)",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - backend dependent
            print(f"donation: unsupported on this backend "
                  f"({type(e).__name__}); falling back to copies",
                  file=sys.stderr)
            state, cset = b.build()       # donated buffers are invalid
            if args.batch > 1:
                state = jax.tree.map(
                    lambda a: jnp.broadcast_to(
                        a, (args.batch,) + a.shape), state)
            chunk_fn = (jax.jit(jax.vmap(chunk)) if args.batch > 1
                        else jax.jit(chunk))

    state = chunk_fn(state)               # warmup / compile
    jax.block_until_ready(state)

    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        t0 = time.perf_counter()
        for _ in range(args.calls):
            state = chunk_fn(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0

    steps = args.calls * args.steps_per_call
    steps_per_s = steps / dt
    out = {
        "metric": f"xpbd_cloth_{args.width * args.height // 1000}k_steps_per_s"
                  + (f"_b{args.batch}" if args.batch > 1 else ""),
        # per-rollout rate — the north-star number (≥60 steps/s per
        # rollout, BASELINE.json); NOT multiplied by batch
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 60.0, 3),
    }
    if args.batch > 1:
        out["aggregate_steps_per_s"] = round(steps_per_s * args.batch, 2)
    print(json.dumps(out))

    if args.timers and args.batch == 1:
        from positionbaseddynamics_tpu.utils.timing import PhaseTimers
        timers = PhaseTimers(cset, cfg)
        timers.measure(state, repeats=3)
        import sys
        print(timers.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
