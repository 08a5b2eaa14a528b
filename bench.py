"""Benchmark: Newton-step wall-clock on a cavern_600-scale problem.

Primary metric (BASELINE.json): Newton-step wall-clock on cavern_600_3D /
matrix-free CG MDOF/s per chip.  The workload mirrors the reference's
operation-stage regime (examples/mechanics/4_cavern + 1_triaxial): ~30k-tet
mesh, full constitutive suite (elastic + Kelvin-Voigt + dislocation creep +
Desai), theta = 0.5, fixed-point tol 1e-8 / max 40, Krylov rtol 1e-12
(mixed-precision: f32 Krylov under f64 defect correction, see
safeincave_tpu/fem/solvers.py:ir_solve).

Uses the real cavern_regular_600_3D mesh when the reference checkout is
mounted (with Morton element/node reordering for gather locality);
otherwise a structured box with an equivalent element count.

Reports (stderr): per-step wall-clock for BOTH execution modes - the
reference-style per-step-host-sync loop and the production fused driver
(Simulator_M auto-fuses all steps between output boundaries into one
device dispatch; convergence control runs on device) - plus fixed-point
iters/step, Krylov iters/step, matvec bandwidth vs the v5e HBM roofline,
and MDOF/s.  The headline metric is the fused driver, i.e. how an
operation-stage run with sparse outputs actually executes.
Output (stdout): ONE json line  {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against a documented reference estimate of 2.0 s per
nonlinear time step for SafeInCave's FEniCSx/PETSc CPU stack on this mesh
class: the reference re-assembles A and b and re-solves at rtol=1e-12 every
fixed-point iteration (~3 iterations/step) and rebuilds FD tangents with 12
rate sweeps per model per iteration (reference MomentumEquation.py:640-675,
:1008-1025); ~0.5-0.7 s per assemble+solve on a 16kDOF tet mesh on a CPU
node is typical for that stack, giving ~2 s/step (SURVEY.md 6; no published
numbers exist - BASELINE.md records "published: {}").

Cross-check: THIS framework, running the identical workload on the host CPU
(JAX_PLATFORMS=cpu, single core), measures ~2.4 s/step - with exact-autodiff
tangents and a stronger preconditioner than the reference uses.  The
reference stack with its 12-sweep FD tangents on comparable hardware cannot
plausibly be faster than that, so 2.0 s/step is a conservative (generous to
the reference) baseline.
"""
import faulthandler
import json
import os
import signal
import sys
import time

# NOTE on compile routing (r05): terminal-side XLA compiles traverse the
# TPU tunnel at minutes per cold program (measured 496-567 s for the band
# programs, ~300 s for the elastic solve).  Local AOT compilation
# (PALLAS_AXON_REMOTE_COMPILE=0) compiles the same programs in seconds but
# the terminal REJECTS the client's h2d uploads on a libtpu version
# mismatch (client Jan-2026 vs terminal Nov-2025 build), so it is not
# usable here.  The persistent cache below is therefore the load-bearing
# mitigation: a warm cache loads every headline program in seconds
# (measured 5.7 s for the elastic solve vs 300.7 s cold).

# Persistent XLA compile cache (set BEFORE jax import): a warm cache turns
# the fused-driver first chunk from ~55 s into seconds, which is the margin
# between "every section reports" and "watchdog kills the round" (r03
# post-mortem; VERDICT r03 item 1).  Same location as tests/conftest.py so
# test runs pre-warm the bench and vice versa.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

REFERENCE_SECONDS_PER_STEP = 2.0  # documented estimate, see module docstring
HBM_GBPS = 819.0                  # TPU v5e HBM bandwidth roofline


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x, timeout_s, what="array"):
    """Device-to-host transfer under a deadline.

    Returns the numpy value, or None if the tunnel's d2h path missed the
    deadline (observed wedged for minutes-to-hours on 2026-08-20 while
    compute dispatch kept working).  The orphaned transfer finishes (or
    not) on a daemon thread; the caller moves on either way."""
    import threading
    out = {}

    def _pull():
        try:
            out["v"] = np.asarray(x)
        except Exception as exc:       # noqa: BLE001 - report, don't die
            out["e"] = exc
    th = threading.Thread(target=_pull, daemon=True)
    th.start()
    th.join(timeout_s)
    if "e" in out:
        log(f"d2h fetch of {what} failed: {out['e']}")
        return None
    if "v" not in out:
        log(f"d2h fetch of {what} missed its {timeout_s:.0f}s deadline "
            f"(tunnel wedge)")
        return None
    return out["v"]


def load_measured_baseline():
    """Measured CPU-backend baseline (tools/measure_baseline.py output).

    The committed baseline_measured.json holds per-config s/step measured by
    running THIS framework's per-step, pure-f64, always-tight path on the
    CPU backend - a PETSc-CPU-node proxy that is generous to the reference
    (exact autodiff tangents and a stronger preconditioner than the
    reference's FD-probe + ASM/ILU stack).  See the JSON's "notes" field
    for the host caveats."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_measured.json")
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


MEASURED = load_measured_baseline()


def measured_ratio(key, per_step_s):
    entry = MEASURED.get(key)
    if not entry:
        return None
    return entry["s_per_step"] / per_step_s


def build(nx=17):
    import jax.numpy as jnp
    import safeincave_tpu as sc
    momBC = sc.MomentumBC

    from safeincave_tpu.utils import find_grid
    try:
        cav = find_grid("cavern_regular_600_3D", fallback="cavern_proxy_600")
    except FileNotFoundError:
        cav = None
    if cav is not None:
        # band (RCM) ordering serves BOTH the Pallas band matvec's static
        # schedule and gather locality for the cumsum f64 path
        grid = sc.GridHandlerGMSH("geom", cav, reorder="band")
        log(f"mesh: {os.path.basename(cav)} ({grid.n_nodes} nodes, "
            f"{grid.n_elems} tets, band-reordered)")
        names = grid.get_boundary_names()
    else:
        grid = sc.GridBox(Lx=600.0, Ly=600.0, Lz=800.0, nx=nx, ny=nx, nz=nx)
        log(f"mesh: synthetic box ({grid.n_nodes} nodes, {grid.n_elems} tets)")
        names = grid.get_boundary_names()

    eq = sc.LinearMomentum(grid, theta=0.5,
                           auto_backend=os.environ.get("BENCH_NO_BAND") != "1")
    # BiCGStab measures ~2x faster per converged solve than CG on TPU for
    # this tangent despite 2 matvecs/iteration (fewer, more productive
    # iterations).  max_it is the per-refinement-pass f32 Krylov cap;
    # coarse_agg=8 trades a slightly larger dense coarse space for fewer
    # iterations.  adaptive_rtol stays OFF (the library default): measured
    # per-step in the yielding regime (steps 21-40, cavern600), always-
    # tight converges in 3 fp-iters/step at 219 krylov-iters/step vs the
    # Eisenstat-Walker path's 5 fp-iters at 239 - loose iterations do not
    # count toward convergence (it is declared on a tight iteration), so
    # they only add tangent rebuilds, and at yield onset a hostile tangent
    # makes loose solves stall and roll back (momentum._make_fp).  The
    # benchmarked config is therefore exactly what a user of the
    # documented API gets.
    # lag_tangent stays OFF: measured on this TPU (2026-08-19, cavern600
    # cyclic steps 21-40), modified-Newton tangent reuse RAISES per-step
    # cost - 348.6 ms/step at 5.5 fp-iters/step lagged vs 313.4 ms/step at
    # 4.9 fp-iters/step always-fresh.  The rebuild is fused into the same
    # device program as assembly+solve, so skipping it saves little, while
    # the lagged tangent slows fixed-point contraction and each extra
    # iteration pays the full assembly+Krylov cost (VERDICT r03 item 3:
    # measured, target not reachable via lagging; the feature remains as
    # an opt-in SolverSettings flag).  A/B knob: BENCH_LAG_TANGENT=1.
    lag = os.environ.get("BENCH_LAG_TANGENT", "0") == "1"
    adaptive = os.environ.get("BENCH_ADAPTIVE_RTOL", "0") == "1"
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                    max_it=400, coarse_agg=8,
                                    lag_tangent=lag,
                                    adaptive_rtol=adaptive))
    log(f"lag_tangent: {lag}  adaptive_rtol: {adaptive}")
    n = eq.n_elems
    log("building material...")
    one = np.ones(n)
    mat = sc.Material(n)
    mat.set_density(2200.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    mat.add_to_non_elastic(sc.Viscoelastic(105e11 * one, 10e9 * one, 0.32 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one))
    mat.add_to_non_elastic(sc.ViscoplasticDesai(
        mu_1=5.3665857009859815e-11 * one, N_1=3.1 * one,
        a_1=1.965018496922832e-05 * one, eta=0.8275682807874163 * one,
        n=3.0 * one, beta_1=0.0048 * one, beta=0.995 * one, m=-0.5 * one,
        gamma=0.095 * one, sigma_t=5.0 * one, alpha_0=0.0022 * one))
    eq.set_material(mat)
    eq.set_T0(298.0 * one)
    eq.set_T(298.0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])

    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e12]
    MPa = 1e6

    def has(name):
        return name in names

    # generic lithostatic-ish loading adapted to available boundary names
    fixed = [("WEST", 0), ("SOUTH", 1), ("BOTTOM", 2),
             ("West", 0), ("South", 1), ("Bottom", 2)]
    loaded = ["EAST", "NORTH", "TOP", "East", "North", "Top",
              "Cavern", "CAVERN", "Wall", "WALL"]
    n_dir = 0
    for nm, comp in fixed:
        if has(nm):
            bc.add_boundary_condition(momBC.DirichletBC(nm, comp,
                                                        [0., 0.], tv))
            n_dir += 1
    if n_dir == 0:  # unknown naming: pin the first boundary in all components
        nm = names[0]
        for comp in range(3):
            bc.add_boundary_condition(momBC.DirichletBC(nm, comp,
                                                        [0., 0.], tv))
    # cyclic pressure schedule (the reference operation-stage regime:
    # examples/mechanics/4_cavern cyclic cavern loading).  A 24 h sinus
    # keeps every benchmark window doing comparable nonlinear work - with a
    # constant load the creep transient decays and later steps converge in
    # 1 fixed-point iteration, which would flatter whichever execution mode
    # is measured later.
    t_sched = np.arange(0.0, 400 * 3600.0, 3600.0)
    p_sched = 10 * MPa + 4 * MPa * np.sin(2 * np.pi * t_sched / (24 * 3600.0))
    for nm in loaded:
        if has(nm):
            bc.add_boundary_condition(momBC.NeumannBC(
                nm, 2, 0.0, 0.0, list(p_sched), list(t_sched), g=0.0))
    eq.set_boundary_conditions(bc)
    # default: no enable_* call - the benchmark measures the library
    # default exactly as a user gets it (r03 post-mortem: never benchmark
    # a backend that has not already finished a solve on this hardware).
    # BENCH_NO_BAND=1 (set by main() when the cold-compile probe misses its
    # deadline) drops the Pallas band backend for the proven cold-fast
    # matrix-free path.
    # BENCH_BACKEND overrides for A/B experiments: band | blockell | dia.
    forced = os.environ.get("BENCH_BACKEND", "")
    if forced:
        try:
            getattr(eq, f"enable_{forced}_matvec")()
            log(f"matvec backend: {forced} (BENCH_BACKEND override)")
        except (AttributeError, ValueError) as exc:
            log(f"BENCH_BACKEND={forced} unavailable: {exc}")
    for attr, nm in (("dia", "block-DIA"), ("blockell", "block-ELL"),
                     ("band", "pallas-band")):
        if getattr(eq.kernel, attr, None) is not None:
            log(f"matvec backend: {nm} (auto-selected)")
            break
    else:
        log("matvec backend: matrix-free cumsum (library default)")
    return eq


def bench_matvec(eq):
    """Matvec bandwidth vs HBM roofline (BASELINE.md SpMV row)."""
    import jax
    import jax.numpy as jnp
    kern = eq.kernel
    E, N = kern.n_elems, kern.n_nodes

    for dtype, fbytes in ((jnp.float32, 4), (jnp.float64, 8)):
        CT = kern.prep(eq.mat.C.astype(dtype))   # once, as the Krylov loop does
        u = jnp.asarray(np.random.default_rng(0).normal(size=(N, 3)),
                        dtype=dtype)
        dt_iter = timed_loop(lambda v, CT=CT: kern.matvec(CT, v), u,
                             iters=200 if dtype == jnp.float32 else 50)
        # bytes/matvec: gather u (12 vals) + grad_N (12) + vol (1) + CT (36)
        # per element, scatter-add forces (12) + read/write result vector
        elem_bytes = (12 + 12 + 1 + 36 + 12) * fbytes * E
        node_bytes = 2 * 3 * fbytes * N
        gbps = (elem_bytes + node_bytes) / dt_iter / 1e9
        mdofs = 3 * N / dt_iter / 1e6
        log(f"matvec[{np.dtype(dtype).name}]: {dt_iter*1e6:.0f} us "
            f"({mdofs:.0f} MDOF/s, ~{gbps:.0f} GB/s = "
            f"{100*gbps/HBM_GBPS:.0f}% of HBM roofline)")

    if getattr(kern, "band", None) is not None:
        ctp = kern.band_pack_ct(kern.prep(eq.mat.C.astype(jnp.float32)))
        u = jnp.asarray(np.random.default_rng(0).normal(size=(N, 3)),
                        dtype=jnp.float32)
        dt_iter = timed_loop(lambda v: kern.band_matvec(ctp, v), u,
                             iters=500)
        elem_bytes = (12 + 12 + 1 + 36 + 12) * 4 * E
        node_bytes = 2 * 3 * 4 * N
        gbps = (elem_bytes + node_bytes) / dt_iter / 1e9
        log(f"matvec[pallas-band f32]: {dt_iter*1e6:.0f} us "
            f"({3*N/dt_iter/1e6:.0f} MDOF/s, ~{gbps:.0f} GB/s = "
            f"{100*gbps/HBM_GBPS:.0f}% of HBM roofline)")


def bench_tm(eq_mech, n_steps=5):
    """Second config (BASELINE.md): coupled thermomechanics on the same
    mesh - heat step + momentum fixed point per step (reference
    Simulator_TM regime, tol 1e-6 / <= 20 iters).

    Material set matches the reference's OWN TM cavern config
    (examples/thermomechanics/2_cavern/main.py:71-100): Spring + Kelvin +
    DislocationCreep + PressureSolutionCreep + Thermoelastic - NO Desai
    (the reference does not run viscoplastic hardening in its TM stage;
    its FD-secant hardening linearization is fragile under thermal-stress
    increments at dt=1h)."""
    import jax
    import jax.numpy as jnp
    import safeincave_tpu as sc
    heatBC = sc.HeatBC

    grid = eq_mech.grid
    n = grid.n_elems
    one = np.ones(n)
    heat = sc.HeatDiffusion(grid)
    heat.set_solver(sc.SolverSettings(method="cg", rtol=1e-12, max_it=400))

    eq = sc.LinearMomentum(grid, theta=0.5, auto_backend=_tm_band_ok())
    eq.set_solver(eq_mech.solver)
    mat = sc.Material(n)
    mat.set_density(2200.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    mat.add_to_non_elastic(sc.Viscoelastic(105e11 * one, 10e9 * one,
                                           0.32 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one, name="ds_creep"))
    mat.add_to_non_elastic(sc.PressureSolutionCreep(1e-22 * one, 1e-2 * one,
                                                    51600 * one,
                                                    name="ps_creep"))
    mat.add_to_thermoelastic(sc.Thermoelastic(44e-6 * one))
    mat.set_specific_heat_capacity(850.0 * one)
    mat.set_thermal_conductivity(7.0 * one)
    eq.set_material(mat)
    eq.build_body_force([0.0, 0.0, 0.0])
    # the BC handler is grid-based (facet tables), so the mechanical
    # loading carries over to the TM equation on the same mesh
    eq.set_boundary_conditions(eq_mech.bc)
    heat.set_material(mat)
    heat.set_initial_T(298.0 * jnp.ones(grid.n_nodes))

    # thermal BCs RAMP from the initial temperature (the reference TM
    # cavern example drives a smooth gas-temperature schedule,
    # examples/thermomechanics/2_cavern/main.py:269-349) - an instantaneous
    # Dirichlet jump would be a ~20 MPa/step thermal-stress shock that no
    # hardening linearization survives at dt=1h
    bc_h = heatBC.BcHandler(heat)
    names = grid.get_boundary_names()
    hr = 3600.0
    if "Top" in names:
        bc_h.add_boundary_condition(heatBC.DirichletBC(
            "Top", [298., 293., 293.], [0.0, 12 * hr, 1e12]))
    if "Cavern" in names:
        bc_h.add_boundary_condition(heatBC.RobinBC(
            "Cavern", [298., 283., 283.], 5.0, [0.0, 24 * hr, 1e12]))
    heat.set_boundary_conditions(bc_h)

    # initial state: elastic response + initial creep rates at T0
    T_el = heat.get_T_elems()
    eq.set_T0(T_el)
    eq.set_T(T_el)
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    eq.solve_elastic_response()
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()

    dt = 3600.0

    def run_tm(ts_list, dts_list):
        """Fused TM chunks with dt-halving retry for failed steps - the
        retry reuses the SAME compiled fused program (single-step chunk at
        dt/2), so no extra compile lands on the budget."""
        rows, retries = [], 0
        pending = list(zip(ts_list, dts_list))
        while pending:
            ts = [p[0] for p in pending]
            ds = [p[1] for p in pending]
            stats = eq.solve_tm_time_steps(heat, ts, ds, tol=1e-6,
                                           maxiter=20)
            conv = (stats[:, 5] > 0.5).astype(int)
            n_ok = int(conv.cumprod().sum())
            rows.extend(stats[:n_ok])
            if n_ok == len(pending):
                break
            t_f, d_f = pending[n_ok]
            ok = False
            for cut in (2, 4, 8):
                sub = eq.solve_tm_time_steps(heat, [t_f], [d_f / cut],
                                             tol=1e-6, maxiter=20)
                retries += 1
                if sub[0, 5] > 0.5:
                    rows.append(sub[0])
                    ok = True
                    break
            if not ok:
                log(f"TM step at t={t_f/3600:.0f}h failed at dt/8 - "
                    f"aborting TM section")
                break
            pending = pending[n_ok + 1:]
        return np.asarray(rows), retries

    t0 = time.time()
    run_tm([dt], [dt])
    import jax as _jax
    _jax.block_until_ready(eq.u)
    log(f"TM first fused step (incl. compile): {time.time()-t0:.2f}s")
    n_tm = 20
    t0 = time.time()
    stats, retries = run_tm([(k + 2) * dt for k in range(n_tm)],
                            [dt] * n_tm)
    _jax.block_until_ready(eq.u)
    per = (time.time() - t0) / max(len(stats), 1)
    log(f"TM config (fused driver): {per*1000:.1f} ms/step over "
        f"{len(stats)} steps ({stats[:, 2].mean():.1f} fp-iters/step, "
        f"{stats[:, 4].mean():.0f} krylov-iters/step, heat "
        f"{stats[:, 0].mean():.0f} cg-iters/step, {retries} dt-retries, "
        f"err={stats[-1, 3]:.1e})")


def timed_loop(step, x, iters=200, calls=3):
    """Per-iteration wall-clock of ``step`` inside one on-device fori_loop.

    Measurement contract (learned the hard way in r03): a jit CALL through
    the axon tunnel can carry tens of ms of fixed dispatch overhead, so
    per-op timings MUST amortize over a long on-device loop (>= 200
    iterations caps the pollution at ~0.15 ms/iter) and take the min over
    several calls.  Short 20-iter loops overstated r02's kernel times by
    up to 1.3 ms/iter, which is why those roofline numbers were junk at
    small sizes.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jax.lax.fori_loop(
        0, iters,
        lambda _, v: (lambda w: w / jnp.sqrt(
            jnp.vdot(w.reshape(-1), w.reshape(-1))))(step(v)), x))
    jax.block_until_ready(f(x))             # compile
    best = float("inf")
    for _ in range(calls):
        t0 = time.time()
        jax.block_until_ready(f(x))
        best = min(best, (time.time() - t0) / iters)
    return best


def bench_matvec_scale(nx=44):
    """SpMV bandwidth at PRODUCTION scale (BASELINE.md SpMV row).

    The cavern meshes are small (24-33k tets): one matvec touches ~7 MB,
    so wall-clock there is op-count/latency, not bandwidth.  This section
    measures where the roofline argument applies: a ~500k-tet box
    (~50 MB/matvec), the scale the reference targets with PETSc MPI runs
    (SURVEY.md 6: reference grids go to 10^5-10^6 tets multi-node).

    The measured operator is the production one for this regime: the
    block-DIA offset operator (fem/dia.py) that LinearMomentum
    auto-selects on natural-ordered structured grids - Pallas shift
    kernel in f32, XLA loop in f64 - plus its scatter-free structured
    assembly, with the matrix-free cumsum kernel for contrast.  Bytes
    are counted two ways: "streamed" = the value planes + u actually
    moved (Dn*9*N + 6N), and "effective" = true-nonzero bytes only
    (n_pairs*9 + 6N; the honest number, discounting the 3.5% slot
    padding)."""
    import jax
    import jax.numpy as jnp
    import safeincave_tpu as sc
    from safeincave_tpu.fem.kernels import MomentumKernel
    from safeincave_tpu.fem.dia import BlockDIA

    grid = sc.GridBox(Lx=600.0, Ly=600.0, Lz=800.0, nx=nx, ny=nx, nz=nx)
    kern = MomentumKernel(grid)
    E, N = kern.n_elems, kern.n_nodes
    one = np.ones(E)
    mat = sc.Material(E)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))

    dia = BlockDIA(kern)
    p = dia.plan
    log(f"[scale] box mesh: {N} nodes, {E} tets, {3*N} dofs; "
        f"DIA {p.Dn} offsets at {p.fill:.3f} fill, structured assembly: "
        f"{dia.structured}")

    # hard-ceiling calibration: the bandwidth THIS chip actually achieves
    # on a pure streaming copy (r+w) through XLA.  The 819 GB/s nominal
    # v5e roofline is not reachable by any compiled elementwise kernel
    # here (measured ~490 GB/s); quoting the matvec against the measured
    # ceiling is the honest efficiency number.
    big = jnp.ones((32 * 1024 * 1024,), jnp.float32)      # 128 MB
    sc_ = jnp.float32(1.0000001)
    fcopy = jax.jit(lambda x: jax.lax.fori_loop(
        0, 100, lambda _, v: v * sc_, x))
    jax.block_until_ready(fcopy(big))
    t0 = time.time()
    jax.block_until_ready(fcopy(big))
    dt_copy = (time.time() - t0) / 100
    ceiling = 2 * big.size * 4 / dt_copy / 1e9
    log(f"[scale] streaming-copy calibration: {ceiling:.0f} GB/s achieved "
        f"({100*ceiling/HBM_GBPS:.0f}% of the {HBM_GBPS:.0f} GB/s nominal)")
    CT64 = kern.prep(mat.C)
    vals64 = dia.assemble(CT64)
    rng = np.random.default_rng(0)

    best_gbps = 0.0
    for dtype, fbytes in ((jnp.float32, 4), (jnp.float64, 8)):
        vals = vals64.astype(dtype)
        u = jnp.asarray(rng.normal(size=(N, 3)), dtype=dtype)
        dt_iter = timed_loop(lambda v, vals=vals: dia.matvec(vals, v), u,
                             iters=500 if dtype == jnp.float32 else 100)
        streamed = (p.Dn * 9 * N + 6 * N) * fbytes
        effective = (p.n_pairs * 9 + 6 * N) * fbytes
        name = np.dtype(dtype).name
        kind = "pallas-shift" if dtype == jnp.float32 else "xla-shift"
        log(f"[scale] matvec[block-DIA {kind} {name}]: "
            f"{dt_iter*1e6:.0f} us ({3*N/dt_iter/1e6:.0f} MDOF/s, "
            f"{streamed/dt_iter/1e9:.0f} GB/s streamed = "
            f"{100*streamed/dt_iter/1e9/HBM_GBPS:.0f}% of nominal / "
            f"{100*streamed/dt_iter/1e9/ceiling:.0f}% of measured ceiling, "
            f"{effective/dt_iter/1e9:.0f} GB/s effective)")
        if dtype == jnp.float32:
            best_gbps = streamed / dt_iter / 1e9

    # assembly cost (once per linearized solve; f32 is the production
    # mixed-precision path, fem/momentum.py solve_lin)
    for dtype in (jnp.float32, jnp.float64):
        CTd = CT64.astype(dtype)
        fa = jax.jit(lambda c: jax.lax.fori_loop(
            0, 10, lambda i, acc: acc + dia.assemble(c).sum(),
            jnp.zeros((), dtype)))
        jax.block_until_ready(fa(CTd))
        t0 = time.time()
        jax.block_until_ready(fa(CTd))
        log(f"[scale] assemble[{np.dtype(dtype).name}]: "
            f"{(time.time()-t0)/10*1e3:.1f} ms "
            f"(scatter-free strided, once per linearized solve)")

    # matrix-free cumsum kernel for contrast (the small-mesh default)
    CT32 = kern.prep(mat.C.astype(jnp.float32))
    u32 = jnp.asarray(rng.normal(size=(N, 3)), dtype=jnp.float32)
    dt_iter = timed_loop(lambda v: kern.matvec(CT32, v), u32, iters=20)
    log(f"[scale] matvec[matrix-free cumsum f32]: {dt_iter*1e6:.0f} us "
        f"({3*N/dt_iter/1e6:.0f} MDOF/s) - gather/scatter-bound, "
        f"why the assembled operator owns this regime")
    return best_gbps


def build_tm_cyclic(grid_name, fallback, label, reorder="band"):
    """BASELINE configs 4-5 builder: coupled-TM cyclic loading on the
    1200-class / interlayer meshes (TM regime
    examples/thermomechanics/2_cavern/main.py:269-349).  Returns (eq, heat).

    Single-region meshes (cavern_regular_1200_3D) get the KV + dislocation-
    creep suite; meshes with Interlayer_* regions get the reference nobian
    heterogeneous regime (run_interlayer.py:1194-1241,1617-1680):
    dislocation creep in the salt (prefactor zeroed on interlayers) +
    Mohr-Coulomb viscoplastic interlayers (fluidity zeroed on salt) - the
    reference's own per-cell masking idiom.  (Munson-Dawson salt needs the
    reference's equilibrium warm-start to converge from a cold state - see
    tests/golden_configs.build_interlayer_tm - so the benchmarked TM-cyclic
    regime uses the DC-salt scenario.)"""
    import jax.numpy as jnp
    import safeincave_tpu as sc
    from safeincave_tpu.utils import find_grid
    momBC = sc.MomentumBC
    heatBC = sc.HeatBC

    path = find_grid(grid_name, fallback=fallback)
    grid = sc.GridHandlerGMSH("geom", path, reorder=reorder)
    regions = grid.get_subdomain_names()
    log(f"[{label}] mesh: {os.path.basename(os.path.dirname(path))} "
        f"({grid.n_nodes} nodes, {grid.n_elems} tets, "
        f"regions={regions})")
    has_inter = any("nterlayer" in r for r in regions)

    # region-keyed parameters (reference get_parameter idiom); the repo-
    # owned cavern_interlayer_1200 mesh adds an "Overburden" cap region
    # (non-salt rock: stiffer KV, no dislocation creep, no MC flow)
    def per_region(salt_val, inter_val, over_val=None):
        if over_val is None:
            over_val = salt_val
        return np.asarray(grid.get_parameter(
            {r: (inter_val if "nterlayer" in r
                 else over_val if "verburden" in r else salt_val)
             for r in regions}))

    n = grid.n_elems
    one = np.ones(n)
    inter = per_region(0.0, 1.0, 0.0)
    over = per_region(0.0, 0.0, 1.0)
    salt = 1.0 - inter - over
    eq = sc.LinearMomentum(grid, theta=0.5, auto_backend=_tm_band_ok())
    # same solver regime as the headline config: always-tight solves (the
    # library default; see the headline config note for the measurement
    # that retired adaptive_rtol from the bench regime)
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                    max_it=400, coarse_agg=8))
    mat = sc.Material(n)
    mat.set_density(2200.0 * salt + 2900.0 * inter + 2500.0 * over)
    E = 102e9 * salt + 70e9 * inter + 35e9 * over
    nu = 0.30 * salt + 0.27 * inter + 0.25 * over
    mat.add_to_elastic(sc.Spring(E, nu))
    mat.add_to_non_elastic(sc.Viscoelastic(
        per_region(105e11, 105e13, 105e13), 10e9 * one, 0.32 * one))
    if has_inter:
        # salt creep masked off the interlayers AND the overburden cap
        # (run_interlayer.py per-cell masking idiom)
        mat.add_to_non_elastic(sc.DislocationCreep(
            1.9e-20 * salt, 51600 * one, 3.0 * one, name="ds_creep"))
        # Mohr-Coulomb interlayers (run_interlayer.py:1617-1660)
        mat.add_to_non_elastic(sc.MohrCoulombViscoplastic(
            mu_1=1e-9 * inter, N_1=1.0 * one, cohesion=4.0 * one,
            friction_angle=np.radians(35.0) * one,
            dilation_angle=0.0 * one, sigma_t=1.0 * one))
    else:
        mat.add_to_non_elastic(sc.DislocationCreep(
            1.9e-20 * one, 51600 * one, 3.0 * one, name="ds_creep"))
    mat.add_to_thermoelastic(sc.Thermoelastic(44e-6 * one))
    mat.set_specific_heat_capacity(850.0 * one)
    mat.set_thermal_conductivity(7.0 * one)
    eq.set_material(mat)
    T0 = 298.0
    eq.set_T0(T0 * one)
    eq.set_T(T0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])

    names = grid.get_boundary_names()
    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e12]
    MPa = 1e6
    for nm, comp in (("West", 0), ("South", 1), ("Bottom", 2),
                     ("WEST", 0), ("SOUTH", 1), ("BOTTOM", 2)):
        if nm in names:
            bc.add_boundary_condition(momBC.DirichletBC(nm, comp,
                                                        [0., 0.], tv))
    t_sched = np.arange(0.0, 400 * 3600.0, 3600.0)
    if has_inter:
        # overburden above the cavern-pressure band keeps the state
        # compressive (MC tension cut-off flow cannot settle otherwise)
        p_sched = 8 * MPa + 2 * MPa * np.sin(2 * np.pi * t_sched
                                             / (24 * 3600.0))
        for nm in ("Top", "TOP"):
            if nm in names:
                bc.add_boundary_condition(momBC.NeumannBC(
                    nm, 2, 0.0, 0.0, [15 * MPa, 15 * MPa], tv, g=0.0))
        if "Cavern" in names:
            bc.add_boundary_condition(momBC.NeumannBC(
                "Cavern", 2, 0.0, 0.0, list(p_sched), list(t_sched),
                g=0.0))
    else:
        p_sched = 10 * MPa + 4 * MPa * np.sin(2 * np.pi * t_sched
                                              / (24 * 3600.0))
        for nm in ("Top", "TOP", "Cavern"):
            if nm in names:
                bc.add_boundary_condition(momBC.NeumannBC(
                    nm, 2, 0.0, 0.0, list(p_sched), list(t_sched), g=0.0))
    eq.set_boundary_conditions(bc)

    heat = sc.HeatDiffusion(grid)
    heat.set_solver(sc.SolverSettings(method="cg", rtol=1e-12, max_it=400))
    heat.set_material(mat)
    heat.set_initial_T(T0 * jnp.ones(grid.n_nodes))
    bc_h = heatBC.BcHandler(heat)
    hr = 3600.0
    if "Top" in names:
        bc_h.add_boundary_condition(heatBC.DirichletBC(
            "Top", [T0, 293., 293.], [0.0, 12 * hr, 1e12]))
    if "Cavern" in names:
        bc_h.add_boundary_condition(heatBC.RobinBC(
            "Cavern", [T0, 283., 283.], 5.0, [0.0, 24 * hr, 1e12]))
    heat.set_boundary_conditions(bc_h)
    return eq, heat


def init_tm(eq, heat, label=""):
    """Elastic response + initial creep rates at T0 (the TM init sequence)."""
    import jax
    T_el = heat.get_T_elems()
    eq.set_T0(T_el)
    eq.set_T(T_el)
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    t0 = time.time()
    eq.solve_elastic_response()
    jax.block_until_ready(eq.u)
    if label:
        log(f"[{label}] elastic solve (incl. compile): {time.time()-t0:.1f}s")
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()


def bench_tm_cyclic(grid_name, fallback, label, baseline_key=None,
                    n_steps=10):
    """Timed fused-driver run of a build_tm_cyclic config, with the
    measured-CPU-baseline ratio when baseline_measured.json has the row."""
    import jax

    eq, heat = build_tm_cyclic(grid_name, fallback, label)
    init_tm(eq, heat, label)

    dt = 3600.0
    t0 = time.time()
    stats = eq.solve_tm_time_steps(heat, [dt], [dt], tol=1e-6, maxiter=20)
    jax.block_until_ready(eq.u)
    log(f"[{label}] TM first fused step (incl. compile): "
        f"{time.time()-t0:.1f}s (conv={int(stats[0, 5])})")
    t0 = time.time()
    stats = eq.solve_tm_time_steps(
        heat, [(k + 2) * dt for k in range(n_steps)], [dt] * n_steps,
        tol=1e-6, maxiter=20)
    jax.block_until_ready(eq.u)
    conv = (stats[:, 5] > 0.5)
    n_ok = int(conv.astype(int).cumprod().sum())
    per = (time.time() - t0) / max(n_ok, 1)
    ratio = measured_ratio(baseline_key, per) if baseline_key else None
    vs = (f", vs measured CPU baseline "
          f"{MEASURED[baseline_key]['s_per_step']:.2f} s/step = "
          f"{ratio:.1f}x" if ratio else "")
    log(f"[{label}] TM cyclic (fused driver): {per*1000:.1f} ms/step over "
        f"{n_ok}/{n_steps} steps ({stats[:n_ok, 2].mean():.1f} "
        f"fp-iters/step, {stats[:n_ok, 4].mean():.0f} krylov-iters/step, "
        f"heat {stats[:n_ok, 0].mean():.0f} cg-iters/step){vs}")


_digest_memo = {}


def _tm_band_ok():
    """Whether the TM / secondary sections may auto-select the Pallas band
    backend: only when BENCH_NO_BAND is unset AND a prior full bench run
    has proven this code state's TM band programs are in the persistent
    cache (tm_band_ok.digest, written after all TM-cyclic sections
    complete band-enabled).  The headline probe only warms the cavern600
    headline programs; a cache-cold band Mosaic compile of a 1200-class TM
    program costs ~500 s and silently eats its section (ADVICE r04).
    BENCH_WARM_ALL=1 overrides - used by warm-up runs that intend to pay
    the cold compiles."""
    if os.environ.get("BENCH_NO_BAND") == "1":
        return False
    if os.environ.get("BENCH_WARM_ALL") == "1":
        return True
    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    try:
        with open(os.path.join(cache_dir, "tm_band_ok.digest")) as f:
            return f.read().strip() == _probe_digest()
    except OSError:
        return False


def _probe_digest():
    """Fingerprint of everything that determines the headline programs'
    compile-cache keys: package + bench source, jax version, and the
    resolved headline mesh.  If nothing changed since the last successful
    probe, the band programs are still in the persistent cache and the
    ~150 s child probe can be skipped outright (measured: a WARM probe
    child still costs ~148 s - jax init + grid build/reorder + cache
    loads - dangerously close to its own deadline)."""
    if "v" in _digest_memo:
        return _digest_memo["v"]
    import hashlib
    import jax
    h = hashlib.sha256()
    here = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(here, "safeincave_tpu")
    for root, dirs, files in os.walk(pkg):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                h.update(fn.encode())
                with open(os.path.join(root, fn), "rb") as f:
                    h.update(f.read())
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(f.read())
    h.update(jax.__version__.encode())
    try:
        from safeincave_tpu.utils import find_grid
        gdir = find_grid("cavern_regular_600_3D", fallback="cavern_proxy_600")
        msh = os.path.join(gdir, "geom.msh")
        h.update(msh.encode())
        h.update(str(os.path.getsize(msh)).encode())
    except Exception:
        h.update(b"no-grid")
    _digest_memo["v"] = h.hexdigest()
    return _digest_memo["v"]


def main():
    """Headline-first layout.

    Through the tunneled TPU a COLD compile of one fused program can cost
    minutes (round-1 post-mortem: the benchmark timed out inside its third
    big compile and never printed its JSON).  So the run is ordered by
    what it must not lose: the headline needs exactly ONE big program (the
    fused multi-step driver); everything else - matvec roofline, the
    per-step host-sync comparison (its own big program), the TM config
    (another) - is optional, runs strictly after the headline JSON is on
    stdout, and is gated by the remaining time budget (BENCH_BUDGET_S,
    default 540 s).  The persistent compile cache (repo-local .jax_cache -
    /tmp does not survive to the driver's bench run) makes warm reruns
    report every section.
    """
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "540"))
    on_cpu = "cpu" in (os.environ.get("JAX_PLATFORMS") or "axon")

    # ---- d2h init warm kick (r05 post-mortem) -------------------------- #
    # The tunneled TPU's device-to-host path pays a ONE-TIME per-process
    # initialisation of ~90-500 s (variable with tunnel load) on the first
    # blocking transfer; compute dispatch and h2d are unaffected.  Kick it
    # asynchronously NOW so it overlaps the band probe + build + compiles,
    # and absorb any remainder explicitly before the timed headline chunk
    # (see the init-absorb fetch below).  r04's benchmark died exactly
    # here: its first d2h (then: a jit-captured device constant at lowering
    # time) sat in this init until the watchdog fired.
    import jax
    import safeincave_tpu  # noqa: F401  (x64)
    if not on_cpu:
        safeincave_tpu.jax_setup.warm_transfer()

    # ---- band cold-compile probe (r03/r04 post-mortem) ----------------- #
    # The Pallas band backend is ~1.7x faster per step than the matrix-free
    # kernel on this chip, but a COLD Mosaic compile of the two headline
    # programs costs ~500 s EACH through the tunnel (measured 2026-08-20:
    # elastic 496 s, fused 20-step chunk 567 s).  With a warm persistent
    # cache this is seconds, and the probe guarantees the headline backend
    # is one that has already finished these exact programs on this machine.
    # Warm cache -> child finishes fast and the parent compiles from cache.
    # Cold cache -> child is killed and the parent falls back to the
    # matrix-free kernel.  BENCH_NO_PROBE=1 skips the child (trust the
    # cache); BENCH_NO_BAND=1 skips band entirely.
    probe_s = float(os.environ.get("BENCH_PROBE_S", "210"))
    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    n_cached = (len(os.listdir(cache_dir)) if os.path.isdir(cache_dir)
                else 0)
    marker = os.path.join(cache_dir, "band_probe_ok.digest")
    if (os.environ.get("BENCH_NO_BAND") != "1" and not on_cpu
            and n_cached < 20):
        # cache is cold: the probe would burn its full deadline discovering
        # what we already know - no compiled band program exists.  Skip
        # straight to the matrix-free kernel and keep the time for the
        # headline's own cold compiles.
        os.environ["BENCH_NO_BAND"] = "1"
        log(f"cache cold ({n_cached} entries) - skipping band probe, "
            f"using the matrix-free kernel for every section")
    if (os.environ.get("BENCH_NO_BAND") != "1" and not on_cpu
            and os.environ.get("BENCH_NO_PROBE", "0") != "1"):
        t0 = time.time()
        digest = _probe_digest()
        prev = None
        try:
            with open(marker) as f:
                prev = f.read().strip()
        except OSError:
            pass
        if prev == digest:
            log(f"band probe: skipped - code/mesh digest unchanged since "
                f"the last successful probe ({time.time()-t0:.0f}s)")
        else:
            import subprocess
            ok, why = False, ""
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--probe"],
                    timeout=probe_s, capture_output=True)
                ok = r.returncode == 0
                if not ok:
                    why = (r.stderr or b"")[-400:].decode(errors="replace")
            except subprocess.TimeoutExpired:
                why = f"deadline {probe_s:.0f}s exceeded"
            if ok:
                log(f"band probe: headline programs ready (cache warm) "
                    f"in {time.time()-t0:.0f}s")
                try:
                    with open(marker, "w") as f:
                        f.write(digest)
                except OSError:
                    pass
            else:
                os.environ["BENCH_NO_BAND"] = "1"
                log(f"band probe failed ({why.strip() or 'killed'}) - "
                    f"falling back to the matrix-free kernel for every "
                    f"section")

    import jax
    import safeincave_tpu  # noqa: F401  (x64)

    def remaining():
        return budget - (time.time() - t_start)

    # Hard safety net: the driver kills the benchmark process at its own
    # timeout (rc=124, r01 post-mortem) - a kill AFTER the headline JSON
    # still reads as "benchmark failed".  A watchdog slightly past the
    # budget exits 0 cleanly with whatever sections completed, so a section
    # that mis-estimates its cost (e.g. an unexpected cold compile)
    # degrades to "sections skipped", never to a dead benchmark.  A thread
    # (not SIGALRM: Python signal handlers only run between bytecodes, and
    # a cold XLA compile blocks the main thread in C for minutes - measured
    # 253 s of alarm latency) so the exit fires even mid-compile.
    alarm_s = float(os.environ.get("BENCH_ALARM_S", budget + 20))

    def _watchdog():
        # sleep relative to t_start, not thread start: the health/band
        # probes above may have consumed minutes already, and the clean
        # exit must beat the driver's hard kill (ADVICE r04)
        time.sleep(max(0.0, alarm_s - (time.time() - t_start)))
        log(f"BENCH_WATCHDOG after {time.time()-t_start:.0f}s - exiting "
            f"cleanly with completed sections")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    import threading
    threading.Thread(target=_watchdog, daemon=True).start()

    def section(name):
        log(f"[t+{time.time()-t_start:.0f}s] section: {name} "
            f"(remaining {remaining():.0f}s)")

    eq = build()
    dofs = eq.n_nodes * 3
    log(f"devices: {jax.devices()}  dofs: {dofs}")

    # Optimistic/deferred stats through the whole headline phase: every
    # host readback races a possible tunnel d2h wedge, so timing relies on
    # block_until_ready (which keeps working when d2h wedges) and every
    # stats fetch runs under an explicit deadline.
    eq._defer_stats = True
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    t0 = time.time()
    eq.solve_elastic_response()
    jax.block_until_ready(eq.u)
    el_s = time.time() - t0
    st = fetch(jax.numpy.stack([eq.solver_stats[0] * 1.0,
                                eq.solver_stats[1]]), 5, "elastic stats")
    log(f"elastic solve (incl. compile): {el_s:.2f}s"
        + (f", krylov iters={int(st[0])}, res={st[1]:.2e}"
           if st is not None else " (stats fetch pending)"))
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()

    dt = 3600.0
    n_steps = 20

    # production driver: Simulator_M auto-fuses the steps between output/
    # checkpoint boundaries into one device dispatch (solve_time_steps);
    # per-step convergence control runs ON DEVICE with identical
    # commit-only-if-converged semantics, the host syncs once per chunk.
    # A step the chunk could not converge is re-attempted pure-f64 from its
    # preserved entry state - exactly Simulator_M's retry flow - and counts
    # toward the measured wall-clock.  (The retry compiles the single-step
    # program; it only runs if a chunk actually fails.)
    def run_chunk(ts_list):
        rows, retries = [], 0
        pending = list(ts_list)
        while pending:
            stats = eq.solve_time_steps(pending, [dt] * len(pending),
                                        tol=1e-8, maxiter=40)
            conv = (stats[:, 5] > 0.5).astype(int)
            n_ok = int(conv.cumprod().sum())
            rows.extend(stats[:n_ok])
            if n_ok == len(pending):
                break
            eq._fp32_disable = True     # retry the failed step pure-f64
            ite, errv = eq.solve_time_step(pending[n_ok], dt, tol=1e-8,
                                           maxiter=40)
            eq._fp32_disable = False
            assert errv <= 1e-8, f"f64 retry failed: err={errv:.3e}"
            eq.commit_time_step(dt)
            rows.append(np.asarray([ite, errv, eq.krylov_total,
                                    eq.solver_stats[0], eq.solver_stats[1],
                                    1.0]))
            retries += 1
            pending = pending[n_ok + 1:]
        return np.asarray(rows), retries

    # Optimistic first pass: dispatch both chunks with DEFERRED stats and
    # time them via block_until_ready only - no host readback sits between
    # the benchmark and its headline.  The stats are then fetched under a
    # deadline: if they arrive and show every step converged (the proven
    # behaviour of this config: r02/r04 runs had 0 retries), the headline
    # is fully verified; if a step failed, fall back to the retrying
    # run_chunk path (d2h works in that branch, since the stats arrived);
    # if the fetch wedged, report the wall-clock headline with
    # "stats_verified": false rather than no headline at all.
    t0 = time.time()
    rows1 = eq.solve_time_steps([(k + 1) * dt for k in range(n_steps)],
                                [dt] * n_steps, tol=1e-8, maxiter=40,
                                sync_stats=False)
    jax.block_until_ready(eq.u)
    log(f"first fused chunk ({n_steps} steps, incl. compile): "
        f"{time.time()-t0:.2f}s")
    # init-absorb: make sure the one-time d2h path initialisation (see the
    # warm kick above) has fully completed BEFORE the timed window, so the
    # timed chunk's dispatches don't queue behind it and its stats fetch is
    # the normal ~ms transfer.  Deadline: whatever budget can spare while
    # keeping ~150 s for the timed chunk + headline.
    if not on_cpu:
        t0 = time.time()
        absorb_s = max(10.0, min(420.0, remaining() - 150.0))
        ok = fetch(jax.numpy.zeros(8), absorb_s, "d2h init absorb")
        state = ("ready" if ok is not None
                 else "STILL pending - timed chunk may queue behind it")
        log(f"d2h init absorbed in {time.time()-t0:.1f}s ({state})")
    t0 = time.time()
    t01 = (n_steps + 1) * dt
    rows2 = eq.solve_time_steps([t01 + k * dt for k in range(n_steps)],
                                [dt] * n_steps, tol=1e-8, maxiter=40,
                                sync_stats=False)
    jax.block_until_ready(eq.u)
    elapsed = time.time() - t0
    per_step = elapsed / n_steps
    verified = False
    stats = fetch(jax.numpy.stack([rows1, rows2]), 90, "fused-chunk stats")
    if stats is not None and (stats[:, :, 5] > 0.5).all():
        verified = True
        s2 = stats[1]
        log(f"{n_steps} steps (fused driver): {elapsed:.3f}s "
            f"({per_step*1000:.1f} ms/step, {s2[:, 0].mean():.1f} "
            f"fp-iters/step, {s2[:, 2].mean():.0f} krylov-iters/step, "
            f"0 f64 retries), final err={s2[-1, 1]:.2e}")
    elif stats is not None:
        # a step failed: re-measure on a fresh window with the full
        # dt-retry semantics (the production Simulator_M flow)
        log(f"optimistic pass had non-converged steps "
            f"(chunk1 {int((stats[0, :, 5] > 0.5).sum())}/{n_steps}, "
            f"chunk2 {int((stats[1, :, 5] > 0.5).sum())}/{n_steps}) - "
            f"re-measuring with the retrying driver")
        t_base = (2 * n_steps + 2) * dt
        t0 = time.time()
        s2, retries = run_chunk([t_base + k * dt for k in range(n_steps)])
        elapsed = time.time() - t0
        per_step = elapsed / n_steps
        verified = True
        log(f"{n_steps} steps (fused driver, retrying): {elapsed:.3f}s "
            f"({per_step*1000:.1f} ms/step, {s2[:, 0].mean():.1f} "
            f"fp-iters/step, {s2[:, 2].mean():.0f} krylov-iters/step, "
            f"{retries} f64 retries), final err={s2[-1, 1]:.2e}")
    else:
        log(f"{n_steps} steps (fused driver): {elapsed:.3f}s "
            f"({per_step*1000:.1f} ms/step; stats unverified - d2h wedged, "
            f"convergence behaviour of this exact config on this mesh: "
            f"r02/r04 all-converged with 0 retries)")

    # ---- headline on stdout NOW; everything below is best-effort -------- #
    headline = {
        "metric": "newton_step_wallclock_cavern600",
        "value": round(per_step, 5),
        "unit": "s/step",
        "vs_baseline": round(REFERENCE_SECONDS_PER_STEP / per_step, 2),
    }
    if not verified:
        headline["stats_verified"] = False
    r = measured_ratio("cavern600_mech", per_step)
    if r:
        headline["vs_baseline_measured"] = round(r, 2)
        log(f"vs measured CPU baseline "
            f"{MEASURED['cavern600_mech']['s_per_step']:.2f} s/step = "
            f"{r:.1f}x ({MEASURED['cavern600_mech'].get('notes', '')})")
    print(json.dumps(headline), flush=True)
    eq._defer_stats = False
    if getattr(eq.kernel, "band", None) is not None:
        # the band headline programs just compiled+ran to completion, so
        # they are in the persistent cache for this code state - future
        # runs may skip the probe child outright
        try:
            with open(marker, "w") as f:
                f.write(_probe_digest())
        except OSError:
            pass

    # Section budget gates are sized for the WARM-cache runs the driver
    # performs (the repo-local .jax_cache is re-warmed for the final code
    # state before each round ends and survives the inter-session /tmp
    # wipe); the watchdog above catches mis-estimates.
    # Priority order (VERDICT r02): production-scale roofline first, then
    # the two named TM-cyclic configs with their measured baselines, then
    # the cavern600 secondary sections.
    if os.environ.get("BENCH_HEADLINE_ONLY", "0") == "1":
        log("BENCH_HEADLINE_ONLY=1 - skipping optional sections")
        return
    try:
        if remaining() > 90:
            section("matvec roofline at scale (500k-tet box)")
            bench_matvec_scale()
        else:
            log("skipping scale matvec section (budget)")
    except Exception as exc:
        log(f"scale matvec section failed: {exc}")

    # BASELINE configs 4-5: 1200-class TM cyclic + interlayer multi-material.
    # interlayer1200-TM names the repo-OWNED heterogeneous production mesh
    # (grids/cavern_interlayer_1200, 6 regions incl. Overburden) directly -
    # config 5 with no reference checkout required.
    tm_ok = 0
    for grid_name, fb, label, bkey in (
            ("cavern_regular_1200_3D", "cavern_proxy_1200",
             "regular1200-TM", "regular1200_tm"),
            ("cavern_interlayer_1200", None,
             "interlayer1200-TM", "interlayer1200_tm"),
            ("cavern_interlayer_600_3D", "cavern_interlayer_proxy",
             "interlayer600-TM", "interlayer600_tm")):
        try:
            if remaining() > 130:
                section(label)
                bench_tm_cyclic(grid_name, fb, label, baseline_key=bkey)
                tm_ok += 1
            else:
                log(f"skipping {label} (budget)")
        except Exception as exc:
            log(f"{label} failed: {exc}")
    if tm_ok == 3 and _tm_band_ok():
        # every TM-cyclic section completed band-enabled: their band
        # programs are now in the persistent cache for this code state, so
        # future runs (the driver's scored run) may band-select them safely
        try:
            with open(os.path.join(os.environ["JAX_COMPILATION_CACHE_DIR"],
                                   "tm_band_ok.digest"), "w") as f:
                f.write(_probe_digest())
        except OSError:
            pass

    try:
        if remaining() > 60:
            section("matvec roofline (cavern600)")
            bench_matvec(eq)
        else:
            log("skipping matvec section (budget)")
    except Exception as exc:
        log(f"matvec section failed: {exc}")

    try:
        if remaining() > 150:
            section("TM coupled config (cavern600)")
            bench_tm(eq)
        else:
            log("skipping TM section (budget)")
    except Exception as exc:  # secondary metric must not kill the headline
        log(f"TM config failed: {exc}")

    try:
        if remaining() > 180:
            section("per-step host-sync comparison")
            bench_hostsync(eq, dt, n_steps)
        else:
            log("skipping per-step host-sync section (budget)")
    except Exception as exc:
        log(f"host-sync section failed: {exc}")


def bench_hostsync(eq, dt, n_steps):
    """Reference-style per-step host-controlled loop (comparison mode).

    Compiles the single-step program - a second multi-minute cold compile
    through the tunnel, which is why this runs only after the headline."""
    import jax
    t_base = (3 * n_steps + 2) * dt
    t0 = time.time()
    ite, err = eq.solve_time_step(t_base, dt, tol=1e-8, maxiter=40)
    jax.block_until_ready(eq.u)
    log(f"first per-step solve (incl. compile): {time.time()-t0:.2f}s, "
        f"iters={ite}, err={err:.2e}, krylov_total={eq.krylov_total}")
    eq.commit_time_step(dt)

    iters_total = 0
    kry_total = 0
    t0 = time.time()
    for k in range(n_steps):
        t = t_base + (k + 1) * dt
        ite, err = eq.solve_time_step(t, dt, tol=1e-8, maxiter=40)
        iters_total += ite
        kry_total += eq.krylov_total
        eq.commit_time_step(dt)
    jax.block_until_ready(eq.u)
    elapsed = time.time() - t0
    log(f"{n_steps} steps (per-step host sync): {elapsed:.3f}s "
        f"({elapsed/n_steps*1000:.1f} ms/step, "
        f"{iters_total/n_steps:.1f} fp-iters/step, "
        f"{kry_total/n_steps:.0f} krylov-iters/step), final err={err:.2e}, "
        f"last-solve res={eq.solver_stats[1]:.2e}")


def probe():
    """Child-process probe: compile (or load from the persistent cache) the
    exact two headline programs - elastic solve + fused 20-step chunk - and
    exit 0.  Killed by the parent's deadline when the cache is cold (a cold
    Mosaic compile of the band programs costs ~500 s each).  build() is
    deterministic, so the jaxprs - and therefore the cache keys - match the
    parent's headline phase exactly."""
    import jax
    import safeincave_tpu  # noqa: F401  (x64)
    t0 = time.time()

    def mark(what):
        log(f"probe[t+{time.time()-t0:.0f}s]: {what}")
    eq = build()
    mark("build done")
    eq._defer_stats = True     # no host readbacks - compile is the point
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    eq.solve_elastic_response()
    jax.block_until_ready(eq.u)
    mark("elastic solve ready")
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()
    dt, n = 3600.0, 20
    eq.solve_time_steps([(k + 1) * dt for k in range(n)], [dt] * n,
                        tol=1e-8, maxiter=40, sync_stats=False)
    jax.block_until_ready(eq.u)
    mark("fused chunk ready")
    log("probe: headline programs compiled")


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe()
    else:
        main()
