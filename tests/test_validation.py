"""Quantitative validation: convergence order + physics benchmarks.

The reference validates through tutorial cases compared against published
results (README.md papers table; SURVEY.md §4).  These tests are the
framework's quantitative counterparts:

* isentropic-vortex grid refinement -> discretization order of the QGDFoam
  operator stack (fvsc vertex gradients + central fluxes).  The QGD
  regularization is O(tau); with the constTau model and tau ~ h^2 the
  scheme's formal second order is observable (standard QGD verification
  practice — with the production tau = alpha*h/c the regularization itself
  is a first-order term, by design).
* Taylor-Green vortex viscous decay -> QHDFoam kinetic-energy decay rate
  vs the exact 2*nu*k^2 rate.
* differentially-heated cavity -> Nusselt number vs the de Vahl Davis
  (1983) benchmark at Ra = 1e3.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import PerfectGasThermo, RhoConstThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstTau, H2bynuQHD
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam
from qgdsolver_tpu.solvers.qhd import QHDFoam


# ---------------------------------------------------------------------------
# isentropic vortex (Shu): exact Euler solution advected with the free stream
# ---------------------------------------------------------------------------

GAMMA = 1.4
BETA_V = 5.0
U_INF = (1.0, 1.0)
L_DOM = 10.0


def _vortex_primitives(x, y, t):
    """rho, u, v, p of the isentropic vortex at time t (periodic domain)."""
    xc = (5.0 + U_INF[0] * t) % L_DOM
    yc = (5.0 + U_INF[1] * t) % L_DOM
    # nearest periodic image
    dx = (x - xc + L_DOM / 2) % L_DOM - L_DOM / 2
    dy = (y - yc + L_DOM / 2) % L_DOM - L_DOM / 2
    r2 = dx * dx + dy * dy
    ex = np.exp(0.5 * (1.0 - r2))
    u = U_INF[0] - BETA_V / (2 * np.pi) * ex * dy
    v = U_INF[1] + BETA_V / (2 * np.pi) * ex * dx
    dT = -(GAMMA - 1.0) * BETA_V**2 / (8.0 * GAMMA * np.pi**2) * np.exp(1.0 - r2)
    T = 1.0 + dT
    rho = T ** (1.0 / (GAMMA - 1.0))
    p = rho * T
    return rho, u, v, p


def _vortex_error(n, t_end=0.25):
    mesh = Mesh.uniform((n, n), lengths=(L_DOM, L_DOM), dtype=np.float64)
    th = PerfectGasThermo(R=1.0, Cp=GAMMA / (GAMMA - 1.0))
    h = L_DOM / n
    # tau ~ h^2: the regularization converges one order faster than the
    # 2nd-order central discretization, exposing the operator order
    tau0 = 0.05 * h * h
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    # dt ∝ h^2: the time march is first-order explicit Euler, so the
    # temporal error must shrink one order faster than the spatial target;
    # integer number of steps to t_end
    c_max = np.sqrt(GAMMA * 1.2)
    h32 = L_DOM / 32
    dt = 0.2 * h32 / (np.hypot(*U_INF) + c_max) * (h / h32) ** 2
    n_steps = int(np.ceil(t_end / dt))
    dt = t_end / n_steps
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstTau(tau0=tau0),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(adjust_time_step=False, dt0=dt),
    )
    X = np.asarray(mesh.centers[0])[:, None] * np.ones((1, n))
    Y = np.asarray(mesh.centers[1])[None, :] * np.ones((n, 1))
    rho0, u0, v0, p0 = _vortex_primitives(X, Y, 0.0)
    state = solver.init(p0=p0, T0=p0 / rho0, U0=np.stack([u0, v0]))
    step = solver.make_step()
    out = jax.jit(lambda s: common.run_steps(step, s, n_steps))(state)
    rho_ex, _, _, _ = _vortex_primitives(X, Y, t_end)
    err = np.mean(np.abs(np.asarray(out.rho) - rho_ex))
    return err


def test_isentropic_vortex_second_order():
    """L1(rho) error must drop at >= 1.9 order under grid refinement
    (BASELINE.md correctness bar: discretization-order evidence)."""
    errs = [_vortex_error(n) for n in (32, 64, 128)]
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert errs[0] > errs[1] > errs[2]
    assert orders[-1] >= 1.9, (errs, orders)


# ---------------------------------------------------------------------------
# Taylor-Green viscous decay (QHDFoam)
# ---------------------------------------------------------------------------


def test_taylor_green_decay_rate():
    """KE of u=sin(x)cos(y), v=-cos(x)sin(y) decays as exp(-4 nu t); the
    QHD step must reproduce the rate within a few percent."""
    n = 64
    nu = 0.02
    mesh = Mesh.uniform((n, n), lengths=(2 * np.pi, 2 * np.pi),
                        dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=nu, Pr=1.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = QHDFoam(
        mesh=mesh, thermo=thermo, tau_model=H2bynuQHD(alpha=0.2),
        bc_U=per, bc_T=per, bc_p=per,
        time=common.TimeControls(adjust_time_step=False, dt0=2e-3),
    )
    X = np.asarray(mesh.centers[0])[:, None] * np.ones((1, n))
    Y = np.asarray(mesh.centers[1])[None, :] * np.ones((n, 1))
    U0 = np.stack([np.sin(X) * np.cos(Y), -np.cos(X) * np.sin(Y)])
    state = solver.init(U0=U0, T0=np.zeros((n, n)))
    step = solver.make_step()
    t_end = 2.0
    n_steps = int(t_end / 2e-3)
    out = jax.jit(lambda s: common.run_steps(step, s, n_steps))(state)
    ke0 = float(np.mean(np.sum(U0 * U0, axis=0)))
    ke1 = float(np.mean(np.sum(np.asarray(out.U) ** 2, axis=0)))
    rate = -np.log(ke1 / ke0) / t_end
    # exact decay rate: 4*nu (k=1 modes) = 0.08
    assert abs(rate - 4 * nu) / (4 * nu) < 0.05, rate


# ---------------------------------------------------------------------------
# de Vahl Davis buoyant cavity (QHDFoam) — Nu at Ra = 1e3
# ---------------------------------------------------------------------------


def test_buoyant_cavity_nusselt_ra1e3():
    """Differentially heated square cavity, Ra=1e3, Pr=0.71: mean hot-wall
    Nusselt = 1.118 (de Vahl Davis 1983).  32^2 grid, 10% tolerance."""
    n = 32
    Pr = 0.71
    nu = 0.02
    alpha_th = nu / Pr
    Ra = 1.0e3
    g_beta = Ra * nu * alpha_th  # L = dT = 1
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=nu, Pr=Pr,
                            beta=-g_beta / 9.81)
    noslip = bcm.FieldBCs.uniform(bcm.FixedValue(jnp.zeros(2)), 2)
    bc_T = bcm.FieldBCs((
        (bcm.FixedValue(0.5), bcm.FixedValue(-0.5)),  # hot left, cold right
        (bcm.ZeroGradient(), bcm.ZeroGradient()),
    ))
    solver = QHDFoam(
        mesh=mesh, thermo=thermo, tau_model=H2bynuQHD(alpha=0.3),
        g=(0.0, -9.81), bc_U=noslip, bc_T=bc_T,
        bc_p=bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2),
        time=common.TimeControls(max_co=0.4, max_dt=0.2, dt0=1e-3),
    )
    # hot wall on x=0, gravity along -y: de Vahl Davis orientation
    state = solver.init(U0=np.zeros((2, n, n)), T0=np.zeros((n, n)))
    step = solver.make_step()
    run = jax.jit(lambda s: common.run_steps(step, s, 400))
    prev_nu = None
    h = 1.0 / n
    for _ in range(12):  # advance until Nu is stationary
        state = run(state)
        T = np.asarray(state.T)
        # Nu = -dT/dx * L / dT at the hot wall; ghost convention:
        # T_wall = 0.5 fixed, wall gradient = (T_wall - T_cell)/ (h/2)
        nu_loc = -(T[0, :] - 0.5) / (h / 2)
        nu_mean = float(np.mean(nu_loc))
        if prev_nu is not None and abs(nu_mean - prev_nu) < 1e-3:
            break
        prev_nu = nu_mean
    assert abs(nu_mean - 1.118) / 1.118 < 0.10, nu_mean


# ---------------------------------------------------------------------------
# de Vahl Davis cavity at higher Ra (VERDICT r2 weak #8: validation depth)
# ---------------------------------------------------------------------------


def _cavity_nusselt(n, Ra, n_chunk, max_chunks, alpha_tau=0.3):
    Pr = 0.71
    nu = 0.02
    alpha_th = nu / Pr
    g_beta = Ra * nu * alpha_th  # L = dT = 1
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=nu, Pr=Pr,
                            beta=-g_beta / 9.81)
    noslip = bcm.FieldBCs.uniform(bcm.FixedValue(jnp.zeros(2)), 2)
    bc_T = bcm.FieldBCs((
        (bcm.FixedValue(0.5), bcm.FixedValue(-0.5)),
        (bcm.ZeroGradient(), bcm.ZeroGradient()),
    ))
    solver = QHDFoam(
        mesh=mesh, thermo=thermo, tau_model=H2bynuQHD(alpha=alpha_tau),
        g=(0.0, -9.81), bc_U=noslip, bc_T=bc_T,
        bc_p=bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2),
        time=common.TimeControls(max_co=0.4, max_dt=0.2, dt0=1e-3),
    )
    state = solver.init(U0=np.zeros((2, n, n)), T0=np.zeros((n, n)))
    run = jax.jit(lambda s: common.run_steps(solver.make_step(), s, n_chunk))
    prev_nu = None
    h = 1.0 / n
    nu_mean = np.nan
    for _ in range(max_chunks):
        state = run(state)
        T = np.asarray(state.T)
        nu_loc = -(T[0, :] - 0.5) / (h / 2)
        nu_mean = float(np.mean(nu_loc))
        if prev_nu is not None and abs(nu_mean - prev_nu) < 2e-3:
            break
        prev_nu = nu_mean
    return nu_mean


def test_buoyant_cavity_nusselt_ra1e4():
    """Ra = 1e4, Pr = 0.71: de Vahl Davis mean hot-wall Nu = 2.243;
    48^2 grid, 8% tolerance (first-order wall-gradient sampling)."""
    nu_mean = _cavity_nusselt(48, 1.0e4, n_chunk=600, max_chunks=12)
    assert abs(nu_mean - 2.243) / 2.243 < 0.08, nu_mean


def test_buoyant_cavity_nusselt_ra1e5():
    """Ra = 1e5, Pr = 0.71: de Vahl Davis mean hot-wall Nu = 4.519;
    64^2 grid, 10% tolerance — the thin boundary layer is the hard part
    (the reference's own cavity tutorials target this regime)."""
    nu_mean = _cavity_nusselt(64, 1.0e5, n_chunk=1200, max_chunks=10,
                              alpha_tau=0.2)
    assert abs(nu_mean - 4.519) / 4.519 < 0.10, nu_mean


# ---------------------------------------------------------------------------
# flagship shock-capturing config: Sod tube under varScModel5 + qgdFlux
# (VERDICT r2 weak #8: the perf-story config had no physics validation)
# ---------------------------------------------------------------------------


def test_sod_varsc_qgdflux_flagship():
    """2D (quasi-1D) Sod tube run with the SHOCK-CAPTURING flagship
    configuration — varScModel5 relaxed density-gradient sensor
    (varScModel5_8C correct()) + qgdFlux outflow pressure BC
    (qgdFluxFvPatchScalarField_8C updateCoeffs) — against the exact Riemann
    solution: density L1 error and shock position.  This is the same
    solver config as the bench's big-grid measurement."""
    from test_qgd import _sod_exact
    from qgdsolver_tpu.physics.qgdcoeffs import VarScModel5

    n = 400
    mesh = Mesh.uniform((n, 4), lengths=(1.0, 0.01), dtype=np.float64)
    R, gamma = 1.0, 1.4
    th = PerfectGasThermo(R=R, Cp=gamma * R / (gamma - 1))
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    bc_p = bcm.FieldBCs((
        (bcm.ZeroGradient(), bcm.QGDFluxP()),
        (bcm.ZeroGradient(), bcm.ZeroGradient()),
    ))
    solver = QGDFoam(
        mesh=mesh, thermo=th,
        tau_model=VarScModel5(alpha=0.5, Pr=1.0, rC=0.5, minSc=0.05,
                              maxSc=1.0, smoothCoeff=0.1),
        bc_U=zg, bc_p=bc_p, bc_T=zg,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    x = np.asarray(mesh.centers[0])
    p0 = jnp.asarray(np.broadcast_to(np.where(x < 0.5, 1.0, 0.1)[:, None],
                                     (n, 4)))
    rho0 = np.broadcast_to(np.where(x < 0.5, 1.0, 0.125)[:, None], (n, 4))
    T0 = jnp.asarray(p0 / (R * rho0))
    s = solver.init(p0=p0, T0=T0, U0=jnp.zeros((2, n, 4)),
                    sc0=jnp.full((n, 4), 0.05))
    step = jax.jit(solver.make_step())
    t_end = 0.2
    for _ in range(10000):
        s = step(s)
        if float(s.t) >= t_end:
            break
    assert float(s.t) >= t_end
    rho_num = np.asarray(s.rho[:, 2])
    rho_ex, u_ex, p_ex = _sod_exact(x, float(s.t))
    l1 = np.mean(np.abs(rho_num - rho_ex))
    assert l1 < 0.02, f"flagship Sod rho L1 error {l1}"
    # shock position: steepest PRESSURE drop (pressure is continuous across
    # the contact, so this picks the shock, not the contact)
    _, _, _, p_num2d = solver.primitives(s)
    p_num = np.asarray(p_num2d)[:, 2]
    sh_ex = x[np.argmin(np.diff(p_ex))]
    sh_num = x[np.argmin(np.diff(p_num))]
    assert abs(sh_num - sh_ex) < 4.0 / n, (sh_num, sh_ex)
    # the sensor must actually ENGAGE at the shock (|grad rho|*h/rho driven
    # well above the minSc=0.05 floor) and stay relaxed elsewhere
    sc = np.asarray(s.sc[:, 2])
    assert sc.max() > 2.0 * 0.05, sc.max()
    assert sc.min() < 1.2 * 0.05, sc.min()
    assert abs(x[np.argmax(sc)] - sh_ex) < 0.05, x[np.argmax(sc)]
