"""QGDFoam solver tests (reference QGDFoam_8C_source.html:68-163).

Sod shock tube vs the exact Riemann solution is the classic QGD validation
(the reference's tutorial-based testing practice, SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import PerfectGasThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam


def test_freestream_preservation_2d():
    """Uniform flow through a periodic box must stay exactly uniform —
    catches any inconsistency in the flux assembly/BC plumbing."""
    mesh = Mesh.uniform((16, 12), lengths=(1.0, 1.0), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    U0 = jnp.stack([jnp.full(mesh.shape, 100.0), jnp.full(mesh.shape, 30.0)])
    s = solver.init(p0=jnp.full(mesh.shape, 1e5), T0=jnp.full(mesh.shape, 300.0),
                    U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 20)
    np.testing.assert_allclose(np.asarray(s.rho), float(s.rho[0, 0]), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s.rhoU[0] / s.rho), 100.0, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(s.rhoU[1] / s.rho), 30.0, rtol=1e-10)


def _sod_exact(x, t, gamma=1.4):
    """Exact Riemann solution for the Sod tube (pl=1,rl=1 | pr=0.1,rr=0.125),
    diaphragm at x=0.5."""
    pl, rl, ul = 1.0, 1.0, 0.0
    pr, rr, ur = 0.1, 0.125, 0.0
    cl = np.sqrt(gamma * pl / rl)
    cr = np.sqrt(gamma * pr / rr)
    # solve for p* with Newton (two-rarefaction init)
    def f(p, pk, rk, ck):
        if p > pk:  # shock
            ak = 2.0 / ((gamma + 1) * rk)
            bk = (gamma - 1) / (gamma + 1) * pk
            return (p - pk) * np.sqrt(ak / (p + bk))
        return 2 * ck / (gamma - 1) * ((p / pk) ** ((gamma - 1) / (2 * gamma)) - 1)

    def fp(p, pk, rk, ck):
        eps = 1e-8
        return (f(p + eps, pk, rk, ck) - f(p - eps, pk, rk, ck)) / (2 * eps)

    p = 0.5 * (pl + pr)
    for _ in range(60):
        g = f(p, pl, rl, cl) + f(p, pr, rr, cr) + (ur - ul)
        p = max(1e-8, p - g / (fp(p, pl, rl, cl) + fp(p, pr, rr, cr)))
    ps = p
    us = 0.5 * (ul + ur) + 0.5 * (f(ps, pr, rr, cr) - f(ps, pl, rl, cl))

    rho = np.empty_like(x)
    u = np.empty_like(x)
    pp = np.empty_like(x)
    for i, xi in enumerate(x):
        s = (xi - 0.5) / max(t, 1e-12)
        if s < us:  # left of contact
            if ps > pl:  # left shock
                rsl = rl * ((ps / pl + (gamma - 1) / (gamma + 1))
                            / ((gamma - 1) / (gamma + 1) * ps / pl + 1))
                sl = ul - cl * np.sqrt((gamma + 1) / (2 * gamma) * ps / pl
                                       + (gamma - 1) / (2 * gamma))
                rho[i], u[i], pp[i] = (rl, ul, pl) if s < sl else (rsl, us, ps)
            else:  # left rarefaction
                rsl = rl * (ps / pl) ** (1 / gamma)
                csl = cl * (ps / pl) ** ((gamma - 1) / (2 * gamma))
                shl, stl = ul - cl, us - csl
                if s < shl:
                    rho[i], u[i], pp[i] = rl, ul, pl
                elif s > stl:
                    rho[i], u[i], pp[i] = rsl, us, ps
                else:
                    uu = 2 / (gamma + 1) * (cl + (gamma - 1) / 2 * ul + s)
                    cc = cl - (gamma - 1) / 2 * (uu - ul)
                    rho[i] = rl * (cc / cl) ** (2 / (gamma - 1))
                    u[i] = uu
                    pp[i] = pl * (cc / cl) ** (2 * gamma / (gamma - 1))
        else:  # right of contact
            if ps > pr:  # right shock
                rsr = rr * ((ps / pr + (gamma - 1) / (gamma + 1))
                            / ((gamma - 1) / (gamma + 1) * ps / pr + 1))
                sr = ur + cr * np.sqrt((gamma + 1) / (2 * gamma) * ps / pr
                                       + (gamma - 1) / (2 * gamma))
                rho[i], u[i], pp[i] = (rsr, us, ps) if s < sr else (rr, ur, pr)
            else:
                rsr = rr * (ps / pr) ** (1 / gamma)
                csr = cr * (ps / pr) ** ((gamma - 1) / (2 * gamma))
                shr, str_ = ur + cr, us + csr
                if s > shr:
                    rho[i], u[i], pp[i] = rr, ur, pr
                elif s < str_:
                    rho[i], u[i], pp[i] = rsr, us, ps
                else:
                    uu = 2 / (gamma + 1) * (-cr + (gamma - 1) / 2 * ur + s)
                    cc = cr + (gamma - 1) / 2 * (uu - ur)
                    rho[i] = rr * (cc / cr) ** (2 / (gamma - 1))
                    u[i] = uu
                    pp[i] = pr * (cc / cr) ** (2 * gamma / (gamma - 1))
    return rho, u, pp


def test_sod_shock_tube_1d():
    n = 400
    mesh = Mesh.uniform((n,), lengths=(1.0,), dtype=np.float64)
    # gamma = 1.4 perfect gas with R=1 (nondimensional)
    R = 1.0
    gamma = 1.4
    Cp = gamma * R / (gamma - 1)
    th = PerfectGasThermo(R=R, Cp=Cp)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5, Sc=1.0, Pr=1.0),
        bc_U=zg, bc_p=zg, bc_T=zg,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    x = np.asarray(mesh.centers[0])
    p0 = jnp.asarray(np.where(x < 0.5, 1.0, 0.1))
    rho0 = np.where(x < 0.5, 1.0, 0.125)
    T0 = jnp.asarray(p0 / (R * rho0))
    U0 = jnp.zeros((1, n))
    s = solver.init(p0=p0, T0=T0, U0=U0)
    step = jax.jit(solver.make_step())
    t_end = 0.2
    for _ in range(10000):
        s = step(s)
        if float(s.t) >= t_end:
            break
    assert float(s.t) >= t_end
    rho_ex, u_ex, p_ex = _sod_exact(x, float(s.t))
    rho_num = np.asarray(s.rho)
    l1 = np.mean(np.abs(rho_num - rho_ex))
    assert l1 < 0.02, f"Sod rho L1 error {l1}"
    u_num = np.asarray(s.rhoU[0] / s.rho)
    assert np.mean(np.abs(u_num - u_ex)) < 0.04


def test_entropy_wave_2d_stability():
    """2D advection of a smooth entropy (temperature) wave: regression for
    the Pi-tensor face-area bug (flux scaling is invisible in 1D where
    |Sf| == 1, so Sod alone cannot catch it)."""
    mesh = Mesh.uniform((48, 8), lengths=(1.0, 0.2), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T0 = jnp.asarray(400.0 * (1 + 0.2 * np.exp(-((x - 0.3) / 0.08) ** 2)))
    U0 = jnp.zeros((2,) + mesh.shape).at[0].set(50.0)
    s = solver.init(p0=jnp.full(mesh.shape, 1e5), T0=T0, U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 300)
    assert np.all(np.isfinite(np.asarray(s.rho)))
    # stays y-uniform (no spurious transverse mode)
    y_var = float(jnp.max(jnp.abs(s.rho - s.rho[:, :1])))
    assert y_var < 1e-8
    # the temperature bump advected downstream with the 50 m/s flow
    U, e, T, p = solver.primitives(s)
    i_peak = int(np.argmax(np.asarray(T)[:, 4]))
    x_peak = np.asarray(mesh.centers[0])[i_peak]
    assert x_peak > 0.32


def test_qgd_flux_pressure_bc_outflow():
    """qgdFlux p BC at the outlet: dp/dn = -phiwStar/(tau_f|Sf|) (lagged,
    qgdFluxFvPatchScalarField updateCoeffs).  A uniform supersonic stream
    must pass through unchanged (the BC's design condition)."""
    mesh = Mesh.uniform((32, 8), lengths=(1.0, 0.25), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    u_in = 500.0
    bc_U = bcm.FieldBCs((
        (bcm.FixedValue(jnp.asarray([u_in, 0.0])), bcm.ZeroGradient()),
        (bcm.Periodic(), bcm.Periodic()),
    ))
    bc_p = bcm.FieldBCs((
        (bcm.ZeroGradient(), bcm.QGDFluxP()),
        (bcm.Periodic(), bcm.Periodic()),
    ))
    bc_T = bcm.FieldBCs((
        (bcm.FixedValue(300.0), bcm.ZeroGradient()),
        (bcm.Periodic(), bcm.Periodic()),
    ))
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=bc_U, bc_p=bc_p, bc_T=bc_T,
        time=common.TimeControls(max_co=0.3, max_dt=1e-4, dt0=1e-7),
    )
    assert solver._flux_sides() == ((0, 1),)
    s = solver.init(p0=jnp.full(mesh.shape, 1e5),
                    T0=jnp.full(mesh.shape, 300.0),
                    U0=jnp.zeros((2,) + mesh.shape).at[0].set(u_in))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 100)
    U, e, T, p = solver.primitives(s)
    assert np.all(np.isfinite(np.asarray(p)))
    # stream passes through: p stays near 1e5 everywhere, Ux near u_in
    np.testing.assert_allclose(np.asarray(p), 1e5, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(U[0]), u_in, rtol=2e-2)
