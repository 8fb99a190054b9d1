"""Tests for SRFQHDFoam, MulesQHDFoam, RhoQGDFoam variants."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import (
    RhoConstThermo, RhoThermo, StiffenedGasEoS, PerfectGasEoS,
)
from qgdsolver_tpu.physics.qgdcoeffs import H2bynuQHD, HbyUQHD, ConstScPrModel1
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.srf_qhd import SRFQHDFoam
from qgdsolver_tpu.solvers.mules_qhd import MulesQHDFoam
from qgdsolver_tpu.solvers.rho_qgd import RhoQGDFoam
from qgdsolver_tpu.ops import mules


def test_srf_coriolis_deflects_flow():
    """Rotating frame: an initial x-jet must acquire y-velocity via
    -2*Omega x U (SRFQHDFoam_2updateFields_8H:73)."""
    mesh = Mesh.uniform((24, 24), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0, beta=0.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = SRFQHDFoam(
        omega=(0.0, 0.0, 2.0), mesh=mesh, thermo=thermo,
        tau_model=H2bynuQHD(alpha=0.3), g=(0.0, 0.0),
        bc_U=per, bc_T=per, bc_p=per,
        time=common.TimeControls(max_co=0.3, max_dt=5e-3, dt0=1e-3),
    )
    U0 = jnp.stack([jnp.full(mesh.shape, 0.5), jnp.zeros(mesh.shape)])
    s = solver.init(U0, jnp.zeros(mesh.shape))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 20)
    # 2D Coriolis with omega_z>0, Ux>0 => dUy/dt = -2*w*Ux < 0... force is
    # -2(Omega x U): (Omega x U)_y = w*Ux -> F_y = -2*w*Ux < 0
    assert float(jnp.mean(s.U[1])) < -1e-3
    assert np.all(np.isfinite(np.asarray(s.U)))


def test_mules_boundedness():
    """MULES T-transport must stay within the initial global bounds even with
    a sharp front (the whole point of the limiter)."""
    mesh = Mesh.uniform((64, 8), lengths=(1.0, 1.0), dtype=np.float64)
    # mu0 must be > 0: the H2bynu tau model divides by nu (use HbyU instead)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-6, Pr=1.0, beta=0.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = MulesQHDFoam(
        mesh=mesh, thermo=thermo, tau_model=HbyUQHD(alpha=0.2, U0=1.0),
        g=(0.0, 0.0), bc_U=per, bc_T=per, bc_p=per,
        implicit_diffusion=False,
        time=common.TimeControls(max_co=0.3, max_dt=2e-3, dt0=5e-4),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T0 = jnp.asarray((np.abs(x - 0.3) < 0.1).astype(np.float64))  # top-hat
    U0 = jnp.stack([jnp.ones(mesh.shape), jnp.zeros(mesh.shape)])
    s = solver.init(U0, T0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 100)
    assert float(jnp.max(s.T)) <= 1.0 + 1e-9
    assert float(jnp.min(s.T)) >= 0.0 - 1e-9
    # and the front actually advected (mass conserved, peak moved)
    np.testing.assert_allclose(float(jnp.sum(s.T)), float(jnp.sum(T0)), rtol=1e-10)


def test_mules_limit_reduces_to_highorder_smooth():
    """On a monotone profile (no local extrema) with small dt the limiter
    must keep the high-order flux untouched (lambda == 1) away from the
    domain ends — FCT only clips at extrema."""
    mesh = Mesh.uniform((64, 4), lengths=(1.0, 1.0), dtype=np.float64)
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T = jnp.asarray(1.0 + 0.1 * x)  # monotone in x, constant in y
    phi = tuple(jnp.ones(mesh.face_shape(a)) * np.asarray(mesh.face_area(a))
                for a in range(2))
    phiH = []
    for a in range(2):
        pad_lo = jnp.take(T, jnp.asarray([0]), axis=a)
        pad_hi = jnp.take(T, jnp.asarray([-1]), axis=a)
        Te = jnp.concatenate([pad_lo, T, pad_hi], axis=a)
        n = Te.shape[a]
        Tf = 0.5 * (jnp.take(Te, jnp.arange(0, n - 1), axis=a)
                    + jnp.take(Te, jnp.arange(1, n), axis=a))
        phiH.append(phi[a] * Tf)
    dt = 1e-4
    flux = mules.limit(T, phi, tuple(phiH), dt, mesh,
                       jnp.max(T), jnp.min(T))
    interior = (slice(2, -2), slice(None))
    np.testing.assert_allclose(
        np.asarray(flux[0][interior]),
        np.asarray(phiH[0][interior]), rtol=1e-12)


def test_rho_qgd_freestream_stiffened_gas():
    """Arbitrary-EoS QGD: uniform state stays uniform under stiffened gas."""
    mesh = Mesh.uniform((16, 8), lengths=(1.0, 1.0), dtype=np.float64)
    th = RhoThermo(eos=StiffenedGasEoS(R=287.0, p_inf=2e5), R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = RhoQGDFoam(
        thermo=th, mesh=mesh, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    U0 = jnp.stack([jnp.full(mesh.shape, 50.0), jnp.zeros(mesh.shape)])
    s = solver.init(p0=jnp.full(mesh.shape, 1e5),
                    T0=jnp.full(mesh.shape, 300.0), U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 10)
    np.testing.assert_allclose(np.asarray(s.rho), float(s.rho[0, 0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.rhoU[0] / s.rho), 50.0, rtol=1e-10)


def test_qhd_dym_galilean_invariance():
    """Rigid mesh motion: advecting the frame at the flow speed makes the
    solution stationary in mesh coordinates (makeRelative correctness)."""
    from qgdsolver_tpu.solvers.qhd_dym import QHDDyMFoam

    mesh = Mesh.uniform((32, 8), lengths=(1.0, 0.25), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-5, Pr=1.0, beta=0.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    u0 = 1.0
    solver = QHDDyMFoam(
        mesh_velocity=lambda t: jnp.asarray([u0, 0.0]),
        mesh=mesh, thermo=thermo, tau_model=HbyUQHD(alpha=0.2, U0=u0),
        g=(0.0, 0.0), bc_U=per, bc_T=per, bc_p=per,
        time=common.TimeControls(max_co=0.3, max_dt=5e-3, dt0=1e-3),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T0 = jnp.asarray(np.exp(-((x - 0.5) / 0.1) ** 2))
    U0 = jnp.stack([jnp.full(mesh.shape, u0), jnp.zeros(mesh.shape)])
    s = solver.init(U0, T0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 40)
    # in the co-moving mesh frame the blob must NOT advect: the peak stays
    i0 = np.argmax(np.asarray(s.T)[:, 4])
    assert abs(np.asarray(mesh.centers[0])[i0] - 0.5) < 0.05
    assert np.all(np.isfinite(np.asarray(s.U)))


def test_varsc5_const_sc_cellset():
    """Cells in the constSc set keep the fixed Sc value regardless of the
    shock sensor (reference varScModel5 optional cellSet)."""
    import jax.numpy as jnp
    from qgdsolver_tpu.core.mesh import Mesh
    from qgdsolver_tpu.physics import qgdcoeffs as qc

    mesh = Mesh.uniform((8, 8), dtype=np.float64)
    mask = np.zeros((8, 8)); mask[:4] = 1.0
    m = qc.VarScModel5(rC=1.0, minSc=0.0, maxSc=2.0,
                       const_sc_mask=mask, const_sc_value=0.123)
    # strong density gradient -> sensor Sc > 0 everywhere
    x = np.asarray(mesh.cell_coords(0)) * np.ones((8, 8))
    rho = jnp.asarray(1.0 + 5.0 * x)
    co = m.correct(mesh, c=jnp.full((8, 8), 340.0), p=jnp.full((8, 8), 1e5),
                   rho=rho, sc_prev=jnp.zeros((8, 8)))
    sc = np.asarray(co.sc)
    # reference ordering (varScModel5_8C:222-232): the cellSet overwrite runs
    # BEFORE fvc::smooth, so const cells adjacent to the higher-Sc sensor
    # region are raised by the bounded-ratio smoothing, while cells deep in
    # the set keep the const value (the smoothed influence decays below it).
    np.testing.assert_allclose(sc[0], 0.123, rtol=1e-12)
    assert (sc[:4] >= 0.123 - 1e-12).all()
    assert sc[3].max() > 0.123  # smoothing reaches the set boundary
    assert (sc[4:] != 0.123).any()


def test_qhd_dym_mesh_courant_cap():
    """check_mesh_courant folds |U_mesh|*dt/h into the dt controller: with a
    fast mesh velocity the adjusted dt must come out smaller."""
    import jax
    import jax.numpy as jnp
    from qgdsolver_tpu.core.mesh import Mesh
    from qgdsolver_tpu.solvers.qhd_dym import QHDDyMFoam
    from qgdsolver_tpu.solvers import common
    from qgdsolver_tpu.physics.qgdcoeffs import ConstTau

    mesh = Mesh.uniform((16, 16), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-5, Pr=1.0, beta=0.0)
    kw = dict(mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=1e-4),
              time=common.TimeControls(max_co=0.5, max_dt=1.0, dt0=1e-4),
              implicit_diffusion=False,
              mesh_velocity=lambda t: jnp.asarray([50.0, 0.0]))
    T0 = jnp.full(mesh.shape, 300.0)
    U0 = jnp.zeros((2,) + mesh.shape)
    s_nochk = QHDDyMFoam(check_mesh_courant=False, **kw)
    s_chk = QHDDyMFoam(check_mesh_courant=True, **kw)
    st = s_nochk.init(U0, T0)
    a = jax.jit(s_nochk.make_step())(st)
    b = jax.jit(s_chk.make_step())(st)
    assert float(b.dt) <= float(a.dt)
    # cap binds: dt*|um|/h <= ~max_co within the damped-increase rule
    assert float(b.dt) * 50.0 / (1.0 / 16.0) < 0.5 * 1.3


def test_inter_qhd_alpha_smoothing_flags():
    """smoothAlpha/nSmoothIters/smoothCoeff (interQHDFoam CLI args): the
    smoothed interface has smaller max gradient and stays in [0,1]."""
    import dataclasses as dc
    import jax
    from tests.test_inter_qhd import _drop_case

    mesh, solver, state = _drop_case()
    sm = dc.replace(solver, smooth_alpha=True, n_smooth_iters=2,
                    smooth_coeff=0.5)
    a = jax.jit(solver.make_step())(state)
    b = jax.jit(sm.make_step())(state)
    ga = np.abs(np.diff(np.asarray(a.alpha1), axis=0)).max()
    gb = np.abs(np.diff(np.asarray(b.alpha1), axis=0)).max()
    assert gb < ga
    assert np.asarray(b.alpha1).min() >= 0.0
    assert np.asarray(b.alpha1).max() <= 1.0
