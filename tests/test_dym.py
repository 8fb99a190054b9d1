"""QHDDyMFoam deforming-mesh tests: discrete GCL / space conservation.

Reference QHDDyMFoam runs arbitrary dynamicFvMesh motion via mesh.update()
+ fvc::makeRelative (QHDDyMFoam_8C_source.html:44-60, 109-135); the
structured-mesh re-design supports prescribed per-axis dilation.  The
classic acceptance tests:

* space conservation (GCL): a uniform field on an oscillating-compression
  grid must stay uniform — any drift measures GCL violation;
* uniform-flow preservation: a constant velocity field must survive the
  dilation (the momentum-equation analogue).
"""
import numpy as np
import jax
import jax.numpy as jnp

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import RhoConstThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstTau
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qhd_dym import QHDDyMFoam


def _oscillating_solver(n=24, amp=0.15, omega=3.0):
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0)

    def scale(t):
        # out-of-phase oscillating compression in x and y
        return (1.0 + amp * jnp.sin(omega * t),
                1.0 + amp * jnp.sin(1.7 * omega * t + 0.5))

    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    solver = QHDDyMFoam(
        mesh_scale=scale,
        mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=1e-4),
        bc_U=zg, bc_T=zg, bc_p=zg,
        time=common.TimeControls(adjust_time_step=False, dt0=5e-3),
        cg_tol=1e-12,
    )
    return solver


def test_gcl_uniform_field_preserved():
    """Uniform T and U on the oscillating-compression grid stay uniform:
    the mesh fluxes telescope to (V'-V)/dt per cell exactly, and the
    moving-volume ddt cancels it."""
    solver = _oscillating_solver()
    n = solver.mesh.shape[0]
    T0 = jnp.full((n, n), 3.7)
    U0 = jnp.stack([jnp.full((n, n), 0.8), jnp.full((n, n), -0.3)])
    state = solver.init(U0=U0, T0=T0)
    step = solver.make_step()
    out = jax.jit(lambda s: common.run_steps(step, s, 200))(state)
    np.testing.assert_allclose(np.asarray(out.T), 3.7, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out.U[0]), 0.8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.U[1]), -0.3, atol=1e-8)
    assert float(out.t) > 0.9  # the grid really oscillated through cycles


def test_deforming_diffusion_decay_rate():
    """Physics on the deforming grid: pure diffusion of a Fourier mode on a
    STATICALLY scaled mesh (s = const != 1) must decay at the physical rate
    k_phys^2 * Hi with k_phys = k_log/s — i.e. the metric factors really
    rescale the operators, not just the fluxes."""
    n = 32
    s = 1.6
    nu = 0.05
    mesh = Mesh.uniform((n, n), lengths=(2 * np.pi, 2 * np.pi),
                        dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=nu, Pr=1.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = QHDDyMFoam(
        mesh_scale=lambda t: (s, s),
        mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=1e-5),
        bc_U=per, bc_T=per, bc_p=per,
        time=common.TimeControls(adjust_time_step=False, dt0=2e-3),
    )
    X = np.asarray(mesh.centers[0])[:, None] * np.ones((1, n))
    T0 = jnp.asarray(np.sin(X))
    state = solver.init(U0=jnp.zeros((2, n, n)), T0=T0)
    step = solver.make_step()
    t_end = 1.0
    n_steps = int(t_end / 2e-3)
    out = jax.jit(lambda s_: common.run_steps(step, s_, n_steps))(state)
    amp = float(jnp.max(jnp.abs(out.T)))
    # alphah = mu/Pr; physical wavenumber k = 1/s
    rate_exp = nu / s**2
    amp_exp = np.exp(-rate_exp * t_end)
    assert abs(amp - amp_exp) / amp_exp < 0.02, (amp, amp_exp)


def _slosh_faces(n, amp=0.08, omega=3.0):
    """Arbitrary interior-face sloshing: faces oscillate with a
    sin(pi*x)-shaped amplitude (ends pinned) plus a breathing stretch —
    NOT expressible as rigid translation + dilation."""
    x0 = np.linspace(0.0, 1.0, n + 1)

    def faces(t):
        wob = amp * jnp.sin(omega * t) * jnp.sin(np.pi * x0)
        breathe = 0.05 * jnp.sin(1.7 * omega * t) * x0 * (1.0 - x0)
        return x0 + wob + breathe

    return faces


def test_general_motion_gcl_uniform_preserved():
    """Space conservation on ARBITRARY per-axis face motion (mesh_faces):
    a uniform field on a sloshing grid must stay uniform — the
    Thomas-Lombard sweeps + moving-volume ddt are the discrete GCL."""
    n = 24
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0)
    fx = _slosh_faces(n, amp=0.08, omega=3.0)
    fy = _slosh_faces(n, amp=0.06, omega=4.1)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    solver = QHDDyMFoam(
        mesh_faces=lambda t: (fx(t), fy(t)),
        mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=1e-4),
        bc_U=zg, bc_T=zg, bc_p=zg,
        time=common.TimeControls(adjust_time_step=False, dt0=5e-3),
        cg_tol=1e-12,
    )
    T0 = jnp.full((n, n), 7.25)
    U0 = jnp.full((2, n, n), 0.35)
    s = solver.init(U0, T0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 40)
    # uniform T survives the sloshing grid (GCL) ...
    np.testing.assert_allclose(np.asarray(s.T), 7.25, rtol=1e-9)
    # ... and so does the uniform velocity (momentum GCL)
    np.testing.assert_allclose(np.asarray(s.U), 0.35, rtol=1e-7)


def test_general_motion_reduces_to_dilation():
    """mesh_faces = s(t)*x0 must agree with the dedicated mesh_scale path
    (different operator-evaluation instants: O(dt) apart)."""
    n = 20
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0)
    x0 = np.linspace(0.0, 1.0, n + 1)

    def sx(t):
        return 1.0 + 0.1 * jnp.sin(3.0 * t)

    def sy(t):
        return 1.0 + 0.07 * jnp.sin(5.0 * t + 0.3)

    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    kw = dict(mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=1e-4),
              bc_U=zg, bc_T=zg, bc_p=zg,
              time=common.TimeControls(adjust_time_step=False, dt0=2e-3),
              cg_tol=1e-12)
    s_dil = QHDDyMFoam(mesh_scale=lambda t: (sx(t), sy(t)), **kw)
    s_gen = QHDDyMFoam(
        mesh_faces=lambda t: (sx(t) * x0, sy(t) * x0), **kw)
    x = np.asarray(mesh.cell_coords(0)) * np.ones((n, n))
    y = np.asarray(mesh.cell_coords(1)) * np.ones((n, n))
    T0 = jnp.asarray(np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.04))
    U0 = jnp.zeros((2, n, n))
    st_d = common.run_steps(jax.jit(s_dil.make_step()),
                            s_dil.init(U0, T0), 25)
    st_g = common.run_steps(jax.jit(s_gen.make_step()),
                            s_gen.init(U0, T0), 25)
    np.testing.assert_allclose(float(st_g.t), float(st_d.t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_g.T), np.asarray(st_d.T),
                               rtol=0.0, atol=2e-3)
    assert np.abs(np.asarray(st_d.T)).max() > 0.1  # not vacuous


def test_general_motion_piston_channel_physics():
    """A piston wall advancing into a channel (left faces compress toward
    the right): the incompressible fluid must be pushed out at the piston
    speed (continuity through the moving-mesh fluxes)."""
    n = 32
    mesh = Mesh.uniform((n, 8), lengths=(1.0, 0.25), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-4, Pr=1.0)
    x0 = np.linspace(0.0, 1.0, n + 1)
    y0 = np.linspace(0.0, 0.25, 9)
    v_p = 0.2  # piston speed

    def faces(t):
        # left wall advances at v_p; right wall fixed; interior faces
        # stretch linearly between
        left = v_p * t
        return (left + (1.0 - left) * x0, jnp.asarray(y0) + 0.0 * t)

    zg = bcm.ZeroGradient()
    slip = bcm.Symmetry()
    solver = QHDDyMFoam(
        mesh_faces=faces,
        mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=2e-3),
        # piston face: no normal flow THROUGH the moving wall (U = wall
        # velocity); outlet: zero gradient.  Adaptive dt: the explicit
        # QHD regularization needs dt <~ cTau*tau (the same config blows
        # up IDENTICALLY on a static mesh at dt/tau = 20)
        bc_U=bcm.FieldBCs(((bcm.FixedValue(jnp.asarray([v_p, 0.0])),
                            bcm.ZeroGradient()), (slip, slip))),
        bc_T=bcm.FieldBCs.uniform(zg, 2),
        bc_p=bcm.FieldBCs(((zg, bcm.FixedValue(0.0)), (zg, zg))),
        time=common.TimeControls(max_co=0.3, max_dt=2e-3, dt0=1e-4),
        cg_tol=1e-12,
    )
    s = solver.init(jnp.zeros((2, n, 8)), jnp.zeros((n, 8)))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 150)
    U = np.asarray(s.U)
    assert np.isfinite(U).all()
    # continuity: fluid leaves the right end at ~ the piston speed
    # (slug flow; the compressing domain conserves volume flux)
    u_out = U[0, -1, :].mean()
    np.testing.assert_allclose(u_out, v_p, rtol=0.05)
