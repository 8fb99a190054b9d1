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
