"""scalarTransportQHDFoam solver tests (reference
scalarTransportQHDFoam_8C_source.html:60-144)."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import RhoConstThermo
from qgdsolver_tpu.physics.qgdcoeffs import HbyUQHD, ConstTau
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.scalar_transport import ScalarTransportQHD


def _setup(nx=32, ny=32, u0=1.0):
    mesh = Mesh.uniform((nx, ny), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0)
    bcs = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = ScalarTransportQHD(
        mesh=mesh, thermo=thermo, tau_model=HbyUQHD(alpha=0.2, U0=u0),
        bc_T=bcs, bc_U=bcs,
        time=common.TimeControls(max_co=0.4, max_dt=0.01, dt0=1e-4),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    T0 = jnp.asarray(np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.01))
    U0 = jnp.stack([jnp.full(mesh.shape, u0), jnp.zeros(mesh.shape)])
    return mesh, solver, T0, U0


def test_conservation_periodic():
    mesh, solver, T0, U0 = _setup()
    step = jax.jit(solver.make_step())
    s = solver.init(T0, U0)
    mass0 = float(jnp.sum(T0))
    s = common.run_steps(step, s, 50)
    assert np.isfinite(float(jnp.max(s.T)))
    # advective + conservative-diffusive: total T conserved on periodic box
    np.testing.assert_allclose(float(jnp.sum(s.T)), mass0, rtol=1e-10)
    # positivity-ish and bounded
    assert float(jnp.max(s.T)) <= float(jnp.max(T0)) * 1.01
    assert float(s.t) > 0
    assert float(s.dt) > 1e-4  # dt adapted upward


def test_advection_moves_peak():
    mesh, solver, T0, U0 = _setup(u0=1.0)
    step = jax.jit(solver.make_step())
    s = solver.init(T0, U0)
    # run to t ~= 0.25 => peak should move ~0.25 in x
    while float(s.t) < 0.25:
        s = step(s)
    i, j = np.unravel_index(np.argmax(np.asarray(s.T)), mesh.shape)
    x_peak = np.asarray(mesh.centers[0])[i]
    assert abs(x_peak - 0.75) < 0.1
    j_exp = np.argmin(np.abs(np.asarray(mesh.centers[1]) - 0.5))
    assert abs(int(j) - int(j_exp)) <= 1


def test_pure_diffusion_analytic():
    """Frozen U=0: T decays as the heat equation; compare against the exact
    Fourier-mode decay of the discrete laplacian's continuous limit."""
    mesh = Mesh.uniform((64, 4), lengths=(1.0, 1.0), dtype=np.float64)
    kappa = 0.05  # alpha/(rho*Cp) ... here Hif = mu0/Pr/rho = 0.05
    thermo = RhoConstThermo(rho0=1.0, Cp=1.0, mu0=kappa, Pr=1.0)
    bcs = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = ScalarTransportQHD(
        mesh=mesh, thermo=thermo, tau_model=ConstTau(tau0=0.0),
        bc_T=bcs, bc_U=bcs,
        time=common.TimeControls(adjust_time_step=False, dt0=1e-4),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T0 = jnp.asarray(1.0 + 0.5 * np.sin(2 * np.pi * x))
    U0 = jnp.zeros((2,) + mesh.shape)
    s = solver.init(T0, U0)
    step = jax.jit(solver.make_step())
    n = 200
    s = common.run_steps(step, s, n)
    t_end = n * 1e-4
    decay = np.exp(-kappa * (2 * np.pi) ** 2 * t_end)
    T_exact = 1.0 + 0.5 * decay * np.sin(2 * np.pi * x)
    np.testing.assert_allclose(np.asarray(s.T), T_exact, atol=2e-3)
