"""zQGDFoam high-Mach solver tests."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import PerfectGasThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.zqgd import ZQGDFoam, logmean
from tests.test_qgd import _sod_exact


def test_logmean():
    a = jnp.asarray([1.0, 2.0, 5.0])
    b = jnp.asarray([1.0, 2.0 + 1e-14, 1.0])
    lm = logmean(a, b)
    np.testing.assert_allclose(lm[0], 1.0, rtol=1e-12)
    np.testing.assert_allclose(lm[1], 2.0, rtol=1e-10)
    np.testing.assert_allclose(lm[2], (5.0 - 1.0) / np.log(5.0), rtol=1e-10)


def test_freestream_preservation():
    mesh = Mesh.uniform((12, 10), lengths=(1.0, 1.0), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = ZQGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    U0 = jnp.stack([jnp.full(mesh.shape, 200.0), jnp.full(mesh.shape, -50.0)])
    s = solver.init(p0=jnp.full(mesh.shape, 1e5), T0=jnp.full(mesh.shape, 300.0),
                    U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 15)
    np.testing.assert_allclose(np.asarray(s.rho), float(s.rho[0, 0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.rhoU[0] / s.rho), 200.0, rtol=1e-10)


def test_sod_shock_tube():
    """zQGD on Sod: the high-Mach flux variant must also capture the exact
    Riemann solution (looser tolerance: different dissipation)."""
    n = 400
    mesh = Mesh.uniform((n,), lengths=(1.0,), dtype=np.float64)
    R, gamma = 1.0, 1.4
    th = PerfectGasThermo(R=R, Cp=gamma * R / (gamma - 1))
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    solver = ZQGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=zg, bc_p=zg, bc_T=zg,
        time=common.TimeControls(max_co=0.2, max_dt=1e-3, dt0=1e-6),
    )
    x = np.asarray(mesh.centers[0])
    p0 = jnp.asarray(np.where(x < 0.5, 1.0, 0.1))
    rho0 = np.where(x < 0.5, 1.0, 0.125)
    T0 = jnp.asarray(p0 / (R * rho0))
    s = solver.init(p0=p0, T0=T0, U0=jnp.zeros((1, n)))
    step = jax.jit(solver.make_step())
    for _ in range(20000):
        s = step(s)
        if float(s.t) >= 0.2:
            break
    rho_ex, _, _ = _sod_exact(x, float(s.t))
    l1 = np.mean(np.abs(np.asarray(s.rho) - rho_ex))
    assert np.all(np.isfinite(np.asarray(s.rho)))
    assert l1 < 0.03, f"zQGD Sod rho L1 error {l1}"
