"""3-D capability tests: fvsc exactness, QGD freestream + entropy wave,
QHD cavity (the reference's GaussVolPoint stencil covers 1D/2D/3D —
GaussVolPointBase3D_8C; our operators are dimension-generic)."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.ops import fvsc
from qgdsolver_tpu.physics.thermo import PerfectGasThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam


def test_fvsc_grad_linear_exact_3d():
    mesh = Mesh.uniform((6, 5, 4), lengths=(1.0, 2.0, 0.5), dtype=np.float64)
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    z = np.asarray(mesh.cell_coords(2)) * np.ones(mesh.shape)
    f = jnp.asarray(2.0 * x - 3.0 * y + 5.0 * z + 1.0)
    # exact ghost values for the linear field via FixedGradient per side
    bcs = bcm.FieldBCs((
        (bcm.FixedGradient(-2.0), bcm.FixedGradient(2.0)),
        (bcm.FixedGradient(3.0), bcm.FixedGradient(-3.0)),
        (bcm.FixedGradient(-5.0), bcm.FixedGradient(5.0)),
    ))
    g = fvsc.grad(f, bcs, mesh, scheme="full")
    expect = [2.0, -3.0, 5.0]
    for a in range(3):
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(g[a][i]), expect[i], atol=1e-12,
                err_msg=f"axis {a} comp {i}")


def test_qgd_freestream_3d():
    mesh = Mesh.uniform((8, 6, 4), lengths=(1.0, 1.0, 1.0), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 3)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    U0 = jnp.stack([jnp.full(mesh.shape, 60.0), jnp.full(mesh.shape, -20.0),
                    jnp.full(mesh.shape, 10.0)])
    s = solver.init(p0=jnp.full(mesh.shape, 1e5),
                    T0=jnp.full(mesh.shape, 300.0), U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 10)
    np.testing.assert_allclose(np.asarray(s.rho), float(s.rho[0, 0, 0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.rhoU[2] / s.rho), 10.0, rtol=1e-10)


def test_qgd_entropy_wave_3d_stability():
    mesh = Mesh.uniform((24, 6, 4), lengths=(1.0, 0.25, 0.2), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 3)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.25, max_dt=1e-3, dt0=1e-6),
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    T0 = jnp.asarray(400.0 * (1 + 0.15 * np.exp(-((x - 0.3) / 0.08) ** 2)))
    U0 = jnp.zeros((3,) + mesh.shape).at[0].set(50.0)
    s = solver.init(p0=jnp.full(mesh.shape, 1e5), T0=T0, U0=U0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 150)
    assert np.all(np.isfinite(np.asarray(s.rho)))
    # stays uniform transverse
    yz_var = float(jnp.max(jnp.abs(s.rho - s.rho[:, :1, :1])))
    assert yz_var < 1e-8
