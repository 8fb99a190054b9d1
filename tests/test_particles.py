"""Lagrangian cloud + particlesQGDFoam/particlesQHDFoam tests."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.thermo import PerfectGasThermo, RhoConstThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1, HbyUQHD
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam
from qgdsolver_tpu.solvers.qhd import QHDFoam
from qgdsolver_tpu.solvers.particles import (
    ThermoCloud, ParticlesQGDFoam, ParticlesQHDFoam,
)


def test_cloud_drag_relaxation_analytic():
    """Stokes regime (tiny Re): parcel velocity relaxes to gas velocity with
    the analytic exponential timescale tau_p = rho_p dp^2/(18 mu)."""
    mesh = Mesh.uniform((16, 16), lengths=(1.0, 1.0), dtype=np.float64)
    cloud = ThermoCloud(rho_p=1000.0, mu_g=1.8e-5, two_way=False,
                        wall="periodic")
    c = cloud.make(
        x=jnp.asarray([[0.5], [0.5]]), u=jnp.asarray([[0.0], [0.0]]),
        Tp=jnp.asarray([300.0]), dp=jnp.asarray([20e-6]),
    )
    rho_g = jnp.full(mesh.shape, 1.2)
    U_g = jnp.stack([jnp.full(mesh.shape, 1e-3), jnp.zeros(mesh.shape)])
    T_g = jnp.full(mesh.shape, 300.0)
    tau_p = 1000.0 * (20e-6) ** 2 / (18 * 1.8e-5)
    dt = 0.3 * tau_p
    c2, _, _ = cloud.evolve(c, mesh, dt, rho_g=rho_g, U_g=U_g, T_g=T_g)
    # include the (tiny) Schiller-Naumann finite-Re correction in tau_p
    Re = 1.2 * 1e-3 * 20e-6 / 1.8e-5
    f = 1 + 0.15 * Re ** 0.687
    expected = 1e-3 * (1 - np.exp(-0.3 * f))
    np.testing.assert_allclose(float(c2.u[0, 0]), expected, rtol=1e-6)


def test_two_way_momentum_conservation():
    """Gas+parcel momentum exchanged via the source field must balance:
    sum(rhoUSu*V) == -(parcel momentum gain)/dt."""
    mesh = Mesh.uniform((8, 8), lengths=(1.0, 1.0), dtype=np.float64)
    cloud = ThermoCloud(rho_p=500.0, two_way=True, wall="periodic")
    n = 20
    rng = np.random.default_rng(0)
    c = cloud.make(
        x=jnp.asarray(rng.uniform(0.1, 0.9, (2, n))),
        u=jnp.zeros((2, n)),
        Tp=jnp.full((n,), 300.0), dp=jnp.full((n,), 100e-6),
    )
    rho_g = jnp.full(mesh.shape, 1.2)
    U_g = jnp.stack([jnp.full(mesh.shape, 2.0), jnp.zeros(mesh.shape)])
    T_g = jnp.full(mesh.shape, 300.0)
    dt = 1e-4
    m = np.asarray(cloud.mass(c))
    c2, rhoUSu, rhoESu = cloud.evolve(c, mesh, dt, rho_g=rho_g, U_g=U_g, T_g=T_g)
    gain = np.sum(m * np.asarray(c2.u[0] - c.u[0]))
    vol = np.broadcast_to(np.asarray(mesh.cell_volume), mesh.shape)
    src_total = float(np.sum(np.asarray(rhoUSu[0]) * vol)) * dt
    np.testing.assert_allclose(src_total, -gain, rtol=1e-10)


def test_particles_qgd_two_way_runs():
    mesh = Mesh.uniform((24, 12), lengths=(1.0, 0.5), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    fluid = QGDFoam(
        mesh=mesh, thermo=th, tau_model=ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-4, dt0=1e-6),
    )
    solver = ParticlesQGDFoam(
        fluid=fluid,
        cloud=ThermoCloud(rho_p=800.0, two_way=True, wall="periodic"),
    )
    n = 50
    rng = np.random.default_rng(1)
    s = solver.init(
        p0=jnp.full(mesh.shape, 1e5), T0=jnp.full(mesh.shape, 300.0),
        U0=jnp.stack([jnp.full(mesh.shape, 20.0), jnp.zeros(mesh.shape)]),
        x_p=jnp.asarray(np.stack([rng.uniform(0.1, 0.9, n),
                                  rng.uniform(0.1, 0.4, n)])),
        u_p=jnp.zeros((2, n)), T_p=jnp.full((n,), 350.0),
        d_p=jnp.full((n,), 50e-6),
    )
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 30)
    assert np.all(np.isfinite(np.asarray(s.fluid.rho)))
    # parcels accelerated downstream by drag
    assert float(jnp.mean(s.cloud.u[0])) > 0.1
    # hot parcels cool toward gas
    assert float(jnp.max(s.cloud.Tp)) < 350.0


def test_particles_qhd_one_way_runs():
    mesh = Mesh.uniform((16, 16), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-3, Pr=1.0, beta=0.0)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    fluid = QHDFoam(
        mesh=mesh, thermo=thermo, tau_model=HbyUQHD(alpha=0.2, U0=1.0),
        g=(0.0, 0.0), bc_U=per, bc_T=per, bc_p=per,
        time=common.TimeControls(max_co=0.3, max_dt=5e-3, dt0=1e-3),
    )
    solver = ParticlesQHDFoam(
        fluid=fluid, cloud=ThermoCloud(rho_p=2000.0, two_way=False,
                                       wall="escape"),
    )
    n = 10
    s = solver.init(
        U0=jnp.stack([jnp.full(mesh.shape, 1.0), jnp.zeros(mesh.shape)]),
        T0=jnp.zeros(mesh.shape),
        x_p=jnp.asarray(np.stack([np.full(n, 0.9), np.linspace(0.2, 0.8, n)])),
        u_p=jnp.stack([jnp.full((n,), 1.0), jnp.zeros((n,))]),
        T_p=jnp.zeros((n,)), d_p=jnp.full((n,), 1e-4),
    )
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 40)
    # parcels near the right wall escape and deactivate
    assert float(jnp.sum(s.cloud.active)) < n
    assert np.all(np.isfinite(np.asarray(s.fluid.U)))


def test_reacting_lagrangian_evaporation():
    """Evaporating parcels transfer mass into the evap specie; total gas
    mass gain equals parcel mass loss."""
    from qgdsolver_tpu.physics.species import Specie, MixtureThermo
    from qgdsolver_tpu.physics.thermo import ConstTransport
    from qgdsolver_tpu.solvers.reacting import ReactingQGDFoam
    from qgdsolver_tpu.solvers.particles import (
        ReactingCloud, ReactingLagrangianQGDFoam,
    )

    mesh = Mesh.uniform((12, 12), lengths=(0.5, 0.5), dtype=np.float64)
    V = Specie(name="vapor", W=18.0, Cp=1900.0, Sc=0.7)
    A = Specie(name="air", W=29.0, Cp=1005.0, Sc=1.0)
    mix = MixtureThermo(species=(V, A), inert_index=1,
                        transport=ConstTransport(1.8e-5), Pr=0.7)
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    fluid = ReactingQGDFoam(
        mesh=mesh, mixture=mix, tau_model=ConstScPrModel1(alpha=0.5),
        implicit_diffusion=True,
        bc_U=per, bc_p=per, bc_T=per, bc_Y=per,
        time=common.TimeControls(max_co=0.3, max_dt=2e-5, dt0=1e-6),
    )
    solver = ReactingLagrangianQGDFoam(
        fluid=fluid,
        cloud=ReactingCloud(rho_p=1000.0, two_way=True, wall="periodic",
                            evap_specie=0, K_evap=1e-7, latent_heat=2.3e6),
    )
    n = 16
    rng = np.random.default_rng(2)
    Y0 = jnp.stack([jnp.zeros(mesh.shape), jnp.ones(mesh.shape)])
    s = solver.init(
        p0=jnp.full(mesh.shape, 1e5), T0=jnp.full(mesh.shape, 350.0),
        U0=jnp.zeros((2,) + mesh.shape),
        Y0=Y0,
        x_p=jnp.asarray(rng.uniform(0.1, 0.4, (2, n))),
        u_p=jnp.zeros((2, n)), T_p=jnp.full((n,), 330.0),
        d_p=jnp.full((n,), 200e-6),
    )
    m0 = float(jnp.sum(solver.cloud.mass(s.cloud)))
    gas_mass0 = float(jnp.sum(s.fluid.rho * mesh.cell_volume))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 25)
    m1 = float(jnp.sum(solver.cloud.mass(s.cloud)))
    gas_mass1 = float(jnp.sum(s.fluid.rho * mesh.cell_volume))
    assert m1 < m0  # evaporation happened
    np.testing.assert_allclose(gas_mass1 - gas_mass0, m0 - m1, rtol=1e-4)
    # vapor specie appeared
    assert float(jnp.max(s.fluid.Y[0])) > 0.0
    assert np.all(np.isfinite(np.asarray(s.fluid.T)))
