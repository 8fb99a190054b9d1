"""QGDFoam implicit diffusion on stairstep solid masks (VERDICT r4 next #8).

The masked Helmholtz operator (linsolve fluid_mask: zero-flux immersed faces,
no-slip immersed Dirichlet for U, identity solid rows) now backs QGDFoam's
implicit-diffusion sub-step too, so compressible L-shaped multi-block cases
can run with implicitDiffusion on — reference parity:
QGDUEqn_8H_source.html:54-75 / QGDEEqn_8H_source.html work on any mesh.
Oracle (as in test_qhd_solid): a grid-aligned flat immersed wall must
reproduce the body-fitted run on the reduced rectangle to fp noise.
"""
import numpy as np
import jax
import jax.numpy as jnp

from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam
from qgdsolver_tpu.physics.thermo import PerfectGasThermo
from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1


def _shear_box(mesh):
    """Subsonic lid-driven compressible box: moving lid at y_hi, no-slip
    elsewhere, adiabatic walls — exercises both the U and the e implicit
    Helmholtz solves."""
    from qgdsolver_tpu.physics.thermo import ConstTransport

    thermo = PerfectGasThermo(R=287.0, Cp=1005.0,
                              transport=ConstTransport(1e-3), Pr=0.71)
    bc_U = bcm.FieldBCs((
        (bcm.FixedValue(jnp.zeros(2)), bcm.FixedValue(jnp.zeros(2))),
        (bcm.FixedValue(jnp.zeros(2)),
         bcm.FixedValue(jnp.asarray([10.0, 0.0]))),
    ))
    return QGDFoam(
        mesh=mesh, thermo=thermo, tau_model=ConstScPrModel1(alpha=0.3),
        bc_U=bc_U,
        bc_p=bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2),
        bc_T=bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2),
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
        implicit_diffusion=True,
        cg_tol=1e-13,
    )


def test_masked_implicit_diffusion_matches_bodyfitted():
    """Solid band y < 0.25 of a unit box vs the body-fitted box on
    [0, 1] x [0.25, 1] with implicit_diffusion=True: identical dt chains
    and fluid-region fields to fp noise."""
    n = 32
    nsolid = n // 4
    solid = np.zeros((n, n), dtype=bool)
    solid[:, :nsolid] = True
    mesh_m = Mesh(x_faces=(np.linspace(0, 1, n + 1),
                           np.linspace(0, 1, n + 1)), solid=solid,
                  dtype=np.float64)
    mesh_b = Mesh(x_faces=(np.linspace(0, 1, n + 1),
                           np.linspace(0.25, 1.0, n - nsolid + 1)),
                  dtype=np.float64)
    sm = _shear_box(mesh_m)
    sb = _shear_box(mesh_b)
    p0, T0 = 1e5, 300.0
    st_m = sm.init(p0 * jnp.ones((n, n)), T0 * jnp.ones((n, n)),
                   jnp.zeros((2, n, n)))
    st_b = sb.init(p0 * jnp.ones((n, n - nsolid)),
                   T0 * jnp.ones((n, n - nsolid)),
                   jnp.zeros((2, n, n - nsolid)))
    step_m = jax.jit(sm.make_step())
    step_b = jax.jit(sb.make_step())
    st_m = common.run_steps(step_m, st_m, 40)
    st_b = common.run_steps(step_b, st_b, 40)
    np.testing.assert_allclose(float(st_m.dt), float(st_b.dt), rtol=1e-12)
    for name, atol in (("rho", 1e-10), ("rhoU", 1e-7), ("rhoE", 1e-3)):
        a = np.asarray(getattr(st_b, name))
        b = np.asarray(getattr(st_m, name))[..., nsolid:]
        np.testing.assert_allclose(b, a, atol=atol, err_msg=name)
    # the lid actually stirred the fluid (comparison is not vacuous)
    assert np.abs(np.asarray(st_b.rhoU)).max() > 1e-3
    # solid cells hold non-prognostic carried values (finite, bounded)
    assert np.isfinite(np.asarray(st_m.rhoU)).all()


def test_masked_implicit_vs_explicit_consistency():
    """On the same masked mesh, implicit and explicit diffusion agree to
    O(dt) after a short run (same operator, different splitting)."""
    n = 24
    nsolid = n // 3
    solid = np.zeros((n, n), dtype=bool)
    solid[:nsolid, :nsolid] = True  # L-shaped corner block
    mesh = Mesh(x_faces=(np.linspace(0, 1, n + 1),
                         np.linspace(0, 1, n + 1)), solid=solid,
                dtype=np.float64)
    si = _shear_box(mesh)
    se = _shear_box(mesh).__class__(
        **{**{f.name: getattr(si, f.name)
              for f in si.__dataclass_fields__.values()},
           "implicit_diffusion": False})
    p0, T0 = 1e5, 300.0
    s0 = si.init(p0 * jnp.ones((n, n)), T0 * jnp.ones((n, n)),
                 jnp.zeros((2, n, n)))
    sti = common.run_steps(jax.jit(si.make_step()), s0, 30)
    ste = common.run_steps(jax.jit(se.make_step()), s0, 30)
    fluid = ~solid
    ui = np.asarray(sti.rhoU)[:, fluid]
    ue = np.asarray(ste.rhoU)[:, fluid]
    # same flow to leading order; dominated by the splitting difference
    np.testing.assert_allclose(ui, ue, atol=5e-2 * np.abs(ue).max() + 1e-9)
    assert np.abs(ue).max() > 1e-3
