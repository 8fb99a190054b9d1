"""QHD family on stairstep solid masks (VERDICT r3 next #4).

The masked Helmholtz/Poisson operator (linsolve fluid_mask: zero-flux faces
at immersed walls, identity solid rows, fluid-subspace projector) plus the
mirror-ghost wall fill make QHDFoam run on L-shaped multi-block meshes —
the masked counterpart of the reference's mesh-agnostic pEqn
(QHDpEqn_8H_source.html:33-48).  Oracle: a grid-aligned flat immersed wall
must reproduce the body-fitted run on the reduced rectangle exactly (the
mirror fill IS the body-fitted wall ghost convention there).
"""
import numpy as np
import jax
import jax.numpy as jnp

from qgdsolver_tpu import cases
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qhd import QHDFoam
from qgdsolver_tpu.physics.thermo import RhoConstThermo
from qgdsolver_tpu.physics.qgdcoeffs import H2bynuQHD


def _cavity(mesh):
    """Differentially-heated cavity solver on `mesh` (hot x-lo, cold x-hi,
    adiabatic no-slip y walls) — the de Vahl Davis config of
    cases.buoyant_cavity."""
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-2, Pr=0.71,
                            beta=-3e-3)
    noslip = bcm.FieldBCs.uniform(bcm.FixedValue(jnp.zeros(2)), 2)
    bc_T = bcm.FieldBCs((
        (bcm.FixedValue(1.0), bcm.FixedValue(-1.0)),
        (bcm.ZeroGradient(), bcm.ZeroGradient()),
    ))
    return QHDFoam(
        mesh=mesh, thermo=thermo, tau_model=H2bynuQHD(alpha=0.3),
        g=(0.0, -9.81), bc_U=noslip, bc_T=bc_T,
        bc_p=bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2),
        time=common.TimeControls(max_co=0.3, max_dt=0.05, dt0=1e-3),
        # tight CG tolerance: the oracle comparison should see the
        # discretization (identical), not per-step solver tolerance
        cg_tol=1e-12,
    )


def test_masked_cavity_matches_bodyfitted():
    """A solid band along y < 0.25 of a unit cavity vs the body-fitted
    cavity on [0, 1] x [0.25, 1]: the flat grid-aligned immersed wall must
    reproduce the body-fitted fields (identical dx, same BCs)."""
    n = 48
    nsolid = n // 4
    solid = np.zeros((n, n), dtype=bool)
    solid[:, :nsolid] = True
    mesh_m = Mesh(x_faces=(np.linspace(0, 1, n + 1),
                           np.linspace(0, 1, n + 1)), solid=solid)
    mesh_b = Mesh(x_faces=(np.linspace(0, 1, n + 1),
                           np.linspace(0.25, 1.0, n - nsolid + 1)))
    sm = _cavity(mesh_m)
    sb = _cavity(mesh_b)
    st_m = sm.init(jnp.zeros((2, n, n)), jnp.zeros((n, n)))
    st_b = sb.init(jnp.zeros((2, n, n - nsolid)),
                   jnp.zeros((n, n - nsolid)))
    step_m = jax.jit(sm.make_step())
    step_b = jax.jit(sb.make_step())
    for _ in range(40):
        st_m = step_m(st_m)
        st_b = step_b(st_b)
    # identical dt chains (the solid band contributes no Courant signal)
    np.testing.assert_allclose(float(st_m.dt), float(st_b.dt), rtol=1e-12)
    # fluid-region fields match the body-fitted run to fp noise: the
    # flat grid-aligned immersed wall IS the body-fitted wall discretely
    for name, atol in (("T", 1e-9), ("U", 1e-9)):
        a = np.asarray(getattr(st_b, name))
        b = np.asarray(getattr(st_m, name))[..., nsolid:]
        np.testing.assert_allclose(b, a, atol=atol, err_msg=name)
    # pressure matches up to the (different) reference constant
    pa = np.asarray(st_b.p)
    pb = np.asarray(st_m.p)[:, nsolid:]
    np.testing.assert_allclose(pb - pb.mean(), pa - pa.mean(), atol=1e-9)
    # buoyancy actually did something (the comparison is not vacuous)
    assert np.abs(np.asarray(st_b.U)).max() > 1e-8


def test_backward_facing_step_qhd_case(tmp_path):
    """An L-shaped multi-block QHDFoam case (backward-facing step) builds
    via case ingestion — the r3 gate is lifted — and runs stable steps
    with flow expanding over the step."""
    from qgdsolver_tpu.io import foam_case

    case = tmp_path / "bfs_qhd"
    (case / "system").mkdir(parents=True)
    (case / "constant").mkdir()
    (case / "0").mkdir()
    (case / "system" / "blockMeshDict").write_text("""
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
convertToMeters 1;
vertices
(
    (0 0 0) (1 0 0) (2 0 0) (0 0.5 0) (1 0.5 0) (2 0.5 0) (1 1 0) (2 1 0)
    (0 0 1) (1 0 1) (2 0 1) (0 0.5 1) (1 0.5 1) (2 0.5 1) (1 1 1) (2 1 1)
);
blocks
(
    hex (0 1 4 3 8 9 12 11)   (16 8 1) simpleGrading (1 1 1)
    hex (1 2 5 4 9 10 13 12)  (16 8 1) simpleGrading (1 1 1)
    hex (4 5 7 6 12 13 15 14) (16 8 1) simpleGrading (1 1 1)
);
edges ();
boundary
(
    inlet  { type patch; faces ((0 8 11 3)); }
    outlet { type patch; faces ((2 5 13 10) (5 7 15 13)); }
    walls  { type wall; faces ((0 1 9 8) (1 2 10 9) (3 11 12 4)
                               (4 12 14 6) (6 14 15 7)); }
    frontAndBack
    {
        type empty;
        faces ((0 3 4 1) (1 4 5 2) (4 6 7 5)
               (8 9 12 11) (9 10 13 12) (12 13 15 14));
    }
);
mergePatchPairs ();
""")
    (case / "system" / "controlDict").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object controlDict; }\n"
        "application QHDFoam;\nstartFrom startTime;\nstartTime 0;\n"
        "endTime 1;\ndeltaT 1e-3;\nadjustTimeStep yes;\nmaxCo 0.3;\n"
        "maxDeltaT 0.01;\n")
    (case / "system" / "fvSchemes").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object fvSchemes; }\nfvsc { default GaussVolPoint; }\n")
    (case / "system" / "fvSolution").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object fvSolution; }\nsolvers { }\n")
    (case / "constant" / "thermophysicalProperties").write_text("""
FoamFile { version 2.0; format ascii; class dictionary; object thermophysicalProperties; }
thermoType
{
    type heRhoQGDThermo; mixture pureMixture; transport const;
    thermo hConst; equationOfState rhoConst; specie specie;
    energy sensibleInternalEnergy;
}
mixture
{
    specie { molWeight 28.96; }
    equationOfState { rho 1.0; }
    thermodynamics { Cp 1000; Hf 0; }
    transport { mu 1e-3; Pr 0.71; }
}
QGD { QGDCoeffs H2bynuQHD; H2bynuQHDDict { alphaQGD 0.3; } }
""")
    (case / "0" / "U").write_text("""
FoamFile { version 2.0; format ascii; class volVectorField; object U; }
internalField uniform (0 0 0);
boundaryField
{
    inlet { type fixedValue; value uniform (0.1 0 0); }
    outlet { type zeroGradient; }
    walls { type noSlip; }
    frontAndBack { type empty; }
}
""")
    (case / "0" / "T").write_text("""
FoamFile { version 2.0; format ascii; class volScalarField; object T; }
internalField uniform 300;
boundaryField
{
    inlet { type fixedValue; value uniform 300; }
    outlet { type zeroGradient; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""")
    (case / "0" / "p").write_text("""
FoamFile { version 2.0; format ascii; class volScalarField; object p; }
internalField uniform 0;
boundaryField
{
    inlet { type zeroGradient; }
    outlet { type fixedValue; value uniform 0; }
    walls { type zeroGradient; }
    frontAndBack { type empty; }
}
""")
    solver, state = foam_case.build_case(str(case))
    assert isinstance(solver, QHDFoam)
    assert solver.mesh.solid is not None
    # the dead quadrant is x < 1, y > 0.5 (above the inlet channel)
    assert solver.mesh.solid[:16, 8:].all()
    assert solver.mesh.solid.sum() == 16 * 8
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, state, 20)
    U = np.asarray(s.U)
    assert np.isfinite(U).all() and np.isfinite(np.asarray(s.p)).all()
    # flow entered the channel and reaches the expanded section
    assert U[0, :16, :8].max() > 0.01
    # solid cells hold their (zero) carried velocity
    assert np.abs(U[:, :16, 8:]).max() == 0.0
