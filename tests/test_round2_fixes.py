"""Round-2 parity fixes (VERDICT r1 items 5, 8, 9, 10 + weak items 3, 4, 6).

Covers: faithful fvc::smooth, varScModel6/7 boundary dpf terms, zQGD
implicit-diffusion energy BCs, per-specie species BCs, the JANAF single-gas
psi-thermo, true inletOutlet, per-term fvsc scheme selection, and the
failure-detection runner.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.ops import fvsc
from qgdsolver_tpu.ops.pad import ghost_pad
from qgdsolver_tpu.physics import qgdcoeffs as qc
from qgdsolver_tpu.physics.thermo import (
    PerfectGasThermo, JanafThermo, JanafPerfectGasThermo, SutherlandTransport,
)
from qgdsolver_tpu.solvers import common
from qgdsolver_tpu.solvers.qgd import QGDFoam
from qgdsolver_tpu.solvers.zqgd import ZQGDFoam


# ---------------------------------------------------------------------------
# fvc::smooth
# ---------------------------------------------------------------------------


def test_fvc_smooth_ratio_bound_and_decay():
    """After fvc_smooth no adjacent pair may violate field[i] >=
    field[j]/(1+coeff), and a peak decays by exactly that ratio per ring
    (OpenFOAM fvcSmooth.C FaceCellWave semantics)."""
    coeff = 0.25
    f = np.full((9, 9), 0.01)
    f[4, 4] = 1.0
    out = np.asarray(qc.fvc_smooth(jnp.asarray(f), coeff))
    r = 1.0 + coeff
    # exact geometric decay along the axis from the peak until background
    for k in range(1, 5):
        expect = max(1.0 / r**k, 0.01)
        np.testing.assert_allclose(out[4, 4 + k], expect, rtol=1e-12)
    # global pairwise ratio bound in both axes
    assert (out[1:, :] >= out[:-1, :] / r - 1e-12).all()
    assert (out[:-1, :] >= out[1:, :] / r - 1e-12).all()
    assert (out[:, 1:] >= out[:, :-1] / r - 1e-12).all()
    # the corner is 8 face-hops away: geometric decay by Manhattan distance
    np.testing.assert_allclose(out[0, 0], max(1.0 / r**8, 0.01), rtol=1e-12)
    # fixed point: smoothing twice changes nothing
    out2 = np.asarray(qc.fvc_smooth(jnp.asarray(out), coeff))
    np.testing.assert_allclose(out2, out, rtol=1e-12)


def test_fvc_smooth_diagonal_decays_by_manhattan_distance():
    """FaceCellWave propagates through faces: the diagonal neighbour is two
    face-hops away, so it decays by 1/r^2, not 1/r."""
    coeff = 0.5
    f = np.full((7, 7), 1e-6)
    f[3, 3] = 1.0
    out = np.asarray(qc.fvc_smooth(jnp.asarray(f), coeff))
    np.testing.assert_allclose(out[4, 4], 1.0 / 1.5**2, rtol=1e-12)
    np.testing.assert_allclose(out[5, 4], 1.0 / 1.5**3, rtol=1e-12)


# ---------------------------------------------------------------------------
# varScModel6/7 boundary dpf contribution
# ---------------------------------------------------------------------------


def test_varsc6_boundary_dpf_fixed_value():
    """With a fixedValue p patch the boundary face contributes
    dpf = p_face - p_cell to the cell sum (varScModel6_8C:256-262); with
    zeroGradient it contributes 0.  Hand-computed on a 4-cell 1D mesh."""
    mesh = Mesh.uniform((4,), lengths=(4.0,), dtype=np.float64)
    p = jnp.asarray([2.0, 2.0, 2.0, 2.0])
    # zeroGradient: uniform p -> sensor identically 0
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    sc0 = np.asarray(qc._pressure_jump_sensor(mesh, p, bc_p=zg))
    np.testing.assert_allclose(sc0, 0.0, atol=1e-15)

    # fixedValue 4.0 at the low end: ghost = 2*4-2 = 6, p_face = 4
    # cell 0: internal hi face dp = 0 (owner +0), boundary lo face dpf =
    #   p_face - p_cell = +2.  sum_pf = (4 + 2)/2 = 3 -> Sc = |2|/3
    bcs = zg.replace(0, 0, bcm.FixedValue(4.0))
    sc = np.asarray(qc._pressure_jump_sensor(mesh, p, bc_p=bcs))
    np.testing.assert_allclose(sc[0], 2.0 / 3.0, rtol=1e-12)
    np.testing.assert_allclose(sc[1:], 0.0, atol=1e-15)


def test_varsc7_uses_boundary_terms():
    """varScModel7 threads bc_p through to the sensor."""
    mesh = Mesh.uniform((4,), lengths=(4.0,), dtype=np.float64)
    p = jnp.full((4,), 2.0)
    c = jnp.full((4,), 340.0)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    bcs = zg.replace(0, 0, bcm.FixedValue(4.0))
    m = qc.VarScModel7(cSc1=2.0)
    co = m.correct(mesh, c=c, p=p, bc_p=bcs)
    np.testing.assert_allclose(np.asarray(co.sc)[0], 2.0 * 2.0 / 3.0, rtol=1e-12)
    co0 = m.correct(mesh, c=c, p=p)  # no BCs -> zeroGradient convention
    np.testing.assert_allclose(np.asarray(co0.sc), 0.0, atol=1e-15)


# ---------------------------------------------------------------------------
# zQGD implicit-diffusion energy BC (VERDICT weak #3)
# ---------------------------------------------------------------------------


def test_zqgd_implicit_fixed_T_wall_extracts_heat():
    """A fixed-T cold wall with implicit diffusion must cool the gas; the
    old bcs=zeroGradient bug produced zero wall heat flux."""
    mesh = Mesh.uniform((32,), lengths=(1.0,), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    bc_T = bcm.FieldBCs([(bcm.FixedValue(250.0), bcm.FixedValue(250.0))])
    # still gas, hot interior, strong artificial conduction via tau model
    solver = ZQGDFoam(
        mesh=mesh, thermo=th,
        tau_model=qc.ConstScPrModel1(alpha=0.5, Sc=1.0, Pr=1.0),
        bc_U=bcm.FieldBCs.uniform(bcm.noslip(1), 1), bc_p=zg, bc_T=bc_T,
        implicit_diffusion=True,
        time=common.TimeControls(max_co=0.3, max_dt=1e-4, dt0=1e-6),
    )
    s = solver.init(p0=jnp.full((32,), 1e5), T0=jnp.full((32,), 300.0),
                    U0=jnp.zeros((1, 32)))
    e0 = float(jnp.sum(s.rhoE))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 20)
    e1 = float(jnp.sum(s.rhoE))
    assert np.isfinite(e1)
    assert e1 < e0 - 1e-3 * abs(e0) * 0  # strictly decreasing
    assert e1 < e0
    # wall-adjacent cells must be measurably cooled toward 250 K
    T = np.asarray(th.T_from_e(s.rhoE / s.rho))
    assert T[0] < 299.9 and T[-1] < 299.9


# ---------------------------------------------------------------------------
# per-specie BCs (VERDICT weak #4)
# ---------------------------------------------------------------------------


def test_per_specie_inlet_bcs():
    """Each specie honours its own inlet BC: ghosts of specie 0 follow its
    fixedValue while specie 1 keeps zeroGradient (QGDYEqn per-specie field
    dictionaries)."""
    from qgdsolver_tpu.physics.species import Specie, MixtureThermo
    from qgdsolver_tpu.physics.thermo import ConstTransport
    from qgdsolver_tpu.physics.chemistry import NoCombustion
    from qgdsolver_tpu.solvers.reacting import ReactingQGDFoam

    mesh = Mesh.uniform((16, 6), lengths=(1.0, 1.0), dtype=np.float64)
    F = Specie(name="F", W=16.0, Cp=2200.0, hf=0.0, Sc=0.7)
    O = Specie(name="O", W=32.0, Cp=920.0, hf=0.0, Sc=0.8)
    N = Specie(name="N", W=28.0, Cp=1040.0, hf=0.0, Sc=1.0)
    mix = MixtureThermo(species=(F, O, N), inert_index=2,
                        transport=ConstTransport(1.8e-5), Pr=0.7)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    # specie F: fixed 0.9 at x-lo inlet; specie O: fixed 0.05; inert: zg
    bc_F = zg.replace(0, 0, bcm.FixedValue(0.9))
    bc_O = zg.replace(0, 0, bcm.FixedValue(0.05))
    solver = ReactingQGDFoam(
        mesh=mesh, mixture=mix, combustion=NoCombustion(),
        tau_model=qc.ConstScPrModel1(alpha=0.5),
        bc_U=zg.replace(0, 0, bcm.FixedValue(jnp.asarray([50.0, 0.0]))),
        bc_p=zg, bc_T=zg, bc_Y=(bc_F, bc_O, zg),
        time=common.TimeControls(max_co=0.3, max_dt=1e-4, dt0=1e-7),
    )
    Y0 = jnp.stack([jnp.full(mesh.shape, 0.2), jnp.full(mesh.shape, 0.3),
                    jnp.full(mesh.shape, 0.5)])
    s = solver.init(p0=jnp.full(mesh.shape, 1e5),
                    T0=jnp.full(mesh.shape, 600.0),
                    U0=jnp.stack([jnp.full(mesh.shape, 50.0),
                                  jnp.zeros(mesh.shape)]), Y0=Y0)
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 10)
    YF = np.asarray(s.Y[0])
    YO = np.asarray(s.Y[1])
    # fuel is fed at the inlet (rises above 0.2 near x-lo), oxidizer is
    # diluted toward 0.05
    assert YF[0].mean() > 0.21
    assert YO[0].mean() < 0.295
    assert np.isfinite(np.asarray(s.rho)).all()


# ---------------------------------------------------------------------------
# JANAF single-gas psi-thermo (VERDICT item 10)
# ---------------------------------------------------------------------------

# JANAF coefficients for N2 (NASA 7-coeff, standard database values)
N2_LOW = (3.298677, 1.4082404e-3, -3.963222e-6, 5.641515e-9, -2.444854e-12,
          -1020.8999, 3.950372)
N2_HIGH = (2.92664, 1.4879768e-3, -5.68476e-7, 1.0097038e-10, -6.753351e-15,
           -922.7977, 5.980528)
R_N2 = 8314.462618 / 28.0134


def _janaf_thermo():
    j = JanafThermo(R=R_N2, low=N2_LOW, high=N2_HIGH, Tcommon=1000.0)
    return JanafPerfectGasThermo(
        janaf=j, transport=SutherlandTransport(As=1.4792e-6, Ts=116.0))


def test_janaf_psi_thermo_roundtrip():
    th = _janaf_thermo()
    T = jnp.asarray([250.0, 300.0, 800.0, 1500.0, 2500.0])
    e = th.e_from_T(T)
    T2 = th.T_from_e(e)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), rtol=1e-8)
    # e(Tstd)_sensible ~ -R*Tstd for sensibleInternalEnergy (h_s(Tstd) = 0)
    e_std = float(th.e_from_T(jnp.asarray(298.15)))
    np.testing.assert_allclose(e_std, -R_N2 * 298.15, rtol=1e-10)
    # gamma(300K) for N2 ~ 1.4
    g = float(th.gamma_of(jnp.asarray(300.0)))
    assert 1.39 < g < 1.41
    # c = sqrt(gamma R T) ~ 353 m/s at 300 K
    c = float(th.c_from_pT(jnp.asarray(1e5), jnp.asarray(300.0)))
    assert 348.0 < c < 356.0
    # Sutherland mu(300K) for N2 ~ 1.78e-5
    mu = float(th.mu(jnp.asarray(1e5), jnp.asarray(300.0)))
    assert 1.6e-5 < mu < 2.0e-5
    # Eucken alphah is positive and of the right scale (Pr_eff ~ 0.7)
    al = float(th.alphah(jnp.asarray(1e5), jnp.asarray(300.0)))
    assert 1.5e-5 < al < 3.5e-5


def test_qgdfoam_janaf_freestream():
    """QGDFoam over the JANAF thermo preserves a uniform freestream (the
    gamma face field path)."""
    mesh = Mesh.uniform((12, 8), lengths=(1.0, 1.0), dtype=np.float64)
    th = _janaf_thermo()
    per = bcm.FieldBCs.uniform(bcm.Periodic(), 2)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=qc.ConstScPrModel1(alpha=0.5),
        bc_U=per, bc_p=per, bc_T=per,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    s = solver.init(p0=jnp.full(mesh.shape, 1e5),
                    T0=jnp.full(mesh.shape, 1200.0),
                    U0=jnp.stack([jnp.full(mesh.shape, 150.0),
                                  jnp.zeros(mesh.shape)]))
    step = jax.jit(solver.make_step())
    s = common.run_steps(step, s, 10)
    np.testing.assert_allclose(np.asarray(s.rho), float(s.rho[0, 0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.rhoU[0] / s.rho), 150.0, rtol=1e-9)
    T = np.asarray(th.T_from_e(s.rhoE / s.rho - 0.5 * (s.rhoU[0] / s.rho) ** 2
                               - 0.5 * (s.rhoU[1] / s.rho) ** 2))
    np.testing.assert_allclose(T, 1200.0, rtol=1e-8)


# ---------------------------------------------------------------------------
# inletOutlet (VERDICT item 8b)
# ---------------------------------------------------------------------------


def test_inlet_outlet_ghost_switching():
    """InletOutlet resolves per-face: inflow faces get the fixed inlet ghost,
    outflow faces behave as zeroGradient."""
    mesh = Mesh.uniform((4, 4), lengths=(1.0, 1.0), dtype=np.float64)
    T = jnp.arange(16.0).reshape(4, 4)
    # velocity: u>0 in the upper half (outflow at x-hi, inflow at x-lo),
    # u<0 in the lower half
    u = jnp.where(jnp.arange(4)[None, :] >= 2, 1.0, -1.0) * jnp.ones((4, 4))
    U = jnp.stack([u, jnp.zeros((4, 4))])
    io = bcm.InletOutlet(99.0)
    bcs = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2).replace(0, 1, io)
    resolved = bcm.resolve_inlet_outlet(bcs, U, 2)
    assert isinstance(resolved[0, 1], bcm.FluxSwitched)
    Tp = np.asarray(ghost_pad(T, resolved, mesh))
    inner_hi = np.asarray(T[-1])  # last interior row
    # columns 0,1: u<0 at x-hi -> inflow -> ghost = 2*99 - interior
    np.testing.assert_allclose(Tp[-1, 1:3], 2 * 99.0 - inner_hi[:2], rtol=1e-14)
    # columns 2,3: u>0 at x-hi -> outflow -> zeroGradient ghost
    np.testing.assert_allclose(Tp[-1, 3:5], inner_hi[2:], rtol=1e-14)


def test_inlet_outlet_differs_from_extrapolated_entrainment():
    """QHD cavity with an inletOutlet T boundary: where backflow enters, the
    inlet temperature is imposed — an Extrapolated BC cannot do that."""
    from qgdsolver_tpu.solvers.qhd import QHDFoam
    from qgdsolver_tpu.physics.thermo import RhoConstThermo
    from qgdsolver_tpu.physics.qgdcoeffs import H2bynuQHD

    mesh = Mesh.uniform((12, 12), lengths=(1.0, 1.0), dtype=np.float64)
    thermo = RhoConstThermo(rho0=1.0, Cp=1000.0, mu0=1e-2, Pr=0.7)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    noslip = bcm.FieldBCs.uniform(bcm.noslip(2), 2)
    bc_T_io = zg.replace(1, 1, bcm.InletOutlet(350.0))
    bc_T_ex = zg.replace(1, 1, bcm.Extrapolated())

    def run(bc_T):
        solver = QHDFoam(mesh=mesh, thermo=thermo, tau_model=H2bynuQHD(),
                         bc_U=noslip, bc_T=bc_T, bc_p=zg,
                         time=common.TimeControls(max_co=0.4, max_dt=5e-3,
                                                  dt0=1e-4))
        # downward interior velocity near the top boundary -> inflow there
        y = jnp.asarray(mesh.cell_coords(1)) * jnp.ones(mesh.shape)
        U0 = jnp.stack([jnp.zeros(mesh.shape), -0.5 * y])
        s = solver.init(U0=U0, T0=jnp.full(mesh.shape, 300.0))
        step = jax.jit(solver.make_step())
        return common.run_steps(step, s, 60)

    s_io = run(bc_T_io)
    s_ex = run(bc_T_ex)
    # the inletOutlet run pulls 350 K fluid in at the top; Extrapolated holds
    # the interior profile
    assert float(jnp.max(s_io.T)) > 302.0
    assert float(jnp.max(s_ex.T)) < 300.5
    assert float(jnp.max(s_io.T)) > float(jnp.max(s_ex.T)) + 1.0


# ---------------------------------------------------------------------------
# per-term fvsc scheme (VERDICT item 8a)
# ---------------------------------------------------------------------------


def test_scheme_for_lookup():
    spec = {"grad(p)": "reduced", "default": "full"}
    assert fvsc.scheme_for(spec, "grad(p)") == "reduced"
    assert fvsc.scheme_for(spec, "grad(U)") == "full"
    assert fvsc.scheme_for("reduced", "grad(U)") == "reduced"


def test_qgd_per_term_scheme_changes_solution():
    """fvsc={'grad(p)': 'reduced'} produces a different (but finite) result
    from the all-full configuration on a sheared field."""
    mesh = Mesh.uniform((16, 16), lengths=(1.0, 1.0), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)

    x = jnp.asarray(mesh.cell_coords(0)) * jnp.ones(mesh.shape)
    y = jnp.asarray(mesh.cell_coords(1)) * jnp.ones(mesh.shape)
    p0 = 1e5 * (1.0 + 0.05 * jnp.sin(2 * jnp.pi * (x + 2 * y)))
    U0 = jnp.stack([jnp.full(mesh.shape, 30.0), jnp.full(mesh.shape, 10.0)])

    def run(spec):
        solver = QGDFoam(mesh=mesh, thermo=th,
                         tau_model=qc.ConstScPrModel1(alpha=0.5),
                         bc_U=zg, bc_p=zg, bc_T=zg, fvsc_scheme=spec,
                         time=common.TimeControls(max_co=0.3, max_dt=1e-4,
                                                  dt0=1e-7))
        s = solver.init(p0=p0, T0=jnp.full(mesh.shape, 300.0), U0=U0)
        step = jax.jit(solver.make_step())
        return common.run_steps(step, s, 5)

    s_full = run("full")
    s_mixed = run({"grad(p)": "reduced", "default": "full"})
    s_full2 = run({"default": "full"})
    # dict with default=full reproduces the plain full run bitwise
    np.testing.assert_array_equal(np.asarray(s_full.rho), np.asarray(s_full2.rho))
    # reduced grad(p) changes the tangential pressure terms
    assert not np.allclose(np.asarray(s_full.rhoU), np.asarray(s_mixed.rhoU),
                           rtol=1e-12)
    assert np.isfinite(np.asarray(s_mixed.rho)).all()


# ---------------------------------------------------------------------------
# failure detection runner (VERDICT item 7)
# ---------------------------------------------------------------------------


def test_run_steps_nonphysical_dump(tmp_path):
    """A deliberately unstable case trips the checked runner: it dumps the
    state pytree and raises (the reference's crash-dump,
    QGDFoam_8C:142-147)."""
    mesh = Mesh.uniform((16,), lengths=(1.0,), dtype=np.float64)
    th = PerfectGasThermo(R=287.0, Cp=1004.5)
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 1)
    solver = QGDFoam(
        mesh=mesh, thermo=th, tau_model=qc.ConstScPrModel1(alpha=0.5),
        bc_U=zg, bc_p=zg, bc_T=zg,
        # adjust_time_step off + huge dt0 -> CFL blowup by design
        time=common.TimeControls(adjust_time_step=False, dt0=0.5),
    )
    x = jnp.asarray(mesh.cell_coords(0))
    p0 = jnp.where(x < 0.5, 10e5, 0.1e5)
    s = solver.init(p0=p0, T0=jnp.full((16,), 300.0), U0=jnp.zeros((1, 16)))
    step = jax.jit(solver.make_step())
    dump = str(tmp_path / "dump")
    with pytest.raises(common.NonphysicalStateError) as exc:
        common.run_steps(step, s, 200, check_every=10, dump_dir=dump)
    assert exc.value.dump_path is not None
    assert os.path.exists(exc.value.dump_path)
    # the dump restores into the state structure
    from qgdsolver_tpu.utils import checkpoint

    restored, step_n = checkpoint.restore_latest(s, dump)
    assert step_n is not None
    assert restored.rho.shape == s.rho.shape
