"""Combustion-family and chemistry-solver registry tests (reference
CombustionQGD/ChemistryQGD shims — SURVEY.md §2.3)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qgdsolver_tpu.core.registry import available
from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.ops import fvsc
from qgdsolver_tpu.physics.species import Specie, MixtureThermo
from qgdsolver_tpu.physics.thermo import ConstTransport
from qgdsolver_tpu.physics import chemistry as chem


def _mix():
    F = Specie(name="F", W=16.0, Cp=2200.0, hf=-7.49e6, Sc=0.7)
    O = Specie(name="O", W=32.0, Cp=920.0, hf=0.0, Sc=0.8)
    P = Specie(name="P", W=44.0, Cp=1100.0, hf=-9.0e6, Sc=0.9)
    N = Specie(name="N", W=28.0, Cp=1040.0, hf=0.0, Sc=1.0)
    return MixtureThermo(species=(F, O, P, N), inert_index=3,
                         transport=ConstTransport(1.8e-5), Pr=0.7)


def _state(mix):
    Y = tuple(jnp.full((4, 4), y) for y in (0.05, 0.2, 0.05, 0.7))
    rho = jnp.full((4, 4), 1.1)
    T = jnp.full((4, 4), 1500.0)
    p = jnp.full((4, 4), 1e5)
    return Y, rho, T, p


def test_registry_has_reference_families():
    got = set(available("combustion"))
    assert {"none", "noCombustion", "laminar", "eddyDissipation", "PaSR",
            "infinitelyFastChemistry", "eddyDissipationDiffusion",
            "zoneCombustion"} <= got
    assert {"none", "EulerImplicit", "ode"} <= set(
        available("chemistrySolver"))


def test_infinitely_fast_consumes_deficient_reactant():
    mix = _mix()
    Y, rho, T, p = _state(mix)
    model = chem.InfinitelyFastChemistry(fuel=0, oxidizer=1,
                                         products=((2, 1.0 + 4.0),), s=4.0,
                                         C=1.0, q_fuel=5e7)
    RR, Qdot = model.correct(mix, Y, rho, T, p, dt=1e-3)
    # fuel (0.05) is deficient vs Y_O/s = 0.05: rate = rho*0.05/dt
    np.testing.assert_allclose(np.asarray(RR[0]), -1.1 * 0.05 / 1e-3,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(RR[1]), 4.0 * np.asarray(RR[0]),
                               rtol=1e-6)
    # mass conservation of the reaction step
    np.testing.assert_allclose(np.asarray(sum(RR)), 0.0, atol=1e-4)
    assert float(Qdot[0, 0]) > 0


def test_pasr_scales_laminar_rates_down():
    mix = _mix()
    Y, rho, T, p = _state(mix)
    rxn = chem.Reaction(lhs=((0, 1.0), (1, 2.0)), rhs=((2, 1.0),),
                        A=1e8, beta=0.0, Ta=10000.0)
    lam = chem.Laminar(reactions=(rxn,))
    rr_lam, q_lam = lam.correct(mix, Y, rho, T, p)
    pasr = chem.PaSR(base=lam, t_mix=1e-4)
    rr_p, q_p = pasr.correct(mix, Y, rho, T, p)
    for a, b in zip(rr_p, rr_lam):
        assert np.all(np.abs(np.asarray(a)) <= np.abs(np.asarray(b)) + 1e-12)
    # kappa in (0, 1]
    ratio = float(q_p[0, 0] / (q_lam[0, 0] + 1e-30))
    assert 0.0 < ratio <= 1.0


def test_zone_combustion_masks_region():
    mix = _mix()
    Y, rho, T, p = _state(mix)
    mask = jnp.zeros((4, 4)).at[:2].set(1.0)
    base = chem.EddyDissipation(fuel=0, oxidizer=1, products=((2, 5.0),),
                                s=4.0, q_fuel=5e7)
    zoned = chem.ZoneCombustion(base=base, mask=mask)
    RR, Qdot = zoned.correct(mix, Y, rho, T, p)
    assert float(jnp.abs(RR[0][3, 3])) == 0.0
    assert float(jnp.abs(RR[0][0, 0])) > 0.0


def test_chemistry_solvers_converge_to_exponential_decay():
    """dY/dt = -k*Y (unimolecular) has exact solution; the sub-cycled
    integrators must beat the instantaneous-rate split step."""
    mix = _mix()
    Y, rho, T, p = _state(mix)
    # pseudo-first-order fuel decay: rate = k*conc_F*W_F = k*rho*Y_F
    k = 2000.0  # 1/s
    rxn = chem.Reaction(lhs=((0, 1.0),), rhs=((2, 16.0 / 44.0),),
                        A=k, beta=0.0, Ta=0.0)
    lam = chem.Laminar(reactions=(rxn,))
    dt = 1e-3  # k*dt = 2: strongly stiff for one Euler step
    exact = 0.05 * np.exp(-k * dt)

    rr0, _ = chem.DirectRates().rates(lam, mix, Y, rho, T, p, dt)
    y_direct = 0.05 + dt * float(rr0[0][0, 0]) / 1.1

    rr1, _ = chem.SubcycledEuler(n_sub=64).rates(lam, mix, Y, rho, T, p, dt)
    y_euler = 0.05 + dt * float(rr1[0][0, 0]) / 1.1

    rr2, _ = chem.SubcycledRK4(n_sub=8).rates(lam, mix, Y, rho, T, p, dt)
    y_rk = 0.05 + dt * float(rr2[0][0, 0]) / 1.1

    assert abs(y_euler - exact) < abs(y_direct - exact)
    assert abs(y_rk - exact) < 2e-5
    assert abs(y_euler - exact) < 2e-3


def test_fvsc_scheme_aliases_and_3d_guard():
    mesh2 = Mesh.uniform((8, 8), dtype=np.float64)
    assert fvsc.normalize_scheme("leastSquares", 2) == "full"
    assert fvsc.normalize_scheme("leastSquaresOpt", 2) == "full"
    assert fvsc.normalize_scheme("GaussVolPoint", 3) == "full"
    assert fvsc.normalize_scheme("reduced", 3) == "reduced"
    with pytest.raises(ValueError):
        fvsc.normalize_scheme("leastSquares", 3)
    with pytest.raises(ValueError):
        fvsc.normalize_scheme("bogus", 2)
    # alias actually drives the operator
    from qgdsolver_tpu.core import bc as bcm
    f = jnp.arange(64, dtype=jnp.float64).reshape(8, 8) * 0.1
    g1 = fvsc.grad(f, bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2), mesh2,
                   scheme="leastSquares")
    g2 = fvsc.grad(f, bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2), mesh2,
                   scheme="full")
    for a in range(2):
        np.testing.assert_array_equal(np.asarray(g1[a]), np.asarray(g2[a]))
