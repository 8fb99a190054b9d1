"""Tests for thermo models and tau-coefficient models."""
import jax.numpy as jnp
import numpy as np
import pytest

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.physics import thermo as tm
from qgdsolver_tpu.physics import qgdcoeffs as qc


def test_perfect_gas_relations():
    th = tm.PerfectGasThermo(R=287.0, Cp=1005.0)
    T = jnp.asarray([300.0, 600.0])
    assert np.isclose(th.gamma, 1005.0 / (1005.0 - 287.0))
    np.testing.assert_allclose(th.e_from_T(T), th.Cv * T)
    np.testing.assert_allclose(th.T_from_e(th.e_from_T(T)), T)
    p = jnp.asarray([1e5, 2e5])
    rho = th.rho_from_p_T(p, T)
    np.testing.assert_allclose(th.p_from_rho_T(rho, T), p, rtol=1e-12)
    np.testing.assert_allclose(th.c(T), np.sqrt(th.gamma * 287.0 * T))


def test_transport_models():
    T = jnp.asarray([300.0, 1200.0])
    s = tm.SutherlandTransport(As=1.4792e-6, Ts=116.0)
    np.testing.assert_allclose(
        s.mu(None, T), 1.4792e-6 * np.sqrt(T) / (1 + 116.0 / T)
    )
    pl = tm.PowerLawTransport(mu0=1e-5, T0=300.0, k=0.7)
    np.testing.assert_allclose(pl.mu(None, T), 1e-5 * (T / 300.0) ** 0.7)


def test_rho_thermo_eos_roundtrip():
    th = tm.RhoThermo(eos=tm.StiffenedGasEoS(R=287.0, p_inf=1e6), R=287.0, Cp=1005.0)
    T = jnp.asarray([300.0])
    p = jnp.asarray([2e5])
    rho = th.rho(p, T)
    np.testing.assert_allclose(th.p_from_rho_T(rho, T), p, rtol=1e-10)
    assert th.c(p, T)[0] > 0


def test_janaf_newton_roundtrip():
    # N2-like JANAF coefficients (approximate)
    j = tm.JanafThermo(
        R=296.8,
        low=(3.298677, 1.4082404e-3, -3.963222e-6, 5.641515e-9, -2.444854e-12,
             -1020.8999, 3.950372),
        high=(2.92664, 1.4879768e-3, -5.68476e-7, 1.0097038e-10, -6.753351e-15,
              -922.7977, 5.980528),
    )
    T = jnp.asarray([400.0, 1500.0])
    e = j.e_abs(T)
    T2 = j.T_from_e(e, T * 1.3)
    np.testing.assert_allclose(T2, T, rtol=1e-6)


@pytest.fixture
def mesh2d():
    return Mesh.uniform((8, 6), lengths=(1.0, 1.0), dtype=np.float64)


def test_const_sc_pr_model1(mesh2d):
    c = jnp.full(mesh2d.shape, 340.0)
    p = jnp.full(mesh2d.shape, 1e5)
    m = qc.ConstScPrModel1(alpha=0.5, Sc=1.0, Pr=1.0)
    co = m.correct(mesh2d, c=c, p=p)
    # uniform mesh: h_cell = dx-ish; tau = alpha*h/c
    np.testing.assert_allclose(co.tau, 0.5 * np.asarray(mesh2d.h_cell) / 340.0)
    np.testing.assert_allclose(co.mu_qgd, p * 1.0 * co.tau)
    np.testing.assert_allclose(co.alphau_qgd, co.mu_qgd)
    for a in range(2):
        assert co.tau_f[a].shape == mesh2d.face_shape(a)
        np.testing.assert_allclose(
            co.tau_f[a],
            0.5 / 340.0 * np.asarray(mesh2d.h_face(a)) * np.ones(mesh2d.face_shape(a)),
        )


def test_const_tau(mesh2d):
    m = qc.ConstTau(tau0=1e-3)
    co = m.correct(mesh2d, p=jnp.ones(mesh2d.shape))
    np.testing.assert_allclose(co.tau, 1e-3)
    np.testing.assert_allclose(co.mu_qgd, 0.0)


def test_hbyu_and_h2bynu(mesh2d):
    T = jnp.ones(mesh2d.shape)
    co = qc.HbyUQHD(alpha=0.4, U0=2.0).correct(mesh2d, T=T)
    np.testing.assert_allclose(co.tau, 0.4 * np.asarray(mesh2d.h_cell) / 2.0)
    co2 = qc.H2bynuQHD(alpha=0.3).correct(
        mesh2d, mu=jnp.full(mesh2d.shape, 0.01), rho=jnp.full(mesh2d.shape, 2.0)
    )
    np.testing.assert_allclose(
        co2.tau, 0.3 * np.asarray(mesh2d.h_cell) ** 2 / 0.005
    )


def test_pressure_jump_sensor_uniform_is_zero(mesh2d):
    p = jnp.full(mesh2d.shape, 1e5)
    sc = qc._pressure_jump_sensor(mesh2d, p)
    np.testing.assert_allclose(sc, 0.0, atol=1e-12)
    # linear p field also telescopes to ~0 in the interior
    x = np.asarray(mesh2d.cell_coords(0)) * np.ones(mesh2d.shape)
    sc2 = qc._pressure_jump_sensor(mesh2d, jnp.asarray(1e5 + 10.0 * x))
    assert float(jnp.max(jnp.abs(sc2[1:-1, :]))) < 1e-10


def test_var_sc_model5_relaxation(mesh2d):
    c = jnp.full(mesh2d.shape, 340.0)
    p = jnp.full(mesh2d.shape, 1e5)
    rho = jnp.full(mesh2d.shape, 1.2)
    m = qc.VarScModel5(rC=0.1, minSc=0.0, maxSc=2.0)
    sc_prev = jnp.full(mesh2d.shape, 1.0)
    co = m.correct(mesh2d, c=c, p=p, rho=rho, sc_prev=sc_prev)
    # uniform rho => sensor = 0 => sc = 0.9*prev (then smoothing keeps max)
    np.testing.assert_allclose(co.sc, 0.9, atol=1e-12)
