"""Sharded fused kernel: serial-vs-sharded bitwise equivalence.

The shard_map + ppermute decomposition of the fused whole-step kernel must
reproduce the single-shard fused path exactly: every shard computes the same
face stencils on its halo-carrying slab, the halo rows are exchanged after
the update, and the Courant/tau reductions are pmax/pmin over the axis
(SURVEY.md §2.4 — the reference's serial-oracle MPI testing practice).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qgdsolver_tpu import cases
from qgdsolver_tpu.ops import fused_qgd2d
from qgdsolver_tpu.parallel import sharding as shd


@pytest.mark.parametrize("nshards", [2, 4])
def test_sharded_fused_matches_serial_bitwise(nshards):
    if len(jax.devices()) < nshards:
        pytest.skip("not enough devices")
    solver, state = cases.supersonic_jet(shape=(64, 32), dtype=np.float32)
    dmesh = shd.make_device_mesh(jax.devices()[:nshards],
                                 shape=(nshards, 1), axis_names=("X", "Y"))
    sstep, to_sh, from_sh = fused_qgd2d.build_sharded_fused_step(
        solver, dmesh)
    # bitwise comparison needs the serial oracle in the SAME (row, lane)
    # orientation as the sharded slabs — disable the layout auto-transpose
    fstep, to_f, from_f = fused_qgd2d.build_fused_step(solver,
                                                       auto_layout=False)

    fs = to_f(state)
    ss = to_sh(state)
    jf, js = jax.jit(fstep), jax.jit(sstep)
    for _ in range(10):
        fs = jf(fs)
        ss = js(ss)
    a, b = from_f(fs), from_sh(ss)
    for name in ("rho", "rhoU", "rhoE", "t", "dt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)), err_msg=name)


def test_sharded_roundtrip():
    solver, state = cases.supersonic_jet(shape=(32, 16), dtype=np.float32)
    dmesh = shd.make_device_mesh(jax.devices()[:2], shape=(2, 1),
                                 axis_names=("X", "Y"))
    _, to_sh, from_sh = fused_qgd2d.build_sharded_fused_step(solver, dmesh)
    s2 = from_sh(to_sh(state))
    for name in ("rho", "rhoU", "rhoE"):
        np.testing.assert_allclose(np.asarray(getattr(state, name)),
                                   np.asarray(getattr(s2, name)), rtol=1e-6)


@pytest.mark.parametrize("pxy", [(2, 2), (2, 4)])
def test_sharded_fused_2d_mesh_matches_serial(pxy):
    """2-D (X, Y) block decomposition with two-phase ppermute halo exchange
    (rows then lanes -> corners for free).  The y-edge handling is traced,
    so agreement with the serial kernel is to f32 reassociation tolerance
    rather than bitwise."""
    px, py = pxy
    if len(jax.devices()) < px * py:
        pytest.skip("not enough devices")
    solver, state = cases.supersonic_jet(shape=(64, 32), dtype=np.float32)
    dmesh = shd.make_device_mesh(jax.devices()[:px * py],
                                 shape=(px, py), axis_names=("X", "Y"))
    sstep, to_sh, from_sh = fused_qgd2d.build_sharded_fused_step(
        solver, dmesh)
    fstep, to_f, from_f = fused_qgd2d.build_fused_step(solver,
                                                       auto_layout=False)
    fs, ss = to_f(state), to_sh(state)
    jf, js = jax.jit(fstep), jax.jit(sstep)
    for _ in range(10):
        fs = jf(fs)
        ss = js(ss)
    a, b = from_f(fs), from_sh(ss)
    np.testing.assert_array_equal(np.asarray(a.dt), np.asarray(b.dt))
    for name in ("rho", "rhoE"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=1e-6, err_msg=name)
    # rhoU has near-zero shear cells; scale-aware atol (momentum scale ~800)
    np.testing.assert_allclose(np.asarray(a.rhoU), np.asarray(b.rhoU),
                               rtol=1e-5, atol=0.05)


def test_sharded_fused_inlet_outlet_matches_serial():
    """inletOutlet BCs under the sharded fused kernel: the in-kernel flux
    switch must act only at physical edges (is_lo/is_hi guarded) and agree
    with the serial kernel bitwise on an x-ring decomposition."""
    import dataclasses

    from qgdsolver_tpu.core import bc as bcm

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    solver, state = cases.supersonic_jet(shape=(64, 32), dtype=np.float32)
    bc_U = solver.bc_U.replace(1, 1, bcm.InletOutlet(jnp.zeros(2)))
    bc_T = solver.bc_T.replace(0, 1, bcm.InletOutlet(300.0))
    solver = dataclasses.replace(solver, bc_U=bc_U, bc_T=bc_T)
    assert fused_qgd2d.supported(solver, sharded=True)

    dmesh = shd.make_device_mesh(jax.devices()[:2], shape=(2, 1),
                                 axis_names=("X", "Y"))
    sstep, to_sh, from_sh = fused_qgd2d.build_sharded_fused_step(
        solver, dmesh)
    fstep, to_f, from_f = fused_qgd2d.build_fused_step(solver,
                                                       auto_layout=False)
    fs, ss = to_f(state), to_sh(state)
    jf, js = jax.jit(fstep), jax.jit(sstep)
    for _ in range(10):
        fs = jf(fs)
        ss = js(ss)
    a, b = from_f(fs), from_sh(ss)
    for name in ("rho", "rhoU", "rhoE", "dt"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)


def test_sharded_fused_flagship_varsc_qgdflux():
    """The FLAGSHIP config — varScModel5 sensor + qgdFlux outflow — on the
    sharded fused path (VERDICT r3 next #1): supported(sharded=True)
    accepts it; the sensor pre-pass runs inside the shard body under the
    spmd context (cross-shard fvc::smooth) and the in-kernel qgdFlux rows
    apply on the owning edge shard only.  2-D decomposition vs the serial
    fused kernel."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    solver, state = cases.supersonic_jet_varsc(shape=(64, 32),
                                               dtype=np.float32)
    assert fused_qgd2d.supported(solver, sharded=True)
    assert solver._flux_sides(), "fixture must exercise qgdFlux"
    # seed a density jump crossing the X shard boundary so the sensor (and
    # its cross-shard smoothing wave) actually activates
    x = np.asarray(solver.mesh.centers[0])
    bump = (1.0 + 0.4 * (np.abs(x[:, None] - x[len(x) // 2]) < 0.1)
            ).astype(np.float32)
    state = state._replace(rho=state.rho * bump, rhoE=state.rhoE * bump)
    dmesh = shd.make_device_mesh(jax.devices()[:4], shape=(2, 2),
                                 axis_names=("X", "Y"))
    sstep, to_sh, from_sh = fused_qgd2d.build_sharded_fused_step(
        solver, dmesh)
    fstep, to_f, from_f = fused_qgd2d.build_fused_step(solver,
                                                       auto_layout=False)
    fs, ss = to_f(state), to_sh(state)
    jf, js = jax.jit(fstep), jax.jit(sstep)
    for _ in range(10):
        fs = jf(fs)
        ss = js(ss)
    a, b = from_f(fs), from_sh(ss)
    assert float(jnp.max(a.sc)) > float(jnp.min(a.sc)) + 0.01, \
        "sensor must be active for this test to mean anything"
    np.testing.assert_array_equal(np.asarray(a.dt), np.asarray(b.dt))
    for name in ("rho", "rhoE", "sc"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=2e-5, atol=1e-6, err_msg=name)
    # pbc = (p_ghost - p_interior)/dx: a 1-ulp reassociation difference in
    # p (~0.008 at 1e5 Pa) is amplified by 1/dx — tolerate a few ulps
    dx = float(solver.mesh.dx[0][0])
    ulp_p = float(np.spacing(np.float32(101325.0)))
    for ga, gb in zip(a.pbc, b.pbc):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-5, atol=4 * ulp_p / dx,
                                   err_msg="pbc")
