"""Fused whole-step Pallas kernel (ops.fused_qgd2d) vs the composable step.

The fused kernel must reproduce the composable QGDFoam step op-for-op: same
formulas, same association order, identical dt chain (the Courant/setDeltaT
logic is bit-stable under the kernel's hoisted max — max commutes exactly
with positive scalar scaling).  Field values drift only by f32
non-associativity of the scheduling, so a small rtol is allowed.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qgdsolver_tpu import cases
from qgdsolver_tpu.ops import fused_qgd2d


@pytest.fixture(scope="module")
def jet():
    return cases.supersonic_jet(shape=(64, 32), dtype=np.float32)


def test_supported(jet):
    solver, _ = jet
    assert fused_qgd2d.supported(solver)
    assert solver.fused_supported()


def test_unsupported_configs(jet):
    solver, _ = jet
    # reduced scheme
    s2 = dataclasses.replace(solver, fvsc_scheme="reduced")
    assert not fused_qgd2d.supported(s2)
    # implicit diffusion
    s3 = dataclasses.replace(solver, implicit_diffusion=True)
    assert not fused_qgd2d.supported(s3)
    # non-constScPr tau model
    from qgdsolver_tpu.physics.qgdcoeffs import ConstTau

    s4 = dataclasses.replace(solver, tau_model=ConstTau(tau0=1e-5))
    assert not fused_qgd2d.supported(s4)


def test_fused_matches_composable(jet):
    solver, state = jet
    step_ref = jax.jit(solver.make_step())
    fstep, to_fused, from_fused = solver.make_fused_step()
    fstep = jax.jit(fstep)

    # one composable step first (populates the ScQGD diagnostic), then lock-step
    s = step_ref(state)
    fs = to_fused(s)
    for _ in range(10):
        s = step_ref(s)
        fs = fstep(fs)
    s2 = from_fused(fs)

    # dt chain must track essentially exactly (same formulas, exact max/min)
    np.testing.assert_allclose(np.asarray(s.dt), np.asarray(s2.dt),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.t), np.asarray(s2.t), rtol=1e-6)
    for name in ("rho", "rhoU", "rhoE"):
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(s2, name))
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < 1e-3, name


def test_roundtrip_state(jet):
    solver, state = jet
    step_ref = jax.jit(solver.make_step())
    s = step_ref(state)  # populate sc
    _, to_fused, from_fused = solver.make_fused_step()
    s2 = from_fused(to_fused(s))
    for name in ("rho", "rhoU", "rhoE"):
        np.testing.assert_allclose(np.asarray(getattr(s, name)),
                                   np.asarray(getattr(s2, name)), rtol=1e-6)


def test_auto_layout_transposes_wide_grids():
    """(nx >> ny) grids waste lanes in the natural orientation; the builder
    must transpose (rows pad to 8, lanes to 128) and still match the
    composable step through the State boundary."""
    import jax
    from qgdsolver_tpu.ops import fused_qgd2d

    solver, state = cases.supersonic_jet(shape=(64, 32), dtype=np.float32)
    assert fused_qgd2d._frame_elems(32, 64) < fused_qgd2d._frame_elems(64, 32)
    step, to_f, from_f = solver.make_fused_step()
    fs = to_f(state)
    # transposed frame: rows = ny+2 = 34, lanes pad(nx+2 = 66) = 128
    assert fs.p.shape == (34, 128)
    s_ref = state
    step_ref = solver.make_step()
    for _ in range(5):
        fs = jax.jit(step)(fs)
        s_ref = jax.jit(step_ref)(s_ref)
    out = from_f(fs)
    for name in ("rho", "rhoE", "dt"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(s_ref, name)),
                                   rtol=2e-5)
    # rhoU develops near-zero shear cells where f32 Mosaic-vs-XLA rounding
    # noise is amplified (same magnitude in the untransposed comparison);
    # atol is 6e-5 of the ~800 kg/m^2/s momentum scale
    np.testing.assert_allclose(np.asarray(out.rhoU),
                               np.asarray(s_ref.rhoU), rtol=5e-5, atol=0.05)


def test_fused_varsc_qgdflux_matches_composable():
    """The shock-capturing flagship config (varScModel5 sensor + qgdFlux
    outflow p-BC) must run fused and track the composable step — the
    VERDICT r1 'real physics' gap."""
    solver, state = cases.supersonic_jet_varsc(shape=(64, 32),
                                               dtype=np.float32)
    assert fused_qgd2d.supported(solver)
    # r4: the sharded wrapper covers the flagship config too
    assert fused_qgd2d.supported(solver, sharded=True)
    step_ref = jax.jit(solver.make_step())
    fstep, to_fused, from_fused = solver.make_fused_step()
    fstep = jax.jit(fstep)

    s = step_ref(state)  # one composable step seeds sc + pbc
    fs = to_fused(s)
    for _ in range(10):
        s = step_ref(s)
        fs = fstep(fs)
    s2 = from_fused(fs)

    np.testing.assert_allclose(np.asarray(s.dt), np.asarray(s2.dt),
                               rtol=1e-5)
    for name in ("rho", "rhoU", "rhoE", "sc"):
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(s2, name))
        scale = max(np.max(np.abs(a)), 1e-30)
        assert np.max(np.abs(a - b)) / scale < 2e-3, name
    # the lagged qgdFlux gradient roundtrips through the ghost rows; the
    # extraction (ghost - interior)/dx quantizes at eps(p)/dx (the kernel
    # applies ws0/tau_f exactly — only the State-boundary recovery rounds)
    assert len(s2.pbc) == 1
    dx = float(solver.mesh.dx[0][0])
    quant = 4.0 * np.float32(1e5) * np.finfo(np.float32).eps / dx
    np.testing.assert_allclose(np.asarray(s.pbc[0]), np.asarray(s2.pbc[0]),
                               rtol=2e-2, atol=quant)


@pytest.mark.parametrize("case", ["plain", "varsc"])
def test_tiled_matches_whole_frame(case):
    """The HBM-tiled x-slab pipeline (build_tiled_fused_step) must
    reproduce the whole-frame kernel exactly — same slab kernel, same dt
    chain (XLA pre-pass mirrors the in-kernel expressions), halo rows read
    from the previous frame."""
    if case == "plain":
        solver, state = cases.supersonic_jet(shape=(64, 32),
                                             dtype=np.float32)
    else:
        solver, state = cases.supersonic_jet_varsc(shape=(64, 32),
                                                   dtype=np.float32)
    assert fused_qgd2d.tiled_supported(solver)
    step_w, to_w, from_w = fused_qgd2d.build_fused_step(solver,
                                                        auto_layout=False)
    step_t, to_t, from_t = fused_qgd2d.build_tiled_fused_step(
        solver, slab_rows=16)  # 4 slabs
    s = jax.jit(solver.make_step())(state)  # seed sc/pbc
    fw = to_w(s)
    ft = to_t(s)
    for _ in range(5):
        fw = jax.jit(step_w)(fw)
        ft = jax.jit(step_t)(ft)
    np.testing.assert_allclose(np.asarray(fw.dt), np.asarray(ft.dt),
                               rtol=1e-6)
    sw, st = from_w(fw), from_t(ft)
    for name in ("rho", "rhoU", "rhoE"):
        a, b = np.asarray(getattr(sw, name)), np.asarray(getattr(st, name))
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < 1e-5, name


def test_tiled_dispatch_large_grid():
    """make_fused_step must route >VMEM grids to the tiled pipeline."""
    solver, _ = cases.supersonic_jet(shape=(4096, 2048), dtype=np.float32)
    assert not fused_qgd2d.fits_vmem(4096, 2048)
    assert solver.fused_supported()


def test_fused_matches_composable_ingested_case():
    """The ingested reference-layout jet case (per-term fvsc dict, slip +
    inletOutlet + qgdFlux boundary words) must run on the fused kernel and
    track the composable step — inletOutlet switches in-kernel on the
    fresh adjacent-cell outward velocity (FluxSwitched parity)."""
    import os

    from qgdsolver_tpu.io import foam_case

    case = os.path.join(os.path.dirname(__file__), "fixtures", "jet_case")
    solver, state = foam_case.build_case(case)
    assert fused_qgd2d.supported(solver)
    step_ref = jax.jit(solver.make_step())
    fstep, to_fused, from_fused = solver.make_fused_step()
    fstep = jax.jit(fstep)

    s = step_ref(state)  # seed pbc (qgdFlux lagged gradient)
    fs = to_fused(s)
    for _ in range(10):
        s = step_ref(s)
        fs = fstep(fs)
    s2 = from_fused(fs)
    np.testing.assert_allclose(np.asarray(s.dt), np.asarray(s2.dt),
                               rtol=1e-6)
    for name in ("rho", "rhoU", "rhoE"):
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(s2, name))
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < 1e-3, name


def test_time_dependent_bc_rejected(jet):
    """A time-DEPENDENT BC callable (e.g. cosVelocity forcing) must route
    to the composable step — the fused kernel bakes BC values at build
    time and would silently freeze the oscillation.  Static spatial
    profiles (the jet inlet, which ignores t) stay supported."""
    solver, _ = jet
    assert fused_qgd2d.supported(solver)  # static profile callable OK

    def oscillating(t, coords):
        yy = coords[1]
        amp = jnp.sin(2.0 * t) * jnp.ones_like(yy)
        return jnp.stack(jnp.broadcast_arrays(amp, jnp.zeros_like(yy)))

    bc_U = solver.bc_U.replace(0, 0, fused_qgd2d.bcm.FixedValue(oscillating))
    s2 = dataclasses.replace(solver, bc_U=bc_U)
    assert not fused_qgd2d.supported(s2)
    assert not s2.fused_supported()


def test_tiled_varsc_sensor_active_matches_whole_frame():
    """Strip-fix coverage for the folded raw sensor (r4): a density bump
    straddling a slab boundary activates the sensor exactly at the rows
    whose in-kernel gradient read a stale halo; the tiled pipeline must
    still track the whole-frame kernel."""
    solver, state = cases.supersonic_jet_varsc(shape=(64, 32),
                                               dtype=np.float32)
    x = np.asarray(solver.mesh.centers[0])
    # slab_rows=16 -> boundaries at rows 16/32/48; bump centered on row 32
    bump = (1.0 + 0.35 * (np.abs(x[:, None] - x[32]) < 6 * (x[1] - x[0]))
            ).astype(np.float32)
    state = state._replace(rho=state.rho * bump, rhoE=state.rhoE * bump)
    step_w, to_w, from_w = fused_qgd2d.build_fused_step(solver,
                                                        auto_layout=False)
    step_t, to_t, from_t = fused_qgd2d.build_tiled_fused_step(
        solver, slab_rows=16)
    s = jax.jit(solver.make_step())(state)  # seed sc/pbc
    fw, ft = to_w(s), to_t(s)
    for _ in range(8):
        fw = jax.jit(step_w)(fw)
        ft = jax.jit(step_t)(ft)
    sw, st = from_w(fw), from_t(ft)
    assert float(np.max(np.asarray(sw.sc))) > 0.1, "sensor must be active"
    np.testing.assert_allclose(np.asarray(fw.dt), np.asarray(ft.dt),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.sc), np.asarray(sw.sc),
                               rtol=1e-4, atol=1e-5)
    for name in ("rho", "rhoU", "rhoE"):
        a, b = np.asarray(getattr(sw, name)), np.asarray(getattr(st, name))
        scale = np.max(np.abs(a))
        assert np.max(np.abs(a - b)) / scale < 2e-5, name


def test_tiled_varsc_smooth_continuation_fires_and_matches():
    """A near-delta density spike drives adjacent raw-sensor ratios far
    beyond maxRatio: the folded ring-1's change partial MUST fire and the
    XLA continuation (fvc_smooth_continue) must reproduce the composable
    fvc_smooth wave — the r5 fold's rarely-taken branch, taken."""
    solver, state = cases.supersonic_jet_varsc(shape=(64, 32),
                                               dtype=np.float32)
    x = np.asarray(solver.mesh.centers[0])
    spike = (1.0 + 2.5 * (np.abs(x[:, None] - x[24]) < 1.1 * (x[1] - x[0]))
             ).astype(np.float32)
    state = state._replace(rho=state.rho * spike, rhoE=state.rhoE * spike)
    step_c = jax.jit(solver.make_step())
    step_t, to_t, from_t = fused_qgd2d.build_tiled_fused_step(
        solver, slab_rows=8)
    s = step_c(state)  # seed sc/pbc
    ft = to_t(s)
    sc_ref = s
    fired = False
    for _ in range(4):
        sc_ref = step_c(sc_ref)
        ft = jax.jit(step_t)(ft)
        fired = fired or float(jnp.max(ft.sc_chg)) > 0.0
    assert fired, "the folded ring-1 change partial never fired"
    st = from_t(ft)
    np.testing.assert_allclose(np.asarray(ft.dt), np.asarray(sc_ref.dt),
                               rtol=1e-6)
    # the smoothed sensor (ring-1 in-kernel + XLA continuation) tracks the
    # composable fvc_smooth wave
    np.testing.assert_allclose(np.asarray(st.sc), np.asarray(sc_ref.sc),
                               rtol=1e-4, atol=1e-4)
