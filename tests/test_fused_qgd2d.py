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
