"""3D fused x-slab kernel (ops.fused_qgd3d) vs the composable 3D step.

The serial-oracle practice of SURVEY.md §4: the kernel must reproduce the
composable GaussVolPoint ("full") step on a uniform brick to fp tolerance
(interpret mode on CPU; the real-backend compile is gated by
`bench.py --compile-only`'s fused_3d variant).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qgdsolver_tpu import cases
from qgdsolver_tpu.ops import fused_qgd3d
from qgdsolver_tpu.solvers import common


def _case(shape=(8, 6, 6)):
    solver, state = cases.supersonic_duct_3d(shape=shape, dtype=np.float32)
    return solver, state


def test_supported_and_slab():
    solver, _ = _case()
    assert fused_qgd3d.supported(solver)
    assert solver.fused_supported()


def test_fused3d_matches_composable():
    """10 steps of the fused 3D kernel track the composable step (dt chain
    identical, fields to f32 reassociation tolerance)."""
    solver, state = _case()
    step_ref = jax.jit(solver.make_step())
    fstep, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                          interpret=True)
    fstep = jax.jit(fstep)
    s = state
    fs = to_f(state)
    for _ in range(10):
        s = step_ref(s)
        fs = fstep(fs)
    out = from_f(fs)
    np.testing.assert_allclose(float(out.dt), float(s.dt), rtol=1e-6)
    np.testing.assert_allclose(float(out.t), float(s.t), rtol=1e-6)
    for name in ("rho", "rhoU", "rhoE"):
        a = np.asarray(getattr(s, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        scale = np.max(np.abs(a))
        np.testing.assert_allclose(b / scale, a / scale, rtol=2e-5,
                                   atol=2e-5, err_msg=name)


def test_fused3d_multi_slab_matches_single():
    """The slab decomposition is invisible: 2 slabs == 1 slab bitwise on
    the carried frames (the x-halo plane plumbing is exact)."""
    solver, state = _case(shape=(8, 6, 6))
    s1, to1, _ = fused_qgd3d.build_fused_step_3d(solver, interpret=True,
                                                 slab=8)
    s2, to2, _ = fused_qgd3d.build_fused_step_3d(solver, interpret=True,
                                                 slab=4)
    f1, f2 = to1(state), to2(state)
    j1, j2 = jax.jit(s1), jax.jit(s2)
    for _ in range(5):
        f1 = j1(f1)
        f2 = j2(f2)
    for name in ("p", "T", "ux", "uy", "uz"):
        np.testing.assert_array_equal(
            np.asarray(getattr(f1, name)), np.asarray(getattr(f2, name)),
            err_msg=name)


def test_fused3d_roundtrip():
    solver, state = _case()
    _, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                      interpret=True)
    s2 = from_f(to_f(state))
    for name in ("rho", "rhoU", "rhoE"):
        np.testing.assert_allclose(np.asarray(getattr(state, name)),
                                   np.asarray(getattr(s2, name)), rtol=1e-6)


def test_fused3d_run_stable():
    """A longer run through run_steps stays finite and the disturbance
    advects downstream (physics sanity, not just parity)."""
    solver, state = _case(shape=(16, 6, 6))
    fstep, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                          interpret=True)
    fs = jax.jit(lambda s: common.run_steps(fstep, s, 30))(to_f(state))
    out = from_f(fs)
    assert np.isfinite(np.asarray(out.rho)).all()
    assert float(out.t) > 0.0


def test_fused3d_sod_tube_vs_exact():
    """Physics validation of the 3D kernel (not just parity): a quasi-1D
    Sod tube through the fused 3D path matches the exact Riemann solution
    (the same L1 bars as the composable 1D Sod test)."""
    from test_qgd import _sod_exact
    from qgdsolver_tpu.core import bc as bcm
    from qgdsolver_tpu.core.mesh import Mesh
    from qgdsolver_tpu.physics.thermo import PerfectGasThermo
    from qgdsolver_tpu.physics.qgdcoeffs import ConstScPrModel1
    from qgdsolver_tpu.solvers.qgd import QGDFoam

    n = 128
    mesh = Mesh.uniform((n, 6, 6), lengths=(1.0, 6.0 / n, 6.0 / n),
                        dtype=np.float32)
    R, gamma = 1.0, 1.4
    th = PerfectGasThermo(R=R, Cp=gamma * R / (gamma - 1))
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 3)
    solver = QGDFoam(
        mesh=mesh, thermo=th,
        tau_model=ConstScPrModel1(alpha=0.5, Sc=1.0, Pr=1.0),
        bc_U=zg, bc_p=zg, bc_T=zg,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    assert fused_qgd3d.supported(solver)
    x = np.asarray(mesh.centers[0])
    p0 = np.where(x < 0.5, 1.0, 0.1)[:, None, None] * np.ones(mesh.shape)
    rho0 = np.where(x < 0.5, 1.0, 0.125)[:, None, None] * np.ones(mesh.shape)
    T0 = p0 / (R * rho0)
    s = solver.init(p0=jnp.asarray(p0), T0=jnp.asarray(T0),
                    U0=jnp.zeros((3,) + mesh.shape))
    fstep, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                          interpret=True)
    fstep = jax.jit(fstep)
    fs = to_f(s)
    t_end = 0.12
    for _ in range(2000):
        fs = fstep(fs)
        if float(fs.t) >= t_end:
            break
    assert float(fs.t) >= t_end
    out = from_f(fs)
    rho = np.asarray(out.rho)
    # the solution stays quasi-1D (transverse axes uniform)
    assert np.max(np.std(rho, axis=(1, 2))) < 1e-3
    prof = rho[:, 3, 3]
    rho_ex, u_ex, p_ex = _sod_exact(x, float(out.t))
    l1 = np.mean(np.abs(prof - rho_ex))
    assert l1 < 0.04, f"3D Sod rho L1 error {l1}"
    u_prof = np.asarray(out.rhoU[0, :, 3, 3] / prof)
    assert np.mean(np.abs(u_prof - u_ex)) < 0.08


def _flagship_case(shape=(8, 6, 6)):
    """The 3D flagship config with the jet REACHING the outlet and a
    pressure bump near it, so the qgdFlux dp/dn signal is far above f32
    ulp(p) (the in-kernel ghost-plane path is genuinely exercised)."""
    solver, state = cases.supersonic_jet_3d_varsc(shape=shape,
                                                  dtype=np.float32)
    mesh = solver.mesh
    th = solver.thermo
    xc = np.asarray(mesh.centers[0])[:, None, None]
    yc = np.asarray(mesh.centers[1])[None, :, None]
    zc = np.asarray(mesh.centers[2])[None, None, :]
    rr = np.sqrt((yc - 1.0) ** 2 + (zc - 1.0) ** 2)
    prof = 0.5 * (np.tanh((0.3 - rr) / (3.0 * float(mesh.dx[1][0]))) + 1.0)
    u_jet = 2.0 * float(th.c(jnp.asarray(300.0)))
    p0 = 1e5 * (1.0 + 0.3 * np.exp(-((xc - 3.4) ** 2 + (rr - 0.0) ** 2)
                                   / 0.3)) * np.ones(mesh.shape)
    U0 = np.zeros((3,) + mesh.shape, dtype=np.float32)
    U0[0] = u_jet * prof * np.exp(-(4.0 - xc) / 2.0)
    state = solver.init(p0=jnp.asarray(p0, dtype=np.float32),
                        T0=jnp.full(mesh.shape, 300.0, dtype=np.float32),
                        U0=jnp.asarray(U0),
                        sc0=jnp.full(mesh.shape, 0.05, dtype=np.float32))
    return solver, state


def test_flagship3d_supported():
    """varScModel5 + qgdFlux + array-valued inlet profile (VERDICT r4
    next #3) are covered by the 3D fused kernel."""
    solver, _ = _flagship_case()
    assert fused_qgd3d.supported(solver)
    assert solver.fused_supported()


def test_flagship3d_matches_composable():
    """10 steps of the flagship 3D config (varScModel5 sensor folded
    in-kernel + fvc::smooth XLA pre-pass, in-kernel qgdFlux ghost planes,
    profiled inlet) track the composable step."""
    solver, state = _flagship_case()
    step_ref = jax.jit(solver.make_step())
    fstep, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                          interpret=True)
    fstep = jax.jit(fstep)
    s = state
    fs = to_f(state)
    for _ in range(10):
        s = step_ref(s)
        fs = fstep(fs)
    out = from_f(fs)
    np.testing.assert_allclose(float(out.dt), float(s.dt), rtol=1e-6)
    for name in ("rho", "rhoU", "rhoE", "sc"):
        a = np.asarray(getattr(s, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        scale = np.max(np.abs(a))
        np.testing.assert_allclose(b / scale, a / scale, rtol=2e-5,
                                   atol=2e-5, err_msg=name)
    # the lagged qgdFlux gradient carries over (pbc parity); the fused
    # value is recovered from the f32 ghost plane, so allow a few
    # ulp(p)/dx of reconstruction quantization on top of the f32 physics
    a = np.asarray(s.pbc[0], dtype=np.float64)
    b = np.asarray(out.pbc[0], dtype=np.float64)
    scale = np.abs(a).max()
    quant = 8.0 * np.float32(1e5) * np.finfo(np.float32).eps / 0.5
    assert scale > 50.0 * quant, "qgdFlux signal must dominate quantization"
    np.testing.assert_allclose(b, a, atol=quant + 2e-3 * scale)


def test_flagship3d_multi_slab_matches_single():
    """Slab decomposition invisible for the varsc path too (the sc_raw
    strip fix repairs the slab-boundary sensor planes).  Tolerance: a few
    f32 ulps — XLA contracts the varsc tau division chain into FMAs
    differently per window shape (measured 1-ulp drift; the constScPr
    variant above stays bitwise)."""
    solver, state = _flagship_case(shape=(8, 6, 6))
    s1, to1, _ = fused_qgd3d.build_fused_step_3d(solver, interpret=True,
                                                 slab=8)
    s2, to2, fr2 = fused_qgd3d.build_fused_step_3d(solver, interpret=True,
                                                   slab=2)
    f1, f2 = to1(state), to2(state)
    s1j, s2j = jax.jit(s1), jax.jit(s2)
    for _ in range(6):
        f1 = s1j(f1)
        f2 = s2j(f2)
    for name in ("p", "T", "ux", "uy", "uz", "sc", "sc_raw"):
        a = np.asarray(getattr(f1, name))
        b = np.asarray(getattr(f2, name))
        scale = np.abs(a).max() + 1e-30
        # the relaxed sensor accumulates the 1-ulp seed over steps;
        # 1e-4 of the sensor ceiling is far below any physical effect
        np.testing.assert_allclose(b / scale, a / scale, rtol=0.0,
                                   atol=1e-4, err_msg=name)


def test_sharded3d_matches_serial():
    """build_sharded_fused_step_3d (VERDICT r4 next #3): the x-ring
    decomposed pipeline reproduces the serial fused run — fresh edge
    planes ride ppermute, dt reduces with pmax/pmin, and the varsc
    sensor's partition planes are strip-fixed before the cross-shard
    fvc::smooth."""
    from qgdsolver_tpu.parallel import sharding as shd

    cpu = jax.devices("cpu")
    if len(cpu) < 4:
        pytest.skip("needs 4 virtual devices")
    dmesh = shd.make_device_mesh(cpu[:4], shape=(4, 1))
    solver, state = _flagship_case(shape=(16, 6, 6))
    ser_step, ser_to, ser_from = fused_qgd3d.build_fused_step_3d(
        solver, interpret=True)
    sh_step, sh_to, sh_from = fused_qgd3d.build_sharded_fused_step_3d(
        solver, dmesh, interpret=True)
    f1 = ser_to(state)
    f2 = sh_to(state)
    j1, j2 = jax.jit(ser_step), jax.jit(sh_step)
    for _ in range(6):
        f1 = j1(f1)
        f2 = j2(f2)
    np.testing.assert_allclose(float(f2.dt), float(f1.dt), rtol=1e-6)
    for name in ("p", "T", "ux", "uy", "uz", "sc"):
        a = np.asarray(getattr(f1, name))
        b = np.asarray(getattr(f2, name))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b / scale, a / scale, rtol=0.0,
                                   atol=1e-4, err_msg=name)
    # the round-tripped composable states agree too (pbc recovery incl.)
    s1, s2 = ser_from(f1), sh_from(f2)
    for name in ("rho", "rhoU", "rhoE"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(s2, name))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4,
                                   err_msg=name)


def test_sharded3d_constscpr_bitwise():
    """Without the varsc division chain the x-ring decomposition is exact
    to the f32 bit (the plane exchange is the serial window verbatim)."""
    from qgdsolver_tpu.parallel import sharding as shd

    cpu = jax.devices("cpu")
    if len(cpu) < 4:
        pytest.skip("needs 4 virtual devices")
    dmesh = shd.make_device_mesh(cpu[:4], shape=(4, 1))
    solver, state = _case(shape=(16, 6, 6))
    ser_step, ser_to, _ = fused_qgd3d.build_fused_step_3d(
        solver, interpret=True, slab=4)
    sh_step, sh_to, _ = fused_qgd3d.build_sharded_fused_step_3d(
        solver, dmesh, interpret=True)
    f1, f2 = ser_to(state), sh_to(state)
    j1, j2 = jax.jit(ser_step), jax.jit(sh_step)
    for _ in range(5):
        f1 = j1(f1)
        f2 = j2(f2)
    for name in ("p", "T", "ux", "uy", "uz"):
        a = np.asarray(getattr(f1, name))
        b = np.asarray(getattr(f2, name))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b / scale, a / scale, rtol=0.0,
                                   atol=1e-6, err_msg=name)


def test_flagship3d_sod_tube_vs_exact():
    """Physics validation of the 3D FLAGSHIP path (not just parity): the
    quasi-1D Sod tube through the fused varScModel5 + qgdFlux kernel
    matches the exact Riemann solution and the sensor localises at the
    discontinuities."""
    from test_qgd import _sod_exact
    from qgdsolver_tpu.core import bc as bcm
    from qgdsolver_tpu.core.mesh import Mesh
    from qgdsolver_tpu.physics.thermo import PerfectGasThermo
    from qgdsolver_tpu.physics.qgdcoeffs import VarScModel5
    from qgdsolver_tpu.solvers.qgd import QGDFoam

    n = 128
    mesh = Mesh.uniform((n, 6, 6), lengths=(1.0, 6.0 / n, 6.0 / n),
                        dtype=np.float32)
    R, gamma = 1.0, 1.4
    th = PerfectGasThermo(R=R, Cp=gamma * R / (gamma - 1))
    zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 3)
    bc_p = bcm.FieldBCs(((bcm.ZeroGradient(), bcm.QGDFluxP()),
                         (bcm.ZeroGradient(), bcm.ZeroGradient()),
                         (bcm.ZeroGradient(), bcm.ZeroGradient())))
    solver = QGDFoam(
        mesh=mesh, thermo=th,
        tau_model=VarScModel5(alpha=0.5, Pr=1.0, rC=0.5, minSc=0.05,
                              maxSc=1.0, smoothCoeff=0.1),
        bc_U=zg, bc_p=bc_p, bc_T=zg,
        time=common.TimeControls(max_co=0.3, max_dt=1e-3, dt0=1e-6),
    )
    assert fused_qgd3d.supported(solver)
    x = np.asarray(mesh.centers[0])
    p0 = np.where(x < 0.5, 1.0, 0.1)[:, None, None] * np.ones(mesh.shape)
    rho0 = np.where(x < 0.5, 1.0, 0.125)[:, None, None] * np.ones(mesh.shape)
    T0 = p0 / (R * rho0)
    s = solver.init(p0=jnp.asarray(p0), T0=jnp.asarray(T0),
                    U0=jnp.zeros((3,) + mesh.shape),
                    sc0=jnp.full(mesh.shape, 0.05, dtype=np.float32))
    fstep, to_f, from_f = fused_qgd3d.build_fused_step_3d(solver,
                                                          interpret=True)
    fstep = jax.jit(fstep)
    fs = to_f(s)
    t_end = 0.12
    for _ in range(2000):
        fs = fstep(fs)
        if float(fs.t) >= t_end:
            break
    assert float(fs.t) >= t_end
    out = from_f(fs)
    rho = np.asarray(out.rho)
    assert np.max(np.std(rho, axis=(1, 2))) < 1e-3  # stays quasi-1D
    prof = rho[:, 3, 3]
    rho_ex, u_ex, p_ex = _sod_exact(x, float(out.t))
    l1 = np.mean(np.abs(prof - rho_ex))
    assert l1 < 0.04, f"3D flagship Sod rho L1 error {l1}"
    # the shock sensor localised: active at the shock, near-floor in the
    # smooth left state
    sc = np.asarray(out.sc)[:, 3, 3]
    assert sc.max() > 2.0 * 0.05  # > 2x the minSc floor at the waves
    assert sc[: n // 8].mean() < 0.08
