"""Tests for checkpoint/resume, config tree, badcells, observability."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu import cases
from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import config as cfgm
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.utils import checkpoint as ckpt
from qgdsolver_tpu.utils import badcells, observability
from qgdsolver_tpu.solvers import common


def test_checkpoint_roundtrip(tmp_path):
    solver, state = cases.scalar_box(shape=(16, 16))
    step = jax.jit(solver.make_step())
    s1 = common.run_steps(step, state, 5)
    d = str(tmp_path / "ckpt")
    ckpt.save(s1, d, 5)
    ckpt.save(state, d, 0)
    assert ckpt.latest_step(d) == 5
    restored, n = ckpt.restore_latest(state, d)
    assert n == 5
    np.testing.assert_array_equal(np.asarray(restored.T), np.asarray(s1.T))
    np.testing.assert_array_equal(float(restored.t), float(s1.t))
    # resume continues identically
    a = common.run_steps(step, restored, 3)
    b = common.run_steps(step, s1, 3)
    np.testing.assert_allclose(np.asarray(a.T), np.asarray(b.T), rtol=1e-14)


def test_config_builds_qgd_case():
    cfg = {
        "solver": "QGDFoam",
        "mesh": {"shape": [16, 8], "lengths": [1.0, 0.5], "dtype": "float64"},
        "thermo": {"type": "psiPerfectGas", "R": 287.0, "Cp": 1004.5,
                   "transport": {"type": "sutherland", "As": 1.4792e-6,
                                 "Ts": 116.0}},
        "tau": {"type": "constScPrModel1", "alpha": 0.5, "Sc": 1.0, "Pr": 1.0},
        "fvsc": "full",
        "controlDict": {"adjustTimeStep": True, "maxCo": 0.4,
                        "maxDeltaT": 1e-3, "cTau": 0.75, "deltaT": 1e-7},
        "boundary": {
            "U": {"x_lo": {"type": "fixedValue", "value": [10.0, 0.0]},
                  "x_hi": {"type": "zeroGradient"}},
            "p": {"x_hi": {"type": "fixedValue", "value": 1e5}},
            "T": {},
        },
    }
    solver = cfgm.build_solver(cfg)
    assert solver.mesh.shape == (16, 8)
    assert solver.thermo.R == 287.0
    assert solver.tau_model.alpha == 0.5
    assert isinstance(solver.bc_U[0, 0], bcm.FixedValue)
    assert isinstance(solver.bc_p[0, 1], bcm.FixedValue)
    assert isinstance(solver.bc_p[0, 0], bcm.ZeroGradient)
    # runs one step
    s = solver.init(p0=jnp.full((16, 8), 1e5), T0=jnp.full((16, 8), 300.0),
                    U0=jnp.zeros((2, 16, 8)))
    s2 = jax.jit(solver.make_step())(s)
    assert np.all(np.isfinite(np.asarray(s2.rho)))


def test_badcells_flags_stretched_mesh():
    # strongly graded mesh in x
    x = np.concatenate([[0.0], np.cumsum(1.2 ** np.arange(20))])
    x /= x[-1]
    y = np.linspace(0, 0.001, 5)  # tiny dy => high aspect ratio
    mesh = Mesh(x_faces=(x, y), dtype=np.float64)
    rep = badcells.select_bad_cells(mesh, max_aspect_ratio=50.0,
                                    max_expansion=1.15)
    assert rep.n_bad > 0
    assert rep.max_expansion > 1.15
    clean = Mesh.uniform((8, 8))
    rep2 = badcells.select_bad_cells(clean)
    assert rep2.n_bad == 0


def test_step_logger_runs(capsys):
    solver, state = cases.scalar_box(shape=(8, 8))
    log = observability.StepLogger((8, 8), every=2, fields=("T",))
    step = jax.jit(solver.make_step())
    common.run_steps(step, state, 4, log_every=2, log_fn=log)
    out = capsys.readouterr().out
    assert "deltaT=" in out and "max/min T" in out
