"""Case-runner CLI (qgdsolver_tpu.cli): the reference's executable surface
— controlDict endTime/writeControl drive the run, time directories are
written at write intervals, and the run resumes from its own output."""
import os
import shutil

import numpy as np

from qgdsolver_tpu import cli
from qgdsolver_tpu.io import foam_case

CASE = os.path.join(os.path.dirname(__file__), "fixtures", "jet_case")


def test_cli_runs_writes_and_resumes(tmp_path):
    case = tmp_path / "jet"
    shutil.copytree(CASE, case)
    # a short, step-counted write schedule
    ctrl = (case / "system" / "controlDict").read_text()
    ctrl = ctrl.replace("endTime         0.01;", "endTime         1.0;")
    ctrl = ctrl.replace("writeControl    adjustableRunTime;",
                        "writeControl    timeStep;")
    ctrl = ctrl.replace("writeInterval   0.001;", "writeInterval   10;")
    (case / "system" / "controlDict").write_text(ctrl)

    logs = []
    n = cli.run_case(str(case), max_steps=20, chunk=10, log=logs.append)
    assert n == 20
    assert any("writing fields" in ln for ln in logs)
    tdirs = [d for d in os.listdir(case)
             if d not in ("0", "system", "constant")
             and os.path.isdir(case / d)]
    assert tdirs, "no time directory written"

    # resume from the run's own output
    ctrl = (case / "system" / "controlDict").read_text().replace(
        "startFrom       startTime;", "startFrom       latestTime;")
    (case / "system" / "controlDict").write_text(ctrl)
    solver, state = foam_case.build_case(str(case))
    assert float(np.asarray(state.t)) > 0.0
    assert np.isfinite(np.asarray(state.rho)).all()
