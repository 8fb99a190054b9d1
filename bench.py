"""Benchmark: QGDFoam supersonic-jet throughput (grid-points/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no machine numbers (BASELINE.md), so `vs_baseline`
reports the achieved fraction of the per-chip HBM-bandwidth roofline for this
step's field traffic — the "speed-of-light" target BASELINE.md defines.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np


def main():
    from qgdsolver_tpu import cases
    from qgdsolver_tpu.solvers import common

    shape = (1024, 512)
    n_steps = 500
    solver, state = cases.supersonic_jet(shape=shape, dtype=np.float32)
    step = solver.make_step()

    run = jax.jit(lambda s: common.run_steps(step, s, n_steps))
    state = run(state)  # compile + warmup
    jax.block_until_ready(state)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)

    points = shape[0] * shape[1]
    pps = points * n_steps / best

    # HBM roofline model: ~56 f32 cell-field equivalents of HBM traffic per
    # step after XLA fusion (4 padded primitives read+4 gradients x 2 dims,
    # ~9 face flux tuples write+read, 3 prognostic read+write, coefficients)
    bytes_per_point = 56 * 4
    dev = jax.devices()[0]
    hbm_gbps = 819e9 if "v5" in str(dev.device_kind).lower() else 819e9
    sol_pps = hbm_gbps / bytes_per_point

    print(json.dumps({
        "metric": "qgdfoam_jet_grid_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / sol_pps, 4),
    }))


if __name__ == "__main__":
    main()
