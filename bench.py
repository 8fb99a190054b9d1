"""Benchmark: QGDFoam supersonic-jet throughput (grid-points/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no machine numbers (BASELINE.md), so the baseline is
self-defined: the round-1 composable-XLA implementation measured 2.23e9
points/s/chip on this chip (recorded in BASELINE.md).  vs_baseline =
value / 2.23e9 — the speedup over that recorded baseline.

The bench prefers the fused whole-step Pallas kernel (ops.fused_qgd2d; the
step is one VMEM-resident kernel, VPU-bound at ~50 B/point of HBM traffic)
and falls back to the composable XLA step when the config is unsupported.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_PPS = 2.23e9  # round-1 composable implementation (BASELINE.md)


def main():
    from qgdsolver_tpu import cases
    from qgdsolver_tpu.solvers import common

    shape = (1024, 512)
    n_steps = 500
    solver, state = cases.supersonic_jet(shape=shape, dtype=np.float32)

    if solver.fused_supported() and jax.default_backend() == "tpu":
        step, to_fused, _ = solver.make_fused_step()
        state = to_fused(state)
    else:
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

    print(json.dumps({
        "metric": "qgdfoam_jet_grid_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_PPS, 4),
    }))


if __name__ == "__main__":
    main()
