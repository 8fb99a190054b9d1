"""Benchmark: QGDFoam supersonic-jet throughput (grid-points/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no machine numbers (BASELINE.md), so the baseline is
self-defined: the round-1 composable-XLA implementation measured 2.23e9
points/s/chip on this chip (recorded in BASELINE.md).  vs_baseline =
value / 2.23e9 — the speedup over that recorded baseline.

Two measurements, both preferring the fused Pallas paths:
  * primary (the headline value): 1024x512 plain jet — whole-frame
    VMEM-resident kernel (ops.fused_qgd2d.build_fused_step);
  * big-grid flagship ("big_*" extras): 4096x2048 shock-capturing jet with
    varScModel5 + qgdFlux outflow — the HBM-tiled x-slab pipeline
    (build_tiled_fused_step; the frame set exceeds VMEM).
Falls back to the composable XLA step when a config is unsupported.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_PPS = 2.23e9  # round-1 composable implementation (BASELINE.md)


def _measure(solver, state, n_steps, repeats=3):
    from qgdsolver_tpu.solvers import common

    fused = solver.fused_supported() and jax.default_backend() != "cpu"
    if fused:
        step, to_fused, _ = solver.make_fused_step()
        state = to_fused(state)
    else:
        step = solver.make_step()

    run = jax.jit(lambda s: common.run_steps(step, s, n_steps))
    state = run(state)  # compile + warmup
    jax.block_until_ready(state)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)

    points = solver.mesh.shape[0] * solver.mesh.shape[1]
    return points * n_steps / best, fused


def main():
    t_start = time.perf_counter()
    try:  # 8 virtual CPU devices for the weak-scaling proxy below
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    from qgdsolver_tpu import cases

    solver, state = cases.supersonic_jet(shape=(1024, 512), dtype=np.float32)
    pps, fused = _measure(solver, state, n_steps=500)

    out = {
        "metric": "qgdfoam_jet_grid_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_PPS, 4),
        "fused": fused,
    }

    if jax.default_backend() != "cpu":
        big_solver, big_state = cases.supersonic_jet_varsc(
            shape=(4096, 2048), dtype=np.float32)
        big_pps, big_fused = _measure(big_solver, big_state, n_steps=60,
                                      repeats=2)
        out.update({
            "big_grid": "4096x2048 varScModel5+qgdFlux",
            "big_points_per_s": round(big_pps, 1),
            "big_vs_baseline": round(big_pps / BASELINE_PPS, 4),
            "big_fused": big_fused,
        })

    # weak-scaling proxy on the 8-virtual-CPU mesh (BASELINE.md weak-scaling
    # row stand-in until multi-host hardware exists; absolute value reflects
    # shared host cores — the comm/partition overhead is the signal)
    if time.perf_counter() - t_start < 400:
        try:
            from qgdsolver_tpu.parallel import sharding as shd
            from qgdsolver_tpu.parallel import distributed as dist

            cpu = jax.devices("cpu")
            if len(cpu) >= 8:
                dmesh = shd.make_device_mesh(cpu[:8])
                rep = dist.measure_scaling(
                    lambda shape: cases.supersonic_jet(
                        shape=shape, dtype=np.float32),
                    dmesh, n_steps=20, repeats=2)
                out["cpu8_weak_scaling_efficiency"] = round(
                    rep["weak_scaling_efficiency"], 4)
        except Exception:
            pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
