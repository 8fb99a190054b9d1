"""Shared solver building blocks: time-step control, Courant numbers, runner.

Re-design of reference QGD/QGDcommon/ time-control includes:
  * setDeltaT-QGDQHD.H (docs/html/setDeltaT-QGDQHD_8H_source.html:41-61):
    damped dt growth, acoustic-CFL bound, cTau*min(tau_f) cap;
  * QGDCourantNo.H (QGDCourantNo_8H_source.html:36-53): acoustic Courant
    max(|Un+c|,|Un-c|)*dt/h_f;
  * QHDCourantNo.H (QHDCourantNo_8H_source.html:37-57): advective |Un|*dt/h_f.

Everything is a pure on-device function; the adaptive dt lives in the solver
state so a whole run can stay inside one `lax.scan`/`while_loop` without host
syncs (the TPU-native replacement of the reference's per-step host-side
`runTime.setDeltaT`).
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..core.mesh import Mesh

SMALL = 1e-30


@dataclasses.dataclass(frozen=True)
class TimeControls:
    """controlDict equivalents (reference §2.5 config inventory)."""

    adjust_time_step: bool = True
    max_co: float = 0.5
    max_dt: float = 1.0
    c_tau: float = 0.75
    dt0: float = 1e-6


def set_delta_t(dt, co_num, tau_f_min, tc: TimeControls):
    """setDeltaT-QGDQHD.H: immediate reduction, damped increase
    (setDeltaT-QGDQHD_8H_source.html:41-61)."""
    if not tc.adjust_time_step:
        return dt
    max_fact = tc.max_co / (co_num + SMALL)
    fact = jnp.minimum(jnp.minimum(max_fact, 1.0 + 0.1 * max_fact), 1.2)
    max_dt1 = jnp.minimum(tc.max_dt, tc.c_tau * tau_f_min)
    return jnp.minimum(fact * dt, max_dt1)


def face_normal_speed(Uf_a, axis: int):
    """Un at faces normal to `axis` = component `axis` of the face velocity
    (structured-mesh Sf is axis-aligned: Uf & Sf/|Sf| = Uf[axis])."""
    return Uf_a[axis]


def courant_acoustic(Uf, cf, dt, mesh: Mesh):
    """QGD acoustic Courant: max over faces of max(|Un+c|,|Un-c|)*dt/h_f
    (QGDCourantNo_8H_source.html:44-50)."""
    co = 0.0
    for a in range(mesh.ndim):
        un = face_normal_speed(Uf[a], a)
        wave = jnp.maximum(jnp.abs(un + cf[a]), jnp.abs(un - cf[a]))
        co = jnp.maximum(co, jnp.max(wave * dt / mesh.h_face(a)))
    return co


def courant_advective(Uf, dt, mesh: Mesh):
    """QHD advective Courant: max |Un|*dt/h_f
    (QHDCourantNo_8H_source.html:45-54)."""
    co = 0.0
    for a in range(mesh.ndim):
        un = jnp.abs(face_normal_speed(Uf[a], a))
        co = jnp.maximum(co, jnp.max(un * dt / mesh.h_face(a)))
    return co


def courant_mag(Uf, dt, mesh: Mesh):
    """scalarTransportQHDFoam variant: mag(Uf) (full face-velocity magnitude)
    * dt / h_f (scalarTransportQHDFoam_8C_source.html:86-98)."""
    co = 0.0
    for a in range(mesh.ndim):
        mag = jnp.sqrt(jnp.sum(jnp.square(Uf[a]), axis=0))
        co = jnp.maximum(co, jnp.max(mag * dt / mesh.h_face(a)))
    return co


def tau_f_min(tau_f):
    return jnp.min(jnp.asarray([jnp.min(tf) for tf in tau_f]))


# ---------------------------------------------------------------------------
# run drivers
# ---------------------------------------------------------------------------


def run_steps(step_fn, state, n_steps: int, log_every: int = 0,
              log_fn: tp.Optional[tp.Callable] = None):
    """Run `n_steps` with an optional host-side log callback.

    With log_every == 0 the whole run is one `lax.scan` (zero host syncs —
    the bench path); otherwise the loop is chunked scans with logging between
    chunks (the reference's per-step Info prints, QGDFoam_8C:160-162).
    """

    def scan_body(s, _):
        return step_fn(s), None

    if log_every <= 0:
        state, _ = jax.lax.scan(scan_body, state, None, length=n_steps)
        return state

    done = 0
    scan = jax.jit(lambda s, n: jax.lax.scan(scan_body, s, None, length=n)[0],
                   static_argnums=1)
    while done < n_steps:
        chunk = min(log_every, n_steps - done)
        state = scan(state, chunk)
        done += chunk
        if log_fn is not None:
            log_fn(done, state)
    return state
