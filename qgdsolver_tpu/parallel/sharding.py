"""Domain decomposition over a TPU device mesh.

The reference's only parallelism is MPI domain decomposition with 1-ring +
vertex-corner halo exchange (SURVEY.md §2.4: OpenFOAM processorFvPatch plus
the 600-line leastSquaresBase corner-process discovery,
extendedFaceStencilFindNeighbours_8C_source.html:41-612).  The TPU-native
replacement is GSPMD sharding of the structured block over a
`jax.sharding.Mesh`: every stencil in ops/fvsc.py is a shifted slice of a
ghost-padded array, which XLA's SPMD partitioner lowers to collective-permute
halo exchanges over ICI automatically — including the diagonal (corner)
values, because the per-axis sequential padding transports corners in two
hops exactly like the reference's two-phase exchange would.

Global reductions (Courant max, CG dot products) lower to psum/pmax across
the same mesh.  No reference-style rank bookkeeping exists at all: the mesh
axes ARE the decomposition.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P


def factor2d(n: int):
    """Near-square factorization n = px*py (px >= py)."""
    py = int(math.isqrt(n))
    while n % py:
        py -= 1
    return n // py, py


def make_device_mesh(devices=None, shape=None, axis_names=("X", "Y")):
    """Build a 2-axis device mesh for (x, y) domain decomposition."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = factor2d(len(devices))
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return DeviceMesh(arr, axis_names)


def spatial_spec(arr_ndim: int, mesh_ndim: int, dmesh: DeviceMesh):
    """PartitionSpec sharding the trailing spatial axes over the device mesh.

    Decomposes the first min(mesh_ndim, len(mesh axes)) spatial axes; leading
    component axes replicate.
    """
    names = list(dmesh.axis_names)
    lead = [None] * (arr_ndim - mesh_ndim)
    spat = [names[i] if i < len(names) else None for i in range(mesh_ndim)]
    return P(*(lead + spat))


def state_shardings(state, mesh_ndim: int, dmesh: DeviceMesh):
    """NamedShardings for a solver-state pytree: spatial axes decomposed,
    scalars (t, dt) replicated."""

    def one(leaf):
        leaf = jax.numpy.asarray(leaf)
        if leaf.ndim < mesh_ndim:
            return NamedSharding(dmesh, P())
        return NamedSharding(dmesh, spatial_spec(leaf.ndim, mesh_ndim, dmesh))

    return jax.tree_util.tree_map(one, state)


def shard_state(state, mesh_ndim: int, dmesh: DeviceMesh):
    """Place a state pytree onto the device mesh."""
    sh = state_shardings(state, mesh_ndim, dmesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def sharded_step(step_fn, state, mesh_ndim: int, dmesh: DeviceMesh):
    """jit the step with explicit in/out shardings over the device mesh.

    XLA GSPMD inserts all halo collective-permutes and reduction psums; the
    latency-hiding scheduler overlaps them with interior compute (the
    TPU-native analogue of the reference's nonblocking PstreamBuffers
    exchanges, extendedFaceStencilScalarGrad_8C_source.html:122-268).
    """
    sh = state_shardings(state, mesh_ndim, dmesh)
    return jax.jit(step_fn, in_shardings=(sh,), out_shardings=sh)
