"""Tests for the matrix-free CG Helmholtz/Poisson solver."""
import jax.numpy as jnp
import numpy as np

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc as bcm
from qgdsolver_tpu.ops import fvsc, linsolve


def _mesh():
    return Mesh.uniform((24, 16), lengths=(1.0, 1.0), dtype=np.float64)


def test_helmholtz_manufactured_dirichlet():
    mesh = _mesh()
    bcs = bcm.FieldBCs.uniform(bcm.FixedValue(0.0), 2)
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    y = np.asarray(mesh.cell_coords(1)) * np.ones(mesh.shape)
    x_true = jnp.asarray(np.sin(np.pi * x) * np.sin(np.pi * y))
    gamma = tuple(jnp.ones(mesh.face_shape(a)) for a in range(2))
    # rhs from the discrete operator itself => solver must recover x_true
    rhs = linsolve.helmholtz_affine(
        x_true, diag_coeff=2.0, gamma_faces=gamma, bcs=bcs, mesh=mesh
    )
    res = linsolve.solve_helmholtz(
        diag_coeff=2.0, gamma_faces=gamma, rhs=rhs,
        x0=jnp.zeros(mesh.shape), bcs=bcs, mesh=mesh, tol=1e-12, maxiter=2000,
    )
    np.testing.assert_allclose(res.x, x_true, atol=1e-9)
    assert int(res.iters) < 2000


def test_poisson_neumann_singular():
    mesh = _mesh()
    bcs = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)
    x = np.asarray(mesh.cell_coords(0)) * np.ones(mesh.shape)
    x_true = jnp.asarray(np.cos(np.pi * x))  # Neumann-compatible, zero-mean
    gamma = tuple(jnp.ones(mesh.face_shape(a)) for a in range(2))
    rhs = linsolve.helmholtz_affine(
        x_true, diag_coeff=0.0, gamma_faces=gamma, bcs=bcs, mesh=mesh
    )
    res = linsolve.solve_helmholtz(
        diag_coeff=0.0, gamma_faces=gamma, rhs=rhs,
        x0=jnp.zeros(mesh.shape), bcs=bcs, mesh=mesh, tol=1e-12,
        maxiter=4000, singular=True,
    )
    err = res.x - x_true
    err = err - jnp.mean(err)
    np.testing.assert_allclose(err, 0.0, atol=1e-8)


def test_inhomogeneous_bc_split():
    """FixedValue!=0 BCs: affine split must reproduce the exact solve."""
    mesh = _mesh()
    bcs = bcm.FieldBCs.uniform(bcm.FixedValue(3.0), 2)
    gamma = tuple(jnp.ones(mesh.face_shape(a)) for a in range(2))
    # constant field 3.0 satisfies diag*x - lap(x) = diag*3 with these BCs
    rhs = 2.0 * jnp.full(mesh.shape, 3.0)
    res = linsolve.solve_helmholtz(
        diag_coeff=2.0, gamma_faces=gamma, rhs=rhs,
        x0=jnp.zeros(mesh.shape), bcs=bcs, mesh=mesh, tol=1e-12, maxiter=2000,
    )
    np.testing.assert_allclose(res.x, 3.0, atol=1e-9)
