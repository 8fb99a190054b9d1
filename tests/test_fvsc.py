"""Linear-exactness tests for the fvsc face operators.

Both reference full-stencil schemes (leastSquares, GaussVolPoint) are exact
for linear fields by construction; the structured-mesh "full" scheme here must
reproduce that, including at boundaries (via ghost values of consistent BCs).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from qgdsolver_tpu.core.mesh import Mesh
from qgdsolver_tpu.core import bc
from qgdsolver_tpu.ops import fvsc


def make_mesh(nonuniform=False):
    if nonuniform:
        rng = np.random.RandomState(0)
        xf = np.cumsum(np.r_[0.0, 0.5 + rng.rand(12)])
        yf = np.cumsum(np.r_[0.0, 0.5 + rng.rand(9)])
        return Mesh(x_faces=(xf, yf), dtype=np.float64)
    return Mesh.uniform((12, 9), lengths=(1.2, 0.9), dtype=np.float64)


def linear_field(m, a=0.7, bx=1.3, by=-2.1):
    X = np.broadcast_to(m.centers[0][:, None], m.shape)
    Y = np.broadcast_to(m.centers[1][None, :], m.shape)
    return jnp.asarray(a + bx * X + by * Y), (a, bx, by)


def value_bcs(fn, ndim=2):
    """fixedValue BCs from an exact solution callable fn(*coords)."""
    g = lambda t, coords: fn(*coords)
    return bc.FieldBCs.uniform(bc.FixedValue(g), ndim)


@pytest.mark.parametrize("nonuniform", [False, True])
def test_interpolate_linear_exact(nonuniform):
    m = make_mesh(nonuniform)
    f, (a, bx, by) = linear_field(m)
    bcs = value_bcs(lambda x, y: a + bx * x + by * y)
    fx, fy = fvsc.interpolate(f, bcs, m)
    Xf = np.broadcast_to(m.x_faces[0][:, None], m.face_shape(0))
    Yc = np.broadcast_to(m.centers[1][None, :], m.face_shape(0))
    np.testing.assert_allclose(np.asarray(fx), a + bx * Xf + by * Yc, rtol=1e-12)
    Xc = np.broadcast_to(m.centers[0][:, None], m.face_shape(1))
    Yf = np.broadcast_to(m.x_faces[1][None, :], m.face_shape(1))
    np.testing.assert_allclose(np.asarray(fy), a + bx * Xc + by * Yf, rtol=1e-12)


@pytest.mark.parametrize("nonuniform", [False, True])
@pytest.mark.parametrize("scheme", ["full", "reduced"])
def test_grad_linear_exact(nonuniform, scheme):
    m = make_mesh(nonuniform)
    f, (a, bx, by) = linear_field(m)
    bcs = value_bcs(lambda x, y: a + bx * x + by * y)
    gx, gy = fvsc.grad(f, bcs, m, scheme=scheme)
    # normal components exact for both schemes
    np.testing.assert_allclose(np.asarray(gx[0]), bx, rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gy[1]), by, rtol=0, atol=1e-11)
    if scheme == "full":
        # tangential components exact only for the full scheme
        np.testing.assert_allclose(np.asarray(gx[1]), by, rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(gy[0]), bx, rtol=0, atol=1e-11)
    else:
        np.testing.assert_allclose(np.asarray(gx[1]), 0.0, atol=1e-14)


def test_grad_zero_gradient_interior_exact():
    """With zeroGradient BCs, interior faces of a linear field still get the
    exact gradient (boundary-adjacent faces are approximate, as in the
    reference's degenerate-face fallback)."""
    m = make_mesh()
    f, (a, bx, by) = linear_field(m)
    bcs = bc.FieldBCs.uniform(bc.ZeroGradient(), 2)
    gx, gy = fvsc.grad(f, bcs, m, scheme="full")
    np.testing.assert_allclose(np.asarray(gx[0][2:-2, 2:-2]), bx, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gx[1][2:-2, 2:-2]), by, atol=1e-11)


@pytest.mark.parametrize("nonuniform", [False, True])
def test_grad_vector_linear_exact(nonuniform):
    m = make_mesh(nonuniform)
    X = np.broadcast_to(m.centers[0][:, None], m.shape)
    Y = np.broadcast_to(m.centers[1][None, :], m.shape)
    # U = (1 + 2x - y, -3 + x + 4y)
    U = jnp.stack([1 + 2 * X - Y, -3 + X + 4 * Y])
    G_exact = np.array([[2.0, 1.0], [-1.0, 4.0]])  # G[i,j] = d_i U_j

    def uvec(t, coords):
        x, y = coords
        return jnp.stack(
            jnp.broadcast_arrays(1 + 2 * x - y, -3 + x + 4 * y), axis=0
        )

    bcs = bc.FieldBCs.uniform(bc.FixedValue(uvec), 2)
    gx, gy = fvsc.grad(U, bcs, m, scheme="full", vector=True)
    for i in range(2):
        for j in range(2):
            np.testing.assert_allclose(np.asarray(gx[i, j]), G_exact[i, j], atol=1e-11)
            np.testing.assert_allclose(np.asarray(gy[i, j]), G_exact[i, j], atol=1e-11)
    # div at faces = trace
    dvx, dvy = fvsc.div_face((gx, gy), m)
    np.testing.assert_allclose(np.asarray(dvx), 6.0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dvy), 6.0, atol=1e-11)


def test_div_flux_constant_velocity():
    """div of a uniform flux is zero."""
    m = make_mesh()
    phix = 2.5 * np.asarray(m.face_area(0)) * np.ones(m.face_shape(0))
    phiy = -1.5 * np.asarray(m.face_area(1)) * np.ones(m.face_shape(1))
    d = fvsc.div_flux((jnp.asarray(phix), jnp.asarray(phiy)), m)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_div_flux_linear_velocity():
    """div(S_f * U_f) of U=(x, 2y) is 3 exactly."""
    m = make_mesh(nonuniform=True)
    Xf = np.broadcast_to(m.x_faces[0][:, None], m.face_shape(0))
    Yf = np.broadcast_to(m.x_faces[1][None, :], m.face_shape(1))
    phix = jnp.asarray(Xf) * m.face_area(0)
    phiy = 2.0 * jnp.asarray(Yf) * m.face_area(1)
    d = fvsc.div_flux((phix, phiy), m)
    np.testing.assert_allclose(np.asarray(d), 3.0, rtol=1e-12)


def test_laplacian_quadratic():
    """laplacian of x^2 + y^2 with unit diffusivity is 4 (exact: snGrad of a
    quadratic at the midpoint face is exact on any rectilinear mesh interior,
    and fixedValue BCs make the boundary one-sided difference second order)."""
    m = make_mesh()
    X = np.broadcast_to(m.centers[0][:, None], m.shape)
    Y = np.broadcast_to(m.centers[1][None, :], m.shape)
    f = jnp.asarray(X**2 + Y**2)
    bcs = value_bcs(lambda x, y: x**2 + y**2)
    gamma = (jnp.ones(m.face_shape(0)), jnp.ones(m.face_shape(1)))
    L = fvsc.laplacian_explicit(gamma, f, bcs, m)
    np.testing.assert_allclose(np.asarray(L)[1:-1, 1:-1], 4.0, rtol=1e-10)


def test_periodic_grad():
    m = Mesh.uniform((16, 16), lengths=(1.0, 1.0), dtype=np.float64)
    X = np.broadcast_to(m.centers[0][:, None], m.shape)
    f = jnp.asarray(np.sin(2 * np.pi * X))
    bcs = bc.FieldBCs(
        (
            (bc.Periodic(), bc.Periodic()),
            (bc.ZeroGradient(), bc.ZeroGradient()),
        )
    )
    gx, gy = fvsc.grad(f, bcs, m, scheme="full")
    Xf = np.broadcast_to(m.x_faces[0][:, None], m.face_shape(0))
    exact = 2 * np.pi * np.cos(2 * np.pi * Xf)
    err = np.abs(np.asarray(gx[0]) - exact)
    # second-order accurate on 16 cells: few percent of the amplitude
    assert err.max() < 0.05 * 2 * np.pi
    # wrap faces consistent
    np.testing.assert_allclose(np.asarray(gx[0][0]), np.asarray(gx[0][-1]), atol=1e-12)


def test_symmetry_vector_pad():
    m = Mesh.uniform((4, 4), dtype=np.float64)
    U = jnp.stack([jnp.ones(m.shape), 2 * jnp.ones(m.shape)])
    bcs = bc.FieldBCs.uniform(bc.Symmetry(), 2)
    from qgdsolver_tpu.ops.pad import ghost_pad

    Up = ghost_pad(U, bcs, m, vector=True)
    # x-ghosts flip component 0
    np.testing.assert_allclose(np.asarray(Up[0, 0, 1:-1]), -1.0)
    np.testing.assert_allclose(np.asarray(Up[1, 0, 1:-1]), 2.0)
    # y-ghosts flip component 1
    np.testing.assert_allclose(np.asarray(Up[1, 1:-1, 0]), -2.0)
    np.testing.assert_allclose(np.asarray(Up[0, 1:-1, 0]), 1.0)


def test_grad_3d_linear():
    m = Mesh.uniform((6, 5, 4), lengths=(1.0, 1.0, 1.0), dtype=np.float64)
    C = [
        np.broadcast_to(
            m.centers[a].reshape([-1 if i == a else 1 for i in range(3)]), m.shape
        )
        for a in range(3)
    ]
    coef = (1.1, -0.7, 0.4)
    f = jnp.asarray(2.0 + coef[0] * C[0] + coef[1] * C[1] + coef[2] * C[2])
    bcs = bc.FieldBCs.uniform(
        bc.FixedValue(
            lambda t, c: 2.0 + coef[0] * c[0] + coef[1] * c[1] + coef[2] * c[2]
        ),
        3,
    )
    g = fvsc.grad(f, bcs, m, scheme="full")
    for a in range(3):
        for i in range(3):
            np.testing.assert_allclose(np.asarray(g[a][i]), coef[i], atol=1e-11)


def test_grad_cell_linear():
    m = make_mesh(nonuniform=True)
    f, (a, bx, by) = linear_field(m)
    bcs = value_bcs(lambda x, y: a + bx * x + by * y)
    g = fvsc.grad_cell(f, bcs, m)
    np.testing.assert_allclose(np.asarray(g[0]), bx, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g[1]), by, atol=1e-11)
