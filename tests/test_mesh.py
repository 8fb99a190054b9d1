import numpy as np
import pytest

from qgdsolver_tpu.core.mesh import Mesh


def test_uniform_geometry_2d():
    m = Mesh.uniform((8, 4), lengths=(2.0, 1.0), dtype=np.float64)
    assert m.shape == (8, 4)
    assert m.ndim == 2
    np.testing.assert_allclose(m.dx[0], 0.25)
    np.testing.assert_allclose(m.dx[1], 0.25)
    np.testing.assert_allclose(np.asarray(m.cell_volume), 0.0625)
    np.testing.assert_allclose(np.asarray(m.face_area(0)).ravel(), 0.25)


def test_h_face_uniform():
    # interior h_f = min(dx_l, dx_r) = dx; boundary h_f = dx
    # (reference QGDCoeffs_8C_source.html:298-317)
    m = Mesh.uniform((4, 4), dtype=np.float64)
    h = m.h_face_1d[0]
    np.testing.assert_allclose(h, 0.25)


def test_h_face_nonuniform():
    xf = np.array([0.0, 1.0, 3.0, 6.0])
    m = Mesh(x_faces=(xf,), dtype=np.float64)
    # dx = [1,2,3]; interior faces: min(1,2)=1, min(2,3)=2; boundary: 1 and 3
    np.testing.assert_allclose(m.h_face_1d[0], [1.0, 1.0, 2.0, 3.0])


def test_h_cell_uniform():
    m = Mesh.uniform((4, 4), dtype=np.float64)
    np.testing.assert_allclose(np.asarray(m.h_cell), 0.25)


def test_interp_weights_nonuniform():
    xf = np.array([0.0, 1.0, 3.0])
    m = Mesh(x_faces=(xf,), dtype=np.float64)
    # interior face between dx=1 and dx=2 cells: w_left = 2/(1+2)
    np.testing.assert_allclose(m.w_face[0][1], 2.0 / 3.0)
    # boundary faces with mirrored ghosts: w = 0.5
    np.testing.assert_allclose(m.w_face[0][0], 0.5)
    np.testing.assert_allclose(m.w_face[0][2], 0.5)


def test_d_centers():
    xf = np.array([0.0, 1.0, 3.0])
    m = Mesh(x_faces=(xf,), dtype=np.float64)
    np.testing.assert_allclose(m.d_centers[0], [1.0, 1.5, 2.0])
