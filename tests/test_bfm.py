"""BFM parametric face model + rasterizer tests with synthetic bases, and
rotation/SH parity vs the reference torch math."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from s2v_tpu.models.bfm import FaceModelData, ParametricFaceModel, rasterize

RNG = np.random.RandomState(221)


def synthetic_model(n_verts=40, n_faces=60):
    faces = RNG.randint(0, n_verts, size=(n_faces, 3)).astype(np.int64)
    point_buf = RNG.randint(0, n_faces, size=(n_verts, 8)).astype(np.int64)
    return FaceModelData(
        mean_shape=RNG.randn(3 * n_verts).astype(np.float32),
        id_base=RNG.randn(3 * n_verts, 80).astype(np.float32) * 0.01,
        exp_base=RNG.randn(3 * n_verts, 64).astype(np.float32) * 0.01,
        mean_tex=(RNG.rand(3 * n_verts).astype(np.float32) * 255),
        tex_base=RNG.randn(3 * n_verts, 80).astype(np.float32),
        face_buf=faces,
        point_buf=point_buf,
        keypoints=RNG.choice(n_verts, 68).astype(np.int64),
    )


def torch_rotation(angles):
    """bfm.py:174-210 literal."""
    b = angles.shape[0]
    ones = torch.ones([b, 1])
    zeros = torch.zeros([b, 1])
    x, y, z = angles[:, :1], angles[:, 1:2], angles[:, 2:]
    rot_x = torch.cat([ones, zeros, zeros, zeros, torch.cos(x), -torch.sin(x),
                       zeros, torch.sin(x), torch.cos(x)], dim=1).reshape(b, 3, 3)
    rot_y = torch.cat([torch.cos(y), zeros, torch.sin(y), zeros, ones, zeros,
                       -torch.sin(y), zeros, torch.cos(y)], dim=1).reshape(b, 3, 3)
    rot_z = torch.cat([torch.cos(z), -torch.sin(z), zeros, torch.sin(z),
                       torch.cos(z), zeros, zeros, zeros, ones], dim=1).reshape(b, 3, 3)
    return (rot_z @ rot_y @ rot_x).permute(0, 2, 1)


def test_rotation_matches_reference():
    model = ParametricFaceModel(synthetic_model())
    angles = RNG.randn(4, 3).astype(np.float32) * 0.3
    want = torch_rotation(torch.from_numpy(angles)).numpy()
    got = np.asarray(model.compute_rotation(jnp.asarray(angles)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_for_render_shapes_and_lighting():
    data = synthetic_model()
    model = ParametricFaceModel(data)
    coeffs = jnp.asarray(RNG.randn(2, 257).astype(np.float32) * 0.1)
    vertex, texture, color, landmark = model.compute_for_render(coeffs)
    n = data.mean_shape.size // 3
    assert vertex.shape == (2, n, 3)
    assert texture.shape == (2, n, 3)
    assert color.shape == (2, n, 3)
    assert landmark.shape == (2, 68, 2)
    assert np.isfinite(np.asarray(color)).all()
    # zero gamma with init_lit only: color = texture * pi * c0 * 0.8-ish scale
    zero_gamma = jnp.zeros((2, 27))
    norm = model.compute_norm(model.compute_shape(coeffs[:, :80], coeffs[:, 80:144]))
    c = model.compute_color(texture, norm, zero_gamma)
    scale = float(np.pi * (1 / np.sqrt(4 * np.pi)) * 0.8)
    np.testing.assert_allclose(np.asarray(c), np.asarray(texture) * scale,
                               rtol=1e-4)


def test_rasterizer_covers_triangle():
    # one big triangle covering the image center, constant red attribute
    verts = jnp.asarray([[
        [-3.0, -3.0, 10.0], [3.0, -3.0, 10.0], [0.0, 4.0, 10.0],
    ]])
    faces = np.asarray([[0, 1, 2]], np.int64)
    attrs = jnp.asarray([[[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]]])
    img, mask = rasterize(verts, faces, attrs, image_size=64, focal=100.0,
                          center=32.0)
    assert img.shape == (1, 64, 64, 3)
    m = np.asarray(mask)[0, :, :, 0]
    assert m[32, 32] == 1.0  # center covered
    assert m[0, 0] == 0.0    # corner not
    np.testing.assert_allclose(np.asarray(img)[0, 32, 32], [1.0, 0, 0],
                               rtol=1e-5)


def test_rasterizer_zbuffer_orders_faces():
    # two stacked triangles; nearer one (smaller z) wins
    verts = jnp.asarray([[
        [-3.0, -3.0, 10.0], [3.0, -3.0, 10.0], [0.0, 4.0, 10.0],   # far, red
        [-3.0, -3.0, 5.0], [3.0, -3.0, 5.0], [0.0, 4.0, 5.0],      # near, green
    ]])
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int64)
    attrs = jnp.asarray([[[1.0, 0, 0]] * 3 + [[0, 1.0, 0]] * 3])
    img, mask = rasterize(verts, faces, attrs, image_size=32, focal=50.0,
                          center=16.0)
    np.testing.assert_allclose(np.asarray(img)[0, 16, 16], [0, 1.0, 0],
                               rtol=1e-5)
