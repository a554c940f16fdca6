"""Basel Face Model parametric head + software rasterizer (reference:
third_part/face3d/models/bfm.py ParametricFaceModel and
third_part/face3d/util/nvdiffrast.py MeshRenderer).

The coefficient-to-geometry math (shape/texture bases, SH lighting,
Euler rotations, perspective projection) is a direct port; the renderer
replaces the reference's nvdiffrast CUDA/OpenGL rasterizer with a pure-JAX
barycentric rasterizer (needed only for the photometric training losses —
coefficient inference never renders).

The BFM data (.mat bases) ships separately as in the reference; this module
takes plain numpy arrays so tests can use synthetic bases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from s2v_tpu.pipeline.utils import split_coeff

# SH constants (bfm.py:19-22)
_SH_A = (np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0))
_SH_C = (1 / np.sqrt(4 * np.pi), np.sqrt(3.0) / np.sqrt(4 * np.pi),
         3 * np.sqrt(5.0) / np.sqrt(12 * np.pi))


@dataclass
class FaceModelData:
    """BFM arrays (bfm.py:40-66). Shapes: mean_shape [3N], id_base [3N,80],
    exp_base [3N,64], mean_tex [3N], tex_base [3N,80], face_buf [F,3] int,
    point_buf [N,8] int, keypoints [68] int."""

    mean_shape: np.ndarray
    id_base: np.ndarray
    exp_base: np.ndarray
    mean_tex: np.ndarray
    tex_base: np.ndarray
    face_buf: np.ndarray
    point_buf: np.ndarray
    keypoints: np.ndarray

    @classmethod
    def from_mat(cls, bfm_folder: str, recenter: bool = True):
        import os
        from scipy.io import loadmat

        m = loadmat(os.path.join(bfm_folder, "BFM_model_front.mat"))
        mean_shape = m["meanshape"].astype(np.float32).reshape(-1)
        if recenter:
            ms = mean_shape.reshape(-1, 3)
            mean_shape = (ms - ms.mean(0, keepdims=True)).reshape(-1)
        return cls(
            mean_shape=mean_shape,
            id_base=m["idBase"].astype(np.float32),
            exp_base=m["exBase"].astype(np.float32),
            mean_tex=m["meantex"].astype(np.float32).reshape(-1),
            tex_base=m["texBase"].astype(np.float32),
            face_buf=m["tri"].astype(np.int64) - 1,
            point_buf=m["point_buf"].astype(np.int64) - 1,
            keypoints=np.squeeze(m["keypoints"]).astype(np.int64) - 1,
        )


class ParametricFaceModel:
    """bfm.py:26-290 with jit-friendly array methods."""

    def __init__(self, data: FaceModelData, camera_distance: float = 10.0,
                 focal: float = 1015.0, center: float = 112.0):
        self.d = data
        self.camera_distance = camera_distance
        # perspective_projection (bfm.py:11-17): p @ P^T convention
        self.persc_proj = jnp.asarray(
            np.array([[focal, 0, center], [0, focal, center], [0, 0, 1]],
                     np.float32).T
        )
        self.init_lit = jnp.asarray(
            np.array([0.8, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)
        ).reshape(1, 1, 9)

    def compute_shape(self, id_coeff, exp_coeff):
        out = (
            jnp.einsum("ij,aj->ai", jnp.asarray(self.d.id_base), id_coeff)
            + jnp.einsum("ij,aj->ai", jnp.asarray(self.d.exp_base), exp_coeff)
            + jnp.asarray(self.d.mean_shape)[None]
        )
        return out.reshape(id_coeff.shape[0], -1, 3)

    def compute_texture(self, tex_coeff, normalize: bool = True):
        out = (
            jnp.einsum("ij,aj->ai", jnp.asarray(self.d.tex_base), tex_coeff)
            + jnp.asarray(self.d.mean_tex)[None]
        )
        if normalize:
            out = out / 255.0
        return out.reshape(tex_coeff.shape[0], -1, 3)

    def compute_norm(self, face_shape):
        fb = jnp.asarray(self.d.face_buf)
        v1 = face_shape[:, fb[:, 0]]
        v2 = face_shape[:, fb[:, 1]]
        v3 = face_shape[:, fb[:, 2]]
        face_norm = jnp.cross(v1 - v2, v2 - v3)
        # sqrt(sum + eps) keeps gradients finite for degenerate triangles
        # (plain x/(||x||+eps) has a NaN gradient at exactly zero)
        face_norm = face_norm * jax.lax.rsqrt(
            jnp.sum(face_norm * face_norm, -1, keepdims=True) + 1e-12
        )
        face_norm = jnp.concatenate(
            [face_norm, jnp.zeros((face_shape.shape[0], 1, 3))], axis=1
        )
        vn = jnp.sum(face_norm[:, jnp.asarray(self.d.point_buf)], axis=2)
        return vn * jax.lax.rsqrt(jnp.sum(vn * vn, -1, keepdims=True) + 1e-12)

    def compute_color(self, face_texture, face_norm, gamma):
        b = gamma.shape[0]
        a, c = _SH_A, _SH_C
        gamma = gamma.reshape(b, 3, 9) + self.init_lit
        gamma = jnp.transpose(gamma, (0, 2, 1))
        n = face_norm
        y = jnp.concatenate([
            a[0] * c[0] * jnp.ones_like(n[..., :1]),
            -a[1] * c[1] * n[..., 1:2],
            a[1] * c[1] * n[..., 2:],
            -a[1] * c[1] * n[..., :1],
            a[2] * c[2] * n[..., :1] * n[..., 1:2],
            -a[2] * c[2] * n[..., 1:2] * n[..., 2:],
            0.5 * a[2] * c[2] / np.sqrt(3.0) * (3 * n[..., 2:] ** 2 - 1),
            -a[2] * c[2] * n[..., :1] * n[..., 2:],
            0.5 * a[2] * c[2] * (n[..., :1] ** 2 - n[..., 1:2] ** 2),
        ], axis=-1)
        rgb = jnp.stack([
            (y @ gamma[..., i : i + 1])[..., 0] for i in range(3)
        ], axis=-1)
        return rgb * face_texture

    def compute_rotation(self, angles):
        b = angles.shape[0]
        x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
        cx, sx = jnp.cos(x), jnp.sin(x)
        cy, sy = jnp.cos(y), jnp.sin(y)
        cz, sz = jnp.cos(z), jnp.sin(z)
        o = jnp.ones(b)
        zr = jnp.zeros(b)
        rx = jnp.stack([o, zr, zr, zr, cx, -sx, zr, sx, cx], 1).reshape(b, 3, 3)
        ry = jnp.stack([cy, zr, sy, zr, o, zr, -sy, zr, cy], 1).reshape(b, 3, 3)
        rz = jnp.stack([cz, -sz, zr, sz, cz, zr, zr, zr, o], 1).reshape(b, 3, 3)
        return jnp.transpose(rz @ ry @ rx, (0, 2, 1))

    def to_camera(self, face_shape):
        return face_shape.at[..., -1].set(
            self.camera_distance - face_shape[..., -1]
        )

    def to_image(self, face_shape):
        proj = face_shape @ self.persc_proj
        return proj[..., :2] / proj[..., 2:]

    def transform(self, face_shape, rot, trans):
        return face_shape @ rot + trans[:, None]

    def compute_for_render(self, coeffs):
        """bfm.py:270-290: coeffs [B, 257] -> (vertices, texture, color,
        landmarks)."""
        c = split_coeff(coeffs)
        shape = self.compute_shape(c["id"], c["exp"])
        rot = self.compute_rotation(c["angle"])
        shape_t = self.transform(shape, rot, c["trans"])
        vertex = self.to_camera(shape_t)
        proj = self.to_image(vertex)
        landmark = proj[:, jnp.asarray(self.d.keypoints)]
        texture = self.compute_texture(c["tex"])
        norm = self.compute_norm(shape)
        norm_rot = norm @ rot
        color = self.compute_color(texture, norm_rot, c["gamma"])
        return vertex, texture, color, landmark


def rasterize(
    vertices: jnp.ndarray,   # [B, N, 3] camera-space (z = distance)
    faces: np.ndarray,       # [F, 3] int
    attributes: jnp.ndarray, # [B, N, C] per-vertex colors
    image_size: int = 224,
    focal: float = 1015.0,
    center: float = 112.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-JAX barycentric z-buffer rasterizer — the nvdiffrast
    RasterizeGLContext replacement (face3d/util/nvdiffrast.py:21-80).

    Returns (image [B, H, W, C], mask [B, H, W, 1]). O(F * H * W) — meant
    for the 224^2 photometric-loss renders, where XLA fuses it into a few
    large elementwise ops over an [F, P] grid.
    """
    b, n, _ = vertices.shape
    f = faces.shape[0]
    h = w = image_size

    # project to pixel coordinates (y up -> image row down)
    xy = vertices[..., :2] * focal / vertices[..., 2:] + center
    px = xy[..., 0]
    py = (image_size - 1.0) - (xy[..., 1])  # flip v
    z = vertices[..., 2]

    tri = jnp.asarray(faces)
    ax, ay, az = px[:, tri[:, 0]], py[:, tri[:, 0]], z[:, tri[:, 0]]
    bx, by, bz = px[:, tri[:, 1]], py[:, tri[:, 1]], z[:, tri[:, 1]]
    cx, cy, cz = px[:, tri[:, 2]], py[:, tri[:, 2]], z[:, tri[:, 2]]

    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.reshape(-1).astype(jnp.float32)  # [P]
    ys = ys.reshape(-1).astype(jnp.float32)

    def raster_one(ax, ay, az, bx, by, bz, cx, cy, cz, attr):
        # barycentric coordinates of every pixel w.r.t. every face
        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)  # [F]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        w0 = ((by[:, None] - cy[:, None]) * (xs[None] - cx[:, None])
              + (cx[:, None] - bx[:, None]) * (ys[None] - cy[:, None])) / det[:, None]
        w1 = ((cy[:, None] - ay[:, None]) * (xs[None] - ax[:, None])
              + (ax[:, None] - cx[:, None]) * (ys[None] - ay[:, None])) / det[:, None]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)  # [F, P]
        zpix = w0 * az[:, None] + w1 * bz[:, None] + w2 * cz[:, None]
        zpix = jnp.where(inside, zpix, jnp.inf)
        best = jnp.argmin(zpix, axis=0)  # [P]
        hit = jnp.isfinite(jnp.min(zpix, axis=0))
        pix = jnp.arange(h * w)
        wb = jnp.stack([w0[best, pix], w1[best, pix], w2[best, pix]], -1)
        va = attr[tri[best]]  # [P, 3, C]
        img = jnp.einsum("pk,pkc->pc", wb, va)
        img = jnp.where(hit[:, None], img, 0.0)
        return img.reshape(h, w, -1), hit.reshape(h, w, 1).astype(jnp.float32)

    imgs, masks = jax.vmap(raster_one)(
        ax, ay, az, bx, by, bz, cx, cy, cz, attributes
    )
    return imgs, masks
