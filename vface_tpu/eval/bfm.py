"""BFM09 morphable-model math + a pure-JAX splat renderer (Deep3DFaceRecon).

Capability parity with `/root/reference/REFace/eval_tool/
Deep3DFaceRecon_pytorch_edit/models/bfm.py` (:299, ``ParametricFaceModel``)
and the nvdiffrast-backed renderer (`util/nvdiffrast.py:11`) used by the
expression eval's qualitative overlays. The expression *metric* itself only
needs the coefficient regressor (`vface_tpu.eval.expression`); this module
adds the geometry so full reconstruction parity is available without CUDA:

* :func:`split_coeff` — the 257-d layout (id 80 / exp 64 / tex 80 / angle 3 /
  gamma 27 / trans 3), matching facerecon_model.py's split.
* :func:`compute_shape` / :func:`compute_texture` — mean + basis·coeff.
* :func:`compute_rotation` — XYZ Euler (BFM convention).
* :func:`sh_illumination` — 9-band spherical-harmonic shading (3 channels).
* :func:`project` — perspective camera (focal 1015, center 112 @ 224²).
* :func:`splat_render` — z-buffered vertex splatting with scatter-max (the
  TPU-native replacement for the CUDA rasterizer; small meshes render fine
  as splats at 224²).

The BFM09 basis arrays are licensed assets supplied by the user (as in the
reference, which loads BFM_model_front.mat); all functions take them as
plain arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ID_DIM, EXP_DIM, TEX_DIM = 80, 64, 80


class BFMCoeffs(NamedTuple):
    id: jax.Array      # (B, 80)
    exp: jax.Array     # (B, 64)
    tex: jax.Array     # (B, 80)
    angle: jax.Array   # (B, 3)
    gamma: jax.Array   # (B, 27)
    trans: jax.Array   # (B, 3)


def split_coeff(coeffs: jax.Array) -> BFMCoeffs:
    return BFMCoeffs(
        id=coeffs[:, :80],
        exp=coeffs[:, 80:144],
        tex=coeffs[:, 144:224],
        angle=coeffs[:, 224:227],
        gamma=coeffs[:, 227:254],
        trans=coeffs[:, 254:257],
    )


def compute_shape(mean_shape, id_base, exp_base, id_coef, exp_coef) -> jax.Array:
    """(B, V, 3) vertices: mean + id_base·α + exp_base·β (bfm.py compute_shape)."""
    b = id_coef.shape[0]
    v = mean_shape.reshape(-1, 3)
    shape = (
        v[None]
        + jnp.einsum("vk,bk->bv", id_base, id_coef).reshape(b, -1, 3)
        + jnp.einsum("vk,bk->bv", exp_base, exp_coef).reshape(b, -1, 3)
    )
    return shape


def compute_texture(mean_tex, tex_base, tex_coef) -> jax.Array:
    b = tex_coef.shape[0]
    return (
        mean_tex.reshape(-1, 3)[None]
        + jnp.einsum("vk,bk->bv", tex_base, tex_coef).reshape(b, -1, 3)
    )


def compute_rotation(angles: jax.Array) -> jax.Array:
    """(B,3) XYZ Euler radians → (B,3,3), bfm.py compute_rotation convention."""
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    o, zr = jnp.ones_like(x), jnp.zeros_like(x)
    rx = jnp.stack([o, zr, zr, zr, cx, -sx, zr, sx, cx], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, zr, sy, zr, o, zr, -sy, zr, cy], -1).reshape(-1, 3, 3)
    rz = jnp.stack([cz, -sz, zr, sz, cz, zr, zr, zr, o], -1).reshape(-1, 3, 3)
    return (rz @ ry @ rx).transpose(0, 2, 1)


_SH_A = (jnp.pi, 2 * jnp.pi / jnp.sqrt(3.0), 2 * jnp.pi / jnp.sqrt(8.0))
_SH_C = (1 / jnp.sqrt(4 * jnp.pi), jnp.sqrt(3.0) / jnp.sqrt(4 * jnp.pi),
         3 * jnp.sqrt(5.0) / jnp.sqrt(12 * jnp.pi))


def sh_illumination(normals: jax.Array, gamma: jax.Array) -> jax.Array:
    """(B,V,3) normals + (B,27) SH coeffs → (B,V,3) shading (bfm compute_color)."""
    b, v, _ = normals.shape
    g = gamma.reshape(b, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    a0, a1, a2 = _SH_A
    c0, c1, c2 = _SH_C
    basis = jnp.stack(
        [
            a0 * c0 * jnp.ones_like(nx),
            -a1 * c1 * ny,
            a1 * c1 * nz,
            -a1 * c1 * nx,
            a2 * c2 * nx * ny,
            -a2 * c2 * ny * nz,
            0.5 * a2 * c2 / jnp.sqrt(3.0) * (3 * nz**2 - 1),
            -a2 * c2 * nx * nz,
            0.5 * a2 * c2 * (nx**2 - ny**2),
        ],
        axis=-1,
    )  # (B, V, 9)
    return jnp.einsum("bvk,bck->bvc", basis, g)


def vertex_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted vertex normals. verts (B,V,3), faces (F,3) int32."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # (B,F,3)
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[:, faces[:, i]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8)


def project(verts: jax.Array, focal: float = 1015.0, center: float = 112.0,
            cam_z: float = 10.0) -> jax.Array:
    """Perspective projection to 224² pixel coords (facerecon camera)."""
    z = cam_z - verts[..., 2]
    x = focal * verts[..., 0] / z + center
    y = center - focal * verts[..., 1] / z
    return jnp.stack([x, y, z], axis=-1)


def splat_render(
    projected: jax.Array,  # (V, 3) x, y, depth
    colors: jax.Array,     # (V, 3) in [0,1]
    size: int = 224,
) -> jax.Array:
    """Z-buffered vertex splat: nearest-pixel scatter with depth priority.

    Two scatter passes: (1) per-pixel min depth via scatter-min, (2) color
    write where a vertex owns its pixel. All-XLA; no CUDA rasterizer needed.
    """
    xi = jnp.clip(jnp.round(projected[:, 0]).astype(jnp.int32), 0, size - 1)
    yi = jnp.clip(jnp.round(projected[:, 1]).astype(jnp.int32), 0, size - 1)
    pix = yi * size + xi
    depth = projected[:, 2]
    zbuf = jnp.full((size * size,), jnp.inf).at[pix].min(depth)
    owns = depth <= zbuf[pix] + 1e-6
    img = jnp.zeros((size * size, 3))
    wsum = jnp.zeros((size * size, 1))
    img = img.at[pix].add(jnp.where(owns[:, None], colors, 0.0))
    wsum = wsum.at[pix].add(owns[:, None].astype(jnp.float32))
    out = img / jnp.maximum(wsum, 1.0)
    return out.reshape(size, size, 3)


def render_coeffs(
    coeffs: jax.Array,
    mean_shape, id_base, exp_base, mean_tex, tex_base, faces,
    size: int = 224,
) -> jax.Array:
    """Full reconstruction render for one coefficient vector (B=1)."""
    c = split_coeff(coeffs)
    shape = compute_shape(mean_shape, id_base, exp_base, c.id, c.exp)
    rot = compute_rotation(c.angle)
    verts = jnp.einsum("bij,bvj->bvi", rot, shape) + c.trans[:, None, :]
    tex = jnp.clip(compute_texture(mean_tex, tex_base, c.tex) / 255.0, 0.0, 1.0)
    normals = vertex_normals(verts, faces)
    color = jnp.clip(tex * sh_illumination(normals, c.gamma), 0.0, 1.0)
    proj = project(verts)
    return splat_render(proj[0], color[0], size)
