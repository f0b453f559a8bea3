"""Bound `eval/bfm.py`'s z-buffer splat renderer against a true barycentric
rasterizer (the reference renders with nvdiffrast,
`/root/reference/REFace/eval_tool/Deep3DFaceRecon_pytorch_edit/util/nvdiffrast.py:11`;
no CUDA here, so the oracle is a numpy scanline rasterizer in-test).

The splat renderer is a vertex scatter, so exact pixel parity only holds when
the mesh is tessellated at ~pixel density — which is the BFM09 regime (35709
vertices on a ~150² face patch at 224²). The tests therefore (1) compare a
pixel-dense mesh against the rasterizer and bound the covered-region error,
(2) check z-buffer occlusion ordering matches, and (3) pin the camera
projection conventions the coefficients flow through.
"""

import numpy as np

import jax.numpy as jnp

from vface_tpu.eval.bfm import project, splat_render, vertex_normals


def raster_reference(verts_px, colors, faces, size):
    """Barycentric z-buffered rasterizer (numpy oracle). verts_px (V,3) x,y,z
    with z = camera-space depth (smaller = nearer)."""
    img = np.zeros((size, size, 3), np.float32)
    zbuf = np.full((size, size), np.inf, np.float32)
    for f in faces:
        p = verts_px[f, :2]
        z = verts_px[f, 2]
        c = colors[f]
        lo = np.maximum(np.floor(p.min(axis=0)).astype(int), 0)
        hi = np.minimum(np.ceil(p.max(axis=0)).astype(int) + 1, size)
        if (hi <= lo).any():
            continue
        xs, ys = np.meshgrid(np.arange(lo[0], hi[0]), np.arange(lo[1], hi[1]))
        d = ((p[1, 1] - p[2, 1]) * (p[0, 0] - p[2, 0])
             + (p[2, 0] - p[1, 0]) * (p[0, 1] - p[2, 1]))
        if abs(d) < 1e-12:
            continue
        w0 = ((p[1, 1] - p[2, 1]) * (xs - p[2, 0]) + (p[2, 0] - p[1, 0]) * (ys - p[2, 1])) / d
        w1 = ((p[2, 1] - p[0, 1]) * (xs - p[2, 0]) + (p[0, 0] - p[2, 0]) * (ys - p[2, 1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        depth = w0 * z[0] + w1 * z[1] + w2 * z[2]
        col = (w0[..., None] * c[0] + w1[..., None] * c[1] + w2[..., None] * c[2])
        yy, xx = ys[inside], xs[inside]
        nearer = depth[inside] < zbuf[yy, xx]
        yy, xx = yy[nearer], xx[nearer]
        zbuf[yy, xx] = depth[inside][nearer]
        img[yy, xx] = col[inside][nearer]
    return img, zbuf


def dense_quad(x0, y0, x1, y1, z, n, color_fn):
    """Pixel-dense tessellated quad in pixel coords at constant depth."""
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    gx, gy = np.meshgrid(xs, ys)
    verts = np.stack([gx.ravel(), gy.ravel(), np.full(n * n, z)], axis=-1).astype(np.float32)
    colors = color_fn(verts[:, 0], verts[:, 1]).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts, colors, np.asarray(faces, np.int32)


def test_splat_matches_rasterizer_on_dense_mesh():
    size = 48
    verts, colors, faces = dense_quad(
        6, 6, 42, 42, 5.0, 40,
        lambda x, y: np.stack([x / size, y / size, 0.5 * np.ones_like(x)], -1),
    )
    want, zbuf = raster_reference(verts, colors, faces, size)
    got = np.asarray(splat_render(jnp.asarray(verts), jnp.asarray(colors), size))
    covered = zbuf < np.inf
    # interior coverage: the splat must own nearly every rasterised pixel
    splat_covered = got.sum(-1) > 0
    assert (covered & splat_covered).sum() / covered.sum() > 0.95
    both = covered & splat_covered
    err = np.abs(got[both] - want[both]).mean()
    assert err < 0.02, f"mean covered-pixel error {err}"


def test_splat_occlusion_matches_rasterizer():
    """A near quad over a far quad: both renderers must show the near color
    in the overlap."""
    size = 32
    far_v, far_c, far_f = dense_quad(
        4, 4, 28, 28, 9.0, 25, lambda x, y: np.stack([np.ones_like(x), 0 * x, 0 * x], -1)
    )
    near_v, near_c, near_f = dense_quad(
        12, 12, 20, 20, 3.0, 9, lambda x, y: np.stack([0 * x, np.ones_like(x), 0 * x], -1)
    )
    verts = np.concatenate([far_v, near_v])
    colors = np.concatenate([far_c, near_c])
    faces = np.concatenate([far_f, near_f + len(far_v)])
    want, _ = raster_reference(verts, colors, faces, size)
    got = np.asarray(splat_render(jnp.asarray(verts), jnp.asarray(colors), size))
    # overlap centre: near quad (green) wins in both
    assert want[16, 16, 1] > 0.9 and want[16, 16, 0] < 0.1
    assert got[16, 16, 1] > 0.9 and got[16, 16, 0] < 0.1
    # outside the near quad, far (red) shows in both
    assert want[6, 6, 0] > 0.9 and got[6, 6, 0] > 0.9


def test_projection_conventions():
    """facerecon camera: +x right, +y UP in world → y flips to image rows;
    nearer (larger world z) → smaller depth."""
    v = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    p = np.asarray(project(v, focal=100.0, center=50.0, cam_z=10.0))
    assert np.allclose(p[0], [50.0, 50.0, 10.0])
    assert p[1, 0] > 50.0 and np.isclose(p[1, 1], 50.0)  # +x → right
    assert p[2, 1] < 50.0 and np.isclose(p[2, 0], 50.0)  # +y → up (smaller row)
    assert p[3, 2] < 10.0  # +z → nearer


def test_vertex_normals_orientation():
    """CCW triangle in the xy-plane (viewed from +z) → normal along +z,
    unit length, averaged over incident faces."""
    verts = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    n = np.asarray(vertex_normals(verts, faces))
    np.testing.assert_allclose(n[0], np.tile([0.0, 0.0, 1.0], (3, 1)), atol=1e-6)
