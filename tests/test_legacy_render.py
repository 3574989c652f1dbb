"""Legacy Vertex/index-mesh renderer (rendering/legacy.py) — parity with
the reference's deprecated pretransformed path
(rasterizer.rs:2110-2542)."""

import numpy as np
import jax.numpy as jnp

from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.models.vertex import (
    pack_vertices,
    unpack_vertices,
)
from differential_projection_voxel_renderer_tpu.rendering.legacy import (
    mesh_quads_to_triangles,
    render_vertex_mesh,
)
from differential_projection_voxel_renderer_tpu.utils.config import SKY_COLOR

W = H = 128
SKY = np.uint32(SKY_COLOR)


def _quad_mesh(z, light=(255, 255, 255, 255), block=3, ao=(0, 0, 0, 0)):
    """One +Z-facing unit-ish quad at local z, corners (4..28)^2."""
    xs = [4, 28, 28, 4]
    ys = [4, 4, 28, 28]
    packed = pack_vertices(xs, ys, [z] * 4, [block] * 4, 
                           np.asarray(light, np.float32) / 255.0,
                           [4] * 4, list(ao))
    v = {k: jnp.asarray(a) for k, a in unpack_vertices(packed).items()}
    idx = jnp.asarray(mesh_quads_to_triangles(1))
    return v, idx


def _cam():
    cam = Camera(np.array([16.0, 16.0, 90.0], np.float32), 1.0)
    cam.look_at(np.array([16.0, 16.0, 0.0], np.float32))
    return jnp.asarray(cam.view_projection_matrix(), jnp.float32)


def test_quad_renders_and_depth_tests():
    mvp = _cam()
    off = jnp.zeros(3, jnp.float32)
    v_far, idx = _quad_mesh(0)
    v_near, _ = _quad_mesh(20)
    c, d = render_vertex_mesh(v_far, idx, jnp.int32(2), off, mvp,
                              width=W, height=H)
    c = np.asarray(c).view(np.uint32)
    drawn_far = (c != SKY).sum()
    assert drawn_far > 500  # the quad fills a big part of the view
    # near quad drawn ON TOP of the far result wins everywhere it covers
    c2, d2 = render_vertex_mesh(v_near, idx, jnp.int32(2), off, mvp,
                                width=W, height=H,
                                init_color=jnp.asarray(c.view(np.int32)),
                                init_depth=d)
    d2 = np.asarray(d2)
    assert (np.asarray(d2) < np.asarray(d) - 1e-6).sum() > 400
    # and the reverse order produces the identical frame (depth buffer,
    # not draw order)
    cn, dn = render_vertex_mesh(v_near, idx, jnp.int32(2), off, mvp,
                                width=W, height=H)
    cf, df = render_vertex_mesh(v_far, idx, jnp.int32(2), off, mvp,
                                width=W, height=H,
                                init_color=cn, init_depth=dn)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(cf))


def test_vertex_light_interpolates():
    mvp = _cam()
    off = jnp.zeros(3, jnp.float32)
    # dark left corners, bright right corners -> brightness gradient
    v, idx = _quad_mesh(0, light=(40, 255, 255, 40))
    c, _ = render_vertex_mesh(v, idx, jnp.int32(2), off, mvp,
                              width=W, height=H)
    c = np.asarray(c).view(np.uint32)
    row = c[H // 2]
    drawn = np.nonzero(row != SKY)[0]
    assert len(drawn) > 20
    red = (row[drawn] >> 16) & 0xFF
    # monotone-ish gradient: right side brighter than left
    assert red[-1] > red[0] + 40


def test_ao_darkens():
    mvp = _cam()
    off = jnp.zeros(3, jnp.float32)
    v0, idx = _quad_mesh(0, ao=(0, 0, 0, 0))
    v3, _ = _quad_mesh(0, ao=(3, 3, 3, 3))
    c0, _ = render_vertex_mesh(v0, idx, jnp.int32(2), off, mvp,
                               width=W, height=H)
    c3, _ = render_vertex_mesh(v3, idx, jnp.int32(2), off, mvp,
                               width=W, height=H)
    c0 = np.asarray(c0).view(np.uint32)
    c3 = np.asarray(c3).view(np.uint32)
    m = (c0 != SKY) & (c3 != SKY)
    assert ((c0[m] >> 16) & 0xFF).mean() > ((c3[m] >> 16) & 0xFF).mean() * 2


def test_behind_camera_skipped():
    mvp = _cam()
    v, idx = _quad_mesh(0)
    # push the mesh far behind the camera via the chunk offset
    off = jnp.asarray([0.0, 0.0, 400.0], jnp.float32)
    c, _ = render_vertex_mesh(v, idx, jnp.int32(2), off, mvp,
                              width=W, height=H)
    assert (np.asarray(c).view(np.uint32) != SKY).sum() == 0
