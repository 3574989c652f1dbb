"""Differential projection tests — ports of
tests/differential_projection_tests.rs: the basis projection must match the
full per-corner MVP transform, for all 6 faces, across random quads."""

import numpy as np
import jax.numpy as jnp
import pytest

from differential_projection_voxel_renderer_tpu.meshing.quad_format import (
    pack_quads,
    quad_corners_local,
)
from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.ops import projection as P


def _random_quads(rng, n, face=None):
    u = rng.integers(0, 28, n)
    v = rng.integers(0, 28, n)
    w = rng.integers(1, 5, n)
    h = rng.integers(1, 5, n)
    b = rng.integers(1, 4, n)
    s = rng.integers(0, 32, n)
    f = rng.integers(0, 6, n) if face is None else np.full(n, face)
    return pack_quads(u, v, w, h, b, s, f)


def _camera():
    cam = Camera(np.array([16.0, 50.0, 80.0]), 16.0 / 9.0)
    cam.look_at(np.array([16.0, 0.0, 16.0]))
    return cam


def test_differential_equals_full_mvp_all_faces():
    """origin + u*T + v*B == vp @ corner, within f32 tolerance
    (differential_projection_tests.rs:78-176 uses 1e-3)."""
    rng = np.random.default_rng(3)
    cam = _camera()
    vp = cam.view_projection_matrix()
    for face in range(6):
        quads = _random_quads(rng, 100, face=face)
        dec = P.decode_quads(jnp.asarray(quads))
        wq = tuple(jnp.zeros(100, jnp.float32) for _ in range(3))
        basis = P._Basis(dec, wq, jnp.asarray(vp))
        # differential projection of corner (u1, v1)
        diff = np.stack(
            [np.asarray(basis.corner(dec["u1"], dec["v1"], r)) for r in range(4)],
            axis=1,
        )
        # full MVP of the same corner
        corners = quad_corners_local(quads)[:, 2, :]  # (u1, v1) corner
        hom = np.concatenate([corners, np.ones((100, 1))], axis=1).astype(np.float32)
        full = hom @ vp.T.astype(np.float32)
        np.testing.assert_allclose(diff, full, atol=1e-3, rtol=1e-4)


def test_face_coordinate_systems_position_exact():
    """Negative faces must land on true voxel corners — the deliberate fix
    of the reference's flipped negative-face bitangents (see
    quad_format.FACE_TANGENTS notes)."""
    for face, expected in [
        (0, [17.0, 5.0, 9.0]),   # +X: ap=17, u->y=5, v->z=9
        (1, [16.0, 5.0, 9.0]),   # -X: ap=16 (slice 16)
        (2, [5.0, 17.0, 9.0]),   # +Y
        (3, [5.0, 16.0, 9.0]),   # -Y
        (4, [5.0, 9.0, 17.0]),   # +Z: u->x=5, v->y=9
        (5, [5.0, 9.0, 16.0]),   # -Z
    ]:
        q = pack_quads([5], [9], [1], [1], [3], [16], [face])
        c00 = quad_corners_local(q)[0, 0]
        np.testing.assert_array_equal(c00, expected)


def test_backface_culling_plane_side():
    """Camera above a +Y face sees it; below, it's culled (the exact
    plane-side test replacing rasterizer.rs:1278-1286's NDC cross)."""
    q = jnp.asarray(pack_quads([0], [0], [32], [32], [3], [15], [2]))  # +Y at y=16
    chunk_pos = jnp.zeros((1, 3), jnp.int32)
    for cam_y, expect in [(50.0, True), (-50.0, False)]:
        cam = Camera(np.array([16.0, cam_y, 16.0]), 1.0)
        cam.look_at(np.array([16.0, 16.0, 16.1]))
        vp = jnp.asarray(cam.view_projection_matrix())
        tables = P.view_tables(vp, jnp.asarray(cam.position))
        wq = tuple(jnp.zeros(1, jnp.float32) for _ in range(3))
        out = P.project_and_cull(
            q, wq, jnp.ones(1, bool), tables,
            width=128, height=128,
        )
        assert bool(out["valid"][0]) == expect, (cam_y, expect)


def test_frustum_culls_offscreen_quads():
    cam = Camera(np.array([16.0, 16.0, 100.0]), 1.0)  # looking -Z at chunk
    vp = jnp.asarray(cam.view_projection_matrix())
    tables = P.view_tables(vp, jnp.asarray(cam.position))
    # one chunk at origin (visible), one far to the side (offscreen)
    chunk_pos = jnp.asarray([[0, 0, 0], [100, 0, 0]], jnp.int32)
    world = chunk_pos.astype(jnp.float32) * 32.0
    wq = tuple(world[:, a] for a in range(3))
    q = jnp.asarray(
        np.concatenate(
            [pack_quads([0], [0], [32], [32], [3], [16], [4])] * 2  # +Z faces
        )
    )
    out = P.project_and_cull(
        q, wq, jnp.ones(2, bool), tables, width=128, height=128,
    )
    assert bool(out["valid"][0])
    assert not bool(out["valid"][1])


def test_near_crossing_quads_conservatively_kept():
    """Quads straddling the near plane keep a full-screen bbox
    (main.rs:453-458 semantics)."""
    cam = Camera(np.array([16.0, 16.0, 16.0]), 1.0)  # inside the chunk
    cam.look_at(np.array([16.0, 16.0, -100.0]))
    vp = jnp.asarray(cam.view_projection_matrix())
    tables = P.view_tables(vp, jnp.asarray(cam.position))
    # +Y face right under the camera, spanning behind and in front
    q = jnp.asarray(pack_quads([0], [0], [32], [32], [3], [9], [2]))
    wq = tuple(jnp.zeros(1, jnp.float32) for _ in range(3))
    out = P.project_and_cull(
        q, wq, jnp.ones(1, bool), tables,
        width=128, height=128,
    )
    assert bool(out["any_behind"][0])
    assert bool(out["valid"][0])
    assert int(out["bb_x0"][0]) == 0 and int(out["bb_x1"][0]) == 127


def test_compact_stream_preserves_order_and_reports_overflow():
    valid = jnp.asarray([True, False, True, True, False, True])
    payload = jnp.arange(6, dtype=jnp.int32) * 10
    count, overflow, (out,) = P.compact_stream(valid, 3, (payload,))
    assert int(count) == 3
    assert int(overflow) == 1
    np.testing.assert_array_equal(np.asarray(out), [0, 20, 30])
