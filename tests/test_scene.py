"""Scene/state layer tests — ports of the reference's unit tests for
world, chunk, and camera (src/world.rs:217-325, src/voxel/chunk.rs,
src/camera/mod.rs:186-212)."""

import numpy as np
import pytest

from differential_projection_voxel_renderer_tpu.models.block_type import BlockType
from differential_projection_voxel_renderer_tpu.models.camera import Camera, Frustum
from differential_projection_voxel_renderer_tpu.models.chunk import (
    Chunk,
    coords_to_index,
    index_to_coords,
    sample_terrain_height,
)
from differential_projection_voxel_renderer_tpu.models.world import (
    World,
    WorldConfig,
    world_to_chunk_pos,
)


# ---------------------------------------------------------------- chunk


def test_coords_index_roundtrip():
    for idx in [0, 1, 31, 32, 1023, 1024, 32767]:
        x, y, z = index_to_coords(idx)
        assert coords_to_index(x, y, z) == idx
    assert coords_to_index(1, 2, 3) == 3 * 1024 + 2 * 32 + 1


def test_uniform_chunk_set_block_converts():
    c = Chunk.uniform((0, 0, 0), BlockType.AIR)
    assert c.is_uniform
    assert c.get_block(5, 5, 5) == BlockType.AIR
    c.set_block(5, 5, 5, BlockType.STONE)
    assert not c.is_uniform
    assert c.get_block(5, 5, 5) == BlockType.STONE
    assert c.get_block(0, 0, 0) == BlockType.AIR


def test_terrain_determinism_and_layering():
    c1 = Chunk.generate_terrain((0, 0, 0))
    c2 = Chunk.generate_terrain((0, 0, 0))
    assert c1.is_uniform == c2.is_uniform
    if not c1.is_uniform:
        np.testing.assert_array_equal(c1.data, c2.data)
    # layering invariant per column: air above grass above dirt above stone
    # (chunk.rs:151-161)
    if not c1.is_uniform:
        d = c1.dense()
        for z in range(0, 32, 7):
            for x in range(0, 32, 7):
                col = d[z, :, x]
                h = sample_terrain_height(x, z)
                wy = np.arange(32)
                expected = np.where(
                    wy > h, 0, np.where(wy == h, 1, np.where(wy > h - 3, 2, 3))
                )
                np.testing.assert_array_equal(col, expected)


def test_terrain_uniform_early_out():
    # far above terrain: all air; far below: all stone (chunk.rs:127-134)
    sky = Chunk.generate_terrain((0, 5, 0))
    assert sky.is_uniform and sky.uniform_block_type() == BlockType.AIR
    under = Chunk.generate_terrain((0, -5, 0))
    assert under.is_uniform and under.uniform_block_type() == BlockType.STONE


def test_terrain_height_range():
    xs = np.arange(-500, 500, 13)
    hs = sample_terrain_height(xs, xs * 3 + 7)
    assert hs.min() >= -20 and hs.max() <= 20
    assert hs.std() > 1.0  # actually varies


# ---------------------------------------------------------------- world


def test_world_to_chunk_pos():
    assert world_to_chunk_pos([0, 0, 0]) == (0, 0, 0)
    assert world_to_chunk_pos([16.0, 16.0, 16.0]) == (0, 0, 0)
    assert world_to_chunk_pos([32.0, 32.0, 32.0]) == (1, 1, 1)
    assert world_to_chunk_pos([-1.0, -1.0, -1.0]) == (-1, -1, -1)


def test_world_generation_region():
    w = World(WorldConfig(view_distance=2))
    w.generate_region((0, 0, 0), (2, 2, 2))
    assert w.chunk_count() == 27


def test_view_distance_culling():
    w = World(WorldConfig(view_distance=1))
    w.generate_region((-5, -5, -5), (5, 5, 5))
    total = w.chunk_count()
    visible = w.get_visible_chunks(np.zeros(3))
    assert len(visible) < total
    assert len(visible) >= 7
    before = len(visible)
    w.set_view_distance(2)
    assert len(w.get_visible_chunks(np.zeros(3))) >= before


def test_update_streams_until_view_filled():
    """Port of world.rs:276-324."""
    w = World(WorldConfig(view_distance=2, frustum_culling=False, max_chunks_per_frame=3))
    cam = np.zeros(3)
    cc = world_to_chunk_pos(cam)
    expected = set()
    vd = 2
    for cx in range(cc[0] - vd, cc[0] + vd + 1):
        for cy in range(cc[1] - vd, cc[1] + vd + 1):
            for cz in range(cc[2] - vd, cc[2] + vd + 1):
                if (cx - cc[0]) ** 2 + (cy - cc[1]) ** 2 + (cz - cc[2]) ** 2 <= vd * vd:
                    expected.add((cx, cy, cz))
    iters = (len(expected) + 2) // 3 + 1
    for _ in range(iters):
        w.update(cam)
    assert set(w.chunks.keys()) == expected


def test_update_unloads_with_hysteresis():
    w = World(WorldConfig(view_distance=1, max_chunks_per_frame=1000))
    w.generate_region((-8, 0, 0), (8, 0, 0))
    w.update(np.zeros(3))
    for pos in w.chunks:
        d2 = pos[0] ** 2 + pos[1] ** 2 + pos[2] ** 2
        assert d2 <= 9  # vd + 2 = 3


# --------------------------------------------------------------- camera


def test_frustum_culls_box_behind_camera():
    """Port of camera/mod.rs:190-212."""
    cam = Camera(np.zeros(3), 16.0 / 9.0)
    fr = cam.extract_frustum()
    assert fr.intersects_aabb([-1, -1, -10], [1, 1, -8])
    assert not fr.intersects_aabb([-1, -1, 8], [1, 1, 10])


def test_frustum_vectorized_matches_scalar():
    cam = Camera(np.array([3.0, 4.0, 5.0]), 1.5)
    cam.look_at([10.0, 0.0, -10.0])
    fr = cam.extract_frustum()
    rng = np.random.default_rng(7)
    mins = rng.uniform(-100, 100, size=(64, 3)).astype(np.float32)
    maxs = mins + rng.uniform(1, 40, size=(64, 3)).astype(np.float32)
    vec = fr.intersects_aabb(mins, maxs)
    for i in range(64):
        assert vec[i] == fr.intersects_aabb(mins[i], maxs[i])


def test_look_at_points_camera():
    cam = Camera(np.array([0.0, 10.0, 0.0]), 1.0)
    target = np.array([5.0, 0.0, -5.0])
    cam.look_at(target)
    f = cam.forward()
    expect = (target - cam.position) / np.linalg.norm(target - cam.position)
    np.testing.assert_allclose(f, expect, atol=1e-5)


def test_camera_matrices_roundtrip():
    cam = Camera(np.array([1.0, 2.0, 3.0]), 1.25)
    cam.yaw, cam.pitch = 0.3, -0.2
    vp = cam.view_projection_matrix()
    # a point straight ahead of the camera projects to NDC center
    p = cam.position + cam.forward() * 10.0
    clip = vp @ np.array([*p, 1.0], np.float32)
    ndc = clip[:3] / clip[3]
    assert abs(ndc[0]) < 1e-4 and abs(ndc[1]) < 1e-4
    assert 0.0 < ndc[2] < 1.0


def test_pitch_clamp():
    cam = Camera(np.zeros(3), 1.0)
    cam.rotate(0.0, -1e6)
    assert cam.pitch <= np.pi / 2
    cam.rotate(0.0, 1e6)
    assert cam.pitch >= -np.pi / 2


def test_controller_moves_camera():
    from differential_projection_voxel_renderer_tpu.models.camera import CameraController

    cam = Camera(np.zeros(3), 1.0)
    ctl = CameraController()
    ctl.forward_pressed = True
    ctl.update_camera(cam, 0.5)
    # default camera looks -Z; speed 10 * dt 0.5 = 5 units
    np.testing.assert_allclose(cam.position, [0, 0, -5], atol=1e-5)


def test_set_view_distance_restarts_streaming_without_moving():
    """Raising the view distance with a STATIC camera must resume
    generation (the missing-candidate queue is invalidated): regression
    for the queue cache reusing a drained vd-N queue after vd grows."""
    from differential_projection_voxel_renderer_tpu.models.world import (
        World,
        WorldConfig,
    )

    w = World(WorldConfig(view_distance=2, max_chunks_per_frame=64))
    cam = np.array([0.0, 0.0, 0.0], np.float32)
    while w.update(cam):
        pass
    n2 = w.chunk_count()
    assert not w.update(cam)  # filled at vd 2
    w.set_view_distance(4)
    assert w.update(cam), "vd raise must restart streaming in place"
    while w.update(cam):
        pass
    assert w.chunk_count() > n2


def test_streaming_queue_equivalence_under_camera_motion():
    """The missing-candidate queue cache must not change WHAT gets
    streamed: a world updated frame-by-frame along a camera path ends
    with exactly the chunk set of a world filled from scratch at the
    final position (same vd, same hysteresis band for the stragglers)."""
    from differential_projection_voxel_renderer_tpu.models.world import (
        World,
        WorldConfig,
    )

    rng = np.random.default_rng(3)
    w = World(WorldConfig(view_distance=3, max_chunks_per_frame=7))
    cam = np.array([0.0, 0.0, 0.0], np.float32)
    for _ in range(220):
        cam = cam + rng.uniform(-9, 9, 3).astype(np.float32)
        w.update(cam)
    while w.update(cam):
        pass
    w.update(cam)  # terminal unload pass

    ref = World(WorldConfig(view_distance=3, max_chunks_per_frame=10**9))
    while ref.update(cam):
        pass
    ref_keys = set(ref.chunks)
    keys = set(w.chunks)
    # every in-sphere chunk must be present...
    assert ref_keys <= keys
    # ...and nothing may survive beyond the vd+2 hysteresis shell
    from differential_projection_voxel_renderer_tpu.models.world import (
        world_to_chunk_pos,
    )
    cc = np.asarray(world_to_chunk_pos(cam))
    extra = np.array(sorted(keys - ref_keys)).reshape(-1, 3)
    if len(extra):
        d2 = ((extra - cc) ** 2).sum(1)
        assert d2.max() <= (3 + 2) ** 2
