"""Culling funnel tests: horizon culling (ports of the reference's 6
horizon test files' core invariants), occlusion buffer/pass, and Hi-Z."""

import numpy as np
import pytest

from differential_projection_voxel_renderer_tpu.meshing import native_bridge
from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.ops.culling import (
    HorizonCullingConfig,
    horizon_cull_mask,
    sort_front_to_back,
)
from differential_projection_voxel_renderer_tpu.ops.hiz import (
    HiZBuffer,
    build_pyramid,
    morton_decode,
    morton_encode,
)
from differential_projection_voxel_renderer_tpu.ops.occlusion import (
    OcclusionBuffer,
    occlusion_pass,
    project_chunk_rects,
)
from differential_projection_voxel_renderer_tpu.utils.config import CHUNK_SIZE


# ---------------------------------------------------------------- horizon


def _column_scene(cam_y=40.0, chunk_y=16.0):
    """A line of chunk centers marching away from the camera in +X."""
    n = 20
    centers = np.stack(
        [
            (np.arange(n) + 2) * np.float32(CHUNK_SIZE),
            np.full(n, chunk_y, np.float32),
            np.zeros(n, np.float32),
        ],
        axis=1,
    )
    cam = np.array([0.0, cam_y, 0.0], np.float32)
    return centers, cam


def test_horizon_close_chunks_always_kept():
    """culling.rs:79-82: chunks within min_dist_chunks never culled."""
    centers = np.array([[16.0, 0.0, 16.0], [48.0, -100.0, 0.0]], np.float32)
    cam = np.array([0.0, 50.0, 0.0], np.float32)
    keep = horizon_cull_mask(centers, cam, use_native=False)
    assert keep.all()


def test_horizon_culls_hidden_ridge():
    """Terrain above the camera: distant chunks hide behind nearer ones.
    NOTE: culling requires slope >= 0 (culling.rs:103) — only chunks at or
    above camera height are ever culled."""
    centers, cam = _column_scene(cam_y=0.0, chunk_y=40.0)
    keep = horizon_cull_mask(centers, cam, use_native=False)
    assert not keep.all()  # something culled
    assert keep[0]         # nearest ridge chunk kept


def test_horizon_high_camera_keeps_all():
    """From high above, nothing occludes anything (slopes all negative —
    culling.rs:103 requires slope >= 0 to cull)."""
    centers, cam = _column_scene(cam_y=500.0)
    keep = horizon_cull_mask(centers, cam, use_native=False)
    assert keep.all()


def test_horizon_same_height_camera():
    """Camera exactly at chunk-center height (the reference's same-height
    regression scenario): the nearest chunk is always kept, and every
    culled chunk has a kept chunk strictly nearer in the same bin whose
    top slope exceeds its center slope + margin (the invariant the
    fix-validation tests encode)."""
    centers, cam = _column_scene(cam_y=16.0)
    keep = horizon_cull_mask(centers, cam, use_native=False)
    assert keep[0]
    cfg = HorizonCullingConfig()
    d = centers - cam[None, :]
    dist = np.hypot(d[:, 0], d[:, 2])
    top = (d[:, 1] + CHUNK_SIZE / 2) / dist
    slope = d[:, 1] / dist
    margin = cfg.base_margin * (1 + dist / CHUNK_SIZE * cfg.margin_dist_factor)
    for i in np.nonzero(~keep)[0]:
        occluders = [j for j in range(i) if keep[j]
                     and top[j] > slope[i] + margin[i]]
        assert occluders, f"chunk {i} culled without a valid occluder"


def test_horizon_culled_chunk_does_not_raise_horizon():
    """Core sequential property: a culled chunk must not occlude others.
    Scene: near tall chunk, mid chunk hidden behind it, far chunk high
    above that the mid chunk would (incorrectly) hide if it raised the
    horizon."""
    cam = np.array([0.0, 10.0, 0.0], np.float32)
    centers = np.array(
        [
            [96.0, 40.0, 0.0],    # near, tall: raises horizon
            [192.0, 30.0, 0.0],   # hidden behind it -> culled
            [288.0, 150.0, 0.0],  # far but high: must stay visible
        ],
        np.float32,
    )
    keep = horizon_cull_mask(centers, cam, use_native=False)
    assert keep[0]
    assert keep[2], "high far chunk must not be culled by a culled chunk"


@pytest.mark.skipif(native_bridge._build_and_load() is None, reason="no native lib")
def test_horizon_native_matches_python():
    rng = np.random.default_rng(11)
    centers = rng.uniform(-400, 400, size=(300, 3)).astype(np.float32)
    cam = np.array([0.0, 30.0, 0.0], np.float32)
    order = sort_front_to_back(centers, cam)
    centers = centers[order]
    k_native = horizon_cull_mask(centers, cam, use_native=True)
    k_py = horizon_cull_mask(centers, cam, use_native=False)
    np.testing.assert_array_equal(k_native, k_py)


# -------------------------------------------------------------- occlusion


def test_occlusion_buffer_basics():
    """occlusion.rs semantics: nearer-marked cells occlude farther rects;
    epsilon prevents self-occlusion."""
    buf = OcclusionBuffer(1280, 720)
    assert not buf.is_occluded(100, 100, 200, 200, 0.5)
    buf.mark_rect(0, 0, 1279, 719, 0.3)
    assert buf.is_occluded(100, 100, 200, 200, 0.5)
    assert not buf.is_occluded(100, 100, 200, 200, 0.3)  # same depth: kept
    assert not buf.is_occluded(100, 100, 200, 200, 0.301)  # within epsilon
    # partial coverage does not occlude
    buf2 = OcclusionBuffer(1280, 720)
    buf2.mark_rect(0, 0, 600, 719, 0.1)
    assert not buf2.is_occluded(500, 100, 800, 200, 0.5)


def test_occlusion_pass_sequential_semantics():
    """Front-to-back pass: first rect occludes identical later rect; a
    culled rect must still not mark (reference marks only survivors when
    occlusion is enabled — main.rs:516-524 marks all survivors)."""
    rects = np.array(
        [[0, 0, 639, 719], [0, 0, 639, 719], [640, 0, 1279, 719]], np.int32
    )
    depths = np.array([0.2, 0.5, 0.5], np.float32)
    use_occ = np.array([True, True, True])
    keep = occlusion_pass(rects, depths, use_occ, 1280, 720, use_native=False)
    assert keep[0]
    assert not keep[1]
    assert keep[2]  # different screen region


@pytest.mark.skipif(native_bridge._build_and_load() is None, reason="no native lib")
def test_occlusion_native_matches_python():
    rng = np.random.default_rng(5)
    n = 200
    x0 = rng.integers(-100, 1200, n)
    y0 = rng.integers(-100, 700, n)
    rects = np.stack(
        [x0, y0, x0 + rng.integers(10, 400, n), y0 + rng.integers(10, 400, n)],
        axis=1,
    ).astype(np.int32)
    depths = rng.random(n).astype(np.float32)
    use_occ = rng.random(n) < 0.8
    kn = occlusion_pass(rects, depths, use_occ, 1280, 720, use_native=True)
    kp = occlusion_pass(rects, depths, use_occ, 1280, 720, use_native=False)
    np.testing.assert_array_equal(kn, kp)


def test_project_chunk_rects_behind_camera_full_screen():
    cam = Camera(np.array([16.0, 16.0, 16.0], np.float32), 16 / 9)
    cam.look_at(np.array([100.0, 16.0, 16.0]))
    vp = cam.view_projection_matrix()
    centers = np.array([[16.0, 16.0, 16.0]], np.float32)  # chunk around cam
    rects, near, offscreen = project_chunk_rects(centers, vp, 1280, 720)
    assert (rects[0] == [0, 0, 1279, 719]).all()
    assert near[0] == 0.0
    assert not offscreen[0]


# -------------------------------------------------------------------- HiZ


def test_hiz_pyramid_min_pool():
    depth = np.full((64, 64), 10.0, np.float32)
    depth[8:16, 8:16] = 0.25
    l1, l2 = build_pyramid(np.asarray(depth))
    l1 = np.asarray(l1)
    l2 = np.asarray(l2)
    assert l1.shape == (8, 8)
    assert l1[1, 1] == 0.25
    assert l1[0, 0] == 10.0
    assert l2.shape == (1, 1)
    assert l2[0, 0] == 0.25


def test_hiz_occlusion_queries():
    hiz = HiZBuffer(256, 256)
    depth = np.full((256, 256), 0.2, np.float32)
    hiz.from_depth(depth)
    assert hiz.is_occluded(10, 10, 100, 100, 0.5)
    assert not hiz.is_occluded(10, 10, 100, 100, 0.1)
    hiz.clear()
    assert not hiz.is_occluded(10, 10, 100, 100, 0.5)
    hiz.update_region(0, 0, 255, 255, 0.05)
    assert hiz.is_occluded(10, 10, 100, 100, 0.5)


def test_morton_roundtrip():
    """hiz_buffer.rs:300+ tests: encode/decode roundtrip + locality."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 15, 1000).astype(np.uint32)
    y = rng.integers(0, 1 << 15, 1000).astype(np.uint32)
    m = morton_encode(x, y)
    dx, dy = morton_decode(m)
    np.testing.assert_array_equal(dx, x)
    np.testing.assert_array_equal(dy, y)
    assert int(morton_encode(0, 0)) == 0
    assert int(morton_encode(1, 0)) == 1
    assert int(morton_encode(0, 1)) == 2
    assert int(morton_encode(1, 1)) == 3
