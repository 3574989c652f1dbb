"""Data-format parity tests: legacy Vertex packing + batched transform
(mesh.rs:33-131, simd_vertex.rs), face packets (face_packets.rs), and the
oracle's Sutherland-Hodgman near clipper (rasterizer.rs:704-742)."""

import numpy as np
import jax.numpy as jnp

from differential_projection_voxel_renderer_tpu.meshing.face_packets import (
    PACKET_CAPACITY,
    ChunkFacePackets,
)
from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.meshing.quad_format import pack_quads
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
from differential_projection_voxel_renderer_tpu.models.vertex import (
    decompress_and_transform_vertices,
    pack_vertices,
    unpack_vertices,
)
from differential_projection_voxel_renderer_tpu.rendering.oracle import (
    clip_polygon_near,
)


def test_vertex_pack_roundtrip():
    rng = np.random.default_rng(0)
    n = 500
    x = rng.integers(0, 33, n)
    y = rng.integers(0, 33, n)
    z = rng.integers(0, 33, n)
    b = rng.integers(0, 4, n)
    light = rng.random(n).astype(np.float32)
    nd = rng.integers(0, 6, n)
    ao = rng.integers(0, 4, n)
    v = pack_vertices(x, y, z, b, light, nd, ao)
    d = unpack_vertices(v)
    np.testing.assert_array_equal(d["x"], x)
    np.testing.assert_array_equal(d["y"], y)
    np.testing.assert_array_equal(d["z"], z)
    np.testing.assert_array_equal(d["block_type"], b)
    np.testing.assert_array_equal(d["normal_index"], nd)
    np.testing.assert_array_equal(d["ao_level"], ao)
    # light quantization: (light * 255 + 0.5) as u8 (mesh.rs:72)
    np.testing.assert_array_equal(d["light"], (light * 255 + 0.5).astype(np.int32))


def test_batched_vertex_transform_matches_scalar():
    """The SIMD-vs-scalar parity test of simd_vertex.rs:213-246."""
    rng = np.random.default_rng(1)
    n = 257  # deliberately not a multiple of 8
    xs = rng.integers(0, 33, n)
    ys = rng.integers(0, 33, n)
    zs = rng.integers(0, 33, n)
    mvp = rng.standard_normal((4, 4)).astype(np.float32)
    off = np.array([64.0, -32.0, 128.0], np.float32)
    cx, cy, cz, cw = decompress_and_transform_vertices(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs),
        jnp.asarray(off), jnp.asarray(mvp),
    )
    got = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(cz), np.asarray(cw)], 1)
    world = np.stack([xs + 64.0, ys - 32.0, zs + 128.0, np.ones(n)], 1).astype(np.float32)
    expect = world @ mvp.T
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-4)


def test_face_packets_grouping():
    c = Chunk.generate_test_solid((0, 0, 0))
    quads = mesh_chunk(c)  # 6 full faces
    packets = ChunkFacePackets.from_packed_quads(quads)
    assert packets.quad_count() == len(quads)
    for face in range(6):
        total = sum(p.length for p in packets.faces[face])
        assert total == 1  # one merged 32x32 quad per face
        assert packets.faces[face][0].slice_idx_uniform() in (0, 32)


def test_face_packets_flush_at_capacity():
    """face_packets.rs:209-228: 69 quads -> packets of 32/32/5."""
    n = PACKET_CAPACITY * 2 + 5
    quads = pack_quads(
        np.arange(n) % 32, (np.arange(n) // 32) % 32,
        np.ones(n), np.ones(n), np.ones(n), np.zeros(n),
        np.full(n, 2),  # all +Y
    )
    packets = ChunkFacePackets.from_packed_quads(quads)
    lens = [p.length for p in packets.faces[2]]
    assert lens == [32, 32, 5]
    assert packets.packet_count() == 3


def test_clip_polygon_near():
    """rasterizer.rs:2571-2623 semantics: w >= eps half-space."""
    eps = 0.001
    # fully inside: unchanged
    poly = np.array([[0, 0, 0, 1], [1, 0, 0, 1], [1, 1, 0, 1]], np.float64)
    np.testing.assert_array_equal(clip_polygon_near(poly), poly)
    # fully outside: empty
    out = poly.copy()
    out[:, 3] = -1.0
    assert len(clip_polygon_near(out)) == 0
    # straddling: quad with two vertices behind -> 4-vertex polygon at w=eps
    quad = np.array(
        [[0, 0, 0, 1], [1, 0, 0, 1], [1, 0, 0, -1], [0, 0, 0, -1]], np.float64
    )
    clipped = clip_polygon_near(quad)
    assert len(clipped) == 4
    assert (clipped[:, 3] >= eps - 1e-12).all()
    assert np.isclose(clipped[:, 3].min(), eps)


def test_hardware_counters_graceful():
    """PerfCounters (perf/profiling.rs:169-278 analog) must either work or
    degrade cleanly where perf_event_open is forbidden (containers)."""
    from differential_projection_voxel_renderer_tpu.utils.profiling import (
        PerfCounters,
    )

    pc = PerfCounters()
    if not pc.available:
        assert pc.read() == {}
        return
    with pc:
        sum(i * i for i in range(10000))
    rep = pc.report()
    assert "cycles" in rep or len(rep) >= 0
    pc.close()
    assert not pc.available


def test_frame_views_pixel_target_protocol():
    """FrameSlice/FrameTile analog (PixelTarget, rasterizer.rs:53-68):
    disjoint views over one framebuffer, full-frame coordinates, strict
    depth test, exclusive rect limits (the stripe-gap convention)."""
    from differential_projection_voxel_renderer_tpu.rendering.framebuffer import (
        CountingTarget,
        Framebuffer,
    )

    fb = Framebuffer(64, 32)
    stripes = fb.split_into_stripes(4)
    assert [s.rect() for s in stripes] == [
        (0, 0, 64, 8), (0, 8, 64, 16), (0, 16, 64, 24), (0, 24, 64, 32)]
    # writes through a stripe land in the parent; out-of-band writes fail
    assert stripes[1].test_depth_and_write(5, 9, 0xFF112233, 0.5)
    assert not stripes[1].test_depth_and_write(5, 0, 0xFF112233, 0.5)
    assert fb.color[9, 5] == np.uint32(0xFF112233)
    # strict less: equal depth rejected (framebuffer.rs:325)
    assert not stripes[1].test_depth_and_write(5, 9, 0xFF445566, 0.5)
    assert stripes[1].test_depth_and_write(5, 9, 0xFF445566, 0.4)

    tiles = fb.split_into_tiles(16)
    assert len(tiles) == (64 // 16) * (32 // 16)
    areas = sum(t.w * t.h for t in tiles)
    assert areas == 64 * 32  # disjoint cover

    ct = CountingTarget(Framebuffer(8, 8))
    ct.test_depth_and_write(1, 1, 0xFF000000, 0.5)
    ct.test_depth_and_write(1, 1, 0xFF000000, 0.9)  # fails depth
    assert (ct.attempts, ct.writes) == (2, 1)
