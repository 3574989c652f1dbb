"""Meshing semantics tests — ports of tests/meshing_tests.rs and the
binary_greedy.rs unit tests (:810-856)."""

import numpy as np
import pytest

from differential_projection_voxel_renderer_tpu.meshing import native_bridge
from differential_projection_voxel_renderer_tpu.meshing.greedy import (
    greedy_mesh_slice,
    mesh_chunk,
    mesh_from_masks,
    slice_masks_for_chunk,
)
from differential_projection_voxel_renderer_tpu.meshing.quad_format import (
    FACE_NORMALS,
    axis_pos,
    pack_quads,
    quad_corners_local,
    unpack_quads,
)
from differential_projection_voxel_renderer_tpu.models.block_type import BlockType
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk


# ------------------------------------------------------ greedy merge unit


def test_greedy_empty():
    assert greedy_mesh_slice(np.zeros(32, np.uint32)) == []


def test_greedy_single():
    rows = np.zeros(32, np.uint32)
    rows[0] = 1
    assert greedy_mesh_slice(rows) == [(0, 0, 1, 1)]


def test_greedy_vertical_line():
    rows = np.zeros(32, np.uint32)
    rows[0] = 0b1111
    assert greedy_mesh_slice(rows) == [(0, 0, 1, 4)]


def test_greedy_rectangle():
    rows = np.zeros(32, np.uint32)
    rows[:3] = 0b1111
    assert greedy_mesh_slice(rows) == [(0, 0, 3, 4)]


def test_greedy_full_slice():
    rows = np.full(32, 0xFFFFFFFF, np.uint32)
    assert greedy_mesh_slice(rows) == [(0, 0, 32, 32)]


def test_greedy_consumption_splits_later_rows():
    # row0 = 0110, row1 = 1111: quad (0,1,2,2) consumes row1's middle,
    # leaving two 1x1 quads (the reference's consuming expansion,
    # binary_greedy.rs:721-791)
    rows = np.zeros(32, np.uint32)
    rows[0] = 0b0110
    rows[1] = 0b1111
    assert greedy_mesh_slice(rows) == [(0, 1, 2, 2), (1, 0, 1, 1), (1, 3, 1, 1)]


@pytest.mark.skipif(native_bridge.greedy_mesh_masks is None, reason="no native lib")
def test_native_matches_python_on_random_masks():
    rng = np.random.default_rng(123)
    masks = rng.integers(0, 2**32, size=(6, 4, 32, 32), dtype=np.uint64).astype(np.uint32)
    # zero out the air plane: air never has faces
    masks[:, 0] = 0
    native = native_bridge.greedy_mesh_masks(masks)
    import differential_projection_voxel_renderer_tpu.meshing.greedy as G

    orig = G.native_bridge
    try:
        G.native_bridge = type("NB", (), {"greedy_mesh_masks": None})
        py = mesh_from_masks(masks)
    finally:
        G.native_bridge = orig
    np.testing.assert_array_equal(native, py)


# ------------------------------------------------------------ pack format


def test_quad_pack_roundtrip():
    rng = np.random.default_rng(0)
    n = 1000
    u = rng.integers(0, 32, n)
    v = rng.integers(0, 32, n)
    w = rng.integers(1, 33, n)
    h = rng.integers(1, 33, n)
    b = rng.integers(0, 4, n)
    s = rng.integers(0, 32, n)
    f = rng.integers(0, 6, n)
    q = pack_quads(u, v, w, h, b, s, f)
    d = unpack_quads(q)
    np.testing.assert_array_equal(d["u"], u)
    np.testing.assert_array_equal(d["v"], v)
    np.testing.assert_array_equal(d["w"], w)
    np.testing.assert_array_equal(d["h"], h)
    np.testing.assert_array_equal(d["block"], b)
    np.testing.assert_array_equal(d["slice_idx"], s)
    np.testing.assert_array_equal(d["face"], f)


def test_axis_pos_roundtrip():
    """The slice-position offset regression (mesh.rs:866-889): positive
    faces store axis_pos - 1 and must reconstruct axis_pos = slice + 1."""
    for face in range(6):
        positive = face in (0, 2, 4)
        for ap in range(1, 32) if positive else range(0, 32):
            slice_idx = ap - 1 if positive else ap
            assert int(axis_pos(face, slice_idx)) == ap


# ------------------------------------------------------- mesh semantics


def _single_voxel_chunk(x=16, y=16, z=16, block=BlockType.STONE):
    c = Chunk.uniform((0, 0, 0), BlockType.AIR)
    c.set_block(x, y, z, block)
    return c


def test_single_voxel_six_faces():
    """meshing_tests.rs: isolated voxel emits exactly 6 unit quads."""
    q = mesh_chunk(_single_voxel_chunk())
    assert len(q) == 6
    d = unpack_quads(q)
    assert sorted(d["face"].tolist()) == [0, 1, 2, 3, 4, 5]
    assert (d["w"] == 1).all() and (d["h"] == 1).all()
    # face plane positions: +X face at x=17, -X at 16, etc.
    corners = quad_corners_local(q)
    for i in range(6):
        face = int(d["face"][i])
        axisv = np.abs(FACE_NORMALS[face]).astype(bool)
        plane = corners[i][:, axisv]
        expect = 17 if face in (0, 2, 4) else 16
        assert (plane == expect).all(), (face, plane)


def test_uniform_chunk_returns_none():
    assert mesh_chunk(Chunk.uniform((0, 0, 0), BlockType.AIR)) is None
    assert mesh_chunk(Chunk.uniform((0, 0, 0), BlockType.STONE)) is None


def test_internal_faces_culled():
    """2x1x1 pair of voxels: the shared faces disappear -> 10 quads, or
    fewer with greedy merging (2 merged slabs x 4 + 2 ends = 6)."""
    c = Chunk.uniform((0, 0, 0), BlockType.AIR)
    c.set_block(10, 10, 10, BlockType.STONE)
    c.set_block(11, 10, 10, BlockType.STONE)
    q = mesh_chunk(c)
    d = unpack_quads(q)
    # +X face only at x=12, -X only at x=10
    for i in range(len(q)):
        face = int(d["face"][i])
        ap = int(axis_pos(face, d["slice_idx"][i]))
        if face == 0:
            assert ap == 12
        if face == 1:
            assert ap == 10
    # total area must equal exposed surface: 2x1x1 box = 10 unit faces
    area = (d["w"] * d["h"]).sum()
    assert area == 10
    assert len(q) == 6  # 4 merged 2x1 sides + 2 ends


def test_cross_chunk_face_culling():
    """Faces between touching chunks are culled (meshing_tests.rs
    'internal-face culling across chunks')."""
    a = Chunk.generate_test_solid((0, 0, 0))
    b = Chunk.generate_test_solid((1, 0, 0))
    qa_alone = mesh_chunk(a)
    qa = mesh_chunk(a, [a, b])
    da_alone = unpack_quads(qa_alone)
    da = unpack_quads(qa)
    # alone: all 6 full faces = 6 quads of 32x32
    assert len(qa_alone) == 6
    assert (da_alone["w"] == 32).all()
    # with +X neighbor solid: the +X face vanishes
    assert len(qa) == 5
    assert 0 not in da["face"].tolist()


def test_per_type_non_merging():
    """Different block types never merge (binary_greedy.rs:239-246)."""
    c = Chunk.uniform((0, 0, 0), BlockType.AIR)
    c.set_block(10, 10, 10, BlockType.GRASS)
    c.set_block(11, 10, 10, BlockType.DIRT)
    q = mesh_chunk(c)
    d = unpack_quads(q)
    # 12 faces total (2 voxels x 6) minus 2 shared = 10, no merging
    assert len(q) == 10
    assert (d["w"] * d["h"]).sum() == 10


def test_solid_chunk_in_sealed_world_empty():
    """A solid chunk surrounded by solid neighbors meshes to nothing."""
    center = Chunk.generate_test_solid((0, 0, 0))
    world = [center]
    for off in [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
        world.append(Chunk.generate_test_solid(off))
    assert mesh_chunk(center, world) is None


def test_terrain_quad_budget():
    """Terrain chunks stay well under the per-chunk capacity."""
    from differential_projection_voxel_renderer_tpu.utils.config import QUADS_PER_CHUNK_CAP

    for pos in [(0, 0, 0), (0, -1, 0), (3, 0, -2)]:
        c = Chunk.generate_terrain(pos)
        if c.is_uniform:
            continue
        q = mesh_chunk(c)
        if q is not None:
            assert len(q) < QUADS_PER_CHUNK_CAP


def test_stale_mesh_neighbor_scenario():
    """Ghost-face scenario (meshing_tests.rs): meshing with vs without a
    neighbor gives different border faces; remeshing with the neighbor
    present removes them."""
    a = Chunk.generate_test_solid((0, 0, 0))
    b = Chunk.generate_test_solid((1, 0, 0))
    q_alone = unpack_quads(mesh_chunk(a))
    q_with = unpack_quads(mesh_chunk(a, [a, b]))
    assert 0 in q_alone["face"].tolist()
    assert 0 not in q_with["face"].tolist()


def test_native_full_chunk_parity():
    """The fused native mesher (mask construction + merge in one C++ call,
    native/src/greedy_mesh.cpp mesh_chunk_full) emits byte-identical quad
    streams to the numpy mask path for terrain, random, and bordered
    chunks."""
    from differential_projection_voxel_renderer_tpu.meshing import (
        native_bridge,
    )
    from differential_projection_voxel_renderer_tpu.meshing.face_masks import (
        neighbor_solid_planes,
    )
    from differential_projection_voxel_renderer_tpu.meshing.greedy import (
        _neighbor_solid_grids,
        mesh_from_masks,
        slice_masks_for_chunk,
    )

    if native_bridge.mesh_chunk_full is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    chunks = [Chunk.generate_terrain((x, 0, z))
              for x in range(2) for z in range(2)]
    table = {c.position_key: c for c in chunks}
    for c in chunks:
        if c.is_uniform:
            continue
        planes = neighbor_solid_planes(_neighbor_solid_grids(c, table))
        fast = native_bridge.mesh_chunk_full(c.dense(),
                                             planes.astype(np.uint8))
        slow = mesh_from_masks(slice_masks_for_chunk(c, table))
        assert np.array_equal(fast, slow)
    for density in (0.1, 0.5, 0.9):
        blocks = (rng.random((32, 32, 32)) < density).astype(np.uint8) * \
            rng.integers(1, 4, (32, 32, 32)).astype(np.uint8)
        c = Chunk.varied((0, 0, 0), blocks)
        fast = native_bridge.mesh_chunk_full(
            c.dense(), np.zeros((6, 32, 32), np.uint8))
        slow = mesh_from_masks(slice_masks_for_chunk(c, [c]))
        assert np.array_equal(fast, slow)
