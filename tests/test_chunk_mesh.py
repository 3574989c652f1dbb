"""ChunkMesh / FaceList data-model tests — the reference's mesh.rs suite
(slice_pos round-trip mesh.rs:753-889, winding-vs-normal meshing_tests.rs,
AABB growth mesh.rs:389-405) over the packed quad word."""

import numpy as np
import pytest

from differential_projection_voxel_renderer_tpu.meshing.chunk_mesh import (
    ChunkMesh,
    corner_winding,
    winding_normal,
)
from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.meshing.quad_format import (
    FACE_NORMALS,
    axis_pos,
    unpack_quads,
)
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk


def test_add_quad_slice_round_trip():
    """Positive faces store axis_pos-1; axis_pos() reconstitutes the plane
    (mesh.rs:489-523 + 753-889)."""
    for face in range(6):
        for plane in (1, 7, 32) if face in (0, 2, 4) else (0, 7, 31):
            m = ChunkMesh((0, 0, 0))
            m.add_quad(face, 2, 3, 4, 5, 1, plane)
            q = m.packed()
            assert len(q) == 1
            dec = unpack_quads(q)
            assert int(axis_pos(dec["face"], dec["slice_idx"])[0]) == plane


def test_from_quads_round_trip_and_buckets():
    chunk = Chunk.generate_terrain((0, 0, 0))
    quads = mesh_chunk(chunk)
    m = ChunkMesh.from_quads((0, 0, 0), quads)
    assert m.quad_count() == len(quads)
    # the flat view preserves every quad (as a multiset)
    assert sorted(m.packed().tolist()) == sorted(quads.tolist())
    # buckets are homogeneous in (face, slice)
    for f, fl in enumerate(m.faces):
        for sl in range(32):
            if len(fl.slices[sl]) == 0:
                continue
            dec = unpack_quads(fl.slices[sl])
            assert (dec["face"] == f).all()
            assert (dec["slice_idx"] == sl).all()


def test_face_aabb_contains_face_corners():
    chunk = Chunk.generate_terrain((1, 0, -2))
    m = ChunkMesh.from_quads((1, 0, -2), mesh_chunk(chunk))
    for f in range(6):
        if m.faces[f].is_empty():
            continue
        lo, hi = m.local_aabb(f)
        world = m.corners_world(f).reshape(-1, 3)
        local = world - (m.position * 32).astype(np.float32)
        assert (local.min(0) >= lo - 1e-5).all()
        assert (local.max(0) <= hi + 1e-5).all()
    # whole-mesh AABB stays inside the 32^3 chunk cube
    lo, hi = m.local_aabb()
    assert (lo >= 0).all() and (hi <= 32).all()


def test_winding_normal_matches_face_normal():
    """CCW corner order per face dir agrees with the face normal
    (meshing_tests.rs winding-vs-normal)."""
    for face in range(6):
        m = ChunkMesh((0, 0, 0))
        m.add_quad(face, 1, 2, 3, 4, 2, 8)
        corners = m.corners_world(face)[0]
        n = winding_normal(corners, face)
        np.testing.assert_allclose(n, FACE_NORMALS[face], atol=1e-6)
        assert len(set(corner_winding(face).tolist())) == 4


def test_empty_mesh():
    m = ChunkMesh.from_quads((0, 0, 0), np.empty(0, np.uint32))
    assert m.is_empty()
    assert m.local_aabb() is None
    assert m.packed().shape == (0,)
    assert m.corners_world().shape == (0, 4, 3)
