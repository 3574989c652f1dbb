"""Device mesher vs host mesher: bit-exact equality (the SIMD-vs-scalar
parity pattern, SURVEY.md section 4 item 2, applied to the meshing path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from differential_projection_voxel_renderer_tpu.meshing.greedy import (
    greedy_mesh_slice,
    mesh_chunk,
    slice_masks_for_chunk,
)
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
from differential_projection_voxel_renderer_tpu.ops import meshing_jax as MJ


def test_greedy_merge_matches_host_on_random_slices():
    rng = np.random.default_rng(7)
    planes = rng.integers(0, 2**32, size=(64, 32), dtype=np.uint64).astype(np.uint32)
    # cap: worst random slices have many quads; use a large step budget
    quads, valid, overflow = MJ.greedy_merge(jnp.asarray(planes), max_steps=512)
    quads = np.asarray(quads)
    valid = np.asarray(valid)
    assert not np.asarray(overflow).any()
    for s in range(64):
        expect = greedy_mesh_slice(planes[s])
        got = []
        for k in range(512):
            if not valid[s, k]:
                continue
            q = int(quads[s, k])
            got.append((q & 0x1F, (q >> 5) & 0x1F,
                        ((q >> 10) & 0x3F) + 1, ((q >> 16) & 0x3F) + 1))
        assert got == expect, f"slice {s}"


def test_greedy_merge_overflow_reported():
    # full checkerboard: 512 quads per plane; 8-step budget overflows
    checker = np.zeros((1, 32), np.uint32)
    checker[0, ::2] = 0x55555555
    checker[0, 1::2] = 0xAAAAAAAA
    _, _, overflow = MJ.greedy_merge(jnp.asarray(checker), max_steps=8)
    assert bool(np.asarray(overflow)[0])


def test_face_masks_match_host():
    rng = np.random.default_rng(3)
    chunks = [
        Chunk.generate_terrain((0, 0, 0)),
        Chunk.varied((1, 0, 0), rng.integers(0, 4, (32, 32, 32)).astype(np.uint8)),
    ]
    chunks = [c for c in chunks if not c.is_uniform]
    blocks_by_pos = {tuple(c.position): c.dense() for c in chunks}
    positions = [c.position for c in chunks]
    planes = MJ.neighbor_planes_from_batch(blocks_by_pos, positions)
    blocks = np.stack([c.dense() for c in chunks])
    dev = np.asarray(MJ.face_masks(jnp.asarray(blocks), jnp.asarray(planes)))
    for i, c in enumerate(chunks):
        host = slice_masks_for_chunk(c, chunks)
        np.testing.assert_array_equal(dev[i], host, err_msg=f"chunk {i}")


def test_mesh_chunks_device_matches_host():
    """End-to-end: device quads == host quads, byte for byte, including
    emission order."""
    rng = np.random.default_rng(9)
    blocks = np.where(
        rng.random((32, 32, 32)) < 0.08,
        rng.integers(1, 4, (32, 32, 32)),
        0,
    ).astype(np.uint8)
    chunks = [
        Chunk.generate_terrain((0, 0, 0)),
        Chunk.varied((1, 0, 0), blocks),
        Chunk.generate_test_solid((0, 0, 1)),
    ]
    blocks_by_pos = {tuple(c.position): c.dense() for c in chunks}
    positions = [c.position for c in chunks]
    planes = MJ.neighbor_planes_from_batch(blocks_by_pos, positions)
    batch = np.stack([c.dense() for c in chunks])
    dq, dc, dovf = MJ.mesh_chunks_device(
        jnp.asarray(batch), jnp.asarray(planes), max_steps=512, qcap=16384
    )
    dq, dc = np.asarray(dq), np.asarray(dc)
    assert not np.asarray(dovf).any()
    for i, c in enumerate(chunks):
        host = mesh_chunk(c, chunks)
        host = host if host is not None else np.zeros(0, np.uint32)
        assert dc[i] == len(host), f"chunk {i} count"
        np.testing.assert_array_equal(dq[i, : dc[i]], host, err_msg=f"chunk {i}")


def test_mesh_chunks_device_overflow_truncates_in_order():
    """Over-capacity chunks keep the first qcap quads in host order and
    report the excess (never silent corruption)."""
    rng = np.random.default_rng(9)
    blocks = np.where(
        rng.random((32, 32, 32)) < 0.4,
        rng.integers(1, 4, (32, 32, 32)),
        0,
    ).astype(np.uint8)
    c = Chunk.varied((0, 0, 0), blocks)
    planes = MJ.neighbor_planes_from_batch({(0, 0, 0): blocks}, [c.position])
    dq, dc, dovf = MJ.mesh_chunks_device(
        jnp.asarray(blocks[None]), jnp.asarray(planes),
        max_steps=512, qcap=4096,
    )
    host = mesh_chunk(c, [c])
    assert int(np.asarray(dovf)[0]) == len(host) - 4096
    np.testing.assert_array_equal(np.asarray(dq)[0], host[:4096])


def test_mesh_chunks_device_bucketed_pads_and_histograms():
    """The shape-bucketed streaming front end (VERDICT r4 #8): a batch of
    3 chunks pads to bucket 4 by repeating chunk 0 (identical rows — the
    duplicate-scatter contract), returns host metadata sliced back to 3,
    and its per-dir histogram matches the host mesher's face-dir counts."""
    rng = np.random.default_rng(11)
    blocks = np.where(
        rng.random((32, 32, 32)) < 0.08,
        rng.integers(1, 4, (32, 32, 32)),
        0,
    ).astype(np.uint8)
    chunks = [
        Chunk.generate_terrain((0, 0, 0)),
        Chunk.varied((1, 0, 0), blocks),
        Chunk.generate_test_solid((0, 0, 1)),
    ]
    blocks_by_pos = {tuple(c.position): c.dense() for c in chunks}
    positions = [c.position for c in chunks]
    planes = MJ.neighbor_planes_from_batch(blocks_by_pos, positions)
    batch = np.stack([c.dense() for c in chunks])
    quads, counts, overflow, c6, bucket = MJ.mesh_chunks_device_bucketed(
        batch, planes, max_steps=512, qcap=16384)
    assert bucket == 4 and quads.shape == (4, 16384)
    assert counts.shape == (3,) and c6.shape == (3, 6)
    assert not overflow.any()
    q = np.asarray(quads)
    # the pad row is chunk 0's row, byte for byte
    np.testing.assert_array_equal(q[3], q[0])
    for i, c in enumerate(chunks):
        host = mesh_chunk(c, chunks)
        host = host if host is not None else np.zeros(0, np.uint32)
        assert counts[i] == len(host), f"chunk {i} count"
        np.testing.assert_array_equal(q[i, : counts[i]], host)
        dirs = (host.astype(np.uint64) >> 29) & 7
        expect6 = np.bincount(dirs.astype(np.int64), minlength=6)[:6]
        np.testing.assert_array_equal(c6[i], expect6, err_msg=f"chunk {i}")


def test_mesh_bucket_for_ladder():
    assert [MJ.mesh_bucket_for(b) for b in (1, 2, 3, 5, 16, 17, 512, 600)] \
        == [1, 2, 4, 8, 16, 32, 512, 512]
