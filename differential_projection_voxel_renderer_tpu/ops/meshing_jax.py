"""Device-side meshing: exposed-face bitplane extraction + binary greedy
merge, fully on the TPU.

The host path (meshing/greedy.py + native C++) feeds the steady-state mesh
cache; this module is the TPU-native twin for on-device streaming and bulk
(re)meshing: upload raw ``uint8`` voxels, get packed quad buffers back,
no host round trip.

- ``face_masks``: the reference's ``generate_binary_masks``
  (binary_greedy.rs:286-440) as six shifted boolean compares + a bit-pack
  contraction, batched over whole chunk batches — 6 x 32 x 1024
  neighbor tests become ~20 VPU ops on [B, 32, 32, 32] tensors.

- ``greedy_merge``: the reference's sequential bit-scan merge
  (binary_greedy.rs:683-807) reorganized for the VPU: one merge STEP
  (find first set bit -> run length -> vectorized row expansion via a
  prefix-AND -> consume) executes in lockstep for EVERY (chunk, face,
  slice, type) plane simultaneously; a ``lax.scan`` iterates steps until
  the deepest plane is drained.  Emission order within a plane equals the
  reference's scan order, and planes are ordered (face, slice, type), so
  the compacted per-chunk quad stream is IDENTICAL to the host mesher's.

Everything is jnp (runs on CPU for tests); the bit ops vectorize on the
TPU VPU directly — this *is* the "bitplane sweep" kernel shape, no Pallas
needed because XLA already fuses elementwise bit arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import CHUNK_SIZE

U32 = jnp.uint32
_BITS = (2 ** np.arange(32, dtype=np.int64)).astype(np.uint32)


def solidity(blocks: jnp.ndarray) -> jnp.ndarray:
    """bool solidity from block codes (block_type.rs LUT: air=0 only)."""
    return blocks > 0


@functools.partial(jax.jit, static_argnames=())
def face_masks(blocks: jnp.ndarray, neighbor_planes: jnp.ndarray) -> jnp.ndarray:
    """Batched exposed-face bitmask extraction.

    blocks: uint8[B, 32, 32, 32] indexed [z, y, x]
    neighbor_planes: bool[B, 6, 32, 32] — the adjacent neighbor-chunk
      solidity layer per face (see meshing/face_masks.py for orientation)
    returns: uint32[B, 6, 4, 32, 32] per-(face, type) slice masks in the
      reference layout (slice, row, col-bit).
    """
    solid = solidity(blocks)
    nb = neighbor_planes

    def shift_occ(axis_positive):
        # blocks indexed [B, z, y, x]: world axis 0 = x (dim 3),
        # axis 1 = y (dim 2), axis 2 = z (dim 1)
        f, axis = axis_positive
        if axis == 0:  # x
            if f == 0:
                return jnp.concatenate([solid[:, :, :, 1:], nb[:, 0][:, :, :, None]], 3)
            return jnp.concatenate([nb[:, 1][:, :, :, None], solid[:, :, :, :-1]], 3)
        if axis == 1:  # y
            if f == 2:
                return jnp.concatenate([solid[:, :, 1:, :], nb[:, 2][:, :, None, :]], 2)
            return jnp.concatenate([nb[:, 3][:, :, None, :], solid[:, :, :-1, :]], 2)
        if f == 4:  # z
            return jnp.concatenate([solid[:, 1:, :, :], nb[:, 4][:, None, :, :]], 1)
        return jnp.concatenate([nb[:, 5][:, None, :, :], solid[:, :-1, :, :]], 1)

    exposed = [solid & ~shift_occ((f, (0, 0, 1, 1, 2, 2)[f])) for f in range(6)]

    bits_z = jnp.asarray(_BITS)[:, None, None]  # [z, 1, 1]
    bits_y = jnp.asarray(_BITS)[None, :, None]  # [1, y, 1]
    out = []
    for f in range(6):
        ex = exposed[f]
        per_type = []
        for t in range(4):
            if t == 0:
                per_type.append(jnp.zeros((blocks.shape[0], 32, 32), U32))
                continue
            m = ex & (blocks == t)
            axis = f // 2
            if axis == 0:
                # slice=x, row=y, col=z: pack over z then transpose [y,x]->[x,y]
                packed = (m.astype(U32) * bits_z[None]).sum(1)  # [B, y, x]
                per_type.append(packed.transpose(0, 2, 1))
            elif axis == 1:
                # slice=y, row=x, col=z
                packed = (m.astype(U32) * bits_z[None]).sum(1)  # [B, y, x]
                per_type.append(packed)
            else:
                # slice=z, row=x, col=y
                packed = (m.astype(U32) * bits_y[None]).sum(2)  # [B, z, x]
                per_type.append(packed)
        out.append(jnp.stack(per_type, 1))
    return jnp.stack(out, 1)  # [B, 6, 4, 32, 32]


def _ctz32(x: jnp.ndarray) -> jnp.ndarray:
    """count trailing zeros (32 for x == 0) — trailing_zeros intrinsic
    (binary_greedy.rs:698)."""
    low = x & (~x + U32(1))  # isolate lowest set bit (two's complement)
    return jnp.where(
        x == 0, jnp.uint32(32),
        jax.lax.population_count(low - U32(1)).astype(U32),
    )


@functools.partial(jax.jit, static_argnames=("max_steps",))
def greedy_merge(masks: jnp.ndarray, *, max_steps: int = 64):
    """Lockstep greedy merge over every (face, type, slice) plane.

    masks: uint32[..., 32] (any leading dims; last dim = 32 rows, bits =
      cols).  Returns (quads uint32[..., max_steps] packed as
      row | col<<5 | (width-1)<<10 | (height-1)<<16, valid bool[...,
      max_steps], overflow bool[...]).

    One scan step per plane extracts exactly the quad the reference's
    sequential loop would extract next; consumed bits are cleared so later
    steps see the updated planes (binary_greedy.rs:683-807 semantics,
    verified bit-exact by tests/test_meshing_device.py).
    """
    shape = masks.shape[:-1]
    data0 = masks.reshape(-1, 32).astype(U32)
    s = data0.shape[0]
    rows = jnp.arange(32, dtype=jnp.int32)

    def step(data, _):
        nonzero = data != 0  # [S, 32]
        any_left = nonzero.any(axis=1)
        row = jnp.argmax(nonzero, axis=1).astype(jnp.int32)  # first nonzero
        rowbits = jnp.take_along_axis(data, row[:, None], 1)[:, 0]
        col = _ctz32(rowbits)
        shifted = jnp.where(col < 32, rowbits >> col, U32(0))
        height = _ctz32(~shifted)
        # (1 << h) - 1, branch-free for h == 32 (binary_greedy.rs:709-714)
        height_mask = jnp.where(height >= 32, U32(0xFFFFFFFF),
                                (U32(1) << jnp.minimum(height, U32(31))) - U32(1))
        mask = height_mask << jnp.minimum(col, U32(31))

        # vectorized "expand while full run present": for each row r > row,
        # ok[r] = ((data[r] >> col) & hmask) == hmask; width = 1 + length of
        # the all-true prefix starting at row+1 (prefix-AND via cumprod)
        drow = jnp.where(col[:, None] < 32, data >> col[:, None], U32(0))
        ok = (drow & height_mask[:, None]) == height_mask[:, None]  # [S, 32]
        after = rows[None, :] > row[:, None]
        seq = jnp.where(after, ok, rows[None, :] == row[:, None])
        # prefix of consecutive ok rows after `row`: cumulative AND
        cum = jnp.cumsum(jnp.where(after & ~ok, 1, 0), axis=1)
        grabbed = after & ok & (cum == 0)  # rows consumed by expansion
        width = U32(1) + grabbed.sum(axis=1).astype(U32)

        clear = grabbed | (rows[None, :] == row[:, None])
        data = jnp.where(clear & any_left[:, None], data & ~mask[:, None], data)

        quad = (
            row.astype(U32)
            | (col << U32(5))
            | ((width - U32(1)) << U32(10))
            | ((height - U32(1)) << U32(16))
        )
        return data, (jnp.where(any_left, quad, U32(0)), any_left)

    data_final, (quads, valid) = jax.lax.scan(step, data0, None, length=max_steps)
    overflow = (data_final != 0).any(axis=1).reshape(shape)
    quads = jnp.moveaxis(quads, 0, -1).reshape(shape + (max_steps,))
    valid = jnp.moveaxis(valid, 0, -1).reshape(shape + (max_steps,))
    return quads, valid, overflow


@functools.partial(jax.jit, static_argnames=("max_steps", "qcap"))
def mesh_chunks_device(blocks, neighbor_planes, *, max_steps: int = 64,
                       qcap: int = 4096):
    """Full on-device meshing: voxels -> packed per-chunk quad buffers.

    blocks uint8[B, 32, 32, 32], neighbor_planes bool[B, 6, 32, 32] ->
    (quads uint32[B, qcap] in quad_format packing, counts i32[B],
     overflow i32[B]).  Emission order matches meshing/greedy.mesh_chunk.
    """
    b = blocks.shape[0]
    masks = face_masks(blocks, neighbor_planes)  # [B, 6, 4, 32, 32]
    # reorder to (face, slice, type) so the flattened stream matches the
    # host mesher's loop nesting (binary_greedy.rs:234-246)
    planes = masks.transpose(0, 1, 3, 2, 4)  # [B, face, slice, type, 32]
    quads, valid, overflow = greedy_merge(planes, max_steps=max_steps)
    # quads: [B, 6, 32, 4, max_steps]

    # attach face/slice/type bits (quad_format packing)
    face = jnp.arange(6, dtype=U32)[None, :, None, None, None]
    slice_idx = jnp.arange(32, dtype=U32)[None, None, :, None, None]
    btype = jnp.arange(4, dtype=U32)[None, None, None, :, None]
    packed = quads | (btype << U32(22)) | (slice_idx << U32(24)) | (face << U32(29))

    flat_q = packed.reshape(b, -1)
    flat_v = valid.reshape(b, -1)

    # per-chunk order-preserving compaction (cumsum + searchsorted)
    csum = jnp.cumsum(flat_v.astype(jnp.int32), axis=1)
    counts = csum[:, -1]
    targets = jnp.arange(1, qcap + 1, dtype=jnp.int32)
    src = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="left")
    )(csum).astype(jnp.int32)
    src = jnp.minimum(src, flat_q.shape[1] - 1)
    in_range = targets[None, :] <= jnp.minimum(counts, qcap)[:, None]
    out = jnp.where(in_range, jnp.take_along_axis(flat_q, src, 1), U32(0))
    q_overflow = jnp.maximum(counts - qcap, 0) + overflow.reshape(b, -1).sum(1)
    return out, jnp.minimum(counts, qcap), q_overflow.astype(jnp.int32)


# streaming batch sizes vary frame to frame (0-16 chunks at the engine's
# max_chunks_per_frame, up to 512 in bulk priming); without a shape ladder
# every new size retraces + recompiles the whole meshing program (measured
# 435 ms/frame while streaming, NOTES round 3).  Pad to these buckets —
# same trick as QuadPool.insert_many's pow2 batch ladder.
MESH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def mesh_bucket_for(b: int) -> int:
    for m in MESH_BUCKETS:
        if b <= m:
            return m
    return MESH_BUCKETS[-1]


@functools.partial(jax.jit, static_argnames=("max_steps", "qcap"))
def _mesh_chunks_jit(blocks, neighbor_planes, *, max_steps: int, qcap: int):
    """One compiled program per (bucket, qcap): meshing + the per-dir
    histogram the pool's host mirror needs, folded into the same dispatch
    so the caller fetches ONE small [B, 8] int32 array (count | overflow |
    counts6) instead of pulling the [B, qcap] quad rows to the host (the
    other half of the 435 ms/frame streaming cost: insert_rows_device used
    to download every quad row just to histogram the face-dir bits)."""
    quads, counts, overflow = mesh_chunks_device(
        blocks, neighbor_planes, max_steps=max_steps, qcap=qcap)
    dirs = (quads >> U32(29)) & U32(7)
    in_count = jnp.arange(qcap, dtype=jnp.int32)[None, :] < counts[:, None]
    c6 = jnp.stack(
        [((dirs == U32(d)) & in_count).sum(axis=1) for d in range(6)],
        axis=1,
    ).astype(jnp.int32)
    meta = jnp.concatenate(
        [counts[:, None], overflow[:, None], c6], axis=1)
    return quads, meta


def mesh_chunks_device_bucketed(blocks: np.ndarray, planes: np.ndarray, *,
                                max_steps: int = 64, qcap: int = 4096):
    """Shape-bucketed jitted front end for streaming/bulk use
    (VERDICT r4 #8).  Pads the batch to the next MESH_BUCKETS size by
    REPEATING chunk 0 (duplicate chunks mesh to identical rows, so a
    duplicate-index pool scatter stays deterministic — QuadPool's
    established padding contract) and returns
    ``(quads_dev u32[bucket, qcap], counts i32[b], overflow i32[b],
    c6 i32[b, 6], bucket)`` with the host metadata arriving in one small
    D2H fetch."""
    b = blocks.shape[0]
    assert b >= 1
    bucket = mesh_bucket_for(b)
    if bucket != b:
        rep = np.broadcast_to(blocks[0], (bucket - b,) + blocks.shape[1:])
        blocks = np.concatenate([blocks, rep])
        repp = np.broadcast_to(planes[0], (bucket - b,) + planes.shape[1:])
        planes = np.concatenate([planes, repp])
    quads, meta = _mesh_chunks_jit(
        jnp.asarray(blocks), jnp.asarray(planes),
        max_steps=max_steps, qcap=qcap)
    meta = np.asarray(meta)  # ONE [bucket, 8] fetch
    return (quads, meta[:b, 0].copy(), meta[:b, 1].copy(),
            meta[:b, 2:].copy(), bucket)


def neighbor_planes_from_batch(blocks_by_pos: dict, positions) -> np.ndarray:
    """Host helper: assemble bool[B, 6, 32, 32] neighbor planes for a batch
    of chunk positions from a {pos: uint8[32,32,32]} dict (missing
    neighbors = air)."""
    offs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    b = len(positions)
    planes = np.zeros((b, 6, CHUNK_SIZE, CHUNK_SIZE), dtype=bool)
    for i, pos in enumerate(positions):
        pos = tuple(int(c) for c in pos)
        for f, off in enumerate(offs):
            nb = blocks_by_pos.get((pos[0] + off[0], pos[1] + off[1], pos[2] + off[2]))
            if nb is None:
                continue
            s = nb > 0
            if f == 0:
                planes[i, f] = s[:, :, 0]
            elif f == 1:
                planes[i, f] = s[:, :, CHUNK_SIZE - 1]
            elif f == 2:
                planes[i, f] = s[:, 0, :]
            elif f == 3:
                planes[i, f] = s[:, CHUNK_SIZE - 1, :]
            elif f == 4:
                planes[i, f] = s[0, :, :]
            else:
                planes[i, f] = s[CHUNK_SIZE - 1, :, :]
    return planes
