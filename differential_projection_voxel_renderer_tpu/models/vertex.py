"""Legacy packed vertex format + batched vertex transform.

Reference: the 8-byte compressed Vertex (src/meshing/mesh.rs:33-131 — u8
local coords, block type, quantized light, packed normal/AO) and the AVX2
batch transform that decompresses 8 vertices per iteration through the MVP
(src/rendering/simd_vertex.rs:62-205).  The reference marks this path
deprecated in favor of TinyQuads; we keep it for API parity and because the
batched transform is the natural warm-up benchmark for the VPU (the
reference's "~1.3 ns/vertex" headline, README.md:15).

TPU-first: vertices are an SoA of arrays; the "SIMD transform" is just the
differential-projection einsum applied to the whole batch at once — there
is no 8-wide loop because the VPU lane width IS the batch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def pack_vertices(x, y, z, block_type, light, normal_dir, ao_level) -> np.ndarray:
    """Pack vertex fields into the reference's 8-byte layout (mesh.rs:46-86)
    as a uint64 array: x|y|z|block|light|packed|pad16."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    z = np.asarray(z, np.uint64)
    b = np.asarray(block_type, np.uint64)
    light_u8 = np.clip(np.asarray(light, np.float32), 0, 1) * 255.0 + 0.5
    l = light_u8.astype(np.uint64)
    packed = (np.asarray(normal_dir, np.uint64) & 0x7) | (
        (np.asarray(ao_level, np.uint64) & 0x3) << np.uint64(3)
    )
    return (
        x | (y << np.uint64(8)) | (z << np.uint64(16)) | (b << np.uint64(24))
        | (l << np.uint64(32)) | (packed << np.uint64(40))
    )


def unpack_vertices(v: np.ndarray) -> dict[str, np.ndarray]:
    v = np.asarray(v, np.uint64)
    return dict(
        x=(v & np.uint64(0xFF)).astype(np.int32),
        y=((v >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int32),
        z=((v >> np.uint64(16)) & np.uint64(0xFF)).astype(np.int32),
        block_type=((v >> np.uint64(24)) & np.uint64(0xFF)).astype(np.int32),
        light=((v >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32),
        normal_index=((v >> np.uint64(40)) & np.uint64(0x7)).astype(np.int32),
        ao_level=((v >> np.uint64(43)) & np.uint64(0x3)).astype(np.int32),
    )


@jax.jit
def decompress_and_transform_vertices(xs, ys, zs, chunk_offset, mvp):
    """Batched vertex decompress + MVP transform
    (simd_vertex.rs:62-205 — u8 local coords + chunk offset through the
    4x4, 8/iteration with broadcast matrix columns; here the whole batch in
    one shot, SoA in / SoA out).

    xs/ys/zs: int arrays of local coords; chunk_offset f32[3]; mvp f32[4,4].
    Returns (cx, cy, cz, cw) f32 arrays — clip-space components.
    """
    x = xs.astype(jnp.float32) + chunk_offset[0]
    y = ys.astype(jnp.float32) + chunk_offset[1]
    z = zs.astype(jnp.float32) + chunk_offset[2]
    out = []
    for r in range(4):
        out.append(mvp[r, 0] * x + mvp[r, 1] * y + mvp[r, 2] * z + mvp[r, 3])
    return tuple(out)
