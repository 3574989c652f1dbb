"""Pallas-fused Stage A: differential projection + culling over the whole
gather stream in one kernel.

The XLA form of ``project_and_cull`` costs ~1.0 ms at the vd12 gather cap
(131k quads) — far above the memory-bound ideal (~32 B/quad of HBM traffic
= a few tens of microseconds) because the select-heavy basis construction
materializes dozens of [N] intermediates.  This kernel streams the quad
stream through VMEM in [BR, 128] blocks and runs the *identical* jnp
arithmetic (``projection.stage_a_fields`` — shared code, not a copy) with
every intermediate in vector registers.

Everything here is standard blocked-pipeline Pallas: VMEM block specs with
trivial index maps, one small scalar-prefetch array for the camera.  No
ANY-space operands — an ANY operand costs a flat ~0.9 ms per call on this
toolchain (measured, benches/micro_fixed2.py make4/make8), which is the
raster kernel's known floor and would defeat the purpose here.

Reference scope: packet_pipeline.rs:104-294 (backface + frustum culling),
differential_projection.rs:37-82 (basis projection), rasterizer.rs:2228-2241
(sub-pixel culling) — same funnel, evaluated as one fused pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import projection as proj_ops


def geom_block_compute(q, wx, wy, wz, scalf_ref, scali_ref, base, *,
                       width, height, backface_culling,
                       subpixel_culling=True):
    """Stage-A math for one [R, 128] block of the gather stream — shared
    verbatim by the standalone geometry kernel below AND the raster
    kernel's fused next-frame geometry pass (ops/raster.py): one set of
    ops, so the two callers cannot drift.

    ``q``/``wx``/``wy``/``wz``: the block's values (already in VMEM);
    ``scalf_ref``: SMEM f32[19] (view-proj 16 + cam 3); ``scali_ref``:
    SMEM i32[2] (n_quads, skip); ``base``: the block's first global
    stream index.  Returns (valid i32, bbx i32, bby i32, dn f32, sub i32)
    blocks."""
    vpl = [[scalf_ref[4 * r + c] for c in range(4)] for r in range(4)]
    cam = (scalf_ref[16], scalf_ref[17], scalf_ref[18])
    n_quads = scali_ref[0]
    skip = scali_ref[1]
    rows = q.shape[0]
    idx = base + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )
    in_stream = (idx < n_quads) & (idx >= skip)

    dec = proj_ops.decode_quads(q)  # int32 in-kernel decode
    pr = proj_ops.stage_a_fields(
        dec, (wx, wy, wz), in_stream, vpl, cam,
        width=width, height=height, span_mode=False,
        backface_culling=backface_culling,
        subpixel_culling=subpixel_culling,
    )
    return (pr["valid"].astype(jnp.int32),
            pr["bb_x0"] | (pr["bb_x1"] << 16),
            pr["bb_y0"] | (pr["bb_y1"] << 16),
            pr["depth_near"],
            pr["subpixel"].astype(jnp.int32))


def _geom_kernel(scalf_ref, scali_ref, q_ref, wx_ref, wy_ref, wz_ref,
                 valid_ref, bbx_ref, bby_ref, dn_ref, sub_ref,
                 *, width, height, backface_culling, subpixel_culling,
                 block_rows):
    step = pl.program_id(0)
    base = step * (block_rows * 128)
    valid, bbx, bby, dn, sub = geom_block_compute(
        q_ref[:], wx_ref[:], wy_ref[:], wz_ref[:], scalf_ref, scali_ref,
        base, width=width, height=height,
        backface_culling=backface_culling,
        subpixel_culling=subpixel_culling)
    valid_ref[:] = valid
    bbx_ref[:] = bbx
    bby_ref[:] = bby
    dn_ref[:] = dn
    sub_ref[:] = sub


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "backface_culling", "subpixel_culling", "interpret"))
def project_cull_pallas(quads, quad_world, n_quads, view_proj, cam_pos, *,
                        width: int, height: int,
                        backface_culling: bool = True,
                        subpixel_culling: bool = True,
                        interpret: bool = False,
                        skip_quads=0):
    """Fused Stage A over the gather stream (exact mode only).

    Returns a dict of flat [GQ] arrays: ``valid`` (bool), packed ``bbx`` /
    ``bby`` (x0|x1<<16 / y0|y1<<16), ``depth_near`` (f32), ``subpixel``
    (i32 0/1) — the fields the production pipeline consumes.  Bit-identical
    to ``project_and_cull`` (same shared math; tested in
    tests/test_render.py).
    """
    gq = quads.shape[0]
    assert gq % 128 == 0, "gather cap must be lane-aligned"
    rows = gq // 128
    block_rows = 64
    while rows % block_rows:
        block_rows //= 2
    grid = rows // block_rows

    bcast = jax.lax.bitcast_convert_type
    scalf = jnp.concatenate([
        view_proj.astype(jnp.float32).reshape(16),
        cam_pos.astype(jnp.float32),
    ])
    scali = jnp.stack([jnp.asarray(n_quads, jnp.int32),
                       jnp.asarray(skip_quads, jnp.int32)])

    kernel = functools.partial(
        _geom_kernel, width=width, height=height,
        backface_culling=backface_culling,
        subpixel_culling=subpixel_culling, block_rows=block_rows,
    )
    blk = lambda: pl.BlockSpec((block_rows, 128), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[blk() for _ in range(4)],
        out_specs=[blk() for _ in range(5)],
        scratch_shapes=[],
    )
    q2 = bcast(quads, jnp.int32).reshape(rows, 128)
    wx, wy, wz = (w.reshape(rows, 128) for w in quad_world)
    valid, bbx, bby, dn, sub = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(scalf, scali, q2, wx, wy, wz)
    return dict(
        valid=valid.reshape(gq) != 0,
        bbx=bbx.reshape(gq),
        bby=bby.reshape(gq),
        depth_near=dn.reshape(gq),
        subpixel=sub.reshape(gq),
    )
