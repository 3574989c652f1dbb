"""Microbench: where do the ~2 us/tile of empty-stream fixed cost live?

Kernel variants over the same 736x1280 out grid (450 16x128 tiles, tps=2):
  A: write constant accumulators only
  B: A + tile_geo SMEM reads + conditional first DMA start
  C: B + the fori(nblocks)/while machinery compiled in (still 0 blocks)
  D: the real kernel with zero counts (baseline)
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from differential_projection_voxel_renderer_tpu.ops import raster as R

H, W, TH = 736, 1280, 16
TILES_Y, TILES_X = H // TH, W // 128
TPS = 2
STEPS_X = TILES_X // TPS
N_TILES = TILES_Y * TILES_X
TK = 98304
BLOCK_Q = R.BLOCK_Q


def variant_kernel(starts_ref, counts_ref, rows_ref, zmin_ref, rec_hbm,
                   color_ref, depth_ref, rec_vmem, rec_t, sem, *, level):
    step = pl.program_id(0)
    inff = jnp.full((8, 128), jnp.inf, jnp.float32)
    skyv = jnp.full((8, 128), R.SKY_I32, jnp.int32)

    for j in range(TPS):
        if level >= 1:
            ty = step // STEPS_X
            tx = (step % STEPS_X) * TPS + j
            t = ty * TILES_X + tx
            count = counts_ref[t]
            base = starts_ref[t]
            first_blk = base // BLOCK_Q
            last_blk = (base + jnp.maximum(count, 1) - 1) // BLOCK_Q
            nblocks = jnp.where(count > 0, last_blk - first_blk + 1, 0)

            @pl.when(nblocks > 0)
            def _(first_blk=first_blk):
                off = pl.multiple_of(first_blk * BLOCK_Q, BLOCK_Q)
                pltpu.make_async_copy(
                    rec_hbm.at[:, pl.ds(off, BLOCK_Q)],
                    rec_vmem.at[:, pl.ds(2 * j * BLOCK_Q, BLOCK_Q)],
                    sem.at[2 * j],
                ).start()
        if level >= 2:
            def body(b, carry):
                return carry

            _ = jax.lax.fori_loop(0, nblocks, body, (inff, skyv))
        for i in range(2):
            depth_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = inff
            color_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = skyv


def build(level):
    kernel = functools.partial(variant_kernel, level=level)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N_TILES // TPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st, *_: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st, *_: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, 2 * TPS * BLOCK_Q), jnp.int32),
            pltpu.VMEM((BLOCK_Q, 24), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * TPS,)),
        ],
    )

    def run(starts, counts, rows, zmin, recs):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
        )(starts, counts, rows, zmin, recs)

    return jax.jit(run)


def main():
    k = 30
    starts = jnp.zeros(N_TILES, jnp.int32)
    counts = jnp.zeros(N_TILES, jnp.int32)
    rows = jnp.zeros(TK // 8, jnp.int32)
    zmin = jnp.full(TK // 8, jnp.inf, jnp.float32)
    recs = jnp.zeros((24, TK), jnp.int32)

    for level in (0, 1, 2):
        fn = build(level)

        def rep(recs0):
            def body(i, acc):
                c, d = fn(starts, counts, rows, zmin,
                          recs0.at[23, 0].set(i))
                return acc + c[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        repj = jax.jit(rep)
        jax.block_until_ready(repj(recs))
        t0 = time.time()
        jax.block_until_ready(repj(recs))
        ms = (time.time() - t0) / k * 1000
        print(json.dumps({"variant": level, "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
