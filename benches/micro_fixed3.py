"""Microbench 3: bisect the real kernel's ~0.93 ms empty-stream floor.

Replicates rasterize_pallas's exact grid spec (ANY inputs, persistent SMEM
scratch, one-time metadata DMA) and strips the body in stages, all with
zero tile counts:

  v0_outs     : outs written, nothing else (metadata DMA compiled out)
  v1_metadma  : + the one-time 4-array HBM->SMEM metadata DMA at step 0
  v2_geo      : + tile_geo SMEM reads + conditional first-block DMA starts
  v3_real     : the actual production kernel (raster0 baseline)
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
N_OCT = TK // 8
BLOCK_Q = R.BLOCK_Q


def kernel(starts_hbm, counts_hbm, rows_hbm, zmin_hbm, rec_hbm,
           color_ref, depth_ref,
           starts_ref, counts_ref, rows_ref, zmin_ref,
           rec_vmem, rec_t, sem, meta_sem, *, level):
    step = pl.program_id(0)
    inff = jnp.full((8, 128), jnp.inf, jnp.float32)
    skyv = jnp.full((8, 128), R.SKY_I32, jnp.int32)

    if level >= 1:
        metas = ((starts_hbm, starts_ref), (counts_hbm, counts_ref),
                 (rows_hbm, rows_ref), (zmin_hbm, zmin_ref))

        @pl.when(step == 0)
        def _():
            for i, (src, dst) in enumerate(metas):
                pltpu.make_async_copy(src, dst, meta_sem.at[i]).start()
            for i, (src, dst) in enumerate(metas):
                pltpu.make_async_copy(src, dst, meta_sem.at[i]).wait()

    for j in range(TPS):
        if level >= 2:
            ty = step // STEPS_X
            tx = (step % STEPS_X) * TPS + j
            t = ty * TILES_X + tx
            count = counts_ref[t]
            base = starts_ref[t]
            first_blk = base // BLOCK_Q
            last_blk = (base + jnp.maximum(count, 1) - 1) // BLOCK_Q
            nblocks = jnp.where(count > 0, last_blk - first_blk + 1, 0)

            @pl.when(nblocks > 0)
            def _(first_blk=first_blk, j=j):
                off = pl.multiple_of(first_blk * BLOCK_Q, BLOCK_Q)
                pltpu.make_async_copy(
                    rec_hbm.at[:, pl.ds(off, BLOCK_Q)],
                    rec_vmem.at[:, pl.ds(2 * j * BLOCK_Q, BLOCK_Q)],
                    sem.at[2 * j],
                ).start()
        for i in range(TH // 8):
            depth_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = inff
            color_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = skyv


def build(level):
    if level >= 3:
        def run(starts, counts, rows, zmin, recs):
            return R.rasterize_pallas(recs, starts, counts, rows, zmin,
                                      height=720, width=W, tile_h=TH,
                                      tile_w=128, out_h=H)
        return jax.jit(run)

    k = functools.partial(kernel, level=level)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N_TILES // TPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((N_TILES,), jnp.int32),
            pltpu.SMEM((N_TILES,), jnp.int32),
            pltpu.SMEM((N_OCT,), jnp.int32),
            pltpu.SMEM((N_OCT,), jnp.float32),
            pltpu.VMEM((24, 2 * TPS * BLOCK_Q), jnp.int32),
            pltpu.VMEM((BLOCK_Q, 24), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * TPS,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    def run(starts, counts, rows, zmin, recs):
        return pl.pallas_call(
            k,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
        )(starts, counts, rows, zmin, recs)

    return jax.jit(run)


def main():
    reps = 30
    starts = jnp.zeros(N_TILES, jnp.int32)
    counts = jnp.zeros(N_TILES, jnp.int32)
    rows = jnp.zeros(N_OCT, jnp.int32)
    zmin = jnp.full(N_OCT, jnp.inf, jnp.float32)
    recs = jnp.zeros((24, TK), jnp.int32)

    for level in (0, 1, 2, 3):
        fn = build(level)

        def rep(recs0):
            def body(i, acc):
                c, d = fn(starts, counts, rows, zmin,
                          recs0.at[23, 0].set(i))
                return acc + c[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        repj = jax.jit(rep)
        jax.block_until_ready(repj(recs))
        t0 = time.time()
        jax.block_until_ready(repj(recs))
        ms = (time.time() - t0) / reps * 1000
        print(json.dumps({"variant": level, "ms": round(ms, 4)}), flush=True)




def build_h(variant):
    """Signature-bisect variants of v0 (body: outs only)."""
    smem_oct = pltpu.SMEM((N_OCT,), jnp.int32)
    smem_octf = pltpu.SMEM((N_OCT,), jnp.float32)
    if variant == "h3_vmem_oct":
        smem_oct = pltpu.VMEM((8, N_OCT // 8), jnp.int32)
        smem_octf = pltpu.VMEM((8, N_OCT // 8), jnp.float32)
    scratch = [
        pltpu.SMEM((N_TILES,), jnp.int32),
        pltpu.SMEM((N_TILES,), jnp.int32),
        smem_oct,
        smem_octf,
        pltpu.VMEM((24, 2 * TPS * BLOCK_Q), jnp.int32),
        pltpu.VMEM((BLOCK_Q, 24), jnp.int32),
        pltpu.SemaphoreType.DMA((2 * TPS,)),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    if variant == "h2_no_oct_scratch":
        scratch = scratch[:2] + scratch[4:]
    n_in = 5
    if variant == "h4_one_input":
        n_in = 1

    def k(*refs):
        color_ref, depth_ref = refs[n_in], refs[n_in + 1]
        inff = jnp.full((8, 128), jnp.inf, jnp.float32)
        skyv = jnp.full((8, 128), R.SKY_I32, jnp.int32)
        for j in range(TPS):
            for i in range(TH // 8):
                depth_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = inff
                color_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = skyv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N_TILES // TPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
        out_specs=[
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, 128 * TPS),
                         lambda st: (st // STEPS_X, st % STEPS_X),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )

    def run(starts, counts, rows, zmin, recs):
        ins = (starts, counts, rows, zmin, recs)[:n_in]
        return pl.pallas_call(
            k,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
        )(*ins)

    return jax.jit(run)


def main_h():
    reps = 30
    starts = jnp.zeros(N_TILES, jnp.int32)
    counts = jnp.zeros(N_TILES, jnp.int32)
    rows = jnp.zeros(N_OCT, jnp.int32)
    zmin = jnp.full(N_OCT, jnp.inf, jnp.float32)
    recs = jnp.zeros((24, TK), jnp.int32)

    for variant in ("h0_base", "h1_static_recs", "h2_no_oct_scratch",
                    "h3_vmem_oct", "h4_one_input"):
        fn = build_h(variant)

        def rep(recs0, starts0):
            def body(i, acc):
                if variant == "h1_static_recs":
                    c, d = fn(starts0.at[0].set(i), counts, rows, zmin,
                              recs0)
                else:
                    c, d = fn(starts0, counts, rows, zmin,
                              recs0.at[23, 0].set(i))
                return acc + c[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        repj = jax.jit(rep)
        jax.block_until_ready(repj(recs, starts))
        t0 = time.time()
        jax.block_until_ready(repj(recs, starts))
        ms = (time.time() - t0) / reps * 1000
        print(json.dumps({"variant": variant, "ms": round(ms, 4)}),
              flush=True)


if __name__ == "__main__" and os.environ.get("H_VARIANTS"):
    main_h()
elif __name__ == "__main__":
    main()
