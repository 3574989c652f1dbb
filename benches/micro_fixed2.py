"""Microbench 2: pin down the pallas out-pipeline floor.

All variants write constant color+depth over a 736x1280 frame.

  a_base      : 225 steps, out blocks [16,256], 2 outs, scratch+sems (ref)
  b_noscratch : same, no scratch/sems/records input
  c_fullrow   : out blocks [16,1280] (45 steps, 10 tiles per step)
  d_tall      : out blocks [64,256] (55 steps)
  e_one_out   : single int32 output only
  f_plainset  : full-block write color_ref[:] = const (no pl.ds slices)
  g_2d_grid   : 2D grid (45, 5), out [16,256]
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

H, W = 736, 1280
SKY = np.uint32(0xFF87CEEB).astype(np.int32)


def timeit(fn, label, k=30):
    def rep(x):
        def body(i, acc):
            outs = fn(x + i)
            o = outs[0] if isinstance(outs, (tuple, list)) else outs
            return acc + o[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    repj = jax.jit(rep)
    x0 = jnp.zeros((), jnp.int32)
    jax.block_until_ready(repj(x0))
    t0 = time.time()
    jax.block_until_ready(repj(x0))
    ms = (time.time() - t0) / k * 1000
    print(json.dumps({"variant": label, "ms": round(ms, 4)}), flush=True)


def write_tiles(color_ref, depth_ref, tile_h, tps, x):
    inff = jnp.full((8, 128), jnp.inf, jnp.float32) + x.astype(jnp.float32)
    skyv = jnp.full((8, 128), SKY, jnp.int32) + x
    for j in range(tps):
        for i in range(tile_h // 8):
            if depth_ref is not None:
                depth_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = inff
            color_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = skyv


def make(label, tile_h=16, tps=2, outs=2, scratch=True, plain=False,
         grid2d=False):
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps

    def kernel(x_ref, *refs):
        x = x_ref[0]
        if outs == 2:
            color_ref, depth_ref = refs[0], refs[1]
        else:
            color_ref, depth_ref = refs[0], None
        if plain:
            color_ref[:] = jnp.full((tile_h, 128 * tps), SKY, jnp.int32) + x
            if depth_ref is not None:
                depth_ref[:] = jnp.full((tile_h, 128 * tps), jnp.inf,
                                        jnp.float32)
        else:
            write_tiles(color_ref, depth_ref, tile_h, tps, x)

    if grid2d:
        grid = (tiles_y, steps_x)
        imap = lambda i, j, *_: (i, j)
    else:
        grid = (tiles_y * steps_x,)
        imap = lambda st, *_: (st // steps_x, st % steps_x)
    out_specs = [pl.BlockSpec((tile_h, 128 * tps), imap,
                              memory_space=pltpu.VMEM)] * outs
    out_shape = [jax.ShapeDtypeStruct((H, W), jnp.int32)]
    if outs == 2:
        out_shape.append(jax.ShapeDtypeStruct((H, W), jnp.float32))
    scratch_shapes = []
    if scratch:
        scratch_shapes = [
            pltpu.VMEM((24, 2 * tps * 256), jnp.int32),
            pltpu.VMEM((256, 24), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * tps,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
        )(x.reshape(1))

    timeit(jax.jit(run), label)


if __name__ == "__main__":
    make("a_base")
    make("b_noscratch", scratch=False)
    make("c_fullrow", tps=10, scratch=False)
    make("d_tall", tile_h=64, scratch=False)
    make("e_one_out", outs=1, scratch=False)
    make("f_plainset", plain=True, scratch=False)
    make("g_2d_grid", grid2d=True, scratch=False)


def make2(label, n_scalar=4, any_input=False, set_copy=False,
          scalar_sizes=(460, 460, 12288, 12288), tk=98304):
    """Variants adding back scalar prefetch + ANY input + per-iter copy."""
    tile_h, tps = 16, 2
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps

    def kernel(*refs):
        # refs: n_scalar SMEM refs, [rec_hbm], color, depth
        base = n_scalar + (1 if any_input else 0)
        color_ref, depth_ref = refs[base], refs[base + 1]
        x = refs[0][0]
        write_tiles(color_ref, depth_ref, tile_h, tps, x)

    imap = lambda st, *_: (st // steps_x, st % steps_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(tiles_y * steps_x,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] if any_input else [],
        out_specs=[
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    scalars = [jnp.zeros(s, jnp.int32) for s in scalar_sizes[:n_scalar]]
    recs = jnp.zeros((24, tk), jnp.int32)

    def run(x):
        args = [scalars[0] + x] + scalars[1:n_scalar]
        if any_input:
            r = recs.at[23, 0].set(x) if set_copy else recs
            args.append(r)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
        )(*args)

    timeit(jax.jit(run), label)


if os.environ.get("PHASE2"):
    make2("h_scalars4", n_scalar=4, any_input=False)
    make2("i_scalars4_small", n_scalar=4, scalar_sizes=(460, 460, 512, 512))
    make2("j_any", n_scalar=4, any_input=True)
    make2("k_any_copy", n_scalar=4, any_input=True, set_copy=True)
    make2("l_scalar1", n_scalar=1, scalar_sizes=(460,))


def make3(label, mode):
    """Metadata NOT via scalar prefetch: SMEM input blocks with constant
    index maps (mode='smem'), or plain VMEM inputs (mode='vmem')."""
    tile_h, tps = 16, 2
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps
    space = pltpu.SMEM if mode == "smem" else pltpu.VMEM

    def kernel(starts_ref, counts_ref, rows_ref, zmin_ref, color_ref,
               depth_ref):
        step = pl.program_id(0)
        # touch the metadata like the real kernel does (scalar reads)
        t = step * tps
        x = counts_ref[t] + starts_ref[t]
        write_tiles(color_ref, depth_ref, tile_h, tps, x)

    imap = lambda st: (st // steps_x, st % steps_x)
    meta = lambda n: pl.BlockSpec((n,), lambda st: (0,), memory_space=space)
    grid_spec = pl.GridSpec(
        grid=(tiles_y * steps_x,),
        in_specs=[meta(460), meta(460), meta(12288), meta(12288)],
        out_specs=[
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
        ],
    )
    starts = jnp.zeros(460, jnp.int32)
    counts = jnp.zeros(460, jnp.int32)
    rows = jnp.zeros(12288, jnp.int32)
    zmin = jnp.zeros(12288, jnp.int32)

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
        )(starts.at[0].set(x), counts, rows, zmin)

    timeit(jax.jit(run), label)


if os.environ.get("PHASE3"):
    make3("m_smem_meta", "smem")
    try:
        make3("n_vmem_meta", "vmem")
    except Exception as e:
        print(json.dumps({"variant": "n_vmem_meta", "error": str(e)[:200]}))


if os.environ.get("PHASE4"):
    make2("o_tinyscalar_any", n_scalar=1, scalar_sizes=(1,), any_input=True)
    make2("p_tinyscalar_any_copy", n_scalar=1, scalar_sizes=(1,),
          any_input=True, set_copy=True)
    make2("q_tinyscalar_noany", n_scalar=1, scalar_sizes=(1,))
    make2("r_460_noany", n_scalar=1, scalar_sizes=(460,))
    make2("s_tinyscalar_any_small", n_scalar=1, scalar_sizes=(1,),
          any_input=True, tk=1024)


def make4(label, any_sizes=(), smem_scratch=(), extra_sem=False,
          read_meta=False):
    """Additive variants from a_base (0.005 ms): isolate ANY inputs vs
    SMEM scratch vs extra DMA semaphores."""
    tile_h, tps = 16, 2
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps
    n_any = len(any_sizes)

    def kernel(x_ref, *refs):
        color_ref, depth_ref = refs[n_any], refs[n_any + 1]
        x = x_ref[0]
        sref = refs[n_any + 2] if (smem_scratch and read_meta) else None
        if sref is not None:
            x = x + sref[pl.program_id(0)]
        write_tiles(color_ref, depth_ref, tile_h, tps, x)

    imap = lambda st, *_: (st // steps_x, st % steps_x)
    scratch_shapes = [
        pltpu.SMEM((n,), jnp.int32) for n in smem_scratch
    ] + [
        pltpu.VMEM((24, 2 * tps * 256), jnp.int32),
        pltpu.VMEM((256, 24), jnp.int32),
        pltpu.SemaphoreType.DMA((2 * tps,)),
    ]
    if extra_sem:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((4,)))
    # put SMEM scratch refs after outs in kernel signature order:
    # (scalars, ins, outs, scratch) — scratch comes last
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y * steps_x,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_any,
        out_specs=[
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )
    anys = [jnp.zeros(s, jnp.int32) for s in any_sizes]

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
        )(x.reshape(1), *anys)

    timeit(jax.jit(run), label)


if os.environ.get("PHASE4"):
    make4("m_base")
    make4("n_any1_small", any_sizes=(460,))
    make4("o_any5_big", any_sizes=(460, 460, 12288, 12288, 24 * 98304))
    make4("p_smem_small", smem_scratch=(460, 460))
    make4("q_smem_big", smem_scratch=(460, 460, 12288, 12288))
    make4("r_extra_sem", extra_sem=True)
    make4("s_smem_read", smem_scratch=(460, 460), read_meta=True)


if os.environ.get("PHASE4M"):
    make4("m_base_alone")
    make("a_base_after")


if os.environ.get("SOLO"):
    v = os.environ["SOLO"]
    if v == "f1_any_big":
        make4("f1_any_big", any_sizes=(24 * 98304,))
    elif v == "f2_any_small":
        make4("f2_any_small", any_sizes=(256,))
    elif v == "f3_smem_small":
        make4("f3_smem_small", smem_scratch=(460, 460))
    elif v == "f4_smem_big":
        make4("f4_smem_big", smem_scratch=(12288, 12288))
    elif v == "f5_extra_sem":
        make4("f5_extra_sem", extra_sem=True)
    elif v == "f6_any_copy":
        make2("f6_any_copy", n_scalar=1, scalar_sizes=(1,),
              any_input=True, set_copy=True)
    elif v == "f7_any_nocopy":
        make2("f7_any_nocopy", n_scalar=1, scalar_sizes=(1,),
              any_input=True)
    elif v == "f8_make2_plain":
        make2("f8_make2_plain", n_scalar=1, scalar_sizes=(1,))


def make5(label, tps=2, any_sizes=(256,), grid2d=False):
    """ANY-input cost vs grid shape."""
    tile_h = 16
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps
    n_any = len(any_sizes)

    def kernel(x_ref, *refs):
        color_ref, depth_ref = refs[n_any], refs[n_any + 1]
        write_tiles(color_ref, depth_ref, tile_h, tps, x_ref[0])

    if grid2d:
        grid = (tiles_y, steps_x)
        imap = lambda i, j, *_: (i, j)
    else:
        grid = (tiles_y * steps_x,)
        imap = lambda st, *_: (st // steps_x, st % steps_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_any,
        out_specs=[
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    anys = [jnp.zeros(s, jnp.int32) for s in any_sizes]

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
        )(x.reshape(1), *anys)

    timeit(jax.jit(run), label)


if os.environ.get("SOLO5"):
    v = os.environ["SOLO5"]
    if v == "g1_tps2":
        make5("g1_tps2", tps=2)
    elif v == "g2_tps10":
        make5("g2_tps10", tps=10)
    elif v == "g3_tps1":
        make5("g3_tps1", tps=1)
    elif v == "g4_tps2_2d":
        make5("g4_tps2_2d", tps=2, grid2d=True)
    elif v == "g5_tps10_noany":
        make5("g5_tps10_noany", tps=10, any_sizes=())


def make6(label, space="any", dimsem=None, tps=2):
    """ANY vs HBM memory space; dimension_semantics."""
    tile_h = 16
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps
    sp = {"any": pltpu.ANY, "hbm": pltpu.HBM}[space]

    def kernel(x_ref, any_ref, color_ref, depth_ref):
        write_tiles(color_ref, depth_ref, tile_h, tps, x_ref[0])

    imap = lambda st, *_: (st // steps_x, st % steps_x)
    kw = {}
    if dimsem is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dimsem,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y * steps_x,),
        in_specs=[pl.BlockSpec(memory_space=sp)],
        out_specs=[
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128 * tps), imap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    anyv = jnp.zeros(256, jnp.int32)

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
            **kw,
        )(x.reshape(1), anyv)

    timeit(jax.jit(run), label)


if os.environ.get("SOLO6"):
    v = os.environ["SOLO6"]
    if v == "k1_hbm":
        make6("k1_hbm", space="hbm")
    elif v == "k2_any_par":
        make6("k2_any_par", space="any", dimsem=pltpu.PARALLEL)
    elif v == "k3_any_arb":
        make6("k3_any_arb", space="any", dimsem=pltpu.ARBITRARY)
    elif v == "k4_hbm_par":
        make6("k4_hbm_par", space="hbm", dimsem=pltpu.PARALLEL)


def make7(label, n_bufs=2, manual_tps=2):
    """Fully-manual output path: outputs live in ANY space, kernel writes
    VMEM scratch accumulators and DMAs them out per step with rotating
    semaphores.  Grid = tile steps as before."""
    tile_h = 16
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // manual_tps
    n_steps = tiles_y * steps_x

    def kernel(x_ref, meta_ref, color_hbm, depth_hbm, cbuf, dbuf, sem):
        step = pl.program_id(0)
        slot = jax.lax.rem(step, n_bufs)
        ty = step // steps_x
        tx0 = (step % steps_x) * manual_tps

        # wait for the DMA that used this slot n_bufs steps ago
        @pl.when(step >= n_bufs)
        def _():
            # wait descriptors must match the started copy's SHAPE (the
            # semaphore counts bytes); offsets are irrelevant
            pltpu.make_async_copy(
                cbuf.at[slot],
                color_hbm.at[pl.ds(0, tile_h), pl.ds(0, 128 * manual_tps)],
                sem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                dbuf.at[slot],
                depth_hbm.at[pl.ds(0, tile_h), pl.ds(0, 128 * manual_tps)],
                sem.at[slot, 1]).wait()

        cbuf[slot] = jnp.full((tile_h, 128 * manual_tps), SKY, jnp.int32) \
            + x_ref[0]
        dbuf[slot] = jnp.full((tile_h, 128 * manual_tps), jnp.inf,
                              jnp.float32)
        pltpu.make_async_copy(
            cbuf.at[slot],
            color_hbm.at[pl.ds(ty * tile_h, tile_h),
                         pl.ds(tx0 * 128, 128 * manual_tps)],
            sem.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            dbuf.at[slot],
            depth_hbm.at[pl.ds(ty * tile_h, tile_h),
                         pl.ds(tx0 * 128, 128 * manual_tps)],
            sem.at[slot, 1],
        ).start()

        @pl.when(step == n_steps - 1)
        def _():
            # exactly one outstanding DMA pair per slot remains
            for s in range(n_bufs):
                pltpu.make_async_copy(
                    cbuf.at[s],
                    color_hbm.at[pl.ds(0, tile_h),
                                 pl.ds(0, 128 * manual_tps)],
                    sem.at[s, 0]).wait()
                pltpu.make_async_copy(
                    dbuf.at[s],
                    depth_hbm.at[pl.ds(0, tile_h),
                                 pl.ds(0, 128 * manual_tps)],
                    sem.at[s, 1]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_bufs, tile_h, 128 * manual_tps), jnp.int32),
            pltpu.VMEM((n_bufs, tile_h, 128 * manual_tps), jnp.float32),
            pltpu.SemaphoreType.DMA((n_bufs, 2)),
        ],
    )
    meta = jnp.zeros(256, jnp.int32)

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                       jax.ShapeDtypeStruct((H, W), jnp.float32)],
        )(x.reshape(1), meta)

    timeit(jax.jit(run), label)


if os.environ.get("SOLO7"):
    v = os.environ["SOLO7"]
    if v == "m1_manual2":
        make7("m1_manual2", n_bufs=2)
    elif v == "m2_manual4":
        make7("m2_manual4", n_bufs=4)
    elif v == "m3_manual4_tps10":
        make7("m3_manual4_tps10", n_bufs=4, manual_tps=10)


def make8(label, out_mode="full", any_in=True):
    """Relayout-copy probe: ANY input present, vary output size/shape."""
    tile_h, tps = 16, 2
    tiles_y, tiles_x = H // tile_h, W // 128
    steps_x = tiles_x // tps
    n_steps = tiles_y * steps_x

    if out_mode == "full":
        out_shape = [jax.ShapeDtypeStruct((H, W), jnp.int32),
                     jax.ShapeDtypeStruct((H, W), jnp.float32)]
        out_specs = [
            pl.BlockSpec((tile_h, 128 * tps),
                         lambda st, *_: (st // steps_x, st % steps_x),
                         memory_space=pltpu.VMEM)] * 2
    elif out_mode == "tiny":
        out_shape = [jax.ShapeDtypeStruct((tile_h, 256), jnp.int32),
                     jax.ShapeDtypeStruct((tile_h, 256), jnp.float32)]
        out_specs = [
            pl.BlockSpec((tile_h, 256), lambda st, *_: (0, 0),
                         memory_space=pltpu.VMEM)] * 2
    elif out_mode == "flat1d":
        n = H * W
        blk = tile_h * 256
        out_shape = [jax.ShapeDtypeStruct((n,), jnp.int32),
                     jax.ShapeDtypeStruct((n,), jnp.float32)]
        out_specs = [
            pl.BlockSpec((blk,), lambda st, *_: (st,),
                         memory_space=pltpu.VMEM)] * 2

    def kernel(x_ref, *refs):
        base = 1 if any_in else 0
        color_ref, depth_ref = refs[base], refs[base + 1]
        x = x_ref[0]
        if out_mode == "flat1d":
            color_ref[:] = jnp.full(color_ref.shape, SKY, jnp.int32) + x
            depth_ref[:] = jnp.full(depth_ref.shape, jnp.inf, jnp.float32)
        else:
            color_ref[:] = jnp.full(color_ref.shape, SKY, jnp.int32) + x
            depth_ref[:] = jnp.full(depth_ref.shape, jnp.inf, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] if any_in else [],
        out_specs=out_specs,
        scratch_shapes=[],
    )
    anyv = jnp.zeros(256, jnp.int32)

    def run(x):
        args = (x.reshape(1), anyv) if any_in else (x.reshape(1),)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
        )(*args)

    timeit(jax.jit(run), label)


if os.environ.get("SOLO8"):
    v = os.environ["SOLO8"]
    if v == "n1_full":
        make8("n1_full", out_mode="full")
    elif v == "n2_tiny":
        make8("n2_tiny", out_mode="tiny")
    elif v == "n3_flat1d":
        make8("n3_flat1d", out_mode="flat1d")
    elif v == "n4_big_any_in":
        import builtins
        make8("n4_big_any_in", out_mode="tiny")  # tiny outs (big ANY input separately below)


if os.environ.get("SOLO9"):
    v = os.environ["SOLO9"]
    if v == "s1_scalar460":
        make2("s1_scalar460", n_scalar=1, scalar_sizes=(460,))
    elif v == "s2_scalars4big":
        make2("s2_scalars4big", n_scalar=4)
    elif v == "s3_idxmap":
        # scalar-prefetch-driven out index map (the sparse-work-list
        # pattern): does indexing via the prefetched array cost anything?
        tile_h, tps = 16, 2
        tiles_y, tiles_x = H // tile_h, W // 128
        steps_x = tiles_x // tps
        n_steps = tiles_y * steps_x

        def kernel(x_ref, order_ref, color_ref, depth_ref):
            write_tiles(color_ref, depth_ref, tile_h, tps, x_ref[0])

        imap = lambda st, x_ref, order_ref: (order_ref[st] // steps_x,
                                             order_ref[st] % steps_x)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[],
            out_specs=[
                pl.BlockSpec((tile_h, 128 * tps), imap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, 128 * tps), imap,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[],
        )
        order = jnp.arange(n_steps, dtype=jnp.int32)

        def run(x):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                           jax.ShapeDtypeStruct((H, W), jnp.float32)],
            )(x.reshape(1), order)

        timeit(jax.jit(run), "s3_idxmap")
    elif v == "s4_blocked_in":
        # blocked VMEM input streamed by a prefetched block index — the
        # full sparse pattern the raster kernel would use
        tile_h, tps = 16, 2
        tiles_y, tiles_x = H // tile_h, W // 128
        steps_x = tiles_x // tps
        n_steps = tiles_y * steps_x
        TKL = 98304

        def kernel(x_ref, bidx_ref, rec_ref, color_ref, depth_ref):
            write_tiles(color_ref, depth_ref, tile_h, tps,
                        x_ref[0] + rec_ref[0, 0])

        imap_o = lambda st, *_: (st // steps_x, st % steps_x)
        imap_r = lambda st, x_ref, bidx_ref: (0, bidx_ref[st])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((24, 256), imap_r,
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tile_h, 128 * tps), imap_o,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, 128 * tps), imap_o,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[],
        )
        bidx = (jnp.arange(n_steps, dtype=jnp.int32) % (TKL // 256))
        recs = jnp.zeros((24, TKL), jnp.int32)

        def run(x):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32),
                           jax.ShapeDtypeStruct((H, W), jnp.float32)],
            )(x.reshape(1), bidx, recs)

        timeit(jax.jit(run), "s4_blocked_in")


def make9(label, n_in=4, n_out=5, rows=1024, br=64):
    """Operand-count bisect with geometry-kernel-shaped blocked pipelines:
    trivial copy body, [br, 128] blocks, grid rows//br."""
    grid = rows // br

    def kernel(x_ref, *refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + n_out]
        v = ins[0][:] + x_ref[0]
        for i, o in enumerate(outs):
            o[:] = v + i

    blk = lambda: pl.BlockSpec((br, 128), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[blk() for _ in range(n_in)],
        out_specs=[blk() for _ in range(n_out)],
        scratch_shapes=[],
    )
    ins = [jnp.zeros((rows, 128), jnp.int32) for _ in range(n_in)]

    def run(x):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)
                       for _ in range(n_out)],
        )(x.reshape(1), *ins)

    timeit(jax.jit(run), label)


if os.environ.get("SOLO10"):
    v = os.environ["SOLO10"]
    n_in, n_out = v.split("_")[1].split("x")
    make9(v, n_in=int(n_in), n_out=int(n_out))


def make10(label, alias=False, two_calls=False):
    """input_output_aliasing probe: input disguised as aliased output."""
    rows, br = 1024, 64
    grid = rows // br

    def kernel(x_ref, in_ref, out_ref, out2_ref):
        out_ref[:] = in_ref[:] + x_ref[0]
        out2_ref[:] = in_ref[:] * 2

    blk = lambda: pl.BlockSpec((br, 128), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[blk()],
        out_specs=[blk(), blk()],
        scratch_shapes=[],
    )
    kw = {}
    if alias:
        kw["input_output_aliases"] = {1: 0}  # input idx (after scalar) -> out 0
    x_in = jnp.zeros((rows, 128), jnp.int32)

    def run(x):
        o = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 2,
            **kw,
        )(x.reshape(1), x_in + x)
        if two_calls:
            o2 = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 2,
                **kw,
            )(x.reshape(1), o[0])
            return o2
        return o

    timeit(jax.jit(run), label)


if os.environ.get("SOLO11"):
    v = os.environ["SOLO11"]
    if v == "y1_noalias":
        make10("y1_noalias")
    elif v == "y2_alias":
        make10("y2_alias", alias=True)
    elif v == "y3_two_calls":
        make10("y3_two_calls", two_calls=True)


def make11(label, n_chain=2, xla_between=False, reshape_between=False):
    """Island-batching probe: chained pallas calls, optionally separated
    by XLA ops."""
    rows, br = 1024, 64
    grid = rows // br

    def kernel(x_ref, in_ref, o1, o2):
        v = in_ref[:] + x_ref[0]
        o1[:] = v
        o2[:] = v + 1

    blk = lambda: pl.BlockSpec((br, 128), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(grid,),
        in_specs=[blk()], out_specs=[blk(), blk()], scratch_shapes=[])
    x_in = jnp.zeros((rows, 128), jnp.int32)

    def call(x, a):
        return pl.pallas_call(kernel, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 2,
        )(x.reshape(1), a)

    def run(x):
        a = x_in + x
        for i in range(n_chain):
            o = call(x + i, a)
            a = o[0]
            if xla_between:
                a = a + 1
            if reshape_between:
                a = a.reshape(rows * 128).reshape(rows, 128)
        return o

    timeit(jax.jit(run), label)


if os.environ.get("SOLO12"):
    v = os.environ["SOLO12"]
    if v == "z1_chain4":
        make11("z1_chain4", n_chain=4)
    elif v == "z2_chain2_xla":
        make11("z2_chain2_xla", n_chain=2, xla_between=True)
    elif v == "z3_chain2_reshape":
        make11("z3_chain2_reshape", n_chain=2, reshape_between=True)
    elif v == "z4_chain4_xla":
        make11("z4_chain4_xla", n_chain=4, xla_between=True)
