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
