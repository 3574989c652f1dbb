"""Tiled quad rasterization with branchless depth blending.

The compute heart of the renderer.  Replaces the reference's scanline span
walker + AVX2 blend fills (src/rendering/span_walker.rs:283-392, 524-586 —
``fill_span_simd_branchless``: load depth+color, compare, blendv,
unconditional store) with the TPU-native equivalent: for each framebuffer
tile resident in VMEM, stream the tile's binned quads and evaluate coverage
/ depth / texel for EVERY pixel of the tile at once on the VPU, then
``jnp.where``-blend depth and color.  A 120x256 tile is 60 VPU vregs — the
whole framebuffer tile IS the "register framebuffer" the reference emulates
8 pixels at a time.

Pipeline structure (mirrors the reference frame, main.rs:528-597, redesigned
for the TPU memory system):

1. ``build_tile_lists`` — bin quads to framebuffer tiles as a dense overlap
   matrix + scatter-free compaction (cumsum + batched searchsorted; the
   "dense [tiles x quads] mask" plan from SURVEY.md section 5).  Replaces
   Rayon stripe binning.
2. gather the per-tile quad streams into contiguous HBM buffers (XLA
   gather), ordered front-to-back per tile (= original stream order).
3. ``_raster_kernel`` — Pallas grid over tiles; per tile the quad stream is
   DMA'd HBM -> SMEM in double-buffered blocks (Mosaic requires static lane
   indices in VMEM, so per-quad scalars live in SMEM), and each quad is
   blended into the VMEM-resident tile.

Two implementations with identical per-pixel arithmetic:

- ``rasterize_jnp``    — pure jnp fori_loop over the unbinned stream
  (reference implementation; runs anywhere, exact same output)
- ``rasterize_pallas`` — the production TPU kernel

Per-pixel math (see ops/projection.py for the coefficient derivation):
  q  = A @ (nx, ny, 1)           -- 2D homogeneous coordinates
  cover = q2 > 0  &  u0*q2 <= q0 <= u1*q2  &  v0*q2 <= q1 <= v1*q2
  z  = z0*nx + z1*ny + z2        -- exact planar NDC depth
  uv = (q0/q2, q1/q2)            -- perspective-correct texture coords
  texel = two-tone palette select via a 64-bit parity mask
  pass = cover & (z < depth)     -- strict less, ties keep first-drawn
                                    (framebuffer.rs:325 semantics)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import SKY_COLOR

F_FIELDS = (
    "a00", "a01", "a02", "a10", "a11", "a12", "a20", "a21", "a22",
    "z0", "z1", "z2", "u0", "u1", "v0", "v1",
)
N_BLEND_FIELDS = 16  # all float fields feed the per-pixel blend
# (A per-piece early-z scheme — track max drawn depth per 8x128 piece in
# SMEM and skip quads whose nearest depth lies beyond it — was measured
# here and LOST ~40%: the cross-lane max reduction after every blend costs
# more than the skipped blends save at vd12 overdraw levels.)
# ``pieces`` packs the tile-local sub-block range the quad's bbox covers
# (by0 | bx0<<4 | nby<<8 | nbx<<12 — precomputed on the XLA side so the
# kernel spends no scalar ops on bbox/tile intersection); ``qid`` is the
# quad's stream identity (drives the rotating-buffer assignment so
# tie-breaking is independent of binning layout).
I_FIELDS = ("color_even", "color_odd", "mask_lo", "mask_hi", "pieces", "qid")

SKY_I32 = np.uint32(SKY_COLOR).astype(np.int32)

# Quads streamed per DMA block (HBM -> SMEM); lane-aligned.
BLOCK_Q = 256

# (A rotating multi-buffer accumulation scheme was measured here and LOST:
# the extra VMEM traffic cost more than the shortened read-modify-write
# dependency chain bought.  Single-buffer sequential blending also keeps
# the reference's exact first-drawn-wins tie semantics.)


def pack_coeffs_rows(coeffs: dict[str, jnp.ndarray]):
    """SoA dict -> (f32[16, N], i32[8, N]) blocked layout: the quad stream
    stays on the (unpadded) lane dimension; a quad's record is one column.
    (A quad-major [N, 16] layout pads 16 -> 128 lanes: 8x the memory and
    pathological downstream ops — measured.)  The int block is padded to 8
    rows so SMEM double-buffer slices stay tiling-aligned (sublane 8).
    """
    floats = [coeffs[k].astype(jnp.float32) for k in F_FIELDS]
    fzero = jnp.zeros_like(floats[0])
    f_rows = -len(floats) % 8 + len(floats)  # pad to the 8-sublane tile
    f = jnp.stack(floats + [fzero] * (f_rows - len(floats)), axis=0)
    ints = [coeffs[k].astype(jnp.int32) for k in I_FIELDS]
    zero = jnp.zeros_like(ints[0])
    i = jnp.stack(ints + [zero] * (8 - len(I_FIELDS)), axis=0)
    return f, i


def pack_coeffs_quadmajor(coeffs: dict[str, jnp.ndarray]):
    """SoA dict -> (f32[N, 16], i32[N, 4]) for the jnp reference path
    (CPU-friendly scalar row reads)."""
    f = jnp.stack([coeffs[k].astype(jnp.float32) for k in F_FIELDS], axis=1)
    i = jnp.stack([coeffs[k].astype(jnp.int32) for k in I_FIELDS], axis=1)
    return f, i


def _pixel_ndc(height: int, width: int, y0, x0, th: int, tw: int):
    """NDC coords of pixel centers for the tile with origin (y0, x0)."""
    # integer iota (Mosaic requires int iota) then cast
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    nx = (2.0 * (px + 0.5) - width) / width
    ny = 1.0 - 2.0 * (py + 0.5) / height
    return nx, ny


def _blend_one_quad(nx, ny, fro, iro, color, depth):
    """Shared per-quad pixel math. ``fro``/``iro`` are per-quad scalars in
    F_FIELDS / I_FIELDS[:4] order; returns updated (color, depth)."""
    (a00, a01, a02, a10, a11, a12, a20, a21, a22,
     z0, z1, z2, u0, u1, v0, v1) = fro
    color_even, color_odd, mask_lo, mask_hi = iro

    qu = a00 * nx + a01 * ny + a02
    qv = a10 * nx + a11 * ny + a12
    qw = a20 * nx + a21 * ny + a22
    z = z0 * nx + z1 * ny + z2

    cover = (
        (qw > 0.0)
        & (qu >= u0 * qw)
        & (qu <= u1 * qw)
        & (qv >= v0 * qw)
        & (qv <= v1 * qw)
    )

    inv = 1.0 / qw
    uu = qu * inv
    vv = qv * inv
    # tex_u = ((u * 8) as i32) & 7 — rasterizer.rs:1443-1444
    tu = (uu * 8.0).astype(jnp.int32) & 7
    tv = (vv * 8.0).astype(jnp.int32) & 7
    idx = tv * 8 + tu
    word = jnp.where(idx < 32, mask_lo, mask_hi)
    shift = jnp.where(idx < 32, idx, idx - 32)
    bit = jax.lax.shift_right_logical(
        jnp.broadcast_to(word, shift.shape), shift
    ) & 1
    quad_color = jnp.where(bit != 0, color_odd, color_even)

    ok = cover & (z < depth)
    return jnp.where(ok, quad_color, color), jnp.where(ok, z, depth)


# ---------------------------------------------------------------------------
# Pure-jnp reference implementation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "band_h"))
def rasterize_jnp(fcoef, icoef, count, *, height: int, width: int,
                  y0=0, band_h: int | None = None):
    """Full-frame fori_loop rasterizer — bit-identical math to the kernel,
    including the N_ACCUM rotating-buffer accumulation (see N_ACCUM note).
    ``fcoef``/``icoef`` are quad-major ([N, 16] / [N, 4]).

    ``y0``/``band_h`` rasterize only the horizontal band starting at row
    ``y0`` (NDC stays global) — the building block for sharding the
    framebuffer across devices (parallel/sharded_render.py), the TPU form
    of the reference's Rayon stripe split (framebuffer.rs:392-431).
    """
    band_h = height if band_h is None else band_h
    nx, ny = _pixel_ndc(height, width, jnp.asarray(y0, jnp.int32), 0,
                        band_h, width)
    color0 = jnp.full((band_h, width), SKY_I32, jnp.int32)
    depth0 = jnp.full((band_h, width), jnp.inf, jnp.float32)

    def body(k, carry):
        color, depth = carry
        fro = tuple(fcoef[k, i] for i in range(N_BLEND_FIELDS))
        iro = tuple(icoef[k, i] for i in range(4))
        return _blend_one_quad(nx, ny, fro, iro, color, depth)

    return jax.lax.fori_loop(0, count, body, (color0, depth0))


# ---------------------------------------------------------------------------
# Tile binning (device-side, scatter-free)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "item_cap"))
def build_tile_lists(tilebox, count, *, tiles_y: int, tiles_x: int,
                     item_cap: int):
    """Bin quads to tiles as ONE flat item stream of (tile, quad) pairs,
    ordered by (tile, ascending quad) — so per-tile blend order matches the
    unbinned stream exactly, and downstream work is proportional to real
    items (immune to the extreme per-tile skew of perspective terrain).

    Construction is a single radix-friendly sort instead of a [T, M]
    argsort (measured 5x faster at 720p/vd12 scale):
    - quads spanning <= 2x2 tiles (>99% of terrain) expand to 4 candidate
      keys ``tile << shift | quad``;
    - larger quads (big near geometry, near-plane-crossing conservative
      boxes) are compacted and expanded across the full tile grid — the
      TPU-shaped version of the reference's "large primitive" handling
      (macrotile.rs:26, 180-226) that still preserves per-tile draw order;
    - one ascending sort of all keys yields every tile's item segment;
      segment boundaries come from a binary search of the tile prefixes.

    Returns (items i32[item_cap] — quad index per stream slot,
             starts i32[T], counts i32[T] — per-tile segments (NOT aligned),
             overflow i32 — dropped items).
    """
    m = tilebox.shape[0]
    shift = max(1, (m - 1).bit_length())
    n_tiles = tiles_y * tiles_x
    assert n_tiles << shift < 2**31, "tile/quad key would overflow int32"
    big_cap = 512
    maxkey = jnp.int32(2**31 - 1)

    q = jnp.arange(m, dtype=jnp.int32)
    in_count = q < count
    tx0 = tilebox & 0xFF
    tx1 = (tilebox >> 8) & 0xFF
    ty0 = (tilebox >> 16) & 0xFF
    ty1 = (tilebox >> 24) & 0xFF
    nonempty = in_count & (tx0 <= tx1) & (ty0 <= ty1)
    small = nonempty & (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    is_big = nonempty & ~small

    keys = []
    for dy in (0, 1):
        for dx in (0, 1):
            tx = tx0 + dx
            ty = ty0 + dy
            ok = small & (tx <= tx1) & (ty <= ty1)
            tid = ty * tiles_x + tx
            keys.append(jnp.where(ok, (tid << shift) | q, maxkey))

    # compact big quads (few hundred at most) and expand over the full grid
    csum = jnp.cumsum(is_big.astype(jnp.int32))
    n_big = csum[-1]
    targets = jnp.arange(1, big_cap + 1, dtype=jnp.int32)
    src = jnp.minimum(jnp.searchsorted(csum, targets, side="left"), m - 1)
    src = src.astype(jnp.int32)
    bvalid = targets <= n_big
    btx0 = jnp.where(bvalid, tx0[src], 1)
    btx1 = jnp.where(bvalid, tx1[src], 0)
    bty0 = jnp.where(bvalid, ty0[src], 1)
    bty1 = jnp.where(bvalid, ty1[src], 0)
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    tyg = (t // tiles_x)[:, None]
    txg = (t % tiles_x)[:, None]
    okb = (
        (txg >= btx0[None, :]) & (txg <= btx1[None, :])
        & (tyg >= bty0[None, :]) & (tyg <= bty1[None, :])
    )
    keys.append(
        jnp.where(okb, (t[:, None] << shift) | src[None, :], maxkey).reshape(-1)
    )
    big_dropped = jnp.maximum(n_big - big_cap, 0)

    skeys = jnp.sort(jnp.concatenate(keys))
    bounds = jnp.searchsorted(
        skeys, (jnp.arange(n_tiles + 1, dtype=jnp.int32) << shift),
        side="left",
    ).astype(jnp.int32)
    starts = bounds[:-1]
    total = bounds[-1]
    kept_end = jnp.minimum(bounds[1:], item_cap)
    kept_start = jnp.minimum(starts, item_cap)
    counts = (kept_end - kept_start).astype(jnp.int32)
    overflow = (jnp.maximum(total - item_cap, 0) + big_dropped).astype(jnp.int32)

    mask = jnp.arange(item_cap, dtype=jnp.int32) < jnp.minimum(total, item_cap)
    head = skeys[:item_cap]
    items = jnp.where(mask, head & ((1 << shift) - 1), 0)
    t_of_item = jnp.where(mask, head >> shift, 0).astype(jnp.int32)
    return items, t_of_item, kept_start, counts, overflow


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


# VPU sub-block shape: one f32 vreg
PIECE_H = 8
PIECE_W = 128


def _raster_kernel(starts_ref, counts_ref, f_hbm, i_hbm, color_ref, depth_ref,
                   f_smem, i_smem, f_sem, i_sem,
                   *, height, width, tile_h, tile_w, tiles_x):
    t = pl.program_id(0)
    ti = t // tiles_x  # tile row
    tj = t % tiles_x   # tile col
    tile_py0 = ti * tile_h
    tile_px0 = tj * tile_w
    # fused clear: depth = +inf, color = sky (main.rs:393)
    color_ref[:] = jnp.full((tile_h, tile_w), SKY_I32, jnp.int32)
    depth_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)

    count = counts_ref[t]
    base = starts_ref[t]  # NOT block-aligned: segments are packed tight
    first_blk = base // BLOCK_Q
    last_blk = (base + jnp.maximum(count, 1) - 1) // BLOCK_Q
    nblocks = jnp.where(count > 0, last_blk - first_blk + 1, 0)

    nf = len(F_FIELDS) + (-len(F_FIELDS) % 8)  # sublane-padded row count
    ni = len(I_FIELDS)

    ni_pad = 8  # int rows padded to the sublane tile (see pack_coeffs_rows)

    def dmas(slot, b):
        off = pl.multiple_of((first_blk + b) * BLOCK_Q, BLOCK_Q)
        return (
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(off, BLOCK_Q)],
                f_smem.at[pl.ds(slot * nf, nf), :],
                f_sem.at[slot]
            ),
            pltpu.make_async_copy(
                i_hbm.at[:, pl.ds(off, BLOCK_Q)],
                i_smem.at[pl.ds(slot * ni_pad, ni_pad), :],
                i_sem.at[slot]
            ),
        )

    @pl.when(nblocks > 0)
    def _():
        df, di = dmas(0, 0)
        df.start()
        di.start()

    def block_body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nblocks)
        def _():
            df, di = dmas((b + 1) % 2, b + 1)
            df.start()
            di.start()

        df, di = dmas(slot, b)
        df.wait()
        di.wait()
        blk0 = (first_blk + b) * BLOCK_Q
        k_lo = jnp.maximum(base - blk0, 0)
        k_hi = jnp.minimum(base + count - blk0, BLOCK_Q)

        def octet_body(o, _):
            def lane_body(u, _):
                k = o * 8 + u

                @pl.when((k >= k_lo) & (k < k_hi))
                def _():
                    _do_quad(k)
                return 0

            jax.lax.fori_loop(0, 8, lane_body, 0, unroll=8)
            return 0

        def _do_quad(k):
            # covered sub-block range, precomputed on the XLA side (the
            # reference's per-scanline span bounds, rasterizer.rs:1401-1413,
            # in 8x128 granularity)
            desc = i_smem[slot * ni_pad + 4, k]
            by0 = desc & 0xF
            bx0 = (desc >> 4) & 0xF
            nby = (desc >> 8) & 0xF
            nbx = (desc >> 12) & 0xF
            one = (nby == 1) & (nbx == 1)
            _do_quad_full(k, by0, bx0, nby, nbx, one)

        def _do_quad_full(k, by0, bx0, nby, nbx, one):
            fro = tuple(f_smem[slot * nf + i, k] for i in range(N_BLEND_FIELDS))
            iro = tuple(i_smem[slot * ni_pad + i, k] for i in range(4))

            def do_piece(py, px):
                yoff = pl.multiple_of(py * PIECE_H, PIECE_H)
                xoff = pl.multiple_of(px * PIECE_W, PIECE_W)
                nx, ny = _pixel_ndc(height, width,
                                    tile_py0 + yoff, tile_px0 + xoff,
                                    PIECE_H, PIECE_W)
                sub_c = color_ref[pl.ds(yoff, PIECE_H), pl.ds(xoff, PIECE_W)]
                sub_d = depth_ref[pl.ds(yoff, PIECE_H), pl.ds(xoff, PIECE_W)]
                c2, d2 = _blend_one_quad(nx, ny, fro, iro, sub_c, sub_d)
                color_ref[pl.ds(yoff, PIECE_H), pl.ds(xoff, PIECE_W)] = c2
                depth_ref[pl.ds(yoff, PIECE_H), pl.ds(xoff, PIECE_W)] = d2

            @pl.when(one)  # straight-line fast path (most quads: one piece)
            def _():
                do_piece(by0, bx0)

            @pl.when(~one)
            def _():
                def piece_body(p, _):
                    do_piece(by0 + p // nbx, bx0 + p % nbx)
                    return 0

                jax.lax.fori_loop(0, nby * nbx, piece_body, 0)

        jax.lax.fori_loop(k_lo // 8, (k_hi + 7) // 8, octet_body, 0)
        return 0

    jax.lax.fori_loop(0, nblocks, block_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "interpret"),
)
def rasterize_pallas(f_binned, i_binned, tile_starts, tile_counts, *,
                     height: int, width: int, tile_h: int, tile_w: int,
                     interpret: bool = False):
    """Binned, streamed, tiled Pallas rasterizer over the flat item stream.

    ``f_binned`` f32[16, ITEM_CAP] / ``i_binned`` i32[8, ITEM_CAP] hold the
    quad records in blocked SoA layout (see pack_coeffs_rows);
    ``tile_starts``/``tile_counts`` i32[T] delimit each tile's segment
    (starts are BLOCK_Q-aligned).  Returns (color, depth).
    """
    assert height % tile_h == 0 and width % tile_w == 0
    tiles_y, tiles_x = height // tile_h, width // tile_w
    n_tiles = tiles_y * tiles_x

    kernel = functools.partial(
        _raster_kernel, height=height, width=width, tile_h=tile_h,
        tile_w=tile_w, tiles_x=tiles_x,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # per-tile starts + counts -> SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # f_binned stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # i_binned stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // (width // tile_w), t % (width // tile_w)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // (width // tile_w), t % (width // tile_w)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2 * (len(F_FIELDS) + (-len(F_FIELDS) % 8)), BLOCK_Q),
                       jnp.float32),
            pltpu.SMEM((2 * 8, BLOCK_Q), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.int32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(tile_starts, tile_counts, f_binned, i_binned)
    return color, depth


def pick_tile(height: int, width: int) -> tuple[int, int]:
    """Choose a VMEM-friendly tile: lane dim multiple of 128, sublane
    multiple of 8, both dividing the framebuffer."""
    tw = 0
    for cand in (256, 128, 384, 512):
        if width % cand == 0:
            tw = cand
            break
    if tw == 0:
        raise ValueError(f"width {width} must be divisible by 128")
    th = 0
    for cand in (120, 128, 64, 96, 112, 104, 88, 80, 72, 56, 48, 40, 32, 24, 16, 8):
        if height % cand == 0:
            th = cand
            break
    if th == 0:
        raise ValueError(f"height {height} must be divisible by 8")
    return th, tw


# NOTE on record layout (measured on v5e): streaming records into SMEM and
# reading ~20 scalars per quad costs ~195 ns per quad-tile pair; an
# alternative layout with one VMEM row per quad (single vector load + static
# lane extracts + vector bitcast) measured ~291 ns — vreg lane extraction is
# slower than scalar SMEM loads on this core, so the SMEM layout stays.
