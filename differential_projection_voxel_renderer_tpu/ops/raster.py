"""Tiled quad rasterization with branchless depth blending.

The compute heart of the renderer.  Replaces the reference's scanline span
walker + AVX2 blend fills (src/rendering/span_walker.rs:283-392, 524-586 —
``fill_span_simd_branchless``: load depth+color, compare, blendv,
unconditional store) with the TPU-native equivalent: a Pallas grid over
16x128 framebuffer tiles whose color/depth accumulators live in vector
registers, blending 8 quads at a time — quads in the sublane axis, pixel x
in the lane axis (the "octet kernel", see ``_raster_kernel``).

Pipeline structure (mirrors the reference frame, main.rs:528-597, redesigned
for the TPU memory system):

1. ``build_tile_lists`` — bin quads to tiles as ONE flat sorted item
   stream (radix-friendly keys; replaces Rayon stripe binning), ordered
   approximately front-to-back within each tile.
2. gather the per-item records into a contiguous HBM buffer with one
   multi-row gather (separate per-field gathers measured R x slower).
3. ``_raster_kernel`` — per tile, stream the records HBM -> VMEM in
   double-buffered 256-record blocks; per octet of 8 items evaluate whole
   [8, 128] pixel rows, reduce across sublanes to the depth minimum, and
   merge into the register-resident tile; an exact per-tile occlusion
   break ends the stream once nothing left can win.

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
from . import geometry_pallas as geom_ops

F_FIELDS = (
    "a00", "a01", "a02", "a10", "a11", "a12", "a20", "a21", "a22",
    "z0", "z1", "z2", "u0", "u1", "v0", "v1",
)
N_BLEND_FIELDS = 16  # all float fields feed the per-pixel blend
I_FIELDS = ("color_even", "color_odd", "mask_lo", "mask_hi")

SKY_I32 = np.uint32(SKY_COLOR).astype(np.int32)

# Items streamed per DMA block (HBM -> VMEM); sublane-tile aligned.
BLOCK_Q = 256


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


def _eval_bases(nx, fro):
    """Row-invariant products of the four plane evaluations at pixel
    column NDC ``nx``: for fixed x, ``a * nx`` never changes across the
    rows of an octet's span, so the octet kernel computes these ONCE per
    octet ([8, 128] each) and each row eval saves one vector mul per
    plane (4 of the ~45 vector ops per row).  Only the PRODUCT is
    hoisted — the summation tree ``((a*nx) + (b*ny)) + c`` is unchanged,
    so rounding is bit-identical to the unhoisted form and the
    kernel-vs-twin full-frame equality gate still holds."""
    (a00, _a01, _a02, a10, _a11, _a12, a20, _a21, _a22,
     z0, _z1, _z2, _u0, _u1, _v0, _v1) = fro
    return (a00 * nx, a10 * nx, a20 * nx, z0 * nx)


def _eval_one_quad_row(ny, fro, iro, bases):
    """Per-row half of the quad pixel math: finish the plane evaluations
    from the precomputed column products, then coverage / depth / texel.
    See ``_eval_one_quad`` for the contract."""
    (_a00, a01, a02, _a10, a11, a12, _a20, a21, a22,
     _z0, z1, z2, u0, u1, v0, v1) = fro
    color_even, color_odd, mask_lo, mask_hi = iro
    base_u, base_v, base_w, base_z = bases

    qu = base_u + a01 * ny + a02
    qv = base_v + a11 * ny + a12
    qw = base_w + a21 * ny + a22
    z = base_z + z1 * ny + z2

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
    shift = idx & 31  # == idx - 32 for idx in [32, 64): one op, not a select
    bit = jax.lax.shift_right_logical(
        jnp.broadcast_to(word, shift.shape), shift
    ) & 1
    quad_color = jnp.where(bit != 0, color_odd, color_even)
    return cover, z, quad_color


def _eval_one_quad(nx, ny, fro, iro, pin_mul: bool = True):
    """Shared per-quad pixel math: coverage / planar depth / texel color at
    pixel NDC (nx, ny).  ``fro``/``iro`` are per-quad values in F_FIELDS /
    I_FIELDS[:4] order, broadcastable against nx — scalars in the jnp path,
    [8, 1] vregs in the octet kernel, [8, 128] lane-grouped vectors in the
    packed kernel.

    ``pin_mul`` is accepted for call-site symmetry but no longer changes
    the math: compilers are free to contract a*b+c into FMAs BELOW the
    HLO level (measured on XLA:CPU — neither optimization_barrier nor
    bitcast round trips survive LLVM), so 1-ulp linear-form variance at
    exact closed-edge pixels is unavoidable across differently-shaped
    lowerings.  The parity suite therefore uses a boundary-verified gate
    for the packed kernel (tests/test_render.py) instead of pretending
    bit-determinism the toolchain cannot deliver; the reference gets
    this determinism from Rust's no-contraction FP semantics, which jnp
    does not offer."""
    del pin_mul
    return _eval_one_quad_row(ny, fro, iro, _eval_bases(nx, fro))


def _blend_one_quad(nx, ny, fro, iro, color, depth):
    """Depth blend as a lexicographic min over (depth, color bits).

    The reference's strict ``<`` test (framebuffer.rs:325) resolves
    exact-depth ties by draw order — an order-DEPENDENT semantic (ties
    occur between coplanar quads, where the reference's own output is
    draw-order-defined).  We instead break ties by the smaller int32
    color word: fully commutative, so the kernel, the jnp twin, the
    oracle, and any binning order produce the bit-identical frame, and
    the parity suite can demand full-frame equality like the reference's
    SIMD-vs-scalar tests (span_walker.rs:914-1141).  Depth output is
    unaffected (ties share z); color differs from the reference only at
    tie pixels whose reference value is order-dependent anyway."""
    cover, z, quad_color = _eval_one_quad(nx, ny, fro, iro)
    ok = cover & ((z < depth) | ((z == depth) & (quad_color < color)))
    return jnp.where(ok, quad_color, color), jnp.where(ok, z, depth)


# ---------------------------------------------------------------------------
# Pure-jnp reference implementation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "band_h"))
def rasterize_jnp(fcoef, icoef, count, *, height: int, width: int,
                  y0=0, band_h: int | None = None,
                  init_color=None, init_depth=None):
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
    # optional initial framebuffer (the two-pass occlusion mode continues
    # blending onto the near pass's output; blend commutativity makes the
    # result identical to one pass over the union)
    color0 = (jnp.full((band_h, width), SKY_I32, jnp.int32)
              if init_color is None else init_color)
    depth0 = (jnp.full((band_h, width), jnp.inf, jnp.float32)
              if init_depth is None else init_depth)

    def body(k, carry):
        color, depth = carry
        fro = tuple(fcoef[k, i] for i in range(N_BLEND_FIELDS))
        iro = tuple(icoef[k, i] for i in range(4))
        return _blend_one_quad(nx, ny, fro, iro, color, depth)

    return jax.lax.fori_loop(0, count, body, (color0, depth0))


# ---------------------------------------------------------------------------
# Tile binning (device-side, scatter-free)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x",
                                               "item_cap", "tile_perm"))
def build_tile_lists(tilebox, count, *, tiles_y: int, tiles_x: int,
                     item_cap: int, order6=None, order6_dy1=None,
                     valid=None, tile_perm=None):
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

    When ``order6`` is given (i32[m], values 0..63), items within a tile
    are ordered by it (then stream order).  The production pipeline packs
    log-quantized near depth (4 bits) with the covered-row band (2 bits):
    approximately front-to-back — what makes the kernel's exact occlusion
    break effective — and row-coherent — what keeps octet row spans tight.
    ``order6_dy1`` (optional) is used instead for a quad's SECOND covered
    tile row, where its row band restarts at 0.
    (Blending is a lexicographic min over (depth, stream index) —
    commutative — so within-tile order is free to choose.)

    ``tile_perm`` (optional) = (group_rows, group_w): emit tiles in
    GROUP-major order instead of row-major — the framebuffer's tile grid
    is partitioned into group_rows x group_w blocks and a tile's stream
    id becomes ``(block * group_rows + row_in_block) * group_w + col``.
    Every group's member segments are then CONTIGUOUS in the flat
    stream, which is what lets the pair-row shared-stream kernel
    (``_raster_kernel_shared`` with ``group_rows=2``) share ONE DMA
    chain across a 2x5 tile block.  Per-tile segments, within-tile
    order and blend semantics are unchanged (the permutation only
    relabels tiles); ``starts``/``counts``/``t_of_item`` are indexed by
    the PERMUTED id.

    Returns (items i32[item_cap] — quad index per stream slot,
             starts i32[T], counts i32[T] — per-tile segments (NOT aligned),
             overflow i32 — dropped items).
    """
    if tile_perm is not None:
        gr, gw = tile_perm
        assert tiles_y % gr == 0 and tiles_x % gw == 0, (
            tiles_y, tiles_x, tile_perm)
        gpx = tiles_x // gw

        def tid_of(ty, tx):
            blk = (ty // gr) * gpx + tx // gw
            return (blk * gr + ty % gr) * gw + tx % gw
    else:
        def tid_of(ty, tx):
            return ty * tiles_x + tx
    m = tilebox.shape[0]
    shift = max(1, (m - 1).bit_length())
    n_tiles = tiles_y * tiles_x
    order_bits = 0 if order6 is None else 6
    shift_t = shift + order_bits
    assert n_tiles << shift_t < 2**32, "tile/quad key would overflow u32"
    big_cap = 512
    maxkey = jnp.uint32(2**32 - 1)

    def u32(x):
        return x.astype(jnp.uint32)

    q = jnp.arange(m, dtype=jnp.int32)
    # prefix count (compacted streams) or an explicit validity mask (the
    # no-compaction mode bins the raw gather stream, whose valid quads
    # are interspersed; within-tile item order is ascending stream index
    # either way, so blend semantics are unchanged)
    in_count = (q < count) if valid is None else valid
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
            tid = tid_of(ty, tx)
            src6 = order6 if (dy == 0 or order6_dy1 is None) else order6_dy1
            obits = 0 if src6 is None else (src6 << shift)
            keys.append(jnp.where(
                ok, (u32(tid) << shift_t) | u32(obits) | u32(q), maxkey))

    # Big quads split into two compacted classes (measured at vd12: ~260
    # "big" quads cover ~4 tiles each; ~31 near-plane conservative boxes
    # cover the WHOLE grid — expanding all of them over n_tiles cost
    # n_tiles*512 = 230k mostly-maxkey sort keys, more than half the sort):
    # - big  (<= max_tiles_big tiles): enumerate exactly their covered
    #   tiles, row-major, in a [max_tiles_big, big_cap] block
    # - huge (>  max_tiles_big tiles): full-grid expansion, small cap
    # The final key array is padded to a power of two (TPU sorts want
    # pow2 lengths — NOTES.md).
    max_tiles_big = 64
    huge_cap = 64
    spanx = tx1 - tx0 + 1
    spany = ty1 - ty0 + 1
    ntile_of = spanx * spany
    is_huge = is_big & (ntile_of > max_tiles_big)
    is_bigb = is_big & ~is_huge

    def compact_class(mask, cap):
        # indices of the first `cap` set entries via one flat sort
        ck = jnp.sort(jnp.where(mask, q, jnp.int32(2**30)))[:cap]
        valid = ck < 2**30
        return jnp.minimum(ck, m - 1), valid, mask.sum().astype(jnp.int32)

    src, bvalid, n_bigb = compact_class(is_bigb, big_cap)
    ob_src = (jnp.zeros(big_cap, jnp.uint32) if order6 is None else
              u32(jnp.where(bvalid, order6[src], 0)) << shift)
    j = jnp.arange(max_tiles_big, dtype=jnp.int32)[:, None]
    bsx = jnp.maximum(jnp.where(bvalid, spanx[src], 1), 1)[None, :]
    ty_b = jnp.where(bvalid, ty0[src], 0)[None, :] + j // bsx
    tx_b = jnp.where(bvalid, tx0[src], 0)[None, :] + j % bsx
    okb = bvalid[None, :] & (j < jnp.where(bvalid, ntile_of[src], 0)[None, :])
    tid_b = tid_of(ty_b, tx_b)
    keys.append(jnp.where(
        okb, (u32(tid_b) << shift_t) | ob_src[None, :] | u32(src)[None, :],
        maxkey).reshape(-1))

    hsrc, hvalid, n_huge = compact_class(is_huge, huge_cap)
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    tyg = (t // tiles_x)[:, None]
    txg = (t % tiles_x)[:, None]
    okh = (hvalid[None, :]
           & (txg >= jnp.where(hvalid, tx0[hsrc], 1)[None, :])
           & (txg <= jnp.where(hvalid, tx1[hsrc], 0)[None, :])
           & (tyg >= jnp.where(hvalid, ty0[hsrc], 1)[None, :])
           & (tyg <= jnp.where(hvalid, ty1[hsrc], 0)[None, :]))
    oh = (jnp.zeros((1, huge_cap), jnp.uint32) if order6 is None else
          (u32(jnp.where(hvalid, order6[hsrc], 0)) << shift)[None, :])
    tp_h = tid_of(tyg[:, 0], txg[:, 0])[:, None]
    keys.append(
        jnp.where(okh,
                  (u32(tp_h) << shift_t) | oh | u32(hsrc)[None, :],
                  maxkey).reshape(-1)
    )
    big_dropped = (jnp.maximum(n_bigb - big_cap, 0)
                   + jnp.maximum(n_huge - huge_cap, 0))

    raw = jnp.concatenate(keys)
    n_raw = raw.shape[0]
    pow2 = 1 << (n_raw - 1).bit_length()
    if pow2 != n_raw:
        raw = jnp.concatenate([raw, jnp.full(pow2 - n_raw, maxkey)])
    skeys = jnp.sort(raw)
    # manual all-targets bisection: jnp.searchsorted lowers to a
    # per-target binary-search loop on TPU (~0.7 us/target measured)
    prefixes = (jnp.arange(n_tiles + 1, dtype=jnp.uint32) << shift_t)
    n_keys = skeys.shape[0]
    lo = jnp.zeros(n_tiles + 1, jnp.int32)
    hi = jnp.full(n_tiles + 1, n_keys, jnp.int32)

    def _bisect(_, lohi):
        lo, hi = lohi
        # clamp: converged state lo == hi == n_keys would otherwise read
        # skeys[n_keys] (JAX clamps the gather to the LAST key, which can
        # compare < prefix and push lo to n_keys + 1, inflating totals)
        mid = jnp.minimum((lo + hi) >> 1, n_keys - 1)
        below = skeys[mid] < prefixes
        return jnp.where(below, jnp.minimum(mid + 1, n_keys), lo), \
            jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, (n_keys - 1).bit_length() + 1, _bisect,
                               (lo, hi))
    bounds = lo
    starts = bounds[:-1]
    total = bounds[-1]
    kept_end = jnp.minimum(bounds[1:], item_cap)
    kept_start = jnp.minimum(starts, item_cap)
    counts = (kept_end - kept_start).astype(jnp.int32)
    overflow = (jnp.maximum(total - item_cap, 0) + big_dropped).astype(jnp.int32)

    mask = jnp.arange(item_cap, dtype=jnp.int32) < jnp.minimum(total, item_cap)
    head = skeys[:item_cap]
    items = jnp.where(mask, (head & ((1 << shift) - 1)).astype(jnp.int32), 0)
    t_of_item = jnp.where(mask, (head >> shift_t).astype(jnp.int32), 0)
    return items, t_of_item, kept_start, counts, overflow


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _tree_reduce(evs):
    """Pairwise lexicographic-(depth, color) min over a list of (d, c)
    pairs — the commutative blend rule of ``_blend_one_quad`` applied as
    a balanced tree (depth ceil(log2 n) instead of a serial chain).
    Shared by the solo and shared-stream kernels' row-tree loops."""
    while len(evs) > 1:
        nxt = []
        for a in range(0, len(evs) - 1, 2):
            d1, c1 = evs[a]
            d2, c2 = evs[a + 1]
            lt = (d2 < d1) | ((d2 == d1) & (c2 < c1))
            nxt.append((jnp.where(lt, d2, d1), jnp.where(lt, c2, c1)))
        if len(evs) % 2:
            nxt.append(evs[-1])
        evs = nxt
    return evs[0]


# VPU sub-block shape: one f32 vreg
PIECE_H = 8
PIECE_W = 128


REC_FIELDS = F_FIELDS + I_FIELDS


def _walk_block(rec_t, rows_ref, zmin_ref, nxv, py0, hf, *, tile_h,
                n_sub, sub, k_lo, k_hi, gbase, bq, opi, row_tree,
                acc, dmax0):
    """Walk ONE tile's octet segment within one DMA'd, transposed record
    block — the compute core shared verbatim by the solo and
    shared-stream kernels (they differ only in stream machinery).

    ``rec_t``: the block's records transposed to [bq, 24];
    ``k_lo``/``k_hi``: the tile's item range within this block;
    ``gbase``: global octet index of the block's first octet;
    ``acc``/``dmax0``: the tile's accumulator tuple (n_sub x (depth,
    color) [8,128] vregs) and occlusion-break state carried across
    blocks.  Returns (acc, dmax).

    Per octet of 8 items it evaluates whole [8, 128] pixel rows (quad in
    the sublane axis, pixel x in the lane axis; per-quad coefficients
    are [8, 1] vector loads — the previous kernel's ~22 SMEM scalar
    loads per quad were its measured bottleneck), reduces the 8 quads to
    the depth minimum with a 3-stage sublane butterfly, and merges into
    the accumulator rows.  The exact occlusion break ends the walk once
    the suffix-min of remaining near depths (``zmin_ref``) lies beyond
    the farthest accumulated pixel."""

    def load_octet(o):
        # clamp the load offset into the block (the trailing octets of a
        # group may fall past it; their coverage is killed by the segment
        # mask below, computed from the UNclamped index)
        oc = jnp.minimum(o, bq // 8 - 1)
        g8 = pl.multiple_of(oc * 8, 8)
        recs = [rec_t[pl.ds(g8, 8), f:f + 1]
                for f in range(N_BLEND_FIELDS + 4)]
        fro = list(jax.lax.bitcast_convert_type(r, jnp.float32)
                   for r in recs[:N_BLEND_FIELDS])
        iro = tuple(recs[N_BLEND_FIELDS:N_BLEND_FIELDS + 4])
        # out-of-segment items (the octet may straddle tile segments) die
        # by folding the mask into the coverage bounds once per octet
        # instead of a per-row mask op
        kv = o * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        kmask = (kv >= k_lo) & (kv < k_hi)
        fro[12] = jnp.where(kmask, fro[12], jnp.float32(jnp.inf))
        fro[13] = jnp.where(kmask, fro[13], jnp.float32(-jnp.inf))
        rb = rows_ref[jnp.minimum(gbase + o, rows_ref.shape[0] - 1)]
        # hoist the row-invariant halves of the plane evals: the 4
        # [8, 128] bases are built once per octet, not per row
        return (tuple(fro), iro, _eval_bases(nxv, fro),
                rb & 0xFF, rb >> 8)

    def eval_row_raw(fro, iro, bases, y):
        py = (py0 + y).astype(jnp.float32)
        ny = 1.0 - 2.0 * (py + 0.5) / hf
        cover, z, c = _eval_one_quad_row(ny, fro, iro, bases)
        covered = cover & (z == z)
        d = jnp.where(covered, z, jnp.inf)
        # uncovered lanes take INT32_MAX color so the (d, c) tie rule
        # below can never promote them (their d is +inf and every real
        # color word is smaller)
        c = jnp.where(covered, c, jnp.int32(2**31 - 1))
        return d, c

    def butterfly(d, c):
        # butterfly min over the 8 sublanes (= quads) under the
        # commutative lexicographic (depth, color bits) order — same
        # rule as _blend_one_quad, so the reduction order chosen here
        # (and the binner's item order) cannot change the frame.  (A
        # decomposed min-d-then-min-c-among-ties form is 14 vector ops
        # instead of 27 but measured 2.86 vs 2.77 ms at vd12 — the row
        # eval is latency-bound and the decomposition's 7-step serial
        # chain beats its op saving.)
        for shift in (4, 2, 1):
            d2 = pltpu.roll(d, shift, 0)
            c2 = pltpu.roll(c, shift, 0)
            lt = (d2 < d) | ((d2 == d) & (c2 < c))
            d = jnp.where(lt, d2, d)
            c = jnp.where(lt, c2, c)
        return d, c

    def merge(acc, y, d, c):
        out = []
        for i in range(n_sub):
            ad, ac = acc[2 * i], acc[2 * i + 1]
            upd = (sub == y - 8 * i) & (
                (d < ad) | ((d == ad) & (c < ac)))
            out += [jnp.where(upd, d, ad), jnp.where(upd, c, ac)]
        return tuple(out)

    # exact occlusion break: items are sorted front-to-back per tile, so
    # once the nearest depth among ALL remaining items (suffix-min,
    # zmin_ref) lies strictly beyond the farthest accumulated pixel
    # (+inf while any pixel is undrawn), nothing left can blend.  The
    # head octet may contain the previous tile's items (suffix not
    # applicable): always processed.
    o_hi = (k_hi + 7) // 8

    def octet_group_body(o, acc):
        # opi octets x 4 rows per iteration: each row's eval+reduce is
        # one long serial dependency chain (measured 175 ns/row alone),
        # so 4*opi independent rows in flight hide most of the latency.
        # Larger opi buys more ILP but wastes evals when grouped octets
        # have uneven row spans (iters = max span over the group) and
        # coarsens the occlusion-break granularity.  Measured at
        # 720p/vd12 (v5e, 59k items): opi 1/2/4/6/8/16 =
        # 4.08/3.45/3.01/2.67/2.85/4.64 ms — 6 is the sweet spot (16
        # spills vregs), hence the default.
        group = [load_octet(o + jj) for jj in range(opi)]

        if row_tree:
            # merge-tree row loop: the whole group shares one row base,
            # each row's opi octet results tree-reduce (depth
            # ceil(log2 opi)) to ONE accumulator merge.  The plain
            # loop's per-row acc merges form the iteration's longest
            # serial chain (~24 same-vreg selects at opi 6 = the fitted
            # 183 ns/row-iter stall, benches/kernel_cost_sim.py); the
            # tree cuts it ~4x.  Cost: iters = UNION span over the
            # group — measured +1.7% rows at order 42 (the order bits
            # already cluster bands).  The reduce is the same
            # commutative lexicographic min, so frames stay
            # bit-identical up to the documented 1-ulp contraction
            # variance (near-tie-proven parity test).
            ry0g = group[0][3]
            ry1g = group[0][4]
            for jj in range(1, opi):
                g = group[jj]
                act = o + jj < o_hi
                ry0g = jnp.minimum(ry0g, jnp.where(act, g[3], tile_h - 1))
                ry1g = jnp.maximum(ry1g, jnp.where(act, g[4], 0))

            def rows_body_tree(i, acc):
                y = ry0g + 4 * i
                for u in range(4):
                    # raw (un-reduced) [8,128] evals tree-combine
                    # ELEMENT-wise across the group's octets (the min
                    # over all 8*opi quads factors freely), so the
                    # 3-stage sublane butterfly runs ONCE per row
                    # instead of once per octet — ~30 fewer vector ops
                    # per row-group at opi 6
                    evs = []
                    for fro, iro, bases, r0m, r1m in group:
                        d, c = eval_row_raw(fro, iro, bases, y + u)
                        ok = (y + u >= r0m) & (y + u <= r1m)
                        evs.append((
                            jnp.where(ok, d, jnp.inf),
                            jnp.where(ok, c, jnp.int32(2**31 - 1)),
                        ))
                    d, c = butterfly(*_tree_reduce(evs))
                    acc = merge(acc, y + u, d, c)
                return acc

            iters = (ry1g - ry0g + 4) // 4
            return jax.lax.fori_loop(0, iters, rows_body_tree, acc)

        def rows_body(i, acc):
            for fro, iro, bases, ry0, ry1 in group:
                y = ry0 + 4 * i
                evs = [butterfly(*eval_row_raw(fro, iro, bases, y + u))
                       for u in range(4)]
                for u, (d, c) in enumerate(evs):
                    # kills rows past ry1 AND whole iterations past the
                    # shorter octet's range
                    d = jnp.where(y + u <= ry1, d, jnp.inf)
                    acc = merge(acc, y + u, d, c)
            return acc

        iters = (group[0][4] - group[0][3] + 4) // 4
        for jj in range(1, opi):
            g = group[jj]
            iters = jnp.maximum(
                iters, jnp.where(o + jj < o_hi,
                                 (g[4] - g[3] + 4) // 4, 0))
        return jax.lax.fori_loop(0, iters, rows_body, acc)

    def w_cond(st):
        o, dmax, _ = st
        # clamp: the loop's FINAL condition check runs with o up to
        # o_hi + opi - 1, which can index past the zmin scratch (the
        # value is masked out by `o < o_hi`, but the read itself must
        # stay in bounds)
        zm = zmin_ref[jnp.minimum(gbase + o, zmin_ref.shape[0] - 1)]
        return (o < o_hi) & ((o * 8 < k_lo) | (zm <= dmax))

    def w_body(st):
        o, dmax, acc = st
        acc = octet_group_body(o, acc)
        # farthest accumulated pixel, refreshed every ~4 octets (the
        # full cross-lane reduce serializes against the blend chain — a
        # stale dmax is merely conservative)
        def _dmax(a):
            m = a[0]
            for i in range(1, n_sub):
                m = jnp.maximum(m, a[2 * i])
            return jnp.max(m)

        if opi >= 4:
            dmax = _dmax(acc)
        else:
            dmax = jax.lax.cond((o & 2) == 2, _dmax, lambda a: dmax, acc)
        return o + opi, dmax, acc

    _, dmax1, acc = jax.lax.while_loop(
        w_cond, w_body, (jnp.maximum(k_lo, 0) // 8, dmax0, acc))
    return acc, dmax1


def _split_refs(args, with_init: bool, with_geom: bool):
    """Unpack the kernels' varargs (everything after ``y0_ref``) according
    to the optional-feature flags.  Operand order is fixed by
    ``rasterize_pallas``: [geom scalar-prefetch (2)] | meta+records ANY
    inputs (5) | [geom stream ANY inputs (4)] | [init blocks (2)] |
    out blocks (2) | [geom ANY outputs (5)] | base scratch (8) |
    [geom scratch (5)]."""
    i = 0
    gscal = gin = gout = gscratch = None
    if with_geom:
        gscal = args[i:i + 2]
        i += 2
    meta = args[i:i + 5]
    i += 5
    if with_geom:
        gin = args[i:i + 4]
        i += 4
    init = (None, None)
    if with_init:
        init = args[i:i + 2]
        i += 2
    outs = args[i:i + 2]
    i += 2
    if with_geom:
        gout = args[i:i + 5]
        i += 5
    scratch = args[i:i + 8]
    i += 8
    if with_geom:
        gscratch = args[i:i + 5]
    return gscal, meta, gin, init, outs, gout, scratch, gscratch


def _fused_geom_pass(step, gscal, gin, gout, gscratch, *, gbr, gblocks,
                     bps, width, height, backface_culling):
    """Next-frame stage A computed INSIDE the raster call (the
    frames-in-flight device pipeline): each grid step processes ``bps``
    [gbr, 128] blocks of the NEXT frame's gather stream with the exact
    geometry-kernel math (geometry_pallas.geom_block_compute — shared
    code), writing valid/bbx/bby/depth/subpixel to ANY-space outputs.

    Why here: every input-bearing Pallas call pays a flat ~0.9 ms
    dispatch stall on this toolchain REGARDLESS of operand count
    (NOTES.md round 2), and explicit cross-call adjacency does not share
    the stall in practice (benches/pipeline_experiment.py: 3.57 vs 3.69
    ms serial).  Folding the geometry pass into the already-taxed raster
    call deletes one taxed call per frame outright.  The ~0.05 ms of
    stage-A compute and ~2 MB of DMA disappear into the raster's idle
    lanes; outputs feed the NEXT frame's mid stage as ``pre_geom``."""
    (gscalf, gscali) = gscal
    (gq_hbm, gwx_hbm, gwy_hbm, gwz_hbm) = gin
    (gvalid_hbm, gbbx_hbm, gbby_hbm, gdn_hbm, gsub_hbm) = gout
    (gq_v, gw_v, goi_v, gdn_v, gsem) = gscratch

    for j in range(bps):
        gb = step * bps + j

        @pl.when(gb < gblocks)
        def _(gb=gb):
            off = pl.multiple_of(gb * gbr, gbr)
            ins = [
                pltpu.make_async_copy(gq_hbm.at[pl.ds(off, gbr)],
                                      gq_v, gsem.at[0]),
                pltpu.make_async_copy(gwx_hbm.at[pl.ds(off, gbr)],
                                      gw_v.at[0], gsem.at[1]),
                pltpu.make_async_copy(gwy_hbm.at[pl.ds(off, gbr)],
                                      gw_v.at[1], gsem.at[2]),
                pltpu.make_async_copy(gwz_hbm.at[pl.ds(off, gbr)],
                                      gw_v.at[2], gsem.at[3]),
            ]
            for c in ins:
                c.start()
            for c in ins:
                c.wait()
            valid, bbx, bby, dn, sub = geom_ops.geom_block_compute(
                gq_v[:], gw_v[0], gw_v[1], gw_v[2], gscalf, gscali,
                gb * (gbr * 128), width=width, height=height,
                backface_culling=backface_culling)
            goi_v[0, :, :] = valid
            goi_v[1, :, :] = bbx
            goi_v[2, :, :] = bby
            goi_v[3, :, :] = sub
            gdn_v[:, :] = dn
            outs = [
                pltpu.make_async_copy(goi_v.at[0],
                                      gvalid_hbm.at[pl.ds(off, gbr)],
                                      gsem.at[4]),
                pltpu.make_async_copy(goi_v.at[1],
                                      gbbx_hbm.at[pl.ds(off, gbr)],
                                      gsem.at[5]),
                pltpu.make_async_copy(goi_v.at[2],
                                      gbby_hbm.at[pl.ds(off, gbr)],
                                      gsem.at[6]),
                pltpu.make_async_copy(gdn_v, gdn_hbm.at[pl.ds(off, gbr)],
                                      gsem.at[7]),
                pltpu.make_async_copy(goi_v.at[3],
                                      gsub_hbm.at[pl.ds(off, gbr)],
                                      gsem.at[8]),
            ]
            for c in outs:
                c.start()
            for c in outs:
                c.wait()


def _raster_kernel(y0_ref, *args,
                   height, width, tile_h, tile_w, tiles_x,
                   tiles_per_step, pin_mul, with_init, opi=2,
                   row_tree=False, bq=BLOCK_Q, geom_cfg=None):
    gscal, meta_in, gin, init, outs, gout, scratch, gscratch = _split_refs(
        args, with_init, geom_cfg is not None)
    starts_hbm, counts_hbm, rows_hbm, zmin_hbm, rec_hbm = meta_in
    initc_ref, initd_ref = init
    color_ref, depth_ref = outs
    (starts_ref, counts_ref, rows_ref, zmin_ref,
     rec_vmem, rec_t, sem, meta_sem) = scratch
    """Octet rasterizer: per 16x128 framebuffer tile (VREG-resident
    accumulator, 2 sublane-groups), the tile's item stream is DMA'd
    HBM -> VMEM in double-buffered 256-record blocks and processed 8 quads
    at a time — quad in the SUBLANE axis, pixel x in the LANE axis.  Each
    covered pixel row evaluates all 8 quads at once ([8, 128] vregs whose
    per-quad coefficients are [8, 1] vector loads — the previous kernel's
    ~22 SMEM scalar loads per quad were its measured bottleneck), reduces
    them to the depth minimum with a 3-stage sublane butterfly
    (pltpu.roll), and merges into the accumulator rows.

    Depth-min blending == the sequential first-drawn-wins blend of
    rasterize_jnp (framebuffer.rs:325 semantics) up to exact-equal-depth
    ties, and is order-independent, which is what lets the binner order
    items front-to-back (by quantized near depth).  The per-octet covered
    row range (``rows_ref``) and the segmented suffix-min of near depth
    over the rest of the tile's items (``zmin_ref``) are precomputed on
    the XLA side per aligned group of 8 items and prefetched to SMEM: the
    row loop only walks rows the octet can touch, and once every pixel of
    the tile holds a depth nearer than everything remaining, the rest of
    the stream is skipped — the reference's Hi-Z early-out
    (hiz_buffer.rs:90-138) made EXACT: only provably-losing blends drop.

    Each grid step covers ``tiles_per_step`` adjacent tiles (one 256-lane
    out block): the per-step fixed cost measured ~2 us and both tiles'
    first record blocks are DMA'd up front, hiding the second tile's
    stream latency behind the first tile's compute."""
    step = pl.program_id(0)
    steps_x = tiles_x // tiles_per_step
    n_sub = tile_h // 8

    # Tile/octet metadata rides as ANY-space inputs DMA'd into PERSISTENT
    # SMEM scratch exactly once, on the first grid step.  Scalar-prefetch
    # (and SMEM-block-input) arrays are refetched per grid step — measured
    # ~4 us/step = ~0.9 ms/frame across 225 steps for even a 460-int
    # array, the entire empty-stream floor of the old kernel.
    metas = ((starts_hbm, starts_ref), (counts_hbm, counts_ref),
             (rows_hbm, rows_ref), (zmin_hbm, zmin_ref))

    @pl.when(step == 0)
    def _():
        for i, (src, dst) in enumerate(metas):
            pltpu.make_async_copy(src, dst, meta_sem.at[i]).start()
        for i, (src, dst) in enumerate(metas):
            pltpu.make_async_copy(src, dst, meta_sem.at[i]).wait()

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    wf = jnp.float32(width)
    hf = jnp.float32(height)
    inff = jnp.full((8, 128), jnp.inf, jnp.float32)
    skyv = jnp.full((8, 128), SKY_I32, jnp.int32)

    def tile_acc0(j):
        if not with_init:
            return tuple([inff, skyv] * n_sub)
        out = []
        for i in range(n_sub):
            out.append(initd_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)])
            out.append(initc_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)])
        return tuple(out)

    def tile_geo(st, j):
        ty = st // steps_x
        tx = (st % steps_x) * tiles_per_step + j
        t = ty * tiles_x + tx
        count = counts_ref[t]
        base = starts_ref[t]
        first_blk = base // bq
        last_blk = (base + jnp.maximum(count, 1) - 1) // bq
        nblocks = jnp.where(count > 0, last_blk - first_blk + 1, 0)
        return t, tx, ty, count, base, first_blk, nblocks

    def dma(slot, first_blk, b):
        off = pl.multiple_of((first_blk + b) * bq, bq)
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, bq)],
            rec_vmem.at[:, pl.ds(slot * bq, bq)],
            sem.at[slot],
        )

    geo = [tile_geo(step, j) for j in range(tiles_per_step)]

    # cross-step prefetch: every step's first record blocks are started at
    # the END of the previous step, so their DMA latency hides behind a
    # whole tile-pair of compute instead of a few address calculations.
    # Step 0 starts its own.
    def start_first_blocks(st):
        for j in range(tiles_per_step):
            _, _, _, _, _, fb, nb = tile_geo(st, j)

            @pl.when(nb > 0)
            def _(fb=fb, j=j):
                dma(2 * j, fb, 0).start()

    @pl.when(step == 0)
    def _():
        start_first_blocks(step)

    def do_tile(j):
        t, tx, ty, count, base, first_blk, nblocks = geo[j]
        slot0 = 2 * j
        # y0_ref[0]: global pixel row of the buffer's first row — nonzero
        # when rasterizing a row BAND of a larger frame (tp-sharded
        # rendering, possibly a traced per-shard axis_index product); NDC
        # math stays global while tiles/rows stay band-local.  Rides as a
        # 1-element scalar-prefetch operand: single-element prefetch
        # arrays do NOT trigger the flat per-call input tax (NOTES.md)
        py0 = y0_ref[0] + ty * tile_h
        px0 = tx * 128
        px = jnp.float32(px0) + lane.astype(jnp.float32)
        nxv = (2.0 * (px + 0.5) - wf) / wf  # matches _pixel_ndc bit-exact

        def block_body(b, carry):
            acc, dmax = carry
            slot = slot0 + b % 2

            @pl.when(b + 1 < nblocks)
            def _():
                dma(slot0 + (b + 1) % 2, first_blk, b + 1).start()

            dma(slot, first_blk, b).wait()
            # records arrive field-major [24, 256] (narrow DMA, no
            # XLA-side transpose); one in-kernel transpose per block makes
            # each item a row so per-octet coefficients are aligned [8, 1]
            # vector loads
            rec_t[:] = jnp.transpose(
                rec_vmem[:, pl.ds(pl.multiple_of(slot * bq, bq),
                                  bq)])
            blk0 = (first_blk + b) * bq
            k_lo = jnp.maximum(base - blk0, 0)
            k_hi = jnp.minimum(base + count - blk0, bq)
            gbase = blk0 // 8  # global octet index of the block's first
            acc, dmax = _walk_block(
                rec_t, rows_ref, zmin_ref, nxv, py0, hf,
                tile_h=tile_h, n_sub=n_sub, sub=sub, k_lo=k_lo, k_hi=k_hi,
                gbase=gbase, bq=bq, opi=opi, row_tree=row_tree,
                acc=acc, dmax0=dmax)
            return acc, dmax

        acc, _ = jax.lax.fori_loop(0, nblocks, block_body,
                                   (tile_acc0(j), jnp.float32(jnp.inf)))
        for i in range(n_sub):
            depth_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = acc[2 * i]
            color_ref[pl.ds(i * 8, 8), pl.ds(128 * j, 128)] = acc[2 * i + 1]

    for j in range(tiles_per_step):
        do_tile(j)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        start_first_blocks(step + 1)

    if geom_cfg is not None:
        _fused_geom_pass(step, gscal, gin, gout, gscratch, **geom_cfg)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "out_h",
                     "interpret", "tiles_per_step", "octets_per_iter",
                     "stream_group", "row_tree", "block_q",
                     "geom_backface", "group_rows"),
)
def rasterize_pallas(records, tile_starts, tile_counts, octet_rows,
                     octet_zmin, init_color=None, init_depth=None,
                     next_geom=None, *,
                     height: int, width: int, tile_h: int, tile_w: int,
                     out_h: int | None = None,
                     interpret: bool = False,
                     tiles_per_step: int | None = None,
                     y0_px=0, octets_per_iter: int = 6,
                     stream_group: int = 1, row_tree: bool = False,
                     block_q: int = BLOCK_Q, geom_backface: bool = True,
                     group_rows: int = 1):
    """Binned, streamed, tiled Pallas rasterizer over the flat item stream.

    ``records`` i32[24, ITEM_CAP] — field-major quad records (floats
    bitcast, rows len(REC_FIELDS).. zero-padded to the sublane tile), in
    binned item order; ``tile_starts``/``tile_counts``
    i32[T] delimit each tile's segment (NOT aligned); ``octet_rows``
    i32[ITEM_CAP // 8] — covered tile-local row range (ry0 | ry1 << 8) per
    aligned group of 8 items; ``octet_zmin`` f32[ITEM_CAP // 8] — the
    suffix-min of near depth from each group to the end of its tile's
    segment (drives the exact occlusion break).  ``out_h`` (default
    height) is the padded buffer height when the framebuffer is not a
    tile multiple — NDC math always uses the true ``height``; callers
    crop rows [height:out_h].  Returns (color, depth) of shape
    [out_h, width].

    ``next_geom`` (optional) = (quads u32[GQ2], wx, wy, wz f32[GQ2],
    scalf f32[19], scali i32[2]): fuses the NEXT frame's stage-A geometry
    pass into this call (see _fused_geom_pass) and returns an extra dict
    {valid, bbx, bby, depth_near, subpixel} of flat [GQ2] arrays —
    bit-identical to geometry_pallas.project_cull_pallas on the same
    inputs (shared math; tested)."""
    out_h = out_h or height
    assert out_h % tile_h == 0 and width % tile_w == 0
    assert tile_w == 128 and tile_h % 8 == 0
    if group_rows > 1:
        # pair-row shared stream (VERDICT r4 #3): the caller binned with
        # tile_perm=(group_rows, stream_group) — layout must line up
        # exactly (no degrade), else the kernel would read the wrong
        # segments
        assert group_rows == 2 and stream_group > 1
        assert out_h % (group_rows * tile_h) == 0, (out_h, tile_h)
        assert (width // tile_w) % stream_group == 0
        assert 128 * stream_group <= 1024
    assert records.shape[0] == 24 and records.shape[1] % 256 == 0
    # block_q is a request, not a contract: clamp to the record capacity
    # (tiny test scenes) and fall back to the base block on non-divisible
    # caps, so RenderConfig defaults tuned for 720p stay safe everywhere.
    block_q = min(block_q, records.shape[1])
    if records.shape[1] % block_q or block_q % 256:
        block_q = BLOCK_Q
    if group_rows > 1:
        # one 2 x stream_group block per step; the binner's tile_perm
        # fixed the layout, so no degrade logic applies
        tps = stream_group
    elif tiles_per_step is None:
        # widest even divisor with a <=1024-lane out block: more tiles per
        # step = fewer grid steps and deeper cross-tile DMA prefetch
        # (tps=5 measured ~0.1-0.3 ms faster than tps=2 at 720p/vd12).
        # A shared stream_group additionally requires stream_group | tps;
        # the knob is a MAX — degrade to the largest group size that has a
        # compatible tps (always terminates: sg=1 admits tps=1), so narrow
        # frames (tiles_x=1 tests) run the solo kernel unchanged.
        tiles_x = width // tile_w
        tps = None
        while tps is None:
            tps = next((t for t in (8, 6, 5, 4, 3, 2, 1)
                        if tiles_x % t == 0 and 128 * t <= 1024
                        and t % stream_group == 0), None)
            if tps is None:
                stream_group -= 1
    tiles_y, tiles_x = out_h // tile_h, width // tile_w
    n_tiles = tiles_y * tiles_x
    if tiles_per_step is not None and group_rows == 1:
        tps = tiles_per_step
        assert tiles_x % tps == 0

    with_init = init_color is not None
    n_steps = n_tiles // (tps * group_rows)

    # fused next-frame geometry pass sizing (see _fused_geom_pass)
    geom_cfg = None
    geom_in = ()
    geom_scal = ()
    if next_geom is not None:
        gq2, gwx, gwy, gwz, gscalf, gscali = next_geom
        grows = gq2.shape[0] // 128
        assert gq2.shape[0] % 128 == 0, "geom stream must be lane-aligned"
        gbr = 64
        while grows % gbr:
            gbr //= 2
        gblocks = grows // gbr
        bps = -(-gblocks // n_steps)
        geom_cfg = dict(gbr=gbr, gblocks=gblocks, bps=bps, width=width,
                        height=height, backface_culling=geom_backface)
        bcast = jax.lax.bitcast_convert_type
        geom_in = (bcast(gq2, jnp.int32).reshape(grows, 128),
                   gwx.reshape(grows, 128), gwy.reshape(grows, 128),
                   gwz.reshape(grows, 128))
        geom_scal = (gscalf, gscali)

    if stream_group > 1:
        # shared-stream variant: stream_group adjacent tiles share one
        # record DMA chain + transpose (bit-identical frames; see
        # _raster_kernel_shared)
        assert tps % stream_group == 0, (tps, stream_group)
        kernel = functools.partial(
            _raster_kernel_shared, height=height, width=width,
            tile_h=tile_h, tiles_x=tiles_x, tiles_per_step=tps,
            stream_group=stream_group, with_init=with_init,
            opi=octets_per_iter, row_tree=row_tree, bq=block_q,
            geom_cfg=geom_cfg, group_rows=group_rows,
        )
    else:
        kernel = functools.partial(
            _raster_kernel, height=height, width=width, tile_h=tile_h,
            tile_w=tile_w, tiles_x=tiles_x, tiles_per_step=tps,
            # interpret mode runs through XLA and must pin mul rounding
            # like the jnp twin; Mosaic-compiled kernels never contract
            pin_mul=interpret, with_init=with_init, opi=octets_per_iter,
            row_tree=row_tree, bq=block_q, geom_cfg=geom_cfg,
        )
    steps_x = tiles_x // tps
    blk_h = group_rows * tile_h
    n_oct = records.shape[1] // 8
    n_slots = (2 * (tps // stream_group) if stream_group > 1 else 2 * tps)

    def _fb_block(st, *_scal):
        return (st // steps_x, st % steps_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + (2 if geom_cfg else 0),
        grid=(n_steps,),
        in_specs=[
            # metadata + records all stay in HBM; the kernel DMAs the
            # metadata to persistent SMEM once (see _raster_kernel note)
            pl.BlockSpec(memory_space=pl.ANY),  # tile starts
            pl.BlockSpec(memory_space=pl.ANY),  # tile counts
            pl.BlockSpec(memory_space=pl.ANY),  # octet rows
            pl.BlockSpec(memory_space=pl.ANY),  # octet zmin
            pl.BlockSpec(memory_space=pl.ANY),  # records
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] * 4 if geom_cfg else [])
        + ([
            pl.BlockSpec((blk_h, 128 * tps), _fb_block,
                         memory_space=pltpu.VMEM),  # init color
            pl.BlockSpec((blk_h, 128 * tps), _fb_block,
                         memory_space=pltpu.VMEM),  # init depth
        ] if with_init else []),
        out_specs=[
            pl.BlockSpec((blk_h, 128 * tps), _fb_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_h, 128 * tps), _fb_block,
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] * 5 if geom_cfg else []),
        scratch_shapes=[
            pltpu.SMEM((n_tiles,), jnp.int32),
            pltpu.SMEM((n_tiles,), jnp.int32),
            pltpu.SMEM((n_oct,), jnp.int32),
            pltpu.SMEM((n_oct,), jnp.float32),
            pltpu.VMEM((24, n_slots * block_q), jnp.int32),
            pltpu.VMEM((block_q, 24), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA((4,)),
        ] + ([
            pltpu.VMEM((geom_cfg["gbr"], 128), jnp.int32),      # gq_v
            pltpu.VMEM((3, geom_cfg["gbr"], 128), jnp.float32),  # gw_v
            pltpu.VMEM((4, geom_cfg["gbr"], 128), jnp.int32),   # goi_v
            pltpu.VMEM((geom_cfg["gbr"], 128), jnp.float32),    # gdn_v
            pltpu.SemaphoreType.DMA((9,)),
        ] if geom_cfg else []),
    )
    y0_arr = jnp.asarray(y0_px, jnp.int32).reshape(1)
    out_shape = [
        jax.ShapeDtypeStruct((out_h, width), jnp.int32),
        jax.ShapeDtypeStruct((out_h, width), jnp.float32),
    ]
    if geom_cfg:
        grows = geom_in[0].shape[0]
        out_shape += [
            jax.ShapeDtypeStruct((grows, 128), jnp.int32),    # valid
            jax.ShapeDtypeStruct((grows, 128), jnp.int32),    # bbx
            jax.ShapeDtypeStruct((grows, 128), jnp.int32),    # bby
            jax.ShapeDtypeStruct((grows, 128), jnp.float32),  # depth_near
            jax.ShapeDtypeStruct((grows, 128), jnp.int32),    # subpixel
        ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(y0_arr, *geom_scal, tile_starts, tile_counts, octet_rows, octet_zmin,
      records, *geom_in,
      *((init_color, init_depth) if with_init else ()))
    color, depth = outs[0], outs[1]
    if geom_cfg:
        gq_flat = geom_in[0].shape[0] * 128
        gv, gbx, gby, gdn, gsb = outs[2:7]
        return color, depth, dict(
            valid=gv.reshape(gq_flat) != 0,
            bbx=gbx.reshape(gq_flat),
            bby=gby.reshape(gq_flat),
            depth_near=gdn.reshape(gq_flat),
            subpixel=gsb.reshape(gq_flat),
        )
    return color, depth


def _raster_kernel_shared(y0_ref, *args,
                          height, width, tile_h, tiles_x,
                          tiles_per_step, stream_group, with_init, opi=6,
                          row_tree=False, bq=BLOCK_Q, geom_cfg=None,
                          group_rows=1):
    """Octet rasterizer with a SHARED record stream per tile group.

    Identical per-pixel math, item stream, row spans and blend order as
    ``_raster_kernel`` — frames are bit-identical (tested).  What changes
    is the stream machinery: adjacent tiles' item segments are CONTIGUOUS
    in the flat binned stream (build_tile_lists emits tiles in row-major
    order), so a group of ``stream_group`` adjacent tiles can share ONE
    double-buffered 256-record DMA chain and ONE per-block transpose.
    Each block is walked once per member tile with that tile's
    [k_lo, k_hi) segment clamp, its own nx window, accumulator and
    occlusion-break state — exactly the straddle-octet masking the solo
    kernel already does at block boundaries, applied at group scale.

    Motivation (measured, NOTES r2): the solo kernel's per-tile fixed
    cost is ~2 us x 450 tiles at 720p — geo/DMA-issue/transpose/loop
    machinery, not row evals.  Sharing the stream across ``stream_group``
    tiles divides the DMA issues, transposes and partial-block overlap
    by the group size; row-eval work is unchanged by construction.
    Costs: the group's accumulators stay live across the whole combined
    segment (stream_group x n_sub x 2 vregs) — vreg pressure bounds the
    useful group size — and a tile's octets can arrive one block later
    than solo (its segment is walked inside the shared chain).

    ``group_rows=2`` (the pair-row variant, VERDICT r4 #3): each grid
    step's group covers a 2 x stream_group BLOCK of tiles (out block
    2*tile_h x 128*stream_group) sharing one DMA chain — possible only
    because build_tile_lists emitted tiles in group-major order
    (``tile_perm``), making the block's 2*stream_group segments
    contiguous.  Member tile ids are then simply
    ``step * n_members + i``; accumulator pressure doubles
    (2 x stream_group x n_sub x 2 vregs — the measured spill bound)."""
    gscal, meta_in, gin, init, outs, gout, scratch, gscratch = _split_refs(
        args, with_init, geom_cfg is not None)
    starts_hbm, counts_hbm, rows_hbm, zmin_hbm, rec_hbm = meta_in
    initc_ref, initd_ref = init
    color_ref, depth_ref = outs
    (starts_ref, counts_ref, rows_ref, zmin_ref,
     rec_vmem, rec_t, sem, meta_sem) = scratch
    step = pl.program_id(0)
    steps_x = tiles_x // tiles_per_step
    n_groups = tiles_per_step // stream_group
    n_members = group_rows * stream_group
    if group_rows > 1:
        assert n_groups == 1, "pair-row mode runs one group per step"
    n_sub = tile_h // 8

    metas = ((starts_hbm, starts_ref), (counts_hbm, counts_ref),
             (rows_hbm, rows_ref), (zmin_hbm, zmin_ref))

    @pl.when(step == 0)
    def _():
        for i, (src, dst) in enumerate(metas):
            pltpu.make_async_copy(src, dst, meta_sem.at[i]).start()
        for i, (src, dst) in enumerate(metas):
            pltpu.make_async_copy(src, dst, meta_sem.at[i]).wait()

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    wf = jnp.float32(width)
    hf = jnp.float32(height)
    inff = jnp.full((8, 128), jnp.inf, jnp.float32)
    skyv = jnp.full((8, 128), SKY_I32, jnp.int32)

    def member_offsets(j):
        # (row, col) offset of member j's tile within the step's out block
        if group_rows == 1:
            return 0, 128 * j
        r, c = divmod(j, stream_group)
        return r * tile_h, 128 * c

    def tile_acc0(j):
        if not with_init:
            return tuple([inff, skyv] * n_sub)
        ro, co = member_offsets(j)
        out = []
        for i in range(n_sub):
            out.append(initd_ref[pl.ds(ro + i * 8, 8), pl.ds(co, 128)])
            out.append(initc_ref[pl.ds(ro + i * 8, 8), pl.ds(co, 128)])
        return tuple(out)

    def tile_geo(st, j):
        # j: tile index within the step (0..n_groups*n_members)
        if group_rows == 1:
            ty = st // steps_x
            tx = (st % steps_x) * tiles_per_step + j
            t = ty * tiles_x + tx
        else:
            r, c = divmod(j, stream_group)
            ty = (st // steps_x) * group_rows + r
            tx = (st % steps_x) * stream_group + c
            # group-major stream ids (build_tile_lists tile_perm): the
            # step's block owns ids [st*n_members, (st+1)*n_members)
            t = st * n_members + j
        return t, tx, ty, counts_ref[t], starts_ref[t]

    def group_geo(st, g):
        # combined contiguous segment of the group's member tiles
        t0, _, _, _, base0 = tile_geo(st, g * n_members)
        tl, _, _, cl, bl = tile_geo(st, (g + 1) * n_members - 1)
        total = bl + cl - base0
        first_blk = base0 // bq
        last_blk = (base0 + jnp.maximum(total, 1) - 1) // bq
        nblocks = jnp.where(total > 0, last_blk - first_blk + 1, 0)
        return first_blk, nblocks

    def dma(slot, first_blk, b):
        off = pl.multiple_of((first_blk + b) * bq, bq)
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, bq)],
            rec_vmem.at[:, pl.ds(slot * bq, bq)],
            sem.at[slot],
        )

    def start_first_blocks(st):
        for g in range(n_groups):
            fb, nb = group_geo(st, g)

            @pl.when(nb > 0)
            def _(fb=fb, g=g):
                dma(2 * g, fb, 0).start()

    @pl.when(step == 0)
    def _():
        start_first_blocks(step)

    def do_group(g):
        first_blk, nblocks = group_geo(step, g)
        slot0 = 2 * g
        geo = [tile_geo(step, g * n_members + i)
               for i in range(n_members)]
        # per-member pixel row base (pair-row members span two tile rows;
        # identical values CSE in the single-row case)
        py0s = [y0_ref[0] + gi[2] * tile_h for gi in geo]
        nxs = []
        for _, tx, _, _, _ in geo:
            px = jnp.float32(tx * 128) + lane.astype(jnp.float32)
            nxs.append((2.0 * (px + 0.5) - wf) / wf)  # == _pixel_ndc

        def block_body(b, carry):
            accs, dmaxs = carry
            slot = slot0 + b % 2

            @pl.when(b + 1 < nblocks)
            def _():
                dma(slot0 + (b + 1) % 2, first_blk, b + 1).start()

            dma(slot, first_blk, b).wait()
            rec_t[:] = jnp.transpose(
                rec_vmem[:, pl.ds(pl.multiple_of(slot * bq, bq),
                                  bq)])
            blk0 = (first_blk + b) * bq
            gbase = blk0 // 8

            def walk_tile(i, acc, dmax0):
                _, _, _, count, base = geo[i]
                k_lo = jnp.maximum(base - blk0, 0)
                k_hi = jnp.minimum(base + count - blk0, bq)
                return _walk_block(
                    rec_t, rows_ref, zmin_ref, nxs[i], py0s[i], hf,
                    tile_h=tile_h, n_sub=n_sub, sub=sub,
                    k_lo=k_lo, k_hi=k_hi, gbase=gbase, bq=bq, opi=opi,
                    row_tree=row_tree, acc=acc, dmax0=dmax0)

            new_accs, new_dmaxs = [], []
            for i in range(n_members):
                a, dm = walk_tile(i, accs[i], dmaxs[i])
                new_accs.append(a)
                new_dmaxs.append(dm)
            return tuple(new_accs), tuple(new_dmaxs)

        accs0 = tuple(tile_acc0(g * n_members + i)
                      for i in range(n_members))
        dmaxs0 = tuple(jnp.float32(jnp.inf) for _ in range(n_members))
        accs, _ = jax.lax.fori_loop(0, nblocks, block_body, (accs0, dmaxs0))
        for i in range(n_members):
            ro, co = member_offsets(g * n_members + i)
            for s in range(n_sub):
                depth_ref[pl.ds(ro + s * 8, 8),
                          pl.ds(co, 128)] = accs[i][2 * s]
                color_ref[pl.ds(ro + s * 8, 8),
                          pl.ds(co, 128)] = accs[i][2 * s + 1]

    for g in range(n_groups):
        do_group(g)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        start_first_blocks(step + 1)

    if geom_cfg is not None:
        _fused_geom_pass(step, gscal, gin, gout, gscratch, **geom_cfg)


# The paired half-tile kernel (_raster_kernel_pair / rasterize_pallas_pair,
# tile_w=64: two 16x64 tiles per [8, 128] row eval) was built, measured, and
# REMOVED in round 4: 5.6 ms vs 2.54 ms for the shared-stream octet kernel at
# 720p/vd12 — strictly dominated on this core (64-px tiles grow the binned
# stream ~30%, union row spans eat ~25%, and per-half stream machinery
# doubles).  Full post-mortem in NOTES.md ("Paired half-tile raster"); see
# git history for the implementation.


def pick_tile(height: int, width: int) -> tuple[int, int]:
    """Choose a tile for the octet kernel: width exactly one lane group
    (128); height 16 always — non-multiple framebuffer heights render
    into a padded buffer and crop (rendering/pipeline.py).  Both
    neighbors were measured worse at vd12: 24-row tiles (grid-step saving
    eaten by the extra merge select per row and coarser row ordering) and
    8-row tiles (raster 4.3 vs 3.1 ms: tile duplication and doubled
    per-tile machinery beat the halved row spans)."""
    if width % 128:
        raise ValueError(f"width {width} must be divisible by 128")
    return 16, 128


# NOTE on record layout (measured on v5e): streaming records into SMEM and
# reading ~20 scalars per quad costs ~195 ns per quad-tile pair; an
# alternative layout with one VMEM row per quad (single vector load + static
# lane extracts + vector bitcast) measured ~291 ns — vreg lane extraction is
# slower than scalar SMEM loads on this core, so the SMEM layout stays.
