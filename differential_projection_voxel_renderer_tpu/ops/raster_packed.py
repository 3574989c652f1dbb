"""Sub-column-packed Pallas rasterizer: 32 quads per row evaluation.

The octet kernel (ops/raster.py) evaluates 8 quads x 128 pixel lanes per
row step.  Terrain quads are narrow (p50 ~7x3 px at vd12), so most of the
128-lane window is dead work for most quads.  This kernel packs FOUR
32-pixel sub-columns ("buckets") side by side: each lane group evaluates
its own bucket's 8 quads, so one [8, 128] row evaluation covers up to 32
quads — raster compute is mostly row evaluations, and packing cuts their
count ~3x.

Binning (``build_bin_lists``) generalizes ops/raster.build_tile_lists:

- every 16x128 framebuffer tile owns FIVE bins, laid out consecutively in
  one flat sorted item stream: bin 0 = "wide" quads (bucket span > 2,
  rendered full-width exactly like the old kernel), bins 1..4 = the four
  32-px buckets (narrow quads, duplicated per covered bucket).
- within-bin front-to-back order comes for FREE from the compaction sort
  (the pipeline compacts by a (quantized-near-depth, stream-index) key),
  so bin keys fit int32: bin << 16 | compacted-index.
- bin segments are 8-ALIGNED in the stream: after the radix sort, items
  are re-laid-out scatter-free (rank arithmetic + one repeat + one
  gather); pad slots carry a harmless duplicate record and are killed by
  the kernel's per-bin count mask and inert metadata.
- the per-octet row-range and depth-suffix-min metadata of the old kernel
  carry over, segmented per BIN (finer than per tile — the exact
  occlusion break still only skips provably-losing work, per bucket).

Blending is the commutative lexicographic (depth, color-bits) min
(ops/raster._blend_one_quad), so the changed item order and duplicated
narrow quads cannot change the frame: the packed kernel is bit-identical
to ``rasterize_jnp`` on the same quad set (tests/test_render.py).

Reference scope: the span walker / stripe renderer this replaces is
src/rendering/span_walker.rs:283-392 with the Rayon stripe split of
framebuffer.rs:392-431; the packing itself has no reference counterpart —
it is a TPU-lane-occupancy design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import (
    BLOCK_Q,
    N_BLEND_FIELDS,
    SKY_I32,
    _eval_one_quad,
)

BUCKET_W = 32
BINS_PER_TILE = 5  # wide + 4 buckets
# chapter: the VMEM-resident window of a tile's item stream
CHAP_BLOCKS = 8
CHAP_Q = CHAP_BLOCKS * BLOCK_Q  # 2048


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x",
                                               "item_cap"))
def build_bin_lists(bucketbox, count, order4, order4_dy1, *,
                    tiles_y: int, tiles_x: int, item_cap: int):
    """Bin quads into per-tile [wide, b0..b3] bins as ONE flat sorted item
    stream (bin segments are NOT aligned; the kernel floor-aligns its
    octet loads and masks the straddle, like the old kernel's tile
    segments).

    ``bucketbox``: packed inclusive BUCKET-granular box per quad
    (bx0 | bx1<<8 | ty0<<16 | ty1<<24), bx in 0..4*tiles_x-1 — i.e.
    ``pack_tilebox`` at tile_w=32.  ``order4``/``order4_dy1``: 4-bit
    within-bin order (coarse 2-bit near depth, then 2-bit covered-row
    band) for the quad's first / second covered tile row.

    Within-bin order = (dq2, band, stream index): depth-major coarse
    (keeps the occlusion break early — band-major order measured ~60%
    more raster work), row-coherent within a depth class (tight octet
    row spans), and the compaction index refines by full 4-bit quantized
    depth inside each class.  The uint32 key fits exactly:
    bin(12) | dq2(2) | band(2) | index(16).

    Returns (flat i32[item_cap]      — quad index per slot,
             b_of_item i32[item_cap] — bin id per slot (n_bins if pad),
             valid_slot bool[item_cap],
             starts i32[n_bins], counts i32[n_bins],
             overflow i32).
    """
    m = bucketbox.shape[0]
    shift = max(1, (m - 1).bit_length())
    order_bits = 4
    shift_t = shift + order_bits
    n_bins = tiles_y * tiles_x * BINS_PER_TILE
    assert (n_bins << shift_t) < 2**32, "bin/quad key would overflow u32"
    big_cap = 512
    maxkey = jnp.uint32(2**32 - 1)

    q = jnp.arange(m, dtype=jnp.int32)
    in_count = q < count
    bx0 = bucketbox & 0xFF
    bx1 = (bucketbox >> 8) & 0xFF
    ty0 = (bucketbox >> 16) & 0xFF
    ty1 = (bucketbox >> 24) & 0xFF
    nonempty = in_count & (bx0 <= bx1) & (ty0 <= ty1)
    narrow = nonempty & (bx1 - bx0 <= 1) & (ty1 - ty0 <= 1)
    wide = nonempty & ~narrow
    tx0 = bx0 >> 2
    tx1 = bx1 >> 2
    small_wide = wide & (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    big = wide & ~small_wide

    def ukey(binid, ob, qq):
        return ((binid.astype(jnp.uint32) << shift_t)
                | (ob.astype(jnp.uint32) << shift)
                | qq.astype(jnp.uint32))

    # narrow and small-wide are disjoint: share the 4 (dy, j) key slots
    keys = []
    for dy in (0, 1):
        ty = ty0 + dy
        ob = order4 if dy == 0 else order4_dy1
        for j in (0, 1):
            bx = bx0 + j
            ok_n = narrow & (bx <= bx1) & (ty <= ty1)
            bin_n = (ty * tiles_x + (bx >> 2)) * BINS_PER_TILE + 1 + (bx & 3)
            tx = tx0 + j
            ok_w = small_wide & (tx <= tx1) & (ty <= ty1)
            bin_w = (ty * tiles_x + tx) * BINS_PER_TILE
            binid = jnp.where(ok_n, bin_n, bin_w)
            ok = ok_n | ok_w
            keys.append(jnp.where(ok, ukey(binid, ob, q), maxkey))

    # big quads: compact and expand over the full tile grid (bin 0)
    n_tiles = tiles_y * tiles_x
    csum = jnp.cumsum(big.astype(jnp.int32))
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
    bob = jnp.where(bvalid, order4[src], 0)[None, :]
    keys.append(
        jnp.where(okb, ukey(t[:, None] * BINS_PER_TILE, bob, src[None, :]),
                  maxkey).reshape(-1)
    )
    big_dropped = jnp.maximum(n_big - big_cap, 0)

    skeys = jnp.sort(jnp.concatenate(keys))
    # segment bounds: jnp.searchsorted lowers to a PER-TARGET binary-
    # search loop on TPU (measured ~1.7 ms at 2251 targets); this manual
    # bisection advances ALL targets per round with one small gather
    prefixes = (jnp.arange(n_bins + 1, dtype=jnp.uint32) << shift_t)
    n_keys = skeys.shape[0]
    lo = jnp.zeros(n_bins + 1, jnp.int32)
    hi = jnp.full(n_bins + 1, n_keys, jnp.int32)

    def bisect(_, lohi):
        lo, hi = lohi
        # clamp mid so the converged lo == hi == n_keys state is stable
        # (unclamped, JAX's gather clamp reads the LAST key and can push
        # lo to n_keys + 1 — see build_tile_lists in raster.py)
        mid = jnp.minimum((lo + hi) >> 1, n_keys - 1)
        below = skeys[mid] < prefixes
        return jnp.where(below, jnp.minimum(mid + 1, n_keys), lo), \
            jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, (n_keys - 1).bit_length() + 1, bisect,
                               (lo, hi))
    bounds = lo
    total = bounds[-1]
    kept_end = jnp.minimum(bounds[1:], item_cap)
    kept_start = jnp.minimum(bounds[:-1], item_cap)
    starts = kept_start.astype(jnp.int32)
    counts = (kept_end - kept_start).astype(jnp.int32)
    overflow = (jnp.maximum(total - item_cap, 0) + big_dropped
                ).astype(jnp.int32)

    head = skeys[:item_cap]
    j = jnp.arange(item_cap, dtype=jnp.int32)
    valid_slot = j < jnp.minimum(total, item_cap)
    flat = jnp.where(valid_slot,
                     (head & ((1 << shift) - 1)).astype(jnp.int32), 0)
    b_of_item = jnp.where(valid_slot,
                          (head >> shift_t).astype(jnp.int32), n_bins - 1)
    return flat, b_of_item, valid_slot, starts, counts, overflow


# ---------------------------------------------------------------------------
# The packed kernel
# ---------------------------------------------------------------------------


def _raster_kernel_packed(starts_hbm, counts_hbm, rows_hbm, zmin_hbm,
                          rec_hbm,
                          color_ref, depth_ref,
                          starts_ref, counts_ref, rows_ref, zmin_ref,
                          bufp_ref, rec_vmem, rec_t, sem, meta_sem,
                          *, height, width, tile_h, tiles_x, n_groups,
                          pin_mul):
    """Per-tile packed rasterization.  Grid = one step per 16x128 tile.

    Phases per tile (item stream per tile = [wide][b0][b1][b2][b3],
    contiguous, 8-aligned):
      wide   — classic full-width octets on bin 0
      packed — four buckets in LOCKSTEP: one [8, 128] row evaluation
               covers each bucket's own octet in its own 32-lane group

    The tile's stream is made VMEM-resident in CHAP_Q-item chapters
    (transposed to item-major once per chapter); chapter c+1's (or the
    next tile's chapter-0) DMAs start before chapter c is processed.
    ``bufp_ref`` (SMEM[1]) carries the double-buffer parity across grid
    steps (tiles consume a variable number of chapters).
    """
    step = pl.program_id(0)
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
    grp1 = lane >= 32
    grp2 = lane >= 64
    grp3 = lane >= 96
    wf = jnp.float32(width)
    hf = jnp.float32(height)
    inff = jnp.full((8, 128), jnp.inf, jnp.float32)
    skyv = jnp.full((8, 128), SKY_I32, jnp.int32)
    acc0 = tuple([inff, skyv] * n_sub)

    def tile_range(t):
        """[lo, hi) item range of tile t's five bins (unaligned)."""
        b0 = t * BINS_PER_TILE
        lo = starts_ref[b0]
        hi = starts_ref[b0 + 4] + counts_ref[b0 + 4]
        return lo, jnp.minimum(hi, n_groups * 8)

    def chapter_nblk(t, c):
        lo, hi = tile_range(t)
        blk0 = lo // BLOCK_Q + c * CHAP_BLOCKS
        return jnp.clip((hi + BLOCK_Q - 1) // BLOCK_Q - blk0, 0,
                        CHAP_BLOCKS)

    def start_chapter_dmas(t, c, buf):
        lo, _ = tile_range(t)
        blk0 = lo // BLOCK_Q + c * CHAP_BLOCKS
        nblk = chapter_nblk(t, c)

        def body(i, _):
            @pl.when(i < nblk)
            def _():
                off = pl.multiple_of((blk0 + i) * BLOCK_Q, BLOCK_Q)
                pltpu.make_async_copy(
                    rec_hbm.at[:, pl.ds(off, BLOCK_Q)],
                    rec_vmem.at[buf, :, pl.ds(i * BLOCK_Q, BLOCK_Q)],
                    sem.at[buf, i],
                ).start()
            return 0

        jax.lax.fori_loop(0, CHAP_BLOCKS, body, 0, unroll=True)

    def wait_and_transpose(buf, nblk):
        def body(i, _):
            @pl.when(i < nblk)
            def _():
                pltpu.make_async_copy(
                    rec_hbm.at[:, pl.ds(0, BLOCK_Q)],
                    rec_vmem.at[buf, :, pl.ds(0, BLOCK_Q)],
                    sem.at[buf, i],
                ).wait()
                boff = pl.multiple_of(i * BLOCK_Q, BLOCK_Q)
                rec_t[pl.ds(boff, BLOCK_Q)] = jnp.transpose(
                    rec_vmem[buf, :, pl.ds(boff, BLOCK_Q)])
            return 0

        jax.lax.fori_loop(0, CHAP_BLOCKS, body, 0, unroll=True)

    def sel_group(v0, v1, v2, v3):
        """[8,1] per-group values -> [8,128] by 32-lane group."""
        a = jnp.where(grp1, v1, v0)
        b = jnp.where(grp3, v3, v2)
        return jnp.where(grp2, b, a)

    def _dmax_of(acc):
        mx = acc[0]
        for i in range(1, n_sub):
            mx = jnp.maximum(mx, acc[2 * i])
        return jnp.max(mx)

    def do_tile(t, buf0):
        ty = t // tiles_x
        tx = t % tiles_x
        py0 = ty * tile_h
        px = jnp.float32(tx * 128) + lane.astype(jnp.float32)
        nxv = (2.0 * (px + 0.5) - wf) / wf
        lo, hi = tile_range(t)
        n_chap = jnp.maximum(
            ((hi + BLOCK_Q - 1) // BLOCK_Q - lo // BLOCK_Q
             + CHAP_BLOCKS - 1) // CHAP_BLOCKS, 1)

        def eval_row_groups(fros, iros, yvec):
            pyv = jnp.float32(py0) + yvec.astype(jnp.float32)
            ny = 1.0 - 2.0 * (pyv + 0.5) / hf
            cover, z, c = _eval_one_quad(nxv, ny, fros, iros,
                                         pin_mul=pin_mul)
            covered = cover & (z == z)
            d = jnp.where(covered, z, jnp.inf)
            c = jnp.where(covered, c, jnp.int32(2**31 - 1))
            for shift in (4, 2, 1):
                d2 = pltpu.roll(d, shift, 0)
                c2 = pltpu.roll(c, shift, 0)
                lt = (d2 < d) | ((d2 == d) & (c2 < c))
                d = jnp.where(lt, d2, d)
                c = jnp.where(lt, c2, c)
            return d, c

        def merge(acc, yvec, d, c):
            out = []
            for i in range(n_sub):
                ad, ac = acc[2 * i], acc[2 * i + 1]
                upd = (sub == yvec - 8 * i) & (
                    (d < ad) | ((d == ad) & (c < ac)))
                out += [jnp.where(upd, d, ad), jnp.where(upd, c, ac)]
            return tuple(out)

        def load_octet(o, seg_lo, seg_hi):
            """8-aligned chapter-local octet at ``o`` with the
            [seg_lo, seg_hi) real-item mask folded into coverage bounds.
            Returns (fro, iro, ry0, ry1) with inert rows when dead."""
            oc = pl.multiple_of(jnp.clip(o, 0, CHAP_Q - 8), 8)
            recs = [rec_t[pl.ds(oc, 8), f:f + 1]
                    for f in range(N_BLEND_FIELDS + 4)]
            fro = [jax.lax.bitcast_convert_type(r, jnp.float32)
                   for r in recs[:N_BLEND_FIELDS]]
            iro = tuple(recs[N_BLEND_FIELDS:N_BLEND_FIELDS + 4])
            kv = oc + jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            kmask = (kv >= seg_lo) & (kv < seg_hi)
            fro[12] = jnp.where(kmask, fro[12], jnp.inf)
            fro[13] = jnp.where(kmask, fro[13], -jnp.inf)
            return tuple(fro), iro

        def octet_meta(chap_lo, o, dead):
            g = jnp.minimum((chap_lo + o) // 8, n_groups - 1)
            rb = rows_ref[g]
            ry0 = jnp.where(dead, tile_h - 1, rb & 0xFF)
            ry1 = jnp.where(dead, 0, rb >> 8)
            return ry0, ry1

        def chapter_body(c, carry):
            acc, dmax, buf_c = carry
            chap_lo = (lo // BLOCK_Q + c * CHAP_BLOCKS) * BLOCK_Q
            chap_hi = chap_lo + CHAP_Q
            wait_and_transpose(buf_c, chapter_nblk(t, c))
            nbuf = 1 - buf_c

            @pl.when(c + 1 < n_chap)
            def _():
                start_chapter_dmas(t, c + 1, nbuf)

            def clip_seg(binid):
                # (floor-aligned first octet, real start, real end) in
                # chapter-local coords; straddle items die by kmask
                s = starts_ref[binid]
                cnt = counts_ref[binid]
                s_c = jnp.clip(s, chap_lo, chap_hi) - chap_lo
                e_c = jnp.clip(s + cnt, chap_lo, chap_hi) - chap_lo
                return s_c & ~7, s_c, e_c

            # ---------------- wide phase (full-width octets)
            w_o0, w_lo, w_hi = clip_seg(t * BINS_PER_TILE)

            def w_cond(st):
                o, dmax, _ = st
                g = jnp.minimum((chap_lo + o) // 8, n_groups - 1)
                return (o < w_hi) & (zmin_ref[g] <= dmax)

            def w_body(st):
                o, dmax, acc = st
                fro, iro = load_octet(o, w_lo, w_hi)
                ry0, ry1 = octet_meta(chap_lo, o, o >= w_hi)

                def rows_body(i, acc):
                    # FOUR independent row evaluations in flight per merge
                    # round: each eval is a long serial dependency chain
                    # (~175 ns alone, NOTES.md), so batching recovers the
                    # old kernel's latency hiding
                    y = ry0 + 4 * i
                    evs = [eval_row_groups(
                        fro, iro, jnp.full((8, 128), y + u, jnp.int32))
                        for u in range(4)]
                    for u, (d, cc) in enumerate(evs):
                        d = jnp.where(y + u <= ry1, d, jnp.inf)
                        acc = merge(acc, jnp.full((8, 128), y + u,
                                                  jnp.int32), d, cc)
                    return acc

                acc = jax.lax.fori_loop(0, (ry1 - ry0 + 4) // 4,
                                        rows_body, acc)
                dmax = jax.lax.cond((o & 8) == 8, _dmax_of,
                                    lambda a: dmax, acc)
                return o + 8, dmax, acc

            _, dmax, acc = jax.lax.while_loop(w_cond, w_body,
                                              (w_o0, dmax, acc))

            # ---------------- packed phase (4 buckets in lockstep)
            segs = [clip_seg(t * BINS_PER_TILE + 1 + b) for b in range(4)]
            n_super = jnp.maximum(
                jnp.maximum(segs[0][2] - segs[0][0],
                            segs[1][2] - segs[1][0]),
                jnp.maximum(segs[2][2] - segs[2][0],
                            segs[3][2] - segs[3][0]))
            n_super = (n_super + 7) // 8

            def p_cond(st):
                k, dmax, _ = st
                alive = jnp.bool_(False)
                for b in range(4):
                    o0, s_c, e_c = segs[b]
                    o = o0 + k * 8
                    g = jnp.minimum((chap_lo + o) // 8, n_groups - 1)
                    alive = alive | ((o < e_c) & (zmin_ref[g] <= dmax))
                return (k < n_super) & alive

            def p_body(st):
                k, dmax, acc = st
                fro_g, iro_g, y0s, y1s = [], [], [], []
                for b in range(4):
                    o0, s_c, e_c = segs[b]
                    o = o0 + k * 8
                    dead = o >= e_c
                    fro, iro = load_octet(o, s_c, e_c)
                    ry0, ry1 = octet_meta(chap_lo, o, dead)
                    fro_g.append(fro)
                    iro_g.append(iro)
                    y0s.append(jnp.reshape(ry0, (1, 1))
                               + jnp.zeros((8, 1), jnp.int32))
                    y1s.append(jnp.reshape(ry1, (1, 1))
                               + jnp.zeros((8, 1), jnp.int32))
                fros = tuple(sel_group(*(fro_g[b][f] for b in range(4)))
                             for f in range(N_BLEND_FIELDS))
                iros = tuple(sel_group(*(iro_g[b][f] for b in range(4)))
                             for f in range(4))
                y0v = sel_group(*y0s)
                y1v = sel_group(*y1s)
                span = jnp.max(jnp.stack(
                    [y1s[b][0, 0] - y0s[b][0, 0] for b in range(4)]))

                def rows_body(i, acc):
                    # 4 independent row chains in flight (see wide phase)
                    evs = [eval_row_groups(fros, iros, y0v + (4 * i + u))
                           for u in range(4)]
                    for u, (d, cc) in enumerate(evs):
                        yvec = y0v + (4 * i + u)
                        d = jnp.where(yvec <= y1v, d, jnp.inf)
                        acc = merge(acc, yvec, d, cc)
                    return acc

                acc = jax.lax.fori_loop(0, (span + 4) // 4,
                                        rows_body, acc)
                dmax = jax.lax.cond((k & 1) == 1, _dmax_of,
                                    lambda a: dmax, acc)
                return k + 1, dmax, acc

            _, dmax, acc = jax.lax.while_loop(p_cond, p_body,
                                              (jnp.int32(0), dmax, acc))
            return acc, dmax, nbuf

        acc, _, buf_end = jax.lax.fori_loop(
            0, n_chap, chapter_body, (acc0, jnp.float32(jnp.inf), buf0))

        for i in range(n_sub):
            depth_ref[pl.ds(i * 8, 8), :] = acc[2 * i]
            color_ref[pl.ds(i * 8, 8), :] = acc[2 * i + 1]
        return buf_end

    # double-buffer parity across steps lives in SMEM (tiles consume a
    # variable number of chapters)
    @pl.when(step == 0)
    def _():
        bufp_ref[0] = 0
        start_chapter_dmas(0, 0, 0)

    buf0 = bufp_ref[0]
    buf_end = do_tile(step, buf0)

    n_steps = pl.num_programs(0)

    @pl.when(step + 1 < n_steps)
    def _():
        bufp_ref[0] = 1 - buf_end
        start_chapter_dmas(step + 1, 0, 1 - buf_end)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "out_h", "interpret"),
)
def rasterize_pallas_packed(records, starts, counts, octet_rows,
                            octet_zmin, *,
                            height: int, width: int, tile_h: int,
                            out_h: int | None = None,
                            interpret: bool = False):
    """Packed, binned, chapter-streamed rasterizer over the aligned item
    stream.  Same record layout as rasterize_pallas (i32[24, ITEM_CAP]
    field-major); ``starts``/``counts`` are PER-BIN (5 bins per tile, see
    build_bin_lists); ``octet_rows``/``octet_zmin`` are per aligned
    8-group, segmented per bin."""
    out_h = out_h or height
    assert out_h % tile_h == 0 and width % 128 == 0
    assert records.shape[1] % CHAP_Q == 0 and records.shape[0] == 24
    tiles_y, tiles_x = out_h // tile_h, width // 128
    n_tiles = tiles_y * tiles_x
    n_oct = records.shape[1] // 8

    kernel = functools.partial(
        _raster_kernel_packed, height=height, width=width, tile_h=tile_h,
        tiles_x=tiles_x, n_groups=n_oct, pin_mul=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((tile_h, 128),
                         lambda t: (t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 128),
                         lambda t: (t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((n_tiles * BINS_PER_TILE,), jnp.int32),
            pltpu.SMEM((n_tiles * BINS_PER_TILE,), jnp.int32),
            pltpu.SMEM((n_oct,), jnp.int32),
            pltpu.SMEM((n_oct,), jnp.float32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.VMEM((2, 24, CHAP_Q), jnp.int32),
            pltpu.VMEM((CHAP_Q, 24), jnp.int32),
            pltpu.SemaphoreType.DMA((2, CHAP_BLOCKS)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    color, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_h, width), jnp.int32),
            jax.ShapeDtypeStruct((out_h, width), jnp.float32),
        ],
        interpret=interpret,
    )(starts, counts, octet_rows, octet_zmin, records)
    return color, depth
