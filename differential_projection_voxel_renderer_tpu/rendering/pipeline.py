"""The per-frame device render step — one jitted function.

Equivalent of the reference's ``render_frame`` (src/main.rs:379-608) with
the Hyper-Pipeline geometry stage, restructured for XLA:

0. uploads    — draw-list-dependent state, built OUTSIDE the per-frame
                step and cached while the draw list is unchanged
                (prepare_uploads: ~5 KB per-chunk arrays H2D, device-side
                ragged expansion + one pool gather -> the quad stream)
1. project    — differential projection of all 4 corners per quad, backface
                + frustum culling as vectorized masks (ops/projection.py)
2. compact    — survivors first: one flat sort of validity-masked indices
                + one multi-row gather (all per-quad state crosses as rows
                of a single array; R separate gathers cost R x — measured)
3. coeffs     — rasterizer coefficients on the compacted stream; records
                stacked field-major [24, rc]
4. bin        — quads -> 16x128 framebuffer tiles as ONE sorted flat item
                stream, ordered (tile, quantized near depth, covered row
                band, stream index); per-octet row bounds + depth
                suffix-min ride along for the kernel
5. rasterize  — the octet Pallas kernel (or the jnp twin) with in-register
                tile accumulation and the exact occlusion break
                (ops/raster.py)

Steps 1-5 run on device in a single ``jit``; the host supplies the visible
slot list (culling funnel) and the camera matrices.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry_pallas as geom_ops
from ..ops import hiz as hiz_ops
from ..ops import projection as proj_ops
from ..ops import raster as raster_ops
from ..ops import raster_packed as packed_ops
from ..ops.shading import build_quad_color_tables
from ..ops.texture import TextureAtlas
from ..utils.config import RenderConfig


@dataclass
class FrameStats:
    """Per-frame counters — the reference's FUNCTION_COUNTERS taxonomy
    (src/perf/profiling.rs:6-47) reduced to what the funnel produces."""

    quads_gathered: int
    quads_rasterized: int
    overflow: int
    subpixel_culled: int = 0


def _packed_tail(f_full, i_full, bbx_c, bby_c, count_c, overflow,
                 n_quads, count, subpix_total, *,
                 height, width, tile_h, out_h, tiles_y, tiles_x,
                 tile_k_cap, interpret, debug_return_records):
    # debug_return_records: True -> full records; "bin" -> stop after
    # build_bin_lists; "gather" -> stop after the record gather
    """Binning + metadata + raster for the sub-column-packed kernel
    (ops/raster_packed.py).  The compacted stream arrives front-to-back
    (depth-keyed compaction sort), so bins need no order bits."""
    bucketbox = proj_ops.pack_tilebox(
        {"bb_x0": bbx_c & 0xFFFF, "bb_x1": bbx_c >> 16,
         "bb_y0": bby_c & 0xFFFF, "bb_y1": bby_c >> 16},
        tile_h=tile_h, tile_w=packed_ops.BUCKET_W,
    )
    # within-bin order: coarse 2-bit near depth (early occlusion break)
    # then the 2-bit covered-row band (row coherence); the compaction
    # index refines by full quantized depth inside each class
    by0 = bby_c & 0xFFFF
    band2 = jnp.minimum(
        jnp.clip(by0 - (by0 // tile_h) * tile_h, 0, tile_h - 1) >> 2, 3)
    dn_c = jax.lax.bitcast_convert_type(i_full[5], jnp.float32)
    dq2 = jnp.clip(
        (-jnp.log2(jnp.maximum(1.0 - dn_c, 1e-9))).astype(jnp.int32) >> 2,
        0, 3)
    flat, b_of_item, valid_slot, starts, counts, bin_overflow = (
        packed_ops.build_bin_lists(
            bucketbox, count_c, (dq2 << 2) | band2, dq2 << 2,
            tiles_y=tiles_y, tiles_x=tiles_x,
            item_cap=tile_k_cap,
        )
    )
    if debug_return_records == "bin":
        return flat, b_of_item, valid_slot, starts, counts
    f_binned = f_full[:, flat]
    ig = i_full[:, flat]
    if debug_return_records == "gather":
        return f_binned, ig, starts, counts, b_of_item
    # covered tile-local pixel-row range per item -> per-octet bounds;
    # alignment-pad slots are forced inert (empty row range, +inf depth)
    tpy0 = ((b_of_item // packed_ops.BINS_PER_TILE) // tiles_x) * tile_h
    ly0 = jnp.clip((ig[4] & 0xFFFF) - tpy0, 0, tile_h - 1)
    ly1 = jnp.clip((ig[4] >> 16) - tpy0, 0, tile_h - 1)
    ly0 = jnp.where(valid_slot, ly0, tile_h - 1)
    ly1 = jnp.where(valid_slot, ly1, 0)
    n_oct = flat.shape[0] // 8
    octet_rows = (jnp.min(ly0.reshape(n_oct, 8), axis=1)
                  | (jnp.max(ly1.reshape(n_oct, 8), axis=1) << 8))
    # suffix-min of near depth per BIN segment — the exact occlusion
    # break key, bucket-granular.  Bin segments are 8-aligned, so the
    # suffix only matters at GROUP granularity: reduce each 8-group to
    # its min first and run the segmented scan over n_oct groups (8x
    # fewer elements, and the scan's array reversals shrink with it).
    dn_i = jnp.where(valid_slot,
                     jax.lax.bitcast_convert_type(ig[5], jnp.float32),
                     jnp.inf)
    group_min = dn_i.reshape(n_oct, 8).min(axis=1)
    b_of_group = b_of_item.reshape(n_oct, 8)[:, 0]

    def _segmin(a, b):
        return (b[0], jnp.where(a[0] == b[0],
                                jnp.minimum(a[1], b[1]), b[1]))

    _, zmin_r = jax.lax.associative_scan(
        _segmin, (b_of_group[::-1], group_min[::-1]))
    octet_zmin = zmin_r[::-1]
    records = jnp.concatenate([
        jax.lax.bitcast_convert_type(f_binned, jnp.int32),
        ig[:4],
        jnp.zeros((24 - len(raster_ops.REC_FIELDS), flat.shape[0]),
                  jnp.int32),
    ])
    if debug_return_records:  # stage profiling hook (benches/)
        return records, starts, counts, octet_rows, octet_zmin
    color, depth = packed_ops.rasterize_pallas_packed(
        records, starts, counts, octet_rows, octet_zmin,
        height=height, width=width, tile_h=tile_h, out_h=out_h,
        interpret=interpret,
    )
    if out_h != height:
        color = color[:height]
        depth = depth[:height]
    stats = jnp.stack([n_quads, count, overflow, bin_overflow,
                       subpix_total, jnp.int32(0)])
    return color, depth, stats


def _render_step(
    quads,            # uint32[GQ] — the gathered visible-quad stream
    quad_world,       # f32[3, GQ] — chunk world origin per stream entry
    n_quads,          # int32[]   — total quads in the stream
    view_proj,        # f32[4, 4]
    cam_pos,          # f32[3]
    *,
    color_tables,     # dict of small numpy tables (compile-time constants)
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    gather_cap: int,
    render_cap: int,
    span_mode: bool,
    backface_culling: bool,
    use_pallas: bool,
    interpret: bool,
    tile_k_cap: int = 8192,
    packed_raster: bool = False,
    debug_return_records: bool = False,
    skip_quads=0,         # exclude stream[:skip_quads] (two-pass far pass)
    hiz_level1=None,      # rendered-depth max pyramid: exact far-quad cull
    init_color=None,      # initial framebuffer (continue blending onto it)
    init_depth=None,
    band_y0: int = 0,     # rasterize only rows [band_y0, band_y0+band_h)
    band_h: int | None = None,  # (tp-sharded band rendering; NDC stays
                          # global, output is the band-sized buffer)
    stream_group: int = 5,   # octet-kernel stream knobs (RenderConfig /
    row_tree: bool = False,  # DPVR_* env override; identical frames).
    block_q: int = 1024,     # Defaults match RenderConfig: the measured
                             # v5e winner opi6+sg5+bq1024 (NOTES round 3);
                             # rasterize_pallas degrades both when the
                             # frame/caps are incompatible.
    pre_geom=None,        # (valid, bbx, bby, depth_near, subpix_total)
                          # from a SHARED projection pass — the two-pass
                          # mode projects once and masks per pass instead
                          # of paying the geometry stage (and its
                          # per-Pallas-call dispatch tax) twice
    next_geom=None,       # (quads2, quad_world2, n2, view_proj2, cam2):
                          # fuse the NEXT frame's stage-A geometry into
                          # this frame's raster call (frames-in-flight;
                          # ops/raster._fused_geom_pass) and return its
                          # pre_geom tuple as a 4th output
):
    if next_geom is not None:
        assert (use_pallas and not span_mode and not packed_raster
                and band_h is None and not debug_return_records), (
            "next_geom (frames-in-flight fused geometry) requires the "
            "production pallas path")
    tables = proj_ops.view_tables(view_proj, cam_pos)

    # The quad stream arrives pre-gathered: flattening the visible chunks'
    # pool rows depends only on the draw list, not the camera, so it lives
    # in prepare_uploads (device gather, cached across frames) — ~2 ms of
    # per-frame gathers in the steady state otherwise.
    gq = quads.shape[0]
    stream_idx = jnp.arange(gq, dtype=jnp.int32)
    in_stream = (stream_idx < n_quads) & (stream_idx >= skip_quads)
    wq = (quad_world[0], quad_world[1], quad_world[2])

    # ---- project + cull (stage A) — valid mask + screen bboxes.  On the
    # production TPU path this is the fused Pallas kernel
    # (ops/geometry_pallas.py; identical math, ~10x less wall time than
    # the XLA lowering of the same ops); span mode and the jnp path use
    # the XLA form.
    if pre_geom is not None:
        # works for both the pallas path and the jnp twin (the jnp branch
        # only needs the valid mask for compaction — it reprojects the
        # compacted stream anyway)
        assert not span_mode
        proj_a = None
        valid_a, bbx_a, bby_a, dn_a, subpix_total = pre_geom
        # the shared pass projected the whole stream; this pass's quad
        # range folds in as a mask
        valid_a = valid_a & in_stream
    elif (use_pallas and not span_mode
          and not os.environ.get("DPVR_XLA_GEOM")):
        # DPVR_XLA_GEOM=1 (trace-time knob): run stage A as the XLA form
        # below instead of the fused kernel — on relay-attached hosts the
        # kernel's ~10x compute win (~0.05 vs ~1.0 ms) is eaten by the
        # flat per-Pallas-call tax, and dropping the call may win if the
        # taxes do not overlap under async dispatch (measure, NOTES r3)
        ga = geom_ops.project_cull_pallas(
            quads, wq, n_quads, tables.view_proj, tables.cam_pos,
            width=width, height=height,
            backface_culling=backface_culling, interpret=interpret,
            skip_quads=skip_quads,
        )
        proj_a = None
        valid_a = ga["valid"]
        bbx_a, bby_a = ga["bbx"], ga["bby"]
        dn_a = ga["depth_near"]
        subpix_total = ga["subpixel"].sum().astype(jnp.int32)
    else:
        proj_a = proj_ops.project_and_cull(
            quads, wq, in_stream, tables,
            width=width, height=height, span_mode=span_mode,
            backface_culling=backface_culling,
        )
        valid_a = proj_a["valid"]
        bbx_a = proj_a["bb_x0"] | (proj_a["bb_x1"] << 16)
        bby_a = proj_a["bb_y0"] | (proj_a["bb_y1"] << 16)
        dn_a = proj_a["depth_near"]
        subpix_total = proj_a["subpixel"].sum().astype(jnp.int32)
    if hiz_level1 is not None:
        # exact-conservative occlusion against the near pass's rendered
        # depth (ops/hiz.build_max_pyramid): culled quads PROVABLY lose
        # every blend, so the two-pass frame is identical to one pass
        occ = hiz_ops.quads_occluded_exact(
            hiz_level1, bbx_a, bby_a, dn_a, height=height, width=width)
        occ = occ & valid_a
        valid_a = valid_a & ~occ
        hiz_culled = occ.sum().astype(jnp.int32)
    else:
        hiz_culled = jnp.int32(0)
    if band_h is not None and use_pallas:
        # band restriction: drop quads with no row overlap and rebase the
        # row bbox to band-local coordinates.  Projection/culling above is
        # global; the rasterizer below gets y0_px so pixel NDC stays
        # global too — stacking the bands reproduces the full frame
        # bit-exactly (tested: tests/test_parallel.py).  (The jnp branch
        # instead passes the band straight to rasterize_jnp.)
        assert init_color is None and hiz_level1 is None and not packed_raster
        y0q = bby_a & 0xFFFF
        y1q = bby_a >> 16
        valid_a = valid_a & (y1q >= band_y0) & (y0q <= band_y0 + band_h - 1)
        bby_a = (jnp.clip(y0q - band_y0, 0, band_h - 1)
                 | (jnp.clip(y1q - band_y0, 0, band_h - 1) << 16))
    count = valid_a.sum().astype(jnp.int32)

    if use_pallas:
        # ---- compact the survivors FIRST with one multi-row gather (the
        # sort-key count and the coefficient math then scale with the
        # render cap, not the gather cap).  All per-quad state crosses the
        # compaction as rows of one f32 array (ints bitcast), because on
        # TPU a [R, N][:, idx] gather costs ~one flat gather while R
        # separate flat gathers cost R x (measured).
        bh = band_h if band_h is not None else height
        # DPVR_PAIR_ROWS=1 (trace-time knob, VERDICT r4 #3): bin tiles in
        # 2 x stream_group group-major order and raster each block with
        # ONE shared DMA chain (raster_ops tile_perm / group_rows) —
        # frames are bit-identical (the permutation only relabels tiles;
        # per-tile segments and within-tile order are unchanged).  The
        # framebuffer pads to a 2-tile-row multiple instead of one.
        sg_eff = int(os.environ.get("DPVR_STREAM_GROUP", str(stream_group)))
        pair_rows = (bool(int(os.environ.get("DPVR_PAIR_ROWS", "0")))
                     and use_pallas and not span_mode and not packed_raster
                     and band_h is None and sg_eff > 1
                     and (width // tile_w) % sg_eff == 0
                     and 128 * sg_eff <= 1024)
        grp_rows = 2 if pair_rows else 1
        out_h = -bh % (grp_rows * tile_h) + bh  # pad to a tile multiple
        tiles_y, tiles_x = out_h // tile_h, width // tile_w
        rc = min(gq, render_cap)
        bcast = jax.lax.bitcast_convert_type
        n_valid = count
        use_packed = packed_raster and not span_mode
        if use_packed and init_color is not None:
            # the packed kernel has no init-framebuffer path: silently
            # dropping the near pass's output would render a wrong frame.
            # (hiz_level1 WITHOUT init is fine — it only culls quads
            # before binning, e.g. the temporal_hiz mode.)
            raise ValueError(
                "packed_raster cannot run as a two-pass far pass "
                "(no init framebuffer support); disable "
                "two_pass_near_quads or packed_raster")
        # NO-COMPACTION mode: when the whole gather stream fits the
        # render cap (small capacity buckets, and the vd12 headline
        # bucket once host dir-culling shrinks the stream), the
        # compaction sort + multi-row gather buy nothing — the binner
        # takes the raw stream with an explicit validity mask instead
        # (same within-tile item order: ascending stream index).  The
        # packed kernel keeps the compaction (it relies on the
        # depth-keyed compaction ORDER).
        no_compact = gq <= rc and not use_packed
        if no_compact:
            count_c = n_valid
            overflow = jnp.int32(0)
            quads_c, wq_c = quads, wq
            bbx_c, bby_c, dn_c = bbx_a, bby_a, dn_a
            valid_c = valid_a
            proj_c = (dict({k: proj_a[k] for k in
                            ("nx_min", "nx_max", "ny_min", "ny_max")},
                           depth_near=dn_a)
                      if span_mode else None)
        else:
            # ---- compaction indices via one flat sort (a searchsorted
            # of rc targets lowers to a per-target binary-search loop —
            # measured ~7 ms at this size; the sort is ~0.5 ms).  On the
            # packed path the sort key carries the log-quantized near
            # depth in its high bits, so the compacted stream comes out
            # front-to-back and the binner needs no order bits at all
            # (raster_packed.py).  All per-quad state crosses the
            # compaction as rows of one f32 array (ints bitcast): on TPU
            # a [R, N][:, idx] gather costs ~one flat gather while R
            # separate flat gathers cost R x (measured).
            pre_rows = [bcast(quads, jnp.float32), wq[0], wq[1], wq[2],
                        bcast(bbx_a, jnp.float32),
                        bcast(bby_a, jnp.float32), dn_a]
            if span_mode:
                pre_rows += [proj_a[k] for k in
                             ("nx_min", "nx_max", "ny_min", "ny_max")]
            count_c = jnp.minimum(n_valid, rc)
            stream_q = jnp.arange(gq, dtype=jnp.int32)
            if use_packed:
                qbits = max(1, (gq - 1).bit_length())
                assert 16 << (qbits + 4) > 0  # dq4 + index fit int32
                dq4_full = jnp.clip(
                    (-jnp.log2(jnp.maximum(1.0 - dn_a, 1e-9)))
                    .astype(jnp.int32), 0, 15)
                ckey = jnp.where(valid_a, (dq4_full << qbits) | stream_q,
                                 jnp.int32(2**30))
                idx = jnp.sort(ckey)[:rc] & ((1 << qbits) - 1)
            else:
                idx = jnp.sort(
                    jnp.where(valid_a, stream_q, jnp.int32(2**30))
                )[:rc]
            idx = jnp.minimum(idx, gq - 1)
            pre_c = jnp.stack(pre_rows)[:, idx]
            overflow = jnp.maximum(n_valid - rc, 0)
            quads_c = bcast(pre_c[0], jnp.uint32)
            wq_c = (pre_c[1], pre_c[2], pre_c[3])
            bbx_c = bcast(pre_c[4], jnp.int32)
            bby_c = bcast(pre_c[5], jnp.int32)
            dn_c = pre_c[6]
            valid_c = None
            proj_c = (dict({k: pre_c[7 + j] for j, k in
                            enumerate(("nx_min", "nx_max", "ny_min",
                                       "ny_max"))},
                           depth_near=dn_c)
                      if span_mode else None)

        coeffs = proj_ops.quad_coefficients(
            quads_c, wq_c, proj_c, tables, color_tables,
            width=width, height=height, span_mode=span_mode,
        )

        if use_packed:
            f_full = jnp.stack(
                [coeffs[k].astype(jnp.float32) for k in raster_ops.F_FIELDS]
            )
            i_full = jnp.stack([
                coeffs["color_even"].astype(jnp.int32),
                coeffs["color_odd"].astype(jnp.int32),
                coeffs["mask_lo"].astype(jnp.int32),
                coeffs["mask_hi"].astype(jnp.int32),
                bby_c,
                jax.lax.bitcast_convert_type(dn_c, jnp.int32),
            ])
            return _packed_tail(
                f_full, i_full, bbx_c, bby_c, count_c, overflow,
                n_quads, count, subpix_total,
                height=height, width=width, tile_h=tile_h, out_h=out_h,
                tiles_y=tiles_y, tiles_x=tiles_x, tile_k_cap=tile_k_cap,
                interpret=interpret,
                debug_return_records=debug_return_records,
            )

        # ALL per-item state that must cross the binning — the 20 record
        # rows AND the two metadata rows (screen-row range, near depth) —
        # stacks into ONE [22, rc] int32 array so the binning costs ONE
        # multi-row gather (VERDICT r4 #1, the XLA half of the "narrow
        # mega-kernel": the f32 record rows and int metadata rows were
        # previously two separate multi-row gathers at ~one flat-gather
        # cost each).  The metadata rows land in the records' former
        # zero-padding rows 20/21, which the kernel never reads.
        bcast22 = jax.lax.bitcast_convert_type
        all22 = jnp.stack(
            [bcast22(coeffs[k].astype(jnp.float32), jnp.int32)
             for k in raster_ops.F_FIELDS]
            + [coeffs["color_even"].astype(jnp.int32),
               coeffs["color_odd"].astype(jnp.int32),
               coeffs["mask_lo"].astype(jnp.int32),
               coeffs["mask_hi"].astype(jnp.int32),
               bby_c,
               bcast22(dn_c, jnp.int32)]
        )

        # ---- bin the compacted quads straight to framebuffer tiles
        tilebox = proj_ops.pack_tilebox(
            {"bb_x0": bbx_c & 0xFFFF, "bb_x1": bbx_c >> 16,
             "bb_y0": bby_c & 0xFFFF, "bb_y1": bby_c >> 16},
            tile_h=tile_h, tile_w=tile_w,
        )
        # within-tile order: log-quantized near depth (4 bits — drives
        # how early the occlusion break fires) then the covered 4-row
        # band (2 bits — keeps octet row spans tight); suffix-min keeps
        # the break EXACT regardless of this key's quality.
        # DPVR_BIN_ORDER selects the depth/row bit split (experiment
        # knob; every split renders the identical frame — the blend is
        # commutative — only raster economics change): "42" depth4.row2
        # (default), "24" depth2.row4, "06" row4 only.
        dq4 = jnp.clip(
            (-jnp.log2(jnp.maximum(1.0 - dn_c, 1e-9)))
            .astype(jnp.int32), 0, 15)
        ty0_c = (bby_c & 0xFFFF) // tile_h
        ly0_c = jnp.clip((bby_c & 0xFFFF) - ty0_c * tile_h, 0, tile_h - 1)
        # NOTE: read at TRACE time — the chosen split is baked into each
        # compiled step; changing the env after a bucket has traced is
        # silently ignored (set it before constructing the Renderer).
        # Measured at vd12 (v5e): 42 = 2.85 ms raster, 33 = 3.23 — the
        # depth bits drive the occlusion break and dominate row coherence
        mode = os.environ.get("DPVR_BIN_ORDER", "42")
        if mode == "24":
            dq2 = dq4 >> 2
            row4 = jnp.minimum(ly0_c, 15)
            order6, order6_dy1 = (dq2 << 4) | row4, dq2 << 4
        elif mode == "06":
            order6, order6_dy1 = jnp.minimum(ly0_c, 15) << 2, \
                jnp.zeros_like(ly0_c)
        elif mode == "60":
            dq6 = jnp.clip(
                (-(4.0 * jnp.log2(jnp.maximum(1.0 - dn_c, 1e-9)))
                 ).astype(jnp.int32), 0, 63)
            order6 = order6_dy1 = dq6
        elif mode == "33":
            dq3 = dq4 >> 1
            row3 = jnp.minimum(ly0_c >> 1, 7)
            order6, order6_dy1 = (dq3 << 3) | row3, dq3 << 3
        elif mode == "4s":
            # depth4 + SPAN2: low bits group quads of similar pixel-row
            # span (in 4-row iteration units) — octets then hold
            # similar-iters quads, so the kernel's per-group
            # max-over-members row loop wastes no evals on short members
            # (cost-sim finding: at opi 6 the group max inflates row
            # evals ~34% over the per-octet ideal under band ordering)
            span2 = jnp.minimum(((bby_c >> 16) - (bby_c & 0xFFFF)) >> 2, 3)
            order6 = order6_dy1 = (dq4 << 2) | span2
        else:
            band = jnp.minimum(ly0_c >> 2, 3)
            order6, order6_dy1 = (dq4 << 2) | band, dq4 << 2
        flat, t_of_item, tile_starts, tile_counts, bin_overflow = (
            raster_ops.build_tile_lists(
                tilebox, count_c, tiles_y=tiles_y, tiles_x=tiles_x,
                item_cap=tile_k_cap,
                order6=order6, order6_dy1=order6_dy1, valid=valid_c,
                tile_perm=(grp_rows, sg_eff) if pair_rows else None,
            )
        )
        g22 = all22[:, flat]
        # covered tile-local pixel-row range per item -> per-octet row
        # bounds for the kernel's row loop (aligned groups of 8 items)
        if pair_rows:
            # invert the group-major tile id back to a framebuffer row
            gpx = tiles_x // sg_eff
            qrow = t_of_item // sg_eff
            ty_it = ((qrow >> 1) // gpx) * 2 + (qrow & 1)
            tpy0 = ty_it * tile_h
        else:
            tpy0 = (t_of_item // tiles_x) * tile_h
        bby_g = g22[20]
        ly0 = jnp.clip((bby_g & 0xFFFF) - tpy0, 0, tile_h - 1)
        ly1 = jnp.clip((bby_g >> 16) - tpy0, 0, tile_h - 1)
        n_oct = flat.shape[0] // 8
        octet_rows = (jnp.min(ly0.reshape(n_oct, 8), axis=1)
                      | (jnp.max(ly1.reshape(n_oct, 8), axis=1) << 8))
        # Suffix-min of near depth to the end of each tile's segment —
        # the kernel's occlusion-break key — as ONE reverse cummin over a
        # packed (tile, order-mapped depth) uint32 key instead of the
        # previous tuple-segmented associative_scan (half the scanned
        # data, a plain `min` combinator).  The tile id rides in the high
        # bits: t_of_item is non-decreasing over the stream, so a
        # position's suffix minimum always carries its OWN tile's id and
        # the depth bits never leak across segments.  Depth is the
        # standard total-order bit map of f32, floor-quantized by the
        # tile-bit shift — the unmapped value is a LOWER bound on the
        # true segment suffix-min (<= 2^-14 relative slack at 460 tiles),
        # so the break stays strictly conservative: it can only fire
        # later than the exact key would, never skip a winnable blend —
        # frames are bit-identical (tested vs the jnp twin, which uses no
        # break at all).
        n_kept = tile_starts[-1] + tile_counts[-1]
        bits_t = max(1, (tiles_y * tiles_x).bit_length())
        dn_u = jax.lax.bitcast_convert_type(g22[21], jnp.uint32)
        omap = dn_u ^ jnp.where((dn_u >> 31) != 0,
                                jnp.uint32(0xFFFFFFFF), jnp.uint32(1 << 31))
        packed_key = ((t_of_item.astype(jnp.uint32) << (32 - bits_t))
                      | (omap >> bits_t))
        packed_key = jnp.where(jnp.arange(flat.shape[0]) < n_kept,
                               packed_key, jnp.uint32(0xFFFFFFFF))
        sfx = jax.lax.cummin(packed_key, axis=0, reverse=True)
        zq = (sfx << bits_t)  # floor of the order-mapped depth key
        zbits = jnp.where((zq >> 31) != 0, zq ^ jnp.uint32(1 << 31), ~zq)
        zmin_all = jax.lax.bitcast_convert_type(zbits, jnp.float32)
        octet_zmin = zmin_all.reshape(n_oct, 8)[:, 0]
        # field-major records [24, ITEM_CAP] (floats bitcast; rows 20/21
        # carry the metadata rows, rows 22/23 pad to the sublane tile —
        # the kernel reads rows [0, 20) only and transposes per block
        records = jnp.concatenate([
            g22,
            jnp.zeros((2, flat.shape[0]), jnp.int32),
        ])
        if debug_return_records:  # stage profiling hook (benches/)
            return records, tile_starts, tile_counts, octet_rows, octet_zmin
        if init_color is not None and out_h != bh:
            # pad the init framebuffer back to the tile multiple; padded
            # rows are cropped again below and cannot affect real rows
            init_color = jnp.pad(
                init_color, ((0, out_h - bh), (0, 0)),
                constant_values=raster_ops.SKY_I32)
            init_depth = jnp.pad(
                init_depth, ((0, out_h - bh), (0, 0)),
                constant_values=jnp.inf)
        # stream knobs: RenderConfig fields, with DPVR_STREAM_GROUP /
        # DPVR_ROW_TREE / DPVR_BLOCK_Q env overrides read at trace
        # time (like DPVR_BIN_ORDER); frames are bit-identical under
        # every combination.  (tile_w is always 128: the 64-px paired
        # half-tile kernel measured strictly worse and was removed in
        # round 4 — see ops/raster.py note + NOTES.md.)
        ng = None
        if next_geom is not None:
            # frames-in-flight: next frame's stage A rides in this raster
            # call (one taxed Pallas dispatch per frame instead of two)
            q2, qw2, n2, vp2, cp2 = next_geom
            scalf = jnp.concatenate([
                jnp.asarray(vp2, jnp.float32).reshape(16),
                jnp.asarray(cp2, jnp.float32)])
            scali = jnp.stack([jnp.asarray(n2, jnp.int32), jnp.int32(0)])
            ng = (q2, qw2[0], qw2[1], qw2[2], scalf, scali)
        out = raster_ops.rasterize_pallas(
            records, tile_starts, tile_counts, octet_rows, octet_zmin,
            init_color, init_depth, ng,
            height=height, width=width,
            tile_h=tile_h, tile_w=tile_w, out_h=out_h,
            interpret=interpret, y0_px=band_y0,
            stream_group=sg_eff,
            row_tree=bool(int(os.environ.get("DPVR_ROW_TREE",
                                             str(int(row_tree))))),
            block_q=int(os.environ.get("DPVR_BLOCK_Q", str(block_q))),
            geom_backface=backface_culling,
            group_rows=grp_rows,
        )
        pre_next = None
        if next_geom is not None:
            color, depth, ga = out
            pre_next = (ga["valid"], ga["bbx"], ga["bby"],
                        ga["depth_near"],
                        ga["subpixel"].sum().astype(jnp.int32))
        else:
            color, depth = out
        if out_h != bh:
            color = color[:bh]
            depth = depth[:bh]
    else:
        # jnp path: compact first (keeps the full-frame loop short), then
        # rasterize the survivors in stream order.  ``valid_a`` (not
        # proj_a["valid"]) so pre_geom and the hiz cull apply here too.
        rcap = min(gq, 65536)
        count_c, overflow, (q_c, wx_c, wy_c, wz_c) = proj_ops.compact_stream(
            valid_a, rcap, (quads, wq[0], wq[1], wq[2])
        )
        wq_c = (wx_c, wy_c, wz_c)
        in_render = jnp.arange(rcap, dtype=jnp.int32) < count_c
        proj_b = proj_ops.project_and_cull(
            q_c, wq_c, in_render, tables,
            width=width, height=height, span_mode=span_mode,
            backface_culling=backface_culling,
        )
        coeffs = proj_ops.quad_coefficients(
            q_c, wq_c, proj_b, tables, color_tables,
            width=width, height=height, span_mode=span_mode,
        )
        fcoef, icoef = raster_ops.pack_coeffs_quadmajor(coeffs)
        color, depth = raster_ops.rasterize_jnp(
            fcoef, icoef, count_c, height=height, width=width,
            init_color=init_color, init_depth=init_depth,
            y0=band_y0, band_h=band_h,
        )
        bin_overflow = jnp.int32(0)
    stats = jnp.stack([n_quads, count, overflow, bin_overflow,
                       subpix_total, hiz_culled])
    if next_geom is not None:
        return color, depth, stats, pre_next
    return color, depth, stats


def build_gather_indices(counts_sel, slots_sel, positions_sel, gather_cap: int):
    """Host-side ragged flatten: per-visible-chunk quad counts + pool slots
    + chunk positions -> (pool_slot_of i32[GQ], within i32[GQ],
    quad_world f32[3, GQ], total int).  Pure numpy (np.repeat); the device
    never runs a searchsorted, and the pool gather these indices feed runs
    once per draw-list change (prepare_uploads), not per frame."""
    counts_sel = np.asarray(counts_sel, np.int64)
    slots_sel = np.asarray(slots_sel, np.int32)
    positions_sel = np.asarray(positions_sel, np.float32) * 32.0
    total = int(counts_sel.sum())
    if total > gather_cap:
        # truncate whole chunks from the back (reported via stats[0])
        cum = np.cumsum(counts_sel)
        counts_sel = np.where(cum <= gather_cap, counts_sel,
                              np.maximum(gather_cap - (cum - counts_sel), 0))
        total = int(counts_sel.sum())
    pool_slot_of = np.zeros(gather_cap, np.int32)
    within = np.zeros(gather_cap, np.int32)
    quad_world = np.zeros((3, gather_cap), np.float32)
    if total:
        pool_slot_of[:total] = np.repeat(slots_sel, counts_sel)
        starts = np.repeat(np.cumsum(counts_sel) - counts_sel, counts_sel)
        within[:total] = np.arange(total, dtype=np.int64) - starts
        for a in range(3):
            quad_world[a, :total] = np.repeat(positions_sel[:, a], counts_sel)
    return pool_slot_of, within, quad_world, total


def _expand_uploads_impl(quad_pool, slots_sel, counts6_sel, mask6_sel,
                         positions_sel, gather_cap: int):
    """Device-side draw-list expansion: per-visible-chunk (pool slot,
    per-face-direction quad counts, direction keep mask, chunk position)
    -> the flat quad stream + per-quad world origins.  Uploads are ~5 KB
    instead of ~2.5 MB of host-expanded index arrays (the np.repeat
    expansion + H2D dominated moving-camera frames); runs only when the
    draw list changes (see prepare_uploads).

    Each (chunk, face-direction) is one expansion unit: meshes store
    their quads grouped by face dir in pool-row order (the mesher's
    deterministic +X,-X,+Y,-Y,+Z,-Z emission), so a whole back-facing
    direction is skipped by zeroing its mask bit — the host computes the
    conservative-exact mask (engine._dir_keep_mask), and every skipped
    quad is one the device backface test (ops/projection.py
    stage_a_fields) would have culled anyway, so frames are identical
    while the gathered stream (and its capacity bucket) shrinks ~40-50%.
    The reference's per-face-dir cull lives at rasterizer.rs:812-881.
    ``counts6_sel`` must be the FULL per-dir counts (they position the
    within-row segment starts); ``mask6_sel`` carries the skip."""
    nv = slots_sel.shape[0]
    lens = (counts6_sel * mask6_sel).reshape(nv * 6)
    row_start = (jnp.cumsum(counts6_sel, axis=1)
                 - counts6_sel).reshape(nv * 6)
    unit = jnp.repeat(jnp.arange(nv * 6, dtype=jnp.int32), lens,
                      total_repeat_length=gather_cap)
    ci = unit // 6
    slot_of = slots_sel[ci]
    starts_flat = jnp.cumsum(lens) - lens
    within = jnp.arange(gather_cap, dtype=jnp.int32) - starts_flat[unit]
    row_idx = row_start[unit] + within
    # FLATTENED pool gather: `pool[slot_of, row_idx]` (two index vectors)
    # lowers to a slow multi-dim gather on TPU — the same trap NOTES.md
    # records for the hiz pyramid query ("2D advanced-index gathers are
    # scalarized"); one flat index is a single fast gather.  Same
    # elements, bit-identical stream.
    qcap = quad_pool.shape[1]
    quads = quad_pool.reshape(-1)[
        slot_of * qcap + jnp.clip(row_idx, 0, qcap - 1)]
    wq = jnp.stack([(positions_sel[:, a].astype(jnp.float32) * 32.0)[ci]
                    for a in range(3)])
    return quads, wq, lens.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("gather_cap",))
def _expand_uploads(quad_pool, slots_sel, counts6_sel, mask6_sel,
                    positions_sel, *, gather_cap: int):
    return _expand_uploads_impl(quad_pool, slots_sel, counts6_sel,
                                mask6_sel, positions_sel, gather_cap)


# resident-stream append batch limits (Engine resident mode): chunks per
# append dispatch and quads per append dispatch.  A streaming frame
# inserts <= max_chunks_per_frame (16) new chunks plus remeshed
# neighbors; batches beyond these caps force a full stream rebuild.
RESIDENT_APPEND_VCAP = 64
RESIDENT_APPEND_CAP = 16384


def resident_append_cap(stream_len: int) -> int:
    """Append window size for a resident stream of ``stream_len``: the
    fixed cap, shrunk so the window always fits comfortably inside the
    stream (small test configs would otherwise never append — every
    batch would fall into the rebuild path and leave the append
    untested)."""
    return min(RESIDENT_APPEND_CAP, max(256, stream_len // 8))


def pack_append_meta(slots, counts6, positions) -> np.ndarray:
    """One consolidated i32 upload for the append rider's batch draw
    list (slots | counts6 | positions over RESIDENT_APPEND_VCAP rows) —
    see _step_camf_append."""
    vc = RESIDENT_APPEND_VCAP
    nv = len(slots)
    assert nv <= vc
    meta = np.zeros(10 * vc, np.int32)
    meta[:nv] = slots
    c = np.zeros((vc, 6), np.int32)
    c[:nv] = counts6
    meta[vc:7 * vc] = c.reshape(-1)
    p = np.zeros((vc, 3), np.int32)
    p[:nv] = positions
    meta[7 * vc:] = p.reshape(-1)
    return meta


def _normalize_counts6(counts_sel):
    """Accept legacy [vcap] totals (everything as one dir-0 segment — the
    expansion then gathers row[0:count] exactly like the pre-dir-aware
    path) or [vcap, 6] per-dir counts."""
    counts_sel = np.asarray(counts_sel, np.int64)
    if counts_sel.ndim == 1:
        c6 = np.zeros((counts_sel.shape[0], 6), np.int64)
        c6[:, 0] = counts_sel
        return c6
    return counts_sel


def _truncate_units(counts6, mask6, cap):
    """Clip the masked unit lengths so the stream fits ``cap``: suffix
    units lose quads first (units are (chunk, dir) in chunk-major order,
    chunks front-to-back).  Returns (counts6_upload, total): the partial
    unit's FULL count is rewritten to its kept length — sound because
    every later dir of that chunk is fully truncated, so the shifted
    row starts are only ever used by zero-length units."""
    lens = (counts6 * mask6).reshape(-1)
    cum = np.cumsum(lens)
    keep = np.minimum(lens, np.maximum(cap - (cum - lens), 0))
    c6u = counts6.reshape(-1).copy()
    m = mask6.reshape(-1).astype(bool)
    c6u[m] = keep[m]
    return c6u.reshape(counts6.shape), int(keep.sum())


def _two_pass_step(quads, quad_world, n_quads, view_proj, cam_pos, *,
                   near_quads: int, gather_cap: int, **step_kw):
    """Exact two-pass occlusion (the reference's never-wired HiZ consult,
    macrotile_renderer.rs:68-70, completed): render the nearest
    ``near_quads`` of the front-to-back stream, build a max-depth pyramid
    of the result (ops/hiz.build_max_pyramid), PROVABLY-losing far quads
    are culled before their geometry/binning cost, and the far pass
    blends onto the near pass's framebuffer.  Commutative blending makes
    the output bit-identical to the single-pass frame (tested)."""
    pre_geom = None
    if step_kw.get("use_pallas") and not step_kw.get("span_mode"):
        # project ONCE for both passes (each _render_step would otherwise
        # run its own geometry stage — a second taxed Pallas call plus a
        # second full-stream projection); the per-pass quad ranges fold in
        # as masks inside _render_step
        tables = proj_ops.view_tables(view_proj, cam_pos)
        ga = geom_ops.project_cull_pallas(
            quads, (quad_world[0], quad_world[1], quad_world[2]), n_quads,
            tables.view_proj, tables.cam_pos,
            width=step_kw["width"], height=step_kw["height"],
            backface_culling=step_kw["backface_culling"],
            interpret=step_kw["interpret"],
        )
        pre_geom = (ga["valid"], ga["bbx"], ga["bby"], ga["depth_near"],
                    ga["subpixel"].sum().astype(jnp.int32))
    n1 = jnp.minimum(n_quads, jnp.int32(near_quads))
    color1, depth1, s1 = _render_step(
        quads, quad_world, n1, view_proj, cam_pos,
        gather_cap=gather_cap, pre_geom=pre_geom, **step_kw)
    hiz1 = hiz_ops.build_max_pyramid(depth1)
    color, depth, s2 = _render_step(
        quads, quad_world, n_quads, view_proj, cam_pos,
        gather_cap=gather_cap, skip_quads=jnp.int32(near_quads),
        hiz_level1=hiz1, init_color=color1, init_depth=depth1,
        pre_geom=pre_geom, **step_kw)
    # with a shared projection the per-pass subpixel counts are the same
    # measurement — count it once
    subpix = s2[4] if pre_geom is not None else s1[4] + s2[4]
    stats = jnp.stack([
        s2[0], s1[1] + s2[1], s1[2] + s2[2], s1[3] + s2[3],
        subpix, s2[5],
    ])
    return color, depth, stats


def _c6_of(vals, counts):
    """Per-face-direction histogram of packed quad rows, device-side.

    The pool keeps a device-resident counts6 mirror so the per-frame
    draw-list upload can drop the 6 count shorts per chunk (META5 layout,
    rendering/pipeline.py) — the mirror updates ride the SAME donated
    dispatch as the quad scatter, costing zero extra H2D bytes and zero
    extra round trips (each separate transfer is ~a round trip on
    relay-attached hosts, NOTES.md)."""
    k, mc = vals.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (k, mc), 1)
    d = ((vals >> jnp.uint32(29)) & jnp.uint32(7)).astype(jnp.int32)
    valid = j < counts[:, None]
    return jnp.stack([((d == i) & valid).sum(1) for i in range(6)],
                     axis=1).astype(jnp.int32)


def apply_insert_payload(pool, c6pool, packed, *, k: int, mc: int):
    """Device-side half of the flat-stream insert (shared by the
    standalone jit below and the fused insert+render frame,
    rendering/pipeline._fused_frame_insert): rebuild [k, mc] rows from
    the flat payload with one gather and scatter them into the pool +
    counts6 mirror.  ``packed`` u32[3k + fp] — slots | starts | counts
    header, then the flat quad words."""
    slots = packed[:k].astype(jnp.int32)
    starts = packed[k:2 * k].astype(jnp.int32)
    counts = packed[2 * k:3 * k].astype(jnp.int32)
    flat = packed[3 * k:]
    j = jax.lax.broadcasted_iota(jnp.int32, (k, mc), 1)
    idx = jnp.clip(starts[:, None] + j, 0, flat.shape[0] - 1)
    vals = jnp.where(j < counts[:, None], flat[idx], jnp.uint32(0))
    full = jnp.zeros((k, pool.shape[1]), pool.dtype).at[:, :mc].set(vals)
    return (pool.at[slots].set(full),
            c6pool.at[slots].set(_c6_of(vals, counts)))


def _pack_cam(view_proj, cam_pos) -> np.ndarray:
    out = np.empty(19, np.float32)
    out[:16] = np.asarray(view_proj, np.float32).ravel()
    out[16:] = np.asarray(cam_pos, np.float32)
    return out


META_SHORTS = 11  # slots | counts6 | dir-mask bits | positions, per chunk
META5_SHORTS = 5  # slots | dir-mask bits | positions (counts6 read from
                  # the pool's device-resident mirror, QuadPool.counts6_dev
                  # — the fast path; the 11-short layout remains for the
                  # rare truncation fallback, whose clipped counts differ
                  # from the mirror, and for callers without a pool mirror)


def _unpack_meta(meta_i, vcap: int):
    """One consolidated int16 upload -> (slots, counts6, mask6,
    positions) int32.

    Per-frame host->device transfers each cost a round trip on
    relay-attached hosts, so the per-chunk draw-list arrays travel as a
    single [vcap*11] array (slots | counts6.ravel | mask bits |
    positions.ravel), in int16 (every value fits: pool slots < 32768,
    per-dir quad counts <= QUADS_PER_CHUNK_CAP = 4096, mask is 6 bits,
    chunk grid coords are small)."""
    meta_i = meta_i.astype(jnp.int32)
    slots = meta_i[:vcap]
    counts6 = meta_i[vcap:7 * vcap].reshape(vcap, 6)
    maskb = meta_i[7 * vcap:8 * vcap]
    mask6 = jnp.stack([(maskb >> d) & 1 for d in range(6)], axis=1)
    positions = meta_i[8 * vcap:11 * vcap].reshape(vcap, 3)
    return slots, counts6, mask6, positions


def _pack_meta(vcap, slots, counts6, mask6, positions) -> np.ndarray:
    meta = np.zeros(META_SHORTS * vcap, np.int16)
    n = len(slots)
    meta[:n] = np.asarray(slots, np.int16)
    c6 = np.zeros((vcap, 6), np.int16)
    c6[:n] = counts6[:n]
    meta[vcap:7 * vcap] = c6.ravel()
    mb = np.zeros(vcap, np.int16)
    mb[:n] = (np.asarray(mask6[:n], np.int16)
              << np.arange(6, dtype=np.int16)[None, :]).sum(1)
    meta[7 * vcap:8 * vcap] = mb
    p = np.zeros((vcap, 3), np.int16)
    p[:n] = np.asarray(positions[:n], np.int16)
    meta[8 * vcap:11 * vcap] = p.ravel()
    return meta


def _unpack_meta5(meta_i, vcap: int):
    """META5 layout: slots | dir-mask bits | positions (no counts —
    those come from the device-resident pool mirror)."""
    meta_i = meta_i.astype(jnp.int32)
    slots = meta_i[:vcap]
    maskb = meta_i[vcap:2 * vcap]
    mask6 = jnp.stack([(maskb >> d) & 1 for d in range(6)], axis=1)
    positions = meta_i[2 * vcap:5 * vcap].reshape(vcap, 3)
    return slots, mask6, positions


def _pack_meta5(vcap, slots, mask6, positions) -> np.ndarray:
    meta = np.zeros(META5_SHORTS * vcap, np.int16)
    n = len(slots)
    meta[:n] = np.asarray(slots, np.int16)
    mb = np.zeros(vcap, np.int16)
    mb[:n] = (np.asarray(mask6[:n], np.int16)
              << np.arange(6, dtype=np.int16)[None, :]).sum(1)
    meta[vcap:2 * vcap] = mb
    p = np.zeros((vcap, 3), np.int16)
    p[:n] = np.asarray(positions[:n], np.int16)
    meta[2 * vcap:5 * vcap] = p.ravel()
    return meta


def _unpack_cam(cam_f):
    """One consolidated f32 upload -> (view_proj [4,4], cam_pos [3])."""
    return cam_f[:16].reshape(4, 4), cam_f[16:19]


def _fused_frame(quad_pool, meta_i, cam_f, *, vcap: int,
                 gather_cap: int, **step_kw):
    """Draw-list expansion + the full render step in ONE dispatch — the
    moving-camera path (NOTES.md item 4): frames whose draw list changed
    would otherwise pay two device round trips (prepare_uploads, then the
    step).  Also returns the expanded uploads so the caller can cache them
    for subsequent static-draw-list frames."""
    slots_sel, counts6_sel, mask6_sel, positions_sel = _unpack_meta(
        meta_i, vcap)
    view_proj, cam_pos = _unpack_cam(cam_f)
    quads, quad_world, total = _expand_uploads_impl(
        quad_pool, slots_sel, counts6_sel, mask6_sel, positions_sel,
        gather_cap)
    near_quads = step_kw.pop("near_quads", 0)
    if near_quads:
        color, depth, stats = _two_pass_step(
            quads, quad_world, total, view_proj, cam_pos,
            near_quads=near_quads, gather_cap=gather_cap, **step_kw)
    else:
        color, depth, stats = _render_step(
            quads, quad_world, total, view_proj, cam_pos,
            gather_cap=gather_cap, **step_kw)
    return color, depth, stats, quads, quad_world, total


def _fused_frame5(quad_pool, counts6_pool, frame_u, *, vcap: int,
                  gather_cap: int, **step_kw):
    """_fused_frame with the META5 draw-list upload: per-dir counts are
    GATHERED from the pool's device-resident counts6 mirror instead of
    shipped per frame — 11 -> 5 shorts/chunk of H2D on every
    draw-list-changed (streaming/moving) frame.  Padding entries carry
    slot 0 with a zero dir mask, so the stale-mirror hazard is nil: every
    gathered length is counts * mask = 0 for them (see QuadPool).

    ``frame_u`` u32[5*vcap/2 + 19] packs the int16 meta AND the f32
    camera into ONE upload: each separate host->device transfer costs
    ~a round trip on relay-attached hosts (NOTES.md), and every
    moving-camera frame takes this path.

    Returns (color, depth, stats) ONLY — the expanded stream buffers
    (2.5 MB at the vd12 cap) are per-frame garbage while the camera
    moves (the upload cache is keyed on the draw list, which changes
    every moving frame); when the camera STOPS, the engine re-expands
    once via prepare_uploads and reuses that."""
    n_meta = (META5_SHORTS * vcap) // 2
    bcast = jax.lax.bitcast_convert_type
    meta_i = bcast(frame_u[:n_meta], jnp.int16).reshape(-1)
    cam_f = bcast(frame_u[n_meta:n_meta + 19], jnp.float32)
    slots_sel, mask6_sel, positions_sel = _unpack_meta5(meta_i, vcap)
    counts6_sel = counts6_pool[slots_sel]
    view_proj, cam_pos = _unpack_cam(cam_f)
    quads, quad_world, total = _expand_uploads_impl(
        quad_pool, slots_sel, counts6_sel, mask6_sel, positions_sel,
        gather_cap)
    near_quads = step_kw.pop("near_quads", 0)
    if near_quads:
        color, depth, stats = _two_pass_step(
            quads, quad_world, total, view_proj, cam_pos,
            near_quads=near_quads, gather_cap=gather_cap, **step_kw)
    else:
        color, depth, stats = _render_step(
            quads, quad_world, total, view_proj, cam_pos,
            gather_cap=gather_cap, **step_kw)
    return color, depth, stats


def _pipe_fused5(quad_pool, counts6_pool, meta_i, cam_c,
                 quads_p, qw_p, n_p, cam_p, pre_p, *, vcap: int,
                 gather_cap: int, **step_kw):
    """Frames-in-flight step with the CURRENT frame's draw-list expansion
    fused in (META5 layout): one dispatch per moving/streaming frame —
    expansion(N) + render(N-1) + fused geometry(N)."""
    slots_sel, mask6_sel, positions_sel = _unpack_meta5(meta_i, vcap)
    counts6_sel = counts6_pool[slots_sel]
    quads_c, qw_c, total_c = _expand_uploads_impl(
        quad_pool, slots_sel, counts6_sel, mask6_sel, positions_sel,
        gather_cap)
    color, depth, stats, pre_c = _pipe_step_camf(
        quads_p, qw_p, n_p, cam_p, pre_p,
        quads_c, qw_c, total_c, cam_c,
        gather_cap=gather_cap, **step_kw)
    return color, depth, stats, pre_c, quads_c, qw_c, total_c


def _geom_fused5(quad_pool, counts6_pool, meta_i, cam_f, *, vcap: int,
                 gather_cap: int, width: int, height: int,
                 backface_culling: bool, use_pallas: bool,
                 interpret: bool):
    """Draw-list expansion + stage A only — seeds the pipeline when the
    draw list changed and there is no carried frame to render."""
    slots_sel, mask6_sel, positions_sel = _unpack_meta5(meta_i, vcap)
    counts6_sel = counts6_pool[slots_sel]
    quads, qw, total = _expand_uploads_impl(
        quad_pool, slots_sel, counts6_sel, mask6_sel, positions_sel,
        gather_cap)
    pre = _geom_camf(quads, qw, total, cam_f, width=width, height=height,
                     backface_culling=backface_culling,
                     use_pallas=use_pallas, interpret=interpret)
    return pre, quads, qw, total


def _fused_frame_insert(quad_pool, counts6_pool, frame_u, *, vcap: int,
                        gather_cap: int, kp: int, mc: int,
                        **step_kw):
    """Mesh-insert + draw-list expansion + render in ONE dispatch with
    ONE consolidated upload — the streaming-frame path: on relay-attached
    hosts each separate host->device transfer AND each dispatch costs ~a
    round trip, and a streaming frame otherwise pays three uploads (insert
    payload, draw-list meta, camera) across two dispatches.

    ``frame_u`` u32[5*vcap/2 + 19 + 3*kp + fp]:
      [META5 int16 pairs packed | camera f32 bits | insert payload]
    The pool scatter (app/engine.apply_insert_payload — shared code) runs
    BEFORE the expansion, so this frame's draw list can reference the
    just-inserted meshes.  ``quad_pool``/``counts6_pool`` are donated;
    returns (pool', counts6', color, depth, stats) — see _fused_frame5
    on why the expanded stream buffers are not returned."""
    n_meta = (META5_SHORTS * vcap) // 2
    bcast = jax.lax.bitcast_convert_type
    meta_i = bcast(frame_u[:n_meta], jnp.int16).reshape(-1)
    cam_f = bcast(frame_u[n_meta:n_meta + 19], jnp.float32)
    ins = frame_u[n_meta + 19:]
    pool2, c6b = apply_insert_payload(quad_pool, counts6_pool, ins,
                                      k=kp, mc=mc)
    slots_sel, mask6_sel, positions_sel = _unpack_meta5(meta_i, vcap)
    counts6_sel = c6b[slots_sel]
    quads, quad_world, total = _expand_uploads_impl(
        pool2, slots_sel, counts6_sel, mask6_sel, positions_sel,
        gather_cap)
    view_proj, cam_pos = _unpack_cam(cam_f)
    near_quads = step_kw.pop("near_quads", 0)
    if near_quads:
        color, depth, stats = _two_pass_step(
            quads, quad_world, total, view_proj, cam_pos,
            near_quads=near_quads, gather_cap=gather_cap, **step_kw)
    else:
        color, depth, stats = _render_step(
            quads, quad_world, total, view_proj, cam_pos,
            gather_cap=gather_cap, **step_kw)
    return pool2, c6b, color, depth, stats


def _step_camf_hiz(quads, quad_world, n_quads, cam_f, hiz1, *,
                   gather_cap: int, near_quads: int = 0, **step_kw):
    """Temporal-occlusion step: one render pass with ``hiz1`` (the
    PREVIOUS frame's rendered-depth max pyramid, or +inf on the first
    static frame) culling provably-losing quads, returning the new
    pyramid fused in the same dispatch.  Exact when camera/world/draw
    list are unchanged since the pyramid's frame (the engine guarantees
    that); see RenderConfig.temporal_hiz."""
    del near_quads  # mutually exclusive with two-pass (checked in __init__)
    view_proj, cam_pos = _unpack_cam(cam_f)
    color, depth, stats = _render_step(
        quads, quad_world, n_quads, view_proj, cam_pos,
        gather_cap=gather_cap, hiz_level1=hiz1, **step_kw)
    return color, depth, stats, hiz_ops.build_max_pyramid(depth)


def _step_camf(quads, quad_world, n_quads, cam_f, *, gather_cap: int,
               near_quads: int = 0, **step_kw):
    view_proj, cam_pos = _unpack_cam(cam_f)
    if near_quads:
        return _two_pass_step(quads, quad_world, n_quads, view_proj,
                              cam_pos, near_quads=near_quads,
                              gather_cap=gather_cap, **step_kw)
    return _render_step(quads, quad_world, n_quads, view_proj, cam_pos,
                        gather_cap=gather_cap, **step_kw)


def _step_camf_append(quads, quad_world, n_quads, cam_f, quad_pool,
                      ameta_i, offset, *,
                      gather_cap: int, append_cap: int, **step_kw):
    """Render step + resident-stream append rider (Engine resident
    mode, streaming frames): expand the previous frame's freshly
    scattered batch from the pool, blend it into a copy of the stream
    at ``offset``, and render THIS frame from the appended stream — one
    dispatch instead of an append dispatch plus a render dispatch, and
    the batch stays exactly ONE frame late (the stale-pool contract:
    inserted after frame N's dispatch, first rendered in frame N+1).
    ``n_quads`` must be the post-append total (offset + batch).
    ``ameta_i`` packs the batch draw list (slots | counts6 | positions,
    RESIDENT_APPEND_VCAP rows) into ONE i32 upload — each separate
    host->device transfer costs ~a round trip here.  Returns
    (color, depth, stats, quads2, quad_world2); callers keep quads2/qw2
    as the stream for subsequent frames."""
    vc = RESIDENT_APPEND_VCAP
    slots_sel = ameta_i[:vc]
    counts6_sel = ameta_i[vc:7 * vc].reshape(vc, 6)
    positions_sel = ameta_i[7 * vc:10 * vc].reshape(vc, 3)
    ones = jnp.ones_like(counts6_sel)
    new_q, new_w, nk = _expand_uploads_impl(
        quad_pool, slots_sel, counts6_sel, ones, positions_sel,
        append_cap)
    idx = jnp.arange(append_cap, dtype=jnp.int32)
    win_q = jax.lax.dynamic_slice(quads, (offset,), (append_cap,))
    quads2 = jax.lax.dynamic_update_slice(
        quads, jnp.where(idx < nk, new_q, win_q), (offset,))
    win_w = jax.lax.dynamic_slice(quad_world, (0, offset),
                                  (3, append_cap))
    qw2 = jax.lax.dynamic_update_slice(
        quad_world, jnp.where((idx < nk)[None, :], new_w, win_w),
        (0, offset))
    view_proj, cam_pos = _unpack_cam(cam_f)
    color, depth, stats = _render_step(
        quads2, qw2, n_quads, view_proj, cam_pos,
        gather_cap=gather_cap, **step_kw)
    return color, depth, stats, quads2, qw2


RESIDENT_INSERT_KP = 32    # resident fused-insert payload shape: chunks
RESIDENT_INSERT_MC = 1024  # per dispatch / quads per mesh / flat quad cap.
RESIDENT_INSERT_FP = 8192  # Sized from the measured streaming batches
                           # (~24-32 chunks incl. neighbor remeshes,
                           # ~150-250 quads each, occasional >512-quad
                           # mesh): FP 4096 / MC 512 pushed 28/30 batches
                           # into the insert_many fallback (diag, round 5)


def _step_camf_append_insert(quads, quad_world, n_quads, frame_i,
                             quad_pool, c6pool, *,
                             gather_cap: int, append_cap: int,
                             kp: int, mc: int, **step_kw):
    """Resident-mode streaming frame as ONE dispatch + ONE upload:
    scatter this batch's meshes into the (donated) pool
    (apply_insert_payload), expand the SAME batch from the
    freshly-scattered pool and blend it into a copy of the stream, and
    render from the appended stream.  Replaces _step_camf_append + a
    separate standalone pool scatter (insert_many) — a streaming frame
    previously paid two dispatches and two uploads; each dispatch and
    each separate host->device transfer costs ~a round trip on
    relay-attached hosts (NOTES.md).

    The staleness contract is unchanged: the batch is meshed after
    frame N's dispatch and first scattered+appended+rendered inside
    frame N+1's program — exactly one frame late, new chunks only.

    ``frame_i`` i32[10*VC + 20 + 3*kp + fp] = ameta (pack_append_meta)
    | cam (19 f32 bitcast) | offset | insert payload
    (QuadPool.prepare_insert_payload: slots|starts|counts + flat quads,
    u32 bitcast).  Returns (color, depth, stats, quads2, qw2, pool2,
    c6b) — the caller adopts the donated-in pool arrays and keeps
    quads2/qw2 as the stream."""
    vc = RESIDENT_APPEND_VCAP
    na = 10 * vc
    ameta_i = frame_i[:na]
    cam_f = jax.lax.bitcast_convert_type(frame_i[na:na + 19], jnp.float32)
    offset = frame_i[na + 19]
    payload = jax.lax.bitcast_convert_type(frame_i[na + 20:], jnp.uint32)
    pool2, c6b = apply_insert_payload(quad_pool, c6pool, payload,
                                     k=kp, mc=mc)
    slots_sel = ameta_i[:vc]
    counts6_sel = ameta_i[vc:7 * vc].reshape(vc, 6)
    positions_sel = ameta_i[7 * vc:10 * vc].reshape(vc, 3)
    ones = jnp.ones_like(counts6_sel)
    new_q, new_w, nk = _expand_uploads_impl(
        pool2, slots_sel, counts6_sel, ones, positions_sel, append_cap)
    idx = jnp.arange(append_cap, dtype=jnp.int32)
    win_q = jax.lax.dynamic_slice(quads, (offset,), (append_cap,))
    quads2 = jax.lax.dynamic_update_slice(
        quads, jnp.where(idx < nk, new_q, win_q), (offset,))
    win_w = jax.lax.dynamic_slice(quad_world, (0, offset),
                                  (3, append_cap))
    qw2 = jax.lax.dynamic_update_slice(
        quad_world, jnp.where((idx < nk)[None, :], new_w, win_w),
        (0, offset))
    view_proj, cam_pos = _unpack_cam(cam_f)
    color, depth, stats = _render_step(
        quads2, qw2, n_quads, view_proj, cam_pos,
        gather_cap=gather_cap, **step_kw)
    return color, depth, stats, quads2, qw2, pool2, c6b


def _geom_stage(quads, quad_world, n_quads, view_proj, cam_pos, *,
                width: int, height: int, backface_culling: bool,
                use_pallas: bool, interpret: bool):
    """Stage A alone -> the pre_geom tuple (valid, bbx, bby, depth_near,
    subpix_total) — seeds the frames-in-flight pipeline (the steady state
    gets it for free from the raster call's fused pass).  Same math as
    the step's internal stage A on both paths (shared code)."""
    tables = proj_ops.view_tables(view_proj, cam_pos)
    wq = (quad_world[0], quad_world[1], quad_world[2])
    if use_pallas:
        ga = geom_ops.project_cull_pallas(
            quads, wq, n_quads, tables.view_proj, tables.cam_pos,
            width=width, height=height,
            backface_culling=backface_culling, interpret=interpret)
        return (ga["valid"], ga["bbx"], ga["bby"], ga["depth_near"],
                ga["subpixel"].sum().astype(jnp.int32))
    gq = quads.shape[0]
    in_stream = jnp.arange(gq, dtype=jnp.int32) < n_quads
    pr = proj_ops.project_and_cull(
        quads, wq, in_stream, tables, width=width, height=height,
        span_mode=False, backface_culling=backface_culling)
    return (pr["valid"], pr["bb_x0"] | (pr["bb_x1"] << 16),
            pr["bb_y0"] | (pr["bb_y1"] << 16), pr["depth_near"],
            pr["subpixel"].sum().astype(jnp.int32))


def _geom_camf(quads, quad_world, n_quads, cam_f, *, width: int,
               height: int, backface_culling: bool, use_pallas: bool,
               interpret: bool):
    view_proj, cam_pos = _unpack_cam(cam_f)
    return _geom_stage(quads, quad_world, n_quads, view_proj, cam_pos,
                       width=width, height=height,
                       backface_culling=backface_culling,
                       use_pallas=use_pallas, interpret=interpret)


def _pipe_step_camf(quads_p, qw_p, n_p, cam_p, pre_p,
                    quads_c, qw_c, n_c, cam_c, *, gather_cap: int,
                    near_quads: int = 0, **step_kw):
    """Frames-in-flight step: render frame N-1 (the carried ``pre_p``
    geometry + its stream/camera) and compute frame N's stage A in the
    SAME dispatch — on the pallas path the geometry rides INSIDE the
    raster kernel call (ops/raster._fused_geom_pass), so each frame pays
    the flat per-Pallas-call dispatch tax once instead of twice.  Returns
    (color, depth, stats) of frame N-1 and frame N's pre_geom carry.
    Frames are bit-identical to the serial step (tested)."""
    assert not near_quads, "pipelined mode excludes two-pass occlusion"
    vp_p, cp_p = _unpack_cam(cam_p)
    if step_kw.get("use_pallas"):
        vp_c, cp_c = _unpack_cam(cam_c)
        color, depth, stats, pre_c = _render_step(
            quads_p, qw_p, n_p, vp_p, cp_p, gather_cap=gather_cap,
            pre_geom=pre_p, next_geom=(quads_c, qw_c, n_c, vp_c, cp_c),
            **step_kw)
        return color, depth, stats, pre_c
    # jnp twin: same decomposition, geometry as plain XLA in the same jit
    color, depth, stats = _render_step(
        quads_p, qw_p, n_p, vp_p, cp_p, gather_cap=gather_cap,
        pre_geom=pre_p, **step_kw)
    vp_c, cp_c = _unpack_cam(cam_c)
    pre_c = _geom_stage(
        quads_c, qw_c, n_c, vp_c, cp_c, width=step_kw["width"],
        height=step_kw["height"],
        backface_culling=step_kw["backface_culling"],
        use_pallas=False, interpret=step_kw["interpret"])
    return color, depth, stats, pre_c


class Renderer:
    """Owns the jitted render step and the precomputed shading/texture
    tables (the analogue of Rasterizer + its Arc<TextureAtlas>,
    rasterizer.rs:335-374)."""

    def __init__(self, config: RenderConfig | None = None,
                 atlas: TextureAtlas | None = None):
        self.config = config or RenderConfig()
        self.atlas = atlas or TextureAtlas()
        self._rebuild_tables()
        cfg = self.config
        if cfg.packed_raster and cfg.two_pass_near_quads:
            raise ValueError(
                "packed_raster and two_pass_near_quads are mutually "
                "exclusive: the packed kernel cannot blend onto the near "
                "pass's framebuffer (no init support)")
        use_pallas = cfg.resolve_use_pallas()
        tile_h, tile_w = (cfg.tile_h, cfg.tile_w)
        if cfg.height % tile_h or cfg.width % tile_w:
            tile_h, tile_w = raster_ops.pick_tile(cfg.height, cfg.width)
        self.tile = (tile_h, tile_w)
        self._base_step_kw = dict(
            color_tables=self._tables_np,
            width=cfg.width,
            height=cfg.height,
            tile_h=tile_h,
            tile_w=tile_w,
            span_mode=cfg.span_mode,
            backface_culling=cfg.backface_culling,
            use_pallas=use_pallas,
            interpret=False,
            packed_raster=cfg.packed_raster,
            near_quads=cfg.two_pass_near_quads,
            stream_group=cfg.stream_group,
            row_tree=cfg.row_tree,
            block_q=cfg.block_q,
        )
        # capacity buckets: every mid-stage cost (compaction sort, record
        # gather, binning sort) scales with the static gather/render caps,
        # so small scenes should not pay the vd12-sized pipeline.  Each
        # bucket jits its own step (compiled lazily, cached persistently);
        # the engine picks the smallest bucket holding the frame's quad
        # total (VERDICT r2 item 7).  A quads_cap-sized bucket rides
        # along: at that size the step runs the NO-COMPACTION mode
        # (gather fits the render cap — no compaction sort at all; pow2
        # sort rules don't apply because nothing is sorted), which the
        # dir-culled vd12 stream now fits.
        cands = {cfg.gather_cap // 4, cfg.gather_cap // 2, cfg.gather_cap,
                 min(cfg.quads_cap, cfg.gather_cap)}
        self.gather_buckets = tuple(
            sorted(c for c in cands if c >= 16384)) or (cfg.gather_cap,)
        self._steps: dict[int, tuple] = {}
        self._hiz_steps: dict[int, object] = {}
        self._pipe_steps: dict[int, tuple] = {}
        self._pipe_carry: tuple | None = None  # (cap, uploads, cam_f, pre)
        self._pipe_done: tuple | None = None   # serially-rendered result
        #                                        awaiting emission
        self._cam_cache: tuple | None = None   # (key bytes, device cam)
        self._insert_steps: dict[int, object] = {}  # fused insert+render
        self._append_steps: dict[int, object] = {}  # resident append rider
        self._append_ins_steps: dict[int, object] = {}  # + fused scatter
        if cfg.temporal_hiz and cfg.two_pass_near_quads:
            raise ValueError(
                "temporal_hiz and two_pass_near_quads are mutually "
                "exclusive (both are forms of the same exact pyramid "
                "cull; the temporal one has no near pass to seed)")
        self._step, self._fused, self._fused5 = self._steps_for(
            cfg.gather_cap)

    def _bucket_kw(self, gather_cap: int) -> dict:
        """Per-bucket step kwargs: render and bin caps shrink
        proportionally with the gather cap (sized ~1.3x / ~1.7x the
        worst-case survivor counts like the full-size defaults).  Shared
        by the normal, fused and temporal-hiz step builders so every
        entry point sizes a bucket identically."""
        cfg = self.config
        return dict(self._base_step_kw,
                    render_cap=min(cfg.quads_cap, gather_cap),
                    tile_k_cap=min(cfg.tile_k_cap, 2 * gather_cap))

    def _steps_for(self, gather_cap: int):
        """(step, fused, fused5) jitted triple for one gather-cap bucket
        (fused = 11-short meta, the truncation/no-mirror fallback;
        fused5 = 5-short meta + device counts6 mirror, the fast path)."""
        got = self._steps.get(gather_cap)
        if got is not None:
            return got
        kw = self._bucket_kw(gather_cap)
        step = jax.jit(
            functools.partial(_step_camf, gather_cap=gather_cap, **kw))
        fused = jax.jit(
            functools.partial(_fused_frame, gather_cap=gather_cap,
                              vcap=self.config.visible_chunks_cap, **kw))
        fused5 = jax.jit(
            functools.partial(_fused_frame5, gather_cap=gather_cap,
                              vcap=self.config.visible_chunks_cap, **kw))
        self._steps[gather_cap] = (step, fused, fused5)
        return step, fused, fused5

    def bucket_for(self, total_quads: int) -> int:
        for c in self.gather_buckets:
            if total_quads <= c:
                return c
        return self.gather_buckets[-1]

    def warm_buckets(self, quad_pool, counts6_pool=None,
                     pipelined: bool = False) -> None:
        """Pre-trace + compile EVERY capacity bucket's (fused, step) pair.

        The bucket scheme jits one step per gather cap; the first frame
        that crosses a bucket boundary otherwise pays the full jit trace
        inside the frame loop — measured ~2.5 s of host time per entry
        point even when the XLA binary is a persistent-cache hit (tracing
        + MLIR conversion are not cached).  Warming moves that cost to
        startup, where the reference pays its own world-prime cost
        (main.rs:66-100)."""
        vcap = self.config.visible_chunks_cap
        cam = jnp.asarray(_pack_cam(np.eye(4, dtype=np.float32),
                                    np.zeros(3, np.float32)))
        if counts6_pool is not None:
            # the production path: META5 + device counts6 mirror
            meta = np.zeros(META5_SHORTS * vcap, np.int16)
            meta[vcap] = 0x3F    # all six dirs kept (slot 0's counts)
        else:
            meta = np.zeros(META_SHORTS * vcap, np.int16)
            meta[vcap] = 1           # one quad from pool slot 0, dir 0
            meta[7 * vcap] = 0x3F    # all six dirs kept
        for cap in self.gather_buckets:
            step, fused, fused5 = self._steps_for(cap)
            if counts6_pool is not None:
                frame_u = np.concatenate([
                    meta.view(np.uint32),
                    np.asarray(cam).view(np.uint32)])
                jax.block_until_ready(fused5(
                    quad_pool, counts6_pool, jnp.asarray(frame_u))[0])
                # uploads for warming the plain step come from the
                # standalone expansion (fused5 no longer returns them)
                slots5, mask65, pos5 = _unpack_meta5(
                    jnp.asarray(meta).astype(jnp.int32), vcap)
                quads, quad_world, total_dev = _expand_uploads(
                    quad_pool, slots5, counts6_pool[slots5],
                    mask65, pos5, gather_cap=cap)
                if cap == self.gather_buckets[-1]:
                    # the 11-short truncation fallback is reachable only
                    # at the LARGEST bucket (truncated => total > every
                    # bucket): warm it there too, or the first over-cap
                    # frame pays the trace mid-flight
                    meta11 = np.zeros(META_SHORTS * vcap, np.int16)
                    meta11[vcap] = 1
                    meta11[7 * vcap] = 0x3F
                    jax.block_until_ready(fused(
                        quad_pool, jnp.asarray(meta11), cam)[0])
            else:
                _c, _d, _s, quads, quad_world, total_dev = fused(
                    quad_pool, jnp.asarray(meta), cam)
            jax.block_until_ready(
                step(quads, quad_world, total_dev, cam))
            if self.config.temporal_hiz:
                jax.block_until_ready(self._hiz_step_for(cap)(
                    quads, quad_world, total_dev, cam, self.empty_hiz()))
            if pipelined and counts6_pool is not None:
                pipe, geom, pipe_f5, geom_f5 = self._pipe_steps_for(cap)
                pre, q2, qw2, t2 = geom_f5(quad_pool, counts6_pool,
                                           jnp.asarray(meta), cam)
                jax.block_until_ready(geom(q2, qw2, t2, cam)[0])
                jax.block_until_ready(pipe(
                    q2, qw2, t2, cam, pre, q2, qw2, t2, cam)[0])
                jax.block_until_ready(pipe_f5(
                    quad_pool, counts6_pool, jnp.asarray(meta), cam,
                    q2, qw2, t2, cam, pre)[0])

    def _rebuild_tables(self) -> None:
        self._tables_np = build_quad_color_tables(
            self.atlas.kernel_tables(),
            enable_shading=self.config.enable_shading,
            enable_textures=self.config.enable_textures,
        )

    def set_shading(self, enable: bool) -> None:
        """Runtime toggle, like the reference's F key (main.rs:143-153).
        Rebuilding the tables retraces the step (tables are compile-time
        constants), exactly like the reference's per-thread Rasterizer
        clone with new config (main.rs:581-590)."""
        self.config.enable_shading = enable
        self.__init__(self.config, self.atlas)

    def _prep_meta(self, visible_slots, counts_sel, positions_sel,
                   dir_mask):
        """Shared draw-list normalization for prepare_uploads /
        render_fused: accepts legacy [vcap] totals or [vcap, 6] per-dir
        counts (+ optional [vcap, 6] keep mask), sizes the capacity
        bucket from the MASKED total, and truncates suffix units to
        fit.  Returns (slots i32[vcap], counts6 i64[vcap, 6],
        mask6 i64[vcap, 6], positions i32[vcap, 3], cap, truncated);
        ``truncated`` counts6 differ from the pool's device mirror, so
        render_fused must ship them (the 11-short fallback layout)."""
        counts6 = _normalize_counts6(counts_sel)
        mask6 = (np.ones_like(counts6) if dir_mask is None
                 else np.asarray(dir_mask, np.int64))
        # Zero the mask where the HOST counts row is empty: callers pad
        # the vcap arrays with mask=1 rows, which the legacy layout
        # neutralized via its zeroed count upload — but the META5 layout
        # gathers counts from the device mirror, where a padding entry
        # (slot 0) aliases a LIVE chunk's real counts.  Masking on the
        # host row (all-zero for padding AND for empty meshes, whose
        # contribution is zero either way) keeps both layouts identical.
        mask6 = mask6 * (counts6.sum(axis=1, keepdims=True) > 0)
        total = int((counts6 * mask6).sum())
        cap = self.bucket_for(total)
        truncated = total > cap
        if truncated:
            counts6, total = _truncate_units(counts6, mask6, cap)
        slots_a = np.asarray(visible_slots, np.int32)
        pos_a = np.asarray(positions_sel, np.int32)
        if slots_a.max(initial=0) > 32767 or np.abs(pos_a).max() > 32767:
            # the int16 packing would silently wrap and gather the WRONG
            # pool rows / chunk origins — fail loudly instead
            raise ValueError(
                "draw-list meta exceeds int16 range (pool slot > 32767 "
                "or |chunk grid coord| > 32767); shrink the pool or the "
                "world extent, or widen the meta upload")
        return slots_a, counts6, mask6, pos_a, cap, truncated

    def prepare_uploads(self, quad_pool, visible_slots, counts_sel,
                        positions_sel, dir_mask=None):
        """Draw-list-dependent device state: upload the tiny per-chunk
        arrays and expand + gather the quad stream on device.  Cacheable
        by the caller while the draw list (incl. ``dir_mask``) is
        unchanged — the camera-dependent step never re-gathers.

        ``counts_sel``: [vcap] totals (legacy) or [vcap, 6] per-face-dir
        counts; ``dir_mask``: optional [vcap, 6] 0/1 keep mask (see
        _expand_uploads_impl)."""
        slots_a, counts6, mask6, pos_a, cap, _trunc = self._prep_meta(
            visible_slots, counts_sel, positions_sel, dir_mask)
        quads, quad_world, total_dev = _expand_uploads(
            quad_pool,
            jnp.asarray(slots_a),
            jnp.asarray(counts6.astype(np.int32)),
            jnp.asarray(mask6.astype(np.int32)),
            jnp.asarray(pos_a),
            gather_cap=cap,
        )
        return quads, quad_world, total_dev

    def render_fused(self, quad_pool, visible_slots, counts_sel,
                     positions_sel, view_proj, cam_pos, dir_mask=None,
                     counts6_dev=None):
        """Draw-list expansion + render in ONE dispatch (the moving-camera
        path).  Returns (color, depth, stats, uploads) — cache ``uploads``
        and call render_prepared while the draw list stays unchanged.
        All per-frame host state crosses as TWO consolidated uploads
        (draw-list ints, camera floats) — each separate H2D costs a round
        trip on relay-attached hosts.  With ``counts6_dev`` (the pool's
        device counts6 mirror, QuadPool.counts6_dev) the draw-list upload
        drops the 6 count shorts per chunk (META5); the 11-short layout
        remains for truncated frames (clipped counts differ from the
        mirror) and mirror-less callers."""
        slots_a, counts6, mask6, pos_a, cap, truncated = self._prep_meta(
            visible_slots, counts_sel, positions_sel, dir_mask)
        vcap = self.config.visible_chunks_cap
        cam = self._cam_dev(view_proj, cam_pos)
        _, fused, fused5 = self._steps_for(cap)
        # legacy [vcap] totals put everything in a synthetic dir-0
        # segment, which the device mirror (true per-dir counts) does not
        # reproduce — with a dir_mask the two would disagree on lengths,
        # so legacy-counts callers always take the 11-short layout
        legacy_counts = np.asarray(counts_sel).ndim == 1
        if counts6_dev is not None and not truncated and not legacy_counts:
            frame_u = np.concatenate([
                _pack_meta5(vcap, slots_a, mask6, pos_a).view(np.uint32),
                _pack_cam(view_proj, cam_pos).view(np.uint32),
            ])
            color, depth, stats = fused5(
                quad_pool, counts6_dev, jnp.asarray(frame_u))
            # the expanded stream is NOT returned (2.5 MB of per-frame
            # outputs that are garbage while the camera moves); callers
            # re-expand via prepare_uploads when the draw list settles
            return color, depth, stats, None
        meta = _pack_meta(vcap, slots_a, counts6, mask6, pos_a)
        color, depth, stats, quads, quad_world, total_dev = fused(
            quad_pool, jnp.asarray(meta), cam)
        return color, depth, stats, (quads, quad_world, total_dev)

    def _cam_dev(self, view_proj, cam_pos):
        """Device copy of the packed camera, cached while the camera is
        unchanged: each separate host->device transfer costs ~a round
        trip on relay-attached hosts (NOTES.md), and static frames would
        otherwise re-ship 19 identical floats every frame.  Moving
        cameras miss (one small upload per frame — inherent)."""
        packed = _pack_cam(view_proj, cam_pos)
        key = packed.tobytes()
        c = self._cam_cache
        if c is not None and c[0] == key:
            return c[1]
        dev = jnp.asarray(packed)
        self._cam_cache = (key, dev)
        return dev

    def render_prepared(self, uploads, view_proj, cam_pos):
        quads, quad_world, total = uploads
        step, _, _ = self._steps_for(int(quads.shape[0]))
        return step(
            quads, quad_world, total,
            self._cam_dev(view_proj, cam_pos),
        )

    def _append_step_for(self, gather_cap: int):
        got = self._append_steps.get(gather_cap)
        if got is None:
            kw = self._bucket_kw(gather_cap)
            if kw.pop("near_quads", 0):
                raise ValueError(
                    "resident mode does not compose with "
                    "two_pass_near_quads (the near/far split would need "
                    "the per-frame draw list)")
            got = jax.jit(functools.partial(
                _step_camf_append, gather_cap=gather_cap,
                append_cap=resident_append_cap(gather_cap), **kw))
            self._append_steps[gather_cap] = got
        return got

    def render_prepared_append(self, uploads, view_proj, cam_pos,
                               quad_pool, ameta: np.ndarray,
                               offset: int):
        """Resident-mode streaming frame: render from the pre-append
        stream AND fold the pending batch append into the same dispatch
        (_step_camf_append).  ``ameta`` comes from pack_append_meta.
        Returns (color, depth, stats, (quads2, quad_world2)); the
        caller tracks the new total (offset + batch)."""
        quads, qw, total = uploads
        step = self._append_step_for(int(quads.shape[0]))
        color, depth, stats, q2, w2 = step(
            quads, qw, total, self._cam_dev(view_proj, cam_pos),
            quad_pool, jnp.asarray(ameta), jnp.int32(offset))
        return color, depth, stats, (q2, w2)

    def _append_ins_step_for(self, gather_cap: int):
        got = self._append_ins_steps.get(gather_cap)
        if got is None:
            kw = self._bucket_kw(gather_cap)
            if kw.pop("near_quads", 0):
                raise ValueError(
                    "resident mode does not compose with "
                    "two_pass_near_quads")
            got = jax.jit(functools.partial(
                _step_camf_append_insert, gather_cap=gather_cap,
                append_cap=resident_append_cap(gather_cap),
                kp=RESIDENT_INSERT_KP, mc=RESIDENT_INSERT_MC, **kw),
                donate_argnums=(4, 5))
            self._append_ins_steps[gather_cap] = got
        return got

    def render_prepared_append_insert(self, uploads, view_proj, cam_pos,
                                      quad_pool, counts6_dev,
                                      ameta: np.ndarray, offset: int,
                                      payload: np.ndarray):
        """Resident-mode streaming frame, fully fused: pool scatter of
        the pending batch + stream append + render as ONE dispatch with
        ONE consolidated i32 upload (_step_camf_append_insert).
        ``payload`` comes from QuadPool.prepare_insert_payload with the
        resident shape (RESIDENT_INSERT_KP/_FP).  Returns (color, depth,
        stats, (quads2, qw2), pool2, c6b) — the caller MUST adopt the
        donated-in pool arrays."""
        quads, qw, total = uploads
        step = self._append_ins_step_for(int(quads.shape[0]))
        frame_i = np.concatenate([
            np.asarray(ameta, np.int32),
            _pack_cam(view_proj, cam_pos).view(np.int32),
            np.asarray([offset], np.int32),
            np.asarray(payload, np.uint32).view(np.int32),
        ])
        color, depth, stats, q2, w2, pool2, c6b = step(
            quads, qw, total, jnp.asarray(frame_i), quad_pool,
            counts6_dev)
        return color, depth, stats, (q2, w2), pool2, c6b

    # ----------------------------------------- fused insert+render frame
    INSERT_KP = 16
    INSERT_MC = 512
    INSERT_FP = 8192

    def _insert_step_for(self, gather_cap: int):
        got = self._insert_steps.get(gather_cap)
        if got is None:
            got = jax.jit(
                functools.partial(
                    _fused_frame_insert, gather_cap=gather_cap,
                    vcap=self.config.visible_chunks_cap,
                    kp=self.INSERT_KP, mc=self.INSERT_MC,
                    **self._bucket_kw(gather_cap)),
                donate_argnums=(0, 1))
            self._insert_steps[gather_cap] = got
        return got

    def render_fused_insert(self, quad_pool, counts6_dev, visible_slots,
                            counts_sel, positions_sel, view_proj, cam_pos,
                            insert_payload, dir_mask=None):
        """Streaming-frame fast path: mesh-insert + draw-list expansion +
        render as ONE dispatch with ONE consolidated upload (see
        _fused_frame_insert).  ``insert_payload`` comes from
        QuadPool.prepare_insert_payload (host state already updated).
        Returns (new_pool, new_counts6, color, depth, stats, uploads) —
        the caller MUST adopt the returned (donated-in) pool arrays — or
        None when the frame needs a fallback layout (truncated / legacy
        counts), in which case nothing was dispatched."""
        assert insert_payload.shape == (
            3 * self.INSERT_KP + self.INSERT_FP,)
        slots_a, counts6, mask6, pos_a, cap, truncated = self._prep_meta(
            visible_slots, counts_sel, positions_sel, dir_mask)
        if truncated or np.asarray(counts_sel).ndim == 1:
            return None
        vcap = self.config.visible_chunks_cap
        meta = _pack_meta5(vcap, slots_a, mask6, pos_a)
        frame_u = np.concatenate([
            meta.view(np.uint32),
            _pack_cam(view_proj, cam_pos).view(np.uint32),
            np.asarray(insert_payload, np.uint32),
        ])
        out = self._insert_step_for(cap)(quad_pool, counts6_dev,
                                         jnp.asarray(frame_u))
        pool2, c6b, color, depth, stats = out
        return pool2, c6b, color, depth, stats

    # ------------------------------------------- frames-in-flight pipeline
    def _check_pipelined(self) -> None:
        cfg = self.config
        if (cfg.temporal_hiz or cfg.two_pass_near_quads or cfg.span_mode
                or cfg.packed_raster):
            raise ValueError(
                "pipelined rendering excludes temporal_hiz, two-pass "
                "occlusion, span mode and the packed kernel")

    def _geom_kw(self) -> dict:
        k = self._base_step_kw
        return dict(width=k["width"], height=k["height"],
                    backface_culling=k["backface_culling"],
                    use_pallas=k["use_pallas"], interpret=k["interpret"])

    def _pipe_steps_for(self, cap: int):
        """(pipe_step, geom_step, pipe_fused5, geom_fused5) jits for one
        bucket — compiled lazily; warm via warm_buckets(pipelined=True)."""
        got = self._pipe_steps.get(cap)
        if got is not None:
            return got
        kw = self._bucket_kw(cap)
        gkw = self._geom_kw()
        vcap = self.config.visible_chunks_cap
        got = (
            jax.jit(functools.partial(_pipe_step_camf, gather_cap=cap,
                                      **kw)),
            jax.jit(functools.partial(_geom_camf, **gkw)),
            jax.jit(functools.partial(_pipe_fused5, gather_cap=cap,
                                      vcap=vcap, **kw)),
            jax.jit(functools.partial(_geom_fused5, gather_cap=cap,
                                      vcap=vcap, **gkw)),
        )
        self._pipe_steps[cap] = got
        return got

    def render_prepared_pipelined(self, uploads, view_proj, cam_pos):
        """Frames-in-flight render (one frame of latency): dispatch frame
        N (its stage-A geometry fused into the carried frame's raster
        call) and return frame N-1's (color, depth, stats) — or None when
        the pipeline was empty (first frame; drain the tail with
        pipeline_flush).  Exactly one result is emitted per entered frame
        across render_*_pipelined / pipeline_flush calls, in order, and
        every frame is bit-identical to render_prepared (tested); only
        the dispatch schedule changes — each frame pays ONE taxed Pallas
        call instead of two (ops/raster._fused_geom_pass)."""
        self._check_pipelined()
        quads, quad_world, total = uploads
        cap = int(quads.shape[0])
        cam = self._cam_dev(view_proj, cam_pos)
        out, carry = self._pipe_drain_if(cap)
        pipe, geom, _, _ = self._pipe_steps_for(cap)
        if carry is None:
            pre = geom(quads, quad_world, total, cam)
            self._pipe_carry = (cap, uploads, cam, pre)
            return out
        _, up_p, cam_p, pre_p = carry
        color, depth, stats, pre_c = pipe(
            up_p[0], up_p[1], up_p[2], cam_p, pre_p,
            quads, quad_world, total, cam)
        self._pipe_carry = (cap, uploads, cam, pre_c)
        return color, depth, stats

    def render_fused_pipelined(self, quad_pool, visible_slots, counts_sel,
                               positions_sel, view_proj, cam_pos,
                               dir_mask=None, counts6_dev=None):
        """Pipelined render with the CURRENT frame's draw-list expansion
        fused into the same dispatch (the moving/streaming path; META5
        layout).  Returns (result_or_None, uploads): ``result`` is the
        OLDEST pending frame's (color, depth, stats) and ``uploads`` is
        frame N's expanded stream (cache it like render_fused's).
        Truncated frames / legacy counts / missing counts6 mirror fall
        back to a serial render on the well-tested path (the pipeline
        drains first; emission order is preserved via a done-queue)."""
        self._check_pipelined()
        slots_a, counts6, mask6, pos_a, cap, truncated = self._prep_meta(
            visible_slots, counts_sel, positions_sel, dir_mask)
        legacy_counts = np.asarray(counts_sel).ndim == 1
        if counts6_dev is None or truncated or legacy_counts:
            out = self.pipeline_flush()
            color, depth, stats, uploads = self.render_fused(
                quad_pool, visible_slots, counts_sel, positions_sel,
                view_proj, cam_pos, dir_mask=dir_mask,
                counts6_dev=counts6_dev)
            if out is None:
                return (color, depth, stats), uploads
            # pipeline held a frame: emit it now, queue the serial result
            self._pipe_done = (color, depth, stats)
            return out, uploads
        vcap = self.config.visible_chunks_cap
        cam = self._cam_dev(view_proj, cam_pos)
        meta = jnp.asarray(_pack_meta5(vcap, slots_a, mask6, pos_a))
        out, carry = self._pipe_drain_if(cap)
        pipe, geom, pipe_f5, geom_f5 = self._pipe_steps_for(cap)
        if carry is None:
            pre, quads, qw, total = geom_f5(quad_pool, counts6_dev, meta,
                                            cam)
            uploads = (quads, qw, total)
            self._pipe_carry = (cap, uploads, cam, pre)
            return out, uploads
        _, up_p, cam_p, pre_p = carry
        color, depth, stats, pre_c, quads, qw, total = pipe_f5(
            quad_pool, counts6_dev, meta, cam,
            up_p[0], up_p[1], up_p[2], cam_p, pre_p)
        uploads = (quads, qw, total)
        self._pipe_carry = (cap, uploads, cam, pre_c)
        return (color, depth, stats), uploads

    def _pipe_drain_if(self, cap: int):
        """Emit any done-queue entry / drain a bucket-mismatched carry.
        Returns (result_or_None, carry_or_None): ``carry`` is usable for
        a pipelined step at ``cap``; ``result`` must be emitted first."""
        done = self._pipe_done
        self._pipe_done = None
        carry = self._pipe_carry
        if done is not None:
            # the done-queue is only ever filled with an empty carry
            assert carry is None, "done-queue entry beside a live carry"
            return done, None
        if carry is not None and carry[0] != cap:
            return self.pipeline_flush(), None
        return None, carry

    def pipeline_flush(self):
        """Drain the frames-in-flight state: emit the done-queue entry or
        render the carried frame serially (its geometry recomputes — same
        math, identical frame).  Returns (color, depth, stats) or None."""
        done = self._pipe_done
        self._pipe_done = None
        if done is not None:
            return done
        carry = self._pipe_carry
        if carry is None:
            return None
        self._pipe_carry = None
        cap, up, cam, _pre = carry
        step, _, _ = self._steps_for(cap)
        return step(up[0], up[1], up[2], cam)

    def _hiz_step_for(self, gather_cap: int):
        got = self._hiz_steps.get(gather_cap)
        if got is not None:
            return got
        got = jax.jit(
            functools.partial(_step_camf_hiz, gather_cap=gather_cap,
                              **self._bucket_kw(gather_cap)))
        self._hiz_steps[gather_cap] = got
        return got

    def empty_hiz(self):
        """+inf seed pyramid: culls nothing (the uniform first-static-frame
        input, so the temporal path needs no separate seeding trace)."""
        h, w = self.config.height, self.config.width
        return jnp.full(((h + 7) // 8, (w + 7) // 8), jnp.inf, jnp.float32)

    def render_prepared_hiz(self, uploads, view_proj, cam_pos, hiz1):
        """Static-camera temporal step (RenderConfig.temporal_hiz):
        render with the previous frame's max pyramid culling quads, and
        return (color, depth, stats, new_pyramid) in one dispatch.  The
        CALLER is responsible for only passing a pyramid rendered from
        the identical camera + draw list + world (else pass empty_hiz)."""
        quads, quad_world, total = uploads
        fn = self._hiz_step_for(int(quads.shape[0]))
        return fn(quads, quad_world, total,
                  self._cam_dev(view_proj, cam_pos), hiz1)

    def render(self, quad_pool, visible_slots, counts_sel, positions_sel,
               view_proj, cam_pos):
        """Returns (color int32[H, W] as ARGB bits, depth f32[H, W], stats).

        ``visible_slots``/``counts_sel``/``positions_sel``: host numpy
        per-visible-chunk pool slots, quad counts and chunk grid positions
        (front-to-back, zero-padded)."""
        uploads = self.prepare_uploads(quad_pool, visible_slots, counts_sel,
                                       positions_sel)
        return self.render_prepared(uploads, view_proj, cam_pos)


def make_repeated_step(renderer: "Renderer", n_frames: int):
    """N full render steps inside one jit (lax.fori_loop over per-frame
    cameras).  Used by bench.py to measure pure device throughput with a
    single dispatch — in this environment the TPU sits behind a network
    relay whose per-dispatch round trip would otherwise dominate."""
    cfg = renderer.config
    use_pallas = cfg.resolve_use_pallas()
    tile_h, tile_w = renderer.tile

    def run(quads, quad_world, n_quads, vps, cams):
        def body(i, carry):
            color, depth, stats = _render_step(
                quads, quad_world, n_quads,
                vps[i], cams[i],
                color_tables=renderer._tables_np,
                width=cfg.width, height=cfg.height,
                tile_h=tile_h, tile_w=tile_w,
                gather_cap=cfg.gather_cap, render_cap=cfg.quads_cap,
                span_mode=cfg.span_mode,
                backface_culling=cfg.backface_culling,
                use_pallas=use_pallas, interpret=False,
                tile_k_cap=cfg.tile_k_cap,
                packed_raster=cfg.packed_raster,
                stream_group=cfg.stream_group,
                row_tree=cfg.row_tree,
                block_q=cfg.block_q,
            )
            return color, depth, stats

        init = (
            jnp.zeros((cfg.height, cfg.width), jnp.int32),
            jnp.zeros((cfg.height, cfg.width), jnp.float32),
            jnp.zeros(6, jnp.int32),
        )
        return jax.lax.fori_loop(0, n_frames, body, init)

    return jax.jit(run)
