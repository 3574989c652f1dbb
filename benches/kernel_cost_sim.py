"""Exact control-flow simulator for the octet raster kernel.

Replays ``ops/raster._raster_kernel``'s walk — per-tile block stream,
opi-octet groups, 4-row batches, the exact suffix-min occlusion break with
REAL depth evolution (the pixel depth math is evaluated in numpy from the
same records) — and reports the cost drivers:

  tiles, steps, blocks (DMA+transpose count), groups (while iterations),
  octet loads (opi per group, incl. clamped boundary loads),
  row evals ([8,128] evaluations = groups x opi x 4 x iters),
  plus the break's cull effectiveness (octets skipped).

Motivation: the kernel is latency/machinery-bound, not op-bound (NOTES
round 3); every packing experiment so far was decided by these counts, and
hardware time on the relay is scarce.  With the per-unit constants fitted
from the measured opi sweep (NOTES: opi 1/2/4/6/8 = 4.08/3.45/3.01/2.67/
2.85 ms at vd12), the simulator predicts a variant's raster time without
the TPU.

Usage (CPU, no TPU needed):
  python benches/kernel_cost_sim.py [--opi 6] [--tps 5] [--sg 1] [--sweep]

Scene: the cached vd12 records (built via benches/profile_stages.py's
scene cache; the records themselves are cached to /tmp too).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_Q = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_records(tile_h: int = 16, order: str = "42"):
    """records [24, K], tile_starts/counts [T], octet_rows/zmin [K/8]
    for the vd12 headline scene, computed on CPU (XLA geometry form).
    ``order`` = DPVR_BIN_ORDER (within-tile item order bits)."""
    cache = f"/tmp/dpvr_records_vd12_th{tile_h}_o{order}.npz"
    os.environ["DPVR_BIN_ORDER"] = order
    if os.path.exists(cache):
        z = np.load(cache)
        return (z["records"], z["starts"], z["counts"], z["rows"],
                z["zmin"])
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["DPVR_XLA_GEOM"] = "1"  # no Pallas geometry on CPU
    import jax.numpy as jnp

    import profile_stages as PS
    from differential_projection_voxel_renderer_tpu.ops.shading import (
        build_quad_color_tables,
    )
    from differential_projection_voxel_renderer_tpu.ops.texture import (
        TextureAtlas,
    )
    from differential_projection_voxel_renderer_tpu.rendering import (
        pipeline as PL,
    )

    if not os.path.exists(PS.CACHE):
        # build the scene WITHOUT the render dispatch (the jnp rasterizer
        # at 720p/49k quads is infeasible on CPU): stub render_fused so
        # render_frame runs only the funnel + upload build.  The cached
        # scene is identical to the TPU-built one (the funnel is host
        # numpy) and profile_stages reuses it.
        from differential_projection_voxel_renderer_tpu.rendering.pipeline import (  # noqa: E501
            Renderer,
        )

        orig = Renderer.render_fused

        def stub(self, pool, vs, cs, ps, vp, cam, dir_mask=None):
            uploads = self.prepare_uploads(pool, vs, cs, ps,
                                           dir_mask=dir_mask)
            z = np.zeros(6, np.int32)
            return z, z, z, uploads

        Renderer.render_fused = stub
        try:
            PS.build_scene._orig = None  # marker only
            quads, quad_world, total, vp, cam = PS.build_scene()
            np.savez(PS.CACHE, quads=quads, quad_world=quad_world,
                     total=total, vp=vp, cam=cam)
        finally:
            Renderer.render_fused = orig
    else:
        quads, quad_world, total, vp, cam = PS.get_scene()
    tables = build_quad_color_tables(TextureAtlas().kernel_tables())
    t0 = time.time()
    out = PL._render_step(
        jnp.asarray(quads), jnp.asarray(quad_world),
        jnp.asarray(total, jnp.int32), jnp.asarray(vp), jnp.asarray(cam),
        color_tables=tables, width=1280, height=720, tile_h=tile_h,
        tile_w=128,
        gather_cap=quads.shape[0], render_cap=49152, span_mode=False,
        backface_culling=True, use_pallas=True, interpret=False,
        tile_k_cap=98304, debug_return_records=True)
    records, starts, counts, rows, zmin = [np.asarray(o) for o in out]
    log(f"records built on CPU in {time.time()-t0:.1f}s")
    np.savez(cache, records=records, starts=starts, counts=counts,
             rows=rows, zmin=zmin)
    return records, starts, counts, rows, zmin


class Counters:
    def __init__(self):
        self.tiles_nonempty = 0
        self.blocks = 0
        self.groups = 0
        self.octet_loads = 0
        self.row_iters = 0
        self.row_evals = 0
        self.ideal_row_evals = 0  # each loaded octet only its own span
        self.octets_skipped = 0  # culled by the break (never grouped)

    def as_dict(self):
        return dict(vars(self))


def simulate(records, starts, counts, rows, zmin, *, height=720,
             width=1280, tile_h=16, opi=6, sg=1, tps=5, sim_depth=True,
             row_tree=False):
    """Replay the kernel walk.  With sim_depth=False the break never
    fires (upper bound); with True the depth accumulators evolve exactly
    (depth part of the lexicographic blend) and the break replays the
    kernel's group-cadence dmax refresh."""
    out_h = -height % tile_h + height
    tiles_y, tiles_x = out_h // tile_h, width // 128
    n_tiles = tiles_y * tiles_x
    K = records.shape[1]
    n_oct = K // 8
    # decode the blend fields once: [K] each
    f = records[:16].view(np.float32)
    a01, a02 = f[1], f[2]
    a11, a12 = f[4], f[5]
    a21, a22 = f[7], f[8]
    a00, a10, a20 = f[0], f[3], f[6]
    z0, z1, z2 = f[9], f[10], f[11]
    u0, u1, v0, v1 = f[12], f[13], f[14], f[15]
    ry0 = rows & 0xFF
    ry1 = rows >> 8

    c = Counters()
    lane = np.arange(128, dtype=np.float32)
    steps_x = tiles_x // tps

    # per-tile walk (grid-step grouping only affects which tiles share a
    # step; the walk itself is per tile for sg=1, per group-of-sg for
    # shared streams — blocks are the only counter that changes with sg)
    for t in range(n_tiles):
        base, cnt = int(starts[t]), int(counts[t])
        if cnt == 0:
            continue
        c.tiles_nonempty += 1
        ty, tx = divmod(t, tiles_x)
        px0 = tx * 128
        nx = (2.0 * (px0 + lane + 0.5) - width) / width
        py0 = ty * tile_h
        acc = np.full((tile_h, 128), np.inf, np.float32)
        dmax = np.inf
        first_blk = base // BLOCK_Q
        last_blk = (base + cnt - 1) // BLOCK_Q
        nb = last_blk - first_blk + 1
        for b in range(nb):
            blk0 = (first_blk + b) * BLOCK_Q
            gbase = blk0 // 8
            k_lo = max(base - blk0, 0)
            k_hi = min(base + cnt - blk0, BLOCK_Q)
            o_hi = (k_hi + 7) // 8
            o = k_lo // 8
            while True:
                zm = zmin[min(gbase + min(o, 31), n_oct - 1)]
                if not (o < o_hi and (o * 8 < k_lo or zm <= dmax)):
                    # count octets the break skipped (would have been
                    # walked without it)
                    if o < o_hi:
                        c.octets_skipped += o_hi - o
                    break
                c.groups += 1
                c.octet_loads += opi
                # group members' spans (only o+jj < o_hi mask for jj>0)
                g0 = min(gbase + o, n_oct - 1)
                it0 = (int(ry1[g0]) - int(ry0[g0]) + 4) // 4
                iters = it0
                u0r, u1r = int(ry0[g0]), int(ry1[g0])
                c.ideal_row_evals += it0 * 4
                for jj in range(1, opi):
                    if o + jj < o_hi:
                        g = min(gbase + o + jj, n_oct - 1)
                        itj = (int(ry1[g]) - int(ry0[g]) + 4) // 4
                        iters = max(iters, itj)
                        u0r = min(u0r, int(ry0[g]))
                        u1r = max(u1r, int(ry1[g]))
                        c.ideal_row_evals += itj * 4
                if row_tree:
                    # union span over the group (shared row base)
                    iters = (u1r - u0r + 4) // 4
                c.row_iters += iters
                c.row_evals += iters * opi * 4
                if sim_depth:
                    # merge each member octet's full span into acc
                    for jj in range(opi):
                        og = gbase + o + jj
                        if og >= n_oct:
                            continue
                        kv0, kv1 = (o + jj) * 8, (o + jj) * 8 + 8
                        s0 = max(kv0, k_lo) - kv0
                        s1 = min(kv1, k_hi) - kv0
                        if s1 <= s0:
                            continue
                        ks = np.arange(og * 8 + s0, og * 8 + s1)
                        r0, r1 = int(ry0[og]), int(ry1[og])
                        ys = np.arange(r0, min(r1, tile_h - 1) + 1)
                        if len(ys) == 0:
                            continue
                        ny = (1.0 - 2.0 * ((py0 + ys).astype(np.float32)
                                           + 0.5) / height)
                        # [R, Q, L] plane evals
                        qu = (a00[ks][None, :, None] * nx[None, None, :]
                              + a01[ks][None, :, None] * ny[:, None, None]
                              + a02[ks][None, :, None])
                        qv = (a10[ks][None, :, None] * nx[None, None, :]
                              + a11[ks][None, :, None] * ny[:, None, None]
                              + a12[ks][None, :, None])
                        qw = (a20[ks][None, :, None] * nx[None, None, :]
                              + a21[ks][None, :, None] * ny[:, None, None]
                              + a22[ks][None, :, None])
                        z = (z0[ks][None, :, None] * nx[None, None, :]
                             + z1[ks][None, :, None] * ny[:, None, None]
                             + z2[ks][None, :, None])
                        cover = ((qw > 0)
                                 & (qu >= u0[ks][None, :, None] * qw)
                                 & (qu <= u1[ks][None, :, None] * qw)
                                 & (qv >= v0[ks][None, :, None] * qw)
                                 & (qv <= v1[ks][None, :, None] * qw))
                        d = np.where(cover & ~np.isnan(z), z, np.inf)
                        dmin = d.min(axis=1)  # [R, L]
                        acc[ys] = np.minimum(acc[ys], dmin.astype(np.float32))
                    # same cadence as the kernel: refresh every group
                    # at opi >= 4, else only when (o & 2) == 2
                    if opi >= 4 or (o & 2) == 2:
                        dmax = float(acc.max())
                o += opi
        c.blocks += nb
    # shared streams merge adjacent tiles' block chains: recount blocks
    # as per-group-of-sg combined segments
    if sg > 1:
        blocks = 0
        for ty in range(tiles_y):
            for sx in range(steps_x):
                t0s = ty * tiles_x + sx * tps
                for g in range(tps // sg):
                    ta = t0s + g * sg
                    tb = ta + sg - 1
                    b0, ctot = (int(starts[ta]),
                                int(starts[tb]) + int(counts[tb])
                                - int(starts[ta]))
                    if ctot <= 0:
                        continue
                    blocks += ((b0 + ctot - 1) // BLOCK_Q
                               - b0 // BLOCK_Q + 1)
        c.blocks = blocks
    return c


# Fitted from the measured opi sweep (least squares, residuals <= 0.11 ms):
#   raster_ms = 7.3 ns x row_evals + 183 ns x row_iters + 1.9 ms
# The 183 ns/iteration is the serial merge-chain latency (independently
# matches the measured 175 ns/row); the 1.9 ms constant bundles the
# per-call tax (~0.9) with per-tile/per-block machinery (~1.0) — the
# sweep holds tiles/blocks fixed, so the model cannot split them; use the
# blocks/tiles counters to reason about sg/block_q variants relative to
# that constant.
FIT_DEFAULT = {"row_eval": 6.93, "row_iter": 181.3, "fixed_ms": 1.94}


def predict_ms(c: Counters, fit=FIT_DEFAULT):
    return (c.row_evals * fit["row_eval"]
            + c.row_iters * fit["row_iter"]) * 1e-6 + fit["fixed_ms"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opi", type=int, default=6)
    ap.add_argument("--tps", type=int, default=5)
    ap.add_argument("--sg", type=int, default=1)
    ap.add_argument("--tile-h", type=int, default=16)
    ap.add_argument("--order", default="42",
                    help="DPVR_BIN_ORDER for the records build")
    ap.add_argument("--row-tree", action="store_true",
                    help="union-span iters (merge-tree row loop)")
    ap.add_argument("--no-depth", action="store_true",
                    help="skip depth sim (break never fires; upper bound)")
    ap.add_argument("--sweep", action="store_true",
                    help="replay the measured opi sweep for fitting")
    args = ap.parse_args()

    if args.sg > 1 and args.tps % args.sg:
        raise SystemExit(f"--sg {args.sg} must divide --tps {args.tps} "
                         f"(the kernel enforces stream_group | tps)")
    data = get_records(args.tile_h, args.order)
    log(f"items={int(data[2].sum())}, tiles={int((data[2] > 0).sum())}, "
        f"octet cap={data[0].shape[1] // 8}")

    if args.sweep:
        measured = {1: 4.08, 2: 3.45, 4: 3.01, 6: 2.67, 8: 2.85}
        for opi, ms in measured.items():
            t0 = time.time()
            c = simulate(*data, tile_h=args.tile_h, opi=opi, sg=1,
                         tps=args.tps)
            row = dict(opi=opi, measured_ms=ms, **c.as_dict())
            log(f"opi={opi}: sim {time.time()-t0:.0f}s -> {row}")
            print(json.dumps(row), flush=True)
        return

    t0 = time.time()
    c = simulate(*data, tile_h=args.tile_h, opi=args.opi,
                 sg=args.sg, tps=args.tps,
                 sim_depth=not args.no_depth, row_tree=args.row_tree)
    out = dict(opi=args.opi, tps=args.tps, sg=args.sg,
               tile_h=args.tile_h, order=args.order, **c.as_dict(),
               predicted_ms=round(predict_ms(c), 3))
    log(f"sim in {time.time()-t0:.0f}s")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
