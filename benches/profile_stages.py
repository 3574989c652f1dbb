"""Stage-level device profiling of the render step on real TPU.

Measures each pipeline stage with K iterations inside ONE jit (per-iteration
inputs vary; see NOTES.md "XLA hoists loop-invariant computations") and a
tiny forced D2H read, isolating:

  project   — stage A on the full gather stream
  compact   — + survivor sort + multi-row gather
  coeffs    — + rasterizer coefficients + record stacking
  bin       — + tile binning (sort) + per-octet metadata
  raster    — the Pallas kernel alone on prebuilt records
  raster0   — the kernel with all-empty tiles (per-tile fixed cost)
  full      — the whole step

Scene state is cached to /tmp/dpvr_scene_vd12.npz so re-profiling skips the
~15 s world build.  Diagnostics to stderr, one JSON line per stage to stdout.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CACHE = "/tmp/dpvr_scene_vd12.npz"


def build_scene(vd=12):
    from differential_projection_voxel_renderer_tpu.app.engine import Engine
    from differential_projection_voxel_renderer_tpu.models.world import WorldConfig
    from differential_projection_voxel_renderer_tpu.utils.config import RenderConfig

    eng = Engine(
        render_config=RenderConfig(width=1280, height=720),
        world_config=WorldConfig(view_distance=vd, frustum_culling=True,
                                 max_chunks_per_frame=16),
        pool_slots=8192,
    )
    eng.camera.position = np.array([0.0, 10.0, 20.0], np.float32)
    eng.camera.look_at(np.array([0.0, 0.0, -60.0]))
    while eng.world.update(eng.camera.position):
        pass
    eng.prime()
    eng.render_frame(dt=0.0)
    quads, quad_world, total = eng.renderer.prepare_uploads(
        eng.pool.quads, eng._last_visible_slots, eng._last_counts_sel,
        eng._last_positions_sel, dir_mask=eng._last_dir_mask)
    return (np.asarray(quads), np.asarray(quad_world), int(np.asarray(total)),
            eng.camera.view_projection_matrix(),
            np.asarray(eng.camera.position, np.float32))


def get_scene():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return (z["quads"], z["quad_world"], int(z["total"]), z["vp"],
                z["cam"])
    t0 = time.time()
    quads, quad_world, total, vp, cam = build_scene()
    np.savez(CACHE, quads=quads, quad_world=quad_world, total=total, vp=vp,
             cam=cam)
    log(f"scene built in {time.time()-t0:.1f}s (cached to {CACHE})")
    return quads, quad_world, total, vp, cam


def _force(out):
    """Real D2H fetch of one leaf: block_until_ready alone does not
    reliably round-trip on this relay (NOTES.md)."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, args, k, label):
    _force(fn(*args))  # compile
    t0 = time.time()
    _force(fn(*args))
    ms = (time.time() - t0) / k * 1000
    log(f"{label::>10}: {ms:.3f} ms")
    print(json.dumps({"stage": label, "ms": round(ms, 4)}), flush=True)
    return ms


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from differential_projection_voxel_renderer_tpu.ops import projection as P
    from differential_projection_voxel_renderer_tpu.ops import raster as R
    from differential_projection_voxel_renderer_tpu.ops import raster_packed as RP
    from differential_projection_voxel_renderer_tpu.ops.shading import (
        build_quad_color_tables,
    )
    from differential_projection_voxel_renderer_tpu.ops.texture import TextureAtlas
    from differential_projection_voxel_renderer_tpu.rendering import pipeline as PL

    k = int(os.environ.get("PROF_K", "30"))
    stages = sys.argv[1:] or ["project", "compact", "coeffs", "bin",
                              "raster", "raster0", "full"]
    # packed-pipeline probe: everything up to (and incl.) build_bin_lists
    # + per-octet metadata, via the debug_return_records hook
    quads_np, quad_world_np, total, vp, cam = get_scene()
    gq_env = int(os.environ.get("PROF_GQ", "0"))
    if gq_env:
        quads_np = quads_np[:gq_env]
        quad_world_np = quad_world_np[:, :gq_env]
        total = min(total, gq_env)
    log(f"scene: {total} quads gathered (cap {quads_np.shape[0]}), "
        f"backend {jax.default_backend()}")
    tables = build_quad_color_tables(TextureAtlas().kernel_tables())

    W, H = 1280, 720
    TH = int(os.environ.get("PROF_TH", "16"))
    TW = int(os.environ.get("PROF_TW", "128"))
    GQ = quads_np.shape[0]
    RC = int(os.environ.get("PROF_RC", "49152"))
    TK = int(os.environ.get("PROF_TK", "98304"))
    out_h = -H % TH + H
    tiles_y, tiles_x = out_h // TH, W // TW

    quads = jnp.asarray(quads_np)
    qw = jnp.asarray(quad_world_np)
    n_quads = jnp.asarray(total, jnp.int32)
    # k slightly-varying cameras to defeat CSE/hoisting
    rng = np.random.default_rng(0)
    cams = np.repeat(cam[None], k, 0).astype(np.float32)
    cams += rng.normal(0, 0.01, cams.shape).astype(np.float32)
    vps = np.repeat(vp[None], k, 0).astype(np.float32)
    vps[:, 3, :] += rng.normal(0, 1e-6, (k, 4)).astype(np.float32)
    vps_d, cams_d = jnp.asarray(vps), jnp.asarray(cams)

    def loop(body):
        """k iterations of body(vp_i, cam_i) -> small array, summed."""
        def run(vps, cams):
            def it(i, acc):
                return acc + body(vps[i], cams[i])
            return jax.lax.fori_loop(0, k, it, jnp.zeros((), jnp.float32))
        return jax.jit(run)

    in_stream = jnp.arange(GQ, dtype=jnp.int32) < n_quads

    def stage_project(vp1, cam1):
        t = P.view_tables(vp1, cam1)
        pr = P.project_and_cull(quads, (qw[0], qw[1], qw[2]), in_stream, t,
                                width=W, height=H)
        return (pr["valid"].sum() + pr["bb_x0"].sum() + pr["depth_near"].sum()
                ).astype(jnp.float32)

    def make_through(upto):
        """Replicates _render_step up to a stage, returning a tiny probe."""
        def f(vp1, cam1):
            t = P.view_tables(vp1, cam1)
            wq = (qw[0], qw[1], qw[2])
            pr = P.project_and_cull(quads, wq, in_stream, t, width=W, height=H)
            bcast = jax.lax.bitcast_convert_type
            bbx = pr["bb_x0"] | (pr["bb_x1"] << 16)
            bby = pr["bb_y0"] | (pr["bb_y1"] << 16)
            pre_rows = [bcast(quads, jnp.float32), wq[0], wq[1], wq[2],
                        bcast(bbx, jnp.float32), bcast(bby, jnp.float32),
                        pr["depth_near"]]
            n_valid = pr["valid"].sum().astype(jnp.int32)
            count_c = jnp.minimum(n_valid, RC)
            idx = jnp.sort(jnp.where(pr["valid"],
                                     jnp.arange(GQ, dtype=jnp.int32),
                                     jnp.int32(2**30)))[:RC]
            idx = jnp.minimum(idx, GQ - 1)
            pre_c = jnp.stack(pre_rows)[:, idx]
            quads_c = bcast(pre_c[0], jnp.uint32)
            wq_c = (pre_c[1], pre_c[2], pre_c[3])
            bbx_c = bcast(pre_c[4], jnp.int32)
            bby_c = bcast(pre_c[5], jnp.int32)
            dn_c = pre_c[6]
            if upto == "compact":
                return (pre_c.sum() % 7).astype(jnp.float32)
            coeffs = P.quad_coefficients(quads_c, wq_c, None, t, tables,
                                         width=W, height=H)
            f_full = jnp.stack([coeffs[kk].astype(jnp.float32)
                                for kk in R.F_FIELDS])
            i_full = jnp.stack([
                coeffs["color_even"].astype(jnp.int32),
                coeffs["color_odd"].astype(jnp.int32),
                coeffs["mask_lo"].astype(jnp.int32),
                coeffs["mask_hi"].astype(jnp.int32),
                bby_c,
                jax.lax.bitcast_convert_type(dn_c, jnp.int32),
            ])
            if upto == "coeffs":
                return ((f_full.sum() + i_full.sum()) % 7).astype(jnp.float32)
            tilebox = P.pack_tilebox(
                {"bb_x0": bbx_c & 0xFFFF, "bb_x1": bbx_c >> 16,
                 "bb_y0": bby_c & 0xFFFF, "bb_y1": bby_c >> 16},
                tile_h=TH, tile_w=TW)
            dq4 = jnp.clip((-jnp.log2(jnp.maximum(1.0 - dn_c, 1e-9))
                            ).astype(jnp.int32), 0, 15)
            ty0_c = (bby_c & 0xFFFF) // TH
            band = jnp.minimum(jnp.clip((bby_c & 0xFFFF) - ty0_c * TH,
                                        0, TH - 1) >> 2, 3)
            flat, t_of_item, tile_starts, tile_counts, ovf = (
                R.build_tile_lists(tilebox, count_c, tiles_y=tiles_y,
                                   tiles_x=tiles_x, item_cap=TK,
                                   order6=(dq4 << 2) | band,
                                   order6_dy1=dq4 << 2))
            if upto == "bin":
                return ((flat.sum() + tile_starts.sum() + tile_counts.sum())
                        % 7).astype(jnp.float32)
            raise ValueError(upto)
        return f

    for st in stages:
        if st == "project":
            timeit(loop(stage_project), (vps_d, cams_d), k, st)
        elif st in ("compact", "coeffs", "bin"):
            timeit(loop(make_through(st)), (vps_d, cams_d), k, st)
        elif st in ("pbin1", "pbin2"):
            mode = {"pbin1": "bin", "pbin2": "gather"}[st]
            step_dbg3 = functools.partial(
                PL._render_step, color_tables=tables, width=W, height=H,
                tile_h=TH, tile_w=TW, gather_cap=GQ, render_cap=RC,
                span_mode=False, backface_culling=True, use_pallas=True,
                interpret=False, tile_k_cap=TK,
                debug_return_records=mode)

            def body_p12(vp1, cam1):
                outs = step_dbg3(quads, qw, n_quads, vp1, cam1)
                return sum(o.sum() for o in outs[:2]).astype(jnp.float32)

            timeit(loop(body_p12), (vps_d, cams_d), k, st)
        elif st == "pbin":
            step_dbg2 = functools.partial(
                PL._render_step, color_tables=tables, width=W, height=H,
                tile_h=TH, tile_w=TW, gather_cap=GQ, render_cap=RC,
                span_mode=False, backface_culling=True, use_pallas=True,
                interpret=False, tile_k_cap=TK, debug_return_records=True)

            def body_pbin(vp1, cam1):
                recs, starts, counts, orows, ozmin = step_dbg2(
                    quads, qw, n_quads, vp1, cam1)
                return (recs[0, 0] + starts[0] + counts.sum()
                        + orows[0] + ozmin[0]).astype(jnp.float32)

            timeit(loop(body_pbin), (vps_d, cams_d), k, st)
        elif st == "full":
            step = functools.partial(
                PL._render_step, color_tables=tables, width=W, height=H,
                tile_h=TH, tile_w=TW, gather_cap=GQ, render_cap=RC,
                span_mode=False, backface_culling=True, use_pallas=True,
                interpret=False, tile_k_cap=TK)

            def body_full(vp1, cam1):
                c, d, s = step(quads, qw, n_quads, vp1, cam1)
                return (c[0, 0] + s[1]).astype(jnp.float32)

            timeit(loop(body_full), (vps_d, cams_d), k, st)
        elif st.startswith("raster"):
            # raster / raster0 with optional _tpsN / _opiN / _sgN suffixes
            # (_sgN = shared-stream group size, ops/raster stream_group)
            tps = None
            # defaults mirror the PRODUCTION knobs (RenderConfig:
            # opi6 + sg5 + bq1024, the measured v5e winner) so a plain
            # `raster` stage measures what the pipeline actually runs;
            # suffixes override for sweeps
            opi = 6
            sg = 5
            bq = 1024
            rt = False
            pair = False
            base = st
            if "_pr" in base:
                # pair-row mode (DPVR_PAIR_ROWS / group_rows=2): records
                # must be REBUILT under the env knob so the binning uses
                # the group-major tile permutation the kernel expects
                base = base.replace("_pr", "")
                pair = True
            if "_rt" in base:
                base = base.replace("_rt", "")
                rt = True
            if "_bq" in base:
                base, t = base.split("_bq")
                bq = int(t)
            if "_sg" in base:
                base, t = base.split("_sg")
                sg = int(t)
            if "_opi" in base:
                base, t = base.split("_opi")
                opi = int(t)
            if "_tps" in base:
                base, t = base.split("_tps")
                tps = int(t)
            # build records once from the real camera, on device
            os.environ["DPVR_PAIR_ROWS"] = "1" if pair else "0"
            pr_out_h = (-H % (32 if pair else TH)) + H
            step_dbg = functools.partial(
                PL._render_step, color_tables=tables, width=W, height=H,
                tile_h=TH, tile_w=TW, gather_cap=GQ, render_cap=RC,
                span_mode=False, backface_culling=True, use_pallas=True,
                interpret=False, tile_k_cap=TK, debug_return_records=True)
            try:
                recs = step_dbg(quads, qw, n_quads, jnp.asarray(vp),
                                jnp.asarray(cam))
            except TypeError:
                log(f"({st}: pipeline lacks debug_return_records; skipping)")
                continue
            records, tile_starts, tile_counts, octet_rows, octet_zmin = [
                jax.block_until_ready(r) for r in recs]
            if base == "raster0":
                tile_counts = jnp.zeros_like(tile_counts)
                tile_starts = jnp.zeros_like(tile_starts)
            nit = np.asarray(tile_counts).sum()
            log(f"{st}: {int(nit)} binned items over "
                f"{int((np.asarray(tile_counts) > 0).sum())} tiles")

            def body_raster(i, acc, records=records, tps=tps, opi=opi,
                            sg=sg, rt=rt, bq=bq):
                # vary a harmless record field per iteration to defeat CSE
                r = records.at[23, 0].set(i)
                if (sg != 1 or rt or bq != 256) and (
                        int(np.asarray(tile_counts).shape[0]) > 2000):
                    # the packed kernel takes none of these knobs; a
                    # silently mislabeled measurement would pollute the
                    # NOTES record
                    raise SystemExit(
                        f"{st}: _sg/_rt/_bq only apply to the octet "
                        f"kernel (unpacked)")
                if int(np.asarray(tile_counts).shape[0]) > 2000:
                    # per-BIN metadata -> the packed kernel
                    c, d = RP.rasterize_pallas_packed(
                        r, tile_starts, tile_counts, octet_rows,
                        octet_zmin, height=H, width=W, tile_h=TH,
                        out_h=out_h)
                else:
                    c, d = R.rasterize_pallas(
                        r, tile_starts, tile_counts, octet_rows,
                        octet_zmin, height=H, width=W, tile_h=TH,
                        tile_w=TW, out_h=pr_out_h, tiles_per_step=tps,
                        octets_per_iter=opi, stream_group=sg, row_tree=rt,
                        block_q=bq, group_rows=2 if pair else 1)
                return acc + c[0, 0].astype(jnp.float32)

            def run(x):
                return jax.lax.fori_loop(
                    0, k, lambda i, a: body_raster(i, a), x)

            timeit(jax.jit(run), (jnp.zeros((), jnp.float32),), k, st)
        else:
            log(f"unknown stage {st}")


if __name__ == "__main__":
    main()
