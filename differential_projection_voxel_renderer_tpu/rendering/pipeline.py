"""The per-frame device render step — one jitted function.

Equivalent of the reference's ``render_frame`` (src/main.rs:379-608) with
the Hyper-Pipeline geometry stage, restructured for XLA:

1. gather     — flatten the visible chunks' quad buffers into one stream
                (ragged -> static via cumsum + searchsorted; replaces the
                per-mesh Rayon iteration of main.rs:581-597)
2. project    — differential projection of all 4 corners per quad, backface
                + frustum culling as vectorized masks (ops/projection.py)
3. compact    — cumsum-scatter the survivors into a fixed-size stream,
                preserving front-to-back chunk order (the host pre-sorts
                chunk slots, like main.rs:368-377)
4. coeffs     — rasterizer coefficient setup per quad
5. rasterize  — tiled Pallas kernel (or jnp reference impl) with fused
                clear + branchless depth blending (ops/raster.py)

Everything from step 1 on runs on device in a single ``jit``; the host only
supplies the visible slot list (culling funnel) and the camera matrices.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import projection as proj_ops
from ..ops import raster as raster_ops
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


def _render_step(
    quad_pool,        # uint32[P, QCAP]
    pool_counts,      # int32[P]
    pool_positions,   # int32[P, 3]
    visible_slots,    # int32[VCAP] — host-culled, front-to-back
    n_visible,        # int32[]
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
):
    vcap = visible_slots.shape[0]
    tables = proj_ops.view_tables(view_proj, cam_pos)

    # ---- gather: ragged per-chunk quad lists -> one static stream
    sel = jnp.clip(visible_slots, 0, quad_pool.shape[0] - 1)
    counts = jnp.where(
        jnp.arange(vcap) < n_visible, pool_counts[sel], 0
    ).astype(jnp.int32)
    positions = pool_positions[sel]
    chunk_clip = proj_ops.chunk_clip_origins(view_proj, positions)
    world = positions.astype(jnp.float32) * 32.0
    chunk_world = tuple(world[:, a] for a in range(3))

    cum = jnp.cumsum(counts)
    total = cum[-1]
    i = jnp.arange(gather_cap, dtype=jnp.int32)
    chunk_of = jnp.searchsorted(cum, i, side="right").astype(jnp.int32)
    chunk_of_c = jnp.clip(chunk_of, 0, vcap - 1)
    base = jnp.where(chunk_of_c > 0, cum[jnp.maximum(chunk_of_c - 1, 0)], 0)
    within = jnp.clip(i - base, 0, quad_pool.shape[1] - 1)
    in_stream = i < jnp.minimum(total, gather_cap)
    quads = quad_pool[sel[chunk_of_c], within]

    # ---- project + cull (stage A)
    proj_a = proj_ops.project_and_cull(
        quads, chunk_of_c, in_stream, chunk_clip, chunk_world, tables,
        width=width, height=height, span_mode=span_mode,
        backface_culling=backface_culling,
    )

    # ---- compact survivors
    count, overflow, (q_c, slot_c) = proj_ops.compact_stream(
        proj_a["valid"], render_cap, (quads, chunk_of_c)
    )

    # ---- stage B on the compacted stream (recompute is cheap at 32k)
    in_render = jnp.arange(render_cap, dtype=jnp.int32) < count
    proj_b = proj_ops.project_and_cull(
        q_c, slot_c, in_render, chunk_clip, chunk_world, tables,
        width=width, height=height, span_mode=span_mode,
        backface_culling=backface_culling,
    )

    if use_pallas:
        # ---- bin to framebuffer tiles, then compute coefficients directly
        # on the per-tile streams (recompute beats gathering 20 fields)
        tiles_y, tiles_x = height // tile_h, width // tile_w
        tilebox = proj_ops.pack_tilebox(proj_b, tile_h=tile_h, tile_w=tile_w)
        items, tile_counts, bin_overflow = raster_ops.build_tile_lists(
            tilebox, count, tiles_y=tiles_y, tiles_x=tiles_x, k_cap=tile_k_cap
        )
        flat = items.reshape(-1)
        q_b = q_c[flat]
        slot_b = slot_c[flat]
        in_bin = (
            jnp.arange(tile_k_cap, dtype=jnp.int32)[None, :]
            < tile_counts[:, None]
        ).reshape(-1)
        if span_mode:
            proj_bb = proj_ops.project_and_cull(
                q_b, slot_b, in_bin, chunk_clip, chunk_world, tables,
                width=width, height=height, span_mode=True,
                backface_culling=backface_culling,
            )
        else:
            proj_bb = None
        coeffs = proj_ops.quad_coefficients(
            q_b, slot_b, proj_bb, chunk_clip, tables, color_tables,
            width=width, height=height, span_mode=span_mode,
        )
        bb0 = (proj_b["bb_x0"] | (proj_b["bb_y0"] << 16))[flat]
        bb1 = (proj_b["bb_x1"] | (proj_b["bb_y1"] << 16))[flat]
        coeffs["bb0"] = bb0
        coeffs["bb1"] = bb1
        f_binned, i_binned = raster_ops.pack_coeffs_rows(coeffs)
        color, depth = raster_ops.rasterize_pallas(
            f_binned, i_binned, tile_counts, height=height, width=width,
            tile_h=tile_h, tile_w=tile_w, k_cap=tile_k_cap,
            interpret=interpret,
        )
    else:
        coeffs = proj_ops.quad_coefficients(
            q_c, slot_c, proj_b, chunk_clip, tables, color_tables,
            width=width, height=height, span_mode=span_mode,
        )
        coeffs["bb0"] = proj_b["bb_x0"] | (proj_b["bb_y0"] << 16)
        coeffs["bb1"] = proj_b["bb_x1"] | (proj_b["bb_y1"] << 16)
        fcoef, icoef = raster_ops.pack_coeffs_quadmajor(coeffs)
        color, depth = raster_ops.rasterize_jnp(
            fcoef, icoef, count, height=height, width=width,
        )
        bin_overflow = jnp.int32(0)
    stats = jnp.stack(
        [jnp.minimum(total, gather_cap), count, overflow, bin_overflow]
    )
    return color, depth, stats


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
        use_pallas = cfg.resolve_use_pallas()
        tile_h, tile_w = (cfg.tile_h, cfg.tile_w)
        if cfg.height % tile_h or cfg.width % tile_w:
            tile_h, tile_w = raster_ops.pick_tile(cfg.height, cfg.width)
        self.tile = (tile_h, tile_w)
        self._step = jax.jit(
            functools.partial(
                _render_step,
                color_tables=self._tables_np,
                width=cfg.width,
                height=cfg.height,
                tile_h=tile_h,
                tile_w=tile_w,
                gather_cap=cfg.gather_cap,
                render_cap=cfg.quads_cap,
                span_mode=cfg.span_mode,
                backface_culling=cfg.backface_culling,
                use_pallas=use_pallas,
                interpret=False,
                tile_k_cap=cfg.tile_k_cap,
            )
        )

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

    def render(self, quad_pool, pool_counts, pool_positions, visible_slots,
               n_visible, view_proj, cam_pos):
        """Returns (color int32[H, W] as ARGB bits, depth f32[H, W], stats)."""
        return self._step(
            quad_pool, pool_counts, pool_positions,
            jnp.asarray(visible_slots, jnp.int32),
            jnp.asarray(n_visible, jnp.int32),
            jnp.asarray(view_proj, jnp.float32),
            jnp.asarray(cam_pos, jnp.float32),
        )


def make_repeated_step(renderer: "Renderer", n_frames: int):
    """N full render steps inside one jit (lax.fori_loop over per-frame
    cameras).  Used by bench.py to measure pure device throughput with a
    single dispatch — in this environment the TPU sits behind a network
    relay whose per-dispatch round trip would otherwise dominate."""
    cfg = renderer.config
    use_pallas = cfg.resolve_use_pallas()
    tile_h, tile_w = renderer.tile

    def run(quad_pool, pool_counts, pool_positions, visible_slots, n_visible,
            vps, cams):
        def body(i, carry):
            color, depth, stats = _render_step(
                quad_pool, pool_counts, pool_positions, visible_slots,
                n_visible, vps[i], cams[i],
                color_tables=renderer._tables_np,
                width=cfg.width, height=cfg.height,
                tile_h=tile_h, tile_w=tile_w,
                gather_cap=cfg.gather_cap, render_cap=cfg.quads_cap,
                span_mode=cfg.span_mode,
                backface_culling=cfg.backface_culling,
                use_pallas=use_pallas, interpret=False,
                tile_k_cap=cfg.tile_k_cap,
            )
            return color, depth, stats

        init = (
            jnp.zeros((cfg.height, cfg.width), jnp.int32),
            jnp.zeros((cfg.height, cfg.width), jnp.float32),
            jnp.zeros(4, jnp.int32),
        )
        return jax.lax.fori_loop(0, n_frames, body, init)

    return jax.jit(run)
