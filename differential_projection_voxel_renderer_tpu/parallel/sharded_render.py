"""Multi-chip rendering: camera-batch data parallelism x framebuffer-tile
parallelism over a jax.sharding.Mesh.

The reference's only parallelism is intra-node: Rayon work-stealing over
disjoint framebuffer stripes plus AVX2 lanes (SURVEY.md section 2.7).  The
TPU-native scaling story (SURVEY.md section 5 "Distributed communication
backend"):

- ``tp`` axis: framebuffer row bands sharded across chips — per-band
  rasterization is embarrassingly parallel after culling; the depth buffer
  never crosses chips (each band owns its rows, exactly like the
  reference's ``split_at_mut`` stripes but across ICI instead of threads).
- ``dp`` axis: independent frames/cameras (multi-view or animation batch)
  — the reference analog is "DP over frames/cameras, not layers".
- The scene (device quad pool) is replicated; the per-frame quad stream is
  recomputed per shard (geometry is ~1% of raster cost).  The only
  collective is a tiny ``psum`` of the frame counters across ``tp`` — the
  "small psum of a stats grid" case from SURVEY.md section 2.7.

Both modes run the PRODUCTION pipeline (rendering/pipeline._render_step)
per shard: the octet Pallas kernel on TPU backends, its bit-identical jnp
twin elsewhere (so the virtual-CPU-mesh dryrun executes the exact same
sharding program).  A tp band is just a smaller framebuffer: _render_step's
``band_y0``/``band_h`` keep NDC global while tiles stay band-local, and
stacking bands reproduces the full frame bit-exactly (tests/test_parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental (check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import projection as proj_ops
from ..ops import raster as raster_ops


def make_mesh(n_devices: int | None = None) -> Mesh:
    """2D (dp, tp) mesh over the available devices: tp gets the larger
    factor (framebuffer bands are the finer-grained axis)."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    dp = 1
    for cand in (4, 3, 2):
        if n % cand == 0 and n // cand > 1:
            dp = n // cand if cand >= n // cand else cand
            break
    dp = max(1, min(dp, n))
    while n % dp:
        dp -= 1
    tp = n // dp
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


def _render_one_camera(pool, counts_all, positions, visible_slots, n_visible,
                       view_proj, cam_pos, color_tables, *, width, height,
                       gather_cap, render_cap, band_y0, band_h, span_mode,
                       use_pallas=False, tile_k_cap=8192):
    """Gather + the PRODUCTION render step for a single camera, restricted
    to a row band — the reference runs its real rasterizer inside every
    parallel stripe (main.rs:581-597); so does this (octet Pallas kernel
    when ``use_pallas``, jnp twin otherwise — same band semantics,
    tests/test_parallel.py asserts band-stacked == full-frame through
    _render_step itself)."""
    from ..rendering.pipeline import _render_step

    vcap = visible_slots.shape[0]
    sel = jnp.clip(visible_slots, 0, pool.shape[0] - 1)
    counts = jnp.where(jnp.arange(vcap) < n_visible, counts_all[sel], 0)
    counts = counts.astype(jnp.int32)
    pos = positions[sel]
    world = pos.astype(jnp.float32) * 32.0
    chunk_world = tuple(world[:, a] for a in range(3))

    cum = jnp.cumsum(counts)
    total = cum[-1]
    i = jnp.arange(gather_cap, dtype=jnp.int32)
    chunk_of = jnp.clip(
        jnp.searchsorted(cum, i, side="right").astype(jnp.int32), 0, vcap - 1
    )
    base = jnp.where(chunk_of > 0, cum[jnp.maximum(chunk_of - 1, 0)], 0)
    within = jnp.clip(i - base, 0, pool.shape[1] - 1)
    quads = pool[sel[chunk_of], within]
    wq = proj_ops.quad_world_from_slots(chunk_world, chunk_of)

    tile_h, tile_w = raster_ops.pick_tile(height, width)
    color, depth, stats = _render_step(
        quads, jnp.stack(wq), jnp.minimum(total, gather_cap),
        view_proj, cam_pos,
        color_tables=color_tables, width=width, height=height,
        tile_h=tile_h, tile_w=tile_w, gather_cap=gather_cap,
        render_cap=render_cap, span_mode=span_mode,
        backface_culling=True, use_pallas=use_pallas, interpret=False,
        tile_k_cap=tile_k_cap, band_y0=band_y0, band_h=band_h,
    )
    return color, depth, stats[1]


def make_sharded_render(mesh: Mesh, *, width: int, height: int,
                        gather_cap: int = 8192, render_cap: int = 4096,
                        color_tables=None, span_mode: bool = False,
                        use_pallas: bool | None = None):
    """Builds the jitted multi-device render step.

    Inputs (global shapes):
    - pool uint32[P, QCAP], counts i32[P], positions i32[P, 3]: replicated
    - visible_slots i32[B, VCAP], n_visible i32[B], view_proj f32[B, 4, 4],
      cam_pos f32[B, 3]: sharded over ``dp`` (camera batch)
    Outputs:
    - color i32[B, H, W], depth f32[B, H, W]: sharded (dp, tp) over (B, H)
    - total quads rasterized per frame i32[B] (psum across tp)

    Every tp band runs the PRODUCTION pipeline (_render_step: fused
    geometry, compaction sort, tile binning, octet Pallas kernel) on its
    own rows — ``use_pallas`` defaults by backend (Pallas on TPU, jnp
    twin elsewhere so the virtual-CPU-mesh dryrun exercises the same
    sharding).  Reference: stripes run the real rasterizer
    (main.rs:581-597).
    """
    if color_tables is None:
        from ..ops.shading import build_quad_color_tables
        from ..ops.texture import TextureAtlas

        color_tables = build_quad_color_tables(TextureAtlas().kernel_tables())
    tp = mesh.shape["tp"]
    assert height % (tp * 8) == 0, "height must split into 8-aligned bands"
    band_h = height // tp
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def shard_fn(pool, counts, positions, visible_slots, n_visible, vp, cam):
        band_y0 = jax.lax.axis_index("tp") * band_h

        def one(args):
            vs, nv, vp1, cam1 = args
            return _render_one_camera(
                pool, counts, positions, vs, nv, vp1, cam1, color_tables,
                width=width, height=height, gather_cap=gather_cap,
                render_cap=render_cap, band_y0=band_y0, band_h=band_h,
                span_mode=span_mode, use_pallas=use_pallas,
            )

        # lax.map over the local camera sub-batch (usually 1): the Pallas
        # call is not vmappable; a sequential map is exact either way
        color, depth, count = jax.lax.map(
            one, (visible_slots, n_visible, vp, cam))
        # tiny ICI collective: frame counters agree across tp shards;
        # psum-mean keeps them identical and exercises the collective path
        count = jax.lax.psum(count, "tp") // tp
        return color, depth, count

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp", "tp"), P("dp", "tp"), P("dp")),
        check_rep=False,
    )
    return jax.jit(fn)


def make_sharded_render_dp(mesh_or_n=None, *, width: int, height: int,
                           gather_cap: int = 8192, render_cap: int = 4096,
                           tile_k_cap: int = 8192,
                           use_pallas: bool | None = None,
                           color_tables=None):
    """Camera-batch data parallelism running the FULL production pipeline
    (rendering/pipeline._render_step, octet Pallas kernel included) per
    shard — "DP over frames/cameras, not layers" (SURVEY.md section 5).

    A 1-D mesh over all devices; every camera of the batch renders its
    complete frame on its own chip with zero collectives (the scene pool
    is replicated).  This is the scaling mode for animation batches /
    multi-view serving; ``make_sharded_render`` (dp x tp) is the mode
    that splits a single framebuffer across chips.

    ``use_pallas`` defaults by backend (Pallas on TPU, jnp elsewhere —
    so the virtual-CPU-mesh dryrun exercises the same sharding)."""
    import functools

    from ..rendering.pipeline import _render_step

    if color_tables is None:
        from ..ops.shading import build_quad_color_tables
        from ..ops.texture import TextureAtlas

        color_tables = build_quad_color_tables(TextureAtlas().kernel_tables())
    if isinstance(mesh_or_n, Mesh):
        devs = mesh_or_n.devices.reshape(-1)
    else:
        devs = np.array(jax.devices()[: mesh_or_n or len(jax.devices())])
    mesh = Mesh(devs.reshape(-1), ("dp",))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from ..ops.raster import pick_tile

    tile_h, tile_w = pick_tile(height, width)

    step = functools.partial(
        _render_step, color_tables=color_tables, width=width, height=height,
        tile_h=tile_h, tile_w=tile_w, gather_cap=gather_cap,
        render_cap=render_cap, span_mode=False, backface_culling=True,
        use_pallas=use_pallas, interpret=False, tile_k_cap=tile_k_cap,
    )

    def shard_fn(quads, quad_world, n_quads, vp, cam):
        # lax.map over the local sub-batch (usually 1 camera per chip);
        # the Pallas call is not vmappable, a sequential map is exact
        return jax.lax.map(lambda a: step(*a),
                           (quads, quad_world, n_quads, vp, cam))

    spec_b = P("dp")
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_b, spec_b, spec_b, spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b),
        check_rep=False,
    )
    return jax.jit(fn), mesh
