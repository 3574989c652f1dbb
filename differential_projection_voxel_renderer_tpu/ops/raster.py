"""Tiled quad rasterization with branchless depth blending.

The compute heart of the renderer.  Replaces the reference's scanline span
walker + AVX2 blend fills (src/rendering/span_walker.rs:283-392, 524-586 —
``fill_span_simd_branchless``: load depth+color, compare, blendv,
unconditional store) with the TPU-native equivalent: for each framebuffer
tile resident in VMEM, loop the visible-quad stream and evaluate coverage /
depth / texel for EVERY pixel of the tile at once on the VPU, then
``jnp.where``-blend depth and color.  A 120x256 tile is 61 VPU vregs — the
whole framebuffer tile IS the "register framebuffer" the reference emulates
8 pixels at a time.

Two interchangeable implementations with identical arithmetic:

- ``rasterize_jnp``    — pure jnp ``fori_loop`` (reference implementation;
  runs anywhere, used for CPU tests and the multichip dryrun)
- ``rasterize_pallas`` — the Pallas TPU kernel (grid over framebuffer tiles,
  per-tile early skip from each quad's precomputed tile box; replaces the
  reference's Rayon stripe binning, main.rs:528-557)

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
I_FIELDS = ("color_even", "color_odd", "mask_lo", "mask_hi")

SKY_I32 = np.uint32(SKY_COLOR).astype(np.int32)


def pack_coeffs(coeffs: dict[str, jnp.ndarray]):
    """SoA dict -> (f32[16, M], i32[4, M], tilebox i32[M])."""
    f = jnp.stack([coeffs[k].astype(jnp.float32) for k in F_FIELDS], axis=0)
    i = jnp.stack([coeffs[k].astype(jnp.int32) for k in I_FIELDS], axis=0)
    return f, i, coeffs["tilebox"].astype(jnp.int32)


def _pixel_ndc(height: int, width: int, y0, x0, th: int, tw: int):
    """NDC coords of pixel centers for the tile with origin (y0, x0)."""
    py = y0 + jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    px = x0 + jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    nx = (2.0 * (px + 0.5) - width) / width
    ny = 1.0 - 2.0 * (py + 0.5) / height
    return nx, ny


def _blend_one_quad(nx, ny, fro, iro, color, depth):
    """Shared per-quad pixel math. ``fro``/``iro`` are per-quad scalars in
    F_FIELDS / I_FIELDS order; returns updated (color, depth)."""
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


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_jnp(fcoef, icoef, tilebox, count, *, height: int, width: int):
    """Full-frame fori_loop rasterizer — bit-identical math to the kernel."""
    del tilebox  # no tiling here
    nx, ny = _pixel_ndc(height, width, 0, 0, height, width)
    color0 = jnp.full((height, width), SKY_I32, jnp.int32)
    depth0 = jnp.full((height, width), jnp.inf, jnp.float32)

    def body(k, carry):
        color, depth = carry
        fro = tuple(fcoef[i, k] for i in range(len(F_FIELDS)))
        iro = tuple(icoef[i, k] for i in range(len(I_FIELDS)))
        return _blend_one_quad(nx, ny, fro, iro, color, depth)

    color, depth = jax.lax.fori_loop(0, count, body, (color0, depth0))
    return color, depth


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _raster_kernel(count_ref, tilebox_ref, fcoef_ref, icoef_ref,
                   color_ref, depth_ref, *, height, width, tile_h, tile_w):
    ti = pl.program_id(0)  # tile row
    tj = pl.program_id(1)  # tile col
    nx, ny = _pixel_ndc(height, width,
                        (ti * tile_h).astype(jnp.float32),
                        (tj * tile_w).astype(jnp.float32),
                        tile_h, tile_w)
    # fused clear: depth = +inf, color = sky (main.rs:393)
    color_ref[:] = jnp.full((tile_h, tile_w), SKY_I32, jnp.int32)
    depth_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)

    def body(k, _):
        box = tilebox_ref[k]
        tx0 = box & 0xFF
        tx1 = (box >> 8) & 0xFF
        ty0 = (box >> 16) & 0xFF
        ty1 = (box >> 24) & 0xFF
        hit = (tj >= tx0) & (tj <= tx1) & (ti >= ty0) & (ti <= ty1)

        @pl.when(hit)
        def _():
            fro = tuple(fcoef_ref[i, k] for i in range(len(F_FIELDS)))
            iro = tuple(icoef_ref[i, k] for i in range(len(I_FIELDS)))
            color, depth = _blend_one_quad(nx, ny, fro, iro,
                                           color_ref[:], depth_ref[:])
            color_ref[:] = color
            depth_ref[:] = depth

        return 0

    jax.lax.fori_loop(0, count_ref[0], body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "interpret"),
)
def rasterize_pallas(fcoef, icoef, tilebox, count, *, height: int, width: int,
                     tile_h: int, tile_w: int, interpret: bool = False):
    """Tiled Pallas rasterizer.  ``height % tile_h == 0`` and
    ``width % tile_w == 0`` are required (framebuffer helpers pick tiles)."""
    assert height % tile_h == 0 and width % tile_w == 0
    grid = (height // tile_h, width // tile_w)
    m = fcoef.shape[1]

    kernel = functools.partial(
        _raster_kernel, height=height, width=width, tile_h=tile_h, tile_w=tile_w
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # count, tilebox -> SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((len(F_FIELDS), m), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((len(I_FIELDS), m), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
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
    )(count.reshape(1).astype(jnp.int32), tilebox, fcoef, icoef)
    return color, depth


def rasterize(coeffs, count, *, height, width, tile_h=None, tile_w=None,
              use_pallas=True, interpret=False):
    """Convenience wrapper: pack + dispatch."""
    fcoef, icoef, tilebox = pack_coeffs(coeffs)
    if not use_pallas:
        return rasterize_jnp(fcoef, icoef, tilebox, count,
                             height=height, width=width)
    if tile_h is None or tile_w is None:
        tile_h, tile_w = pick_tile(height, width)
    return rasterize_pallas(fcoef, icoef, tilebox, count, height=height,
                            width=width, tile_h=tile_h, tile_w=tile_w,
                            interpret=interpret)


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
