"""Legacy Vertex/index-mesh renderer — the deprecated pretransformed path.

Reference: ``render_triangle_pretransformed`` (src/rendering/rasterizer.rs
:2110-2542) consumes the 8-byte compressed Vertex stream + u32 indices:
decompress + MVP transform (the AVX2 batch path, simd_vertex.rs:62-205),
perspective divide, then barycentric rasterization with per-vertex light
interpolated across each triangle.  The reference keeps it only for its
deprecated Vertex meshes (mesh.rs:33-131) — production renders TinyQuads.

TPU-native form: the vertex transform is the existing batched
``decompress_and_transform_vertices`` (models/vertex.py); rasterization is
a ``lax.fori_loop`` of full-frame edge-function evaluations — the same
shape as the production jnp twin (ops/raster.rasterize_jnp), with
barycentric attribute interpolation instead of the planar-quad
coefficients.  This is a parity/reference path, not a production one, so
clarity wins over tiling.

Deviations (documented): triangles with any vertex at w <= NEAR_W_EPS are
skipped instead of near-clipped (the production path needs no clipping by
construction; the oracle keeps a Sutherland-Hodgman clipper for full
coverage of that semantic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.block_type import BLOCK_COLORS
from ..models.vertex import decompress_and_transform_vertices, unpack_vertices
from ..ops.shading import AO_FACTORS
from ..utils.config import NEAR_W_EPS, SKY_COLOR

SKY_I32 = np.uint32(SKY_COLOR).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_vertex_mesh(vertices, indices, n_tris, chunk_offset, mvp, *,
                       width: int, height: int,
                       init_color=None, init_depth=None):
    """Rasterize an indexed triangle mesh of packed legacy vertices.

    ``vertices``: the unpacked SoA dict from ``unpack_vertices`` converted
    to jnp arrays (x/y/z u8 local coords, block_type, light 0..255,
    ao_level 0..3); ``indices``: i32[T, 3]; ``n_tris``: live triangle
    count (static shapes, like every stream in this framework).  Returns
    (color i32[H, W] ARGB, depth f32[H, W] NDC).

    Colors follow the reference's vertex-lit shading: base block color
    scaled by barycentrically-interpolated ``light/255 * AO_FACTORS[ao]``
    (mesh.rs:46-86 packing; shading.rs AO factors).
    """
    cx, cy, cz, cw = decompress_and_transform_vertices(
        vertices["x"].astype(jnp.float32),
        vertices["y"].astype(jnp.float32),
        vertices["z"].astype(jnp.float32),
        chunk_offset, mvp)

    colors_tbl = jnp.asarray(np.asarray(BLOCK_COLORS, np.float32))
    ao_tbl = jnp.asarray(np.asarray(AO_FACTORS, np.float32))
    bright = (vertices["light"].astype(jnp.float32) / 255.0
              * ao_tbl[vertices["ao_level"]])
    base_rgb = colors_tbl[jnp.clip(vertices["block_type"], 0,
                                   colors_tbl.shape[0] - 1)]

    eps = jnp.float32(NEAR_W_EPS)
    inv_w = 1.0 / jnp.where(jnp.abs(cw) > 1e-30, cw, 1e-30)
    # screen coords (pixel units) + NDC depth per vertex
    sx = (cx * inv_w + 1.0) * (0.5 * width)
    sy = (1.0 - cy * inv_w) * (0.5 * height)
    sz = cz * inv_w

    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5

    color0 = (jnp.full((height, width), SKY_I32, jnp.int32)
              if init_color is None else init_color)
    depth0 = (jnp.full((height, width), jnp.inf, jnp.float32)
              if init_depth is None else init_depth)

    def body(t, carry):
        color, depth = carry
        i0, i1, i2 = indices[t, 0], indices[t, 1], indices[t, 2]
        ok_w = (cw[i0] > eps) & (cw[i1] > eps) & (cw[i2] > eps)
        x0, y0 = sx[i0], sy[i0]
        x1, y1 = sx[i1], sy[i1]
        x2, y2 = sx[i2], sy[i2]
        # signed doubled area; flip winding so edges are all-positive
        # inside (rasterizer.rs:2553-2558 edge_function)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        flip = jnp.where(area < 0, -1.0, 1.0)
        area_a = jnp.abs(area)
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * flip
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * flip
        w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * flip
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (area_a > 0) & ok_w
        b0 = w0 / jnp.maximum(area_a, 1e-30)
        b1 = w1 / jnp.maximum(area_a, 1e-30)
        b2 = w2 / jnp.maximum(area_a, 1e-30)
        z = b0 * sz[i0] + b1 * sz[i1] + b2 * sz[i2]
        lum = b0 * bright[i0] + b1 * bright[i1] + b2 * bright[i2]
        rgb = (b0[..., None] * base_rgb[i0] + b1[..., None] * base_rgb[i1]
               + b2[..., None] * base_rgb[i2]) * lum[..., None]
        rgb_u = jnp.clip(rgb, 0.0, 255.0).astype(jnp.int32)
        argb = ((jnp.int32(0xFF) << 24) | (rgb_u[..., 0] << 16)
                | (rgb_u[..., 1] << 8) | rgb_u[..., 2])
        win = inside & (z < depth) & (t < n_tris)
        return (jnp.where(win, argb, color), jnp.where(win, z, depth))

    return jax.lax.fori_loop(0, indices.shape[0], body, (color0, depth0))


def mesh_quads_to_triangles(n_quads: int) -> np.ndarray:
    """Index pattern of the reference's quad -> two-triangle fan split
    (rasterizer.rs:1056-1068: (0,1,2), (0,2,3) per 4-vertex quad)."""
    q = np.arange(n_quads)[:, None] * 4
    tri = np.concatenate([
        q + np.array([[0, 1, 2]]),
        q + np.array([[0, 2, 3]]),
    ], axis=1).reshape(-1, 3)
    return tri.astype(np.int32)
