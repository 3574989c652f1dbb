"""Differential projection + culling + rasterizer-coefficient setup.

This is the TPU-native form of the reference's Hyper-Pipeline geometry stage
(src/rendering/differential_projection.rs + packet_pipeline.rs):

- ``FaceBasis``: for axis-aligned voxel faces, the clip-space positions of
  all quads on a (face, chunk, slice) plane are ``origin + u*tangent +
  v*bitangent`` — 2 FMAs per corner instead of a full 4x4 MVP
  (differential_projection.rs:37-71).  Here the basis never needs a cache
  (packet_pipeline.rs:40-52): tangent/bitangent are just columns of the
  view-projection matrix and per-chunk origins are one tiny matmul, so the
  whole scene's bases are recomputed per frame in microseconds, batched on
  the VPU.  The reference's ``clear_basis_cache()`` staleness hazard
  (packet_pipeline.rs:64-67) disappears by construction.

- Packet-level backface culling and SIMD frustum AABB culling
  (packet_pipeline.rs:104, :194-256) become masked vectorized tests over the
  whole frame's quad stream; visible quads are compacted with a cumsum
  scatter (the TPU version of "compacted visible-quad stream").

- Rasterizer setup: each quad is a parallelogram ``P(u,v) = O + u*T + v*B``
  in clip space.  We precompute the adjugate of ``M = [T.xyw | B.xyw |
  O.xyw]``; at pixel NDC position ``n = (nx, ny, 1)``, ``q = adj(M) @ n``
  gives ``(u, v) = (q0/q2, q1/q2)`` and ``1/w ~ q2`` — 2D homogeneous
  rasterization.  Coverage, perspective-correct UV, and exact planar depth
  (``z_ndc`` is affine in NDC for a plane) all come from 9 precomputed
  coefficients, with NO near-plane clipping (pixels behind the eye fail the
  sign test).  This supersedes the reference's Sutherland-Hodgman clipper
  (rasterizer.rs:2560-2795) and its per-scanline edge walking
  (rasterizer.rs:1351-1462) with branchless tensor math.

Everything below is jnp, shape-static, and jit/vmap-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..meshing import quad_format as qf
from ..utils.config import NEAR_W_EPS, SPAN_EPSILON_PX

# Per-face axis indices: the chunk-local axes that u, v, and the face normal
# move along (see quad_format.FACE_TANGENTS — negative faces are NOT
# flipped; deliberate fix of the reference's mirrored negative-face bases).
FACE_T_AXIS = np.array([1, 1, 0, 0, 0, 0], dtype=np.int32)
FACE_B_AXIS = np.array([2, 2, 2, 2, 1, 1], dtype=np.int32)
FACE_N_AXIS = np.array([0, 0, 1, 1, 2, 2], dtype=np.int32)
FACE_POSITIVE = np.array([1, 0, 1, 0, 1, 0], dtype=np.int32)


def decode_quads(quads: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Vectorized unpack of the 32-bit quad words (see quad_format.py)."""
    q = quads.astype(jnp.uint32)
    u = (q & 0x1F).astype(jnp.float32)
    v = ((q >> 5) & 0x1F).astype(jnp.float32)
    w = (((q >> 10) & 0x3F) + 1).astype(jnp.float32)
    h = (((q >> 16) & 0x3F) + 1).astype(jnp.float32)
    block = ((q >> 22) & 0x3).astype(jnp.int32)
    slice_idx = ((q >> 24) & 0x1F).astype(jnp.int32)
    face = ((q >> 29) & 0x7).astype(jnp.int32)
    is_pos = jnp.asarray(FACE_POSITIVE)[face]
    axis_pos = jnp.where(is_pos == 1, slice_idx + 1, slice_idx).astype(jnp.float32)
    return dict(
        u0=u, v0=v, u1=u + w, v1=v + h, block=block, face=face,
        slice_idx=slice_idx, axis_pos=axis_pos, is_pos=is_pos,
    )


@dataclass(frozen=True)
class ViewTables:
    """Per-frame, per-camera constants shared by every quad."""

    view_proj: jnp.ndarray      # f32[4, 4]
    axis_cols: jnp.ndarray      # f32[3, 4]  — vp @ unit axis (w=0) = vp[:, :3].T
    cam_pos: jnp.ndarray        # f32[3]


def view_tables(view_proj: jnp.ndarray, cam_pos: jnp.ndarray) -> ViewTables:
    vp = jnp.asarray(view_proj, jnp.float32)
    return ViewTables(vp, vp[:, :3].T, jnp.asarray(cam_pos, jnp.float32))


def chunk_clip_origins(view_proj: jnp.ndarray, chunk_positions: jnp.ndarray) -> jnp.ndarray:
    """vp @ [chunk_pos * 32, 1] for every chunk slot — f32[V, 4].

    One small matmul replaces the reference's per-(face, chunk, slice)
    basis-cache misses (packet_pipeline.rs:142-160).
    """
    world = chunk_positions.astype(jnp.float32) * 32.0
    ones = jnp.ones(world.shape[:-1] + (1,), jnp.float32)
    hom = jnp.concatenate([world, ones], axis=-1)
    return hom @ jnp.asarray(view_proj, jnp.float32).T


def _corners_clip(dec, origin_clip, t_col, b_col):
    """Four clip-space corners of each quad, each f32[N, 4]."""
    u0 = dec["u0"][:, None]
    u1 = dec["u1"][:, None]
    v0 = dec["v0"][:, None]
    v1 = dec["v1"][:, None]
    c00 = origin_clip + u0 * t_col + v0 * b_col
    c10 = origin_clip + u1 * t_col + v0 * b_col
    c01 = origin_clip + u0 * t_col + v1 * b_col
    c11 = origin_clip + u1 * t_col + v1 * b_col
    return c00, c10, c01, c11


def project_and_cull(
    quads: jnp.ndarray,          # uint32[N]
    chunk_slot: jnp.ndarray,     # int32[N] index into per-chunk arrays
    in_stream: jnp.ndarray,      # bool[N] — true where the stream has a quad
    chunk_clip: jnp.ndarray,     # f32[V, 4] from chunk_clip_origins
    chunk_world: jnp.ndarray,    # f32[V, 3] chunk world origins (pos * 32)
    tables: ViewTables,
    *,
    width: int,
    height: int,
    span_mode: bool = False,
    backface_culling: bool = True,
) -> dict[str, jnp.ndarray]:
    """Stage A: project every quad's 4 corners, backface + frustum cull.

    Returns ``valid`` (survivors), ``depth_near``, ``any_behind`` and the
    integer screen bbox — everything the binning/compaction stage needs.

    Semantics mirror the reference funnel:
    - backface: exact plane-side test against the camera position (the
      per-triangle NDC cross of rasterizer.rs:1278-1286 reduces to this for
      axis-aligned faces); in span mode, the Hyper-Pipeline's cruder
      clip-normal test (differential_projection.rs:78-82) is used instead.
    - frustum: NDC AABB vs [-1,1]^2, near depth in [0,1]
      (packet_pipeline.rs:288-294).
    - near-crossing quads (any corner w <= 0.001) are conservatively kept
      with a full-screen bbox (main.rs:453-458's chunk-level fallback,
      applied per quad).
    """
    dec = decode_quads(quads)
    face = dec["face"]
    axis_cols = tables.axis_cols
    t_col = axis_cols[jnp.asarray(FACE_T_AXIS)[face]]
    b_col = axis_cols[jnp.asarray(FACE_B_AXIS)[face]]
    n_axis = jnp.asarray(FACE_N_AXIS)[face]
    n_col = axis_cols[n_axis]
    origin_clip = chunk_clip[chunk_slot] + dec["axis_pos"][:, None] * n_col

    c00, c10, c01, c11 = _corners_clip(dec, origin_clip, t_col, b_col)

    eps = jnp.float32(NEAR_W_EPS)
    ws = jnp.stack([c00[:, 3], c10[:, 3], c01[:, 3], c11[:, 3]], axis=0)
    any_behind = (ws <= eps).any(axis=0)
    all_behind = (ws <= eps).all(axis=0)  # fully behind the eye: cull

    def ndc(c):
        w = c[:, 3:4]
        safe = jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)
        return c[:, :3] / safe

    n00, n10, n01, n11 = ndc(c00), ndc(c10), ndc(c01), ndc(c11)
    stackn = jnp.stack([n00, n10, n01, n11], axis=0)  # [4, N, 3]
    w_ok = (ws > eps)[..., None]  # [4, N, 1]
    big = jnp.float32(jnp.inf)
    nmin = jnp.where(w_ok, stackn, big).min(axis=0)
    nmax = jnp.where(w_ok, stackn, -big).max(axis=0)
    depth_near = jnp.where(any_behind, 0.0, nmin[:, 2]).astype(jnp.float32)

    in_frustum = (
        (nmax[:, 0] >= -1.0)
        & (nmin[:, 0] <= 1.0)
        & (nmax[:, 1] >= -1.0)
        & (nmin[:, 1] <= 1.0)
        & (depth_near >= 0.0)
        & (depth_near <= 1.0)
    )
    in_frustum = (in_frustum | any_behind) & ~all_behind

    if backface_culling:
        if span_mode:
            # Hyper-Pipeline test: clip-space normal z < 0 keeps
            # (differential_projection.rs:78-82)
            sign = jnp.where(dec["is_pos"] == 1, 1.0, -1.0)
            front = sign * n_col[:, 2] < 0.0
        else:
            plane = chunk_world[chunk_slot, :][jnp.arange(face.shape[0]), n_axis] + dec[
                "axis_pos"
            ]
            d = tables.cam_pos[n_axis] - plane
            front = jnp.where(dec["is_pos"] == 1, d > 0.0, d < 0.0)
    else:
        front = jnp.ones_like(any_behind)

    valid = in_stream & front & in_frustum

    # Integer screen bbox (pixels, inclusive), full screen if near-crossing.
    wf, hf = jnp.float32(width), jnp.float32(height)
    sx0 = (nmin[:, 0] + 1.0) * 0.5 * wf
    sx1 = (nmax[:, 0] + 1.0) * 0.5 * wf
    sy0 = (1.0 - nmax[:, 1]) * 0.5 * hf
    sy1 = (1.0 - nmin[:, 1]) * 0.5 * hf
    bb_x0 = jnp.clip(jnp.floor(sx0), 0, width - 1).astype(jnp.int32)
    bb_x1 = jnp.clip(jnp.ceil(sx1), 0, width - 1).astype(jnp.int32)
    bb_y0 = jnp.clip(jnp.floor(sy0), 0, height - 1).astype(jnp.int32)
    bb_y1 = jnp.clip(jnp.ceil(sy1), 0, height - 1).astype(jnp.int32)
    bb_x0 = jnp.where(any_behind, 0, bb_x0)
    bb_y0 = jnp.where(any_behind, 0, bb_y0)
    bb_x1 = jnp.where(any_behind, width - 1, bb_x1)
    bb_y1 = jnp.where(any_behind, height - 1, bb_y1)

    return dict(
        valid=valid,
        depth_near=depth_near,
        any_behind=any_behind,
        bb_x0=bb_x0,
        bb_x1=bb_x1,
        bb_y0=bb_y0,
        bb_y1=bb_y1,
        # NDC AABB for span mode
        ndc_min=nmin,
        ndc_max=nmax,
    )


def compact_stream(valid: jnp.ndarray, cap: int, payloads: tuple[jnp.ndarray, ...]):
    """Order-preserving compaction of a masked stream into a fixed-capacity
    buffer (the cumsum-scatter pattern; SURVEY.md section 5 "compacted via
    mask + cumsum scatter").  Returns (count, overflow, packed payloads).
    """
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    total = jnp.maximum(idx[-1] + 1, 0) if valid.shape[0] else jnp.int32(0)
    dest = jnp.where(valid & (idx < cap), idx, cap)
    outs = []
    for p in payloads:
        buf = jnp.zeros((cap,) + p.shape[1:], p.dtype)
        outs.append(buf.at[dest].set(p, mode="drop"))
    count = jnp.minimum(total, cap).astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0).astype(jnp.int32)
    return count, overflow, tuple(outs)


def quad_coefficients(
    quads: jnp.ndarray,        # uint32[M] (compacted)
    chunk_slot: jnp.ndarray,   # int32[M]
    proj: dict[str, jnp.ndarray],  # Stage-A fields, compacted alongside
    chunk_clip: jnp.ndarray,
    tables: ViewTables,
    color_tables: dict[str, jnp.ndarray],
    *,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    span_mode: bool = False,
) -> dict[str, jnp.ndarray]:
    """Stage B: rasterizer coefficients for the compacted visible stream.

    Output SoA (all [M]):
    - a00..a22: sign-fixed adjugate rows; at pixel ndc n, q = A @ (nx, ny, 1)
      with coverage ``q2 > 0 and u0*q2 <= q0 <= u1*q2 and v0*q2 <= q1 <=
      v1*q2`` and UV ``(q0/q2, q1/q2)``
    - z0, z1, z2: exact planar NDC depth, ``z = z0*nx + z1*ny + z2``
    - u0, u1, v0, v1: coverage bounds (quad params, or NDC AABB in span mode)
    - color_even / color_odd + mask_lo / mask_hi: two-tone texel select
    - tilebox: packed inclusive tile range (tx0 | tx1<<8 | ty0<<16 | ty1<<24)
    - depth_near: constant span-mode depth / sort key
    """
    dec = decode_quads(quads)
    face = dec["face"]
    axis_cols = tables.axis_cols
    t_col = axis_cols[jnp.asarray(FACE_T_AXIS)[face]]
    b_col = axis_cols[jnp.asarray(FACE_B_AXIS)[face]]
    n_col = axis_cols[jnp.asarray(FACE_N_AXIS)[face]]
    o_col = chunk_clip[chunk_slot] + dec["axis_pos"][:, None] * n_col

    if span_mode:
        # Screen-space AABB fill at constant depth — the span walker
        # (span_walker.rs:131-193) expressed in the unified kernel: identity
        # mapping q = (nx, ny, 1), bounds = the quad's NDC AABB with the
        # reference's epsilon/clamp semantics applied in screen space.
        wf, hf = jnp.float32(width), jnp.float32(height)
        eps = jnp.float32(SPAN_EPSILON_PX)
        sx0 = jnp.maximum((proj["ndc_min"][:, 0] + 1.0) * 0.5 * wf, 0.0)
        sy0 = jnp.maximum((1.0 - proj["ndc_max"][:, 1]) * 0.5 * hf, 0.0)
        sx1 = jnp.minimum((proj["ndc_max"][:, 0] + 1.0) * 0.5 * wf + eps, wf)
        sy1 = jnp.minimum((1.0 - proj["ndc_min"][:, 1]) * 0.5 * hf + eps, hf)
        # back to NDC for the unified coverage test
        u0 = sx0 / (0.5 * wf) - 1.0
        u1 = sx1 / (0.5 * wf) - 1.0
        v0 = 1.0 - sy1 / (0.5 * hf)
        v1 = 1.0 - sy0 / (0.5 * hf)
        n = quads.shape[0]
        zeros = jnp.zeros((n,), jnp.float32)
        ones = jnp.ones((n,), jnp.float32)
        coeffs = dict(
            a00=ones, a01=zeros, a02=zeros,
            a10=zeros, a11=ones, a12=zeros,
            a20=zeros, a21=zeros, a22=ones,
            z0=zeros, z1=zeros, z2=proj["depth_near"],
            u0=u0, u1=u1, v0=v0, v1=v1,
        )
        from ..models.block_type import BLOCK_COLORS_ARGB  # tiny table

        col = jnp.asarray(BLOCK_COLORS_ARGB.view(np.int32))[dec["block"]]
        coeffs["color_even"] = col
        coeffs["color_odd"] = col
        coeffs["mask_lo"] = jnp.zeros((n,), jnp.int32)
        coeffs["mask_hi"] = jnp.zeros((n,), jnp.int32)
    else:
        m00, m01, m02 = t_col[:, 0], b_col[:, 0], o_col[:, 0]
        m10, m11, m12 = t_col[:, 1], b_col[:, 1], o_col[:, 1]
        m20, m21, m22 = t_col[:, 3], b_col[:, 3], o_col[:, 3]
        a00 = m11 * m22 - m12 * m21
        a01 = -(m01 * m22 - m02 * m21)
        a02 = m01 * m12 - m02 * m11
        a10 = -(m10 * m22 - m12 * m20)
        a11 = m00 * m22 - m02 * m20
        a12 = -(m00 * m12 - m02 * m10)
        a20 = m10 * m21 - m11 * m20
        a21 = -(m00 * m21 - m01 * m20)
        a22 = m00 * m11 - m01 * m10
        det = m00 * a00 + m01 * a10 + m02 * a20
        sigma = jnp.where(det > 0, 1.0, jnp.where(det < 0, -1.0, 0.0)).astype(jnp.float32)
        inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0).astype(jnp.float32)
        tz, bz, oz = t_col[:, 2], b_col[:, 2], o_col[:, 2]
        z0 = (tz * a00 + bz * a10 + oz * a20) * inv_det
        z1 = (tz * a01 + bz * a11 + oz * a21) * inv_det
        z2 = (tz * a02 + bz * a12 + oz * a22) * inv_det
        coeffs = dict(
            a00=a00 * sigma, a01=a01 * sigma, a02=a02 * sigma,
            a10=a10 * sigma, a11=a11 * sigma, a12=a12 * sigma,
            a20=a20 * sigma, a21=a21 * sigma, a22=a22 * sigma,
            z0=z0, z1=z1, z2=z2,
            u0=dec["u0"], u1=dec["u1"], v0=dec["v0"], v1=dec["v1"],
        )
        fb = face * 4 + dec["block"]
        ce = jnp.asarray(color_tables["color_even"].view(np.int32)).reshape(-1)[fb]
        co = jnp.asarray(color_tables["color_odd"].view(np.int32)).reshape(-1)[fb]
        coeffs["color_even"] = ce
        coeffs["color_odd"] = co
        coeffs["mask_lo"] = jnp.asarray(color_tables["mask_lo"].view(np.int32))[dec["block"]]
        coeffs["mask_hi"] = jnp.asarray(color_tables["mask_hi"].view(np.int32))[dec["block"]]

    tx0 = (proj["bb_x0"] // tile_w).astype(jnp.int32)
    tx1 = (proj["bb_x1"] // tile_w).astype(jnp.int32)
    ty0 = (proj["bb_y0"] // tile_h).astype(jnp.int32)
    ty1 = (proj["bb_y1"] // tile_h).astype(jnp.int32)
    coeffs["tilebox"] = tx0 | (tx1 << 8) | (ty0 << 16) | (ty1 << 24)
    coeffs["depth_near"] = proj["depth_near"]
    return coeffs
