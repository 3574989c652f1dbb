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
  whole frame's quad stream; visible quads are compacted scatter-free.

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

TPU layout rule honored throughout: every per-quad quantity is its own [M]
array (structure-of-arrays).  A ``[M, 4]`` layout would put 4 on the lane
dimension (padded to 128 -> 32x wasted VPU lanes and pathological gathers —
measured ~100x slowdowns); tiny per-face tables are applied with 6-way
selects instead of gathers for the same reason.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..utils.config import MIN_TRIANGLE_AREA, NEAR_W_EPS, SPAN_EPSILON_PX

# Per-face axis indices: the chunk-local axes that u, v, and the face normal
# move along (see quad_format.FACE_TANGENTS — negative faces are NOT
# flipped; deliberate fix of the reference's mirrored negative-face bases).
FACE_T_AXIS = np.array([1, 1, 0, 0, 0, 0], dtype=np.int32)
FACE_B_AXIS = np.array([2, 2, 2, 2, 1, 1], dtype=np.int32)
FACE_N_AXIS = np.array([0, 0, 1, 1, 2, 2], dtype=np.int32)
FACE_POSITIVE = np.array([1, 0, 1, 0, 1, 0], dtype=np.int32)


def decode_quads(quads: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Vectorized unpack of the 32-bit quad words (see quad_format.py).

    Accepts uint32 or int32 (every field is masked after its shift, so
    arithmetic-shift sign fill is harmless) — the Pallas geometry kernel
    passes int32 because Mosaic has no uint32->f32 cast."""
    q = quads if quads.dtype == jnp.int32 else quads.astype(jnp.uint32)
    u = (q & 0x1F).astype(jnp.float32)
    v = ((q >> 5) & 0x1F).astype(jnp.float32)
    w = (((q >> 10) & 0x3F) + 1).astype(jnp.float32)
    h = (((q >> 16) & 0x3F) + 1).astype(jnp.float32)
    block = ((q >> 22) & 0x3).astype(jnp.int32)
    slice_idx = ((q >> 24) & 0x1F).astype(jnp.int32)
    face = ((q >> 29) & 0x7).astype(jnp.int32)
    is_pos = (face & 1) == 0  # +X/+Y/+Z are even indices (FaceDir order)
    axis_pos = jnp.where(is_pos, slice_idx + 1, slice_idx).astype(jnp.float32)
    return dict(
        u0=u, v0=v, u1=u + w, v1=v + h, block=block, face=face,
        slice_idx=slice_idx, axis_pos=axis_pos, is_pos=is_pos,
    )


def _select3(idx: jnp.ndarray, v0, v1, v2) -> jnp.ndarray:
    return jnp.where(idx == 0, v0, jnp.where(idx == 1, v1, v2))


@dataclass(frozen=True)
class ViewTables:
    """Per-frame, per-camera constants shared by every quad."""

    view_proj: jnp.ndarray  # f32[4, 4]
    cam_pos: jnp.ndarray    # f32[3]


def view_tables(view_proj: jnp.ndarray, cam_pos: jnp.ndarray) -> ViewTables:
    return ViewTables(jnp.asarray(view_proj, jnp.float32),
                      jnp.asarray(cam_pos, jnp.float32))


def chunk_clip_origins(view_proj: jnp.ndarray, chunk_positions: jnp.ndarray):
    """vp @ [chunk_pos * 32, 1] for every chunk slot, returned as a tuple of
    four f32[V] component arrays (SoA — per-quad gathers from 1D tables are
    fast; strided column slices of a [V, 4] array are a per-use relayout).

    One small matmul replaces the reference's per-(face, chunk, slice)
    basis-cache misses (packet_pipeline.rs:142-160).
    """
    world = chunk_positions.astype(jnp.float32) * 32.0
    ones = jnp.ones(world.shape[:-1] + (1,), jnp.float32)
    hom = jnp.concatenate([world, ones], axis=-1)
    clip = hom @ jnp.asarray(view_proj, jnp.float32).T
    return tuple(clip[:, r] for r in range(4))


def _vp_rows(vp) -> list[list]:
    """Normalize a view-projection matrix to a nested [4][4] list of
    scalars.  Accepts a jnp [4, 4] array (XLA path) or an already-nested
    list (the Pallas geometry kernel passes SMEM scalar reads, where
    2D-array indexing is unavailable)."""
    if isinstance(vp, (list, tuple)):
        return [list(r) for r in vp]
    return [[vp[r, c] for c in range(4)] for r in range(4)]


class _Basis:
    """Per-quad clip-space basis in SoA form: each of origin/tangent/
    bitangent is 4 separate [M] arrays (ox..ow, tx..tw, bx..bw).

    ``quad_world`` is a tuple of 3 [M] arrays: the quad's chunk world origin
    per quad (host-expanded — gathers from per-chunk tables cost ~3 ns/elem
    on TPU while the host's np.repeat is free).  The origin transform is
    then pure elementwise math: o = vp @ (w + ap * n, 1)."""

    __slots__ = ("o", "t", "b")

    def __init__(self, dec, quad_world, vp):
        face = dec["face"]
        t_axis = _select_axis(face, FACE_T_AXIS)
        b_axis = _select_axis(face, FACE_B_AXIS)
        n_axis = _select_axis(face, FACE_N_AXIS)
        vpl = _vp_rows(vp)
        # vp columns as 12 scalars; per-quad column components by axis select
        col = [[vpl[r][a] for a in range(3)] for r in range(4)]
        self.t = tuple(_select3(t_axis, col[r][0], col[r][1], col[r][2]) for r in range(4))
        self.b = tuple(_select3(b_axis, col[r][0], col[r][1], col[r][2]) for r in range(4))
        n = tuple(_select3(n_axis, col[r][0], col[r][1], col[r][2]) for r in range(4))
        ap = dec["axis_pos"]
        wx, wy, wz = quad_world
        self.o = tuple(
            vpl[r][0] * wx + vpl[r][1] * wy + vpl[r][2] * wz + vpl[r][3]
            + ap * n[r]
            for r in range(4)
        )

    def corner(self, u, v, r):
        return self.o[r] + u * self.t[r] + v * self.b[r]


def quad_world_from_slots(chunk_world, chunk_slot):
    """Compat helper: per-quad world origins via gathers from per-chunk
    tables (tests / the sharded jnp path; the production pipeline uploads
    host-expanded arrays instead)."""
    return tuple(chunk_world[a][chunk_slot] for a in range(3))


def _select_axis(face, table_np):
    t = [int(x) for x in table_np]
    out = jnp.full(face.shape, t[5], jnp.int32)
    for i in range(4, -1, -1):
        out = jnp.where(face == i, jnp.int32(t[i]), out)
    return out


def project_and_cull(
    quads: jnp.ndarray,          # uint32[N]
    quad_world,                  # tuple of 3 f32[N] chunk world origin/quad
    in_stream: jnp.ndarray,      # bool[N] — true where the stream has a quad
    tables: ViewTables,
    *,
    width: int,
    height: int,
    span_mode: bool = False,
    backface_culling: bool = True,
    subpixel_culling: bool = True,
) -> dict[str, jnp.ndarray]:
    """Stage A: project every quad's 4 corners, backface + frustum cull.

    Semantics mirror the reference funnel:
    - backface: exact plane-side test against the camera position (the
      per-triangle NDC cross of rasterizer.rs:1278-1286 reduces to this for
      axis-aligned faces); in span mode, the Hyper-Pipeline's cruder
      clip-normal test (differential_projection.rs:78-82) is used instead.
    - frustum: NDC AABB vs [-1,1]^2, near depth in [0,1]
      (packet_pipeline.rs:288-294).
    - near-crossing quads (any corner w <= 0.001) are conservatively kept
      with a full-screen bbox (main.rs:453-458's chunk-level fallback,
      applied per quad); fully-behind quads are culled.
    - sub-pixel culling (exact mode only — the reference's span path has
      none): the quad is split along the c00-c11 diagonal exactly like the
      reference's fan split (rasterizer.rs:1056-1068, tri_indices
      (0,1,2),(0,2,3)) and culled when BOTH triangles' doubled screen areas
      fall below MIN_TRIANGLE_AREA = 0.1, i.e. 0.05 px^2
      (rasterizer.rs:2228-2241).  Deviation: when only ONE triangle is
      sub-threshold the reference drops that half-quad; we conservatively
      keep the whole quad (the kernel draws whole quads), which can add at
      most a sub-0.05 px^2 sliver.
    """
    dec = decode_quads(quads)
    cam = tables.cam_pos
    return stage_a_fields(
        dec, quad_world, in_stream, tables.view_proj,
        (cam[0], cam[1], cam[2]),
        width=width, height=height, span_mode=span_mode,
        backface_culling=backface_culling,
        subpixel_culling=subpixel_culling,
    )


def stage_a_fields(
    dec: dict[str, jnp.ndarray],
    quad_world,
    in_stream: jnp.ndarray,
    vp,                          # jnp [4,4] or nested scalar list
    cam,                         # 3-tuple of scalars
    *,
    width: int,
    height: int,
    span_mode: bool = False,
    backface_culling: bool = True,
    subpixel_culling: bool = True,
) -> dict[str, jnp.ndarray]:
    """Core of :func:`project_and_cull` on pre-decoded quads, shape-
    agnostic: runs on full [N] streams (XLA) and on [R, 128] blocks inside
    the Pallas geometry kernel (ops/geometry_pallas.py) with IDENTICAL
    arithmetic — the full-frame pallas-vs-jnp equality gate depends on
    this sharing."""
    face = dec["face"]
    vpl = _vp_rows(vp)
    basis = _Basis(dec, quad_world, vpl)
    u0, u1, v0, v1 = dec["u0"], dec["u1"], dec["v0"], dec["v1"]

    eps = jnp.float32(NEAR_W_EPS)
    big = jnp.float32(jnp.inf)
    corners_uv = ((u0, v0), (u1, v0), (u0, v1), (u1, v1))
    ws = [basis.corner(u, v, 3) for (u, v) in corners_uv]
    any_behind = (ws[0] <= eps) | (ws[1] <= eps) | (ws[2] <= eps) | (ws[3] <= eps)
    all_behind = (ws[0] <= eps) & (ws[1] <= eps) & (ws[2] <= eps) & (ws[3] <= eps)

    # one reciprocal per corner (4) instead of one divide per corner per
    # axis (12) — the reference's rcp_ps idea (differential_projection.rs:
    # 371-408) with an exact divide; both render paths share this function
    # so the rounding change is consistent everywhere
    invs = [1.0 / jnp.where(jnp.abs(w) > 1e-30, w, 1e-30) for w in ws]
    oks = [w > eps for w in ws]

    def corner_ndc(r):
        return [basis.corner(u, v, r) * inv
                for (u, v), inv in zip(corners_uv, invs)]

    def minmax(ns):
        lo = big
        hi = -big
        for n, ok in zip(ns, oks):
            lo = jnp.minimum(lo, jnp.where(ok, n, big))
            hi = jnp.maximum(hi, jnp.where(ok, n, -big))
        return lo, hi

    nxs = corner_ndc(0)
    nys = corner_ndc(1)
    nx_min, nx_max = minmax(nxs)
    ny_min, ny_max = minmax(nys)
    nz_min, _ = minmax(corner_ndc(2))
    depth_near = jnp.where(any_behind, 0.0, nz_min).astype(jnp.float32)

    in_frustum = (
        (nx_max >= -1.0) & (nx_min <= 1.0)
        & (ny_max >= -1.0) & (ny_min <= 1.0)
        & (depth_near >= 0.0) & (depth_near <= 1.0)
    )
    in_frustum = (in_frustum | any_behind) & ~all_behind

    if backface_culling:
        if span_mode:
            # Hyper-Pipeline test: clip-space normal z < 0 keeps
            # (differential_projection.rs:78-82)
            n_axis = _select_axis(face, FACE_N_AXIS)
            ncz = _select3(n_axis, vpl[2][0], vpl[2][1], vpl[2][2])
            sign = jnp.where(dec["is_pos"], 1.0, -1.0)
            front = sign * ncz < 0.0
        else:
            n_axis = _select_axis(face, FACE_N_AXIS)
            plane = _select3(n_axis, quad_world[0], quad_world[1],
                             quad_world[2]) + dec["axis_pos"]
            cam_n = _select3(n_axis, cam[0], cam[1], cam[2])
            d = cam_n - plane
            # logical form (not a bool-bool where): Mosaic lowers a select
            # of i1 vectors through an unsupported i8 truncation
            is_pos = dec["is_pos"]
            front = (is_pos & (d > 0.0)) | (~is_pos & (d < 0.0))
    else:
        front = jnp.ones_like(any_behind)

    valid = in_stream & front & in_frustum

    wf, hf = jnp.float32(width), jnp.float32(height)

    # Sub-pixel culling (exact mode; rasterizer.rs:2228-2241): split along
    # the c00-c11 diagonal (corner index order here is c00, c10, c01, c11 ->
    # perimeter 0,1,3,2; fan split (0,1,3),(0,3,2)) and cull when both
    # doubled triangle areas are below MIN_TRIANGLE_AREA.  Near-crossing
    # quads keep their conservative full-screen treatment.
    subpixel = jnp.zeros_like(valid)
    if subpixel_culling and not span_mode:
        sxs = [(n + 1.0) * 0.5 * wf for n in nxs]
        sys_ = [(1.0 - n) * 0.5 * hf for n in nys]

        def area2(i, j, k):
            # edge_function(a=i, b=j, c=k) (rasterizer.rs:2553-2558)
            return ((sxs[k] - sxs[i]) * (sys_[j] - sys_[i])
                    - (sys_[k] - sys_[i]) * (sxs[j] - sxs[i]))

        thr = jnp.float32(MIN_TRIANGLE_AREA)
        tiny = ((jnp.abs(area2(0, 1, 3)) < thr)
                & (jnp.abs(area2(0, 3, 2)) < thr) & ~any_behind)
        subpixel = valid & tiny
        valid = valid & ~tiny

    # Integer screen bbox (pixels, inclusive), full screen if near-crossing.
    sx0 = (nx_min + 1.0) * 0.5 * wf
    sx1 = (nx_max + 1.0) * 0.5 * wf
    sy0 = (1.0 - ny_max) * 0.5 * hf
    sy1 = (1.0 - ny_min) * 0.5 * hf
    bb_x0 = jnp.where(any_behind, 0, jnp.clip(jnp.floor(sx0), 0, width - 1).astype(jnp.int32))
    bb_x1 = jnp.where(any_behind, width - 1, jnp.clip(jnp.ceil(sx1), 0, width - 1).astype(jnp.int32))
    bb_y0 = jnp.where(any_behind, 0, jnp.clip(jnp.floor(sy0), 0, height - 1).astype(jnp.int32))
    bb_y1 = jnp.where(any_behind, height - 1, jnp.clip(jnp.ceil(sy1), 0, height - 1).astype(jnp.int32))

    return dict(
        valid=valid,
        subpixel=subpixel,
        depth_near=depth_near,
        any_behind=any_behind,
        bb_x0=bb_x0,
        bb_x1=bb_x1,
        bb_y0=bb_y0,
        bb_y1=bb_y1,
        # NDC AABB for span mode
        nx_min=nx_min, nx_max=nx_max, ny_min=ny_min, ny_max=ny_max,
    )


def compact_stream(valid: jnp.ndarray, cap: int, payloads: tuple[jnp.ndarray, ...]):
    """Order-preserving compaction of a masked stream into a fixed-capacity
    buffer — the TPU "compacted visible-quad stream" (SURVEY.md section 5).

    Scatter-free: output slot n holds the n-th survivor, found by binary
    search over the cumulative survivor count (XLA scatters serialize on
    TPU — measured 3 ms for a 131k scatter — while searchsorted is a few
    rounds of vectorized gathers at ~30 us).  Returns
    (count, overflow, packed payloads).
    """
    csum = jnp.cumsum(valid.astype(jnp.int32))
    total = csum[-1] if valid.shape[0] else jnp.int32(0)
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    src = jnp.searchsorted(csum, targets, side="left").astype(jnp.int32)
    src = jnp.minimum(src, valid.shape[0] - 1)
    in_range = targets <= total
    outs = []
    for p in payloads:
        taken = p[src]
        zero = jnp.zeros((), p.dtype)
        outs.append(jnp.where(in_range.reshape((cap,) + (1,) * (p.ndim - 1)),
                              taken, zero))
    count = jnp.minimum(total, cap).astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0).astype(jnp.int32)
    return count, overflow, tuple(outs)


def quad_coefficients(
    quads: jnp.ndarray,        # uint32[M] (binned/compacted stream)
    quad_world,                # tuple of 3 f32[M]
    proj: dict[str, jnp.ndarray],  # Stage-A fields on the same stream
    tables: ViewTables,
    color_tables: dict[str, jnp.ndarray],
    *,
    width: int,
    height: int,
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

    ``proj`` (Stage-A output on the same stream) is required only in span
    mode (the exact-mode coefficients depend solely on the quad geometry).
    """
    dec = decode_quads(quads)
    face = dec["face"]
    vp = tables.view_proj
    n = quads.shape[0]

    if span_mode:
        # Screen-space AABB fill at constant depth — the span walker
        # (span_walker.rs:131-193) expressed in the unified kernel: identity
        # mapping q = (nx, ny, 1), bounds = the quad's NDC AABB with the
        # reference's epsilon/clamp semantics applied in screen space.
        wf, hf = jnp.float32(width), jnp.float32(height)
        eps = jnp.float32(SPAN_EPSILON_PX)
        sx0 = jnp.maximum((proj["nx_min"] + 1.0) * 0.5 * wf, 0.0)
        sy0 = jnp.maximum((1.0 - proj["ny_max"]) * 0.5 * hf, 0.0)
        sx1 = jnp.minimum((proj["nx_max"] + 1.0) * 0.5 * wf + eps, wf)
        sy1 = jnp.minimum((1.0 - proj["ny_min"]) * 0.5 * hf + eps, hf)
        u0 = sx0 / (0.5 * wf) - 1.0
        u1 = sx1 / (0.5 * wf) - 1.0
        v0 = 1.0 - sy1 / (0.5 * hf)
        v1 = 1.0 - sy0 / (0.5 * hf)
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

        flat_colors = [int(np.uint32(c).view(np.int32)) for c in
                       np.asarray(BLOCK_COLORS_ARGB)]
        col = jnp.full((n,), flat_colors[0], jnp.int32)
        for i in (1, 2, 3):
            col = jnp.where(dec["block"] == i, jnp.int32(flat_colors[i]), col)
        coeffs["color_even"] = col
        coeffs["color_odd"] = col
        coeffs["mask_lo"] = jnp.zeros((n,), jnp.int32)
        coeffs["mask_hi"] = jnp.zeros((n,), jnp.int32)
    else:
        basis = _Basis(dec, quad_world, vp)
        m00, m01, m02 = basis.t[0], basis.b[0], basis.o[0]
        m10, m11, m12 = basis.t[1], basis.b[1], basis.o[1]
        m20, m21, m22 = basis.t[3], basis.b[3], basis.o[3]
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
        tz, bz, oz = basis.t[2], basis.b[2], basis.o[2]
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
        # 24-entry color tables applied via select chains over (face, block)
        ce_np = np.asarray(color_tables["color_even"]).view(np.int32)
        co_np = np.asarray(color_tables["color_odd"]).view(np.int32)
        ml_np = np.asarray(color_tables["mask_lo"]).view(np.int32)
        mh_np = np.asarray(color_tables["mask_hi"]).view(np.int32)
        block = dec["block"]
        ce = jnp.zeros((n,), jnp.int32)
        co = jnp.zeros((n,), jnp.int32)
        for f in range(6):
            fm = face == f
            for b_ in range(1, 4):
                m = fm & (block == b_)
                ce = jnp.where(m, jnp.int32(int(ce_np[f, b_])), ce)
                co = jnp.where(m, jnp.int32(int(co_np[f, b_])), co)
        ml = jnp.zeros((n,), jnp.int32)
        mh = jnp.zeros((n,), jnp.int32)
        for b_ in range(1, 4):
            m = block == b_
            ml = jnp.where(m, jnp.int32(int(ml_np[b_])), ml)
            mh = jnp.where(m, jnp.int32(int(mh_np[b_])), mh)
        coeffs["color_even"] = ce
        coeffs["color_odd"] = co
        coeffs["mask_lo"] = ml
        coeffs["mask_hi"] = mh

    return coeffs


def pack_tilebox(proj: dict[str, jnp.ndarray], *, tile_h: int, tile_w: int):
    """Stage-A screen bbox -> packed inclusive tile range
    (tx0 | tx1<<8 | ty0<<16 | ty1<<24) for the binner."""
    tx0 = (proj["bb_x0"] // tile_w).astype(jnp.int32)
    tx1 = (proj["bb_x1"] // tile_w).astype(jnp.int32)
    ty0 = (proj["bb_y0"] // tile_h).astype(jnp.int32)
    ty1 = (proj["bb_y1"] // tile_h).astype(jnp.int32)
    return tx0 | (tx1 << 8) | (ty0 << 16) | (ty1 << 24)
