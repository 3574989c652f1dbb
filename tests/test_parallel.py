"""Multi-device sharding tests on the virtual 8-device CPU mesh: the
sharded render step must produce exactly the single-device image."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
from differential_projection_voxel_renderer_tpu.parallel.sharded_render import (
    make_mesh,
    make_sharded_render,
)
from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
    Renderer,
)
from differential_projection_voxel_renderer_tpu.utils.config import (
    RenderConfig,
    SKY_COLOR,
)

SKY = np.uint32(SKY_COLOR)


@pytest.fixture(scope="module")
def scene():
    chunk = Chunk.generate_test_solid((0, 0, 0))
    quads = mesh_chunk(chunk)
    pool = np.zeros((8, 512), np.uint32)
    counts = np.zeros(8, np.int32)
    positions = np.zeros((8, 3), np.int32)
    pool[0, : len(quads)] = quads
    counts[0] = len(quads)
    cam = Camera(np.array([60.0, 70.0, 90.0], np.float32), 1.0)
    cam.look_at(np.array([16.0, 16.0, 16.0]))
    return pool, counts, positions, cam


def test_mesh_factorization():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8


def test_sharded_matches_single_device(scene):
    pool, counts, positions, cam = scene
    W = H = 128
    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    step = make_sharded_render(mesh, width=W, height=H,
                               gather_cap=1024, render_cap=512)
    b = dp
    visible = np.zeros((b, 8), np.int32)
    nvis = np.full(b, 1, np.int32)
    vp = np.repeat(cam.view_projection_matrix()[None], b, 0)
    cams = np.repeat(cam.position[None], b, 0)
    color, depth, count = step(
        jnp.asarray(pool), jnp.asarray(counts), jnp.asarray(positions),
        jnp.asarray(visible), jnp.asarray(nvis),
        jnp.asarray(vp, jnp.float32), jnp.asarray(cams, jnp.float32),
    )
    color = np.asarray(color)
    assert color.shape == (b, H, W)
    # all batch entries identical (same camera)
    for i in range(1, b):
        np.testing.assert_array_equal(color[0], color[i])

    # single-device reference via the Renderer (jnp path)
    r = Renderer(RenderConfig(width=W, height=H, use_pallas=False,
                              gather_cap=1024, quads_cap=512,
                              visible_chunks_cap=8))
    counts_sel = np.zeros(8, np.int32)
    counts_sel[0] = counts[0]
    positions_sel = np.zeros((8, 3), np.int32)
    c1, d1, _ = r.render(jnp.asarray(pool),
                         visible[0], counts_sel, positions_sel,
                         cam.view_projection_matrix(), cam.position)
    np.testing.assert_array_equal(color[0], np.asarray(c1))
    both = np.isfinite(np.asarray(depth[0])) & np.isfinite(np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(depth)[0][both],
                                  np.asarray(d1)[both])
    assert int(np.asarray(count)[0]) > 0
    assert (color[0] != SKY.astype(np.int32)).sum() > 100


def test_band_rasterization_matches_full():
    """rasterize_jnp band mode must reproduce the full-frame rows —
    the stripe-boundary regression (tests/rasterizer_slice_gap_test.rs)."""
    from differential_projection_voxel_renderer_tpu.ops import raster as R

    rng = np.random.default_rng(0)
    M = 64
    coeffs = {k: jnp.asarray(rng.standard_normal(M).astype(np.float32))
              for k in R.F_FIELDS}
    # make simple screen-rect quads (span-style identity mapping)
    coeffs["a00"] = jnp.ones(M, jnp.float32)
    coeffs["a01"] = jnp.zeros(M, jnp.float32)
    coeffs["a02"] = jnp.zeros(M, jnp.float32)
    coeffs["a10"] = jnp.zeros(M, jnp.float32)
    coeffs["a11"] = jnp.ones(M, jnp.float32)
    coeffs["a12"] = jnp.zeros(M, jnp.float32)
    coeffs["a20"] = jnp.zeros(M, jnp.float32)
    coeffs["a21"] = jnp.zeros(M, jnp.float32)
    coeffs["a22"] = jnp.ones(M, jnp.float32)
    lo = rng.uniform(-1, 0.5, (M, 2)).astype(np.float32)
    ext = rng.uniform(0.05, 0.8, (M, 2)).astype(np.float32)
    coeffs["u0"] = jnp.asarray(lo[:, 0])
    coeffs["u1"] = jnp.asarray(lo[:, 0] + ext[:, 0])
    coeffs["v0"] = jnp.asarray(lo[:, 1])
    coeffs["v1"] = jnp.asarray(lo[:, 1] + ext[:, 1])
    coeffs["z0"] = jnp.zeros(M, jnp.float32)
    coeffs["z1"] = jnp.zeros(M, jnp.float32)
    coeffs["z2"] = jnp.asarray(rng.uniform(0.1, 0.9, M).astype(np.float32))
    coeffs["color_even"] = jnp.asarray(rng.integers(0, 2**31, M).astype(np.int32))
    coeffs["color_odd"] = coeffs["color_even"]
    coeffs["mask_lo"] = jnp.zeros(M, jnp.int32)
    coeffs["mask_hi"] = jnp.zeros(M, jnp.int32)
    f, ic = R.pack_coeffs_quadmajor(coeffs)
    full_c, full_d = R.rasterize_jnp(f, ic, jnp.int32(M), height=64, width=128)
    for y0, bh in ((0, 16), (16, 16), (32, 32)):
        bc, bd = R.rasterize_jnp(f, ic, jnp.int32(M), height=64, width=128,
                                 y0=y0, band_h=bh)
        np.testing.assert_array_equal(np.asarray(full_c)[y0:y0+bh],
                                      np.asarray(bc))
        np.testing.assert_array_equal(np.asarray(full_d)[y0:y0+bh],
                                      np.asarray(bd))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_band_render_step_matches_full(scene, use_pallas):
    """_render_step band mode (the tp-sharded per-band production path,
    octet kernel included) must reproduce the full frame when bands are
    stacked — the reference's stripes run the REAL rasterizer
    (main.rs:581-597); so must ours."""
    from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
        _render_step,
    )

    pool, counts, positions, cam = scene
    W = H = 128
    gq = 1024
    nq = int(counts[0])
    stream = np.zeros(gq, np.uint32)
    stream[:nq] = pool[0, :nq]
    qw = np.zeros((3, gq), np.float32)
    kw = dict(
        color_tables=Renderer(
            RenderConfig(width=W, height=H, use_pallas=False))._tables_np,
        width=W, height=H, tile_h=16, tile_w=128, gather_cap=gq,
        render_cap=512, span_mode=False, backface_culling=True,
        use_pallas=use_pallas, interpret=use_pallas, tile_k_cap=512,
    )
    args = (jnp.asarray(stream), jnp.asarray(qw), jnp.int32(nq),
            jnp.asarray(cam.view_projection_matrix(), jnp.float32),
            jnp.asarray(cam.position, jnp.float32))
    full_c, full_d, _ = _render_step(*args, **kw)
    for bands in (2, 4):
        bh = H // bands
        cs, ds = [], []
        for b in range(bands):
            bc, bd, _ = _render_step(*args, band_y0=b * bh, band_h=bh, **kw)
            assert bc.shape == (bh, W)
            cs.append(np.asarray(bc))
            ds.append(np.asarray(bd))
        np.testing.assert_array_equal(np.concatenate(cs), np.asarray(full_c))
        np.testing.assert_array_equal(np.concatenate(ds), np.asarray(full_d))


def test_dp_sharded_full_pipeline_matches_single_device(scene):
    """make_sharded_render_dp: every camera of the batch renders its full
    frame on its own device via the production pipeline; shard 0 must
    equal the single-device render bit-for-bit (jnp path on the CPU
    mesh)."""
    from differential_projection_voxel_renderer_tpu.meshing.quad_format import (
        pack_quads,
    )
    from differential_projection_voxel_renderer_tpu.parallel.sharded_render import (
        make_sharded_render_dp,
    )
    from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
        _render_step,
    )

    pool, counts, positions, cam = scene
    W = H = 128
    B = 8
    gq = 1024
    nq = int(counts[0])
    stream = np.zeros((B, gq), np.uint32)
    stream[:, :nq] = pool[0, :nq]
    qw = np.zeros((B, 3, gq), np.float32)
    vps = np.repeat(cam.view_projection_matrix()[None], B, 0)
    cams = np.repeat(cam.position[None], B, 0)
    fn, mesh = make_sharded_render_dp(8, width=W, height=H, gather_cap=gq,
                                      render_cap=512, tile_k_cap=512)
    color, depth, stats = fn(
        jnp.asarray(stream), jnp.asarray(qw),
        jnp.asarray(np.full(B, nq, np.int32)),
        jnp.asarray(vps, jnp.float32), jnp.asarray(cams, jnp.float32),
    )
    r = Renderer(RenderConfig(width=W, height=H, use_pallas=False))
    c1, d1, _ = _render_step(
        jnp.asarray(stream[0]), jnp.asarray(qw[0]), jnp.int32(nq),
        jnp.asarray(vps[0], jnp.float32), jnp.asarray(cams[0], jnp.float32),
        color_tables=r._tables_np, width=W, height=H, tile_h=16, tile_w=128,
        gather_cap=gq, render_cap=512, span_mode=False,
        backface_culling=True, use_pallas=False, interpret=False,
        tile_k_cap=512,
    )
    np.testing.assert_array_equal(np.asarray(color)[0], np.asarray(c1))
    for b in range(1, B):
        np.testing.assert_array_equal(np.asarray(color)[0],
                                      np.asarray(color)[b])
