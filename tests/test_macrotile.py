"""Two-pass Hi-Z occlusion (rendering/macrotile.py use_hiz): the exact
cull must leave the frame bit-identical to single-pass, and actually cull
in high-overdraw scenes.

This completes the integration the reference plumbs but never wires
(macrotile_renderer.rs:68-70: a HiZBuffer is constructed and passed, and
no caller consults it)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
from differential_projection_voxel_renderer_tpu.ops import hiz
from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
    Renderer,
    _render_step,
    _two_pass_step,
    build_gather_indices,
)
from differential_projection_voxel_renderer_tpu.utils.config import (
    RenderConfig,
    SKY_COLOR,
)

W = H = 128
SKY = np.uint32(SKY_COLOR)


def _wall_args(renderer):
    """Occluder wall scene: a solid chunk fills the view; a dense fuzz
    chunk sits fully behind it — its ~1k quads are provably occluded,
    the two-pass mode's target workload."""
    rng = np.random.default_rng(7)
    hx = np.sin(np.arange(32) / 32 * 12) * 6
    hz = np.cos(np.arange(32) / 32 * 12) * 6
    height = hx[None, :] + hz[:, None] + 16
    y = np.arange(32)[None, :, None]
    solid = y < height[:, None, :]
    types = rng.integers(1, 4, (32, 32, 32)).astype(np.uint8)
    blocks = np.where(solid, types, 0).astype(np.uint8)
    chunks = [Chunk.generate_test_solid((0, 0, 0)),
              Chunk.varied((1, 0, 0), blocks)]
    vcap = renderer.config.visible_chunks_cap
    qcap = 8192
    pool = np.zeros((vcap, qcap), np.uint32)
    counts_sel = np.zeros(vcap, np.int32)
    positions_sel = np.zeros((vcap, 3), np.int32)
    visible = np.zeros(vcap, np.int32)
    for i, c in enumerate(chunks):
        q = mesh_chunk(c)  # meshed ALONE: full faces, no cross-chunk cull
        pool[i, : len(q)] = q
        counts_sel[i] = len(q)
        positions_sel[i] = c.position
        visible[i] = i
    from differential_projection_voxel_renderer_tpu.models.camera import Camera

    cam = Camera(np.array([-20.0, 16.0, 16.0], np.float32), 1.0)
    cam.look_at(np.array([32.0, 16.0, 16.0], np.float32))
    slot_of, within, quad_world, total = build_gather_indices(
        counts_sel, visible, positions_sel, renderer.config.gather_cap
    )
    stream = pool[slot_of, within]
    return (jnp.asarray(stream), jnp.asarray(quad_world),
            jnp.asarray(total, jnp.int32),
            jnp.asarray(cam.view_projection_matrix(), jnp.float32),
            jnp.asarray(cam.position, jnp.float32))


def _kw(renderer, *, use_pallas, interpret):
    cfg = renderer.config
    return dict(
        color_tables=renderer._tables_np, width=cfg.width,
        height=cfg.height, tile_h=16, tile_w=128,
        gather_cap=cfg.gather_cap, render_cap=cfg.quads_cap,
        span_mode=False, backface_culling=cfg.backface_culling,
        use_pallas=use_pallas, interpret=interpret,
        tile_k_cap=cfg.quads_cap,
    )


def test_build_max_pyramid_matches_numpy():
    rng = np.random.default_rng(3)
    d = rng.random((40, 72)).astype(np.float32)
    d[d > 0.9] = np.inf
    l1 = np.asarray(hiz.build_max_pyramid(jnp.asarray(d)))
    ref = np.full((5, 9), -np.inf, np.float32)
    pad = np.full((40, 72), np.inf, np.float32)
    pad[:40, :72] = d
    for by in range(5):
        for bx in range(9):
            ref[by, bx] = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].max()
    np.testing.assert_array_equal(l1, ref)


def test_hiz_exact_edge_blocks_not_dropped():
    """Regression: at non-block-multiple level-1 shapes (720p -> level1
    90x160, 90 % 8 != 0) the level-2 VALID pool used to DROP the trailing
    level-1 rows, and corner_max's clamp then tested bottom-edge quads
    against a block excluding their real (undrawn, +inf) pixels — an
    unsound cull.  The padded pool must keep them un-culled."""
    H720, W720 = 720, 1280
    l1 = np.full((90, 160), 5.0, np.float32)
    l1[88:, :] = np.inf  # bottom 16 pixel rows undrawn
    # quad at pixels y 688..719: spans 4 level-1 blocks (fits1 False) but
    # 2 level-2 blocks, the second of which only exists in the padded pool
    bbx = jnp.asarray([0 | (16 << 16)], jnp.int32)
    bby = jnp.asarray([688 | (719 << 16)], jnp.int32)
    depth_near = jnp.asarray([10.0], jnp.float32)
    occ = np.asarray(hiz.quads_occluded_exact(
        jnp.asarray(l1), bbx, bby, depth_near, height=H720, width=W720))
    assert not occ[0], "edge quad over undrawn pixels must not be culled"
    # sanity: the same quad in the interior (fully covered, all nearer)
    # IS culled — the pad must not disable level-2 culling
    bby_in = jnp.asarray([320 | (351 << 16)], jnp.int32)
    occ_in = np.asarray(hiz.quads_occluded_exact(
        jnp.asarray(l1), bbx, bby_in, depth_near, height=H720, width=W720))
    assert occ_in[0]


def test_packed_two_pass_config_rejected():
    """packed_raster has no init-framebuffer path; combining it with the
    two-pass mode must fail loudly instead of dropping the near pass."""
    with pytest.raises(ValueError):
        Renderer(RenderConfig(width=W, height=H, use_pallas=False,
                              packed_raster=True, two_pass_near_quads=16))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_two_pass_bit_identical(use_pallas):
    renderer = Renderer(RenderConfig(width=W, height=H, use_pallas=False))
    args = _wall_args(renderer)
    kw = _kw(renderer, use_pallas=use_pallas, interpret=use_pallas)
    c1, d1, s1 = _render_step(*args, **kw)
    c2, d2, s2 = _two_pass_step(*args, near_quads=16, **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # the wall occludes almost everything: the exact cull must fire
    assert int(s2[5]) > 0
    # gathered/rasterized accounting stays coherent
    assert int(s2[0]) == int(s1[0])


def test_two_pass_shared_stream_bit_identical(monkeypatch):
    """The shared-stream kernel's init-framebuffer path (two-pass far
    pass blending onto the near pass's output) must reproduce the
    single-pass frame bit-exactly, like the solo kernel.  Needs a frame
    wider than one tile (256 px, 2-tile group)."""
    renderer = Renderer(RenderConfig(width=256, height=H, use_pallas=False))
    args = _wall_args(renderer)
    kw = _kw(renderer, use_pallas=True, interpret=True)
    c1, d1, s1 = _render_step(*args, **kw)
    monkeypatch.setenv("DPVR_STREAM_GROUP", "2")
    c2, d2, s2 = _two_pass_step(*args, near_quads=16, **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(s2[5]) > 0


def test_two_pass_no_compaction_bit_identical(monkeypatch):
    """Two-pass occlusion through the NO-COMPACTION step (gather bucket
    <= render cap): the near/far masks fold into the binner's validity
    mask; the frame must stay bit-identical to single-pass."""
    renderer = Renderer(RenderConfig(width=W, height=H, use_pallas=False,
                                     gather_cap=16384, quads_cap=16384))
    args = _wall_args(renderer)
    kw = _kw(renderer, use_pallas=True, interpret=True)
    c1, d1, s1 = _render_step(*args, **kw)
    c2, d2, s2 = _two_pass_step(*args, near_quads=16, **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(s2[5]) > 0


def test_two_pass_renderer_facade():
    """macrotile_renderer(use_hiz=True) produces the same frame as the
    plain Renderer through the public API."""
    from differential_projection_voxel_renderer_tpu.rendering.macrotile import (
        MacrotileRenderConfig,
        macrotile_renderer,
    )

    r1 = Renderer(RenderConfig(width=W, height=H, use_pallas=False))
    r2 = macrotile_renderer(
        width=W, height=H,
        config=MacrotileRenderConfig(tile_size=128, use_hiz=True,
                                     near_quads=16),
        use_pallas=False)
    assert r2.config.two_pass_near_quads == 16
    args = _wall_args(r1)
    kw1 = _kw(r1, use_pallas=False, interpret=False)
    c1, d1, _ = _render_step(*args, **kw1)
    c2, d2, _ = _two_pass_step(*args, near_quads=16, **kw1)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_temporal_two_pass_config_rejected():
    """temporal_hiz and the explicit two-pass mode are the same pyramid
    cull twice over; combining them must fail loudly."""
    with pytest.raises(ValueError):
        Renderer(RenderConfig(width=W, height=H, use_pallas=False,
                              temporal_hiz=True, two_pass_near_quads=16))


def test_temporal_hiz_engine_bit_identical():
    """Static-camera temporal occlusion (RenderConfig.temporal_hiz):
    frame 1 seeds with a +inf pyramid (culls nothing, == the plain
    frame); frames 2+ cull against frame N-1's rendered-depth pyramid
    and must stay bit-identical while actually culling."""
    from differential_projection_voxel_renderer_tpu.app.engine import Engine
    from differential_projection_voxel_renderer_tpu.models.world import (
        WorldConfig,
    )

    eng = Engine(
        render_config=RenderConfig(width=256, height=128,
                                   temporal_hiz=True),
        world_config=WorldConfig(view_distance=3),
        pool_slots=1024,
    )
    eng.camera.position = np.array([0.0, 10.0, 20.0], np.float32)
    eng.camera.look_at(np.array([0.0, 0.0, -60.0]))
    while eng.world.update(eng.camera.position):
        pass
    eng.prime_all()
    frames = [eng.render_frame(dt=0.0) for _ in range(3)]
    f1, f2, f3 = [(np.asarray(r.color), np.asarray(r.depth),
                   np.asarray(r.stats)) for r in frames]
    # frame 1 took the plain path (upload cache was cold); frame 2 seeds
    # the pyramid; frame 3 culls against frame 2's depth
    np.testing.assert_array_equal(f1[0], f3[0])
    np.testing.assert_array_equal(f1[1], f3[1])
    assert f2[2][5] == 0          # seed frame culls nothing
    assert f3[2][5] > 0           # temporal cull fired
    # moving the camera falls back to the plain path (and resets the
    # pyramid identity) without changing the frame for the new pose
    eng.camera.position += np.array([0.5, 0.0, 0.0], np.float32)
    r_m = eng.render_frame(dt=0.0)
    assert int(np.asarray(r_m.stats)[5]) == 0
