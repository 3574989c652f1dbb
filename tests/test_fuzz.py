"""Broad differential fuzzing: N seeds x M cameras, multi-chunk scenes,
rolled up-vectors, camera-below-terrain horizon cases.

Port of the reference's fuzz discipline (span_walker_fuzz_tests.rs:158-210
ChaCha8-seeded chunks + camera sweeps; the six horizon test files add the
at/below-terrain-height false-positive cases and rolled-camera coverage in
rendering_pipeline_tests.rs:75-126).  Every combo renders the production
exact path and must agree with the independent f64 oracle: identical
coverage, >=99.9% exact colors, depth to 1e-4 where both drew.
"""

import numpy as np
import pytest

from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
from differential_projection_voxel_renderer_tpu.rendering import oracle
from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
    Renderer,
    build_gather_indices,
    _render_step,
)
from differential_projection_voxel_renderer_tpu.utils.config import (
    RenderConfig,
    SKY_COLOR,
)

SKY = np.uint32(SKY_COLOR)
W = H = 128


def _fuzz_chunk(seed, pos=(0, 0, 0)):
    """Seeded hilly heightfield with random block types (the reference's
    fuzz generator shape, span_walker_fuzz_tests.rs:89-104)."""
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, 2)
    amp = rng.uniform(1.0, 3.0, 2)
    hx = np.sin(np.arange(32) / 32 * 10 + ph[0]) * amp[0]
    hz = np.cos(np.arange(32) / 32 * 10 + ph[1]) * amp[1]
    height = hx[None, :] + hz[:, None] + rng.uniform(6, 12)
    y = np.arange(32)[None, :, None]
    solid = y < height[:, None, :]
    types = rng.integers(1, 4, size=(32, 32, 32)).astype(np.uint8)
    return Chunk.varied(pos, np.where(solid, types, 0).astype(np.uint8))


@pytest.fixture(scope="module")
def renderer():
    return Renderer(RenderConfig(width=W, height=H, use_pallas=False))


def _args_for(renderer, chunks_quads, vp, cam_pos):
    """chunks_quads: [(chunk_pos, quads)]."""
    cfg = renderer.config
    vcap = cfg.visible_chunks_cap
    pool = np.zeros((max(len(chunks_quads), 1), 4096), np.uint32)
    counts_sel = np.zeros(vcap, np.int32)
    positions_sel = np.zeros((vcap, 3), np.int32)
    visible = np.zeros(vcap, np.int32)
    for i, (pos, q) in enumerate(chunks_quads):
        pool[i, : len(q)] = q
        counts_sel[i] = len(q)
        positions_sel[i] = pos
        visible[i] = i
    slot_of, within, quad_world, total = build_gather_indices(
        counts_sel, visible, positions_sel, cfg.gather_cap
    )
    import jax.numpy as jnp

    return (
        jnp.asarray(pool[slot_of, within]),
        jnp.asarray(quad_world),
        jnp.asarray(total, jnp.int32),
        jnp.asarray(vp, jnp.float32),
        jnp.asarray(np.asarray(cam_pos, np.float32)),
    )


def _render(renderer, args):
    cfg = renderer.config
    color, depth, stats = _render_step(
        *args,
        color_tables=renderer._tables_np,
        width=cfg.width, height=cfg.height, tile_h=16, tile_w=128,
        gather_cap=cfg.gather_cap, render_cap=cfg.quads_cap,
        span_mode=False, backface_culling=cfg.backface_culling,
        use_pallas=False, interpret=False, tile_k_cap=cfg.quads_cap,
    )
    return (np.asarray(color).view(np.uint32), np.asarray(depth),
            np.asarray(stats))


def _check_vs_oracle(renderer, chunks_quads, vp, cam_pos):
    color, depth, _ = _render(renderer, _args_for(
        renderer, chunks_quads, vp, cam_pos))
    oc = od = None
    fb = None
    for pos, q in chunks_quads:
        fb = oracle.render_exact(
            q, np.asarray(pos, np.float64) * 32.0, vp, cam_pos, W, H,
            color_tables=renderer._tables_np, fb=fb,
        )
    oc, od = fb
    assert (oc != SKY).sum() == (color != SKY).sum(), "coverage differs"
    mismatch = (oc != color).sum()
    assert mismatch <= W * H * 0.001, f"{mismatch} color mismatches"
    both = np.isfinite(od) & np.isfinite(depth)
    if both.any():
        assert np.abs(od[both] - depth[both]).max() < 1e-4
    return color


def _cam(pos, target, roll=0.0):
    cam = Camera(np.asarray(pos, np.float32), 1.0)
    cam.look_at(np.asarray(target, np.float32))
    vp = cam.view_projection_matrix()
    if roll:
        # roll about the view axis: the reference's rolled-up-vector cases
        # (rendering_pipeline_tests.rs:75-126) that force its slow path;
        # our exact path is camera-orientation-agnostic and must not care
        c, s = np.cos(roll), np.sin(roll)
        rz = np.array([[c, -s, 0, 0], [s, c, 0, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        vp = rz @ vp
    return vp, cam.position


CAMERAS = {
    "overhead": ([16.0, 48.0, 16.0], [16.0, 8.0, 16.0], 0.0),
    "oblique": ([44.0, 28.0, -12.0], [16.0, 10.0, 16.0], 0.0),
    "level": ([-24.0, 12.0, 16.0], [48.0, 10.0, 16.0], 0.0),
    "below_terrain": ([16.0, 5.0, 70.0], [16.0, 14.0, 16.0], 0.0),
    "rolled": ([16.0, 40.0, 56.0], [16.0, 8.0, 16.0], 0.35),
    "rolled_level": ([-24.0, 13.0, 16.0], [40.0, 11.0, 16.0], -0.8),
}


@pytest.mark.parametrize("seed", [42, 7, 123, 2024])
@pytest.mark.parametrize("cam_name", ["overhead", "level"])
def test_fuzz_seeds_cameras(renderer, seed, cam_name):
    chunk = _fuzz_chunk(seed)
    quads = mesh_chunk(chunk)
    vp, pos = _cam(*CAMERAS[cam_name])
    _check_vs_oracle(renderer, [((0, 0, 0), quads)], vp, pos)


@pytest.mark.parametrize("cam_name",
                         ["oblique", "below_terrain", "rolled",
                          "rolled_level"])
def test_fuzz_camera_poses(renderer, cam_name):
    chunk = _fuzz_chunk(99)
    quads = mesh_chunk(chunk)
    vp, pos = _cam(*CAMERAS[cam_name])
    color = _check_vs_oracle(renderer, [((0, 0, 0), quads)], vp, pos)
    if cam_name in ("rolled", "rolled_level"):
        assert (color != SKY).sum() > 100  # the roll didn't cull the scene


@pytest.mark.parametrize("seed", [5, 77])
def test_fuzz_multi_chunk(renderer, seed):
    """2x2 fuzz chunks with cross-chunk face culling; oracle accumulates
    chunk-by-chunk in the same draw order."""
    poss = [(0, 0, 0), (1, 0, 0), (0, 0, 1), (1, 0, 1)]
    chunks = [_fuzz_chunk(seed + i, p) for i, p in enumerate(poss)]
    quads = [mesh_chunk(c, chunks) for c in chunks]
    vp, pos = _cam([32.0, 56.0, 96.0], [32.0, 8.0, 32.0])
    _check_vs_oracle(renderer, list(zip(poss, quads)), vp, pos)


def test_fuzz_span_mode(renderer):
    chunk = _fuzz_chunk(42)
    quads = mesh_chunk(chunk)
    vp, pos = _cam(*CAMERAS["overhead"])
    args = _args_for(renderer, [((0, 0, 0), quads)], vp, pos)
    cfg = renderer.config
    import jax.numpy as jnp  # noqa: F401

    color, depth, _ = _render_step(
        *args, color_tables=renderer._tables_np,
        width=W, height=H, tile_h=16, tile_w=128,
        gather_cap=cfg.gather_cap, render_cap=cfg.quads_cap,
        span_mode=True, backface_culling=cfg.backface_culling,
        use_pallas=False, interpret=False, tile_k_cap=cfg.quads_cap,
    )
    color = np.asarray(color).view(np.uint32)
    depth = np.asarray(depth)
    oc, od = oracle.render_span(quads, np.zeros(3), vp, pos, W, H)
    assert (oc != color).sum() <= W * H * 0.001
    both = np.isfinite(od) & np.isfinite(depth)
    assert np.abs(od[both] - depth[both]).max() < 1e-4
