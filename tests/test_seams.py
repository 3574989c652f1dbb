"""Seam / gap regression tests — the reference's gap-bug family
(tests/rasterizer_gap_test.rs, rasterizer_x_gap_test.rs,
rasterizer_slice_gap_test.rs, span_walker_bug_reproduction.rs): adjacent
coplanar quads must tile the plane with no missing and no double-drawn
pixels, across sub-pixel camera shifts."""

import numpy as np
import jax.numpy as jnp
import pytest

from differential_projection_voxel_renderer_tpu.meshing.quad_format import (
    pack_quads,
)
from differential_projection_voxel_renderer_tpu.models.camera import Camera
from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
    Renderer,
    _render_step,
)
from differential_projection_voxel_renderer_tpu.utils.config import (
    RenderConfig,
    SKY_COLOR,
)

W = H = 128
SKY = np.uint32(SKY_COLOR)


def _camera(pos, target):
    cam = Camera(np.array(pos, np.float32), 1.0)
    cam.look_at(np.array(target, np.float32))
    return cam


def _render(quads, cam, *, use_pallas=True):
    renderer = Renderer(RenderConfig(width=W, height=H, use_pallas=False,
                                     enable_textures=False,
                                     enable_shading=False))
    from tests.test_render import _render_args, _step

    args = _render_args(renderer, quads, cam)
    c, d, _ = _step(renderer, args, use_pallas=use_pallas,
                    interpret=use_pallas)
    return c, d


def _grid_quads(n=4, size=8):
    """n x n adjacent +Y quads tiling a [0,32)^2 plane at y=16."""
    u = []
    v = []
    for i in range(n):
        for j in range(n):
            u.append(i * size)
            v.append(j * size)
    k = n * n
    return pack_quads(u, v, [size] * k, [size] * k, [1] * k, [15] * k,
                      [2] * k)


@pytest.mark.parametrize("jitter", [0.0, 0.203, 0.517, 0.871])
def test_coplanar_grid_has_no_seams(jitter):
    """The union of a quad grid == one big quad, pixel for pixel, for any
    sub-pixel camera placement (the gap bugs were sub-pixel rounding)."""
    cam = _camera([16.0 + jitter, 40.0, 16.0 + jitter * 0.7],
                  [16.0, 16.0, 16.0])
    tiled, dt = _render(_grid_quads(), cam)
    single = pack_quads([0], [0], [32], [32], [1], [15], [2])
    whole, dw = _render(single, cam)
    np.testing.assert_array_equal(tiled, whole)
    both = np.isfinite(dt) & np.isfinite(dw)
    np.testing.assert_array_equal(dt[both], dw[both])


def test_coplanar_grid_jnp_matches_pallas():
    cam = _camera([16.3, 40.0, 18.9], [16.0, 16.0, 16.0])
    c1, _ = _render(_grid_quads(), cam, use_pallas=True)
    c2, _ = _render(_grid_quads(), cam, use_pallas=False)
    np.testing.assert_array_equal(c1, c2)


def test_vertical_edge_no_double_draw():
    """Two quads sharing a vertical edge: drawing each alone and summing
    coverage equals drawing both (no overlap at the shared column) —
    rasterizer_x_gap_test.rs semantics."""
    left = pack_quads([0], [0], [16], [32], [1], [15], [2])
    right = pack_quads([16], [0], [16], [32], [1], [15], [2])
    cam = _camera([16.41, 44.0, 16.23], [16.0, 16.0, 16.0])
    cl, _ = _render(left, cam)
    cr, _ = _render(right, cam)
    cb, _ = _render(np.concatenate([left, right]), cam)
    cover_l = cl != SKY
    cover_r = cr != SKY
    cover_b = cb != SKY
    assert not (cover_l & cover_r).any(), "shared edge drawn twice"
    np.testing.assert_array_equal(cover_b, cover_l | cover_r)
