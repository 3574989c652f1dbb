"""Fuzz the opt-in sub-column-packed kernel (ops/raster_packed.py) across
seeds and camera poses with the boundary-verified parity gate."""

import numpy as np
import pytest

from test_fuzz import CAMERAS, _cam, _fuzz_chunk
from test_render import (
    _assert_kernel_parity_boundary,
    _packed_records,
    _render_args,
    _step,
)

from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
from differential_projection_voxel_renderer_tpu.rendering.pipeline import Renderer
from differential_projection_voxel_renderer_tpu.utils.config import RenderConfig

W = H = 128


@pytest.mark.parametrize("seed,cam_name", [
    (7, "overhead"), (123, "level"), (99, "oblique"),
    (2024, "below_terrain"),
])
def test_packed_kernel_fuzz(seed, cam_name):
    chunk = _fuzz_chunk(seed)
    quads = mesh_chunk(chunk)
    renderer = Renderer(RenderConfig(width=W, height=H, use_pallas=False))
    import jax.numpy as jnp
    from differential_projection_voxel_renderer_tpu.models.camera import Camera

    pos, target, roll = CAMERAS[cam_name]
    vp, cam_pos = _cam(pos, target, roll)
    cam = Camera(np.asarray(pos, np.float32), 1.0)
    cam.look_at(np.asarray(target, np.float32))
    args = list(_render_args(renderer, quads, cam))
    args[3] = jnp.asarray(vp, jnp.float32)  # honor the rolled vp
    args = tuple(args)
    c1, d1, s1 = _step(renderer, args, use_pallas=False, interpret=False)
    c2, d2, s2 = _step(renderer, args, use_pallas=True, interpret=True)
    records = _packed_records(renderer, args)
    _assert_kernel_parity_boundary(c1, d1, c2, d2, records)
    np.testing.assert_array_equal(np.asarray(s1[:2]), np.asarray(s2[:2]))
