"""Generate tests/fixtures/golden_terrain.npz (see test_perlin_fixtures.py).

Currently generated from THIS implementation (no Rust toolchain in the
build environment) — the fixtures lock determinism against future drift.
If cargo becomes available, regenerate from the reference build instead
(chunk.rs:114-177) to turn these into cross-implementation parity gates.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from differential_projection_voxel_renderer_tpu.app.engine import Engine
    from differential_projection_voxel_renderer_tpu.meshing.greedy import (
        mesh_chunk,
    )
    from differential_projection_voxel_renderer_tpu.models.chunk import (
        Chunk,
        sample_terrain_height,
    )
    from differential_projection_voxel_renderer_tpu.models.world import (
        WorldConfig,
    )
    from differential_projection_voxel_renderer_tpu.utils.config import (
        RenderConfig,
    )

    out = {}

    height_positions = [(0, 0), (1, 0), (0, 1), (-1, -1), (3, -2),
                        (-4, 5), (10, 10), (-12, 7), (25, -25), (-31, -31)]
    heights = []
    for cx, cz in height_positions:
        xs = np.arange(32)[None, :] + cx * 32
        zs = np.arange(32)[:, None] + cz * 32
        heights.append(sample_terrain_height(
            np.broadcast_to(xs, (32, 32)).astype(np.float64),
            np.broadcast_to(zs, (32, 32)).astype(np.float64)))
    out["height_positions"] = np.asarray(height_positions, np.int32)
    out["heights"] = np.stack(heights)

    quad_positions = [(0, 0, 0), (2, 0, -1), (-3, 0, 4)]
    out["quad_positions"] = np.asarray(quad_positions, np.int32)
    for i, pos in enumerate(quad_positions):
        region = [Chunk.generate_terrain((pos[0] + dx, pos[1], pos[2] + dz))
                  for dx in (-1, 0, 1) for dz in (-1, 0, 1)]
        me = next(c for c in region if c.position == pos)
        q = mesh_chunk(me, region)
        out[f"quads_{i}"] = (np.zeros(0, np.uint32) if q is None
                             else np.asarray(q))

    eng = Engine(
        render_config=RenderConfig(width=128, height=128, use_pallas=False),
        world_config=WorldConfig(view_distance=3,
                                 max_chunks_per_frame=10**9),
    )
    cam_pos = np.array([0.0, 40.0, 48.0], np.float32)
    cam_target = np.array([0.0, 10.0, -20.0], np.float32)
    eng.camera.position = cam_pos
    eng.camera.look_at(cam_target)
    while eng.world.update(eng.camera.position):
        pass
    eng.prime()
    res = eng.render_frame(dt=0.0)
    out["cam_pos"] = cam_pos
    out["cam_target"] = cam_target
    out["framebuffer"] = res.color_numpy()

    # Provenance marker (VERDICT r4 #7): the fixture loader
    # (tests/test_perlin_fixtures.py _fixture) surfaces this and prefers
    # a golden_terrain_reference.npz (provenance "reference-generated")
    # over this file the moment one can be produced from the Rust build.
    out["provenance"] = np.array("self-generated")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden_terrain.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
