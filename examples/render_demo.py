"""Headless demo: generate a terrain world, render one frame, save a PPM.

The TPU-native stand-in for the reference's windowed app (src/main.rs —
winit + softbuffer); here the "present" is a file.  Runs on CPU or TPU.

Usage:
    python examples/render_demo.py [out.ppm] [--vd N] [--width W] [--height H]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="frame.ppm")
    ap.add_argument("--vd", type=int, default=6)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--span", action="store_true",
                    help="span mode (flat colors, Hyper-Pipeline semantics)")
    args = ap.parse_args()

    import jax

    from differential_projection_voxel_renderer_tpu.app.engine import Engine
    from differential_projection_voxel_renderer_tpu.models.world import (
        WorldConfig,
    )
    from differential_projection_voxel_renderer_tpu.rendering.framebuffer import (
        Framebuffer,
    )
    from differential_projection_voxel_renderer_tpu.utils.config import (
        RenderConfig,
    )

    print(f"backend: {jax.default_backend()}")
    eng = Engine(
        render_config=RenderConfig(width=args.width, height=args.height,
                                   span_mode=args.span),
        world_config=WorldConfig(view_distance=args.vd,
                                 max_chunks_per_frame=10**9),
    )
    # reference start pose (main.rs:51)
    eng.camera.position = np.array([0.0, 10.0, 20.0], np.float32)
    eng.camera.look_at(np.array([0.0, 0.0, -60.0], np.float32))

    t0 = time.time()
    while eng.world.update(eng.camera.position):
        pass
    print(f"world: {eng.world.chunk_count()} chunks ({time.time()-t0:.1f}s)")
    t0 = time.time()
    eng.prime()
    print(f"meshed: {len(eng.pool.by_pos)} chunks ({time.time()-t0:.1f}s)")

    res = eng.render_frame(dt=0.0)
    jax.block_until_ready(res.color)
    fb = Framebuffer.from_device(res.color, res.depth)
    fb.save_ppm(args.out)
    nonsky = (res.color_numpy() != np.uint32(0xFF87CEEB)).sum()
    print(f"wrote {args.out} ({args.width}x{args.height}, "
          f"{nonsky} non-sky pixels, stats={np.asarray(res.stats)})")


if __name__ == "__main__":
    main()
