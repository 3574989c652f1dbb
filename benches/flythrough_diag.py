"""Diagnostic flythrough: per-frame breakdown of the moving-camera loop.

Counts which dispatch path each frame takes (cached render_prepared /
fused re-expansion / fused insert) and times the host-side funnel vs the
dispatch call, for both flythrough passes.  Measurement only — no
rendering-path changes.  Run on the TPU: ``python benches/flythrough_diag.py
[vd]``.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from differential_projection_voxel_renderer_tpu.app.engine import Engine
    from differential_projection_voxel_renderer_tpu.models.world import (
        WorldConfig,
    )
    from differential_projection_voxel_renderer_tpu.utils.config import (
        RenderConfig,
    )

    vd = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    eng = Engine(
        render_config=RenderConfig(width=1280, height=720),
        world_config=WorldConfig(view_distance=vd, frustum_culling=True,
                                 max_chunks_per_frame=16),
        pool_slots=8192,
    )
    eng.camera.position = np.array([0.0, 10.0, 20.0], np.float32)
    eng.camera.look_at(np.array([0.0, 0.0, -60.0]))
    while eng.world.update(eng.camera.position):
        pass
    eng.prime_all()
    if eng.resident_stream:
        eng.warm_resident()
    else:
        eng.warm_buckets()
    res = eng.render_frame(dt=0.0)
    if not eng.resident_stream:
        eng.warm_streaming()
    for _ in range(8):
        res = eng.render_frame(dt=0.0)
    np.asarray(res.color[:1, :1])
    jax.block_until_ready(eng.pool.quads)

    # wrap the paths with counters by monkeypatching the renderer
    counters = {}
    times = {}

    def wrap(obj, name):
        fn = getattr(obj, name)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            dt_ms = (time.perf_counter() - t0) * 1e3
            counters[name] = counters.get(name, 0) + 1
            times[name] = times.get(name, 0.0) + dt_ms
            return out

        setattr(obj, name, wrapped)

    for name in ("render_prepared", "render_fused", "render_fused_insert",
                 "prepare_uploads", "render_prepared_append",
                 "render_prepared_append_insert"):
        wrap(eng.renderer, name)
    wrap(eng.pool, "insert_many")
    wrap(eng.pool, "prepare_insert_payload")
    wrap(eng.pool, "dispatch_insert_payload")
    wrap(eng, "_funnel")
    wrap(eng.world, "update")
    wrap(eng, "_mesh_list")
    wrap(eng, "_mesh_list_resident")
    wrap(eng, "_rebuild_resident")
    wrap(eng, "_queue_append")
    wrap(eng, "_missing_remesh_list")

    for pas in range(2):
        counters.clear()
        times.clear()
        t0 = time.time()
        n = 40
        for _ in range(n):
            eng.camera.position += np.array([0.4, 0.0, -0.4], np.float32)
            eng.camera.yaw += 0.01
            res = eng.render_frame(dt=0.016)
        np.asarray(res.color[:1, :1])
        dt = time.time() - t0
        print(f"pass {pas}: {n / dt:.1f} FPS ({dt / n * 1e3:.2f} ms/frame)")
        for k in sorted(counters):
            print(f"  {k}: {counters[k]}x, {times[k] / n:.3f} ms/frame "
                  f"(host-side call time)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
