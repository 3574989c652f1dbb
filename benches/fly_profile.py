"""Streaming-flythrough breakdown: times world.update (generation),
the remesh scan + mesh + upload, and the rest of the frame separately
over the same flight as flythrough_bench pass 2.  Fresh-process only
(see flythrough_bench.py for why).  Diagnostics to stderr; one JSON
line per section to stdout."""

from __future__ import annotations

import json
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

    vd = 12
    eng = Engine(
        render_config=RenderConfig(width=1280, height=720),
        world_config=WorldConfig(view_distance=vd, frustum_culling=True,
                                 max_chunks_per_frame=16),
        pool_slots=8192,
    )
    if os.environ.get("DPVR_DEVICE_MESHING"):
        eng.device_meshing = True
    eng.camera.position = np.array([0.0, 10.0, 20.0], np.float32)
    eng.camera.look_at(np.array([0.0, 0.0, -60.0]))
    while eng.world.update(eng.camera.position):
        pass
    eng.prime_all()
    eng.warm_streaming()
    eng.warm_buckets()
    for _ in range(8):
        res = eng.render_frame(dt=0.0)
    jax.block_until_ready(res.color)
    jax.block_until_ready(eng.pool.quads)

    # pass 1 (primed) to move the camera into streaming territory
    for _ in range(40):
        eng.camera.position += np.array([0.4, 0.0, -0.4], np.float32)
        eng.camera.yaw += 0.01
        res = eng.render_frame(dt=0.016)
    jax.block_until_ready(res.color)

    # pass 2 instrumented: replicate render_frame's phases with timers
    t_update = t_remesh = t_rest = 0.0
    t_scan, t_meshonly, t_insert = [], [], []
    n = 40
    chunks_meshed = 0
    t_all0 = time.time()
    for _ in range(n):
        eng.camera.position += np.array([0.4, 0.0, -0.4], np.float32)
        eng.camera.yaw += 0.01
        cam = eng.camera
        t0 = time.perf_counter()
        eng.world.update(cam.position)
        t1 = time.perf_counter()
        frustum = cam.extract_frustum()
        vis_pos = eng.world.get_visible_positions(cam.position, frustum)
        if os.environ.get("DPVR_SPLIT_MESH"):
            # split _mesh_list into scan/mesh/upload for attribution
            from differential_projection_voxel_renderer_tpu.meshing.greedy \
                import mesh_chunk
            _, has = eng.pool.lookup_slots(vis_pos)
            to_mesh = []
            if not has.all():
                meshed = eng.pool.by_pos
                loaded = eng.world.chunks
                for p in vis_pos[~has].tolist():
                    pos = (p[0], p[1], p[2])
                    to_mesh.append(pos)
                    for off in eng._neighbor_offsets:
                        np_ = (pos[0] + off[0], pos[1] + off[1],
                               pos[2] + off[2])
                        if np_ in loaded and np_ in meshed:
                            to_mesh.append(np_)
            ts = time.perf_counter()
            t_scan.append(ts - t1)
            batch = []
            for pos in sorted(set(to_mesh)):
                chunk = eng.world.chunks.get(pos)
                if chunk is not None:
                    batch.append((pos, mesh_chunk(chunk, eng.world.chunks)))
            tm = time.perf_counter()
            t_meshonly.append(tm - ts)
            eng.pool.insert_many(batch)
            t_insert.append(time.perf_counter() - tm)
            chunks_meshed += len(to_mesh)
        else:
            chunks_meshed += eng._remesh_positions(vis_pos)
        eng.pool.retain(eng.world.chunks)
        t2 = time.perf_counter()
        # render via the normal path (visibility cache will miss: camera
        # moved, but world/remesh state is now settled for this frame)
        res = eng.render_frame(dt=0.0)
        t3 = time.perf_counter()
        t_update += t1 - t0
        t_remesh += t2 - t1
        t_rest += t3 - t2
    jax.block_until_ready(res.color)
    wall = time.time() - t_all0

    def emit(name, sec):
        print(json.dumps({"section": name,
                          "ms_per_frame": round(sec / n * 1000, 3)}),
              flush=True)

    emit("world_update", t_update)
    emit("remesh_mesh_upload", t_remesh)
    if t_scan:
        emit("remesh_scan", sum(t_scan))
        emit("remesh_mesh_only", sum(t_meshonly))
        emit("remesh_insert", sum(t_insert))
    emit("funnel_plus_render", t_rest)
    emit("wall_total", wall)
    print(json.dumps({"section": "chunks_meshed_per_frame",
                      "ms_per_frame": round(chunks_meshed / n, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
