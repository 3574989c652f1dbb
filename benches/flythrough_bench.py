"""Flythrough benchmark (BASELINE.md config 5): streaming + remesh +
moving camera, measured in a FRESH process.

Run standalone or via bench.py (which shells out to this script): per-frame
throughput on this relay-attached TPU degrades ~3x after several minutes
of sustained use in one process (mechanism unidentified — reproducible by
reordering work; see NOTES.md), so an end-of-bench in-process flythrough
measures that degradation, not the engine.

Prints one line: ``FLYTHROUGH <first_pass_fps> <second_pass_fps>``.
Pass 1 crosses mostly pre-primed terrain; pass 2 streams fresh chunks
(~8 generated + meshed + uploaded per frame at this camera speed).

Default mode is SERIAL (one dispatch per frame, no latency).
DPVR_FLY_PIPELINED=1 runs the frames-in-flight mode instead
(engine.render_frame_pipelined, one frame of output latency, frames
bit-identical — tests/test_engine.py): measured on this relay it wins
the static wall clearly (bench.py: 309 vs 205 FPS same-session) but is
neutral-to-slightly-slower on the flythrough (100/68 vs 117/81 in the
same degraded session) while its warm-up compiles 16 extra programs in
this subprocess — so serial stays the flythrough default.
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
    serial = not bool(int(os.environ.get("DPVR_FLY_PIPELINED", "0")
                          or "0"))
    eng.prime_all()
    if eng.resident_stream:
        # DPVR_RESIDENT=1: the resident superset-stream mode compiles
        # its own (smaller) program set
        eng.warm_resident()
    else:
        # a mid-flight bucket switch costs a ~2.5 s trace
        eng.warm_buckets(pipelined=not serial)
    res = eng.render_frame(dt=0.0)  # sets the upload cache: warm_streaming
    if not eng.resident_stream:
        eng.warm_streaming()        # then warms only the relevant buckets
    for _ in range(8):
        res = eng.render_frame(dt=0.0)
    # force a real D2H round trip: block_until_ready alone does not
    # reliably block on this relay (NOTES.md "Infra quirks")
    np.asarray(res.color[:1, :1])
    jax.block_until_ready(eng.pool.quads)

    fps = []
    for _ in range(2):
        t0 = time.time()
        n = 40
        for _ in range(n):
            eng.camera.position += np.array([0.4, 0.0, -0.4], np.float32)
            eng.camera.yaw += 0.01
            if serial:
                res = eng.render_frame(dt=0.016)
            else:
                res = eng.render_frame_pipelined(dt=0.016) or res
        if not serial:
            res = eng.flush_pipeline() or res
        np.asarray(res.color[:1, :1])  # forced D2H (see above; a
        # per-frame dependency chain adds a round trip per frame on this
        # relay and is NOT a usable barrier - NOTES.md round 4)
        fps.append(n / (time.time() - t0))
    mode = "serial" if serial else "pipelined (1-frame latency)"
    print(f"flythrough mode: {mode}", file=sys.stderr, flush=True)
    print(f"FLYTHROUGH {fps[0]:.1f} {fps[1]:.1f}", flush=True)


if __name__ == "__main__":
    main()
