"""Micro/criterion-style benchmark suite — mirrors the reference's six
cargo-bench targets (SURVEY.md section 6 harness inventory):

- meshing:   uniform / terrain / dense / multi-chunk (benches/meshing.rs)
- rendering: single chunk, framebuffer ops, 3x3x3 world (benches/rendering.rs)
- world:     generation sizes, update, visibility query (benches/world.rs)
- differential_projection: full MVP vs batched basis (benches/differential_projection.rs)
- span_walker: quad batches at 1920x1080 (benches/span_walker.rs)
- microbench: funnel counters per pattern (benches/microbench.rs)

Usage:  python benches/run_benches.py [--device]
Prints one line per case to stdout (name, time, derived rate).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, n=10, unit="", per=1):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    rate = f" ({per / dt:,.0f} {unit}/s)" if unit else ""
    print(f"{name}: {dt * 1e3:.3f} ms{rate}")
    return out


def bench_meshing():
    from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
    from differential_projection_voxel_renderer_tpu.models.chunk import Chunk

    print("== meshing (host, native greedy) ==")
    terrain = Chunk.generate_terrain((0, 0, 0))
    solid = Chunk.generate_test_solid((1, 0, 0))
    rng = np.random.default_rng(0)
    dense = Chunk.varied((2, 0, 0), np.where(
        rng.random((32, 32, 32)) < 0.3, rng.integers(1, 4, (32, 32, 32)), 0
    ).astype(np.uint8))
    timeit("terrain chunk", lambda: mesh_chunk(terrain), n=50, unit="chunk", per=1)
    timeit("solid chunk", lambda: mesh_chunk(solid), n=50, unit="chunk", per=1)
    timeit("dense random chunk", lambda: mesh_chunk(dense), n=20, unit="chunk", per=1)
    region = [Chunk.generate_terrain((x, 0, z)) for x in range(3) for z in range(3)]
    timeit("3x3 region (9 chunks, neighbors)",
           lambda: [mesh_chunk(c, region) for c in region], n=5,
           unit="chunk", per=9)


def bench_world():
    from differential_projection_voxel_renderer_tpu.models.camera import Camera
    from differential_projection_voxel_renderer_tpu.models.world import (
        World, WorldConfig,
    )

    print("== world ==")
    for vd in (5, 10):
        def gen():
            w = World(WorldConfig(view_distance=vd, max_chunks_per_frame=10**9))
            w.update(np.zeros(3))
            return w
        w = timeit(f"generate view sphere vd={vd}", gen, n=2, unit="chunk",
                   per=len(gen().chunks))
    w = World(WorldConfig(view_distance=10))
    w.update(np.zeros(3))
    cam = Camera(np.zeros(3), 16 / 9)
    fr = cam.extract_frustum()
    timeit("visibility query (sphere+frustum)",
           lambda: w.get_visible_chunks_frustum(np.zeros(3), fr), n=50)


def bench_device(quick=False):
    import jax
    import jax.numpy as jnp

    from differential_projection_voxel_renderer_tpu.meshing.greedy import mesh_chunk
    from differential_projection_voxel_renderer_tpu.models.camera import Camera
    from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
    from differential_projection_voxel_renderer_tpu.ops import meshing_jax as MJ
    from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
        Renderer, make_repeated_step,
    )
    from differential_projection_voxel_renderer_tpu.utils.config import RenderConfig

    print(f"== device ({jax.default_backend()}) ==")

    # differential projection: batched basis vs per-corner MVP at 128k quads
    from differential_projection_voxel_renderer_tpu.ops import projection as P

    rng = np.random.default_rng(0)
    m = 131072
    quads = jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32))
    slot = jnp.asarray(rng.integers(0, 256, m).astype(np.int32))
    cam = Camera(np.array([16.0, 60.0, 90.0], np.float32), 16 / 9)
    cam.look_at(np.array([0.0, 0.0, 0.0]))
    vp = jnp.asarray(cam.view_projection_matrix())
    tables = P.view_tables(vp, jnp.asarray(cam.position))
    cpos = jnp.asarray(rng.integers(-6, 6, (256, 3)).astype(np.int32))
    cclip = P.chunk_clip_origins(vp, cpos)
    cw = tuple((cpos.astype(jnp.float32) * 32.0)[:, a] for a in range(3))
    instream = jnp.ones(m, bool)

    wq = P.quad_world_from_slots(cw, slot)
    f = jax.jit(lambda q, s: P.project_and_cull(
        q, P.quad_world_from_slots(cw, s), instream, tables,
        width=1280, height=720)["valid"].sum())
    jax.block_until_ready(f(quads, slot))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = f(quads, slot)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"project+cull 131k quads: {dt*1e3:.3f} ms "
          f"({m/dt/1e9:.2f} Gquad/s, {m*4/dt/1e9:.2f} Gcorner/s)")

    # device meshing throughput
    chunks = [Chunk.generate_terrain((x, 0, z)) for x in range(4) for z in range(4)]
    varied = [c for c in chunks if not c.is_uniform]
    bbp = {tuple(c.position): c.dense() for c in varied}
    planes = MJ.neighbor_planes_from_batch(bbp, [c.position for c in varied])
    batch = jnp.asarray(np.stack([c.dense() for c in varied]))
    planes = jnp.asarray(planes)
    g = jax.jit(lambda b, p: MJ.mesh_chunks_device(b, p, max_steps=64, qcap=4096)[1].sum())
    jax.block_until_ready(g(batch, planes))
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(batch, planes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"device meshing {len(varied)} chunks: {dt*1e3:.3f} ms "
          f"({len(varied)/dt:,.0f} chunk/s)")

    # span-walker-style full frame (span mode) at 1920x1080
    for mode, w, h in (("span 1920x1080", 1920, 1080), ("exact 1280x720", 1280, 720)):
        cfg = RenderConfig(width=w, height=h, span_mode=mode.startswith("span"),
                           gather_cap=32768, quads_cap=16384, tile_k_cap=4096)
        r = Renderer(cfg)
        pool = np.zeros((32, 4096), np.uint32)
        counts = np.zeros(32, np.int32)
        positions = np.zeros((32, 3), np.int32)
        slot_i = 0
        for c in varied[:16]:
            q = mesh_chunk(c, varied)
            if q is None:
                continue
            k = min(len(q), 4096)
            pool[slot_i, :k] = q[:k]
            counts[slot_i] = k
            positions[slot_i] = c.position
            slot_i += 1
        k = 20
        rep = make_repeated_step(r, k)
        vps = np.repeat(cam.view_projection_matrix()[None], k, 0).astype(np.float32)
        cams = np.repeat(cam.position[None], k, 0).astype(np.float32)
        cams += np.random.default_rng(0).normal(0, 0.01, cams.shape).astype(np.float32)
        vis = np.zeros(cfg.visible_chunks_cap, np.int32)
        vis[:slot_i] = np.arange(slot_i)
        counts_sel = np.zeros(cfg.visible_chunks_cap, np.int32)
        counts_sel[:slot_i] = counts[:slot_i]
        positions_sel = np.zeros((cfg.visible_chunks_cap, 3), np.int32)
        positions_sel[:slot_i] = positions[:slot_i]
        quads_s, quad_world, total = r.prepare_uploads(
            jnp.asarray(pool), vis, counts_sel, positions_sel)
        args = (quads_s, quad_world, total,
                jnp.asarray(vps), jnp.asarray(cams))
        out = jax.block_until_ready(rep(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(rep(*args))
        dt = (time.perf_counter() - t0) / k
        print(f"frame ({mode}, {slot_i} chunks): {dt*1e3:.3f} ms "
              f"({1/dt:,.0f} FPS)")


def bench_rendering():
    """The reference's `rendering` criterion group (benches/rendering.rs):
    single chunk, framebuffer ops, 3x3x3 world."""
    import jax
    import jax.numpy as jnp

    from differential_projection_voxel_renderer_tpu.meshing.greedy import (
        mesh_chunk,
    )
    from differential_projection_voxel_renderer_tpu.models.camera import Camera
    from differential_projection_voxel_renderer_tpu.models.chunk import Chunk
    from differential_projection_voxel_renderer_tpu.rendering.framebuffer import (
        Framebuffer,
    )
    from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
        Renderer,
    )
    from differential_projection_voxel_renderer_tpu.utils.config import (
        RenderConfig,
    )

    print(f"== rendering ({jax.default_backend()}) ==")
    fb = Framebuffer(1280, 720)
    timeit("framebuffer clear (host)", lambda: fb.clear(), n=20)

    def frame(chunks, w, h, name, vcap=32):
        cfg = RenderConfig(width=w, height=h, gather_cap=8192,
                           quads_cap=4096, tile_k_cap=4096,
                           visible_chunks_cap=vcap)
        r = Renderer(cfg)
        pool = np.zeros((vcap, 4096), np.uint32)
        counts = np.zeros(vcap, np.int32)
        pos = np.zeros((vcap, 3), np.int32)
        vis = np.zeros(vcap, np.int32)
        for i, c in enumerate(chunks):
            q = mesh_chunk(c, chunks)
            if q is None:
                continue
            n = min(len(q), 4096)
            pool[i, :n] = q[:n]
            counts[i] = n
            pos[i] = c.position
            vis[i] = i
        cam = Camera(np.array([48.0, 56.0, 80.0], np.float32), w / h)
        cam.look_at(np.array([16.0, 16.0, 16.0], np.float32))
        up = r.prepare_uploads(jnp.asarray(pool), vis, counts, pos)
        out = r.render_prepared(up, cam.view_projection_matrix(),
                                cam.position)
        jax.block_until_ready(out[0])
        # device time with K frames inside ONE jit (per-dispatch syncs
        # through the relay would measure the tunnel, not the renderer)
        from differential_projection_voxel_renderer_tpu.rendering.pipeline import (
            make_repeated_step,
        )

        k = 20
        rep = make_repeated_step(r, k)
        rng = np.random.default_rng(0)
        cams = np.repeat(cam.position[None], k, 0).astype(np.float32)
        cams += rng.normal(0, 0.01, cams.shape).astype(np.float32)
        vps = np.repeat(cam.view_projection_matrix()[None], k,
                        0).astype(np.float32)
        quads_s, qw_s, tot = up
        args = (quads_s, qw_s, tot, jnp.asarray(vps), jnp.asarray(cams))
        jax.block_until_ready(rep(*args))
        t0 = time.perf_counter()
        jax.block_until_ready(rep(*args))
        loop_ms = (time.perf_counter() - t0) / k * 1000
        # async wall clock over k separate dispatches (the per-call
        # overhead amortizes inside one jit, so tiny scenes need both)
        vpj = cam.view_projection_matrix()
        out = r.render_prepared(up, vpj, cam.position)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = r.render_prepared(up, vpj, cam.position)
        jax.block_until_ready(out[0])
        disp_ms = (time.perf_counter() - t0) / k * 1000
        print(f"{name}: {loop_ms:.3f} ms/frame in-loop, "
              f"{disp_ms:.3f} ms/frame async-dispatched")

    frame([Chunk.generate_test_solid((0, 0, 0))], 256, 256,
          "single solid chunk frame 256x256")
    region = [Chunk.generate_terrain((x, y, z))
              for x in range(3) for y in range(1) for z in range(3)]
    frame(region, 1280, 720, "3x3 terrain world frame 1280x720")


def bench_microbench():
    """Funnel counters per voxel pattern — the reference's microbench
    (benches/microbench.rs:17-148: empty / full / checkerboard / sparse
    collect FUNCTION_COUNTERS snapshots)."""
    import os

    os.environ["DPVR_PROFILING"] = "1"
    import importlib

    from differential_projection_voxel_renderer_tpu.utils import profiling
    importlib.reload(profiling)
    from differential_projection_voxel_renderer_tpu.meshing.greedy import (
        mesh_chunk,
    )
    from differential_projection_voxel_renderer_tpu.models.chunk import Chunk

    print("== microbench (funnel counters per pattern) ==")
    rng = np.random.default_rng(0)
    xyz = np.indices((32, 32, 32)).sum(0)
    patterns = {
        "empty": np.zeros((32, 32, 32), np.uint8),
        "full": np.full((32, 32, 32), 3, np.uint8),
        "checkerboard": ((xyz % 2) * 2).astype(np.uint8),
        "sparse": np.where(rng.random((32, 32, 32)) < 0.05, 1, 0).astype(np.uint8),
    }
    for name, blocks in patterns.items():
        c = Chunk.varied((0, 0, 0), blocks)
        t0 = time.perf_counter()
        q = mesh_chunk(c)
        dt = (time.perf_counter() - t0) * 1000
        nq = 0 if q is None else len(q)
        print(f"{name:13s}: {nq:6d} quads  {dt:7.3f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="include device (TPU/CPU-jnp) benches")
    a = ap.parse_args()
    bench_meshing()
    bench_world()
    bench_microbench()
    bench_rendering()
    if a.device:
        bench_device()