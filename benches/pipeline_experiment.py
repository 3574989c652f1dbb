"""Frames-in-flight experiment: software-pipelined render step vs serial.

The serial step is a latency chain (geometry Pallas -> mid XLA -> raster
Pallas); each input-bearing Pallas call pays a flat ~0.9 ms dispatch tax on
this relay toolchain, and chained Pallas calls were measured to share ONE
stall (NOTES.md round 2, benches/micro_fixed2.py y3).  This experiment
software-pipelines the frame loop by one stage: iteration i runs

    mid+raster(frame i-1)  from the CARRIED geometry outputs (pre_geom)
    geometry(frame i)      for the next iteration

so the two Pallas calls can sit adjacent in the schedule and share a stall,
and the mid XLA of frame i-1 can overlap the geometry kernel.  Variants:

  base      — the serial step (exactly bench.py's device measurement)
  pipe      — pipelined, scheduler free to place geometry anywhere
  pipedep   — pipelined + a zero-cost data dependency forcing
              geometry(i) AFTER raster(i-1) (adjacent Pallas calls)

All three render identical frames (pre_geom is the exact geometry output
the serial step computes internally; tested in tests/test_render.py).

Usage:  python benches/pipeline_experiment.py [base|pipe|pipedep ...]
One variant per PROCESS for honest numbers (in-process TPU use degrades
through the relay, NOTES.md): the default runs each in a subprocess.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_stages import get_scene, log, timeit  # noqa: E402


def run_variant(variant: str):
    import jax
    import jax.numpy as jnp

    from differential_projection_voxel_renderer_tpu.ops import (
        geometry_pallas as G,
    )
    from differential_projection_voxel_renderer_tpu.ops import projection as P
    from differential_projection_voxel_renderer_tpu.ops.shading import (
        build_quad_color_tables,
    )
    from differential_projection_voxel_renderer_tpu.ops.texture import (
        TextureAtlas,
    )
    from differential_projection_voxel_renderer_tpu.rendering import (
        pipeline as PL,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    k = int(os.environ.get("PROF_K", "30"))
    quads_np, quad_world_np, total, vp, cam = get_scene()
    log(f"scene: {total} quads (cap {quads_np.shape[0]}), "
        f"backend {jax.default_backend()}")
    tables = build_quad_color_tables(TextureAtlas().kernel_tables())

    W, H = 1280, 720
    GQ = quads_np.shape[0]
    RC = min(49152, GQ)
    TK = 98304
    quads = jnp.asarray(quads_np)
    qw = jnp.asarray(quad_world_np)
    n_quads = jnp.asarray(total, jnp.int32)
    rng = np.random.default_rng(0)
    cams = np.repeat(cam[None], k, 0).astype(np.float32)
    cams += rng.normal(0, 0.01, cams.shape).astype(np.float32)
    vps = np.repeat(vp[None], k, 0).astype(np.float32)
    vps[:, 3, :] += rng.normal(0, 1e-6, (k, 4)).astype(np.float32)
    vps_d, cams_d = jnp.asarray(vps), jnp.asarray(cams)

    step = functools.partial(
        PL._render_step, color_tables=tables, width=W, height=H,
        tile_h=16, tile_w=128, gather_cap=GQ, render_cap=RC,
        span_mode=False, backface_culling=True, use_pallas=True,
        interpret=False, tile_k_cap=TK)

    def geom(vp1, cam1, dep=None):
        t = P.view_tables(vp1, cam1)
        nq = n_quads if dep is None else n_quads + (dep & 0)
        ga = G.project_cull_pallas(
            quads, (qw[0], qw[1], qw[2]), nq, t.view_proj, t.cam_pos,
            width=W, height=H, backface_culling=True)
        return (ga["valid"], ga["bbx"], ga["bby"], ga["depth_near"],
                ga["subpixel"].sum().astype(jnp.int32))

    if variant == "base":
        def body(vp1, cam1):
            c, d, s = step(quads, qw, n_quads, vp1, cam1)
            return (c[0, 0] + s[1]).astype(jnp.float32)

        def run(vps, cams):
            def it(i, acc):
                return acc + body(vps[i], cams[i])
            return jax.lax.fori_loop(0, k, it, jnp.zeros((), jnp.float32))

        timeit(jax.jit(run), (vps_d, cams_d), k, variant)
        return

    forced = variant == "pipedep"

    def run(vps, cams):
        pre0 = geom(vps[0], cams[0])

        def it(i, carry):
            pre_prev, acc = carry
            c, d, s = step(quads, qw, n_quads, vps[i - 1], cams[i - 1],
                           pre_geom=pre_prev)
            probe = (c[0, 0] + s[1]).astype(jnp.float32)
            pre_cur = geom(vps[i], cams[i],
                           dep=c[0, 0] if forced else None)
            return pre_cur, acc + probe

        pre_last, acc = jax.lax.fori_loop(1, k, it, (pre0, jnp.zeros(
            (), jnp.float32)))
        c, d, s = step(quads, qw, n_quads, vps[k - 1], cams[k - 1],
                       pre_geom=pre_last)
        return acc + (c[0, 0] + s[1]).astype(jnp.float32)

    timeit(jax.jit(run), (vps_d, cams_d), k, variant)


def main():
    variants = sys.argv[1:] or ["base", "pipe", "pipedep"]
    if len(variants) == 1:
        run_variant(variants[0])
        return
    # fresh process per variant: sustained in-process TPU use degrades
    # relay throughput (NOTES.md), poisoning later variants
    for v in variants:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            print(line, flush=True)
        tail = out.stderr.strip().splitlines()
        for line in tail[-3:]:
            log(f"[{v}] {line}")
        if out.returncode:
            log(f"[{v}] FAILED rc={out.returncode}")


if __name__ == "__main__":
    main()
