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
  fused     — pipelined with geometry(i) fused INSIDE raster(i-1)'s
              Pallas call (ops/raster._fused_geom_pass): ONE taxed
              Pallas dispatch per frame instead of two

MEASURED (v5e, vd12, 45.8k-quad stream, 30 frames in one jit):
  base 3.695 / pipe 3.581 / pipedep 3.573 ms — explicit adjacency does
  NOT share the flat per-call stall in the real pipeline; the fused
  variant is the structural fix.

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

    # ---- wall-style variants: k SEPARATE async dispatches, blocked at
    # the end.
    # WARNING (measured, NOTES.md round 4): on this relay,
    # block_until_ready does NOT reliably force execution, and fetching
    # the last frame does not force unrelated earlier frames — the
    # INDEPENDENT-dispatch variants below (walla/d/e/f/g) therefore
    # measure dispatch-ACCEPTANCE rate (0.14-1.5 ms/frame), not device
    # throughput.  Only the CHAINED variants (wallb 3.786 / wallc 3.839
    # ms) are honest here; kept as the record of how the trap was found.
    # walla: device-resident cameras, independent dispatches [INVALID]
    # wallb: two chained dispatches per frame (geometry, then step)
    # wallc: pipelined chain (each dispatch consumes the previous pre)
    # walld: walla + fresh numpy camera H2D per frame [INVALID]
    # walle: walld through the packed-cam step [INVALID]
    # wallf/g: walla/walle + per-frame block_until_ready [INVALID —
    #          block_until_ready itself does not block]
    if variant in ("walla", "wallb", "wallc", "walld", "walle", "wallf",
                   "wallg"):
        import json as _json
        import time as _time

        stepj = jax.jit(step)
        geomj = jax.jit(geom)

        def pipej(qp, wp, np_, vpp, cpp, prep, vpc, cpc):
            c, d, s, pre = step(
                qp, wp, np_, vpp, cpp, pre_geom=prep,
                next_geom=(quads, qw, n_quads, vpc, cpc))
            return c, d, s, pre
        pipej = jax.jit(pipej)

        def prestep(qp, wp, np_, vp1, cam1, pre1):
            return step(qp, wp, np_, vp1, cam1, pre_geom=pre1)
        prestep = jax.jit(prestep)

        from differential_projection_voxel_renderer_tpu.rendering import (
            pipeline as PL2,
        )

        step_packed = jax.jit(functools.partial(
            PL2._step_camf, gather_cap=GQ, color_tables=tables,
            width=W, height=H, tile_h=16, tile_w=128, render_cap=RC,
            span_mode=False, backface_culling=True, use_pallas=True,
            interpret=False, tile_k_cap=TK))

        def one_pass():
            if variant == "walla":
                for i in range(k):
                    c, d, s = stepj(quads, qw, n_quads, vps_d[i], cams_d[i])
            elif variant == "wallf":
                outs = []
                for i in range(k):
                    c, d, s = stepj(quads, qw, n_quads, vps_d[i], cams_d[i])
                    outs.append(c)
                for o in outs:
                    jax.block_until_ready(o)
            elif variant == "wallg":
                outs = []
                for i in range(k):
                    camf = jnp.asarray(PL2._pack_cam(vps[i], cams[i]))
                    c, d, s = step_packed(quads, qw, n_quads, camf)
                    outs.append(c)
                for o in outs:
                    jax.block_until_ready(o)
            elif variant == "walld":
                for i in range(k):
                    vp1 = jnp.asarray(vps[i])        # fresh numpy -> H2D
                    cam1 = jnp.asarray(cams[i])
                    c, d, s = stepj(quads, qw, n_quads, vp1, cam1)
            elif variant == "walle":
                for i in range(k):
                    camf = jnp.asarray(PL2._pack_cam(vps[i], cams[i]))
                    c, d, s = step_packed(quads, qw, n_quads, camf)
            elif variant == "wallb":
                # two dispatches per frame: geometry, then mid+raster
                for i in range(k):
                    pre = geomj(vps_d[i], cams_d[i])
                    c, d, s = prestep(quads, qw, n_quads, vps_d[i],
                                      cams_d[i], pre)
            else:  # wallc: pipelined, one dispatch/frame, fused geometry
                pre = geomj(vps_d[0], cams_d[0])
                for i in range(1, k):
                    c, d, s, pre = pipej(quads, qw, n_quads,
                                         vps_d[i - 1], cams_d[i - 1],
                                         pre, vps_d[i], cams_d[i])
                c, d, s = prestep(quads, qw, n_quads, vps_d[k - 1],
                                  cams_d[k - 1], pre)
            return c

        jax.block_until_ready(one_pass())  # compile
        best = float("inf")
        for _ in range(3):
            t0 = _time.time()
            c = one_pass()
            jax.block_until_ready(c)
            best = min(best, (_time.time() - t0) / k * 1000)
        log(f"{variant}: {best:.3f} ms/frame (best of 3 wall passes)")
        print(_json.dumps({"stage": variant, "ms": round(best, 4)}),
              flush=True)
        return

    forced = variant == "pipedep"

    if variant == "fused":
        def run(vps, cams):
            pre0 = geom(vps[0], cams[0])

            def it(i, carry):
                pre_prev, acc = carry
                c, d, s, pre_cur = step(
                    quads, qw, n_quads, vps[i - 1], cams[i - 1],
                    pre_geom=pre_prev,
                    next_geom=(quads, qw, n_quads, vps[i], cams[i]))
                probe = (c[0, 0] + s[1]).astype(jnp.float32)
                return pre_cur, acc + probe

            pre_last, acc = jax.lax.fori_loop(1, k, it, (pre0, jnp.zeros(
                (), jnp.float32)))
            c, d, s = step(quads, qw, n_quads, vps[k - 1], cams[k - 1],
                           pre_geom=pre_last)
            return acc + (c[0, 0] + s[1]).astype(jnp.float32)

        timeit(jax.jit(run), (vps_d, cams_d), k, variant)
        return

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
