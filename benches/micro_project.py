"""Micro-profile of project_and_cull sub-stages on real TPU.

Same loop discipline as profile_stages.py (k iterations in ONE jit with
per-iteration camera jitter, tiny probe output).  Run after profile_stages
has cached the vd12 scene.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.profile_stages import get_scene, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from differential_projection_voxel_renderer_tpu.ops import projection as P

    k = int(os.environ.get("PROF_K", "30"))
    quads_np, quad_world_np, total, vp, cam = get_scene()
    gq_env = int(os.environ.get("PROF_GQ", "0"))
    if gq_env:
        quads_np = quads_np[:gq_env]
        quad_world_np = quad_world_np[:, :gq_env]
        total = min(total, gq_env)
    GQ = quads_np.shape[0]
    W, H = 1280, 720
    log(f"scene: {total} quads (cap {GQ}), backend {jax.default_backend()}")

    quads = jnp.asarray(quads_np)
    qw = jnp.asarray(quad_world_np)
    rng = np.random.default_rng(0)
    cams = np.repeat(cam[None], k, 0).astype(np.float32)
    cams += rng.normal(0, 0.01, cams.shape).astype(np.float32)
    vps = np.repeat(vp[None], k, 0).astype(np.float32)
    vps[:, 3, :] += rng.normal(0, 1e-6, (k, 4)).astype(np.float32)
    vps_d, cams_d = jnp.asarray(vps), jnp.asarray(cams)
    in_stream = jnp.arange(GQ, dtype=jnp.int32) < total

    def loop(body):
        def run(vps, cams):
            def it(i, acc):
                return acc + body(vps[i], cams[i])
            return jax.lax.fori_loop(0, k, it, jnp.zeros((), jnp.float32))
        return jax.jit(run)

    def timeit(fn, label):
        f = loop(fn)
        jax.block_until_ready(f(vps_d, cams_d))
        t0 = time.time()
        jax.block_until_ready(f(vps_d, cams_d))
        ms = (time.time() - t0) / k * 1000
        log(f"{label:>12}: {ms:.3f} ms")
        return ms

    def sub(upto):
        def f(vp1, cam1):
            t = P.view_tables(vp1, cam1)
            dec = P.decode_quads(quads)
            if upto == "decode":
                return (dec["u0"].sum() + dec["axis_pos"].sum()
                        + dec["face"].sum()).astype(jnp.float32)
            basis = P._Basis(dec, (qw[0], qw[1], qw[2]), t.view_proj)
            if upto == "basis":
                return sum(x.sum() for x in basis.o + basis.t + basis.b
                           ).astype(jnp.float32)
            u0, u1, v0, v1 = dec["u0"], dec["u1"], dec["v0"], dec["v1"]
            corners_uv = ((u0, v0), (u1, v0), (u0, v1), (u1, v1))
            ws = [basis.corner(u, v, 3) for (u, v) in corners_uv]
            if upto == "ws":
                return sum(w.sum() for w in ws).astype(jnp.float32)
            invs = [1.0 / jnp.where(jnp.abs(w) > 1e-30, w, 1e-30) for w in ws]
            if upto == "invs":
                return sum(w.sum() for w in invs).astype(jnp.float32)
            acc = jnp.float32(0)
            for r in range(3):
                ns = [basis.corner(u, v, r) * inv
                      for (u, v), inv in zip(corners_uv, invs)]
                acc += sum(n.sum() for n in ns)
            if upto == "ndc":
                return acc.astype(jnp.float32)
            raise ValueError(upto)
        return f

    for st in ("decode", "basis", "ws", "invs", "ndc"):
        timeit(sub(st), st)

    def full(vp1, cam1):
        t = P.view_tables(vp1, cam1)
        pr = P.project_and_cull(quads, (qw[0], qw[1], qw[2]), in_stream, t,
                                width=W, height=H)
        return (pr["valid"].sum() + pr["bb_x0"].sum()
                + pr["depth_near"].sum()).astype(jnp.float32)

    timeit(full, "project")


if __name__ == "__main__":
    main()
