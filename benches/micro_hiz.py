"""Micro-probe: cost of the temporal-occlusion pieces in isolation.

a) build_max_pyramid on a 720p depth buffer
b) quads_occluded_exact on a gather-cap-sized quad stream
c) both chained (as the temporal step runs them)

Usage: python benches/micro_hiz.py   (TPU; one JSON line per case)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from differential_projection_voxel_renderer_tpu.ops import hiz

    H, W, N = 720, 1280, 131072
    rng = np.random.default_rng(0)
    depth = rng.random((H, W)).astype(np.float32)
    x0 = rng.integers(0, W - 1, N)
    wdt = rng.integers(1, 16, N)
    y0 = rng.integers(0, H - 1, N)
    hgt = rng.integers(1, 8, N)
    bbx = (x0 | (np.minimum(x0 + wdt, W - 1) << 16)).astype(np.int32)
    bby = (y0 | (np.minimum(y0 + hgt, H - 1) << 16)).astype(np.int32)
    dn = rng.random(N).astype(np.float32)
    k = 50

    def timeit(fn, args, label):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        ms = (time.time() - t0) / k * 1000
        log(f"{label:>22}: {ms:.4f} ms")
        print(json.dumps({"case": label, "ms": round(ms, 4)}), flush=True)

    def pyr(d):
        def body(i, acc):
            l1 = hiz.build_max_pyramid(d + i * 1e-9)
            return acc + l1[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    timeit(pyr, (jnp.asarray(depth),), "build_max_pyramid")

    l1 = np.asarray(hiz.build_max_pyramid(jnp.asarray(depth)))

    def occ(l1v, bbxv, bbyv, dnv):
        def body(i, acc):
            o = hiz.quads_occluded_exact(l1v + i * 1e-9, bbxv, bbyv, dnv,
                                         height=H, width=W)
            return acc + o.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    timeit(occ, (jnp.asarray(l1), jnp.asarray(bbx), jnp.asarray(bby),
                 jnp.asarray(dn)), "quads_occluded_exact")

    def chain(d, bbxv, bbyv, dnv):
        def body(i, acc):
            l1v = hiz.build_max_pyramid(d + i * 1e-9)
            o = hiz.quads_occluded_exact(l1v, bbxv, bbyv, dnv,
                                         height=H, width=W)
            return acc + o.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    timeit(chain, (jnp.asarray(depth), jnp.asarray(bbx), jnp.asarray(bby),
                   jnp.asarray(dn)), "chained")


if __name__ == "__main__":
    main()
