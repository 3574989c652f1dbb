"""Sort-shape microbench: is a batched [B, N/B] sort + bitonic merge
cheaper than one flat [N] sort on TPU?

The mid-stage sorts (compaction 131072, binning 262144 uint32 keys) are
~0.4 ms of the frame.  XLA's TPU sort cost scales with the bitonic
network depth O(log^2 N) on the FULL length; a [B, N/B] batched sort runs
the network on N/B-long rows (the batch rides the vector lanes), and the
final merge of B sorted rows is only the last log(N) bitonic-merge
stages, expressible in jnp as reshape + minimum/maximum passes.

Usage: python benches/micro_sort.py  (TPU; one JSON line per case)
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


def bitonic_merge_pow2(x):
    """Merge a bitonically-ordered [N] uint32 array into sorted order.

    Precondition: x is a bitonic sequence (e.g. concat of an ascending
    and a descending run).  log2(N) compare-exchange passes, each a
    reshape + minimum/maximum on halves."""
    n = x.shape[0]
    span = n // 2
    while span >= 1:
        v = x.reshape(-1, 2, span)
        lo = np.minimum if isinstance(x, np.ndarray) else jnp.minimum
        hi = np.maximum if isinstance(x, np.ndarray) else jnp.maximum
        a = lo(v[:, 0], v[:, 1])
        b = hi(v[:, 0], v[:, 1])
        x = jnp.concatenate([a[:, None], b[:, None]], 1).reshape(-1) \
            if not isinstance(x, np.ndarray) else \
            np.concatenate([a[:, None], b[:, None]], 1).reshape(-1)
        span //= 2
    return x


def merge_sorted_rows(rows):
    """[B, M] with each row ascending -> [B*M] ascending, by repeated
    two-way bitonic merges (reverse one side to form a bitonic input)."""
    b, m = rows.shape
    while b > 1:
        nxt = []
        for i in range(0, b, 2):
            asc = rows[i]
            desc = rows[i + 1][::-1]
            nxt.append(bitonic_merge_pow2(jnp.concatenate([asc, desc])))
        rows = jnp.stack(nxt)
        b //= 2
        m *= 2
    return rows[0]


def main():
    global jnp
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    rng = np.random.default_rng(0)
    k = 50

    def timeit(fn, x, label):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(x))  # compile
        t0 = time.time()
        out = jax.block_until_ready(f(x))
        ms = (time.time() - t0) / k * 1000
        log(f"{label:>28}: {ms:.4f} ms")
        print(json.dumps({"case": label, "ms": round(ms, 4)}), flush=True)
        return out

    for n in (131072, 262144):
        base = rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)

        # checksum must consume EVERY position of the sorted array or XLA
        # rewrites sort()[0] into a min-reduce (measured: "sorts" in 2.6 us)
        w = jnp.asarray(rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32))

        def flat(x):
            def body(i, acc):
                return acc + (jnp.sort(x + i) * w).sum()
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        timeit(flat, jnp.asarray(base), f"flat_sort_{n}")

        for b in (2, 4, 8):
            def batched(x, b=b):
                def body(i, acc):
                    rows = jnp.sort((x + i).reshape(b, n // b), axis=1)
                    return acc + (merge_sorted_rows(rows) * w).sum()
                return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

            out = timeit(batched, jnp.asarray(base),
                         f"batched_sort_{n}_b{b}")

        # correctness spot check (one shot, un-jitted path semantics)
        rows = jnp.sort(jnp.asarray(base).reshape(4, n // 4), axis=1)
        merged = np.asarray(merge_sorted_rows(rows))
        assert (merged == np.sort(base)).all(), f"merge wrong at n={n}"
        log(f"merge correctness OK at n={n}")


if __name__ == "__main__":
    main()
