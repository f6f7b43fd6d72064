#!/usr/bin/env python
"""Measure this chip's achievable HBM bandwidth (the ceiling the decode
rows in tools/bench_matrix.py report against).

Method: time ``y = x * scale + shift`` over a large f32 array inside one
jit'd fori_loop (read N bytes + write N bytes per iteration, no reuse —
a pure stream), difference method (t(2n)-t(n))/n with min-of-repeats to
cancel dispatch + tunnel RTT, same as tools/bench_matrix.py.  The copy is
carried through the loop so XLA cannot elide any iteration.

Run: ``python tools/measure_hbm.py [size_mb]`` (default 512 MB).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_elems = size_mb * 1024 * 1024 // 4
    x = jnp.arange(n_elems, dtype=jnp.float32) * 1e-9
    print(f"device: {jax.devices()[0]}  array: {size_mb} MB f32", flush=True)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(n, x):
        def body(i, x):
            # scale/shift depend on the loop counter so every iteration is
            # a fresh full-array read+write (no CSE across iterations).
            return x * (1.0 + 1e-12 * i.astype(jnp.float32)) + 1e-30
        return jax.lax.fori_loop(0, n, body, x)

    def fetch(out):
        np.asarray(jnp.ravel(out)[:1])

    iters = 20
    fetch(run(iters, x))
    fetch(run(2 * iters, x))
    t1s, t2s = [], []
    for _ in range(7):
        t0 = time.perf_counter(); fetch(run(iters, x))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(run(2 * iters, x))
        t2s.append(time.perf_counter() - t0)
    per_iter = (min(t2s) - min(t1s)) / iters
    bytes_per_iter = 2 * n_elems * 4  # read + write
    gbps = bytes_per_iter / per_iter / 1e9
    print(json.dumps({"per_iter_ms": round(per_iter * 1e3, 3),
                      "bytes_per_iter": bytes_per_iter,
                      "achieved_gbps": round(gbps, 1)}), flush=True)


if __name__ == "__main__":
    main()
