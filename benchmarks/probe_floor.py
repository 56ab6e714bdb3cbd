"""What IS the 18.4 ms 'base' floor? Decompose it.

profile_serving's `base` variant (every stage prof_skip'd) still costs
18.4 ms/batch at Q=512 in the pipelined loop — 36% of the full kernel's
50.8 ms. This probe separates:

  noop       jit(plan -> plan.sum()) — launch + tiny upload/download only
  mix        the mix fori_loop alone (the only real work `base` keeps)
  base Q=128/256/512   does the floor scale with Q?
  pipelined vs sync    does the relay overlap queued launches at all?

Run on the real TPU:  python benchmarks/probe_floor.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(tag, fn, args, iters=40, depth=8):
    # sync
    fn(*args)  # warm
    outs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        outs.append(jax.device_get(fn(*args)))
    sync = (time.perf_counter() - t0) / iters * 1000
    # pipelined
    window = []
    t0 = time.perf_counter()
    for _ in range(iters + depth):
        window.append(fn(*args))
        if len(window) > depth:
            jax.device_get(window.pop(0))
    while window:
        jax.device_get(window.pop(0))
    pipe = (time.perf_counter() - t0) / (iters + depth) * 1000
    print(f"{tag:28s} sync {sync:7.2f} ms   pipelined {pipe:7.2f} ms")


def main():
    T = 4
    plan512 = jnp.asarray(np.zeros((7, 512, T), np.int32))

    @jax.jit
    def noop(p):
        return p.sum()

    timed("noop (plan->scalar)", noop, (plan512,))

    @jax.jit
    def noop_packed(p):
        # same output shape as the real kernel: [Q, 2K+2]
        q = p.shape[1]
        return jnp.zeros((q, 22), jnp.float32) + p[0, 0, 0]

    timed("noop + [Q,22] download", noop_packed, (plan512,))

    # the mix loop alone (base's only real compute), compact U=384
    from jax import lax

    def mix_only(p, U):
        sid = p[4]
        weights = lax.bitcast_convert_type(p[5], jnp.float32)
        Q = p.shape[1]
        iota_u = lax.broadcasted_iota(jnp.int32, (1, U), 1)

        def step(t, m):
            sc_t = lax.dynamic_index_in_dim(sid, t, axis=1, keepdims=True)
            w_t = lax.dynamic_index_in_dim(weights, t, axis=1, keepdims=True)
            return m + jnp.where(sc_t == iota_u, w_t, jnp.float32(0.0))

        mix = lax.fori_loop(0, T, step, jnp.zeros((Q, U), jnp.float32))
        return mix.sum(axis=1)

    mixj = jax.jit(mix_only, static_argnames=("U",))
    timed("mix fori (U=384)", lambda p: mixj(p, U=384), (plan512,))

    # base floor vs Q — needs the real corpus tables; reuse profile_serving's
    # kernel with everything skipped but WITHOUT the heavy tables resident
    # (zeros of the right shape keep HBM pressure comparable for dispatch).
    for q in (128, 256, 512):
        plan = jnp.asarray(np.zeros((7, q, T), np.int32))
        timed(f"noop+download Q={q}", noop_packed, (plan,))


if __name__ == "__main__":
    main()
