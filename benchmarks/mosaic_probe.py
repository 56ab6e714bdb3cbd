"""Probe Mosaic support for the ops the unified-v3 kernel needs.

Runs tiny kernels on the real TPU (fast compiles) and prints PASS/FAIL:
  1. NT dot_general: [Q,W] x [TILE,W] contracting ((1,),(1,))
  2. dynamic-offset [1,512] DMA row slice from an [NW,512] HBM ref
  3. sublane broadcast [1,W] -> [Q,W] compare vs iota
  4. reshape (4,128,Q)->(512,Q)  (fallback plan)
  5. transpose [1,128]->[128,1]  (fallback plan)
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextsearch_tpu.utils.compilecache import enable_compilation_cache
enable_compilation_cache()

Q, W, TILE = 128, 512, 1024


def probe(name, fn):
    try:
        out = fn()
        out = jax.device_get(out)
        print(f"PASS {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


# ---- 1. NT dot_general
def k1(a_ref, b_ref, o_ref):
    o_ref[:] = lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def t1():
    a = jnp.ones((Q, W), jnp.float32)
    b = jnp.ones((TILE, W), jnp.float32) * 2
    return pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((Q, TILE), jnp.float32),
    )(a, b)


# ---- 2. dynamic [1,512] DMA + in-kernel use
def k2(off_ref, e_ref, o_ref, w_ref, sem):
    i = off_ref[0]
    c = pltpu.make_async_copy(e_ref.at[pl.ds(i, 1), :], w_ref, sem)
    c.start()
    c.wait()
    o_ref[:] = jnp.broadcast_to(w_ref[:], o_ref.shape) * 2.0


def t2():
    e = jnp.arange(16 * 512, dtype=jnp.float32).reshape(16, 512)
    off = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        k2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 512), lambda i, off: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, 512), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(off, e)


# ---- 3. one-hot build via sublane broadcast + NT dot (the full window op)
def k3(wq_ref, wv_ref, wd_ref, o_ref):
    iq = lax.broadcasted_iota(jnp.int32, (Q, W), 0)
    idd = lax.broadcasted_iota(jnp.int32, (TILE, W), 0)
    p1 = jnp.where(wq_ref[:] == iq, wv_ref[:], jnp.float32(0.0))
    p2 = jnp.where(wd_ref[:] == idd, jnp.float32(1.0), jnp.float32(0.0))
    o_ref[:] = lax.dot_general(
        p1, p2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def t3():
    rng = np.random.default_rng(0)
    wq = jnp.asarray(rng.integers(0, Q, (1, W)), jnp.int32)
    wd = jnp.asarray(rng.integers(0, TILE, (1, W)), jnp.int32)
    wv = jnp.asarray(rng.uniform(0.5, 1.5, (1, W)), jnp.float32)
    out = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((Q, TILE), jnp.float32),
    )(wq, wv, wd)
    # verify vs numpy
    ref = np.zeros((Q, TILE), np.float32)
    np.add.at(ref, (np.asarray(wq)[0], np.asarray(wd)[0]), np.asarray(wv)[0])
    got = np.asarray(jax.device_get(out))
    assert np.allclose(ref, got, atol=1e-4), (ref.sum(), got.sum())
    return jnp.asarray([got.sum()])


# ---- 4. reshape (4,128,Q)->(512,Q)
def k4(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(512, Q)


def t4():
    a = jnp.ones((4, 128, Q), jnp.float32)
    return pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((512, Q), jnp.float32)
    )(a)


# ---- 5. transpose [1,128]->[128,1]
def k5(a_ref, o_ref):
    o_ref[:] = jnp.transpose(a_ref[:], (1, 0))


def t5():
    a = jnp.ones((1, 128), jnp.float32)
    return pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32)
    )(a)


r = {}
r["nt_dot"] = probe("1 NT dot_general", t1)
r["dyn_dma"] = probe("2 dynamic [1,512] DMA", t2)
r["window_op"] = probe("3 full window op (onehot+NTdot, checked)", t3)
r["reshape"] = probe("4 reshape (4,128,Q)->(512,Q)", t4)
r["transpose"] = probe("5 transpose [1,128]->[128,1]", t5)
print("SUMMARY:", r)
