"""Probe Mosaic/Pallas TPU capabilities that gate the round-2 kernel design:

1. vector->scalar reduction used in pl.when / scalar arithmetic (no DMA)
2. dynamic_slice (pl.ds) with an index derived from a vector reduction
3. scalar fori_loop iteration rate (gate overhead per cluster)
4. per-lane dynamic gather (jnp.take) from a VMEM table
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=20):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return dt


# --- 1. vector -> scalar reduction feeding pl.when --------------------------
def k_reduce_when(x_ref, o_ref):
    x = x_ref[:]
    m = jnp.min(x)          # scalar from (8,128) vector

    @pl.when(m < 0.5)
    def _():
        o_ref[:] = x * 2.0

    @pl.when(m >= 0.5)
    def _():
        o_ref[:] = x


def probe1():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) / 1024.0
    f = pl.pallas_call(k_reduce_when,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    try:
        r = jax.jit(f)(x)
        ok = np.allclose(np.asarray(r), np.asarray(x) * 2.0)
        print(f"1. vector->scalar min + pl.when: OK, correct={ok}")
    except Exception as e:
        print(f"1. vector->scalar min + pl.when: FAILED {type(e).__name__}: {str(e)[:200]}")


# --- 2. dynamic slice with reduced-vector index ------------------------------
def k_argmin_ds(x_ref, tbl_ref, o_ref):
    x = x_ref[:]
    i = jnp.argmin(x[0, :])          # scalar index from vector
    o_ref[:] = tbl_ref[pl.ds(i, 8), :]


def probe2():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    tbl = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    f = pl.pallas_call(k_argmin_ds,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    try:
        r = jax.jit(f)(x, tbl)
        ok = np.allclose(np.asarray(r), np.asarray(tbl[:8]))
        print(f"2. argmin -> pl.ds dynamic slice: OK, correct={ok}")
    except Exception as e:
        print(f"2. argmin -> pl.ds: FAILED {type(e).__name__}: {str(e)[:200]}")


# --- 3. scalar loop rate ------------------------------------------------------
def k_scalar_loop(n, x_ref, o_ref, acc):
    acc[0, 0] = jnp.float32(0.0)

    def body(i, s):
        return s + jnp.float32(1.0)

    s = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    o_ref[:] = x_ref[:] + s


def probe3():
    x = jnp.zeros((8, 128), jnp.float32)
    for n in (1000, 100000):
        f = pl.pallas_call(functools.partial(k_scalar_loop, n),
                           out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                           scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)])
        dt = timeit(f"3. scalar fori_loop n={n}", jax.jit(f), x)
        if dt:
            print(f"   -> {dt/n*1e9:.1f} ns/iter")


# --- 3b. scalar loop with vector op + reduction gate each iter ---------------
def k_gate_loop(n, x_ref, tbl_ref, o_ref):
    def body(i, best):
        row = tbl_ref[pl.ds(jax.lax.rem(i, 256), 8), :]
        m = jnp.min(row * x_ref[:])

        def then():
            return jnp.minimum(best, m)
        return jax.lax.cond(m < best, then, lambda: best)

    s = jax.lax.fori_loop(0, n, body, jnp.float32(1e30))
    o_ref[:] = x_ref[:] + s


def probe3b():
    x = jnp.ones((8, 128), jnp.float32)
    tbl = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    n = 10000
    f = pl.pallas_call(functools.partial(k_gate_loop, n),
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    dt = timeit(f"3b. gated loop w/ vreduce n={n}", jax.jit(f), x, tbl)
    if dt:
        print(f"   -> {dt/n*1e9:.1f} ns/iter (vector load+mul+min+cond)")


# --- 4. per-lane gather -------------------------------------------------------
def k_gather(tbl_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)


def probe4():
    tbl = jnp.arange(512, dtype=jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 512, (8, 128)), jnp.int32)
    f = pl.pallas_call(k_gather,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    try:
        r = jax.jit(f)(tbl, idx)
        ok = np.allclose(np.asarray(r), np.asarray(tbl)[np.asarray(idx)])
        print(f"4. per-lane jnp.take in kernel: OK correct={ok}")
        timeit("4. per-lane take timing", jax.jit(f), tbl, idx, n=50)
    except Exception as e:
        print(f"4. per-lane jnp.take: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    probe1()
    probe2()
    probe3()
    probe3b()
    probe4()
