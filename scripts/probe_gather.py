"""Probe per-lane dynamic gather forms in Pallas TPU.

For per-ray BVH traversal each lane needs: val[s, l] = table[idx[s, l], l]
(take_along_axis over sublanes) or a lane-transposed variant.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt*1e6:9.1f} us", flush=True)
    return out


def try_kernel(name, kernel, out_shape, *args, check=None, n=50):
    f = jax.jit(pl.pallas_call(kernel, out_shape=out_shape))
    try:
        r = f(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    ok = "" if check is None else f" correct={bool(check(np.asarray(r)))}"
    print(f"{name:56s} OK{ok}", flush=True)
    timeit("   timing", f, *args, n=n)
    return r


def main():
    N = 4096
    tbl = jnp.asarray(np.random.default_rng(0).random((N, 128), np.float32))
    idx8 = jnp.asarray(np.random.default_rng(1).integers(0, N, (8, 128)), jnp.int32)
    tbl_np, idx_np = np.asarray(tbl), np.asarray(idx8)

    # A: take_along_axis over axis 0 (sublane gather)
    def kA(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    try_kernel("A take_along_axis axis=0 (4096,128) idx (8,128)", kA,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl, idx8,
               check=lambda r: np.allclose(
                   r, np.take_along_axis(tbl_np, idx_np, axis=0)))

    # B: same but bigger idx block (128,128)
    idx128 = jnp.asarray(np.random.default_rng(2).integers(0, N, (128, 128)), jnp.int32)
    def kB(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    try_kernel("B take_along_axis axis=0 idx (128,128)", kB,
               jax.ShapeDtypeStruct((128, 128), jnp.float32), tbl, idx128,
               check=lambda r: np.allclose(
                   r, np.take_along_axis(tbl_np, np.asarray(idx128), axis=0)))

    # C: lane gather: table (8, 512) gathered along lanes with idx (8, 128)
    tblL = jnp.asarray(np.random.default_rng(3).random((8, 512), np.float32))
    idxL = jnp.asarray(np.random.default_rng(4).integers(0, 512, (8, 128)), jnp.int32)
    def kC(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    try_kernel("C take_along_axis axis=1 (8,512) idx (8,128)", kC,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tblL, idxL,
               check=lambda r: np.allclose(
                   r, np.take_along_axis(np.asarray(tblL), np.asarray(idxL), axis=1)))

    # D: XLA-level (non-pallas) take_along_axis same shapes for comparison
    f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
    r = f(tbl, idx128)
    print("D XLA take_along_axis (4096,128)/(128,128): OK", flush=True)
    timeit("   timing", f, tbl, idx128)

    # E: in-kernel loop of 32 dependent gathers (8,128) — traversal-like chain
    def kE(t_ref, i_ref, o_ref):
        idx = i_ref[:]
        acc = jnp.zeros((8, 128), jnp.float32)
        def body(s, carry):
            idx, acc = carry
            v = jnp.take_along_axis(t_ref[:], idx, axis=0)
            acc = acc + v
            idx = jnp.asarray(v * 1024.0, jnp.int32) % N
            return idx, acc
        idx, acc = jax.lax.fori_loop(0, 32, body, (idx, acc))
        o_ref[:] = acc
    try_kernel("E chain of 32 dependent sublane gathers", kE,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl, idx8, n=20)


if __name__ == "__main__":
    main()
