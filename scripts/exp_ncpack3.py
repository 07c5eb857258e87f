"""Probe WHY every lane-packed variant lands at ~1.7 ms (exp_ncpack2.py):
scale the work inside the kernel and see what the time tracks.

  E1/E3/E9: dot-floor kernel with 1/3/9 dots per block (same Element
            window loads).  If time ~flat, it's overhead/DMA-bound; if
            ~linear in dots, it's MXU-throughput-bound at N=128.
  G1/G9:    same but standard Blocked specs, no Element window overlap
            (input rows = TW exactly) — isolates Element-window cost.
  W128/256/512: one dot per block with output width N — probes the
            v5e MXU N-width law ([2048,128]x[128,N], block-diag-style).
  XLA peak: [16384,2048]x[2048,2048] chained — chip matmul ceiling.

Run solo on the chip:  python scripts/exp_ncpack3.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    HW, Wp, L = 512, 514, 128
    TH = 4
    TW = TH * Wp            # 2056
    G2 = -(-(Wp + 9) // 8) * 8
    n_blk = HW // TH        # 128
    win = -(-((TH + 2) * Wp + 16) // 8) * 8
    rows = HW * Wp

    key = jax.random.PRNGKey(0)
    xp = jax.random.normal(key, (rows, L), jnp.bfloat16)
    xg = jnp.pad(xp, ((G2, G2), (0, 0)))

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    def run_elem(ndot):
        wts = jax.random.normal(key, (9 * L, L), jnp.bfloat16) * 0.1

        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((TW, L), jnp.float32)
            for t in range(ndot):
                acc = acc + jax.lax.dot_general(
                    x_ref[G2: G2 + TW, :],
                    w_ref[t * 128: (t + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

        def conv(xg):
            return pl.pallas_call(
                kernel,
                grid=(n_blk,),
                in_specs=[
                    pl.BlockSpec((pl.Element(win), pl.Element(L)),
                                 lambda bi: (bi * TW, 0)),
                    pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TW, L), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, L), jnp.bfloat16),
            )(xg, wts)

        @jax.jit
        def chain(xg):
            y = xg
            for _ in range(20):
                y = jnp.pad(conv(y), ((G2, G2), (0, 0)))
            return y

        return timeit(chain, xg) / 20 * 1e3

    for nd in (1, 3, 9):
        results[f"E{nd}  elem-window, {nd} dots"] = run_elem(nd)

    def run_blocked(ndot):
        wts = jax.random.normal(key, (9 * L, L), jnp.bfloat16) * 0.1
        TWB = 2048
        nb = rows // TWB + (1 if rows % TWB else 0)
        rows_pad = nb * TWB

        def kernel(x_ref, w_ref, o_ref):
            acc = jnp.zeros((TWB, L), jnp.float32)
            for t in range(ndot):
                acc = acc + jax.lax.dot_general(
                    x_ref[:], w_ref[t * 128: (t + 1) * 128, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

        def conv(xq):
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((TWB, L), lambda bi: (bi, 0)),
                    pl.BlockSpec((9 * 128, 128), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TWB, L), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((rows_pad, L), jnp.bfloat16),
            )(xq, wts)

        xq = jnp.pad(xp, ((0, rows_pad - rows), (0, 0)))

        @jax.jit
        def chain(xq):
            y = xq
            for _ in range(20):
                y = conv(y)
            return y

        return timeit(chain, xq) / 20 * 1e3

    for nd in (1, 9):
        results[f"G{nd}  blocked, {nd} dots"] = run_blocked(nd)

    def run_width(NW):
        wts = jax.random.normal(key, (L, NW), jnp.bfloat16) * 0.1
        TWB = 2048
        nb = rows // TWB

        def kernel(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        def conv(xq):
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((TWB, L), lambda bi: (bi, 0)),
                    pl.BlockSpec((L, NW), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TWB, NW), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((nb * TWB, NW), jnp.bfloat16),
            )(xq, wts)

        xq = xp[: nb * TWB]

        @jax.jit
        def chain(xq):
            for _ in range(20):
                y = conv(xq)
            return y

        t = timeit(chain, xq) / 20 * 1e3
        fl = nb * TWB * L * NW * 2 / (t / 1e3) / 1e12
        return t, fl

    for NW in (128, 256, 512):
        t, fl = run_width(NW)
        results[f"W{NW} one [2048,128]x[128,{NW}] dot/blk"] = \
            f"{t:8.3f}  ({fl:.1f} TFLOP/s)"

    a = jax.random.normal(key, (16384, 2048), jnp.bfloat16)
    bm = jax.random.normal(key, (2048, 2048), jnp.bfloat16)

    @jax.jit
    def peak(a, bm):
        y = a
        for _ in range(10):
            y = jnp.dot(y, bm)
        return y

    t = timeit(peak, a, bm) / 10 * 1e3
    fl = 16384 * 2048 * 2048 * 2 / (t / 1e3) / 1e12
    results["XLA [16384,2048]x[2048,2048]"] = f"{t:8.3f}  ({fl:.1f} TFLOP/s)"

    for k, v in results.items():
        if isinstance(v, float):
            print(f"{k:40s} {v:8.3f}")
        else:
            print(f"{k:40s} {v}")


if __name__ == "__main__":
    main()
