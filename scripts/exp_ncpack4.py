"""Confirm the ~12us per-grid-step fixed cost seen in exp_ncpack3.py:
same total data ([263168,128] bf16 x [128,128] matmul, chained 20x in
one jit), different grid-step counts.  Plus the XLA non-Pallas version.

Run solo on the chip:  python scripts/exp_ncpack4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    L = 128
    rows = 262144  # 2^18: divisible by all tested block sizes

    key = jax.random.PRNGKey(0)
    xp = jax.random.normal(key, (rows, L), jnp.bfloat16)
    wts = jax.random.normal(key, (L, L), jnp.bfloat16) * 0.1

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def run(TWB):
        nb = rows // TWB

        def kernel(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        def mm(xq):
            return pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((TWB, L), lambda bi: (bi, 0)),
                    pl.BlockSpec((L, L), lambda bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TWB, L), lambda bi: (bi, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, L), jnp.bfloat16),
            )(xq, wts)

        @jax.jit
        def chain(xq):
            y = xq
            for _ in range(20):
                y = mm(y)
            return y

        t = timeit(chain, xp) / 20 * 1e3
        gb = rows * L * 2 * 2 / 1e9
        print(f"pallas TWB={TWB:6d} nb={nb:4d}: {t:7.3f} ms "
              f"({gb / (t / 1e3):6.1f} GB/s, {t * 1e3 / nb:6.2f} us/step)")

    for TWB in (1024, 2048, 4096, 8192):
        run(TWB)

    @jax.jit
    def chain_xla(xq):
        y = xq
        for _ in range(20):
            y = jnp.dot(y, wts)
        return y

    t = timeit(chain_xla, xp) / 20 * 1e3
    gb = rows * L * 2 * 2 / 1e9
    print(f"XLA jnp.dot              : {t:7.3f} ms ({gb / (t / 1e3):6.1f} GB/s)")

    @jax.jit
    def chain_add(xq):
        y = xq
        for _ in range(20):
            y = y + 1.0
        return y

    t = timeit(chain_add, xp) / 20 * 1e3
    print(f"XLA y+1 (pure HBM stream): {t:7.3f} ms ({gb / (t / 1e3):6.1f} GB/s)")


if __name__ == "__main__":
    main()
