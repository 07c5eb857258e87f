"""HBM effective-bandwidth law vs array geometry (exp_ncpack4.py found a
pure y+1 stream on [262144,128] bf16 runs at ~105 GB/s, ~1/8 of nominal).

Same total bytes (64 MiB) in different shapes/dtypes, chained y+1 20x in
one jit.  Run solo on the chip:  python scripts/exp_hbm_law.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    key = jax.random.PRNGKey(0)
    total = 1 << 25  # elements

    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        for lanes in (128, 256, 512, 1024, 4096, 16384):
            rows = total // lanes
            x = jax.random.normal(key, (rows, lanes), dtype)

            @jax.jit
            def chain(x):
                y = x
                for _ in range(20):
                    y = y + 1.0
                return y

            t = timeit(chain, x) / 20
            gb = rows * lanes * x.dtype.itemsize * 2 / 1e9
            print(f"{name} [{rows:7d},{lanes:6d}]  {t * 1e3:7.3f} ms  "
                  f"{gb / t:7.1f} GB/s")

    # 3-D shapes as the model uses them ([N, C, H*Wp] body form)
    for shape in ((16, 8, 262144), (16, 64, 32768), (128, 8, 32768),
                  (1, 128, 262144)):
        x = jax.random.normal(key, shape, jnp.bfloat16)

        @jax.jit
        def chain(x):
            y = x
            for _ in range(20):
                y = y + 1.0
            return y

        t = timeit(chain, x) / 20
        gb = x.size * 2 * 2 / 1e9
        print(f"bf16 {str(shape):20s} {t * 1e3:7.3f} ms  {gb / t:7.1f} GB/s")


if __name__ == "__main__":
    main()
