"""Isolated device cost of body_maxpool2 fwd and fwd+bwd at the flagship
scale shapes (bs=16, bf16), via device-trace timing.

Run on the real chip:  python scripts/exp_pool_cost.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from ktime import device_ms

    from msau_tpu.models.flat_layers import make_scale_geoms
    from msau_tpu.ops.flatconv import body_maxpool2, to_body

    geoms = make_scale_geoms(512, 512, 4, itemsize=2)
    rng = np.random.default_rng(0)
    n = 16
    for s in range(3):
        gi, go = geoms[s], geoms[s + 1]
        c = 8 * 2 ** s
        x4 = jnp.asarray(rng.random((n, c, gi.H, gi.W), np.float32),
                         jnp.bfloat16)
        xb = to_body(x4, gi)
        xb = jax.block_until_ready(xb)

        fwd = jax.jit(lambda x: body_maxpool2(x, gi, go))

        def loss(x):
            return jnp.sum(body_maxpool2(x, gi, go).astype(jnp.float32) ** 2)

        both = jax.jit(jax.grad(loss))
        f = device_ms(fwd, xb, iters=10)
        fb = device_ms(both, xb, iters=10)
        print(f"scale {s}: {gi.H}^2 c={c}  fwd {f:.2f} ms  "
              f"fwd+bwd {fb:.2f} ms")


if __name__ == "__main__":
    main()
