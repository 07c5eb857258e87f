"""Device-time the resident attention kernel vs einsum at the flagship
deepest-scale shape (bs=16, T=4096, Cb=8, C=64, bf16), sweeping the
i-block size.

Run on the real chip:  python scripts/exp_attn_resident.py
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

    import msau_tpu.ops.pallas_attn as pa
    from msau_tpu.models.attention import self_attention_xla

    rng = np.random.default_rng(0)
    n, t, cb, c = 16, 4096, 8, 64
    f = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((n, t, cb)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((n, t, c)), jnp.bfloat16)

    def bench(name, fn):
        fwd = jax.jit(fn)

        def loss(f, g, h):
            return jnp.sum(fn(f, g, h).astype(jnp.float32) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        tf_ = device_ms(fwd, f, g, h, iters=10)
        tb = device_ms(bwd, f, g, h, iters=10)
        print(f"{name:24s} fwd {tf_:6.2f} ms   fwd+bwd {tb:6.2f} ms",
              flush=True)

    bench("einsum", self_attention_xla)
    orig = pa._res_block_i
    for cap_f, cap_b in ((512, 128), (256, 128), (128, 128), (256, 256),
                         (512, 256)):
        pa._res_block_i = (lambda cf, cbk: (
            lambda t_, c_, cap=256, live=3:
            min(cf if live == 2 else cbk, t_)))(cap_f, cap_b)
        bench(f"resident fwd{cap_f}/bwd{cap_b}",
              lambda f, g, h: pa.resident_attention(f, g, h))
    pa._res_block_i = orig


if __name__ == "__main__":
    main()
