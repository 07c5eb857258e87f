"""Device-time einsum vs Pallas fused attention at the flagship deepest
scale (bs=16, T=4096, Cb=8, C=64, bf16), fwd and fwd+bwd.  The round-3
_PALLAS_MIN_TOKENS=8192 choice came from host-level step timing with
~25 ms RTT jitter; re-decide on device-trace numbers.

Run solo on the chip:  python scripts/exp_attn_devtime.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ktime import device_ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.models.attention import (self_attention_xla,
                                           self_attention_pallas)
    from msau_tpu.ops.pallas_attn import fused_attention

    n, t, cb, c = 16, 4096, 8, 64
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, t, cb), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (n, t, cb), jnp.bfloat16)
    h = jax.random.normal(jax.random.PRNGKey(2), (n, t, c), jnp.bfloat16)

    impls = {
        "einsum": self_attention_xla,
        "two-pass map": self_attention_pallas,
        "pallas fused": fused_attention,
    }
    for name, fn in impls.items():
        fwd = jax.jit(fn)
        tms = device_ms(fwd, f, g, h, iters=10)

        def loss(f, g, h, fn=fn):
            return jnp.sum(fn(f, g, h).astype(jnp.float32))

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        tg = device_ms(gr, f, g, h, iters=10)
        print(f"{name:14s} fwd {tms:7.3f} ms   fwd+bwd {tg:7.3f} ms")

    # numerics cross-check
    o0 = jax.jit(self_attention_xla)(f, g, h).astype(jnp.float32)
    for name in ("two-pass map", "pallas fused"):
        o1 = jax.jit(impls[name])(f, g, h).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(o1 - o0)) / (jnp.max(jnp.abs(o0)) + 1e-9))
        print(f"{name}: rel err vs einsum {err:.2e}")


if __name__ == "__main__":
    main()
