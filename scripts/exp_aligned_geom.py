"""Aligned (Wp%128==0) vs classic flat-conv geometry, per flagship scale,
device-trace timing.  fwd and fwd+bwd (act+LRN fused epilogue), plus the
res-block composition from two convs.

Run solo on the chip:  python scripts/exp_aligned_geom.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ktime import device_ms


def aligned_geom(h, w, tile_cap=32):
    from msau_tpu.ops.flatconv import FlatGeom

    p = (-(-w // 128) * 128 + (128 if w % 128 == 0 else 0) - w) // 2
    wp = w + 2 * p
    assert wp % 128 == 0
    valid = [t for t in range(1, h + 1) if h % t == 0]
    capped = [t for t in valid if t <= tile_cap]
    return FlatGeom(h, w, p, max(capped))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.ops.flatconv import choose_geom, to_body, flat_conv2d

    n = 16
    for hw, cin in ((512, 8), (256, 16), (128, 32)):
        gc = choose_geom(hw, hw)
        ga = aligned_geom(hw, hw)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, cin, hw, hw), jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cin))
             * 0.3).astype(jnp.bfloat16)
        b = jnp.zeros((cin,), jnp.float32)
        for name, geom in (("classic", gc), ("aligned", ga)):
            xb = to_body(x, geom)

            fwd = jax.jit(lambda xb, w, b, geom=geom: flat_conv2d(
                xb, w, b, geom, act="relu", lrn_size=5,
                mask_cotangent=False))
            t_f = device_ms(fwd, xb, w, b, iters=20)

            def loss(xb, w, b, geom=geom):
                return jnp.sum(flat_conv2d(
                    xb, w, b, geom, act="relu", lrn_size=5,
                    mask_cotangent=False).astype(jnp.float32))

            gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_g = device_ms(gr, xb, w, b, iters=10)
            print(f"{hw}^2 c{cin} {name} (Wp={geom.Wp:4d}): "
                  f"fwd {t_f:7.3f} ms   fwd+bwd {t_g:7.3f} ms")


if __name__ == "__main__":
    main()
