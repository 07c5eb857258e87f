"""Sweep (scheme, tile, nb) for the flat conv at flagship scales with the
act+LRN epilogue, fwd and fwd+bwd, device-trace timed.  Monkeypatches
flatconv._batch_block/_sub_tile to force the tunables.

Run solo on the chip:  python scripts/exp_geom_sweep.py
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

    import msau_tpu.ops.flatconv as fc
    from msau_tpu.ops.flatconv import FlatGeom, choose_geom, to_body, flat_conv2d

    orig_bb = fc._batch_block
    orig_st = fc._sub_tile
    force = {}

    def patched_bb(n, *a, **k):
        nb = force.get("nb")
        return nb if nb and n % nb == 0 else orig_bb(n, *a, **k)

    def patched_st(geom, r, itemsize, budget=fc.VMEM_XS_BUDGET):
        t = force.get("tile")
        if t and geom.tile_h % t == 0 and (t * geom.Wp) % 128 == 0:
            return t
        return orig_st(geom, r, itemsize, budget)

    fc._batch_block = patched_bb
    fc._sub_tile = patched_st

    n, hw, cin = 16, 512, 8
    gc = choose_geom(hw, hw)
    ga = FlatGeom(hw, hw, 64, 32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, cin, hw, hw), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cin))
         * 0.3).astype(jnp.bfloat16)
    b = jnp.zeros((cin,), jnp.float32)

    for name, geom in (("classic", gc), ("aligned", ga)):
        xb = to_body(x, geom)
        for tile in (8, 16, 32):
            if geom.tile_h % tile or (tile * geom.Wp) % 128:
                continue
            for nb in (2, 4, 8):
                force["tile"], force["nb"] = tile, nb
                try:
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
                    print(f"{name} Wp={geom.Wp} tile={tile:2d} nb={nb}: "
                          f"fwd {t_f:7.3f}  fwd+bwd {t_g:7.3f}", flush=True)
                except Exception as e:
                    msg = str(e).split("\n")[0][:90]
                    print(f"{name} Wp={geom.Wp} tile={tile:2d} nb={nb}: "
                          f"FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
