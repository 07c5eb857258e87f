"""Attribute the isolated flat-conv kernel's device time: MXU dot vs VPU
tap copies vs grid/DMA overhead.

Builds 512^2 cin=cout=8 bf16 conv kernels (G0 scheme: P=0, col-first,
edge-masked) with pieces disabled, chained 20x inside one jit:

  full        : copies + masks + dot + z-adds + write
  dot-only    : no tap copies (dot reads stale scratch)
  copy-only   : no dot / z-adds (writes a slice of xs instead)
  write-only  : guard-style zero write every block (pure grid + out DMA)
  nb sweep    : full kernel at images-per-grid-step 2 / 4 / 8 / 16

Run solo on the chip:  python scripts/exp_conv_attrib.py
"""

import functools
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

    from msau_tpu.ops.flatconv import FlatGeom, to_body

    n, cin, cout, hw = 16, 8, 8, 512
    tile = 32
    geom = FlatGeom(hw, hw, 0, tile)
    wp = geom.Wp
    stride = tile * wp
    L = stride
    n_blk = hw // tile + 2
    qb = 127
    start0 = -(wp + 128)
    cw = L + 2 * wp + 1
    len_in = -(-(qb + 2 + cw) // 128) * 128
    cw_pad = -(-cw // 128) * 128

    x = jax.random.normal(jax.random.PRNGKey(0), (n, cin, hw, hw),
                          jnp.bfloat16)
    xb = to_body(x, geom)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.3
         ).astype(jnp.bfloat16)
    w_col = jnp.transpose(w, (1, 2, 0, 3)).reshape(3 * cin, 3 * cout)
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))

    col = np.arange(cw_pad) % wp
    mask_l = jnp.asarray((col >= 1).astype(np.float32),
                         jnp.bfloat16).reshape(1, cw_pad)
    mask_r = jnp.asarray((col <= wp - 2).astype(np.float32),
                         jnp.bfloat16).reshape(1, cw_pad)

    def kernel(x_ref, w_ref, b_ref, ml_ref, mr_ref, o_ref, xs_ref, *,
               nb, do_copy, do_dot):
        bi = pl.program_id(1)
        is_guard = jnp.logical_or(bi < 1, bi >= n_blk - 1)

        @pl.when(is_guard)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(jnp.logical_not(is_guard))
        def _():
            for i in range(nb):
                if do_copy:
                    xs_ref[0:cin, :cw] = (
                        x_ref[i, :, qb:qb + cw] * ml_ref[:, :cw])
                    xs_ref[cin:2 * cin, :cw] = x_ref[i, :, qb + 1:
                                                     qb + 1 + cw]
                    xs_ref[2 * cin:3 * cin, :cw] = (
                        x_ref[i, :, qb + 2:qb + 2 + cw] * mr_ref[:, :cw])
                if do_dot:
                    z = jax.lax.dot_general(
                        w_ref[:], xs_ref[:, :cw], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = z[0:cout, 0:L]
                    acc = acc + z[cout:2 * cout, wp:wp + L]
                    acc = acc + z[2 * cout:3 * cout, 2 * wp:2 * wp + L]
                    o_ref[i, :, :] = (acc + b_ref[:]).astype(o_ref.dtype)
                else:
                    o_ref[i, :, :] = xs_ref[0:cout, :L]

    def make(nb, do_copy=True, do_dot=True):
        hi = geom.LB - len_in

        def idx(ni, bi):
            s = bi * stride + start0
            return (ni * nb, 0, pl.multiple_of(jnp.clip(s, 0, hi), 128))

        k = functools.partial(kernel, nb=nb, do_copy=do_copy, do_dot=do_dot)

        def one(v):
            return pl.pallas_call(
                k,
                grid=(n // nb, n_blk),
                in_specs=[
                    pl.BlockSpec(
                        (pl.Element(nb), pl.Element(cin),
                         pl.Element(len_in)), idx),
                    pl.BlockSpec((3 * cin, 3 * cout), lambda ni, bi: (0, 0)),
                    pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
                    pl.BlockSpec((1, cw_pad), lambda ni, bi: (0, 0)),
                    pl.BlockSpec((1, cw_pad), lambda ni, bi: (0, 0)),
                ],
                out_specs=pl.BlockSpec((nb, cout, stride),
                                       lambda ni, bi: (ni, 0, bi)),
                out_shape=jax.ShapeDtypeStruct((n, cout, geom.LB),
                                               jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((3 * cin, cw_pad), jnp.bfloat16)],
            )(v, w_col, b.reshape(-1, 1).astype(jnp.float32), mask_l, mask_r)

        def many(v):
            for _ in range(20):
                v = one(v)
            return v

        return jax.jit(many)

    cases = [
        ("full nb=4      ", make(4)),
        ("dot-only nb=4  ", make(4, do_copy=False)),
        ("copy-only nb=4 ", make(4, do_dot=False)),
        ("full nb=2      ", make(2)),
        ("full nb=8      ", make(8)),
    ]
    for name, fn in cases:
        try:
            _ = np.asarray(fn(xb)[0, 0, :8])
        except Exception as e:
            print(f"{name}: failed ({type(e).__name__})", flush=True)
            continue
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            y = fn(xb)
            _ = np.asarray(y[0, 0, :8])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best/20*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
