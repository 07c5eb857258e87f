"""On-chip experiment: 9-tap stack conv vs 3-row-tap factorized conv.

The flat conv kernels originally built a [KH*KW*Cin, L] tap stack with 9
lane-rotated VMEM copies, then one MXU matmul.  The step profile showed
the flat kernel family VPU-bound on those rotated copies (~20% lane
efficiency on misaligned slices).  The 3-row-tap factorization (variant
E, now the library scheme — see flatconv._row_offsets) does KH rotated
row copies + one [KH*Cin, KW*Cout] matmul + KW-1 shifted adds.

Measured on v5e (512^2, cin=cout=8, bs=16, bf16):
  A  9-tap stack : 3.198 ms
  E  3-row-tap   : 1.913 ms   (1.67x)

Run solo on the chip: python scripts/exp_tap_variants.py
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

    from msau_tpu.ops.flatconv import (
        _ConvDims,
        _batch_block,
        _col_mask,
        _plan,
        _x_spec,
        choose_geom,
        flat_conv2d,
        to_body,
    )

    n, cin, cout, hw = 16, 8, 8, 512
    geom = choose_geom(hw, hw)
    dims = _ConvDims(3, 3, 1, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, cin, hw, hw),
                          jnp.bfloat16)
    xb = to_body(x, geom)
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.3
         ).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))

    itemsize = 2
    plan = _plan(geom, dims, cin, itemsize)
    nb = _batch_block(n, cin * plan.len_in * itemsize,
                      cout * plan.stride * itemsize,
                      plan.r * plan.stride * itemsize)
    print(f"plan: tile={plan.tile} n_blk={plan.n_blk} nb={nb} "
          f"stride={plan.stride} len_in={plan.len_in}")

    # --- variant A: the historical 9-tap stack scheme (self-contained)
    tap_offs = tuple(
        (ky * 3 + kx,
         (ky - 1) * geom.Wp + (kx - 1) - plan.start0)
        for ky in range(3) for kx in range(3))
    w_stack = w.reshape(9 * cin, cout)

    def kernel_a(x_ref, w_ref, b_ref, m_ref, o_ref, xs_ref, *, nb):
        bi = pl.program_id(1)
        is_guard = jnp.logical_or(bi < plan.g_blk,
                                  bi >= plan.n_blk - plan.g_blk)

        @pl.when(is_guard)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(jnp.logical_not(is_guard))
        def _():
            for i in range(nb):
                for tap, q in tap_offs:
                    xs_ref[tap * cin:(tap + 1) * cin, :] = (
                        x_ref[i, :, q:q + plan.stride])
                acc = jax.lax.dot_general(
                    w_ref[:], xs_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = (acc + b_ref[:]) * m_ref[:]
                o_ref[i, :, :] = acc.astype(o_ref.dtype)

    def run_a(xb):
        return pl.pallas_call(
            functools.partial(kernel_a, nb=nb),
            grid=(n // nb, plan.n_blk),
            in_specs=[
                _x_spec(plan, geom, cin, nb),
                pl.BlockSpec((9 * cin, cout), lambda ni, bi: (0, 0)),
                pl.BlockSpec((cout, 1), lambda ni, bi: (0, 0)),
                pl.BlockSpec((1, plan.stride), lambda ni, bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, cout, plan.stride),
                                   lambda ni, bi: (ni, 0, bi)),
            out_shape=jax.ShapeDtypeStruct((n, cout, geom.LB), xb.dtype),
            scratch_shapes=[pltpu.VMEM((9 * cin, plan.stride), xb.dtype)],
        )(xb, w_stack, b.reshape(-1, 1).astype(jnp.float32),
          _col_mask(plan, geom))

    # --- variant E: the 3-row-tap scheme (now the library path)
    def run_e(xb):
        return flat_conv2d(xb, w, b, geom)

    ya = jax.jit(run_a)(xb)
    ye = jax.jit(run_e)(xb)
    diff = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                 - ye.astype(jnp.float32))))
    print("A-vs-E max diff:", diff)

    for name, fn in [("A 9-tap stack", jax.jit(run_a)),
                     ("E 3-row-tap  ", jax.jit(run_e))]:
        _ = np.asarray(fn(xb)[0, 0, :8])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(20):
            y = fn(xb)
        _ = np.asarray(y[0, 0, :8])  # tiny device-side slice as the sync
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
