"""On-chip experiment: shallow-channel conv formulations.

The flagship MSAU step is HBM-bandwidth-bound because feat_root=8
activations occupy 8 of 128 lanes in NHWC layout (PERF.md).  This probes
alternative formulations for a single 3x3 conv at the flagship scale-0
shape (N=16, 512^2, Cin=Cout=8, bf16) before investing in Pallas kernels:

  1. xla_nhwc     — today's path (flax nn.Conv equivalent).
  2. xla_nchw     — same conv, NCHW logical layout.
  3. flat_einsum  — activations as [N, C, Hp*Wp] (W on lanes, halo frame);
                    conv = sum over 9 taps of einsum('ncl,co->nol', slice, w).

Prints per-variant wall ms and XLA cost-analysis bytes.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N, H, W, CIN, COUT = 16, 512, 512, 8, 8
K, D, P = 3, 1, 2  # kernel, dilation, halo frame
HP, WP = H + 2 * P, W + 2 * P
DTYPE = jnp.bfloat16


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # real sync: fetch a scalar (block_until_ready can return early on axon)
    _ = float(jnp.sum(out[0].ravel()[0] if isinstance(out, tuple) else out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float((out[0] if isinstance(out, tuple) else out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, fn, *args):
    ms = time_fn(fn, *args)
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    by = cost.get("bytes accessed", float("nan"))
    fl = cost.get("flops", float("nan"))
    print(f"{name:16s} {ms:8.3f} ms   bytes={by/1e6:10.1f} MB   flops={fl/1e9:8.2f} G")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    x_nhwc = jax.random.normal(key, (N, H, W, CIN), DTYPE)
    w = jax.random.normal(key, (K, K, CIN, COUT), jnp.float32)

    @jax.jit
    def xla_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            rhs_dilation=(D, D),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))

    @jax.jit
    def xla_nchw(x, w):
        wk = jnp.transpose(w, (3, 2, 0, 1)).astype(x.dtype)  # OIHW
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1), "SAME",
            rhs_dilation=(D, D),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    # flat layout with halo frame
    xf = jnp.zeros((N, CIN, HP, WP), DTYPE).at[:, :, P:P + H, P:P + W].set(x_nchw)
    xf = xf.reshape(N, CIN, HP * WP)

    @jax.jit
    def flat_einsum(xf, w):
        L = H * WP  # output rows x padded width; pad cols masked later
        out = jnp.zeros((N, COUT, L), jnp.float32)
        c = (K - 1) // 2 * D
        for ky in range(K):
            for kx in range(K):
                # out flat l = h*WP + wp  needs  x_pad[(h+P+(ky-c)D)*WP + wp+(kx-c)D]
                off = (P + (ky - c) * D) * WP + (kx - c) * D
                sl = jax.lax.dynamic_slice(xf, (0, 0, off), (N, CIN, L))
                out = out + jnp.einsum(
                    "ncl,co->nol", sl, w[ky, kx].astype(sl.dtype),
                    preferred_element_type=jnp.float32,
                )
        return out.astype(DTYPE)

    print(f"shape N={N} {H}x{W} {CIN}->{COUT} k{K}d{D} {DTYPE.__name__}")
    report("xla_nhwc", xla_nhwc, x_nhwc, w)
    report("xla_nchw", xla_nchw, x_nchw, w)
    report("flat_einsum", flat_einsum, xf, w)

    # correctness cross-check (nhwc vs flat)
    ref = np.asarray(xla_nhwc(x_nhwc, w), np.float32)
    got = np.asarray(flat_einsum(xf, w), np.float32).reshape(N, COUT, H, WP)
    got = got[:, :, :, P:P + W].transpose(0, 2, 3, 1)
    print("max |flat - nhwc| =", np.abs(ref - got).max())


def bench_pallas():
    """Pallas flat conv at the flagship scale-0 shape, fwd and fwd+bwd."""
    from msau_tpu.ops.flatconv import (
        choose_geom, flat_conv2d, flat_conv2d_reference, to_body,
    )
    geom = choose_geom(H, W)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, CIN, H, W), jnp.float32)
    xb = to_body(x, geom).astype(DTYPE)
    w = jax.random.normal(key, (K, K, CIN, COUT), jnp.float32) * 0.3
    b = jnp.zeros((COUT,), jnp.float32)

    @jax.jit
    def fwd(xb, w, b):
        return flat_conv2d(xb, w, b, geom, dilation=D)

    got = np.asarray(fwd(xb, w, b), np.float32)
    ref = np.asarray(flat_conv2d_reference(xb.astype(jnp.float32), w, b, geom,
                                           dilation=D), np.float32)
    print("pallas max|err| =", np.abs(got - ref).max())
    report("pallas_fwd", fwd, xb, w, b)

    cw = jax.random.normal(key, (N, COUT, geom.LB), DTYPE)

    @jax.jit
    def step(xb, w, b):
        return jax.grad(
            lambda xb, w, b: jnp.sum(
                flat_conv2d(xb, w, b, geom, dilation=D) * cw
            ).astype(jnp.float32),
            argnums=(0, 1, 2),
        )(xb, w, b)

    report("pallas_fwd+bwd", step, xb, w, b)

    @jax.jit
    def xla_step(x, w, b):
        def f(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME", rhs_dilation=(D, D),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y * cw2).astype(jnp.float32)
        return jax.grad(f, argnums=(0, 1, 2))(x, w, b)

    x_nhwc = jnp.transpose(x, (0, 2, 3, 1)).astype(DTYPE)
    cw2 = jax.random.normal(key, (N, H, W, COUT), DTYPE)
    report("xla_fwd+bwd", xla_step, x_nhwc, w, b)


if __name__ == "__main__":
    import sys
    if "--pallas-only" not in sys.argv:
        main()
    bench_pallas()
