"""Experiment: kill lane-padding traffic on narrow-channel scales.

The flagship step moves 192 GB/step because feat_root=8 activations occupy
8 of 128 lanes (PERF.md round-2 roadmap #1).  Candidate fixes, all timed on
one conv stack (dil conv + 2 res convs, 512^2, C=8, bs=16 — the shallow
scale of the flagship config):

  A  baseline NHWC [16, 512, 512, 8]
  B  batch->channel fold [1, 512, 512, 128] + feature_group_count=16
     (grouped conv; exact same math, zero lane padding)
  C  batch->channel fold + DENSE 128x128 conv with a block-diagonal kernel
     (16x the FLOPs — irrelevant at <1% MFU — but a single fat MXU matmul)
  D  space-to-depth 4x4 pack [16, 128, 128, 128] + transformed 3x3 kernel

Run: python scripts/perf_exp_packing.py
"""

import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]  # real sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1000, out


def cost_bytes(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("bytes accessed", float("nan")) / 1e9


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def stack_a(x, k1, k2, k3):
    y = conv(x, k1)
    y = jax.nn.relu(conv(y, k2))
    y = conv(y, k3) + y
    return jax.nn.relu(y)


def main():
    n, h, w, c = (4, 32, 32, 8) if "--small" in sys.argv else (16, 512, 512, 8)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    x = jnp.asarray(rng.random((n, h, w, c)), dt)
    ks = [jnp.asarray(rng.random((3, 3, c, c)) * 0.1, dt) for _ in range(3)]

    # ---- A: baseline
    fa = jax.jit(stack_a)
    ms_a, out_a = timeit(fa, x, *ks)
    gb_a = cost_bytes(stack_a, x, *ks)
    print(f"A baseline NHWC bs={n}:        {ms_a:7.2f} ms   {gb_a:.2f} GB")

    # ---- B: batch->channel grouped
    xf = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, n * c)
    kg = [jnp.tile(k, (1, 1, 1, n)) for k in ks]  # HWIO groups share kernel?
    # NO: groups need per-group kernels stacked along O. Here every group
    # uses the SAME kernel (one shared conv applied per batch element), so
    # kernel = [3,3,c, c*n] with the c-out block repeated n times.
    def stack_b(xf, k1, k2, k3):
        y = conv(xf, k1, groups=n)
        y = jax.nn.relu(conv(y, k2, groups=n))
        y = conv(y, k3, groups=n) + y
        return jax.nn.relu(y)

    fb = jax.jit(stack_b)
    ms_b, out_b = timeit(fb, xf, *kg)
    gb_b = cost_bytes(stack_b, xf, *kg)
    ref = np.asarray(out_a)
    got = np.asarray(out_b).reshape(h, w, n, c).transpose(2, 0, 1, 3)
    err_b = np.abs(got - ref).max()
    print(f"B grouped fold bs->C:          {ms_b:7.2f} ms   {gb_b:.2f} GB   maxerr {err_b:.2e}")

    # ---- C: dense block-diagonal
    kd = []
    for k in ks:
        big = np.zeros((3, 3, n * c, n * c), np.float32)
        for g in range(n):
            big[:, :, g * c:(g + 1) * c, g * c:(g + 1) * c] = np.asarray(k)
        kd.append(jnp.asarray(big, dt))

    def stack_c(xf, k1, k2, k3):
        y = conv(xf, k1)
        y = jax.nn.relu(conv(y, k2))
        y = conv(y, k3) + y
        return jax.nn.relu(y)

    fc = jax.jit(stack_c)
    ms_c, out_c = timeit(fc, xf, *kd)
    gb_c = cost_bytes(stack_c, xf, *kd)
    got = np.asarray(out_c).reshape(h, w, n, c).transpose(2, 0, 1, 3)
    err_c = np.abs(got - ref).max()
    print(f"C dense block-diag fold:       {ms_c:7.2f} ms   {gb_c:.2f} GB   maxerr {err_c:.2e}")

    # ---- D: space-to-depth 4x4
    p = 4
    xs = x.reshape(n, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // p, w // p, p * p * c)          # [16,128,128,128]
    # packed kernel [3,3, p*p*c, p*p*c]: output pixel (py,px) in a cell at
    # offset (dy,dx) reads input pixel (py+dy, px+dx), which lives in cell
    # offset (floor((py+dy)/p), ...) at position ((py+dy)%p, ...)
    def pack_kernel(k):
        kk = np.asarray(k)  # [3,3,c,c], taps dy,dx in {-1,0,1}
        big = np.zeros((3, 3, p * p * c, p * p * c), np.float32)
        for py in range(p):
            for px in range(p):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        sy, sx = py + dy, px + dx
                        cy, cx = sy // p, sx // p      # cell offset
                        iy, ix = sy % p, sx % p        # position in cell
                        o = (py * p + px) * c
                        i = (iy * p + ix) * c
                        big[cy + 1, cx + 1, i:i + c, o:o + c] += kk[dy + 1, dx + 1]
        return jnp.asarray(big, dt)

    kp = [pack_kernel(k) for k in ks]

    def stack_d(xs, k1, k2, k3):
        y = conv(xs, k1)
        y = jax.nn.relu(conv(y, k2))
        y = conv(y, k3) + y
        return jax.nn.relu(y)

    fd = jax.jit(stack_d)
    ms_d, out_d = timeit(fd, xs, *kp)
    gb_d = cost_bytes(stack_d, xs, *kp)
    got = np.asarray(out_d).reshape(n, h // p, w // p, p, p, c)
    got = got.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
    err_d = np.abs(got - ref).max()
    print(f"D space-to-depth 4x4:          {ms_d:7.2f} ms   {gb_d:.2f} GB   maxerr {err_d:.2e}")


if __name__ == "__main__":
    main()
