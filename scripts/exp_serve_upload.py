"""Measure the serve path's tunnel round trips: is the input upload a
separate synchronous RTT, and can it pipeline with the dispatch?

Stages timed (p50 of 20 reps, steady state):
  A. jnp.asarray(buf) + block            — upload alone
  B. upload + dispatch + packed fetch    — current predict protocol
  C. dispatch straight on the np buffer  — implicit transfer inside dispatch
  D. fetch-only on cached output         — RTT floor

Run on the real chip: python scripts/exp_serve_upload.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def p50(f, n=20):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    n = 5 * 512 + 10 * 512 * 2  # box-program buffer scale (ints)
    buf = np.arange(n * 5, dtype=np.int32)

    @jax.jit
    def tiny(b):
        return jnp.sum(b) + b[:128]

    # warmup
    out = tiny(jnp.asarray(buf)); _ = np.asarray(out[0])

    a = p50(lambda: np.asarray(jnp.asarray(buf)[0]))  # upload + sync readback

    def b_path():
        d = jnp.asarray(buf)
        o = tiny(d)
        _ = np.asarray(o[0])
    b = p50(b_path)

    def c_path():
        o = tiny(buf)          # np arg: transfer rides the dispatch
        _ = np.asarray(o[0])
    c = p50(c_path)

    dev = jnp.asarray(buf)
    o_cached = tiny(dev); _ = np.asarray(o_cached[0])
    d = p50(lambda: np.asarray(tiny(dev)[0]))  # no fresh upload

    print(f"A upload+readback      p50 = {a:7.1f} ms")
    print(f"B upload->dispatch->fetch  = {b:7.1f} ms")
    print(f"C np-arg dispatch->fetch   = {c:7.1f} ms")
    print(f"D resident dispatch->fetch = {d:7.1f} ms")
    print(f"=> upload adds {b - d:.1f} ms over resident; "
          f"np-arg saves {b - c:.1f} ms vs explicit upload")


if __name__ == "__main__":
    main()
