"""TPU perf scan: where does the 512^2 train step spend time?

Varies one knob at a time from the flagship bench config and prints
ms/step + img/s for each variant.  Run on the real chip:
    python scripts/perf_scan.py [--quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(cfg_kwargs, bs=8, hw=512, iters=8, precision="BF16_BF16_F32_X3",
              forward_only=False):
    import jax
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    if precision:
        jax.config.update("jax_default_matmul_precision", precision)
    cfg = ModelConfig(img_channels=64, n_class=17, **cfg_kwargs)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, hw, hw, 64)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 17, (bs, hw, hw)), jnp.int32)
    batch = {"input": x, "label": y, "valid": jnp.ones((bs, hw, hw), bool)}
    params = model.init(jax.random.PRNGKey(0), x[:1])

    if forward_only:
        # reduce on device so the sync fetch is O(1) bytes, not the logits
        fwd = jax.jit(lambda p, xx: jnp.sum(model.apply(p, xx)[1]))
        out = fwd(params, x)
        _ = float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        _ = float(out)
        dt = (time.perf_counter() - t0) / iters
        return dt

    opt = make_optimizer(TrainConfig(lr_decay_staircase=False))
    state = TrainState.create(params, opt)
    step = make_train_step(model, opt, masked=True, donate=True)
    state, m = step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _ = float(m["loss"])
    _ = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    return dt


BASE = dict(scale_space_num=4, res_depth=2, feat_root=8, num_blocks=3, remat=True)


def main():
    quick = "--quick" in sys.argv
    bs, hw = (2, 128) if quick else (8, 512)
    variants = [
        ("no-remat", dict(BASE, remat=False)),
        ("bf16-no-remat", dict(BASE, dtype="bfloat16", remat=False)),
        ("no-lrn-remat", dict(BASE, use_lrn=False, remat=True)),
        ("bf16-no-lrn-remat", dict(BASE, dtype="bfloat16", use_lrn=False, remat=True)),
    ]
    results = {}
    for name, kw in variants:
        try:
            dt = time_step(kw, bs=bs, hw=hw)
            results[name] = dt
            print(f"{name:28s} {dt * 1e3:8.1f} ms/step  {bs / dt:8.2f} img/s", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
    try:
        dt = time_step(BASE, bs=bs, hw=hw, forward_only=True)
        print(f"{'forward-only':28s} {dt * 1e3:8.1f} ms/step  {bs / dt:8.2f} img/s", flush=True)
        dt = time_step(BASE, bs=1, hw=hw, forward_only=True)
        print(f"{'forward bs=1 (latency)':28s} {dt * 1e3:8.1f} ms", flush=True)
    except Exception as e:
        print("forward scan failed:", e)


if __name__ == "__main__":
    main()
