"""Benchmark harness for the five BASELINE.md configs.

  1. single-stage U-Net, 256² chargrid, bs=1 inference (KV path)
  2. full 3-block MSAU, 512², training
  3. chargrid+BERT fused input (feature-grid channels), 256², training
  4. BMSAU box-conv variant, 256², training
  5. 1024² bf16 data-parallel training + fused morphology decode

Run on the chip:  python scripts/bench_configs.py [--only N] [--quick]
Prints one JSON line per config.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def time_train(cfg, bs, hw, iters=10, precision="BF16_BF16_F32_X3"):
    import jax
    import jax.numpy as jnp

    from msau_tpu.config import TrainConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    if precision and jax.default_backend() != "cpu":
        jax.config.update("jax_default_matmul_precision", precision)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, hw, hw, cfg.img_channels)), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg.n_class, (bs, hw, hw)), jnp.int32)
    batch = {"input": x, "label": y, "valid": jnp.ones((bs, hw, hw), bool)}
    params = model.init(jax.random.PRNGKey(0), x[:1])
    opt = make_optimizer(TrainConfig(lr_decay_staircase=False))
    state = TrainState.create(params, opt)
    step = make_train_step(model, opt, masked=True, donate=True)
    state, m = step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _ = float(m["loss"])
    _sync(state.params)
    return bs / ((time.perf_counter() - t0) / iters)


def config_1(quick):
    """256² bs=1 inference latency through forward + device decode."""
    import jax
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig
    from msau_tpu.infer.decode import decode_fields_device
    from msau_tpu.models.msau import build_model

    hw = 128 if quick else 256
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=1,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, hw, hw, 64)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    line_id = jnp.asarray(rng.integers(0, 64, (hw, hw)), jnp.int32)
    char_id = jnp.asarray(rng.integers(0, 30, (hw, hw)), jnp.int32)

    @jax.jit
    def infer(params, x, line_id, char_id):
        probs, _, _ = model.apply(params, x)
        return decode_fields_device(
            probs[0], line_id, char_id, (5, 11), n_class=17, num_lines=128,
            k=8,
        )

    out = infer(params, x, line_id, char_id)
    _sync(out["active"])
    iters = 3 if quick else 20
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = infer(params, x, line_id, char_id)
        _sync(out["active"])
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    return {
        "metric": "config1 p50 e2e latency (256^2, 1-block U-Net + device decode)",
        "value": round(p50 * 1e3, 2),
        "unit": "ms",
    }


def config_2(quick):
    from msau_tpu.config import ModelConfig

    hw, bs = (128, 2) if quick else (512, 8)
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, remat=True, flat_scales=2,
    )
    v = time_train(cfg, bs, hw, iters=3 if quick else 10)
    return {
        "metric": "config2 train img/s (512^2 3-block MSAU)",
        "value": round(v, 3),
        "unit": "images/sec",
    }


def config_3(quick):
    from msau_tpu.config import ModelConfig

    hw, bs = (128, 2) if quick else (256, 8)
    cfg = ModelConfig(
        img_channels=768 + 64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, remat=True,
    )
    v = time_train(cfg, bs, hw, iters=3 if quick else 10)
    # label which embedding backend actually produces the 768 text channels
    # in this environment (a local BERT, or the documented char-ngram
    # fallback) — the bench itself measures the 832-channel fused model
    from msau_tpu.data.wordgrid import sentence_embedding_features

    _, backend = sentence_embedding_features(["probe"], return_backend=True)
    return {
        "metric": f"config3 train img/s (256^2 chargrid+text-emb[{backend}] 832ch)",
        "value": round(v, 3),
        "unit": "images/sec",
    }


def config_4(quick):
    from msau_tpu.config import ModelConfig

    hw, bs = (64, 1) if quick else (256, 4)
    cfg = ModelConfig(
        model="msau_box", img_channels=64, n_class=17, scale_space_num=4,
        res_depth=2, feat_root=8, num_blocks=3, remat=True,
        num_box_convs=2, num_box_per_channel=3, max_box_size=28,
    )
    v = time_train(cfg, bs, hw, iters=2 if quick else 5)
    return {
        "metric": "config4 train img/s (256^2 BMSAU box-conv)",
        "value": round(v, 3),
        "unit": "images/sec",
    }


def config_5(quick):
    from msau_tpu.config import ModelConfig

    hw, bs = (256, 1) if quick else (1024, 2)
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, remat=True, dtype="bfloat16",
        flat_scales=2,
    )
    v = time_train(cfg, bs, hw, iters=2 if quick else 5)
    return {
        "metric": "config5 train img/s (1024^2 bf16 3-block MSAU)",
        "value": round(v, 3),
        "unit": "images/sec",
    }


def main():
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = int(sys.argv[sys.argv.index("--only") + 1])
    fns = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}
    for i, fn in fns.items():
        if only and i != only:
            continue
        try:
            print(json.dumps(fn(quick)), flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"config{i}", "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)


if __name__ == "__main__":
    main()
