"""Device-op family breakdown of the fused serve program on the BENCH
protocol's trained net + dense page (what the recorded p50 pays).

Run solo on the chip:  python scripts/exp_serve_families.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from ktime import device_families_ms

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.charset import Charset
    from msau_tpu.data.pages import page_from_label_dict
    from msau_tpu.data.synth import BENCH_CHARSET, make_page, \
        make_structured_batch
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", dtype="bfloat16",
        flat_scales=3,
    )
    model = build_model(cfg)
    optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                           lr_decay_staircase=False))
    rng = np.random.default_rng(0)
    bs, hw = 16, 512
    xh, yh = make_structured_batch(rng, bs, hw, cfg.n_class,
                                   cfg.img_channels)
    batch = {"input": jnp.asarray(xh).astype(jnp.bfloat16),
             "label": jnp.asarray(yh),
             "valid": jnp.ones((bs, hw, hw), bool)}
    params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, masked=True, donate=True)
    for _ in range(190):  # bench protocol: serve with a trained net
        state, m = step(state, batch)
    _ = float(m["loss"])
    print(f"trained; loss {float(m['loss']):.3f}", flush=True)

    kv = KVModel(model_config=cfg)
    kv.charset = Charset(chars=" $" + BENCH_CHARSET)
    kv.model = build_model(kv.model_config)
    kv.params = state.params
    page = page_from_label_dict(
        make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10))

    def serve_traced():
        kv.predict(page)
        return jnp.zeros(())

    total, fam_ms = device_families_ms(serve_traced, iters=5, warmup=2)
    print(f"serve device total: {total:.1f} ms")
    for name, ms in fam_ms.most_common(22):
        print(f"{ms:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
