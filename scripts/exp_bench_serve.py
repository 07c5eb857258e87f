"""Reproduce bench.py's serve phase and attribute its p50.

bench.py serves with the 12-step bench-trained params; the breakdown
script (bench_serve_breakdown.py) uses random init and measures ~94 ms
while bench printed ~262 — this script finds where the difference lives:
device program (CCL iterations on the trained argmax map) vs host strings.

Run on the real chip:  python scripts/exp_bench_serve.py [--steps N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = 12
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.charset import Charset
    from msau_tpu.data.pages import page_from_label_dict
    from msau_tpu.data.synth import BENCH_CHARSET, make_page, make_structured_batch
    from msau_tpu.infer.decode import extract_values, unpack_decode_out
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.data.rasterize import round_up
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax", dtype="bfloat16",
        remat=False, flat_scales=3,
    )
    model = build_model(cfg)
    optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                           lr_decay_staircase=False))
    rng = np.random.default_rng(0)
    xh, yh = make_structured_batch(rng, 16, 512, cfg.n_class, cfg.img_channels)
    batch = {"input": jnp.asarray(xh).astype(cfg.dtype),
             "label": jnp.asarray(yh),
             "valid": jnp.ones((16, 512, 512), bool)}
    params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, masked=True, donate=True)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch)
        if i in (0, steps - 1) or i % 50 == 0:
            print(f"  step {i}: loss {float(metrics['loss']):.4f} "
                  f"acc {float(metrics.get('acc', float('nan'))):.3f}")
    print(f"trained {steps} steps in {time.perf_counter()-t0:.1f} s")

    kv = KVModel(model_config=cfg)
    kv.charset = Charset(chars=" $" + BENCH_CHARSET)
    kv.model = build_model(cfg)
    kv.params = state.params
    page = page_from_label_dict(
        make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10)
    )

    progs, scaled, arrays, hb, wb = kv._prepare_host(page)
    num_lines = round_up(max(len(scaled), 1), 128)
    cap, lcap = arrays[1].shape[0], arrays[3].shape[0]
    dev_buf = jnp.asarray(np.concatenate([np.asarray(a).ravel() for a in arrays]))

    def device_part():
        packed, pred, chosen = kv._serve_fn()(
            kv.params, dev_buf, hb=hb, wb=wb, num_lines=num_lines,
            cap=cap, lcap=lcap)
        return np.asarray(packed)

    packed_host = device_part()  # compile
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        packed_host = device_part()
        lat.append((time.perf_counter() - t0) * 1e3)
    print(f"device program + fetch p50: {np.median(lat):.1f} ms")

    host = unpack_decode_out(packed_host, kv.n_class, 8, num_lines)
    t0 = time.perf_counter()
    for _ in range(10):
        values = extract_values(host, scaled, kv.schema)
    print(f"extract_values (host strings): {(time.perf_counter()-t0)*100:.1f} ms")
    active = np.asarray(host["active"])
    print("active classes:", np.nonzero(active)[0].tolist())

    def serve():
        return kv.predict(page)

    serve()
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        serve()
        lat.append((time.perf_counter() - t0) * 1e3)
    print(f"predict e2e p50: {np.median(lat):.1f} ms")


if __name__ == "__main__":
    main()
