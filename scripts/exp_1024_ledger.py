"""Config-5 (1024^2 bf16 flat, remat, bs=2) ledger: the 512^2 treatment
for the capability config the reference refuses outright
(/root/reference/model/training/trainer.py:59,114-120 area cap).

Prints: host step time / img/s, XLA cost analysis (FLOPs, bytes), the
stream-SoL ceiling at the honest 657 GB/s, and the device-op family
table from a 3-step trace (VERDICT r4 weak #5 / task #6).

Run solo on the chip:  python scripts/exp_1024_ledger.py [--bs N]
"""

import os
import sys
import time

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

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.synth import make_structured_batch
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    bs = 2
    if "--bs" in sys.argv:
        bs = int(sys.argv[sys.argv.index("--bs") + 1])
    hw = 1024
    cfg = ModelConfig(
        img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
        feat_root=8, num_blocks=3, final_act="softmax",
        dtype="bfloat16", flat_scales=3, remat=True,
    )
    model = build_model(cfg)
    optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                           lr_decay_staircase=False))
    rng = np.random.default_rng(0)
    xh, yh = make_structured_batch(rng, bs, hw, cfg.n_class,
                                   cfg.img_channels)
    batch = {"input": jnp.asarray(xh).astype(jnp.bfloat16),
             "label": jnp.asarray(yh),
             "valid": jnp.ones((bs, hw, hw), bool)}
    params = model.init(jax.random.PRNGKey(0), batch["input"][:1])
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, masked=True, donate=True)

    compiled = jax.jit(
        make_train_step(model, optimizer, masked=True, donate=False)
    ).lower(state, batch).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        print(f"XLA cost analysis: {flops/1e12:.2f} TFLOP/step, "
              f"{bytes_/2**30:.1f} GiB accessed/step")
        print(f"stream SoL at 657 GB/s: {bytes_/657e9*1e3:.1f} ms "
              f"(bytes as counted by XLA; Pallas custom calls count "
              f"operand+output sizes)")
    except Exception as e:
        print("cost_analysis unavailable:", e)

    state, m = step(state, batch)
    _ = float(m["loss"])
    state, m = step(state, batch)
    _ = float(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    _sync = (np.asarray(leaf).ravel()[0], float(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"step: {dt*1e3:.1f} ms, {bs/dt:.2f} img/s (bs={bs})")

    trace_dir = "/tmp/ledger1024_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, batch)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_summary import by_family, load_device_events

    by_family(load_device_events(trace_dir), 3, top=20)


if __name__ == "__main__":
    main()
