"""Flagship train step with lane-aligned flat geometries on the first K
scales (K=0 baseline, K=1, K=3), device-trace timed.

Run solo on the chip:  python scripts/exp_model_aligned.py [K ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ktime import device_ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_default_matmul_precision", "BF16_BF16_F32_X3")

    import msau_tpu.models.flat_layers as fl
    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data.synth import make_structured_batch
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.optimizer import make_optimizer
    from msau_tpu.train.trainer import TrainState, make_train_step

    orig = fl.make_scale_geoms
    K_holder = {"k": 0}

    def patched(h, w, n_scales, itemsize=2, pool=2, feat_root=8,
                n_class=17):
        from msau_tpu.ops.flatconv import choose_geom

        geoms = list(orig(h, w, n_scales, itemsize, pool, feat_root,
                          n_class))
        hh, ww = h, w
        for s in range(n_scales):
            if s < K_holder["k"]:
                cin = 2 * feat_root * pool ** s
                if s == 0:
                    cin = max(cin, n_class)
                try:
                    geoms[s] = choose_geom(hh, ww, itemsize=itemsize,
                                           max_cin=cin, wp_mod=128)
                except ValueError:
                    pass
            hh = -(-hh // pool)
            ww = -(-ww // pool)
        return geoms

    fl.make_scale_geoms = patched

    bs, hw = 16, 512
    ks = [int(a) for a in sys.argv[1:]] or [0, 1, 3]
    for K in ks:
        K_holder["k"] = K
        cfg = ModelConfig(
            img_channels=64, n_class=17, scale_space_num=4, res_depth=2,
            feat_root=8, num_blocks=3, final_act="softmax", remat=False,
            dtype="bfloat16", flat_scales=3,
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
        step = make_train_step(model, optimizer, masked=True, donate=False)
        jstep = jax.jit(step)
        state2, m = jstep(state, batch)
        print(f"K={K} loss after 1 step: {float(m['loss']):.4f}", flush=True)
        t = device_ms(jstep, state, batch, iters=5, warmup=1)
        print(f"K={K} aligned scales: {t:7.1f} ms/step "
              f"({bs / t * 1e3:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
