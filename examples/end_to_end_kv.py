"""End-to-end demo: train a small MSAU on a synthetic document, then run
the full KV extraction pipeline and score it.

This exercises every layer of the framework in one file:
  page JSON → chargrid rasterization → MSAU training → on-device decode
  → field strings → IoU-matched P/R/F1.

Run (CPU ok):  python examples/end_to_end_kv.py
Expected: F1 = 1.0 after ~120 training steps.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import msau_tpu

    msau_tpu.configure_tpu_precision()  # required for stable TPU training

    from msau_tpu.config import InferConfig, ModelConfig
    from msau_tpu.data.pages import load_label_json_page
    from msau_tpu.data.rasterize import paint_boxes, round_up
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.infer.schema import FieldSchema
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.loss import unet_loss

    here = os.path.dirname(os.path.abspath(__file__))
    fixture = os.path.join(here, "..", "tests", "fixtures", "kv_sample.json")

    # -- charset + schema ------------------------------------------------
    chars = "".join(sorted(set(
        "Bank NameFirst National Account 0123456789Alexandra Example Savings"
    )))
    charset_path = "/tmp/msau_demo_charset.txt"
    with open(charset_path, "w") as f:
        f.write(chars)

    n_class = 9
    schema = FieldSchema(
        class_names=tuple(
            ["NUL"] + [f"{p}_f{i}" for i in range(1, 5) for p in ("k", "v")]
        )[:n_class],
        multiple_lines_fields=(),
    )

    # -- rasterize the training page (class = value_id + 1) --------------
    page = load_label_json_page(fixture)
    page_train = dataclasses.replace(
        page,
        lines=[
            dataclasses.replace(l, label=(l.value + 1 if l.value > 0 else 0))
            for l in page.lines
        ],
    )
    kv = KVModel(infer_config=InferConfig(n_class=n_class), schema=schema)
    kv.load(charset=charset_path, n_class=n_class)
    x, line_id, char_id, scaled, progs = kv.rasterize(page_train)
    hb, wb = x.shape[:2]
    lab = progs.label.padded(round_up(max(len(progs.label.values), 1), 128))
    label = paint_boxes(jnp.asarray(lab.boxes), jnp.asarray(lab.values), hb, wb)
    print(f"rasterized {hb}x{wb}x{x.shape[-1]}, classes {np.unique(np.asarray(label))}")

    # -- train -----------------------------------------------------------
    mc = ModelConfig(
        img_channels=kv.charset.n_token, n_class=n_class,
        scale_space_num=3, res_depth=1, feat_root=8, num_blocks=2,
    )
    model = build_model(mc)
    xb, yb = x[None], label[None]
    params = model.init(jax.random.PRNGKey(0), xb)
    cw = jnp.asarray([0.02] + [1.0] * (n_class - 1))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, logits, aux = model.apply(p, xb, train=True)
            return unet_loss(logits, yb, aux_logits=aux, class_weights=cw)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, metrics

    for i in range(120):
        params, opt_state, loss, metrics = step(params, opt_state)
        if i % 30 == 0:
            print(f"step {i}: loss {float(loss):.4f} acc {float(metrics['accuracy']):.3f}")

    # -- infer + evaluate --------------------------------------------------
    kv.model_config = mc
    kv.model = model
    kv.params = params
    results, _ = kv.predict(page_train)
    print("extracted fields:", {k: v for k, v in results.items() if v})

    ev = [dict(num_pred=0, num_correct=0, num_label=0) for _ in range(n_class)]
    kv.predict(page_train, label_path=fixture, eval_results=ev)
    nc = sum(e["num_correct"] for e in ev)
    nl = sum(e["num_label"] for e in ev)
    npd = sum(e["num_pred"] for e in ev)
    p = nc / max(npd, 1)
    r = nc / max(nl, 1)
    f1 = 2 * p * r / max(p + r, 1e-9)
    print(f"field eval: P={p:.2f} R={r:.2f} F1={f1:.2f}")
    return f1


if __name__ == "__main__":
    f1 = main()
    assert f1 > 0.9, f"demo should reach F1~1.0, got {f1}"
    print("OK")
