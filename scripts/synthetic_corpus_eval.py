"""Held-out accuracy point: train on a synthetic multi-page KV corpus and
report field-level P/R/F1 on unseen pages (VERDICT round-1 next-step #9 —
no FUNSD annotations exist in this environment, so the corpus is generated
in the labeling-tool JSON format the reference consumes; generator in
msau_tpu/data/synth.py).

The model never sees the held-out layouts or value strings.  The F1 metric
replays the reference acceptance metric (inference/kv_model.py:374-385,
IoU > 0.7 box matching).

Run:  python scripts/synthetic_corpus_eval.py \
          [--quick | --smoke] [--cpu] [--dtype f32|bf16] [--flat N]
Prints one JSON line {"precision", "recall", "f1", ...}.

The round-3 accuracy protocol (VERDICT round-2 #1) runs this twice on-chip:
  --dtype f32  --flat 0   (plain NHWC/f32 graph)
  --dtype bf16 --flat 2   (flagship fast path: flat Pallas kernels, bf16)
and asserts the two F1s match — the custom-VJP fast path must not cost
accuracy.
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small corpus / few epochs")
    ap.add_argument("--smoke", action="store_true",
                    help="minimal corpus, 2 epochs — CI smoke test")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--flat", type=int, default=0,
                    help="ModelConfig.flat_scales (channel-major fast path)")
    ap.add_argument("--epochs", type=int, default=0, help="override epochs")
    ap.add_argument("--seed", type=int, default=0,
                    help="model-init PRNG seed (corpus stays fixed, so "
                    "seed sweeps estimate training-run variance)")
    ap.add_argument("--train_pages", type=int, default=0)
    ap.add_argument("--test_pages", type=int, default=0,
                    help="held-out pages (VERDICT r3 #5: 50+ pages / "
                    "~400 fields for a statistically real F1)")
    ap.add_argument("--model", default="msau", choices=["msau", "msau_box"],
                    help="msau_box = BMSAU box-convolution variant "
                    "(reference model/model_box.py:313-406)")
    # BMSAU quality-gap sweep knobs (VERDICT r4 #5)
    ap.add_argument("--num_boxes", type=int, default=0,
                    help="msau_box: boxes per channel (default config: 3)")
    ap.add_argument("--max_box_size", type=int, default=0,
                    help="msau_box: coordinate clamp (default: 28)")
    ap.add_argument("--lr", type=float, default=0.0,
                    help="override adam learning rate (default 2e-3)")
    ap.add_argument("--scales", type=int, default=3,
                    help="scale_space_num (flat 3 needs 4: the deepest "
                    "attention scale stays NHWC)")
    ap.add_argument("--box_lr", type=float, default=0.0,
                    help="msau_box: decoupled LR for the box coordinate "
                    "params (ybox/xbox); default = --lr")
    args = ap.parse_args(argv)
    quick = args.quick or args.smoke

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax

    import msau_tpu

    msau_tpu.configure_tpu_precision()
    try:  # reuse compiled kernels across runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from msau_tpu.config import InferConfig, ModelConfig
    from msau_tpu.data.pages import load_label_json_page
    from msau_tpu.data.rasterize import paint_boxes, round_up
    from msau_tpu.data.synth import write_corpus
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.infer.schema import FieldSchema
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.loss import unet_loss

    rng = np.random.default_rng(7)
    if args.smoke:
        n_train, n_test = 2, 1
    elif args.quick:
        n_train, n_test = 6, 3
    else:
        n_train, n_test = 40, 12
    if args.train_pages:
        n_train = args.train_pages
    if args.test_pages:
        n_test = args.test_pages
    out_dir = tempfile.mkdtemp(prefix="msau_corpus_")
    train_paths, test_paths, charset_path = write_corpus(
        out_dir, n_train, n_test, rng
    )

    n_class = 17
    schema = FieldSchema()  # default bank-transfer schema, multiline (5, 11)
    kv = KVModel(infer_config=InferConfig(n_class=n_class), schema=schema)
    kv.load(charset=charset_path, n_class=n_class)

    # rasterize training pages with the SAME kv rasterizer used at
    # inference (digit normalization, scale 3.0); class = value + 1
    def training_example(path):
        page = load_label_json_page(path)
        page = dataclasses.replace(
            page,
            lines=[
                dataclasses.replace(l, label=(l.value + 1 if l.value > 0 else 0))
                for l in page.lines
            ],
        )
        x, line_id, char_id, scaled, progs = kv.rasterize(page)
        hb, wb = x.shape[:2]
        lab = progs.label.padded(round_up(max(len(progs.label.values), 1), 128))
        label = paint_boxes(jnp.asarray(lab.boxes), jnp.asarray(lab.values), hb, wb)
        return np.asarray(x), np.asarray(label)

    examples = [training_example(p) for p in train_paths]
    import collections

    by_shape = collections.defaultdict(list)
    for x, y in examples:
        by_shape[x.shape].append((x, y))
    batches = []
    for shape, items in by_shape.items():
        bs = 4 if not quick else 2
        for i in range(0, len(items), bs):
            chunk = items[i : i + bs]
            batches.append(
                (
                    jnp.asarray(np.stack([c[0] for c in chunk])),
                    jnp.asarray(np.stack([c[1] for c in chunk])),
                )
            )
    print(f"{len(examples)} train pages in {len(batches)} batches "
          f"(shapes: {sorted(by_shape)})")

    mc = ModelConfig(
        model=args.model,
        img_channels=kv.charset.n_token, n_class=n_class,
        scale_space_num=args.scales, res_depth=2, feat_root=8,
        num_blocks=1 if quick else 2,
        dtype="bfloat16" if args.dtype == "bf16" else "float32",
        flat_scales=args.flat if args.model == "msau" else 0,
        **({"num_box_per_channel": args.num_boxes} if args.num_boxes else {}),
        **({"max_box_size": args.max_box_size} if args.max_box_size else {}),
    )
    model = build_model(mc)
    params = model.init(jax.random.PRNGKey(args.seed), batches[0][0][:1])
    cw = jnp.asarray([0.02] + [1.0] * (n_class - 1))
    lr = args.lr or 2e-3
    if args.box_lr and args.model == "msau_box":
        # decoupled box-coordinate LR: the coords are in PIXEL units while
        # the conv weights are O(1), so one global adam LR under-steps
        # them (VERDICT r4 #5 diagnosis sweep)
        import flax

        def label_fn(params):
            flat = flax.traverse_util.flatten_dict(params)
            lab = {k: ("box" if k[-1] in ("ybox", "xbox") else "rest")
                   for k in flat}
            return flax.traverse_util.unflatten_dict(lab)

        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.multi_transform(
                {"box": optax.adam(args.box_lr), "rest": optax.adam(lr)},
                label_fn))
    else:
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(params)

    # flat_scales emits compact NCHW logits straight from the body layout;
    # the channel_axis-aware loss consumes them without the padded NHWC
    # transpose (same wiring as train/trainer.py:68-90)
    layout = "NCHW" if mc.flat_scales > 0 else "NHWC"
    caxis = 1 if mc.flat_scales > 0 else -1

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            _, logits, aux = model.apply(p, xb, train=True,
                                         logits_layout=layout)
            return unet_loss(logits, yb, aux_logits=aux, class_weights=cw,
                             channel_axis=caxis)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, metrics

    if args.epochs:
        epochs = args.epochs
    elif args.smoke:
        epochs = 2
    elif args.quick:
        epochs = 10
    else:
        epochs = 60
    t0 = time.time()
    for e in range(epochs):
        tot = 0.0
        for xb, yb in batches:
            params, opt_state, loss, metrics = step(params, opt_state, xb, yb)
            tot += float(loss)
        if e % max(epochs // 6, 1) == 0:
            print(f"epoch {e}: loss {tot / len(batches):.4f} "
                  f"acc {float(metrics['accuracy']):.3f}")
    print(f"trained in {time.time() - t0:.1f}s")

    box_drift = None
    if args.model == "msau_box":
        # VERDICT r3 #3: the analytic box-coordinate gradients through the
        # banded-matmul form must actually MOVE the learned boxes
        import flax

        p0 = flax.traverse_util.flatten_dict(
            model.init(jax.random.PRNGKey(args.seed), batches[0][0][:1]))
        p1 = flax.traverse_util.flatten_dict(params)
        drifts = []
        for k, v0 in p0.items():
            if any("box" in str(part).lower() for part in k):
                v1 = p1[k]
                drifts.append(float(jnp.sqrt(jnp.mean(
                    (jnp.asarray(v1, jnp.float32)
                     - jnp.asarray(v0, jnp.float32)) ** 2))))
        box_drift = float(np.mean(drifts)) if drifts else 0.0
        print(f"box-coordinate RMS drift over training: {box_drift:.4f} "
              f"({len(drifts)} box param tensors)")

    # serve through the NHWC/f32 graph regardless of the training layout
    # (KVModel.load strips flat_scales the same way); param trees are
    # layout-independent so the trained params drop straight in
    kv.model_config = dataclasses.replace(mc, flat_scales=0, dtype="float32")
    kv.model = build_model(kv.model_config)
    kv.params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params
    )

    _, eval_results, summary = kv.run_test(
        test_paths, label_dir=out_dir
    )

    # per-pixel micro metrics on the held-out pages (reference
    # train_chargrid_funsd_msau.py:148-163 definition): non-background
    # pixels of the rasterized label vs the served argmax map
    tp = fp = fn = 0
    for path in test_paths:
        page = load_label_json_page(path)
        page = dataclasses.replace(
            page,
            lines=[
                dataclasses.replace(l, label=(l.value + 1 if l.value > 0
                                              else 0))
                for l in page.lines
            ],
        )
        x, line_id, char_id, scaled, progs = kv.rasterize(page)
        hb, wb = x.shape[:2]
        lab = progs.label.padded(
            round_up(max(len(progs.label.values), 1), 128))
        label = np.asarray(paint_boxes(jnp.asarray(lab.boxes),
                                       jnp.asarray(lab.values), hb, wb))
        probs = kv.forward(kv.params, jnp.asarray(x)[None])
        pred = np.asarray(jnp.argmax(probs[0], axis=-1))
        nz = label != 0
        tp += int(((pred == label) & nz).sum())
        fn += int(((pred != label) & nz).sum())
        fp += int(((pred != label) & (pred != 0)).sum())
    pix_p = tp / max(tp + fp, 1)
    pix_r = tp / max(tp + fn, 1)
    print(f"pixel micro precision {pix_p:.4f} recall {pix_r:.4f}")
    result = {
        "metric": "held-out synthetic corpus field F1",
        "train_pages": n_train,
        "test_pages": n_test,
        "dtype": args.dtype,
        "flat_scales": args.flat,
        "epochs": epochs,
        "seed": args.seed,
        "model": args.model,
        "pixel_precision": round(pix_p, 4),
        "pixel_recall": round(pix_r, 4),
        **({"box_drift": round(box_drift, 5)} if box_drift is not None
           else {}),
        **{k: round(v, 4) for k, v in summary.items()},
    }
    print(json.dumps(result))
    return summary["f1"]


if __name__ == "__main__":
    main()
