"""Held-out accuracy point: train on a synthetic multi-page KV corpus and
report field-level P/R/F1 on unseen pages (VERDICT round-1 next-step #9 —
no FUNSD annotations exist in this environment, so the corpus is generated
in the labeling-tool JSON format the reference consumes).

Each page is a randomized bank-transfer-style form over the default
17-class schema: 8 key/value pairs with jittered layout, per-field value
generators, random field dropout, and an occasionally multi-line field
(value 4 → class 5, one of the reference ``multiple_lines_fields``).  The
model never sees the held-out layouts or value strings.

Run:  python scripts/synthetic_corpus_eval.py [--quick] [--cpu]
Prints one JSON line {"precision", "recall", "f1", ...}.
"""

import dataclasses
import json
import os
import string
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

FIELDS = [
    # (key text, value generator)
    ("Bank Name", "words"),
    ("Branch", "words"),
    ("Account No", "digits"),
    ("Amount", "amount"),       # value 4 -> class 5: multi-line capable
    ("Holder", "name"),
    ("Kana", "words"),
    ("Branch Code", "digits"),
    ("Institution", "words"),
]

WORDS = [
    "First", "National", "Central", "Pacific", "Union", "Metro", "Trust",
    "Sakura", "Mizuho", "Plaza", "Harbor", "Summit", "Valley", "River",
]
NAMES = ["Alexandra", "Tanaka", "Suzuki", "Jordan", "Morgan", "Casey", "Robin"]


def gen_value(kind, rng):
    if kind == "digits":
        return "".join(rng.choice(list(string.digits), rng.integers(5, 9)))
    if kind == "amount":
        return "%s,%03d" % (
            "".join(rng.choice(list("123456789"), 1)), rng.integers(0, 1000)
        )
    if kind == "name":
        return " ".join(rng.choice(NAMES, 2))
    return " ".join(rng.choice(WORDS, rng.integers(1, 3)))


def make_page(rng):
    """One randomized form in labeling-tool JSON dict format."""
    w = int(rng.integers(500, 700))
    lines = []
    y = int(rng.integers(30, 60))
    order = rng.permutation(len(FIELDS))
    for fi in order:
        key, kind = FIELDS[fi]
        if rng.random() < 0.15:      # field dropout
            continue
        vtext = gen_value(kind, rng)
        xk = int(rng.integers(20, 60))
        kw_ = 14 * len(key)
        lines.append({"box": [xk, y, xk + kw_, y + 24], "text": key,
                      "type": 1, "value": 0})
        xv = xk + kw_ + int(rng.integers(20, 60))
        lines.append({"box": [xv, y, xv + 14 * len(vtext), y + 24],
                      "text": vtext, "type": 2, "value": int(fi) + 1})
        y += int(rng.integers(34, 56))
        # multi-line continuation for the Amount field (class 5)
        if kind == "amount" and rng.random() < 0.5:
            cont = gen_value("digits", rng)
            lines.append({"box": [xv, y, xv + 14 * len(cont), y + 24],
                          "text": cont, "type": 2, "value": int(fi) + 1})
            y += int(rng.integers(34, 56))
    return {"img_shape": [y + 30, w], "lines": lines}


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp
    import optax

    import msau_tpu

    msau_tpu.configure_tpu_precision()

    from msau_tpu.config import InferConfig, ModelConfig
    from msau_tpu.data.charset import Charset
    from msau_tpu.data.pages import load_label_json_page
    from msau_tpu.data.rasterize import paint_boxes, round_up
    from msau_tpu.infer.kv_model import KVModel
    from msau_tpu.infer.schema import FieldSchema
    from msau_tpu.models.msau import build_model
    from msau_tpu.train.loss import unet_loss

    rng = np.random.default_rng(7)
    n_train, n_test = (6, 3) if quick else (40, 12)
    out_dir = tempfile.mkdtemp(prefix="msau_corpus_")
    train_paths, test_paths = [], []
    corpus = []
    for i in range(n_train + n_test):
        doc = make_page(rng)
        p = os.path.join(out_dir, f"page{i:03d}.json")
        with open(p, "w") as f:
            json.dump(doc, f)
        (train_paths if i < n_train else test_paths).append(p)
        corpus.extend(l["text"] for l in doc["lines"])

    charset_path = os.path.join(out_dir, "charset.txt")
    with open(charset_path, "w") as f:
        f.write("".join(sorted(set("".join(corpus)))))

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
        img_channels=kv.charset.n_token, n_class=n_class,
        scale_space_num=3, res_depth=2, feat_root=8,
        num_blocks=1 if quick else 2,
    )
    model = build_model(mc)
    params = model.init(jax.random.PRNGKey(0), batches[0][0][:1])
    cw = jnp.asarray([0.02] + [1.0] * (n_class - 1))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            _, logits, aux = model.apply(p, xb, train=True)
            return unet_loss(logits, yb, aux_logits=aux, class_weights=cw)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, metrics

    epochs = 10 if quick else 60
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

    kv.model_config = mc
    kv.model = model
    kv.params = params

    _, eval_results, summary = kv.run_test(
        test_paths, label_dir=out_dir
    )
    result = {
        "metric": "held-out synthetic corpus field F1",
        "train_pages": n_train,
        "test_pages": n_test,
        **{k: round(v, 4) for k, v in summary.items()},
    }
    print(json.dumps(result))
    return summary["f1"]


if __name__ == "__main__":
    main()
