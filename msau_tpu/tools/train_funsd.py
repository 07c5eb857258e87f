"""CLI: entry-A FUNSD word-grid training.

Equivalent of train_chargrid_funsd_msau.py:175-258: load preprocessed
pickles, 80/20 split (seed 777), build MSAU from model_kwargs, Adam lr=1e-4
with grad clipping and masked CE, per-epoch train/val/test micro metrics,
classification report on test, checkpoints every 10 epochs.

Usage:
  python -m msau_tpu.tools.train_funsd --data_dir ./preprocessed \
      --ckptdir ./ckpt --epochs 300
"""

import argparse
import json
import os
import random
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--ckptdir", default="ckpt")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--train_ratio", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--model_kwargs_path", default=None)
    p.add_argument(
        "--features", default="chargrid", choices=["chargrid", "bert", "bow"],
        help="input grid: per-char one-hot (chargrid), or per-cell BERT/BOW "
             "feature boxes (data_generator_funsd_bert.py variants)",
    )
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--checkpoint_every", type=int, default=10)
    p.add_argument("--max_eval_examples", type=int, default=100)
    p.add_argument("--flat_scales", type=int, default=0,
                   help="shallow scales in the channel-major Pallas layout "
                        "(TPU training speedup; 2 for the flagship config)")
    p.add_argument("--devices", type=int, default=1,
                   help="data-parallel device count: builds a 'data' Mesh "
                        "and shards batches over it (GSPMD gradient psum)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="global batch (reference entry A is 1); must be a "
                        "multiple of --devices; same-shape grids are "
                        "grouped, leftovers train at batch 1 (single "
                        "device) or are dropped (multi-device)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig, TrainConfig
    from msau_tpu.data import wordgrid as wg
    from msau_tpu.data.pages import FUNSD_LABEL_TO_ID
    from msau_tpu.train.trainer import Trainer
    from msau_tpu.utils import metrics as M
    from msau_tpu.utils.io import create_filename, gen_prefix

    random.seed(args.seed)
    train_ex, charset = wg.load_preprocessed(
        os.path.join(args.data_dir, "funsd_preprocess_train_word.pkl")
    )
    test_path = os.path.join(args.data_dir, "funsd_preprocess_test_word.pkl")
    test_ex = wg.load_preprocessed(test_path)[0] if os.path.exists(test_path) else []

    n_class = len(FUNSD_LABEL_TO_ID) + 1  # labels shifted by +1, 0 = ignore
    if args.model_kwargs_path:
        with open(args.model_kwargs_path) as f:
            mc = ModelConfig.from_model_kwargs(json.load(f))
    else:
        mc = ModelConfig(
            model="msau", final_act="softmax", feat_root=8, scale_space_num=4,
            res_depth=2, n_class=n_class, img_channels=charset.n_token,
            flat_scales=args.flat_scales,
        )
        os.makedirs(args.ckptdir, exist_ok=True)
        with open(os.path.join(args.ckptdir, "model_kwargs.json"), "w") as f:
            json.dump(mc.to_model_kwargs(), f)

    idx = list(range(len(train_ex)))
    random.shuffle(idx)
    cut = int(len(idx) * args.train_ratio)
    tr_idx, val_idx = idx[:cut], idx[cut:]
    print(f"train {len(tr_idx)} / val {len(val_idx)} / test {len(test_ex)}")

    # rasterize once (grids are deterministic in the word-grid path)
    def featurize(ex):
        if args.features == "chargrid":
            return wg.rasterize_wordgrid(ex, charset)
        from msau_tpu.data import featgrid as fgd

        if args.features == "bow":
            feats, _ = wg.bow_features(ex.line_texts)
        else:
            feats = wg.sentence_embedding_features(ex.line_texts)
        return fgd.rasterize_feature_example(ex, feats, style="box")

    def make_batches(indices, examples):
        out = []
        for i in indices:
            ex = examples[i] if isinstance(i, int) else i
            g = featurize(ex)
            out.append({k: v[None] for k, v in g.items()})
        return out

    train_batches = make_batches(tr_idx, train_ex)
    # non-chargrid features change the input width; fix up the model config
    feat_dim = train_batches[0]["input"].shape[-1]
    if mc.img_channels != feat_dim:
        import dataclasses

        mc = dataclasses.replace(mc, img_channels=feat_dim)
    val_batches = make_batches(val_idx, train_ex)
    test_batches = make_batches(list(test_ex), None) if test_ex else []

    if args.batch_size > 1:
        assert args.batch_size % args.devices == 0, (
            "--batch_size must be a multiple of --devices"
        )
        by_shape = {}
        for b in train_batches:
            by_shape.setdefault(b["input"].shape, []).append(b)
        grouped = []
        for items in by_shape.values():
            for i in range(0, len(items), args.batch_size):
                chunk = items[i : i + args.batch_size]
                if len(chunk) == args.batch_size:
                    grouped.append(
                        {k: np.concatenate([c[k] for c in chunk]) for k in chunk[0]}
                    )
                elif args.devices == 1:
                    grouped.extend(chunk)  # leftover singles still train
        print(f"grouped into {len(grouped)} batches of <= {args.batch_size}")
        train_batches = grouped

    tc = TrainConfig(
        optimizer="adam", learning_rate=args.lr, lr_decay_staircase=False,
        grad_clip_norm=1.0, masked_loss=True, seed=args.seed,
    )
    mesh = None
    if args.devices > 1:
        from msau_tpu.parallel.sharding import make_mesh

        n_avail = len(jax.devices())
        assert args.devices <= n_avail, (
            f"--devices {args.devices} but only {n_avail} available"
        )
        mesh = make_mesh((args.devices,), ("data",))
    trainer = Trainer(mc, tc, mesh=mesh)
    trainer.init_state(train_batches[0]["input"])
    prefix = gen_prefix("funsd", "msau", mc.feat_root, n_class)

    def evaluate(batches, name, testing=False, max_n=None):
        labels, preds = [], []
        for bi, b in enumerate(batches):
            _, logits, _ = jax.jit(trainer.model.apply)(
                trainer.state.params, jnp.asarray(b["input"])
            )
            pred = np.asarray(jnp.argmax(logits[0], -1))
            lab = b["label"][0]
            keep = lab != 0
            pr = pred[keep]
            if testing:
                pr = np.where(pr == 0, FUNSD_LABEL_TO_ID["other"] + 1, pr)
            labels.append(lab[keep])
            preds.append(pr)
            if max_n and bi + 1 >= max_n:
                break
        labels = np.concatenate(labels) if labels else np.zeros(0, int)
        preds = np.concatenate(preds) if preds else np.zeros(0, int)
        m = M.micro_metrics(labels, preds, drop_background=False)
        print(f"{name} acc: {m['acc']:.4f}")
        if testing and labels.size:
            names = ["bg"] + [
                k for k, _ in sorted(FUNSD_LABEL_TO_ID.items(), key=lambda kv: kv[1])
            ]
            print(M.classification_report(labels, preds, target_names=names,
                                          n_class=n_class))
        return m

    for epoch in range(args.epochs):
        t0 = time.time()
        total = 0.0
        for bi, b in enumerate(train_batches):
            trainer.state, mets = trainer.train_step(trainer.state, trainer.put_batch(b))
            total += float(mets["loss"])
            if bi % 10 == 0:
                print(f"batch {bi} loss {float(mets['loss']):.4f}")
        print(f"epoch {epoch}: avg loss {total / max(len(train_batches), 1):.4f} "
              f"({time.time() - t0:.1f}s)")
        if (epoch + 1) % args.eval_every == 0:
            evaluate(train_batches, "Train", max_n=args.max_eval_examples)
            if val_batches:
                evaluate(val_batches, "Validation")
            if test_batches:
                evaluate(test_batches, "Test", testing=True)
        if epoch % args.checkpoint_every == 0:
            trainer.save(create_filename(args.ckptdir, prefix, epoch))
    trainer.save(create_filename(args.ckptdir, prefix, args.epochs))
    print("Finished")


if __name__ == "__main__":
    main()
