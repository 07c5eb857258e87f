"""CLI: FUNSD annotations → preprocessed word-grid pickles + charset.

Equivalent of funsd_preprocessing_word_level.py:117-126 (argparse instead
of hard-coded paths; charset is shared between train and test splits).

Usage:
  python -m msau_tpu.tools.preprocess_funsd \
      --train_dir dataset/training_data/annotations \
      --test_dir dataset/testing_data/annotations \
      --out_dir ./preprocessed
"""

import argparse
import os

from msau_tpu.data.charset import Charset
from msau_tpu.data import wordgrid as wg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_dir", required=True)
    p.add_argument("--test_dir", default=None)
    p.add_argument("--out_dir", default=".")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    train, corpus = wg.preprocess_funsd_dir(args.train_dir)
    charset = Charset.from_corpus(corpus)
    wg.save_preprocessed(
        os.path.join(args.out_dir, "funsd_preprocess_train_word.pkl"), train, charset
    )
    charset.save(os.path.join(args.out_dir, "charset.txt"))
    print(f"train: {len(train)} pages, charset {charset.n_token} tokens")
    if args.test_dir:
        test, _ = wg.preprocess_funsd_dir(args.test_dir)
        wg.save_preprocessed(
            os.path.join(args.out_dir, "funsd_preprocess_test_word.pkl"), test, charset
        )
        print(f"test: {len(test)} pages")


if __name__ == "__main__":
    main()
