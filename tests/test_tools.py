"""CLI tool + utils tests."""

import json
import os

import numpy as np
import pytest

from msau_tpu.utils import metrics as M
from msau_tpu.utils.io import (
    create_filename,
    gen_prefix,
    glob_folder,
    read_image_list,
    write_csv_report_by_row,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestMetrics:
    def test_micro_matches_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        labels = rng.integers(0, 5, 500)
        preds = rng.integers(0, 5, 500)
        keep = labels != 0
        m = M.micro_metrics(labels, preds)
        assert m["acc"] == pytest.approx(
            sk.accuracy_score(labels[keep], preds[keep])
        )
        assert m["prec"] == pytest.approx(
            sk.precision_score(labels[keep], preds[keep], average="micro")
        )

    def test_confusion_device_matches_host(self, rng):
        import jax.numpy as jnp

        labels = rng.integers(0, 4, (2, 8, 8))
        preds = rng.integers(0, 4, (2, 8, 8))
        want = M.confusion_matrix(labels, preds, 4)
        got = np.asarray(
            M.confusion_matrix_device(jnp.asarray(labels), jnp.asarray(preds), 4)
        )
        np.testing.assert_array_equal(got, want)

    def test_report_format(self, rng):
        labels = rng.integers(1, 4, 200)
        preds = rng.integers(1, 4, 200)
        rep = M.classification_report(labels, preds, ["bg", "q", "a", "h"], n_class=4)
        assert "accuracy" in rep and "q" in rep


class TestIO:
    def test_prefix_and_filename(self, tmp_path):
        prefix = gen_prefix("funsd", "msau", 8, 5)
        assert prefix == "funsd_msau_h8_o5"
        p = create_filename(str(tmp_path), prefix, 3)
        assert p.endswith("funsd_msau_h8_o5/3")
        assert os.path.isdir(os.path.dirname(p))

    def test_read_image_list(self, tmp_path):
        lst = tmp_path / "x.lst"
        lst.write_text("a.json\nb.json\n\n")
        assert read_image_list(str(lst), prefix="/d") == ["/d/a.json", "/d/b.json"]

    def test_glob_and_csv(self, tmp_path):
        fm = glob_folder(FIXTURES, "json")
        assert "funsd_sample" in fm
        out = tmp_path / "r.csv"
        write_csv_report_by_row(str(out), ["a.json"], [{"f1": "x", "f2": "y"}])
        body = out.read_text()
        assert "f1" in body and "x" in body


class TestExtractor:
    def test_via_extraction(self, tmp_path):
        via = {
            "img1.jpg": {
                "filename": "img1.jpg",
                "regions": [
                    {
                        "shape_attributes": {"name": "rect", "x": 10, "y": 10, "width": 50, "height": 20},
                        "region_attributes": {"label": "Account 123", "type": "key", "formal_key": "account_number"},
                    },
                    {
                        "shape_attributes": {"name": "polygon", "all_points_x": [70, 120, 120, 70], "all_points_y": [10, 10, 30, 30]},
                        "region_attributes": {"label": "98765", "type": "value", "formal_key": "account_number"},
                    },
                    {
                        "shape_attributes": {"name": "rect", "x": 10, "y": 50, "width": 40, "height": 15},
                        "region_attributes": {"label": "note", "type": "other"},
                    },
                ],
            }
        }
        src = tmp_path / "labels"
        src.mkdir()
        (src / "img1.json").write_text(json.dumps(via))
        out = tmp_path / "out"

        from msau_tpu.tools.extract_training_data import DataExtractor

        ex = DataExtractor(str(out), ["account_number"])
        n = ex.process(str(src))
        assert n == 1
        doc = json.loads((out / "img1.json").read_text())
        lines = doc["lines"]
        assert len(lines) == 3
        key_line = next(l for l in lines if l["type"] == 1)
        assert key_line["value"] == 1
        assert key_line["text"] == "Account 000"  # digits normalized
        val_line = next(l for l in lines if l["type"] == 2)
        assert val_line["value"] == 2
        assert val_line["box"] == [70, 10, 120, 30]  # polygon -> bbox
        charset = (out / "charset.txt").read_text()
        assert "0" in charset and "A" in charset

    def test_random_split(self, tmp_path):
        for i in range(10):
            (tmp_path / f"f{i}.json").write_text("{}")
        from msau_tpu.tools.random_split import random_split

        tr, va = random_split(str(tmp_path), 0.7, seed=1)
        assert len(tr) == 7 and len(va) == 3
        assert set(tr) | set(va) == {f"f{i}.json" for i in range(10)}


class TestPreprocessCLI:
    def test_preprocess_funsd_main(self, tmp_path):
        from msau_tpu.tools.preprocess_funsd import main

        main(["--train_dir", FIXTURES, "--out_dir", str(tmp_path)])
        assert (tmp_path / "funsd_preprocess_train_word.pkl").exists()
        assert (tmp_path / "charset.txt").exists()
