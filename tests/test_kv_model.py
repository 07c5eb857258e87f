"""KVModel end-to-end wiring tests (untrained net: checks plumbing, shapes,
charset conventions, eval counters — not accuracy)."""

import os

import numpy as np
import pytest

from msau_tpu.config import InferConfig, ModelConfig
from msau_tpu.data.pages import load_label_json_page
from msau_tpu.infer.kv_model import KVModel, INFER_SPECIALS
from msau_tpu.infer.schema import FieldSchema

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kv_sample.json")


@pytest.fixture(scope="module")
def charset_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cs") / "charset.txt"
    chars = sorted(set("Bank NameFirst National Account 0123456789 Alexandra Example Savings"))
    p.write_text("".join(chars))
    return str(p)


def make_kv_model(charset_file, n_class=9):
    schema = FieldSchema(
        class_names=tuple(
            ["NUL"] + [f"{p}_f{i}" for i in range(1, (n_class + 1) // 2) for p in ("k", "v")]
        )[:n_class],
        multiple_lines_fields=(),
    )
    import jax

    kv = KVModel(infer_config=InferConfig(n_class=n_class), schema=schema)
    kv.load(charset=charset_file, n_class=n_class)
    # tiny random params
    mc = ModelConfig(
        img_channels=kv.charset.n_token, n_class=n_class,
        scale_space_num=2, res_depth=1, feat_root=4, num_blocks=1,
    )
    kv.model_config = mc
    from msau_tpu.models.msau import build_model
    import jax.numpy as jnp

    kv.model = build_model(mc)
    sample = jnp.zeros((1, 64, 64, kv.charset.n_token))
    kv.params = kv.model.init(jax.random.PRNGKey(0), sample)
    return kv


class TestKVModel:
    def test_charset_specials(self, charset_file):
        kv = KVModel()
        kv.load(charset=charset_file, n_class=5)
        assert kv.charset.chars[:2] == "".join(INFER_SPECIALS)
        assert kv.charset.blank_idx == 1

    def test_predict_runs_end_to_end(self, charset_file):
        kv = make_kv_model(charset_file)
        results, extras = kv.predict(FIXTURE)
        assert isinstance(results, dict)
        assert set(results.keys()) == {f"f{i}" for i in range(1, 5)}
        # digit normalization happened: page contains digits, charset has '0'
        page = load_label_json_page(FIXTURE)
        assert any(c.isdigit() for l in page.lines for c in l.text)
        assert extras["pred"].shape[-1] == kv.n_class

    def test_run_test_with_labels(self, charset_file, tmp_path):
        kv = make_kv_model(charset_file)
        label_dir = os.path.dirname(FIXTURE)
        kv_results, eval_results, summary = kv.run_test(
            [FIXTURE], label_dir=label_dir
        )
        assert len(kv_results) == 1
        # GT value ids 1,2,3 -> +1 -> classes 2,3,4 (id 1 would be dropped,
        # but only a 0-valued line maps there and value_idx>0 filters it)
        labeled = [c for c, r in enumerate(eval_results) if r["num_label"] > 0]
        assert labeled == [2, 3, 4]
        assert summary is not None and 0.0 <= summary["f1"] <= 1.0

    def test_predict_accepts_page_object(self, charset_file):
        kv = make_kv_model(charset_file)
        page = load_label_json_page(FIXTURE)
        results, _ = kv.predict(page)
        assert isinstance(results, dict)

    @pytest.mark.slow
    def test_load_from_checkpoint(self, charset_file, tmp_path):
        """KVModel.load(model_weight=...) restores orbax params saved by the
        Trainer — the train -> serve handoff."""
        import jax
        import orbax.checkpoint as ocp

        kv = make_kv_model(charset_file)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(tmp_path / "w"), kv.params, force=True)
        ckptr.wait_until_finished()

        kv2 = KVModel(
            model_config=kv.model_config,
            infer_config=InferConfig(n_class=kv.n_class),
            schema=kv.schema,
        )
        kv2.load(
            model_weight=str(tmp_path / "w"),
            charset=charset_file,
            n_class=kv.n_class,
        )
        import numpy as np

        for a, b in zip(
            jax.tree_util.tree_leaves(kv.params),
            jax.tree_util.tree_leaves(kv2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        r1, _ = kv.predict(FIXTURE)
        r2, _ = kv2.predict(FIXTURE)
        assert r1 == r2

    @pytest.mark.slow
    def test_predict_batch_matches_single(self, charset_file):
        kv = make_kv_model(charset_file)
        page = load_label_json_page(FIXTURE)
        single, _ = kv.predict(page)
        batched = kv.predict_batch([page, page])
        assert len(batched) == 2
        for res, _values in batched:
            assert res == single

    def test_single_line_page(self, charset_file):
        from msau_tpu.data.pages import Line, Page

        kv = make_kv_model(charset_file)
        page = Page(lines=[Line(box=(10, 10, 200, 40), text="Account 123", label=0)])
        results, extras = kv.predict(page)
        assert isinstance(results, dict)

    def test_empty_text_lines_page(self, charset_file):
        from msau_tpu.data.pages import Line, Page

        kv = make_kv_model(charset_file)
        page = Page(lines=[
            Line(box=(10, 10, 100, 30), text="", label=0),
            Line(box=(10, 50, 120, 75), text="Savings", label=0),
        ])
        results, _ = kv.predict(page)
        assert isinstance(results, dict)

    def test_schema_alignment_on_load(self, charset_file):
        """n_class different from the default 17-name schema must align."""
        kv = KVModel(infer_config=InferConfig(n_class=9))
        kv.load(charset=charset_file, n_class=9)
        assert kv.schema.n_class == 9
        kv21 = KVModel(infer_config=InferConfig(n_class=21))
        kv21.load(charset=charset_file, n_class=21)
        assert kv21.schema.n_class == 21
        assert all(n[:2] in ("k_", "v_") or n == "NUL" for n in kv21.schema.class_names)
