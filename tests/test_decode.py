"""KV decode tests: device decoder vs an independent scipy implementation of
the reference extraction policy, plus reading-order and schema tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.infer.decode import decode_fields_device, extract_values
from msau_tpu.infer.reading_order import sort_box_reading_order
from msau_tpu.infer.schema import FieldSchema, post_process_kv
from msau_tpu.data.pages import Line

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def scipy_reference_decode(pred, line_mask, char_mask, lines, schema):
    """Independent NumPy/scipy replay of the reference policy
    (inference/kv_model.py:151-261) for parity checking."""
    n_class = pred.shape[2]
    values = [("", None)] * n_class
    pred_class = np.argmax(pred, axis=-1)
    line_used = np.zeros(len(lines) + 1, np.int64)
    line_ids_for_field = [[] for _ in range(n_class)]
    chosen_masks = [None] * n_class
    main_boxes = [None] * n_class

    for c in range(2, n_class):
        cmap = pred_class == c
        cmap = scipy_ndimage.minimum_filter(
            scipy_ndimage.maximum_filter(cmap, (1, 3), mode="constant"),
            (1, 3), mode="constant",
        )
        labels, _ = scipy_ndimage.label(cmap)
        objects = scipy_ndimage.find_objects(labels)
        if len(objects) == 0:
            continue
        area = lambda s: (s[1].stop - s[1].start) * (s[0].stop - s[0].start)
        yc = lambda s: (s[0].stop + s[0].start) / 2
        if c in schema.multiple_lines_fields:
            order = np.argsort([-yc(o) for o in objects])
        else:
            order = np.argsort([area(o) for o in objects])
        main = order[-1]
        if area(objects[main]) < 5:
            continue
        alt_ids = []
        if c in schema.multiple_lines_fields and len(order) > 1:
            alt_ids = [i for i in order[:-1] if area(objects[i]) > 5]
        chosen = labels == main + 1
        line_ids = [i for i in np.unique(line_mask[labels == main + 1]) if i > 0]
        for a in alt_ids:
            chosen |= labels == a + 1
            line_ids += [i for i in np.unique(line_mask[labels == a + 1]) if i > 0]
        for i in line_ids:
            line_used[i] += 1
        line_ids_for_field[c] = sorted(set(int(i) for i in line_ids))
        chosen_masks[c] = chosen
        b = objects[main]
        main_boxes[c] = [b[1].start, b[0].start, b[1].stop, b[0].stop]

    out = [("", None)] * n_class
    for c in range(2, n_class):
        ids = line_ids_for_field[c]
        if not ids:
            continue
        recs = sort_box_reading_order([lines[i - 1] for i in ids])
        value = ""
        for line in recs:
            lid = line.id
            x1, y1, x2, y2 = line.box
            if line_used[lid] <= 1:
                value += line.text
            else:
                region = char_mask[y1:y2, x1:x2][chosen_masks[c][y1:y2, x1:x2] > 0]
                chars = set(np.unique(region)) - {0}
                if not chars:
                    continue
                cmin, cmax = min(chars), max(chars)
                if cmax > len(line.text) - 3:
                    cmax = len(line.text) + 1
                value += line.text[cmin - 2 if cmin >= 2 else 0 : cmax - 1]
            if c in schema.multiple_lines_fields:
                value += "\n"
        if value.endswith("\n"):
            value = value[:-1]
        out[c] = (value, main_boxes[c])
    return out


def make_synthetic_case(rng, n_class=8, h=96, w=128, n_lines=6):
    """Lines stacked vertically; class-c blobs over (parts of) lines."""
    lines = []
    line_mask = np.zeros((h, w), np.int32)
    char_mask = np.zeros((h, w), np.int32)
    y = 4
    for i in range(n_lines):
        x1, x2 = 8, 8 + int(rng.integers(40, 100))
        y1, y2 = y, y + 10
        text = "".join(chr(ord("a") + int(rng.integers(0, 26))) for _ in range(12))
        lines.append(Line(box=(x1, y1, x2, y2), text=text, id=i + 1))
        line_mask[y1:y2, x1:x2] = i + 1
        # char positions: 12 chars spread over the box
        cw = (x2 - x1) / 12
        for j in range(12):
            sx, ex = int(x1 + j * cw), int(x1 + (j + 1) * cw)
            char_mask[y1:y2, sx:ex] = j + 1
        y += 14
    pred = np.zeros((h, w, n_class), np.float32)
    pred[..., 0] = 0.6
    # drop class blobs: class 2 on line 1, class 3 on half of line 2,
    # class 5 (multiline) on lines 3+4, class 3 also gets noise speckles
    def blob(c, box):
        x1, y1, x2, y2 = box
        pred[y1:y2, x1:x2, :] = 0
        pred[y1:y2, x1:x2, c] = 1.0

    l = lines[0].box; blob(2, l)
    l2 = lines[1].box; blob(3, (l2[0], l2[1], (l2[0] + l2[2]) // 2, l2[3]))
    l3, l4 = lines[2].box, lines[3].box
    blob(5, l3); blob(5, l4)
    # speckle noise for class 4 (should be filtered by area < 5)
    pred[90:91, 3:4, :] = 0; pred[90:91, 3:4, 4] = 1.0
    return pred, line_mask, char_mask, lines


class TestDecodeParity:
    def test_matches_scipy_reference_policy(self, rng):
        schema = FieldSchema(
            class_names=tuple(f"c{i}" for i in range(8)),
            multiple_lines_fields=(5,),
        )
        pred, line_mask, char_mask, lines = make_synthetic_case(rng)
        want = scipy_reference_decode(pred, line_mask, char_mask, lines, schema)

        dev = decode_fields_device(
            jnp.asarray(pred), jnp.asarray(line_mask), jnp.asarray(char_mask),
            (5,), n_class=8, num_lines=128, k=8,
        )
        host = {k: np.asarray(v) for k, v in dev.items()}
        got = extract_values(host, lines, schema)
        for c in range(2, 8):
            assert got[c].text == want[c][0], f"class {c}: {got[c].text!r} != {want[c][0]!r}"
            if want[c][1] is not None:
                assert got[c].boxes[0] == want[c][1], f"class {c} main box"

    def test_shared_line_substring(self, rng):
        """Two classes on one line -> substring slicing via char positions."""
        schema = FieldSchema(class_names=tuple(f"c{i}" for i in range(6)),
                             multiple_lines_fields=())
        h, w = 48, 128
        line_mask = np.zeros((h, w), np.int32)
        char_mask = np.zeros((h, w), np.int32)
        text = "abcdefghijkl"
        x1, y1, x2, y2 = 8, 8, 104, 20
        line_mask[y1:y2, x1:x2] = 1
        cw = (x2 - x1) / len(text)
        for j in range(len(text)):
            char_mask[y1:y2, int(x1 + j * cw) : int(x1 + (j + 1) * cw)] = j + 1
        lines = [Line(box=(x1, y1, x2, y2), text=text, id=1)]
        pred = np.zeros((h, w, 6), np.float32)
        pred[..., 0] = 1.0
        # class 2 covers chars 1..6, class 3 covers chars 7..12
        mid = int(x1 + 6 * cw)
        pred[y1:y2, x1:mid, :] = 0; pred[y1:y2, x1:mid, 2] = 1.0
        pred[y1:y2, mid:x2, :] = 0; pred[y1:y2, mid:x2, 3] = 1.0

        want = scipy_reference_decode(pred, line_mask, char_mask, lines, schema)
        dev = decode_fields_device(
            jnp.asarray(pred), jnp.asarray(line_mask), jnp.asarray(char_mask),
            (), n_class=6, num_lines=128, k=8,
        )
        got = extract_values({k: np.asarray(v) for k, v in dev.items()}, lines, schema)
        assert got[2].text == want[2][0]
        assert got[3].text == want[3][0]
        # both carved from the same line, neither got the full text
        assert got[2].text != text and got[3].text != text


class TestMultiComponentBoxes:
    def _case(self):
        """Multi-line field with TWO disjoint components (two value lines
        separated vertically)."""
        schema_kw = dict(
            class_names=tuple(f"c{i}" for i in range(6)),
            multiple_lines_fields=(3,),
        )
        h, w = 64, 96
        line_mask = np.zeros((h, w), np.int32)
        char_mask = np.zeros((h, w), np.int32)
        lines = []
        for i, y in enumerate((8, 40)):
            x1, y1, x2, y2 = 8, y, 72, y + 10
            text = "line%dtext" % i
            lines.append(Line(box=(x1, y1, x2, y2), text=text, id=i + 1))
            line_mask[y1:y2, x1:x2] = i + 1
            cw = (x2 - x1) / len(text)
            for j in range(len(text)):
                char_mask[y1:y2, int(x1 + j * cw): int(x1 + (j + 1) * cw)] = j + 1
        pred = np.zeros((h, w, 6), np.float32)
        pred[..., 0] = 1.0
        for (x1, y1, x2, y2) in [l.box for l in lines]:
            pred[y1:y2, x1:x2, :] = 0
            pred[y1:y2, x1:x2, 3] = 1.0
        return schema_kw, pred, line_mask, char_mask, lines

    def test_committed_reference_keeps_main_box_only(self):
        schema_kw, pred, line_mask, char_mask, lines = self._case()
        schema = FieldSchema(**schema_kw)
        dev = decode_fields_device(
            jnp.asarray(pred), jnp.asarray(line_mask), jnp.asarray(char_mask),
            (3,), n_class=6, num_lines=128, k=8,
        )
        host = {k: np.asarray(v) for k, v in dev.items()}
        got = extract_values(host, lines, schema)
        # committed reference: list_boxes = [boxes_for_field[c][-1]]
        assert len(got[3].boxes) == 1
        # main = topmost center for multi-line fields
        assert got[3].boxes[0] == [8, 8, 72, 18]
        assert got[3].text == "line0text\nline1text"

    def test_all_component_boxes_counts_each_in_eval(self):
        schema_kw, pred, line_mask, char_mask, lines = self._case()
        schema = FieldSchema(all_component_boxes=True, **schema_kw)
        dev = decode_fields_device(
            jnp.asarray(pred), jnp.asarray(line_mask), jnp.asarray(char_mask),
            (3,), n_class=6, num_lines=128, k=8,
        )
        host = {k: np.asarray(v) for k, v in dev.items()}
        got = extract_values(host, lines, schema)
        assert len(got[3].boxes) == 2
        assert sorted(got[3].boxes) == [[8, 8, 72, 18], [8, 40, 72, 50]]
        # eval: each qualifying component box counts toward num_pred
        from msau_tpu.infer.evaluate import accumulate_field_eval

        eval_results = [
            {"num_pred": 0, "num_correct": 0, "num_label": 0} for _ in range(6)
        ]
        correct = {3: ([[8, 8, 72, 50], [8, 8, 72, 18], [8, 40, 72, 50]], "x")}
        accumulate_field_eval(got, correct, eval_results, iou_threshold=0.7)
        assert eval_results[3]["num_pred"] == 2
        assert eval_results[3]["num_label"] == 1


class TestReadingOrder:
    def test_top_left_first(self):
        mk = lambda b: {"box": b}
        boxes = [mk((50, 0, 80, 10)), mk((0, 0, 30, 10)), mk((0, 20, 30, 30))]
        out = sort_box_reading_order(boxes)
        assert [b["box"] for b in out] == [(0, 0, 30, 10), (50, 0, 80, 10), (0, 20, 30, 30)]

    def test_single_and_empty(self):
        assert sort_box_reading_order([]) == []
        one = [{"box": (0, 0, 1, 1)}]
        assert sort_box_reading_order(one) == one


class TestSchema:
    def test_post_process_kv(self):
        schema = FieldSchema(class_names=("NUL", "k_a", "v_a", "k_b", "v_b"))
        values = [("x",), ("k",), ("hello",), ("k2",), ("world",)]
        out = post_process_kv(values, schema)
        assert out == {"a": "hello", "b": "world"}

    def test_post_process_kv_reference_compat(self):
        """Literal reference arithmetic (postprocess.py:8-15): odd idx > 1
        emits CLASS_NAMES[idx-1][2:] -> values[idx]."""
        schema = FieldSchema(class_names=("NUL", "k_a", "v_a", "k_b", "v_b"))
        values = [("x",), ("k",), ("hello",), ("k2",), ("world",)]
        out = post_process_kv(values, schema, reference_compat=True)
        assert out == {"a": "k2"}
