"""End-to-end KV inference model.

The reference KVModel (inference/kv_model.py:15-387) rasterizes an OCR JSON
on the host, runs the torch net, pulls the probability map back to the CPU
and decodes fields with scipy/OpenCV.  Here rasterize → forward → morphology
→ CCL → component/line reductions execute as jitted device programs (two
compiled graphs: paint+forward+decode), and only the tiny per-class records
cross to the host for string assembly.

Charset convention at inference: file contents prefixed with ' ' and '$'
(kv_model.py:47-49), blank index 1.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msau_tpu.config import InferConfig, ModelConfig
from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import Line, Page, load_label_json_page
from msau_tpu.data.rasterize import (
    BoxProgram,
    build_chargrid_programs,
    paint_boxes_fast as paint_boxes,
    pad_to_bucket,
    round_up,
)
from msau_tpu.infer.decode import (
    FieldValue,
    decode_fields_device,
    extract_values,
    pack_decode_out,
    unpack_decode_out,
)
from msau_tpu.infer.schema import FieldSchema, post_process_kv
from msau_tpu.models.msau import build_model

INFER_SPECIALS = (" ", "$")


class KVModel:
    """Load → predict → run_test, mirroring the reference API surface."""

    def __init__(
        self,
        model_config: Optional[ModelConfig] = None,
        infer_config: Optional[InferConfig] = None,
        schema: Optional[FieldSchema] = None,
    ):
        self.model_config = model_config
        self.cfg = infer_config or InferConfig()
        self.schema = schema or FieldSchema()
        self.charset: Optional[Charset] = None
        self.model = None
        self.params = None
        self.n_class = self.cfg.n_class
        self._apply = None        # jitted probs-forward, built once per model
        self._apply_model = None
        self._serve = None        # jitted paint+forward+decode serve program
        self._serve_model = None
        self._fn_cache: Dict = {}  # batched-decode fns keyed by num_lines

    # ------------------------------------------------------------------
    def load(
        self,
        model_weight: Optional[str] = None,
        charset: Optional[str] = None,
        n_class: Optional[int] = None,
        params=None,
        model_kwargs_path: Optional[str] = None,
        warmup=None,
    ) -> "KVModel":
        """Load weights/charset/config (reference inference/kv_model.py:37-57).

        ``warmup``: bucket size(s) to pre-compile the fused serve program
        for (int or iterable, e.g. ``warmup=512`` or ``warmup=(256, 512)``)
        — the first request otherwise pays the full paint->forward->decode
        compile (cold-start; measured in scripts/bench_serve_coldstart.py).
        With the persistent compilation cache the warmup itself is fast
        after the first process ever to compile that bucket.
        """
        if charset is not None:
            self.charset = Charset.from_file(charset, specials=INFER_SPECIALS)
        if n_class is not None:
            self.n_class = n_class
        # keep the field schema aligned with n_class: truncate a longer
        # default, or pad with generated k_/v_ names (extract_training_data
        # naming scheme) when the model has more classes than the schema
        if self.schema.n_class != self.n_class:
            names = list(self.schema.class_names[: self.n_class])
            i = len(names)
            while len(names) < self.n_class:
                prefix = "k_" if len(names) % 2 == 1 else "v_"
                names.append(f"{prefix}f{(len(names) - 1) // 2 + 1}")
            self.schema = dataclasses.replace(
                self.schema,
                class_names=tuple(names),
                multiple_lines_fields=tuple(
                    c for c in self.schema.multiple_lines_fields if c < self.n_class
                ),
            )
        if model_kwargs_path is not None:
            with open(model_kwargs_path) as f:
                self.model_config = ModelConfig.from_model_kwargs(json.load(f))
        if self.model_config is None:
            assert self.charset is not None
            self.model_config = ModelConfig(
                img_channels=self.charset.n_token, n_class=self.n_class
            )
        # Serving keeps the configured layout: the round-3 flat kernels
        # (3-row-tap factorization + fused epilogues) win at every batch
        # size, bs=1 included (512^2 fwd: flat 8.3 ms vs NHWC 17.8;
        # scripts/bench_batch_crossover.py) — the round-2 "NHWC at bs=1"
        # rule is obsolete.  Param trees are identical across layouts.
        self.model = build_model(self.model_config)
        self._apply = None
        self._serve = None
        if params is not None:
            self.params = params
        elif model_weight is not None:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            # restore against abstract structure from a fresh init
            sample = jnp.zeros((1, 64, 64, self.model_config.img_channels))
            ref = self.model.init(jax.random.PRNGKey(0), sample)
            restored = ckptr.restore(os.path.abspath(model_weight), ref)
            self.params = restored
        if warmup is not None and self.params is not None:
            sizes = (warmup,) if isinstance(warmup, int) else tuple(warmup)
            for hb in sizes:
                self.warmup_bucket(hb)
        return self

    def warmup_bucket(self, hb: int, wb: Optional[int] = None) -> None:
        """Pre-compile + pre-execute the fused serve program for one
        bucket shape so the first real request serves at steady-state
        latency.  Runs a tiny synthetic page through ``predict``."""
        from msau_tpu.data.pages import Line, Page

        wb = wb or hb
        # one line somewhere in the bucket's coordinate range; the serve
        # graph shape depends only on (hb, wb) and padded table sizes
        page = Page(
            lines=[Line(box=(10, 10, wb, 40), text="warm", label=2,
                        value=1)],
            img_shape=(hb * 3, wb * 3),
        )
        self.predict(page, buckets=(hb,))

    # ------------------------------------------------------------------
    def forward(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """Jitted final-activation forward, compiled once per model — NOT
        per predict() call (a fresh jax.jit wrapper per request re-traces
        every time and dominated round-1 serving latency)."""
        if self._apply is None or self._apply_model is not self.model:
            model = self.model

            def _probs(params, x):
                probs, _, _ = model.apply(params, x)
                return probs

            self._apply = jax.jit(_probs)
            self._apply_model = model
        return self._apply(params, x)

    # ------------------------------------------------------------------
    def _prepare_host(self, page: Page, buckets: Sequence[int] = (256, 512, 1024)):
        """Host half of rasterization: box programs + padded paint inputs.
        Returns (progs, scaled_lines, paint_arrays, hb, wb)."""
        assert self.charset is not None
        progs = build_chargrid_programs(
            page,
            self.charset,
            scale_min=self.cfg.scale,
            scale_max=self.cfg.scale,
            normalize_digits=True,
            char_w_cap_factor=1.2,
            pad_factor_fixed=3.0,
            label_style="box",
        )
        hb, wb = pad_to_bucket(progs.height, progs.width, buckets)
        cap = round_up(max(len(progs.char.values), 1), 512)
        char = progs.char.padded(cap)
        lcap = round_up(max(len(progs.line_id.values), 1), 512)
        lid = progs.line_id.padded(lcap)
        cid = progs.char_id.padded(lcap)
        arrays = (
            char.boxes, char.values, lid.boxes, lid.values,
            cid.boxes, cid.values,
        )
        # re-index scaled lines 1-based for decode bookkeeping
        scaled = [
            dataclasses.replace(l, id=i + 1) for i, l in enumerate(progs.scaled_lines)
        ]
        return progs, scaled, arrays, hb, wb

    def rasterize(self, page: Page, buckets: Sequence[int] = (256, 512, 1024)):
        """KV-variant chargrid: digits normalized, box-filled line ids,
        char-position plane (kv_model.py:83-148)."""
        progs, scaled, arrays, hb, wb = self._prepare_host(page, buckets)
        cb, cv, lb, lv, db, dv = (jnp.asarray(a) for a in arrays)
        ids = paint_boxes(cb, cv, hb, wb)
        line_id = paint_boxes(lb, lv, hb, wb)
        char_id = paint_boxes(db, dv, hb, wb)
        onehot = jax.nn.one_hot(ids, self.charset.n_token, dtype=jnp.float32)
        return onehot, line_id, char_id, scaled, progs

    # ------------------------------------------------------------------
    def _serve_fn(self):
        """One jitted device program for the whole serve path:
        paint -> one-hot -> forward -> KV decode -> packed tables.

        A single dispatch + a single small device->host fetch — the
        previous predict() issued ~5 dispatches and 8 table fetches, and
        on the tunneled backend each fetch pays a round trip (~150 ms of
        the measured 312 ms p50 was transfer latency, not compute)."""
        if self._serve is None or self._serve_model is not self.model:
            model = self.model
            n_token = self.charset.n_token
            n_class = self.n_class
            mlc = self._multiline_classes()
            min_area = self.cfg.min_component_area
            max_iters = self.cfg.max_ccl_iters

            @functools.partial(
                jax.jit,
                static_argnames=("hb", "wb", "num_lines", "cap", "lcap",
                                 "return_maps"),
            )
            def fn(params, buf, *, hb, wb, num_lines, cap, lcap,
                   return_maps=True):
                # the six box-program arrays arrive as ONE int32 buffer —
                # on the tunneled backend every host->device transfer is a
                # round trip, and six uploads cost ~20 ms of the p50
                o = 0
                cb = buf[o:o + cap * 4].reshape(cap, 4); o += cap * 4
                cv = buf[o:o + cap]; o += cap
                lb = buf[o:o + lcap * 4].reshape(lcap, 4); o += lcap * 4
                lv = buf[o:o + lcap]; o += lcap
                db = buf[o:o + lcap * 4].reshape(lcap, 4); o += lcap * 4
                dv = buf[o:o + lcap]
                ids = paint_boxes(cb, cv, hb, wb)
                line_id = paint_boxes(lb, lv, hb, wb)
                char_id = paint_boxes(db, dv, hb, wb)
                x = jax.nn.one_hot(ids, n_token, dtype=jnp.float32)
                probs, _, _ = model.apply(params, x[None])
                dev = decode_fields_device(
                    probs[0], line_id, char_id, mlc,
                    n_class=n_class, num_lines=num_lines, k=8,
                    min_area=min_area, max_iters=max_iters,
                )
                if not return_maps:
                    # deployment protocol: the [H, W, C] probability map
                    # and chosen-class map are debug artifacts; on the
                    # tunneled backend the client eagerly streams every
                    # program output, so returning them cost ~9 MB and
                    # ~20 ms per request (measured: prep stage 28 -> 16 ms,
                    # total -24 ms at the bench page)
                    return (pack_decode_out(dev),)
                return pack_decode_out(dev), probs[0], dev["chosen_class"]

            self._serve = fn
            self._serve_model = model
        return self._serve

    # ------------------------------------------------------------------
    def _multiline_classes(self) -> Tuple[int, ...]:
        """Static multiline class-id set for the jitted decoder (non-
        multiline classes then skip alt-component top_k entirely)."""
        return tuple(
            sorted(
                c for c in self.schema.multiple_lines_fields
                if 2 <= c < self.n_class
            )
        )

    # ------------------------------------------------------------------
    def predict(
        self, data, label_path: Optional[str] = None, eval_results=None,
        timings: Optional[Dict[str, float]] = None,
        return_maps: bool = True,
    ) -> Tuple[Dict[str, str], Dict]:
        """data: a Page, or a path to a layout/OCR JSON, or (json_path, img).

        ``timings``: optional dict filled with per-stage host wall times
        (ms): 'prep' (box programs + packing), 'device' (dispatch + packed
        fetch, includes the tunnel round trip on remote backends),
        'strings' (host value assembly).

        ``return_maps=False`` is the serving protocol: the device program
        returns ONLY the packed decode tables (extras omit 'pred'/
        'chosen_class'), saving the ~9 MB/request map streaming a remote
        client otherwise pays.  The default keeps the reference's predict
        surface (inference/kv_model.py:298-312: pred rides the extras).
        """
        import time as _time

        if isinstance(data, tuple):
            data = data[0]
        page = data if isinstance(data, Page) else load_label_json_page(data)
        t0 = _time.perf_counter()
        progs, scaled_lines, arrays, hb, wb = self._prepare_host(page)
        num_lines = round_up(max(len(scaled_lines), 1), 128)

        # one fused device program (paint -> forward -> decode; the final
        # activation is decoded, matching reference predict kv_model.py:305)
        # fed by ONE packed upload, answered by ONE packed fetch
        cap, lcap = arrays[1].shape[0], arrays[3].shape[0]
        buf = np.concatenate([np.asarray(a).ravel() for a in arrays])
        t1 = _time.perf_counter()
        # the np buffer rides the dispatch (implicit transfer) instead of a
        # separate synchronous jnp.asarray upload — measured ~2 ms/request
        # on the tunneled backend (scripts/exp_serve_upload.py)
        out = self._serve_fn()(
            self.params, buf,
            hb=hb, wb=wb, num_lines=num_lines, cap=cap, lcap=lcap,
            return_maps=return_maps,
        )
        packed, pred, chosen = out if return_maps else (out[0], None, None)
        packed_host = np.asarray(packed)  # the single device->host sync
        t2 = _time.perf_counter()
        host = unpack_decode_out(packed_host, self.n_class, 8, num_lines)
        values = extract_values(host, scaled_lines, self.schema)
        kv_results = post_process_kv(values, self.schema)
        if timings is not None:
            t3 = _time.perf_counter()
            timings["prep"] = (t1 - t0) * 1e3
            timings["device"] = (t2 - t1) * 1e3
            timings["strings"] = (t3 - t2) * 1e3

        extras = {
            "values": values,
            "programs": progs,
            "scaled_lines": scaled_lines,
        }
        if return_maps:
            extras["pred"] = pred
            # [H, W] class id of selected pixels (new_pred_mask equivalent)
            extras["chosen_class"] = chosen
        if label_path is not None and eval_results is not None:
            from msau_tpu.infer.evaluate import accumulate_field_eval, read_json_gt

            offset = (
                progs.extent[0] - progs.pad,
                progs.extent[1] - progs.pad,
            )
            try:
                correct = read_json_gt(label_path, scale=progs.scale, offset=offset)
            except IOError:
                correct = None
            if correct is not None:
                accumulate_field_eval(
                    values, correct, eval_results, iou_threshold=self.cfg.iou_threshold
                )
        return kv_results, extras

    # ------------------------------------------------------------------
    def predict_batch(self, pages: Sequence, buckets=(256, 512, 1024)):
        """Batched serving path: rasterize every page, group by bucket
        shape, run one forward+decode per group (one compiled graph per
        bucket), and assemble strings per page.

        Returns a list of (kv_results, values) in input order.
        """
        import collections

        prepared = []
        for i, page in enumerate(pages):
            if not isinstance(page, Page):
                page = load_label_json_page(page)
            x, line_id, char_id, scaled, progs = self.rasterize(page, buckets)
            prepared.append((i, x, line_id, char_id, scaled))
        groups = collections.defaultdict(list)
        for item in prepared:
            groups[item[1].shape].append(item)

        ml = self._multiline_classes()

        results: List = [None] * len(pages)
        for shape, items in groups.items():
            xb = jnp.stack([it[1] for it in items])
            preds = self.forward(self.params, xb)
            # ONE vmapped decode dispatch per bucket group (VERDICT r3 #7:
            # the per-page loop serialized B decode dispatches) and ONE
            # packed [B, L] fetch for the whole group.  num_lines is the
            # group max (extra line slots decode as empty).
            nl = round_up(max(max(len(it[4]) for it in items), 1), 128)
            dec = self._decode_batch_fn(nl)
            vecs = dec(preds,
                       jnp.stack([it[2] for it in items]),
                       jnp.stack([it[3] for it in items]))
            host_vecs = np.asarray(vecs)
            for (i, _, _, _, scaled), vec in zip(items, host_vecs):
                host = unpack_decode_out(vec, self.n_class, 8, nl)
                values = extract_values(host, scaled, self.schema)
                results[i] = (post_process_kv(values, self.schema), values)
        return results

    def _decode_batch_fn(self, num_lines: int):
        """Cached jitted vmap of decode_fields_device + packing."""
        key = ("decode_batch", num_lines, self._multiline_classes())
        fn = self._fn_cache.get(key)
        if fn is None:
            ml = self._multiline_classes()

            def one(pred, line_id, char_id):
                dev = decode_fields_device(
                    pred, line_id, char_id, ml,
                    n_class=self.n_class,
                    num_lines=num_lines,
                    k=8,
                    min_area=self.cfg.min_component_area,
                    max_iters=self.cfg.max_ccl_iters,
                )
                return pack_decode_out(dev)

            fn = jax.jit(jax.vmap(one))
            self._fn_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def run_test(
        self,
        list_inf: Sequence[str],
        out_dir: Optional[str] = None,
        label_dir: Optional[str] = None,
        img_dir: Optional[str] = None,
    ):
        """Folder sweep + aggregate P/R/F1 (kv_model.py:341-387)."""
        eval_results = [
            {"num_pred": 0, "num_correct": 0, "num_label": 0}
            for _ in range(self.n_class)
        ]
        kv_results = []
        for file_path in list_inf:
            basename = os.path.basename(file_path).split(".")[0]
            label_path = (
                os.path.join(label_dir, basename + ".json") if label_dir else None
            )
            result, _ = self.predict(
                file_path, label_path=label_path, eval_results=eval_results
            )
            kv_results.append(result)

        summary = None
        if label_dir is not None:
            num_correct = sum(c["num_correct"] for c in eval_results)
            num_label = sum(c["num_label"] for c in eval_results)
            num_pred = sum(c["num_pred"] for c in eval_results)
            recall = num_correct / num_label if num_label else 0.0
            precision = num_correct / num_pred if num_pred else 0.0
            f1 = (
                2 * recall * precision / (recall + precision)
                if (recall + precision)
                else 0.0
            )
            summary = {"precision": precision, "recall": recall, "f1": f1}
        return kv_results, eval_results, summary
