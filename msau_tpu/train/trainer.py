"""Training loop: pjit-sharded train step, checkpointing, metrics.

Replaces both reference training paths with one engine:
  * entry A (train_chargrid_funsd_msau.py:16-118): Adam lr=1e-4, masked CE,
    grad clip, per-epoch eval, checkpoint every N epochs;
  * entry B (model/training/trainer.py:57-207): staircase LR, 0.5/0.5 aux
    loss, queue-fed steps, val sweep, best-val-loss checkpointing.

TPU-native design: the step is one jitted SPMD program over a Mesh; batches
are host-sharded onto the ``data`` axis; gradients are reduced by GSPMD
(the NCCL-allreduce equivalent); donated state avoids HBM copies; metrics
come back as scalars only.  Checkpoints are orbax (async-capable, sharded),
with full train-state resume — the reference saved optimizer state but never
restored it (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msau_tpu.config import Config, ModelConfig, TrainConfig
from msau_tpu.models.msau import MSAUWrapper, build_model
from msau_tpu.parallel.sharding import batch_sharding, make_mesh, replicated
from msau_tpu.train.loss import masked_cross_entropy, unet_loss
from msau_tpu.train.optimizer import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )


def make_train_step(
    model: MSAUWrapper,
    optimizer: optax.GradientTransformation,
    *,
    masked: bool = True,
    aux_weight: float = 0.5,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, metrics).

    batch: {"input": [N,H,W,C] f32, "label": [N,H,W] i32, "valid": [N,H,W] bool}
    """

    # with the flat shallow-scale layout, keep the loss in the body form
    # itself: the model returns raw [N, C, LB] logits and the LABELS are
    # converted to body columns instead (one cheap int pad) — both the
    # NHWC transpose and the from_body reshape would re-pay lane padding
    # and data movement the layout exists to avoid (ops/flatconv.py)
    flat = getattr(model.config, "flat_scales", 0) > 0
    layout = "BODY" if flat else "NHWC"

    def loss_fn(params, batch):
        _, logits, aux_logits = model.apply(
            params, batch["input"], train=True, logits_layout=layout
        )
        labels = batch["label"]
        valid = batch.get("valid")
        if logits.ndim == 3:
            # body-flat logits: move labels/valid into body columns; pads
            # and guards become label 0 / valid False, exactly the
            # masked-out set (shapes are static at trace time)
            from msau_tpu.models.flat_layers import (
                make_scale_geoms,
                split_spatial,
            )
            from msau_tpu.ops.flatconv import to_body

            cfg = model.config
            n, h, w, _ = batch["input"].shape
            itemsize = 2 if cfg.dtype == "bfloat16" else 4
            sp = max(int(getattr(cfg, "spatial_shards", 1) or 1), 1)
            geom0 = make_scale_geoms(
                h // sp, w, cfg.flat_scales + 1, itemsize, cfg.pool_size,
                feat_root=cfg.feat_root, n_class=cfg.n_class,
            )[0]
            if valid is None:
                valid = jnp.ones((n, h, w), bool)
            if sp > 1:
                # BODY logits arrive shard-major ([sp*N, C, LBs]); move
                # labels/valid into the same representation
                labels = split_spatial(labels, sp)
                valid = split_spatial(valid, sp)
            labels = to_body(labels[:, None], geom0)[:, 0]
            valid = to_body(valid[:, None], geom0)[:, 0]
            caxis = 1
        else:
            # NHWC logits (plain model, or BODY's no-flat-geometry fallback)
            caxis = -1
        if masked:
            return masked_cross_entropy(
                logits, aux_logits, labels, valid,
                channel_axis=caxis,
            )
        return unet_loss(
            logits,
            labels,
            aux_logits=aux_logits,
            valid=valid,
            aux_weight=aux_weight,
            channel_axis=caxis,
        )

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: MSAUWrapper, *, masked: bool = True) -> Callable:
    def step(params, batch) -> Dict[str, jnp.ndarray]:
        _, logits, aux_logits = model.apply(params, batch["input"], train=False)
        if masked:
            _, metrics = masked_cross_entropy(
                logits, aux_logits, batch["label"], batch.get("valid")
            )
        else:
            _, metrics = unet_loss(
                logits, batch["label"], aux_logits=aux_logits, valid=batch.get("valid")
            )
        return metrics

    return jax.jit(step)


class Trainer:
    """Host-side loop around the SPMD step.

    ``data_provider`` must expose ``next_data(split)`` returning a batch dict
    of numpy arrays (or None when exhausted) and optionally ``size_val`` —
    the protocol of the reference generators (data_generator_funsd.py:133-143).
    """

    def __init__(
        self,
        model_config: ModelConfig,
        train_config: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.model_config = model_config
        self.cfg = train_config or TrainConfig()
        if self.cfg.matmul_precision and jax.default_backend() not in ("cpu",):
            # CPU's elemental emitter rejects the X3 algorithms; the knob
            # targets TPU where the backend default (plain bf16) is unstable.
            jax.config.update("jax_default_matmul_precision", self.cfg.matmul_precision)
        if (
            mesh is not None
            and "spatial" in mesh.axis_names
            and mesh.shape["spatial"] > 1
            and getattr(model_config, "flat_scales", 0) > 0
            and getattr(model_config, "spatial_shards", 1)
            != mesh.shape["spatial"]
        ):
            # The flat layout composes with spatial sharding through the
            # shard-major batch representation (ModelConfig.spatial_shards
            # + FlatGeom.sp + flatconv.extend_shards halo exchange) — but
            # the model must be BUILT for the mesh's shard count so the
            # per-shard geometries and the entry split match the mesh.
            raise ValueError(
                "flat_scales > 0 on a spatial-sharded mesh requires "
                f"model_config.spatial_shards == mesh spatial size "
                f"({mesh.shape['spatial']}); got "
                f"{getattr(model_config, 'spatial_shards', 1)}"
            )
        self.model = build_model(model_config)
        self.optimizer = make_optimizer(self.cfg)
        self.mesh = mesh
        self.train_step = make_train_step(
            self.model,
            self.optimizer,
            masked=self.cfg.masked_loss,
            aux_weight=self.cfg.loss_aux_weight,
            donate=self.cfg.donate_state,
        )
        self.eval_step = make_eval_step(self.model, masked=self.cfg.masked_loss)
        self.state: Optional[TrainState] = None
        self._ckpt_mgr = None

    # ------------------------------------------------------------------
    def init_state(self, sample_input: np.ndarray, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        params = self.model.init(
            jax.random.PRNGKey(seed), jnp.asarray(sample_input[:1])
        )
        self.state = TrainState.create(params, self.optimizer)
        if self.mesh is not None:
            # replicate the train state across the mesh so the SPMD step
            # sees consistent shardings (GSPMD then reduces grads over
            # 'data' — the NCCL-allreduce equivalent)
            self.state = jax.device_put(self.state, replicated(self.mesh))
        return self.state

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        if jax.process_count() > 1:
            # multi-host: each process feeds its host-local slice of the
            # global batch (SURVEY.md §5.8 — the per-host input pipeline);
            # jax.make_array_from_process_local_data assembles the global
            # sharded array without cross-host copies through the host
            from msau_tpu.parallel.sharding import host_local_batch_to_global

            return host_local_batch_to_global(batch, self.mesh)
        return {
            k: jax.device_put(
                np.asarray(v), batch_sharding(self.mesh, np.asarray(v).ndim)
            )
            for k, v in batch.items()
        }

    # ------------------------------------------------------------------
    def fit(
        self,
        data_provider,
        output_path: Optional[str] = None,
        epochs: Optional[int] = None,
        batch_steps_per_epoch: Optional[int] = None,
        restore_path: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        log_dir: Optional[str] = None,
    ) -> Dict[str, list]:
        """Queue-fed training with per-epoch validation, mirroring the
        reference Trainer.train contract (model/training/trainer.py:57-207)."""
        epochs = epochs if epochs is not None else self.cfg.epochs
        steps = batch_steps_per_epoch or self.cfg.batch_steps_per_epoch
        if steps != self.cfg.batch_steps_per_epoch and self.cfg.lr_decay_staircase:
            # The staircase schedule converts the step counter to epochs via
            # steps_per_epoch (model/training/trainer.py:45-49 decays by
            # *epoch*); an overridden epoch length must reach the schedule or
            # decay boundaries land on the wrong steps.  The optax chain
            # structure is unchanged, so an existing opt_state stays valid.
            self.optimizer = make_optimizer(self.cfg, steps_per_epoch=steps)
            self.train_step = make_train_step(
                self.model,
                self.optimizer,
                masked=self.cfg.masked_loss,
                aux_weight=self.cfg.loss_aux_weight,
                donate=self.cfg.donate_state,
            )
        if restore_path:
            self.restore(restore_path)
        assert self.state is not None, "call init_state() first"

        metrics_logger = None
        if log_dir:
            from msau_tpu.utils.profiling import MetricsLogger

            metrics_logger = MetricsLogger(log_dir)

        history = {"train_loss": [], "val_loss": [], "train_acc": [], "val_acc": []}
        best_val = float("inf")
        next_batch = data_provider.next_data("train")
        for epoch in range(epochs):
            t0 = time.time()
            agg: Dict[str, jnp.ndarray] = {}
            n_steps = 0
            if next_batch is None:  # retry once per epoch, as the old
                next_batch = data_provider.next_data("train")  # loop did
            for _ in range(steps):
                batch = next_batch
                if batch is None:
                    break
                state, metrics = self.train_step(self.state, self.put_batch(batch))
                self.state = state
                n_steps += 1
                # fetch/generate the NEXT batch while the dispatched step
                # runs on device; metrics stay device-side (no float() sync
                # inside the loop) so generation overlaps compute — the
                # reference at least overlapped via producer threads
                # (data_generator_funsd.py:161-174)
                next_batch = data_provider.next_data("train")
                for k, v in metrics.items():
                    agg[k] = agg[k] + v if k in agg else v
            if n_steps == 0:
                log_fn("No training data available; stopping.")
                break
            train_loss = float(agg.get("loss", 0.0)) / n_steps
            train_acc = float(agg.get("accuracy", 0.0)) / n_steps
            history["train_loss"].append(train_loss)
            history["train_acc"].append(train_acc)
            log_fn(
                f"TRAIN epoch {epoch + 1}: loss={train_loss:.6f} "
                f"acc={train_acc:.6f} time={time.time() - t0:.2f}s"
            )
            if metrics_logger:
                metrics_logger.log(
                    int(self.state.step),
                    {"train/loss": train_loss, "train/accuracy": train_acc,
                     "epoch": epoch + 1},
                )

            # validation sweep
            val_size = getattr(data_provider, "size_val", 0)
            if val_size:
                vagg: Dict[str, float] = {}
                vn = 0
                for _ in range(val_size):
                    batch = data_provider.next_data("val")
                    if batch is None:
                        break
                    metrics = self.eval_step(self.state.params, self.put_batch(batch))
                    vn += 1
                    for k, v in metrics.items():
                        vagg[k] = vagg.get(k, 0.0) + float(v)
                if vn:
                    val_loss = vagg.get("loss", 0.0) / vn
                    val_acc = vagg.get("accuracy", 0.0) / vn
                    history["val_loss"].append(val_loss)
                    history["val_acc"].append(val_acc)
                    log_fn(
                        f"VAL   epoch {epoch + 1}: loss={val_loss:.6f} acc={val_acc:.6f}"
                    )
                    if metrics_logger:
                        metrics_logger.log(
                            int(self.state.step),
                            {"val/loss": val_loss, "val/accuracy": val_acc},
                        )
                    if output_path and (
                        val_loss < best_val
                        or (epoch + 1) % self.cfg.checkpoint_every_epochs == 0
                    ):
                        best_val = min(best_val, val_loss)
                        self.save(os.path.join(output_path, f"model{epoch + 1}"))
            elif output_path and (epoch + 1) % self.cfg.checkpoint_every_epochs == 0:
                self.save(os.path.join(output_path, f"model{epoch + 1}"))
        if metrics_logger:
            metrics_logger.close()
        self.wait_for_checkpoints()
        return history

    # ------------------------------------------------------------------
    # orbax checkpointing with full train-state resume
    # ------------------------------------------------------------------
    def _checkpointer(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.StandardCheckpointer()
        return self._ckpt_mgr

    def save(self, path: str, wait: bool = False) -> None:
        """Async by default: orbax stages a device->host copy synchronously
        (safe against the next donated step mutating the buffers) and writes
        to disk in the background while training continues.  ``wait=True``
        blocks until the checkpoint is durable."""
        ckpt = self._checkpointer()
        ckpt.save(os.path.abspath(path), self.state, force=True)
        if wait:
            ckpt.wait_until_finished()

    def wait_for_checkpoints(self) -> None:
        if self._ckpt_mgr is not None:
            self._ckpt_mgr.wait_until_finished()

    def restore(self, path: str) -> TrainState:
        path = os.path.abspath(path)
        assert self.state is not None, "init_state() before restore for structure"
        ckpt = self._checkpointer()
        ckpt.wait_until_finished()  # a pending async save may target `path`
        self.state = ckpt.restore(path, self.state)
        return self.state
