"""Losses and on-device accuracy.

Two loss flavors exist in the reference and both are provided:

* ``masked_cross_entropy`` — entry-A semantics (model/model.py:446-459):
  mean CE over pixels where the integer label != 0, applied to both final
  and auxiliary logits and summed.
* ``unet_loss`` — entry-B semantics (model/training/cost.py:35-65): mean CE
  over *all* pixels against (one-hot-argmax) targets,
  0.5 * final + 0.5 * aux, plus non-background pixel accuracy — here
  computed on device instead of via a host round-trip (cost.py:43-51).

All math is float32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  channel_axis: int = -1) -> jnp.ndarray:
    """Softmax cross-entropy per pixel.

    ``channel_axis=-1``: logits [..., C]; ``channel_axis=1``: logits
    [N, C, ...] (the compact layout the flat_scales model emits — avoids a
    lane-padded NHWC transpose on the loss boundary).  labels int [N, ...].
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=channel_axis)
    # select the label logit via a one-hot compare-and-reduce rather than
    # take_along_axis: the latter lowers to a serialized per-pixel gather
    # on TPU (measured ~130 ms/step at 16x512^2x17 incl. the scatter in its
    # backward); the compare fuses into the softmax reads.
    nclass = logits.shape[channel_axis]
    # out-of-range labels would match no class and silently yield 0 CE;
    # clamp to the last class (take_along_axis's old clip semantics) so a
    # data bug produces a visible nonzero loss instead of vanishing.
    labels = jnp.clip(labels, 0, nclass - 1)
    shape = [1] * logits.ndim
    shape[channel_axis] = nclass
    classes = jnp.arange(nclass).reshape(shape)
    onehot = jnp.expand_dims(labels, channel_axis) == classes
    return -jnp.sum(jnp.where(onehot, logp, 0.0), axis=channel_axis)


def nonzero_pixel_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """sum(pred == label over label != 0) / sum(label != 0) — the reference
    acceptance metric (model/training/cost.py:43-51)."""
    pred = jnp.argmax(logits, axis=channel_axis)
    mask = labels != 0
    if valid is not None:
        mask = mask & valid
    correct = jnp.sum(jnp.where(mask, pred == labels, False))
    total = jnp.maximum(jnp.sum(mask), 1)
    return correct / total


def masked_cross_entropy(
    logits: jnp.ndarray,
    aux_logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    channel_axis: int = -1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Entry-A loss: CE over label != 0 pixels, final + aux.

    labels: int32 [N, H, W]; 0 means background/ignore.  ``valid`` further
    masks bucket padding (no reference analog — the reference has
    data-dependent shapes).
    """
    mask = labels != 0
    if valid is not None:
        mask = mask & valid
    denom = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
    if channel_axis == 1 and logits.ndim == 3:
        # body-form logits: ONE fused Pallas pass per head computes the
        # masked CE sum + the non-background correct count, and its
        # backward writes dlogits in one read+write (ops/ce_loss.py) —
        # replaces the f32 log-softmax materializations (~6.5 ms/step at
        # the flagship shape).
        from msau_tpu.ops.ce_loss import fused_masked_ce_sum

        maskf = mask.astype(jnp.float32)
        lab32 = labels.astype(jnp.int32)
        s1, c1 = fused_masked_ce_sum(logits, lab32, maskf)
        s2, _ = fused_masked_ce_sum(aux_logits, lab32, maskf)
        ce, ce_aux = s1 / denom, s2 / denom
        loss = ce + ce_aux
        metrics = {
            "loss": loss,
            "loss_final": ce,
            "loss_aux": ce_aux,
            "accuracy": c1 / denom,
        }
        return loss, metrics
    ce = jnp.sum(jnp.where(
        mask, _per_pixel_ce(logits, labels, channel_axis), 0.0)) / denom
    ce_aux = jnp.sum(jnp.where(
        mask, _per_pixel_ce(aux_logits, labels, channel_axis), 0.0)) / denom
    loss = ce + ce_aux
    metrics = {
        "loss": loss,
        "loss_final": ce,
        "loss_aux": ce_aux,
        "accuracy": nonzero_pixel_accuracy(logits, labels, valid, channel_axis),
    }
    return loss, metrics


def unet_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    aux_logits: Optional[jnp.ndarray] = None,
    aux_labels: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    aux_weight: float = 0.5,
    class_weights: Optional[jnp.ndarray] = None,
    channel_axis: int = -1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Entry-B loss: mean CE over all (valid) pixels, optional weighted
    classes, 0.5/0.5 aux mixing (model/training/cost.py:52-61)."""
    ce = _per_pixel_ce(logits, labels, channel_axis)
    if class_weights is not None:
        w = jnp.take(class_weights, labels)
        ce = ce * w
        denom_f = jnp.sum(w) if valid is None else jnp.sum(jnp.where(valid, w, 0.0))
    else:
        denom_f = (
            jnp.asarray(ce.size, jnp.float32)
            if valid is None
            else jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
        )
    if valid is not None:
        ce = jnp.where(valid, ce, 0.0)
    final_loss = jnp.sum(ce) / denom_f

    if aux_logits is not None:
        if aux_labels is None:
            aux_labels = labels
        ce_a = _per_pixel_ce(aux_logits, aux_labels, channel_axis)
        if class_weights is not None:
            ce_a = ce_a * jnp.take(class_weights, aux_labels)
        if valid is not None:
            ce_a = jnp.where(valid, ce_a, 0.0)
        aux_loss = jnp.sum(ce_a) / denom_f
        loss = (1.0 - aux_weight) * final_loss + aux_weight * aux_loss
    else:
        aux_loss = jnp.zeros(())
        loss = final_loss

    metrics = {
        "loss": loss,
        "loss_final": final_loss,
        "loss_aux": aux_loss,
        "accuracy": nonzero_pixel_accuracy(logits, labels, valid, channel_axis),
    }
    return loss, metrics
