"""Optimizer factory (optax) mirroring the reference options.

Reference (model/training/optimizer.py:4-30): momentum-SGD / RMSprop
(entry-B default) / Adam (entry-A uses Adam lr=1e-4), with weight decay, and
a staircase LR schedule lr = base * 0.95 ** (epoch // 10)
(model/training/trainer.py:45-49).  Gradient clipping by global norm
replaces entry-A's clip_grad_norm (train_chargrid_funsd_msau.py:58).
"""

from __future__ import annotations

from typing import Optional

import optax

from msau_tpu.config import TrainConfig


def staircase_schedule(
    base_lr: float,
    decay_rate: float = 0.95,
    decay_every_epochs: int = 10,
    steps_per_epoch: int = 1024,
) -> optax.Schedule:
    """lr(step) = base * decay_rate ** (epoch // decay_every_epochs)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * decay_rate ** (epoch // decay_every_epochs)

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: Optional[int] = None) -> optax.GradientTransformation:
    steps_per_epoch = steps_per_epoch or cfg.batch_steps_per_epoch
    if cfg.lr_decay_staircase:
        lr = staircase_schedule(
            cfg.learning_rate,
            cfg.lr_decay_rate,
            cfg.lr_decay_every_epochs,
            steps_per_epoch,
        )
    else:
        lr = cfg.learning_rate

    name = cfg.optimizer.lower()
    if name == "momentum":
        core = optax.sgd(lr, momentum=cfg.momentum)
    elif name == "rmsprop":
        core = optax.rmsprop(lr)
    else:
        core = optax.adam(lr)

    chain = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(core)
    return optax.chain(*chain)
