"""Training tests: loss semantics vs torch, convergence smoke test,
checkpoint save/restore round-trip, optimizer schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msau_tpu.config import ModelConfig, TrainConfig
from msau_tpu.train.loss import masked_cross_entropy, unet_loss, nonzero_pixel_accuracy
from msau_tpu.train.optimizer import make_optimizer, staircase_schedule
from msau_tpu.train.trainer import Trainer, TrainState, make_train_step


class TestLoss:
    def test_masked_ce_matches_torch(self):
        """Entry-A semantics: CE over label != 0 pixels (model/model.py:446-459)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        n_class, h, w = 5, 8, 8
        logits = rng.standard_normal((1, h, w, n_class)).astype(np.float32)
        aux = rng.standard_normal((1, h, w, n_class)).astype(np.float32)
        labels = rng.integers(0, n_class, (1, h, w)).astype(np.int32)

        loss, metrics = masked_cross_entropy(
            jnp.asarray(logits), jnp.asarray(aux), jnp.asarray(labels)
        )
        # torch reference: gather masked pixels, CrossEntropyLoss twice, sum
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        at = torch.from_numpy(aux).permute(0, 3, 1, 2)
        tt = torch.from_numpy(labels.astype(np.int64))
        mask = tt != 0
        lt_m = lt.permute(0, 2, 3, 1)[mask]        # [P, C]
        at_m = at.permute(0, 2, 3, 1)[mask]
        tt_m = tt[mask]
        crit = torch.nn.CrossEntropyLoss()
        want = (crit(lt_m, tt_m) + crit(at_m, tt_m)).item()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_unet_loss_aux_mixing(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
        aux = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4)), jnp.int32)
        full, m = unet_loss(logits, labels, aux_logits=aux)
        f_only, _ = unet_loss(logits, labels)
        a_only, _ = unet_loss(aux, labels)
        np.testing.assert_allclose(
            float(full), 0.5 * float(f_only) + 0.5 * float(a_only), rtol=1e-6
        )

    def test_valid_mask_excludes_padding(self):
        logits = jnp.zeros((1, 4, 4, 3))
        labels = jnp.ones((1, 4, 4), jnp.int32)
        valid = jnp.zeros((1, 4, 4), bool).at[0, :2].set(True)
        # label=1 everywhere but only top half valid: acc computed there
        logits = logits.at[0, :2, :, 1].set(10.0)  # predict class 1 in valid area
        acc = nonzero_pixel_accuracy(logits, labels, valid)
        assert float(acc) == 1.0


class TestSchedule:
    def test_staircase(self):
        s = staircase_schedule(0.001, 0.95, 10, steps_per_epoch=4)
        assert float(s(0)) == pytest.approx(0.001)
        assert float(s(4 * 9)) == pytest.approx(0.001)          # epoch 9
        assert float(s(4 * 10)) == pytest.approx(0.001 * 0.95)  # epoch 10
        assert float(s(4 * 25)) == pytest.approx(0.001 * 0.95 ** 2)


def synthetic_batch(rng, n=2, hw=32, c_in=8, n_class=4):
    """Chargrid-like batch whose label is derivable from the input —
    a learnable synthetic task for the convergence smoke test."""
    x = np.zeros((n, hw, hw, c_in), np.float32)
    y = np.zeros((n, hw, hw), np.int32)
    for i in range(n):
        for _ in range(6):
            cls = int(rng.integers(1, n_class))
            ch = cls + 2
            y1, x1 = rng.integers(0, hw - 8, 2)
            hgt, wid = rng.integers(4, 8, 2)
            x[i, y1 : y1 + hgt, x1 : x1 + wid, ch] = 1.0
            y[i, y1 : y1 + hgt, x1 : x1 + wid] = cls
    valid = np.ones((n, hw, hw), bool)
    return {"input": x, "label": y, "valid": valid}


class TestTrainStep:
    def test_loss_decreases(self):
        cfg = ModelConfig(
            img_channels=8, n_class=4, scale_space_num=2, res_depth=1,
            feat_root=8, num_blocks=2,
        )
        tcfg = TrainConfig(
            optimizer="adam", learning_rate=3e-3, lr_decay_staircase=False,
            grad_clip_norm=1.0, masked_loss=True, donate_state=False,
        )
        trainer = Trainer(cfg, tcfg)
        rng = np.random.default_rng(0)
        batch = synthetic_batch(rng)
        trainer.init_state(batch["input"])
        losses = []
        for i in range(30):
            state, metrics = trainer.train_step(trainer.state, trainer.put_batch(batch))
            trainer.state = state
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.5, losses
        assert np.isfinite(losses).all()

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = ModelConfig(
            img_channels=8, n_class=4, scale_space_num=2, res_depth=1,
            feat_root=4, num_blocks=1,
        )
        trainer = Trainer(cfg, TrainConfig(donate_state=False))
        rng = np.random.default_rng(0)
        batch = synthetic_batch(rng)
        trainer.init_state(batch["input"])
        state, _ = trainer.train_step(trainer.state, trainer.put_batch(batch))
        trainer.state = state
        # wait=True: trainer2 restores via its OWN checkpointer, whose
        # wait_until_finished can't see trainer1's pending async write —
        # cross-instance readers need the writer to be durable first.
        trainer.save(str(tmp_path / "ckpt1"), wait=True)
        want = jax.tree_util.tree_leaves(trainer.state.params)
        step_want = int(trainer.state.step)

        trainer2 = Trainer(cfg, TrainConfig(donate_state=False))
        trainer2.init_state(batch["input"])
        trainer2.restore(str(tmp_path / "ckpt1"))
        got = jax.tree_util.tree_leaves(trainer2.state.params)
        assert int(trainer2.state.step) == step_want
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored too (true resume; reference never did)
        o1 = jax.tree_util.tree_leaves(trainer.state.opt_state)
        o2 = jax.tree_util.tree_leaves(trainer2.state.opt_state)
        for a, b in zip(o2, o1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFitLoop:
    def test_fit_with_provider_protocol(self, tmp_path):
        """Data-provider protocol compatible with the reference generators."""

        class Provider:
            size_val = 2

            def __init__(self):
                self.rng = np.random.default_rng(7)

            def next_data(self, split):
                return synthetic_batch(self.rng, n=1, hw=16)

        cfg = ModelConfig(
            img_channels=8, n_class=4, scale_space_num=2, res_depth=1,
            feat_root=4, num_blocks=1,
        )
        tcfg = TrainConfig(
            learning_rate=1e-3, lr_decay_staircase=False,
            checkpoint_every_epochs=1, donate_state=False,
        )
        trainer = Trainer(cfg, tcfg)
        trainer.init_state(synthetic_batch(np.random.default_rng(0), n=1, hw=16)["input"])
        hist = trainer.fit(
            Provider(), output_path=str(tmp_path), epochs=2, batch_steps_per_epoch=3,
            log_fn=lambda s: None,
        )
        assert len(hist["train_loss"]) == 2
        assert len(hist["val_loss"]) == 2
        import os
        assert any(p.startswith("model") for p in os.listdir(tmp_path))

    def test_fit_steps_override_reaches_staircase(self):
        """An overridden batch_steps_per_epoch must rebuild the staircase
        schedule (decay boundaries are in epochs, trainer.py:45-49)."""

        class Provider:
            size_val = 0

            def __init__(self):
                self.rng = np.random.default_rng(7)

            def next_data(self, split):
                return synthetic_batch(self.rng, n=1, hw=16)

        cfg = ModelConfig(
            img_channels=8, n_class=4, scale_space_num=2, res_depth=1,
            feat_root=4, num_blocks=1,
        )
        tcfg = TrainConfig(
            learning_rate=1e-3, lr_decay_staircase=True,
            lr_decay_every_epochs=1, batch_steps_per_epoch=1024,
            donate_state=False,
        )
        trainer = Trainer(cfg, tcfg)
        trainer.init_state(synthetic_batch(np.random.default_rng(0), n=1, hw=16)["input"])
        before = trainer.optimizer
        trainer.fit(Provider(), epochs=1, batch_steps_per_epoch=2,
                    log_fn=lambda s: None)
        assert trainer.optimizer is not before
        # the rebuilt schedule decays per 2-step epoch, not per 1024 steps
        from msau_tpu.train.optimizer import staircase_schedule
        sched = staircase_schedule(1e-3, 0.95, 1, steps_per_epoch=2)
        assert float(sched(2)) == pytest.approx(1e-3 * 0.95)
