"""Numerical parity against the actual reference network.

Builds the torch ``MSAUWrapper`` (reference model/model.py:399-437),
transplants its weights into the flax model via
``msau_tpu.utils.transplant``, and asserts the forward outputs match to
float32 tolerance on random chargrids.  This is the direct evidence for
BASELINE.md's "per-pixel class maps matching the reference implementation".
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _load_reference_wrapper():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        from model.model import MSAUWrapper  # type: ignore

        return MSAUWrapper
    except Exception as e:  # pragma: no cover - reference tree absent
        pytest.skip(f"reference implementation unavailable: {e}")


@pytest.mark.parametrize(
    "scale_space_num,res_depth,hw",
    [
        (4, 2, 48),   # FUNSD entry-A hyperparameters (train_chargrid_funsd_msau.py:205-215)
        (6, 3, 64),   # reference defaults (model/model.py:404-405)
    ],
)
def test_forward_parity_weight_transplant(scale_space_num, res_depth, hw):
    RefWrapper = _load_reference_wrapper()
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.utils.transplant import torch_state_dict_to_flax

    channels, n_class, feat_root = 8, 5, 8
    model_kwargs = dict(
        model="msau", final_act="softmax", featRoot=feat_root,
        scale_space_num=scale_space_num, res_depth=res_depth,
        activation_name="relu", filter_size=3, pool_size=2,
    )
    torch.manual_seed(42)
    ref = RefWrapper(channels=channels, n_class=n_class, model_kwargs=model_kwargs)
    ref.eval()

    cfg = ModelConfig(
        img_channels=channels, n_class=n_class, feat_root=feat_root,
        scale_space_num=scale_space_num, res_depth=res_depth,
        num_blocks=3, final_act="softmax", activation_name="relu",
    )
    model = build_model(cfg)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_dict_to_flax(sd, scale_space_num=scale_space_num)

    # structure must match the model's own init exactly
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, channels)))
    ref_paths = jax.tree_util.tree_structure(init)
    got_paths = jax.tree_util.tree_structure(params)
    assert ref_paths == got_paths, "transplanted tree differs from init tree"

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, hw, hw, channels), np.float32)

    with torch.no_grad():
        t_probs, t_logits, t_aux = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_probs = t_probs.numpy().transpose(0, 2, 3, 1)
    t_logits = t_logits.numpy().transpose(0, 2, 3, 1)
    t_aux = t_aux.numpy().transpose(0, 2, 3, 1)

    probs, logits, aux = jax.jit(model.apply)(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(logits), t_logits, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux), t_aux, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probs), t_probs, atol=1e-5, rtol=1e-4)
    # per-pixel class maps match
    assert (np.asarray(probs).argmax(-1) == t_probs.argmax(-1)).mean() > 0.999


def test_forward_parity_odd_resolution():
    """Odd H/W exercise the output_size= deconv path (model/model.py:230)."""
    RefWrapper = _load_reference_wrapper()
    import jax.numpy as jnp

    from msau_tpu.config import ModelConfig
    from msau_tpu.models.msau import build_model
    from msau_tpu.utils.transplant import torch_state_dict_to_flax

    channels, n_class = 6, 4
    model_kwargs = dict(
        model="msau", final_act="softmax", featRoot=8, scale_space_num=4,
        res_depth=2, activation_name="relu",
    )
    torch.manual_seed(1)
    ref = RefWrapper(channels=channels, n_class=n_class, model_kwargs=model_kwargs)
    ref.eval()

    cfg = ModelConfig(
        img_channels=channels, n_class=n_class, feat_root=8,
        scale_space_num=4, res_depth=2, num_blocks=3, final_act="softmax",
    )
    model = build_model(cfg)
    params = torch_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        scale_space_num=4,
    )
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 45, 37, channels), np.float32)
    with torch.no_grad():
        _, t_logits, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    _, logits, _ = jax.jit(model.apply)(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(logits), t_logits.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4,
    )
