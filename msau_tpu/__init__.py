"""msau_tpu — a TPU-native document key-value extraction framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the MSAU
(Multi-Stage Attention U-Net) reference pipeline:

  * chargrid rasterization of OCR'd document text boxes (on-device scatter,
    replacing per-character Python loops),
  * a multi-stage attention-gated U-Net segmentation model (flax.linen,
    NHWC, bf16-friendly, fused attention via Pallas at scale),
  * training (optax + pjit data parallelism + orbax checkpointing),
  * inference KV decoding (XLA morphology + on-device connected components),
  * multi-device scaling via jax.sharding.Mesh (data + spatial axes).

Reference behavior studied from datvo06/MSAU (PyTorch); this package is a
new TPU-first implementation, not a port.
"""

__version__ = "0.1.0"

from msau_tpu.config import (
    Config,
    DataConfig,
    InferConfig,
    ModelConfig,
    TrainConfig,
)


def configure_tpu_precision(precision: str = "BF16_BF16_F32_X3") -> bool:
    """Set the matmul precision needed for stable training on TPU.

    The TPU backend's default bf16 multiplies destabilize gradients through
    the LRN/attention stack (measured grad-norm inflation 14 -> 3155 at
    init; see PERF.md).  ``Trainer`` applies this automatically; call this
    when writing a custom training loop.  No-op on CPU.  Returns True if
    the config was applied.
    """
    import jax

    if jax.default_backend() == "cpu":
        return False
    jax.config.update("jax_default_matmul_precision", precision)
    return True

__all__ = [
    "Config",
    "DataConfig",
    "InferConfig",
    "ModelConfig",
    "TrainConfig",
    "__version__",
]
