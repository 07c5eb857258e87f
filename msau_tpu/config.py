"""Typed configuration tree for the whole framework.

One dataclass hierarchy, JSON round-trippable.  ``ModelConfig`` additionally
round-trips through the reference's ad-hoc ``model_kwargs.json`` schema
(reference: train_chargrid_funsd_msau.py:205-220, model/model.py:399-433)
so checkpoint metadata written by the reference tooling can be consumed.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ModelConfig:
    """Hyper-parameters of the MSAU segmentation network.

    Defaults mirror the reference defaults (model/model.py:406-419);
    FUNSD entry-point overrides are featRoot=8, scale_space_num=4,
    res_depth=2 (train_chargrid_funsd_msau.py:211-214).
    """

    model: str = "msau"                # "msau" | "msau_box" | "unet"
    img_channels: int = 1              # input channels (chargrid token dim)
    n_class: int = 2                   # output classes (incl. background 0)
    scale_space_num: int = 6           # number of U-Net scales
    res_depth: int = 3                 # convs per residual block
    feat_root: int = 8                 # features at the first scale
    filter_size: int = 3               # conv kernel size
    pool_size: int = 2                 # pooling stride / feature multiplier
    activation_name: str = "relu"      # "relu" | "elu"
    final_act: str = "softmax"         # "softmax" | "sigmoid" | "identity"
    num_blocks: int = 3                # number of coupled U-Net stages
    use_auxiliary_loss: bool = True
    use_lstm: bool = False             # separable RNN at the bottleneck
    use_spn: bool = False              # CSPN refinement on the last stage
    use_lrn: bool = True               # LRN after dilated convs (reference
                                       # default, model/layers/layers.py:108)
    # --- box-convolution variant (reference model/model_box.py:360-406) ---
    num_box_convs: int = 3
    max_box_size: int = 28
    num_box_per_channel: int = 3
    # --- TPU-specific knobs (no reference analog) ---
    dtype: str = "float32"             # compute dtype: "float32" | "bfloat16"
    attention_impl: str = "auto"       # "auto" | "xla" | "pallas"
    remat: bool = False                # jax.checkpoint each U-Net stage
    flat_scales: int = 0               # shallow scales in channel-major flat
                                       # layout (Pallas convs, ops/flatconv);
                                       # 0 = all-NHWC
    spatial_shards: int = 1            # split H into this many shards on the
                                       # flat scales (batch axis carries
                                       # sp*N shard-major entries; halo
                                       # exchange via flatconv.extend_shards)
                                       # — pair with a 'spatial' mesh axis of
                                       # the same size; deepest NHWC scales
                                       # see the merged global image

    # ------------------------------------------------------------------
    # reference `model_kwargs.json` compatibility
    # ------------------------------------------------------------------
    _MODEL_KWARGS_MAP = {
        "model": "model",
        "final_act": "final_act",
        "featRoot": "feat_root",
        "scale_space_num": "scale_space_num",
        "res_depth": "res_depth",
        "n_class": "n_class",
        "img_channels": "img_channels",
        "use_auxiliary_loss": "use_auxiliary_loss",
        "filter_size": "filter_size",
        "pool_size": "pool_size",
        "activation_name": "activation_name",
        "num_box_convs": "num_box_convs",
        "max_box_sizes": "max_box_size",
        "num_box_per_channels": "num_box_per_channel",
        # extension key (not in the reference schema, which hardcodes 3
        # blocks at model/model.py:355); absent keys keep the default
        "num_blocks": "num_blocks",
    }

    def to_model_kwargs(self) -> Dict[str, Any]:
        """Serialize to the reference's ``model_kwargs.json`` schema."""
        return {k: getattr(self, attr) for k, attr in self._MODEL_KWARGS_MAP.items()}

    @classmethod
    def from_model_kwargs(cls, kwargs: Dict[str, Any]) -> "ModelConfig":
        """Build from a reference-style ``model_kwargs`` dict (extra keys ignored)."""
        known = {}
        for k, attr in cls._MODEL_KWARGS_MAP.items():
            if k in kwargs:
                known[attr] = kwargs[k]
        return cls(**known)


@dataclass
class DataConfig:
    """Chargrid generation / augmentation parameters.

    Mirrors the reference `kwargs_dat` dict
    (data_generator/data_generator_funsd.py:53-104) plus TPU bucketing.
    """

    n_classes: int = 5
    charset_path: Optional[str] = None
    batch_size: int = 1
    # text height scaling (pixels of text height after rescale)
    scale_min: float = 2.0
    scale_max: float = 4.0
    scale_val: float = 3.0
    # augmentation
    affine: bool = False
    affine_value: float = 0.025
    elastic: bool = False
    elastic_value_x: float = 0.0002
    elastic_value_y: float = 0.0002
    rotate: bool = False               # U(-20, 20) degrees (data_generator_text.py:308)
    rotate_mod90: bool = False         # exact k*90 rotation (rotateMod90 intent)
    text_err: float = 0.0              # OCR-noise injection rate
    shuffle: bool = True
    # static-shape bucketing for XLA (no reference analog: reference uses
    # data-dependent image sizes, data_generator_funsd.py:330-334)
    buckets: Tuple[int, ...] = (256, 512, 1024)
    max_chars: int = 8192              # per-image char-box budget (padded)
    max_lines: int = 1024              # per-image line budget (padded)
    prefetch: int = 2
    num_workers: int = 2


@dataclass
class TrainConfig:
    """Optimizer / loop parameters (reference model/training/*)."""

    optimizer: str = "adam"            # "adam" | "rmsprop" | "momentum"
    learning_rate: float = 1e-4        # entry A default (train_chargrid_funsd_msau.py:25)
    lr_decay_staircase: bool = True    # 0.001 * 0.95 ** (epoch // 10) (trainer.py:45-49)
    lr_decay_rate: float = 0.95
    lr_decay_every_epochs: int = 10
    weight_decay: float = 0.0
    momentum: float = 0.9
    grad_clip_norm: float = 1.0
    epochs: int = 250
    batch_steps_per_epoch: int = 1024
    checkpoint_every_epochs: int = 8
    seed: int = 777
    # Matmul/conv precision for the train step.  On TPU the backend default
    # is bf16 multiplies, which destabilizes gradients through the LRN /
    # attention stack (measured: grad norm 14 -> 3155 at init).  bfloat16_3x
    # recovers near-f32 accuracy at ~1/3 the f32 MXU cost (enum BF16_BF16_F32_X3).
    matmul_precision: str = "BF16_BF16_F32_X3"  # "" = leave backend default
    loss_aux_weight: float = 0.5       # 0.5*final + 0.5*aux (cost.py:61)
    masked_loss: bool = True           # entry-A masked CE (model/model.py:446-459)
    donate_state: bool = True
    # mesh layout
    mesh_shape: Tuple[int, ...] = (-1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass
class InferConfig:
    """KV decoding parameters (reference inference/kv_model.py)."""

    scale: float = 3.0                 # text height target (kv_model.py:22)
    n_class: int = 17
    class_names: Tuple[str, ...] = ()
    multiple_lines_fields: Tuple[int, ...] = (5, 11)   # kv_model.py:155
    min_component_area: int = 5        # kv_model.py:192
    closing_size: Tuple[int, int] = (1, 3)             # kv_model.py:176
    iou_threshold: float = 0.7         # field match criterion
    max_ccl_iters: int = 64            # bound for on-device CCL fixpoint


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)

    # ------------------------------------------------------------------
    # JSON round-trip
    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), **kw)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        def build(dc_cls, sub: Dict[str, Any]):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                ft = fields[k].type
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc_cls(**kwargs)

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            data=build(DataConfig, d.get("data", {})),
            train=build(TrainConfig, d.get("train", {})),
            infer=build(InferConfig, d.get("infer", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json(indent=2))

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())
