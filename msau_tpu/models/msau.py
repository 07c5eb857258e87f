"""Multi-Stage Attention U-Net (MSAU) — TPU-native flax implementation.

Topology mirrors the reference network (model/model.py:53-437):

  * ``num_blocks`` (default 3) coupled attention U-Net stages.  Stage 0 takes
    the chargrid input; stages 1..n take the previous stage's n_class map.
  * Each stage: a down tower (per scale: dilated conv rate 2**scale + LRN →
    residual conv block → optional 1x1 coupling with the previous stage's
    down activation → self-attention at the deepest scale → SAME maxpool)
    and an up tower (per scale: deconv to the exact skip shape → concat skip
    → 1x1-equivalent conv → residual block → optional coupling with the
    previous stage's up activation).
  * A 4x4 ``end_conv`` maps feat_root → n_class per stage; the stage-(n-2)
    output is the auxiliary logits head (model/model.py:375-376,390-393).

All tensors are NHWC.  ``remat=True`` wraps each stage in jax.checkpoint to
trade FLOPs for HBM at 1024² scale.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from msau_tpu.config import ModelConfig
from msau_tpu.models.attention import SelfAttentionBlock
from msau_tpu.models.layers import (
    ConvBnLrnDrop,
    DeconvBnLrnDrop,
    DilConvBnLrnDrop,
    MultiConvResidualBlock,
    get_activation,
)

Dtype = Any


def _make_res_block(
    variant: str,
    channels: int,
    res_depth: int,
    filter_size: int,
    activation: str,
    dtype,
    name: str,
    box_cfg: Optional[dict] = None,
):
    """Residual block factory: dense convs (model.py:8-50) or box convs
    (model_box.py:9-59)."""
    if variant == "box":
        from msau_tpu.models.msau_box import MultiBoxConvBlock

        box_cfg = box_cfg or {}
        return MultiBoxConvBlock(
            channels=channels,
            num_convs=box_cfg.get("num_box_convs", 3),
            num_boxes=box_cfg.get("num_box_per_channel", 3),
            max_box_size=box_cfg.get("max_box_size", 28),
            activation=activation,
            dtype=dtype,
            name=name,
        )
    return MultiConvResidualBlock(
        res_depth=res_depth,
        filter_size=filter_size,
        channels=channels,
        activation=activation,
        dtype=dtype,
        name=name,
    )


class DownSamplingUNetBlock(nn.Module):
    """Down tower of one U-Net stage (reference model/model.py:53-164)."""

    scale_space_num: int
    res_depth: int
    feat_root: int
    filter_size: int
    pool_size: int
    activation: str
    use_prev_coupled: bool
    attention_impl: str = "auto"
    block_variant: str = "conv"
    box_cfg: Optional[dict] = None
    use_lrn: bool = True
    flat_scales: int = 0
    geoms: Optional[tuple] = None  # static FlatGeom tuple for scales 0..fs
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_dw_h_convs: Optional[List[jnp.ndarray]] = None,
        *,
        train: bool = False,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        if self.use_prev_coupled:
            assert prev_dw_h_convs is not None, "coupled stage needs previous tower"
        fs = self.flat_scales
        geoms = self.geoms
        dw_h_convs: List[jnp.ndarray] = []
        k = (self.filter_size, self.filter_size)
        feats = self.feat_root
        for layer in range(self.scale_space_num):
            flat = layer < fs
            geom = geoms[layer] if flat else None
            if flat and x.ndim == 4:
                # NHWC input whose channel count is too wide for the flat
                # kernels (block-0 chargrid): conv in XLA, then reshape.
                from msau_tpu.models.flat_layers import (
                    flat_eligible,
                    nhwc_to_body,
                )

                itemsize = 2 if self.dtype == jnp.bfloat16 else 4
                if not flat_eligible(x.shape[-1], k[0], k[1], geom, itemsize):
                    # conv (+ LRN) in XLA for the wide-cin entry, then
                    # convert once; moving the LRN to the body form was
                    # measured slower (XLA fuses it into the conv here).
                    # The NHWC conv runs on the GLOBAL image (correct
                    # halos), so a sharded geometry splits only after.
                    x = DilConvBnLrnDrop(
                        features=feats,
                        kernel_size=k,
                        rate=self.pool_size ** layer,
                        activation=None,
                        use_lrn=self.use_lrn,
                        dtype=self.dtype,
                        name=f"dil_conv_{layer}",
                    )(x, train=train)
                    if geom.sp > 1:
                        from msau_tpu.models.flat_layers import split_spatial

                        x = split_spatial(x, geom.sp)
                    y = nhwc_to_body(x, geom)
                else:
                    # cast BEFORE the layout change: the raw one-hot input
                    # is f32 and the to_body transpose is bandwidth-bound
                    # (4.3 GB at bs=16 512^2x64 in f32, half that in bf16)
                    xin = x if self.dtype is None else x.astype(self.dtype)
                    if geom.sp > 1:
                        from msau_tpu.models.flat_layers import split_spatial

                        xin = split_spatial(xin, geom.sp)
                    y = DilConvBnLrnDrop(
                        features=feats,
                        kernel_size=k,
                        rate=self.pool_size ** layer,
                        activation=None,
                        use_lrn=self.use_lrn,
                        dtype=self.dtype,
                        name=f"dil_conv_{layer}",
                    )(nhwc_to_body(xin, geom), train=train, geom=geom)
            else:
                y = DilConvBnLrnDrop(
                    features=feats,
                    kernel_size=k,
                    rate=self.pool_size ** layer,
                    activation=None,
                    use_lrn=self.use_lrn,
                    dtype=self.dtype,
                    name=f"dil_conv_{layer}",
                )(x, train=train, geom=geom)
            y = _make_res_block(
                self.block_variant,
                feats,
                self.res_depth,
                self.filter_size,
                self.activation,
                self.dtype,
                f"res_block_{layer}",
                self.box_cfg,
            )(y, train=train, **({"geom": geom} if flat else {}))
            if self.use_prev_coupled:
                if flat:
                    # fused concat + 1x1 conv: the 2C concat is never
                    # materialized (flatconv.flat_concat_conv1x1)
                    from msau_tpu.models.flat_layers import ConcatConv1x1

                    y = ConcatConv1x1(
                        features=feats, act=self.activation,
                        dtype=self.dtype, name=f"couple_conv_{layer}",
                    )(prev_dw_h_convs[layer], y, geom)
                else:
                    y = jnp.concatenate([prev_dw_h_convs[layer], y], axis=-1)
                    y = ConvBnLrnDrop(
                        features=feats,
                        kernel_size=(1, 1),
                        activation=self.activation,
                        dtype=self.dtype,
                        name=f"couple_conv_{layer}",
                    )(y, train=train, geom=geom)
            if layer > self.scale_space_num - 2:  # deepest scale only
                # Reference dataflow (model/model.py:149-160): the attention
                # output is stored in dw_h_convs (it feeds the NEXT stage's
                # down-coupling) while the up tower receives the
                # PRE-attention tensor.
                assert not flat, "deepest (attention) scale must stay NHWC"
                dw_h_convs.append(
                    SelfAttentionBlock(
                        input_channels=feats,
                        impl=self.attention_impl,
                        dtype=self.dtype,
                        name=f"attention_{layer}",
                    )(y)
                )
            else:
                dw_h_convs.append(y)
            if layer < self.scale_space_num - 1:
                if flat:
                    from msau_tpu.models.flat_layers import body_to_nhwc
                    from msau_tpu.ops.flatconv import body_maxpool2

                    pooled = body_maxpool2(y, geom, geoms[layer + 1])
                    if layer + 1 < fs:
                        x = pooled
                    else:
                        x = body_to_nhwc(pooled, geoms[layer + 1])
                        if geoms[layer + 1].sp > 1:
                            # deepest NHWC scales (attention) see the
                            # merged GLOBAL image; under a 'spatial' mesh
                            # axis GSPMD keeps H sharded across it
                            from msau_tpu.models.flat_layers import (
                                merge_spatial,
                            )

                            x = merge_spatial(x, geoms[layer + 1].sp)
                else:
                    x = nn.max_pool(
                        y,
                        window_shape=(self.pool_size, self.pool_size),
                        strides=(self.pool_size, self.pool_size),
                        padding="SAME",
                    )
            else:
                x = y
            feats *= self.pool_size
        return dw_h_convs, x


class UpSamplingUNetBlock(nn.Module):
    """Up tower of one U-Net stage (reference model/model.py:167-259)."""

    scale_space_num: int
    res_depth: int
    filter_size: int
    pool_size: int
    activation: str
    act_feat_num: int  # features at scale S-2 (deepest up level)
    use_prev_coupled: bool
    block_variant: str = "conv"
    box_cfg: Optional[dict] = None
    flat_scales: int = 0
    geoms: Optional[tuple] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        dw_h_convs: List[jnp.ndarray],
        x: jnp.ndarray,
        prev_up_h_convs: Optional[List[jnp.ndarray]] = None,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        if self.use_prev_coupled:
            assert prev_up_h_convs is not None, "coupled stage needs previous up tower"
        fs = self.flat_scales
        geoms = self.geoms
        k = (self.filter_size, self.filter_size)
        up_h_convs: List[Optional[jnp.ndarray]] = [None] * (self.scale_space_num - 1)
        feats = self.act_feat_num
        for layer in range(self.scale_space_num - 2, -1, -1):
            flat = layer < fs
            geom = geoms[layer] if flat else None
            skip = dw_h_convs[layer]
            if flat:
                from msau_tpu.models.flat_layers import nhwc_to_body

                if x.ndim == 4:  # crossing NHWC -> flat (layer == fs-1)
                    if geoms[layer + 1].sp > 1:
                        from msau_tpu.models.flat_layers import split_spatial

                        x = split_spatial(x, geoms[layer + 1].sp)
                    x = nhwc_to_body(x, geoms[layer + 1])
                target_hw = (geom.H, geom.W)
                y = DeconvBnLrnDrop(
                    features=feats,
                    kernel_size=k,
                    stride=self.pool_size,
                    activation=None,
                    dtype=self.dtype,
                    name=f"deconv_{layer}",
                )(x, target_hw, geom_in=geoms[layer + 1], geom_out=geom)
                # fused concat + KxK merge conv: the 2C concat is never
                # materialized (flatconv.flat_concat_conv2d)
                from msau_tpu.models.flat_layers import ConcatConvKxK

                y = ConcatConvKxK(
                    features=feats, kernel_size=k, dtype=self.dtype,
                    name=f"merge_conv_{layer}",
                )(skip, y, geom)
            else:
                target_hw = (skip.shape[1], skip.shape[2])
                y = DeconvBnLrnDrop(
                    features=feats,
                    kernel_size=k,
                    stride=self.pool_size,
                    activation=None,
                    dtype=self.dtype,
                    name=f"deconv_{layer}",
                )(x, target_hw)
                y = jnp.concatenate([skip, y], axis=-1)
                y = ConvBnLrnDrop(
                    features=feats,
                    kernel_size=k,
                    activation=None,
                    dtype=self.dtype,
                    name=f"merge_conv_{layer}",
                )(y, train=train, geom=geom)
            y = _make_res_block(
                self.block_variant,
                feats,
                self.res_depth,
                self.filter_size,
                self.activation,
                self.dtype,
                f"res_block_{layer}",
                self.box_cfg,
            )(y, train=train, **({"geom": geom} if flat else {}))
            if self.use_prev_coupled:
                if flat:
                    from msau_tpu.models.flat_layers import ConcatConv1x1

                    y = ConcatConv1x1(
                        features=feats, act=self.activation,
                        dtype=self.dtype, name=f"couple_conv_{layer}",
                    )(prev_up_h_convs[layer], y, geom)
                else:
                    y = jnp.concatenate([prev_up_h_convs[layer], y], axis=-1)
                    y = ConvBnLrnDrop(
                        features=feats,
                        kernel_size=(1, 1),
                        activation=self.activation,
                        dtype=self.dtype,
                        name=f"couple_conv_{layer}",
                    )(y, train=train, geom=geom)
            up_h_convs[layer] = y
            x = y
            feats //= self.pool_size
        return x, up_h_convs  # type: ignore[return-value]


class UNetBlock(nn.Module):
    """One full U-Net stage: down tower + up tower (model/model.py:262-344)."""

    scale_space_num: int
    res_depth: int
    feat_root: int
    filter_size: int
    pool_size: int
    activation: str
    use_prev_coupled: bool
    attention_impl: str = "auto"
    block_variant: str = "conv"
    box_cfg: Optional[dict] = None
    use_lstm: bool = False
    use_spn: bool = False
    use_lrn: bool = True
    flat_scales: int = 0
    geoms: Optional[tuple] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_dw_h_convs: Optional[List[jnp.ndarray]] = None,
        prev_up_h_convs: Optional[List[jnp.ndarray]] = None,
        *,
        train: bool = False,
    ):
        dw_h_convs, deepest = DownSamplingUNetBlock(
            scale_space_num=self.scale_space_num,
            res_depth=self.res_depth,
            feat_root=self.feat_root,
            filter_size=self.filter_size,
            pool_size=self.pool_size,
            activation=self.activation,
            use_prev_coupled=self.use_prev_coupled,
            attention_impl=self.attention_impl,
            block_variant=self.block_variant,
            box_cfg=self.box_cfg,
            use_lrn=self.use_lrn,
            flat_scales=self.flat_scales,
            geoms=self.geoms,
            dtype=self.dtype,
            name="down",
        )(x, prev_dw_h_convs, train=train)
        # optional bottleneck refinements (reference model/model.py:328-344)
        if self.use_lstm:
            from msau_tpu.models.extras import SeparableRNNBlock

            deepest = SeparableRNNBlock(
                features=deepest.shape[-1], identity=False, dtype=self.dtype,
                name="lstm",
            )(deepest)
        if self.use_spn:
            from msau_tpu.models.extras import affinity_propagate
            from msau_tpu.models.layers import DownSampleResNet

            guidance = DownSampleResNet(
                channel_in=dw_h_convs[self.scale_space_num - 2].shape[-1],
                channel_out=8,
                filter_size=self.filter_size,
                res_depth=self.res_depth,
                pool_size=self.pool_size,
                activation=self.activation,
                aux_stride=1,  # keep guidance at the deepest-map resolution
                dtype=self.dtype,
                name="spn_guidance",
            )(dw_h_convs[self.scale_space_num - 2], train=train)
            # guidance spatial dims must match the deepest map; crop/pad
            gh, gw = deepest.shape[1], deepest.shape[2]
            guidance = guidance[:, :gh, :gw, :]
            refined = affinity_propagate(
                guidance, jnp.mean(deepest, axis=-1, keepdims=True)
            )
            deepest = deepest + refined  # residual refinement
        # features at the deepest up level = feat_root * pool**(S-2)
        act_feat_num = self.feat_root * self.pool_size ** (self.scale_space_num - 2)
        out, up_h_convs = UpSamplingUNetBlock(
            scale_space_num=self.scale_space_num,
            res_depth=self.res_depth,
            filter_size=self.filter_size,
            pool_size=self.pool_size,
            activation=self.activation,
            act_feat_num=act_feat_num,
            use_prev_coupled=self.use_prev_coupled,
            block_variant=self.block_variant,
            box_cfg=self.box_cfg,
            flat_scales=self.flat_scales,
            geoms=self.geoms,
            dtype=self.dtype,
            name="up",
        )(dw_h_convs, deepest, prev_up_h_convs, train=train)
        return out, dw_h_convs, up_h_convs


class MSAUNet(nn.Module):
    """num_blocks coupled U-Net stages + per-stage 4x4 end convs.

    Returns (logits, aux_logits); aux is stage-(num_blocks-2)'s output
    (model/model.py:378-396).
    """

    config: ModelConfig
    block_variant: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 logits_layout: str = "NHWC"):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        box_cfg = {
            "num_box_convs": cfg.num_box_convs,
            "num_box_per_channel": cfg.num_box_per_channel,
            "max_box_size": cfg.max_box_size,
        }
        fs = cfg.flat_scales
        geoms = None
        if fs:
            # channel-major flat layout on the shallow scales (ops/flatconv):
            # geometries are static functions of the input resolution.
            from msau_tpu.models.flat_layers import (
                body_to_nhwc,
                make_scale_geoms,
            )

            assert fs <= cfg.scale_space_num - 1, (
                "the deepest (attention) scale must stay NHWC"
            )
            assert self.block_variant == "conv" and not cfg.use_spn
            itemsize = 2 if dtype == jnp.bfloat16 else 4
            sp = max(int(getattr(cfg, "spatial_shards", 1) or 1), 1)
            try:
                if sp > 1:
                    # spatially sharded flat scales: per-shard geometries
                    # over H/sp rows; the batch axis carries sp*N entries
                    # shard-major (flatconv.FlatGeom.sp); halo exchange is
                    # handled inside the flat ops via extend_shards
                    if x.shape[1] % sp:
                        raise ValueError(
                            f"H={x.shape[1]} not divisible by "
                            f"spatial_shards={sp}")
                    geoms = tuple(
                        g._replace(sp=sp) for g in make_scale_geoms(
                            x.shape[1] // sp, x.shape[2], fs + 1, itemsize,
                            cfg.pool_size, feat_root=cfg.feat_root,
                            n_class=cfg.n_class))
                else:
                    geoms = tuple(make_scale_geoms(
                        x.shape[1], x.shape[2], fs + 1, itemsize,
                        cfg.pool_size,
                        feat_root=cfg.feat_root, n_class=cfg.n_class,
                    ))
            except ValueError:
                # no 128-aligned flat tiling exists at this resolution
                # (e.g. odd widths): fall back to the all-NHWC layout.
                fs = 0
                geoms = None
        prev_dw = None
        prev_up = None
        logits_aux = None
        out = x
        block_cls = nn.remat(UNetBlock, static_argnums=()) if cfg.remat else UNetBlock
        for block_id in range(cfg.num_blocks):
            stage = block_cls(
                scale_space_num=cfg.scale_space_num,
                res_depth=cfg.res_depth,
                feat_root=cfg.feat_root,
                filter_size=cfg.filter_size,
                pool_size=cfg.pool_size,
                activation=cfg.activation_name,
                use_prev_coupled=block_id > 0,
                attention_impl=cfg.attention_impl,
                block_variant=self.block_variant,
                box_cfg=box_cfg,
                use_lstm=cfg.use_lstm,
                use_lrn=cfg.use_lrn,
                # SPN only on the last stage (model/model.py:365-368)
                use_spn=cfg.use_spn and block_id == cfg.num_blocks - 1,
                flat_scales=fs,
                geoms=geoms,
                dtype=dtype,
                name=f"block_{block_id}",
            )
            out, prev_dw, prev_up = stage(out, prev_dw, prev_up, train=train)
            out = ConvBnLrnDrop(
                features=cfg.n_class,
                kernel_size=(4, 4),
                activation=None,
                dtype=dtype,
                name=f"end_conv_{block_id}",
            )(out, train=train, geom=geoms[0] if fs else None)
            if block_id == cfg.num_blocks - 2:
                logits_aux = out
        if fs:
            if logits_layout == "BODY":
                # raw body-flat [N, C, LB] logits in compute dtype: the
                # loss converts labels/valid to body columns instead (one
                # cheap int pad) — the logits from_body reshape and its
                # backward transpose were ~6 ms/step at the flagship shape
                if logits_aux is None:
                    logits_aux = out
                return out, logits_aux
            if logits_layout == "NCHW":
                # compact [N, C, H, W] — no lane-padded transpose; the
                # channel_axis-aware loss consumes this directly
                from msau_tpu.ops.flatconv import from_body

                out = from_body(out, geoms[0])
                if logits_aux is not None:
                    logits_aux = from_body(logits_aux, geoms[0])
                if geoms[0].sp > 1:
                    sp0 = geoms[0].sp

                    def _merge_nchw(t):
                        ne, c, hs, w = t.shape
                        t = t.reshape(sp0, ne // sp0, c, hs, w)
                        return jnp.moveaxis(t, 0, 2).reshape(
                            ne // sp0, c, sp0 * hs, w)

                    out = _merge_nchw(out)
                    if logits_aux is not None:
                        logits_aux = _merge_nchw(logits_aux)
            else:
                out = body_to_nhwc(out, geoms[0])
                if logits_aux is not None:
                    logits_aux = body_to_nhwc(logits_aux, geoms[0])
                if geoms[0].sp > 1:
                    from msau_tpu.models.flat_layers import merge_spatial

                    out = merge_spatial(out, geoms[0].sp)
                    if logits_aux is not None:
                        logits_aux = merge_spatial(logits_aux, geoms[0].sp)
        elif logits_layout == "NCHW":
            out = jnp.transpose(out, (0, 3, 1, 2))
            if logits_aux is not None:
                logits_aux = jnp.transpose(logits_aux, (0, 3, 1, 2))
        elif logits_layout == "BODY":
            # NHWC fallback (no feasible flat geometry): keep NHWC logits;
            # the caller detects the rank-4 output and uses plain labels
            pass
        logits = out.astype(jnp.float32)
        if logits_aux is None:
            logits_aux = logits
        else:
            logits_aux = logits_aux.astype(jnp.float32)
        return logits, logits_aux


class MSAUWrapper(nn.Module):
    """Adds the final activation head (model/model.py:399-437).

    __call__ returns (probs, logits, aux_logits) like the reference forward.
    """

    config: ModelConfig

    def setup(self):
        if self.config.model == "msau_box":
            from msau_tpu.models.msau_box import BMSAUNet  # lazy: optional variant

            self.net = BMSAUNet(self.config)
        else:
            self.net = MSAUNet(self.config)

    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 logits_layout: str = "NHWC"):
        if isinstance(self.net, MSAUNet):
            logits, aux_logits = self.net(x, train=train,
                                          logits_layout=logits_layout)
        else:
            # box variant has no flat layout; honor the contract manually
            logits, aux_logits = self.net(x, train=train)
            if logits_layout == "NCHW":
                logits = jnp.transpose(logits, (0, 3, 1, 2))
                aux_logits = jnp.transpose(aux_logits, (0, 3, 1, 2))
        # BODY logits are [N, C, LB] (falling back to NHWC rank-4 when no
        # flat geometry exists) — channel axis is 1 in either compact form
        caxis = 1 if (logits_layout == "NCHW"
                      or (logits_layout == "BODY" and logits.ndim == 3)) else -1
        final_act = self.config.final_act
        if final_act == "softmax":
            probs = jax.nn.softmax(logits, axis=caxis)
        elif final_act == "sigmoid":
            probs = jax.nn.sigmoid(logits)
        else:
            probs = logits
        return probs, logits, aux_logits


def build_model(config: ModelConfig) -> MSAUWrapper:
    return MSAUWrapper(config=config)
