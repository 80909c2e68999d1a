"""PIFE: Patch-Integrated Feature Extractor (backbone wrapper).

Reference equivalent: `build_transformer` (modeling/meta_arch.py:32-103),
which runs the backbone once per modality — three sequential passes
(modeling/make_model.py:727-729).

TPU-first redesign: the three modality streams are stacked on a leading axis
and the backbone runs ONCE over a (3B, H, W, 3) batch, so every matmul is 3x
bigger and the MXU stays busy.  The per-sample camera SIE gather is tiled
across the modality axis.  Missing-modality simulation multiplies the input
images by a per-modality mask inside the same jitted graph (replacing the
reference's eval-time Python zeroing, modeling/make_model.py:718-724).

Outputs: patch tokens (3, B, N, C) and global CLS features (3, B, C), where C
is 512 for the CLIP backbone (projected) and 768 for the ImageNet ViT.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .clip_vit import CLIPVisionTransformer
from .vit import ImageNetViT


def patch_grid_for(
    transformer_type: str, img_size, stride_size
) -> Tuple[int, int]:
    """Token-grid (gh, gw) per backbone — the ONE definition (review round
    4: demo.py kept a divergent copy that crashed FRCA/SACR/LIF reshapes for
    non-default strides).

    ViT family (CLIP + ImageNet + deit/swin aliases): VALID 16-kernel patch
    conv at the configured stride -> (H-16)//s + 1 per side (the reference's
    h_resolution, make_model_clipreid.py:81; H//s coincides only when
    16 % s == 0 and s | H).
    """
    h, w = img_size
    if transformer_type.startswith("t2t"):
        # Three soft splits with strides 4*2*2 = 16 (t2t.py:89-90).
        return h // 16, w // 16
    if transformer_type.startswith(("resnet", "osnet")):
        # Both CNN trunks are 16-stride (resnet: stem+maxpool+layer2/3,
        # last_stride=1; osnet: conv1+maxpool+two transitions).
        return -(-h // 16), -(-w // 16)
    sh, sw = stride_size
    return (h - 16) // sh + 1, (w - 16) // sw + 1

NUM_MODALITIES = 3  # RGB, NIR, TIR


class PIFE(nn.Module):
    transformer_type: str = "ViT-B-16"
    img_size: Tuple[int, int] = (256, 128)
    stride_size: Tuple[int, int] = (16, 16)
    camera_num: int = 0
    view_num: int = 0
    sie_camera: bool = True
    sie_view: bool = False
    sie_coe: float = 3.0
    drop_path: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dtype: Any = jnp.float32
    attn_implementation: str = "xla"
    remat: bool = False
    # Size overrides (-1 = architecture default); used by tests/benchmarks.
    depth_override: int = -1
    width_override: int = -1
    heads_override: int = -1
    # LoRA rank for the frozen-backbone fine-tuning path (MODEL.FROZEN).
    lora_rank: int = 0
    # Per-slice qkv enablement (MergedLinear semantics when not all-True).
    lora_enable: tuple = (True, True, True)
    # ConvLoRA on the patch-embed conv (clip/LoRA.py:231-298 semantics).
    lora_conv: bool = False
    # MambaPro FFN adapters in each CLIP block (MODEL.ADAPTER).
    use_adapter: bool = False
    # MambaPro per-block modality prompt tokens (MODEL.PROMPT); requires
    # the CLIP backbone (stacked modality-major rows).
    use_prompt: bool = False
    # Sub-bf16 experiment: int8 forward for the CLIP MLP GEMMs
    # (TPU.INT8_MLP; "off" | "dynamic" | "static"; see ops/quant.py).
    int8_mlp: str = "off"
    # Run the Pallas fused MLP in training too (TPU.FUSED_MLP_TRAIN).
    fused_mlp_train: bool = False
    pallas_ln_bwd: bool = False

    @property
    def feat_dim(self) -> int:
        if "ViT-B-16" in self.transformer_type:
            return 512
        if self.transformer_type in ("t2t_vit_t_14", "t2t_vit_t_24"):
            from .t2t import T2T_CONFIGS

            dim = T2T_CONFIGS[self.transformer_type][0]
            return dim if self.width_override < 0 else self.width_override
        if "swin" in self.transformer_type or "deit_small" in self.transformer_type:
            # 'swin_small_patch16_224' is not Swin at all in the reference —
            # it builds the plain `Trans` ViT at width 384
            # (vit_pytorch.py:524-535) and is absent from the factory map;
            # deit_small is the same config (:512-523), registered but
            # broken by the reference's 768-assuming feat-dim dispatch.
            return 384 if self.width_override < 0 else self.width_override
        if self.transformer_type.startswith("resnet"):
            return 2048  # 512 * Bottleneck.expansion (resnet.py:192)
        if self.transformer_type.startswith("osnet"):
            from .osnet import OSNET_CONFIGS

            return OSNET_CONFIGS[self.transformer_type][1][3]
        return 768 if self.width_override < 0 else self.width_override

    @property
    def patch_grid(self) -> Tuple[int, int]:
        return patch_grid_for(
            self.transformer_type, self.img_size, self.stride_size
        )

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, 3, H, W, 3): [batch, modality, H, W, chan]
        cam_label: Optional[jnp.ndarray] = None,  # (B,) int32
        view_label: Optional[jnp.ndarray] = None,
        modality_mask: Optional[jnp.ndarray] = None,  # (3,) or (B, 3) float
        deterministic: bool = True,
    ):
        if self.use_prompt and "ViT-B-16" not in self.transformer_type:
            raise NotImplementedError(
                "MODEL.PROMPT is only defined for the CLIP backbone"
            )
        b = images.shape[0]
        m = NUM_MODALITIES
        if modality_mask is not None:
            mask = jnp.asarray(modality_mask, images.dtype)
            if mask.ndim == 1:
                mask = mask[None, :]
            images = images * mask[:, :, None, None, None]

        # (B, M, H, W, 3) -> (M*B, H, W, 3); modality-major so each stream is
        # contiguous and per-modality splits are simple reshapes.
        x = jnp.swapaxes(images, 0, 1).reshape(m * b, *images.shape[2:])
        cams = None if cam_label is None else jnp.tile(cam_label, m)
        views = None if view_label is None else jnp.tile(view_label, m)

        if "ViT-B-16" in self.transformer_type:
            gh, gw = self.patch_grid
            cv_emb = None
            if self.sie_camera and self.camera_num > 0:
                # SIE embedding lives on the wrapper for the CLIP path
                # (reference: meta_arch.py:75-86); added to CLS token only.
                cv_embed = self.param(
                    "cv_embed",
                    nn.initializers.truncated_normal(1e-6),
                    (self.camera_num, 768),
                    jnp.float32,
                )
                cv_emb = self.sie_coe * cv_embed[cams]
            width = 768 if self.width_override < 0 else self.width_override
            depth = 12 if self.depth_override < 0 else self.depth_override
            heads = (width // 64) if self.heads_override < 0 else self.heads_override
            if cv_emb is not None and width != 768:
                cv_emb = cv_emb[:, :width]
            tokens = CLIPVisionTransformer(
                h_resolution=gh,
                w_resolution=gw,
                stride_size=self.stride_size[0],
                width=width,
                layers=depth,
                heads=heads,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                remat=self.remat,
                lora_rank=self.lora_rank,
                lora_enable=self.lora_enable,
                lora_conv=self.lora_conv,
                use_adapter=self.use_adapter,
                use_prompt=self.use_prompt,
                int8_mlp=self.int8_mlp,
                fused_mlp_train=self.fused_mlp_train,
                pallas_ln_bwd=self.pallas_ln_bwd,
                name="base",
            )(x, cv_emb, deterministic)
        elif self.transformer_type.startswith("resnet"):
            # CNN path (the zoo's flagship; no SIE — the reference CNNs have
            # none).  Tokens = GAP global + flattened 16-stride map, so every
            # fusion module downstream works on CNN features unchanged.
            from .resnet import RESNET_CONFIGS, ResNet, resnet_tokens

            if self.transformer_type not in RESNET_CONFIGS:
                raise NotImplementedError(
                    f"'{self.transformer_type}': only the Bottleneck variants "
                    f"{sorted(RESNET_CONFIGS)} are ported (resnet18/34 use "
                    "BasicBlock and, like the rest of the CNN zoo, are dead "
                    "weight no reference code path can reach)"
                )
            layers, ibn = RESNET_CONFIGS[self.transformer_type]
            fmap = ResNet(
                layers=layers,
                ibn=ibn,
                dtype=self.dtype,
                name="base",
            )(x, train=not deterministic)
            g, t = resnet_tokens(fmap)
            tokens = jnp.concatenate([g[:, None, :], t], axis=1)
        elif self.transformer_type.startswith("osnet"):
            from .osnet import OSNET_AIN_VARIANTS, OSNET_CONFIGS, OSNet
            from .resnet import resnet_tokens

            if self.transformer_type not in OSNET_CONFIGS:
                raise NotImplementedError(
                    f"'{self.transformer_type}': ported widths are "
                    f"{sorted(OSNET_CONFIGS)}"
                )
            layers, chans = OSNET_CONFIGS[self.transformer_type]
            ain = self.transformer_type.startswith("osnet_ain")
            fmap = OSNet(
                layers=layers, channels=chans,
                block_variants=OSNET_AIN_VARIANTS if ain else None,
                conv1_in=ain, dtype=self.dtype, name="base",
            )(x, train=not deterministic)
            g, t = resnet_tokens(fmap)
            tokens = jnp.concatenate([g[:, None, :], t], axis=1)
        elif self.transformer_type in ("t2t_vit_t_14", "t2t_vit_t_24"):
            # T2T hooks: registered-but-unrunnable in the reference
            # (meta_arch.py never constructs them); a working backbone here.
            from .t2t import T2T_CONFIGS, T2TViT

            dim, depth, heads = T2T_CONFIGS[self.transformer_type]
            tokens = T2TViT(
                img_size=tuple(self.img_size),
                embed_dim=dim if self.width_override < 0 else self.width_override,
                depth=depth if self.depth_override < 0 else self.depth_override,
                num_heads=heads if self.heads_override < 0 else self.heads_override,
                camera=self.camera_num if self.sie_camera else 0,
                view=self.view_num if self.sie_view else 0,
                sie_xishu=self.sie_coe,
                drop_path_rate=self.drop_path,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                remat=self.remat,
                name="base",
            )(x, cams, views, deterministic=deterministic)
        else:
            # ImageNet ViT family (reference factory: vit_pytorch.py:487-523;
            # make_model's feat-dim dispatch supports the 768-d variants).
            embed_dim = 768
            if "vit_small" in self.transformer_type:
                depth, heads, mlp_ratio, qkv_bias = 8, 8, 3.0, False
                qk_scale = 768 ** -0.5
            elif "swin" in self.transformer_type or "deit_small" in self.transformer_type:
                # Identical 384-wide Trans configs (vit_pytorch.py:512-535);
                # the reference REGISTERS deit_small but its make_model
                # feat-dim dispatch assumes 768 and breaks — working here.
                depth, heads, mlp_ratio, qkv_bias = 12, 6, 4.0, True
                qk_scale = None
                embed_dim = 384
            elif "vit_base" in self.transformer_type or "deit_base" in self.transformer_type:
                depth, heads, mlp_ratio, qkv_bias = 12, 12, 4.0, True
                qk_scale = None
            else:
                raise NotImplementedError(
                    f"TRANSFORMER_TYPE '{self.transformer_type}' is not supported; "
                    "use 'ViT-B-16' (CLIP), 'vit_base_patch16_224', "
                    "'deit_base_patch16_224', 'deit_small_patch16_224', "
                    "'vit_small_patch16_224', 't2t_vit_t_14' or 't2t_vit_t_24'. "
                    "(swin is an unregistered dead mention in the reference.)"
                )
            tokens = ImageNetViT(
                img_size=tuple(self.img_size),
                stride_size=tuple(self.stride_size),
                embed_dim=embed_dim if self.width_override < 0 else self.width_override,
                depth=depth if self.depth_override < 0 else self.depth_override,
                num_heads=heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias,
                qk_scale=qk_scale,
                camera=self.camera_num if self.sie_camera else 0,
                view=self.view_num if self.sie_view else 0,
                sie_xishu=self.sie_coe,
                drop_path_rate=self.drop_path,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                remat=self.remat,
                name="base",
            )(x, cams, views, deterministic=deterministic)

        tokens = tokens.reshape(m, b, *tokens.shape[1:])  # (M, B, N+1, C)
        global_feat = tokens[:, :, 0]  # (M, B, C)
        patches = tokens[:, :, 1:]  # (M, B, N, C)
        return patches, global_feat
