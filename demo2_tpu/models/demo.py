"""DeMo model assemblies: DeMo, DeMo_Parallel, DeMoLegacy (Beiyong).

Reference: modeling/make_model.py — `DeMo` 4-branch simplified architecture
(:450-962), `DeMo_Parallel` 9-head architecture (:976-1206), `DeMoBeiyong`
legacy cascade (:23-439), factory (:1223-1237).

TPU-first redesign highlights:
  * ONE backbone pass over the stacked (3B, ...) modality batch (replaces the
    3 sequential BACKBONE calls at make_model.py:727-729);
  * all branches always produce a dict {branch: (logits, feat)} plus the
    inference embedding — no variable-length tuple protocol
    (engine/processor.py:67-101 in the reference);
  * missing-modality simulation is a multiplicative (B, 3) mask inside the
    same jitted graph (replacing the eval-time zeroing at :718-724);
  * the orphaned HDM+ATMoE path (constructed at :131-138 but never called in
    the fork) is restored as a first-class 'moe' branch selected by
    MODEL.HDM/ATM, with `return_pattern` (1=ori, 2=moe, 3=[moe, ori])
    controlling the eval embedding (original-paper semantics,
    engine/processor.py:216-221).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.defaults import Config, feat_dim_for
from .dgaf import (
    DualGatedAdaptiveFusionV3,
    DualGatedAdaptiveFusionV3Multi,
    DualGatedAdaptiveFusionV4,
    DualGatedPostFusion,
)
from .frca import FourierResidualChannelAttention
from .hdm_atmoe import GeneralFusion
from .heads import ClassifierHead, GlobalLocalFuse
from .lif import TrimodalLIF, lif_loss, lif_reweight
from .pife import PIFE
from .sacr import SACR, MultiModalSACR, MultiModalSACRv2
from .sdtps import MultiModalSDTPS
from ..ops.attention import MultiHeadAttention
from ..ops.norm import LayerNorm


def _dtype_of(cfg: Config):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


def _attn_impl(cfg: Config) -> str:
    return "pallas" if cfg.TPU.USE_FLASH_ATTENTION else "xla"


class _DeMoBase(nn.Module):
    """Shared construction helpers for the assemblies."""

    cfg: Config
    num_classes: int
    camera_num: int
    view_num: int = 0

    @property
    def feat_dim(self) -> int:
        return feat_dim_for(self.cfg.MODEL.TRANSFORMER_TYPE)

    @property
    def patch_grid(self) -> Tuple[int, int]:
        from .pife import patch_grid_for

        return patch_grid_for(
            self.cfg.MODEL.TRANSFORMER_TYPE,
            tuple(self.cfg.INPUT.SIZE_TRAIN),
            tuple(self.cfg.MODEL.STRIDE_SIZE),
        )

    def _pife(self):
        cfg = self.cfg
        return PIFE(
            transformer_type=cfg.MODEL.TRANSFORMER_TYPE,
            img_size=tuple(cfg.INPUT.SIZE_TRAIN),
            stride_size=tuple(cfg.MODEL.STRIDE_SIZE),
            camera_num=self.camera_num,
            view_num=self.view_num,
            sie_camera=cfg.MODEL.SIE_CAMERA,
            sie_view=cfg.MODEL.SIE_VIEW,
            sie_coe=cfg.MODEL.SIE_COE,
            drop_path=cfg.MODEL.DROP_PATH,
            drop_rate=cfg.MODEL.DROP_OUT,
            attn_drop_rate=cfg.MODEL.ATT_DROP_RATE,
            dtype=_dtype_of(cfg),
            attn_implementation=_attn_impl(cfg),
            remat=cfg.TPU.REMAT_BACKBONE,
            depth_override=cfg.TPU.BACKBONE_DEPTH,
            width_override=cfg.TPU.BACKBONE_WIDTH,
            heads_override=cfg.TPU.BACKBONE_HEADS,
            lora_rank=cfg.TPU.LORA_RANK if cfg.MODEL.FROZEN else 0,
            lora_enable=tuple(m in cfg.TPU.LORA_ENABLE for m in "qkv"),
            lora_conv=cfg.TPU.LORA_CONV,
            use_adapter=cfg.MODEL.ADAPTER,
            use_prompt=cfg.MODEL.PROMPT,
            int8_mlp=cfg.TPU.INT8_MLP,
            fused_mlp_train=getattr(cfg.TPU, "FUSED_MLP_TRAIN", False),
            pallas_ln_bwd=getattr(cfg.TPU, "PALLAS_LN_BWD", False),
            name="backbone",
        )

    def _sdtps(self):
        cfg = self.cfg
        if cfg.MODEL.SDTPS_VARIANT in ("complete", "fixed"):
            from .sdtps_variants import SDTPSComplete

            return SDTPSComplete(
                embed_dim=self.feat_dim,
                num_heads=cfg.MODEL.SDTPS_CROSS_ATTN_HEADS,
                sparse_ratio=cfg.MODEL.SDTPS_SPARSE_RATIO,
                use_gumbel=cfg.MODEL.SDTPS_USE_GUMBEL,
                gumbel_tau=cfg.MODEL.SDTPS_GUMBEL_TAU,
                use_cross_attn=cfg.MODEL.SDTPS_CROSS_ATTN_TYPE == "attention",
                dtype=_dtype_of(cfg),
                name="sdtps",
            )
        return MultiModalSDTPS(
            embed_dim=self.feat_dim,
            sparse_ratio=cfg.MODEL.SDTPS_SPARSE_RATIO,
            use_gumbel=cfg.MODEL.SDTPS_USE_GUMBEL,
            gumbel_tau=cfg.MODEL.SDTPS_GUMBEL_TAU,
            use_cross_attn=cfg.MODEL.SDTPS_CROSS_ATTN_TYPE == "attention",
            share_cross_attn_weights=cfg.MODEL.SDTPS_SHARE_CROSS_ATTN,
            dtype=_dtype_of(cfg),
            name="sdtps",
        )

    def _dgaf(self, num_modalities: int = 3):
        cfg = self.cfg
        kw = dict(
            feat_dim=self.feat_dim,
            tau=cfg.MODEL.DGAF_TAU,
            init_alpha=cfg.MODEL.DGAF_INIT_ALPHA,
            dtype=_dtype_of(cfg),
            name="dgaf",
        )
        if cfg.MODEL.DGAF_VERSION == "v3":
            if num_modalities == 6:
                return DualGatedAdaptiveFusionV3Multi(
                    num_modalities=6, num_heads=cfg.MODEL.DGAF_NUM_HEADS, **kw
                )
            return DualGatedAdaptiveFusionV3(num_heads=cfg.MODEL.DGAF_NUM_HEADS, **kw)
        return DualGatedPostFusion(**kw)

    def _frca_stack(self, patches):
        """Independent per-modality FRCA modules (make_model.py:527-541)."""
        cfg = self.cfg
        gh, gw = self.patch_grid
        m, b, n, c = patches.shape
        outs = []
        for i, nm in enumerate(("rgb", "nir", "tir")):
            x = patches[i].reshape(b, gh, gw, c)
            y = FourierResidualChannelAttention(
                channels=c,
                negative_slope=cfg.MODEL.FRCA_NEGATIVE_SLOPE,
                dtype=_dtype_of(cfg),
                name=f"frca_{nm}",
            )(x)
            outs.append(y.reshape(b, n, c))
        return jnp.stack(outs)  # (3, B, N, C)

    def _head(self, name, feat, train):
        logits = ClassifierHead(self.num_classes, name=name)(feat, not train)
        return logits, feat

    def _token_selector(self) -> Optional[str]:
        """Tri-state USE_FRCA logic (reference: make_model.py:492-503)."""
        cfg = self.cfg
        if cfg.MODEL.USE_FRCA is True:
            return "frca"
        if cfg.MODEL.USE_FRCA is None and cfg.MODEL.USE_SDTPS:
            return "sdtps"
        return None


class DeMo(_DeMoBase):
    """Simplified 4-branch DeMo (+ restored HDM/ATMoE 'moe' branch)."""

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, 3, H, W, 3)
        cam_label: Optional[jnp.ndarray] = None,
        view_label: Optional[jnp.ndarray] = None,
        modality_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_pattern: int = 3,
        patch_perturb: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        selector = self._token_selector()
        use_dgaf = cfg.MODEL.USE_DGAF
        direct = bool(cfg.MODEL.DIRECT)
        use_moe = cfg.MODEL.HDM or cfg.MODEL.ATM

        patches, globals_ = self._pife()(
            images.astype(dtype), cam_label, view_label, modality_mask,
            deterministic=not train,
        )
        if patch_perturb is not None:
            # Zero-valued probe input: gradients w.r.t. it are the patch-token
            # cotangents (Grad-CAM's target-layer activations' gradients —
            # reference: visualize/GradCAM.py:17-31 hooks BACKBONE.base).
            patches = patches + patch_perturb.astype(patches.dtype)

        branches: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        aux: Dict[str, jnp.ndarray] = {}

        ori_feat = jnp.concatenate([globals_[0], globals_[1], globals_[2]], axis=-1)

        def per_modality_heads():
            for i, nm in enumerate(("r", "n", "t")):
                branches[f"ori_{nm}"] = self._head(f"head_{nm}", globals_[i], train)

        embedding = ori_feat

        # ---- restored HDM+ATMoE branch ------------------------------------
        moe_feat = None
        if use_moe:
            moe_feat = GeneralFusion(
                feat_dim=self.feat_dim,
                use_hdm=cfg.MODEL.HDM,
                use_atm=cfg.MODEL.ATM,
                head=cfg.MODEL.HEAD,
                dtype=dtype,
                name="general_fusion",
            )(patches, globals_, deterministic=not train, use_running_average=not train)

        if selector is None and not use_dgaf:
            # Branch 1: Baseline (make_model.py:734-748).
            if direct:
                branches["ori"] = self._head("head_ori", ori_feat, train)
            else:
                per_modality_heads()
            embedding = ori_feat
        elif selector is not None and not use_dgaf:
            # Branch 2: SDTPS-only / FRCA-only (make_model.py:753-830).
            if selector == "frca":
                enh = self._frca_stack(patches)
            else:
                enh, _ = self._sdtps()(patches, globals_, deterministic=not train)
            if cfg.MODEL.GLOBAL_LOCAL:
                final = GlobalLocalFuse(self.feat_dim, dtype=dtype, name="gl_fuse")(
                    enh, globals_
                )
            else:
                final = jnp.mean(enh, axis=2)  # (3, B, C)
            feat = jnp.concatenate([final[0], final[1], final[2]], axis=-1)
            branches[selector] = self._head(f"head_{selector}", feat, train)
            if not direct:
                per_modality_heads()
            embedding = feat
        elif selector is None and use_dgaf:
            # Branch 3: DGAF-only (make_model.py:835-865).
            if cfg.MODEL.DGAF_VERSION == "v3":
                dgaf_feat = self._dgaf()(patches)
            else:
                if cfg.MODEL.GLOBAL_LOCAL:
                    ins = GlobalLocalFuse(self.feat_dim, dtype=dtype, name="gl_fuse")(
                        patches, globals_
                    )
                else:
                    ins = globals_
                dgaf_feat = self._dgaf()(ins)
            branches["dgaf"] = self._head("head_dgaf", dgaf_feat, train)
            if not direct:
                per_modality_heads()
            embedding = dgaf_feat
        else:
            # Branch 4: selector + DGAF (make_model.py:872-962).
            if selector == "frca":
                enh = self._frca_stack(patches)
                if cfg.MODEL.FRCA_USE_CROSS_ATTN and cfg.MODEL.DGAF_VERSION == "v3":
                    # 6 directed cross-attentions with ONE shared MHA
                    # (make_model.py:892-919), batched into one call.
                    pairs = [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)]
                    q = jnp.concatenate([enh[a] for a, _ in pairs], axis=0)
                    kv = jnp.concatenate([enh[b_] for _, b_ in pairs], axis=0)
                    attn_out = MultiHeadAttention(
                        num_heads=cfg.MODEL.FRCA_CROSS_ATTN_HEADS,
                        dtype=dtype,
                        name="frca_cross_attn",
                    )(q, kv, deterministic=not train)
                    out = LayerNorm(name="frca_cross_norm")(attn_out + q)
                    b = enh.shape[1]
                    dgaf_in = out.reshape(6, b, *enh.shape[2:])
                    dgaf_feat = self._dgaf(num_modalities=6)(dgaf_in)
                else:
                    dgaf_in = enh
                    dgaf_feat = self._apply_dgaf_v3_or_v1(dgaf_in, globals_, dtype)
            else:
                enh, _ = self._sdtps()(patches, globals_, deterministic=not train)
                dgaf_feat = self._apply_dgaf_v3_or_v1(enh, globals_, dtype)
            branches["dgaf"] = self._head("head_dgaf", dgaf_feat, train)
            if not direct:
                per_modality_heads()
            embedding = dgaf_feat

        if use_moe:
            # Original-paper training pairs the moe head with the ori head.
            branches["moe"] = self._head("head_moe", moe_feat, train)
            if direct and "ori" not in branches:
                branches["ori"] = self._head("head_ori", ori_feat, train)
            if return_pattern == 1:
                embedding = ori_feat
            elif return_pattern == 2:
                embedding = moe_feat
            else:
                embedding = jnp.concatenate([moe_feat, ori_feat], axis=-1)

        out = {
            "branches": branches,
            "embedding": embedding.astype(jnp.float32),
            "aux_loss": aux,
        }
        if patch_perturb is not None:
            out["patches"] = patches  # CAM activations (perturb-probe mode only)
        return out

    def _apply_dgaf_v3_or_v1(self, enh, globals_, dtype):
        cfg = self.cfg
        if cfg.MODEL.DGAF_VERSION == "v3":
            return self._dgaf()(enh)
        if not cfg.MODEL.GLOBAL_LOCAL:
            raise ValueError("DGAF V1 requires GLOBAL_LOCAL=True")  # :940-941
        final = GlobalLocalFuse(self.feat_dim, dtype=dtype, name="gl_fuse")(enh, globals_)
        return self._dgaf()(final)


class DeMoParallel(_DeMoBase):
    """9-head parallel architecture (reference: make_model.py:976-1206)."""

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        cam_label: Optional[jnp.ndarray] = None,
        view_label: Optional[jnp.ndarray] = None,
        modality_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_pattern: int = 3,
        patch_perturb: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        patches, globals_ = self._pife()(
            images.astype(dtype), cam_label, view_label, modality_mask,
            deterministic=not train,
        )
        if patch_perturb is not None:
            patches = patches + patch_perturb.astype(patches.dtype)

        # Branch 1: SDTPS -> mean pooled per modality (:1142-1149).
        enh, _ = self._sdtps()(patches, globals_, deterministic=not train)
        sdtps_feats = jnp.mean(enh, axis=2)  # (3, B, C)

        # Branch 2: DGAF V3 over raw tokens, split back to 3 (:1151-1159).
        dgaf_out = DualGatedAdaptiveFusionV3(
            feat_dim=self.feat_dim,
            tau=cfg.MODEL.DGAF_TAU,
            init_alpha=cfg.MODEL.DGAF_INIT_ALPHA,
            num_heads=cfg.MODEL.DGAF_NUM_HEADS,
            dtype=dtype,
            name="dgaf",
        )(patches)
        c = self.feat_dim
        dgaf_feats = jnp.stack(
            [dgaf_out[:, :c], dgaf_out[:, c : 2 * c], dgaf_out[:, 2 * c :]]
        )

        # Branch 3: fused global-local (:1161-1169).
        fused_feats = GlobalLocalFuse(self.feat_dim, dtype=dtype, name="gl_fuse")(
            patches, globals_
        )

        branches = {}
        names = ("rgb", "nir", "tir")
        for bi, (bname, feats) in enumerate(
            (("sdtps", sdtps_feats), ("dgaf", dgaf_feats), ("fused", fused_feats))
        ):
            for i, nm in enumerate(names):
                branches[f"{bname}_{nm}"] = self._head(
                    f"head_{bname}_{nm}", feats[i], train
                )

        embedding = jnp.concatenate(
            [sdtps_feats[i] for i in range(3)]
            + [dgaf_feats[i] for i in range(3)]
            + [fused_feats[i] for i in range(3)],
            axis=-1,
        )  # (B, 9C)
        out = {
            "branches": branches,
            "embedding": embedding.astype(jnp.float32),
            "aux_loss": {},
        }
        if patch_perturb is not None:
            out["patches"] = patches
        return out


class DeMoLegacy(_DeMoBase):
    """`DeMoBeiyong` cascade: SACR/MMSACR -> LIF -> SDTPS -> DGAF.

    Reference: make_model.py:23-439.  Adds the LIF auxiliary loss to
    `aux_loss['lif']` (engine applies LIF_LOSS_WEIGHT, processor.py:100-101).
    """

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        cam_label: Optional[jnp.ndarray] = None,
        view_label: Optional[jnp.ndarray] = None,
        modality_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_pattern: int = 3,
        patch_perturb: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        direct = bool(cfg.MODEL.DIRECT)
        gh, gw = self.patch_grid

        patches, globals_ = self._pife()(
            images.astype(dtype), cam_label, view_label, modality_mask,
            deterministic=not train,
        )
        if patch_perturb is not None:
            patches = patches + patch_perturb.astype(patches.dtype)
        cam_patches = patches  # backbone activations (pre-cascade) for CAM

        branches: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        aux: Dict[str, jnp.ndarray] = {}

        # SACR stage (:254-259).
        if cfg.MODEL.USE_MULTIMODAL_SACR:
            sacr_cls = (
                MultiModalSACRv2
                if cfg.MODEL.MULTIMODAL_SACR_VERSION == "v2"
                else MultiModalSACR
            )
            patches = sacr_cls(
                token_dim=self.feat_dim,
                height=gh,
                width=gw,
                dilation_rates=tuple(cfg.MODEL.SACR_DILATION_RATES),
                dtype=dtype,
                name="multimodal_sacr",
            )(patches, not train)
        elif cfg.MODEL.USE_SACR:
            patches = SACR(
                token_dim=self.feat_dim,
                height=gh,
                width=gw,
                dilation_rates=tuple(cfg.MODEL.SACR_DILATION_RATES),
                dtype=dtype,
                name="sacr",
            )(patches, not train)

        # LIF stage (:264-290).
        if cfg.MODEL.USE_LIF:
            qmaps = TrimodalLIF(dtype=dtype, name="lif")(
                images.astype(dtype), not train
            )
            if train:
                aux["lif"] = lif_loss(qmaps, images)
            patches = lif_reweight(
                patches, qmaps, (gh, gw), cfg.MODEL.LIF_BETA * 10.0
            )

        # Optional restored HDM/ATM branch (constructed but orphaned in the
        # reference, :131-138; callable here).
        if cfg.MODEL.HDM or cfg.MODEL.ATM:
            moe_feat = GeneralFusion(
                feat_dim=self.feat_dim,
                use_hdm=cfg.MODEL.HDM,
                use_atm=cfg.MODEL.ATM,
                head=cfg.MODEL.HEAD,
                dtype=dtype,
                name="general_fusion",
            )(patches, globals_, deterministic=not train, use_running_average=not train)
            branches["moe"] = self._head("head_moe", moe_feat, train)

        ori_feat = jnp.concatenate([globals_[0], globals_[1], globals_[2]], axis=-1)

        # SDTPS stage (:308-332).
        sdtps_feat = None
        enh = None
        final = None
        if cfg.MODEL.USE_SDTPS:
            enh, _ = self._sdtps()(patches, globals_, deterministic=not train)
            if cfg.MODEL.GLOBAL_LOCAL:
                final = GlobalLocalFuse(self.feat_dim, dtype=dtype, name="gl_fuse")(
                    enh, globals_
                )
            else:
                final = jnp.mean(enh, axis=2)
            sdtps_feat = jnp.concatenate([final[0], final[1], final[2]], axis=-1)

        # DGAF stage (:335-366).
        dgaf_feat = None
        if cfg.MODEL.USE_DGAF:
            if cfg.MODEL.DGAF_VERSION == "v3":
                dgaf_feat = self._dgaf()(enh if cfg.MODEL.USE_SDTPS else patches)
            else:
                if cfg.MODEL.USE_SDTPS:
                    if not cfg.MODEL.GLOBAL_LOCAL:
                        raise ValueError("SDTPS + DGAF V1 requires GLOBAL_LOCAL")
                    dgaf_feat = self._dgaf()(final)
                else:
                    if cfg.MODEL.GLOBAL_LOCAL:
                        ins = GlobalLocalFuse(
                            self.feat_dim, dtype=dtype, name="gl_fuse"
                        )(patches, globals_)
                    else:
                        ins = globals_
                    dgaf_feat = self._dgaf()(ins)

        # Return logic (:390-439): priority SDTPS+DGAF > SDTPS > DGAF > base.
        if cfg.MODEL.USE_SDTPS and cfg.MODEL.USE_DGAF:
            branches["dgaf"] = self._head("head_dgaf", dgaf_feat, train)
            embedding = dgaf_feat
        elif cfg.MODEL.USE_SDTPS:
            branches["sdtps"] = self._head("head_sdtps", sdtps_feat, train)
            embedding = sdtps_feat
        elif cfg.MODEL.USE_DGAF:
            branches["dgaf"] = self._head("head_dgaf", dgaf_feat, train)
            embedding = dgaf_feat
        else:
            if direct:
                branches["ori"] = self._head("head_ori", ori_feat, train)
            else:
                for i, nm in enumerate(("r", "n", "t")):
                    branches[f"ori_{nm}"] = self._head(f"head_{nm}", globals_[i], train)
            embedding = ori_feat

        if not direct and (cfg.MODEL.USE_SDTPS or cfg.MODEL.USE_DGAF):
            for i, nm in enumerate(("r", "n", "t")):
                branches[f"ori_{nm}"] = self._head(f"head_{nm}", globals_[i], train)

        out = {
            "branches": branches,
            "embedding": embedding.astype(jnp.float32),
            "aux_loss": aux,
        }
        if patch_perturb is not None:
            out["patches"] = cam_patches
        return out
