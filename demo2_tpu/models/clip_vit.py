"""CLIP VisionTransformer (ViT-B/16) in flax, TPU layout (NHWC).

Structural parity with the reference CLIP visual tower
(reference: modeling/clip/model.py:418-484):
  * conv patch embed (16x16, stride from config, no bias);
  * class embedding; the camera SIE embedding `cv_emb` is added to the CLS
    token ONLY (reference: clip/model.py:453-454);
  * learned positional embedding, pre-LN, 12 residual attention blocks with
    QuickGELU MLPs, post-LN over all tokens, then projection to 512-d;
  * returns ALL projected tokens (B, N+1, output_dim).

TPU-first deltas: computation in a configurable dtype (bf16 by default) with
fp32 LayerNorms and fp32 attention softmax; attention can use the Pallas
fused kernel.  The MambaPro tuning paths are implemented: MODEL.ADAPTER
(FFN adapters, reference clip/model.py:206-236) and MODEL.PROMPT (per-block
modality prompt tokens with cross-modal transfer adapters, :297-385; both
are off by default per README:142).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import quick_gelu
from ..ops.attention import MultiHeadAttention
from ..ops.norm import LayerNorm
from ..ops.linear import torch_linear_kernel_init


class CLIPMlp(nn.Module):
    width: int
    dtype: Any = jnp.float32
    # Sub-bf16 experiment (TPU.INT8_MLP, docs/PERF.md round 3): run the two
    # MLP GEMMs' FORWARD in int8 (per-channel weight scales, per-tensor
    # activation scale) with the exact bf16 backward (ops/quant.py).
    # "dynamic" = max-abs activation scale per call; "static" = fixed
    # calibration constants (perf-only; the measured-fast int8 mode).
    int8_fwd: str = "off"

    @nn.compact
    def __call__(self, x):
        if self.int8_fwd == "off":
            x = nn.Dense(
                self.width * 4,
                kernel_init=torch_linear_kernel_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="c_fc",
            )(x)
            x = quick_gelu(x)
            x = nn.Dense(
                self.width,
                kernel_init=torch_linear_kernel_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="c_proj",
            )(x)
            return x

        from ..ops.quant import int8_dense

        # Declare the SAME param tree as the Dense path (dummy calls; their
        # outputs are dead-code-eliminated), then run the quantized matmuls.
        fc = nn.Dense(self.width * 4, kernel_init=torch_linear_kernel_init,
                      dtype=self.dtype, param_dtype=jnp.float32, name="c_fc")
        _ = fc(x[:1, :1] if x.ndim == 3 else x[:1])
        proj = nn.Dense(self.width, kernel_init=torch_linear_kernel_init,
                        dtype=self.dtype, param_dtype=jnp.float32, name="c_proj")
        _ = proj(jnp.zeros((1, 1, self.width * 4) if x.ndim == 3
                           else (1, self.width * 4), self.dtype))
        fp = fc.variables["params"]
        pp = proj.variables["params"]
        if self.int8_fwd == "static":
            # rough calibration: ln_2 output ~ N(0, 1) * gamma -> |max| ~ 10;
            # QuickGELU output similar scale.  Perf-representative; quality
            # runs use "dynamic".
            s_fc, s_proj = 10.0 / 127.0, 10.0 / 127.0
        else:
            s_fc = s_proj = 0.0  # dynamic per-tensor
        y = int8_dense(x, fp["kernel"], jnp.asarray(s_fc, jnp.float32))
        y = y + fp["bias"].astype(y.dtype)
        y = quick_gelu(y)
        y = int8_dense(y, pp["kernel"], jnp.asarray(s_proj, jnp.float32))
        return y + pp["bias"].astype(y.dtype)


class FFNAdapter(nn.Module):
    """Bottleneck FFN adapter (reference: clip/model.py:206-209, MambaPro
    ADAPTER path, forward_with_adapter :232-236)."""

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.width // 2, kernel_init=torch_linear_kernel_init,
                     dtype=self.dtype, param_dtype=jnp.float32, name="down")(x)
        y = quick_gelu(y)
        return nn.Dense(self.width, kernel_init=torch_linear_kernel_init,
                        dtype=self.dtype, param_dtype=jnp.float32, name="up")(y)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block (reference: clip/model.py:168-230, forward_ori).

    `use_adapter` adds the MambaPro FFN adapter in parallel with the MLP
    (forward_with_adapter: x = x + mlp(ln_2(x)) + adapter_ffn(x)).

    `use_prompt` implements the MambaPro modality-prompt path
    (forward_with_prompt / forward_with_prompt_adapter, reference:
    clip/model.py:297-385): per block, k own-modality prompt tokens plus two
    cross-modality transferred prompts are appended to the sequence, the
    block runs, the 3k prompt tokens are stripped, and their mean becomes
    `last_prompt` for the next block.  With the stacked-modality layout the
    three per-modality variants run as one batched call: rows are
    modality-major (3, B, S, C) and each modality segment gets its own
    prompt triple with the own-prompt at its modality slot.
    """

    width: int
    heads: int
    dtype: Any = jnp.float32
    attn_implementation: str = "xla"
    lora_rank: int = 0
    lora_enable: tuple = (True, True, True)
    use_adapter: bool = False
    use_prompt: bool = False
    prompt_k: int = 4
    int8_mlp: str = "off"
    # Use the Pallas fused MLP in training too (TPU.FUSED_MLP_TRAIN).
    fused_mlp_train: bool = False
    # Fused Pallas LN backward for the unfused LNs (TPU.PALLAS_LN_BWD).
    pallas_ln_bwd: bool = False

    def _fused_attention(self, x):
        """Fused LN1+qkv+attention+out-proj+residual Pallas path.

        Declares the SAME param tree as the unfused path (dummy submodule
        calls create the params; their outputs are dead-code-eliminated),
        then hands the raw parameters to the fused kernel.
        """
        from ..ops.fused_block import fused_attention_block

        c = x.shape[-1]
        ln1 = LayerNorm(name="ln_1")
        _ = ln1(x[:1, :1])
        attn = MultiHeadAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            implementation="xla",
            lora_rank=self.lora_rank,
            lora_enable=self.lora_enable,
            name="attn",
        )
        _ = attn(x[:1, :2])
        lnp = ln1.variables["params"]
        ap = attn.variables["params"]
        wqkv = ap["in_proj_kernel"]
        if self.lora_rank > 0 and all(self.lora_enable):
            wqkv = wqkv + ap["lora_a"] @ ap["lora_b"]
        elif self.lora_rank > 0 and any(self.lora_enable):
            from ..ops.attention import merged_lora_delta

            wqkv = wqkv + merged_lora_delta(
                ap["lora_a"], ap["lora_b"], self.lora_enable, 1.0
            )
        return fused_attention_block(
            x,
            lnp["scale"],
            lnp["bias"],
            wqkv,
            ap["in_proj_bias"],
            ap["out_proj"]["kernel"],
            ap["out_proj"]["bias"],
            num_heads=self.heads,
            scale=(c // self.heads) ** -0.5,
        )

    def _fused_mlp(self, x):
        """Fused LN2+fc1+QuickGELU+fc2+residual (inference)."""
        from ..ops.fused_block import fused_mlp_block

        ln2 = LayerNorm(name="ln_2")
        _ = ln2(x[:1, :1])
        mlp = CLIPMlp(self.width, dtype=self.dtype, name="mlp")
        _ = mlp(x[:1, :1])
        lnp = ln2.variables["params"]
        mp = mlp.variables["params"]
        return fused_mlp_block(
            x,
            lnp["scale"],
            lnp["bias"],
            mp["c_fc"]["kernel"],
            mp["c_fc"]["bias"],
            mp["c_proj"]["kernel"],
            mp["c_proj"]["bias"],
        )

    @nn.compact
    def __call__(self, x, last_prompt=None, deterministic: bool = True):
        k = self.prompt_k
        if self.use_prompt:
            b3, s, c = x.shape
            b = b3 // 3
            f32 = jnp.float32
            prompts = self.param(
                "adapter_prompts", nn.initializers.zeros, (3, k, c), f32
            ).astype(self.dtype)
            # Cross-modality transfer: T_src = prompt_src + adapter_src(prompt_src)
            transferred = jnp.stack(
                [
                    prompts[i]
                    + FFNAdapter(c, dtype=self.dtype, name=f"adapter_{nm}")(prompts[i])
                    for i, nm in enumerate(("r", "n", "t"))
                ]
            )  # (3, k, C)
            if last_prompt is None:
                own = jnp.broadcast_to(prompts[:, None], (3, b, k, c))
            else:
                lp = last_prompt.reshape(3, b, k, c)
                own = (
                    lp
                    + FFNAdapter(c, dtype=self.dtype, name="adapter_transfer")(lp)
                    + prompts[:, None]
                )
            tr = jnp.broadcast_to(transferred[:, None], (3, b, k, c))
            # Segment m appends [slot0, slot1, slot2] with own at slot m
            # (reference order: rgb=[r,n2r,t2r], nir=[r2n,n,t2n], tir=[r2t,n2t,t]).
            seg_prompts = []
            for m in range(3):
                slots = [tr[i] if i != m else own[m] for i in range(3)]
                seg_prompts.append(jnp.concatenate(slots, axis=1))  # (B, 3k, C)
            appended = jnp.concatenate(seg_prompts, axis=0)  # (3B, 3k, C)
            x = jnp.concatenate([x, appended.astype(x.dtype)], axis=1)

        # Both fused sub-blocks are training-capable (custom VJPs backprop
        # the exact unfused chain), but the fused MLP is gated to inference:
        # measured on v5e, emitting its (M, 4C) pre-GELU residual from inside
        # the kernel serializes an HBM write the XLA-scheduled unfused path
        # overlaps with GEMMs (495 vs 548 img/s train round 2; re-measured
        # 535.9 vs 600.0 round 4 via TPU.FUSED_MLP_TRAIN — docs/PERF.md).
        fuse_attn = self.attn_implementation == "pallas"
        # int8_mlp must also disable the fused (bf16) MLP at eval — otherwise
        # eval would silently run a different MLP numeric path than training
        # (review round 4).
        fuse = (fuse_attn and (deterministic or self.fused_mlp_train)
                and self.int8_mlp == "off")
        if fuse_attn:
            x = self._fused_attention(x)
        else:
            y = LayerNorm(name="ln_1", pallas_bwd=self.pallas_ln_bwd)(x)
            y = MultiHeadAttention(
                num_heads=self.heads,
                dtype=self.dtype,
                implementation=self.attn_implementation,
                lora_rank=self.lora_rank,
                lora_enable=self.lora_enable,
                name="attn",
            )(y)
            x = x + y
        if fuse and not self.use_adapter:
            x = self._fused_mlp(x)
        else:
            y = LayerNorm(name="ln_2", pallas_bwd=self.pallas_ln_bwd)(x)
            y = CLIPMlp(self.width, dtype=self.dtype,
                        int8_fwd=self.int8_mlp, name="mlp")(y)
            if self.use_adapter:
                y = y + FFNAdapter(self.width, dtype=self.dtype, name="adapter_ffn")(x)
            x = x + y

        if self.use_prompt:
            tail = x[:, -3 * k :]
            prompt_current = (
                tail[:, :k] + tail[:, k : 2 * k] + tail[:, 2 * k :]
            ) / 3.0  # (3B, k, C), reference :333
            return x[:, : -3 * k], prompt_current
        return x


class CLIPVisionTransformer(nn.Module):
    h_resolution: int
    w_resolution: int
    patch_size: int = 16
    stride_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32
    attn_implementation: str = "xla"
    remat: bool = False
    lora_rank: int = 0
    lora_enable: tuple = (True, True, True)
    lora_conv: bool = False
    use_adapter: bool = False
    use_prompt: bool = False
    int8_mlp: str = "off"
    fused_mlp_train: bool = False
    pallas_ln_bwd: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cv_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: (B, H, W, 3) images; cv_emb: (B, width) SIE embedding or None."""
        b = x.shape[0]
        scale = self.width ** -0.5
        conv = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride_size, self.stride_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )
        if self.lora_conv and self.lora_rank > 0:
            # ConvLoRA on the patch embed (clip/LoRA.py:231-298): params in
            # the reference layout, delta added to the declared conv kernel.
            from ..ops.attention import conv_lora_delta

            ks, r = self.patch_size, self.lora_rank
            _ = conv(x[:1, :ks, :ks].astype(self.dtype))  # declare params
            kern = conv.variables["params"]["kernel"]
            la = self.param(
                "conv_lora_a", nn.initializers.he_uniform(),
                (r * ks, 3 * ks), jnp.float32,
            )
            lb = self.param(
                "conv_lora_b", nn.initializers.zeros,
                (self.width * ks, r * ks), jnp.float32,
            )
            kern = kern + conv_lora_delta(la, lb, self.width, 3, ks, 1.0)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern.astype(self.dtype),
                window_strides=(self.stride_size, self.stride_size),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = conv(x.astype(self.dtype))
        x = x.reshape(b, -1, self.width)  # (B, N, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,), jnp.float32
        )
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype), (b, 1, self.width))
        if cv_emb is not None:
            cls = cls + cv_emb.astype(self.dtype)[:, None, :]
        x = jnp.concatenate([cls, x], axis=1)  # (B, N+1, width)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (self.h_resolution * self.w_resolution + 1, self.width),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)[None]
        x = LayerNorm(name="ln_pre")(x)

        block_cls = ResidualAttentionBlock
        if self.remat:
            # deterministic (arg 3: module, x, last_prompt, deterministic)
            # selects the fused-kernel path in Python — static under remat.
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=(3,))
        last_prompt = None
        for i in range(self.layers):
            blk = block_cls(
                self.width,
                self.heads,
                dtype=self.dtype,
                attn_implementation=self.attn_implementation,
                lora_rank=self.lora_rank,
                lora_enable=self.lora_enable,
                use_adapter=self.use_adapter,
                use_prompt=self.use_prompt,
                int8_mlp=self.int8_mlp,
                fused_mlp_train=self.fused_mlp_train,
                pallas_ln_bwd=self.pallas_ln_bwd,
                name=f"resblocks_{i}",
            )
            if self.use_prompt:
                x, last_prompt = blk(x, last_prompt, deterministic)
            else:
                x = blk(x, None, deterministic)

        x = LayerNorm(name="ln_post")(x)
        proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim), jnp.float32
        )
        return x @ proj.astype(self.dtype)
