"""Multi-head attention with torch `nn.MultiheadAttention` parameterization.

One module serves every attention site in the framework: the CLIP/ViT
backbone blocks (reference: modeling/clip/model.py:168-230,
modeling/backbones/vit_pytorch.py:144-191), HDM's 7 cross-attention heads
(modeling/moe/AttnMOE.py:143-149), DGAF-V3 attention pooling
(modeling/dual_gated_fusion.py:610-615), and the FRCA cross-attention bridge
(modeling/make_model.py:546-551).

Parameters mirror torch's packed layout: one (C, 3C) `in_proj` kernel + (3C,)
bias, plus an out-projection, so that PyTorch checkpoints map 1:1.

TPU-first notes:
  * softmax runs in fp32 regardless of the compute dtype;
  * the self-attention hot path can route to the Pallas fused kernel
    (`implementation='pallas'`), everything else uses an einsum path that XLA
    fuses on the MXU;
  * masks are additive biases broadcast over (B, H, S_q, S_k) so that HDM's
    seven subset-attentions run as ONE masked attention call.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .linear import torch_linear_kernel_init, xavier_uniform_init


def _xla_attention(q, k, v, scale, mask_bias, dropout_rate, deterministic, rng):
    """(B, S, H, D) attention via einsum; fp32 softmax."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask_bias is not None:
        logits = logits + mask_bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    mask_bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    implementation: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention on (B, S, H, D) tensors."""
    if (
        implementation == "pallas"
        and mask_bias is None
        and (dropout_rate == 0.0 or deterministic)
        and q.shape[1] == k.shape[1]  # kernel is self-attention-shaped
    ):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale, mask_bias, dropout_rate, deterministic, rng)


def conv_lora_delta(lora_a, lora_b, out_ch: int, in_ch: int, k: int,
                    alpha: float):
    """ConvLoRA weight delta in flax (kh, kw, I, O) layout.

    Reference clip/LoRA.py:231-298: ``lora_A`` (r*k, in*k) and ``lora_B``
    (out*k, r*k); the delta is ``(B @ A).view(out, in, k, k) * alpha/r``
    added to the torch conv weight.  The params here keep the REFERENCE
    layout (conversion is then the identity + scaling fold); the raw
    row-major reinterpretation and the OIHW->HWIO transpose happen here.
    """
    delta = (lora_b @ lora_a).reshape(out_ch, in_ch, k, k)
    return alpha * jnp.transpose(delta, (2, 3, 1, 0))


def merged_lora_delta(lora_a, lora_b, enable, alpha: float):
    """MergedLinear low-rank delta for a packed (c, n*c) projection.

    Semantics of reference clip/LoRA.py:133-231 (`MergedLinear.merge_AB`):
    each ENABLED slice s of the packed output gets its own rank-r adapter
    a_s @ b_s (the grouped-conv1d form collapses to exactly this), disabled
    slices stay zero (`zero_pad`).  ``lora_a`` is (n_on, c, r), ``lora_b``
    (n_on, r, c); returns the (c, n*c) delta, scaled by ``alpha`` (the
    reference's lora_alpha/r scaling folded into one knob as in the
    whole-matrix path).
    """
    n = len(enable)
    c = lora_a.shape[1]
    deltas = jnp.einsum("ncr,nrd->ncd", lora_a, lora_b)  # (n_on, c, c)
    idx = [i for i, e in enumerate(enable) if e]
    full = jnp.zeros((n, c, c), deltas.dtype).at[jnp.asarray(idx)].set(deltas)
    return alpha * jnp.transpose(full, (1, 0, 2)).reshape(c, n * c)


class MultiHeadAttention(nn.Module):
    """Torch-compatible MHA: packed qkv in-projection + out-projection."""

    num_heads: int
    dropout_rate: float = 0.0
    use_bias: bool = True  # in_proj bias (torch default True)
    out_bias: bool = True
    implementation: str = "xla"
    dtype: Optional[Any] = None
    # LoRA adapters on the packed qkv projection (reference: the CLIP LoRA
    # fine-tuning path behind MODEL.FROZEN, modeling/clip/LoRA.py +
    # meta_arch.py:61-62,72-73).  0 disables.
    lora_rank: int = 0
    lora_alpha: float = 1.0
    # Per-sub-projection enablement — the MergedLinear semantics
    # (clip/LoRA.py:133-231: independent rank-r adapters on the ENABLED
    # q/k/v slices of the packed weight, zeros elsewhere).  (True,)*3
    # keeps the original whole-matrix adapter (strictly more expressive,
    # and the shape existing checkpoints carry).
    lora_enable: Tuple[bool, bool, bool] = (True, True, True)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, S_q, C)
        key: Optional[jnp.ndarray] = None,  # (B, S_k, C)
        value: Optional[jnp.ndarray] = None,
        *,
        mask_bias: Optional[jnp.ndarray] = None,  # broadcastable to (B,H,Sq,Sk)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if key is None:
            key = query
        if value is None:
            value = key
        c = query.shape[-1]
        h = self.num_heads
        d = c // h
        dtype = self.dtype or query.dtype

        is_self_attn = key is query and value is key
        in_proj = self.param("in_proj_kernel", xavier_uniform_init, (c, 3 * c), jnp.float32)
        if self.lora_rank > 0 and all(self.lora_enable):
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(1.0 / self.lora_rank),
                (c, self.lora_rank),
                jnp.float32,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (self.lora_rank, 3 * c), jnp.float32
            )
            in_proj = in_proj + self.lora_alpha * (lora_a @ lora_b)
        elif self.lora_rank > 0 and any(self.lora_enable):
            in_proj = in_proj + merged_lora_delta(
                self.param(
                    "lora_a",
                    nn.initializers.normal(1.0 / self.lora_rank),
                    (sum(self.lora_enable), c, self.lora_rank),
                    jnp.float32,
                ),
                self.param(
                    "lora_b",
                    nn.initializers.zeros,
                    (sum(self.lora_enable), self.lora_rank, c),
                    jnp.float32,
                ),
                self.lora_enable,
                self.lora_alpha,
            )
        if self.use_bias:
            in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)
        else:
            in_bias = None

        use_packed = (
            self.implementation == "pallas"
            and is_self_attn
            and mask_bias is None
            and (self.dropout_rate == 0.0 or deterministic)
        )
        if use_packed:
            # Zero-relayout path: one packed GEMM -> fused kernel.
            from .packed_attention import packed_self_attention

            qkv = query.astype(dtype) @ in_proj.astype(dtype)
            if in_bias is not None:
                qkv = qkv + in_bias.astype(dtype)
            out = packed_self_attention(qkv, self.num_heads, 1.0 / (d ** 0.5))
        else:
            wq, wk, wv = jnp.split(in_proj.astype(dtype), 3, axis=-1)
            if in_bias is not None:
                bq, bk, bv = jnp.split(in_bias.astype(dtype), 3)
            else:
                bq = bk = bv = 0.0

            q = (query.astype(dtype) @ wq + bq).reshape(*query.shape[:-1], h, d)
            k = (key.astype(dtype) @ wk + bk).reshape(*key.shape[:-1], h, d)
            v = (value.astype(dtype) @ wv + bv).reshape(*value.shape[:-1], h, d)

            rng = None
            if self.dropout_rate > 0.0 and not deterministic:
                rng = self.make_rng("dropout")

            out = attention_core(
                q,
                k,
                v,
                scale=1.0 / (d ** 0.5),
                mask_bias=mask_bias,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                rng=rng,
                implementation=self.implementation,
            )
            out = out.reshape(*query.shape[:-1], c)
        out = nn.Dense(
            c,
            use_bias=self.out_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="out_proj",
        )(out)
        return out
