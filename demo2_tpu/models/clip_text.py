"""CLIP text encoder (transformer + BPE token embeddings), TPU-native.

Reference: modeling/clip/model.py:489-606 — `CLIP.encode_text` runs the
token embedding, adds the (77, W) positional embedding, applies the causal
transformer (`build_attention_mask`, :578-584 — additive upper-triangular
-inf mask), final LayerNorm, then projects the EOT token's feature
(`x[arange, text.argmax(-1)] @ text_projection`, :593-604).

Unused by every DeMo config (the fork only exercises the visual tower), but
part of the reference surface via `make_model_clipreid`'s prompt learning;
implemented for completeness.  TPU notes: the causal mask is an additive
bias broadcast over (B, H, S, S) so the whole batch of prompts encodes in
one masked attention per block; S=77 is tiny, so the XLA einsum path is
used throughout (no Pallas needed for an offline prompt-encoding pass).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import quick_gelu
from ..ops.attention import MultiHeadAttention
from ..ops.linear import torch_linear_kernel_init
from ..ops.norm import LayerNorm


class _TextBlock(nn.Module):
    """Pre-LN block with an additive attention mask (clip/model.py:168-230)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias):
        y = LayerNorm(name="ln_1")(x)
        y = MultiHeadAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(y, mask_bias=mask_bias)
        x = x + y
        y = LayerNorm(name="ln_2")(x)
        y = nn.Dense(
            4 * self.width,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="mlp_c_fc",
        )(y)
        y = quick_gelu(y)
        y = nn.Dense(
            self.width,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="mlp_c_proj",
        )(y)
        return x + y


def lora_embedding_delta(lora_a, lora_b, ids, alpha: float):
    """Low-rank embedding-lookup delta (reference clip/LoRA.py:33-90).

    ``lora_a`` is (r, vocab) — init ZEROS — and ``lora_b`` (width, r) —
    init normal — exactly the reference `Embedding.reset_parameters`
    convention (the transpose of the Linear one, so a fresh adapter is a
    no-op through A).  Returns (..., width): `after_A = A.T[ids]` then
    `after_A @ B.T`, scaled (the reference's lora_alpha/r folded into
    ``alpha`` like the attention adapters).
    """
    after_a = jnp.take(lora_a.T, ids, axis=0)  # (..., r)
    return alpha * (after_a @ lora_b.T)


def adapted_token_embedding(tok, lora_a, lora_b, alpha: float):
    """Full-table view of the embedding adapter: tok + alpha * A.T @ B.T.

    The prompt-embeds encoder path bypasses the id lookup, so the LoRA
    delta cannot be applied there; PromptLearner consumers with an active
    embedding adapter must build prompts from THIS table (the reference's
    PromptLearner consumes the adapted nn.Embedding the same way,
    make_model_clipreid.py:203-206).  Row-for-row equal to
    `lora_embedding_delta` at every id.
    """
    return tok + alpha * (lora_a.T @ lora_b.T)


class CLIPTextTransformer(nn.Module):
    """`encode_text` equivalent: (B, 77) int tokens -> (B, embed_dim)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: Any = jnp.float32
    # LoRA adapter on the token embedding (reference clip/LoRA.py:33-90,
    # dormant there like the rest of the vendored library; first-class
    # here behind the same MODEL.FROZEN + TPU.LORA_RANK knobs).
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(
        self,
        text: Optional[jnp.ndarray] = None,  # (B, 77) int32 token ids
        *,
        prompt_embeds: Optional[jnp.ndarray] = None,  # (B, 77, width)
        eot_idx: Optional[jnp.ndarray] = None,  # (B,) EOT positions
    ) -> jnp.ndarray:
        """Token ids OR pre-embedded prompts -> (B, embed_dim).

        The embedded path is the CLIP-ReID `TextEncoder` semantics
        (reference make_model_clipreid.py:31-40): PromptLearner output
        skips the token embedding and enters at the positional add, with
        the EOT pooling position supplied explicitly (the ids that would
        locate it never exist for learned context vectors).
        """
        if (text is None) == (prompt_embeds is None):
            raise ValueError("pass exactly one of text / prompt_embeds")
        if prompt_embeds is not None and eot_idx is None:
            raise ValueError("prompt_embeds requires eot_idx")
        f32 = jnp.float32
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            f32,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            f32,
        )
        if prompt_embeds is not None:
            x = prompt_embeds.astype(self.dtype) + pos.astype(self.dtype)
        else:
            x = tok[text].astype(self.dtype) + pos.astype(self.dtype)
        if self.lora_rank > 0:
            la = self.param(
                "token_lora_a", nn.initializers.zeros,
                (self.lora_rank, self.vocab_size), f32,
            )
            lb = self.param(
                "token_lora_b", nn.initializers.normal(1.0),
                (self.width, self.lora_rank), f32,
            )
            if text is not None:
                x = x + lora_embedding_delta(
                    la, lb, text, self.lora_alpha
                ).astype(self.dtype)

        # Causal mask as an additive bias (reference fills strict upper
        # triangle with -inf; -1e30 keeps the softmax fp32-safe).
        s = self.context_length
        causal = jnp.triu(jnp.full((s, s), -1e30, f32), k=1)[None, None]

        for i in range(self.layers):
            x = _TextBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )(x, causal)

        x = LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            f32,
        )
        # EOT pooling: the EOT token id (49407) is each row's max token id;
        # the embedded path carries the position explicitly instead.
        if eot_idx is not None:
            eot = jnp.broadcast_to(jnp.asarray(eot_idx), x.shape[:1])
        else:
            eot = jnp.argmax(text, axis=-1)  # (B,)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return (pooled.astype(f32) @ proj).astype(jnp.float32)


class PromptLearner(nn.Module):
    """CLIP-ReID prompt learner (reference make_model_clipreid.py:190-237).

    Dormant in the reference fork (only `load_clip_to_cpu` is imported by
    meta_arch.py); first-class here for surface completeness.  The template
    "A photo of a X X X X person." (or "... vehicle.") is tokenized once;
    its SOT+context prefix and suffix embeddings are looked up from the
    LIVE token-embedding table (the reference freezes them as buffers at
    init — equivalent while the text tower is frozen, which is the only
    regime the CLIP-ReID stage-1 recipe uses), and the 4 `X` slots are
    replaced by per-class learnable vectors (init normal 0.02).

    `__call__(labels, token_embedding) -> (B, 77, ctx_dim)` prompts for
    `CLIPTextTransformer(..., prompt_embeds=..., eot_idx=self.eot_pos)`.
    When the tower carries a token-embedding LoRA adapter, pass
    `adapted_token_embedding(...)` as the table — the embedded path cannot
    apply the per-id delta itself (no ids exist for learned vectors).
    """

    num_class: int
    ctx_dim: int = 512
    n_ctx: int = 4  # template context tokens before the class slots
    n_cls_ctx: int = 4  # learnable per-class slots (the X X X X)
    vehicle: bool = False  # VehicleID/veri template variant
    context_length: int = 77

    @property
    def template_ids(self):
        from ..utils.bpe import tokenize

        text = ("A photo of a X X X X vehicle." if self.vehicle
                else "A photo of a X X X X person.")
        return tokenize(text, context_length=self.context_length)[0]

    @property
    def eot_pos(self) -> int:
        import numpy as np

        return int(np.argmax(self.template_ids))

    @nn.compact
    def __call__(self, labels: jnp.ndarray, token_embedding: jnp.ndarray):
        ids = jnp.asarray(self.template_ids)
        emb = token_embedding[ids].astype(jnp.float32)  # (77, D)
        prefix = emb[: self.n_ctx + 1]  # SOT + "a photo of a"
        suffix = emb[self.n_ctx + 1 + self.n_cls_ctx:]  # ".<EOT>" + pad
        cls_ctx = self.param(
            "cls_ctx", nn.initializers.normal(0.02),
            (self.num_class, self.n_cls_ctx, self.ctx_dim), jnp.float32,
        )
        b = labels.shape[0]
        return jnp.concatenate(
            [
                jnp.broadcast_to(prefix, (b,) + prefix.shape),
                cls_ctx[labels],
                jnp.broadcast_to(suffix, (b,) + suffix.shape),
            ],
            axis=1,
        )
