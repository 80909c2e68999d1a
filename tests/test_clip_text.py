"""CLIP text-side parity vs the ACTUAL reference code.

Tokenizer: ids must match modeling/clip/simple_tokenizer.py +
clip.py::tokenize exactly.  Encoder: CLIPTextTransformer forward must match
CLIP.encode_text (modeling/clip/model.py:593-604) on converted weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.models.clip_text import CLIPTextTransformer
from demo2_tpu.utils.bpe import ClipBPE, tokenize
from demo2_tpu.utils.converters import convert_clip_text

PROMPTS = [
    "A photo of a person.",
    "a blurry thermal image of a pedestrian crossing the street",
    "Multi-modal object Re-IDentification (ReID) aims to retrieve targets!",
    "numbers 123 456 and punctuation?! #@%",
    "short",
    "",
]


def test_tokenizer_matches_reference():
    ref_st = load_ref("modeling.clip.simple_tokenizer")
    ref_tok = ref_st.SimpleTokenizer(
        "/root/reference/modeling/clip/bpe_simple_vocab_16e6.txt.gz"
    )
    ours = ClipBPE()
    for text in PROMPTS:
        if not text:
            continue
        assert ours.encode(text) == ref_tok.encode(text), text
    # round trip
    ids = ours.encode("a photo of a person")
    assert "a photo of a person" in ours.decode(ids)


def test_tokenize_framing_matches_reference():
    ref_clip = load_ref("modeling.clip.clip")
    want = ref_clip.tokenize(PROMPTS[:4]).numpy()
    got = tokenize(PROMPTS[:4])
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_text_encoder_parity():
    from test_reference_parity import randomize

    ref_model = load_ref("modeling.clip.model")
    width, heads, layers, embed = 64, 4, 2, 48
    import types

    vis_cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(PROMPT=False, ADAPTER=False)
    )
    tm = ref_model.CLIP(
        vis_cfg,
        embed_dim=embed,
        image_resolution=32,
        vision_layers=1,
        vision_width=64,
        vision_patch_size=16,
        vision_stride_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=width,
        transformer_heads=heads,
        transformer_layers=layers,
        h_resolution=2,
        w_resolution=1,
    ).float()
    randomize(tm, seed=11)
    tm.eval()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_clip_text(sd)

    model = CLIPTextTransformer(
        width=width, heads=heads, layers=layers, embed_dim=embed
    )
    tokens = tokenize(PROMPTS[:4])
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    # shape agreement between converted and initialized trees
    flat_a = jax.tree_util.tree_leaves_with_path(init["params"])
    flat_b = dict(
        (jax.tree_util.keystr(p), l.shape)
        for p, l in jax.tree_util.tree_leaves_with_path(params)
    )
    for p, leaf in flat_a:
        assert flat_b[jax.tree_util.keystr(p)] == leaf.shape, jax.tree_util.keystr(p)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))

    # NOTE: the fork's own CLIP.encode_text is UNRUNNABLE as written —
    # Transformer.forward passes (x, modality, index, last_prompt) into
    # nn.Sequential, which accepts one input (clip/model.py:413-414), so
    # encode_text raises TypeError.  Replicate its documented semantics
    # (:593-604) with the blocks' forward_ori (the "DeMo only" branch,
    # which applies the causal attn_mask).
    text_t = torch.from_numpy(tokens.astype(np.int64))
    with torch.no_grad():
        x = tm.token_embedding(text_t) + tm.positional_embedding
        x = x.permute(1, 0, 2)
        for blk in tm.transformer.resblocks:
            x = blk.forward_ori(x)
        x = x.permute(1, 0, 2)
        x = tm.ln_final(x)
        want = (
            x[torch.arange(x.shape[0]), text_t.argmax(dim=-1)]
            @ tm.text_projection
        ).numpy()
    np.testing.assert_allclose(ours, want, rtol=5e-4, atol=5e-4)


def test_text_tower_embedding_lora_builds_and_runs():
    """Token-embedding LoRA (clip/LoRA.py:33-90 semantics) behind
    lora_rank on the text tower: params exist, forward runs, and a fresh
    adapter is a NO-OP (lora_A init zeros, reference reset_parameters)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.models.clip_text import CLIPTextTransformer

    kw = dict(vocab_size=64, context_length=8, width=32, layers=1, heads=2,
              embed_dim=16)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)))
    base = CLIPTextTransformer(**kw)
    vb = jax.jit(lambda: base.init(jax.random.PRNGKey(0), ids))()
    lora = CLIPTextTransformer(lora_rank=4, **kw)
    vl = jax.jit(lambda: lora.init(jax.random.PRNGKey(0), ids))()
    p = vl["params"]
    assert p["token_lora_a"].shape == (4, 64)
    assert p["token_lora_b"].shape == (32, 4)
    assert np.all(np.asarray(p["token_lora_a"]) == 0.0)  # ref init: A zeros
    # graft the base weights (init RNG split differs once extra params
    # exist) — a zero adapter must reproduce the base output exactly
    pl = dict(p)
    for k in vb["params"]:
        pl[k] = vb["params"][k]
    out_base = base.apply(vb, ids)
    out_lora = lora.apply({"params": pl}, ids)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base),
                               rtol=1e-6, atol=1e-6)


def test_prompt_learner_parity_vs_reference():
    """PromptLearner (reference make_model_clipreid.py:190-237, dormant
    there): identical prompts given the same embedding table + class
    vectors, and the embedded-prompt encoder path equals the id path on a
    pure-token prompt."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from ref_loader import load_ref
    from demo2_tpu.models.clip_text import CLIPTextTransformer, PromptLearner

    # the reference module calls .cuda() on the tokenized prompt; no GPU
    # here, so make it a no-op before import-time use
    torch.Tensor.cuda = lambda self, *a, **k: self
    mm = load_ref("modeling.make_model_clipreid")

    num_class, width = 6, 512
    emb = torch.nn.Embedding(49408, width)
    torch.manual_seed(3)
    torch.nn.init.normal_(emb.weight, std=0.02)
    ref = mm.PromptLearner(num_class, "RGBNT201", torch.float32, emb)
    labels = torch.tensor([0, 3, 5, 1])
    want = ref(labels).detach().numpy()  # (4, 77, 512)

    mine = PromptLearner(num_class=num_class, ctx_dim=width)
    vars_ = {"params": {"cls_ctx": jnp.asarray(ref.cls_ctx.detach().numpy())}}
    got = mine.apply(
        vars_, jnp.asarray(labels.numpy()),
        jnp.asarray(emb.weight.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)

    # EOT position: the reference pools at tokenized_prompts.argmax(-1)
    assert mine.eot_pos == int(ref.tokenized_prompts.argmax(-1)[0])

    # encoder consistency: ids path == embedded path for real token ids
    kw = dict(vocab_size=64, context_length=10, width=32, layers=1, heads=2,
              embed_dim=16)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 63, (3, 10)))
    ids = ids.at[:, -1].set(63)  # force EOT = max id at the end
    tower = CLIPTextTransformer(**kw)
    v = jax.jit(lambda: tower.init(jax.random.PRNGKey(0), ids))()
    out_ids = tower.apply(v, ids)
    tok = v["params"]["token_embedding"]
    out_emb = tower.apply(
        v, prompt_embeds=tok[ids], eot_idx=jnp.full((3,), 9)
    )
    np.testing.assert_allclose(np.asarray(out_emb), np.asarray(out_ids),
                               rtol=1e-6, atol=1e-6)


def test_embedding_lora_survives_prompt_path_via_adapted_table():
    """With an ACTIVE token-embedding adapter, the embedded-prompt path
    must use adapted_token_embedding — ids path == prompt path then holds
    (review finding: the raw table silently dropped the adapter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.models.clip_text import (
        CLIPTextTransformer,
        adapted_token_embedding,
    )

    kw = dict(vocab_size=64, context_length=10, width=32, layers=1, heads=2,
              embed_dim=16)
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 63, (3, 10)))
    ids = ids.at[:, -1].set(63)
    tower = CLIPTextTransformer(lora_rank=4, **kw)
    v = jax.jit(lambda: tower.init(jax.random.PRNGKey(0), ids))()
    # give the zero-init A signal so the adapter actually perturbs outputs
    p = dict(v["params"])
    p["token_lora_a"] = jax.random.normal(jax.random.PRNGKey(5),
                                          p["token_lora_a"].shape) * 0.3
    v = {"params": p}

    out_ids = tower.apply(v, ids)
    tab = adapted_token_embedding(p["token_embedding"], p["token_lora_a"],
                                  p["token_lora_b"], tower.lora_alpha)
    out_adapted = tower.apply(v, prompt_embeds=tab[ids],
                              eot_idx=jnp.full((3,), 9))
    np.testing.assert_allclose(np.asarray(out_adapted), np.asarray(out_ids),
                               rtol=2e-5, atol=2e-5)
    # the RAW table would NOT match (the adapter is live)
    out_raw = tower.apply(v, prompt_embeds=p["token_embedding"][ids],
                          eot_idx=jnp.full((3,), 9))
    assert np.abs(np.asarray(out_raw) - np.asarray(out_ids)).max() > 1e-3
