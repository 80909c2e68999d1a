"""LoRA fine-tuning path: frozen backbone, trainable adapters + heads."""

import jax
import jax.numpy as jnp
import numpy as np

from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model


def test_frozen_backbone_trains_only_lora_and_heads(tiny_cfg):
    cfg = tiny_cfg
    cfg.MODEL.FROZEN = True
    cfg.TPU.LORA_RANK = 2
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()

    train_pipe, sampler, _, _, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    # LoRA params exist in the backbone.
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    lora_paths = [p for p, _ in flat if any("lora" in str(k) for k in p)]
    assert lora_paths, "expected LoRA params in the frozen backbone"

    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    new_state, _ = step(
        state,
        jnp.asarray(batch.images),
        jnp.asarray(batch.pids),
        jnp.asarray(batch.camids),
        jnp.asarray(batch.viewids),
        jax.random.PRNGKey(1),
    )

    def moved(path, a, b):
        return float(jnp.max(jnp.abs(a - b)))

    for path, a in jax.tree_util.tree_leaves_with_path(state.params):
        b = a  # lookup in new tree
    old_flat = dict(jax.tree_util.tree_leaves_with_path(state.params))
    new_flat = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    frozen_moved, lora_moved, head_moved = 0.0, 0.0, 0.0
    for path, old in old_flat.items():
        delta = float(jnp.max(jnp.abs(new_flat[path] - old)))
        keys = [str(getattr(k, "key", k)) for k in path]
        # Only backbone/base is frozen; the wrapper-level cv_embed (SIE)
        # remains trainable, matching the reference's lora_train(self.base).
        if "backbone" in keys[0] and len(keys) > 1 and "base" in keys[1]:
            if any("lora" in k for k in keys):
                lora_moved = max(lora_moved, delta)
            else:
                frozen_moved = max(frozen_moved, delta)
        else:
            head_moved = max(head_moved, delta)
    assert frozen_moved == 0.0, "frozen backbone params must not move"
    assert lora_moved > 0.0, "LoRA params must train"
    assert head_moved > 0.0, "heads must train"


def test_merged_linear_parity_vs_reference():
    """MergedLinear semantics (reference clip/LoRA.py:133-231): per-slice
    rank-r adapters on the enabled q/k/v slices, zeros elsewhere, via the
    converter (utils/ref_convert.convert_merged_lora) + the packed delta
    (ops/attention.merged_lora_delta)."""
    import torch

    from ref_loader import load_ref

    ref_lora = load_ref("modeling.clip.LoRA")
    from demo2_tpu.ops.attention import merged_lora_delta
    from demo2_tpu.utils.ref_convert import convert_merged_lora

    torch.manual_seed(0)
    c, r, alpha = 48, 4, 8
    enable = [True, False, True]
    m = ref_lora.MergedLinear(
        c, 3 * c, r=r, lora_alpha=alpha, enable_lora=enable, bias=True
    )
    with torch.no_grad():  # fresh lora_B is zeros; give it signal
        m.lora_A.normal_(0, 0.5)
        m.lora_B.normal_(0, 0.5)
    m.train()  # unmerged path: W untouched, low-rank term added on the fly
    x = torch.randn(5, c)
    want = m(x).detach().numpy()

    conv = convert_merged_lora(m.lora_A.detach().numpy(),
                               m.lora_B.detach().numpy(), enable, r, alpha)
    delta = merged_lora_delta(
        jnp.asarray(conv["lora_a"]), jnp.asarray(conv["lora_b"]),
        tuple(enable), 1.0,
    )
    w = jnp.asarray(m.weight.detach().numpy()).T  # (c, 3c) packed kernel
    got = np.asarray(jnp.asarray(x.numpy()) @ (w + delta)
                     + jnp.asarray(m.bias.detach().numpy()))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # merged (eval) mode folds the same delta into the weight — same output
    m.eval()
    np.testing.assert_allclose(
        np.asarray(m(x).detach().numpy()), want, rtol=2e-5, atol=2e-5
    )

    # disabled slice (k) must be untouched: its delta columns are zero
    d = np.asarray(delta)
    assert np.all(d[:, c : 2 * c] == 0.0)
    assert np.abs(d[:, :c]).max() > 0 and np.abs(d[:, 2 * c :]).max() > 0


def test_embedding_lora_parity_vs_reference():
    """Embedding adapter (reference clip/LoRA.py:33-90) through the
    converter + models/clip_text.lora_embedding_delta."""
    import torch

    from ref_loader import load_ref

    ref_lora = load_ref("modeling.clip.LoRA")
    from demo2_tpu.models.clip_text import lora_embedding_delta
    from demo2_tpu.utils.ref_convert import convert_embedding_lora

    torch.manual_seed(1)
    vocab, width, r, alpha = 64, 24, 4, 6
    m = ref_lora.Embedding(vocab, width, r=r, lora_alpha=alpha)
    with torch.no_grad():  # fresh lora_A is zeros; give it signal
        m.lora_A.normal_(0, 0.5)
    m.train()
    ids = torch.randint(0, vocab, (3, 7))
    want = m(ids).detach().numpy()

    conv = convert_embedding_lora(m.lora_A.detach().numpy(),
                                  m.lora_B.detach().numpy(), r, alpha)
    tok = jnp.asarray(m.weight.detach().numpy())
    got = np.asarray(
        tok[jnp.asarray(ids.numpy())]
        + lora_embedding_delta(
            jnp.asarray(conv["token_lora_a"]),
            jnp.asarray(conv["token_lora_b"]),
            jnp.asarray(ids.numpy()), 1.0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_frozen_backbone_merged_lora_subset_trains(tiny_cfg):
    """MODEL.FROZEN + TPU.LORA_ENABLE='qv' builds the per-slice adapters
    ((2, c, r)/(2, r, c) shapes) and the whole forward/backward runs."""
    cfg = tiny_cfg
    cfg.MODEL.FROZEN = True
    cfg.TPU.LORA_RANK = 2
    cfg.TPU.LORA_ENABLE = "qv"
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()

    train_pipe, sampler, _, _, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    a_shapes = {tuple(l.shape) for p, l in flat
                if any("lora_a" in str(k) for k in p)}
    c = cfg.TPU.BACKBONE_WIDTH
    assert (2, c, 2) in a_shapes, a_shapes  # (n_on=2 slices, c, r)

    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    s1, metrics = step(state, jnp.asarray(batch.images),
                       jnp.asarray(batch.pids), jnp.asarray(batch.camids),
                       jnp.asarray(batch.viewids), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = [
        float(np.abs(np.asarray(l1, np.float32) - np.asarray(l0, np.float32)).max())
        for (p, l0), l1 in zip(flat, jax.tree_util.tree_leaves(s1.params))
        if any("lora_b" in str(k) for k in p)
    ]
    assert moved and max(moved) > 0.0, "merged-LoRA adapters must train"


def test_frozen_backbone_keeps_adapters_trainable(tiny_cfg):
    """Reference mark_only_lora_as_trainable exempts params named
    'adapter' (clip/LoRA.py:307-316) — FROZEN + ADAPTER must TRAIN the FFN
    adapters while the rest of the backbone stays frozen."""
    cfg = tiny_cfg
    cfg.MODEL.FROZEN = True
    cfg.MODEL.ADAPTER = True
    cfg.TPU.LORA_RANK = 0
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()

    train_pipe, sampler, _, _, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    s1, metrics = step(state, jnp.asarray(batch.images),
                       jnp.asarray(batch.pids), jnp.asarray(batch.camids),
                       jnp.asarray(batch.viewids), jax.random.PRNGKey(1))
    adapter_moved, frozen_moved = 0.0, 0.0
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    for (p, l0), l1 in zip(flat, jax.tree_util.tree_leaves(s1.params)):
        keys = [str(k) for k in p]
        delta = float(np.abs(np.asarray(l1, np.float32)
                             - np.asarray(l0, np.float32)).max())
        in_backbone = any("backbone" in k for k in keys[:1]) and any(
            "base" in k for k in keys[1:2])
        if any("adapter" in k for k in keys):
            adapter_moved = max(adapter_moved, delta)
        elif in_backbone:
            frozen_moved = max(frozen_moved, delta)
    assert adapter_moved > 0.0, "FFN adapters must train under FROZEN"
    assert frozen_moved == 0.0, "non-adapter backbone params must stay frozen"


def test_conv_lora_parity_vs_reference():
    """ConvLoRA (reference clip/LoRA.py:231-298): the flax-layout delta +
    converter reproduce the reference's unmerged forward on the conv."""
    import torch

    from ref_loader import load_ref

    ref_lora = load_ref("modeling.clip.LoRA")
    from demo2_tpu.ops.attention import conv_lora_delta
    from demo2_tpu.utils.ref_convert import convert_conv_lora

    torch.manual_seed(4)
    in_ch, out_ch, k, r, alpha = 3, 12, 4, 2, 6
    m = ref_lora.ConvLoRA(torch.nn.Conv2d, in_ch, out_ch, k, r=r,
                          lora_alpha=alpha, bias=False, stride=k)
    with torch.no_grad():  # fresh lora_B is zeros; give it signal
        m.lora_B.normal_(0, 0.5)
    m.train()
    x = torch.randn(2, in_ch, 8, 8)
    want = m(x).detach().numpy()  # (2, out, 2, 2)

    conv = convert_conv_lora(m.lora_A.detach().numpy(),
                             m.lora_B.detach().numpy(), r, alpha)
    delta = conv_lora_delta(jnp.asarray(conv["conv_lora_a"]),
                            jnp.asarray(conv["conv_lora_b"]),
                            out_ch, in_ch, k, 1.0)
    kern = jnp.asarray(  # torch OIHW -> flax HWIO
        m.conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), kern + delta,
        window_strides=(k, k), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-5, atol=2e-5)


def test_frozen_conv_lora_builds_and_trains(tiny_cfg):
    """TPU.LORA_CONV + FROZEN: the patch-embed adapter params exist in the
    reference layout, are trainable, and the conv kernel stays frozen."""
    cfg = tiny_cfg
    cfg.MODEL.FROZEN = True
    cfg.TPU.LORA_RANK = 2
    cfg.TPU.LORA_CONV = True
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.freeze()

    train_pipe, sampler, _, _, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, ctx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=2
    )
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    shapes = {"/".join(str(k) for k in p): l.shape for p, l in flat
              if any("conv_lora" in str(k) for k in p)}
    ks = 16
    assert any(s == (2 * ks, 3 * ks) for s in shapes.values()), shapes
    step = build_train_step(cfg, model, tx, ctx, mesh=None, donate=False)
    s1, metrics = step(state, jnp.asarray(batch.images),
                       jnp.asarray(batch.pids), jnp.asarray(batch.camids),
                       jnp.asarray(batch.viewids), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    conv_moved, kern_moved = 0.0, 0.0
    for (p, l0), l1 in zip(flat, jax.tree_util.tree_leaves(s1.params)):
        keys = [str(k) for k in p]
        delta = float(np.abs(np.asarray(l1, np.float32)
                             - np.asarray(l0, np.float32)).max())
        if any("conv_lora" in k for k in keys):
            conv_moved = max(conv_moved, delta)
        elif any("conv1" in k for k in keys):
            kern_moved = max(kern_moved, delta)
    assert conv_moved > 0.0, "ConvLoRA adapter must train"
    assert kern_moved == 0.0, "the frozen conv kernel must not move"
