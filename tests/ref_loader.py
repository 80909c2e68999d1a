"""Direct-file import of the reference implementation for parity tests.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used strictly as
a behavioral oracle: tests import its modules, copy weights into the JAX
modules (or vice versa) and assert forward parity.  Nothing from the
reference ships inside the `demo2_tpu` package.

The reference depends on timm / fvcore / torchvision, which are not
installed here; minimal functional stubs are injected into `sys.modules`
before import.  Only the pieces the reference actually touches are stubbed:
  * timm.models.layers.{DropPath,to_2tuple,trunc_normal_}
  * timm.models.helpers.load_pretrained / timm.models.registry.register_model
  * fvcore.nn.flop_count / fvcore.nn.jit_handles.elementwise_flop_counter
  * torchvision.transforms (only imported, never executed, by clip/clip.py)
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_ref_stubs() -> None:
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = _module("timm")
        timm_models = _module("timm.models")
        layers = _module("timm.models.layers")
        helpers = _module("timm.models.helpers")
        registry = _module("timm.models.registry")
        timm.models = timm_models
        timm_models.layers = layers
        timm_models.helpers = helpers
        timm_models.registry = registry

        def to_2tuple(x):
            return x if isinstance(x, (tuple, list)) else (x, x)

        class DropPath(nn.Module):
            """Per-sample stochastic depth (timm semantics)."""

            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x.div(keep) * mask

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        helpers.load_pretrained = lambda *a, **k: None
        registry.register_model = lambda fn: fn

    if "fvcore" not in sys.modules:
        fvcore = _module("fvcore")
        fv_nn = _module("fvcore.nn")
        jh = _module("fvcore.nn.jit_handles")
        fvcore.nn = fv_nn
        fv_nn.jit_handles = jh
        fv_nn.flop_count = lambda *a, **k: ({}, {})
        jh.elementwise_flop_counter = lambda *a, **k: (lambda *aa, **kk: 0)

    if "ftfy" not in sys.modules:
        ftfy = _module("ftfy")
        ftfy.fix_text = lambda s: s  # only used by the BPE tokenizer

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        transforms = _module("torchvision.transforms")
        tv.transforms = transforms

        class _Dummy:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(transforms, name, _Dummy)

        class InterpolationMode:
            BICUBIC = "bicubic"

        transforms.InterpolationMode = InterpolationMode


def load_ref(mod_name: str):
    """Import a reference module (e.g. 'modeling.sdtps') by absolute name."""
    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    sys.dont_write_bytecode = True  # /root/reference is read-only
    return importlib.import_module(mod_name)
