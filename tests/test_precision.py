"""bf16/fp32 numerics sanity: the precision split (fp32 LN/softmax/entropy/
FFT islands) must keep bf16 embeddings close to the fp32 reference."""

import jax
import jax.numpy as jnp
import numpy as np

from demo2_tpu.models import make_model


def test_bf16_embedding_close_to_fp32(tiny_cfg):
    cfg32 = tiny_cfg
    cfg32.MODEL.USE_SDTPS = True
    cfg32.MODEL.USE_DGAF = True
    cfg16 = cfg32.clone()
    cfg16.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg32.freeze()
    cfg16.freeze()

    m32 = make_model(cfg32, num_class=6, camera_num=4)
    m16 = make_model(cfg16, num_class=6, camera_num=4)
    h, w = cfg32.INPUT.SIZE_TRAIN
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (2, 3, h, w, 3)) * 0.3
    cams = jnp.zeros((2,), jnp.int32)
    variables = m32.init({"params": rng}, imgs, cams, train=False)

    e32 = m32.apply(variables, imgs, cams, train=False)["embedding"]
    e16 = m16.apply(variables, imgs, cams, train=False)["embedding"]
    a = np.asarray(e32, np.float32)
    b = np.asarray(e16, np.float32)
    # Cosine similarity per sample must be ~1 (the eval metric is cosine/L2
    # on normalized features, so direction is what matters).
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert cos.min() > 0.995, cos
