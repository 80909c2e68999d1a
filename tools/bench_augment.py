"""Micro-bench the in-graph augmentation (the ~6% e2e share, PERF.md).

The device-cache augment (data/device_cache.py::apply_augment) runs
/255 -> flip -> pad -> crop-gather -> normalize -> erase on f32 at
(64, 3, 256, 128, 3) = 19.7M elements.  Candidates measured here:

  base      current pipeline (f32 permutes)
  u8first   flip/pad/crop on UINT8 (4x less HBM traffic on the permute
            ops; bit-identical — permutations commute with the affine)
  noise     the erase-noise jax.random.normal alone (threefry)
  u8+rbg    u8first with the noise from lax.rng_bit_generator + Box-Muller
            (same N(0,1) distribution, different stream — the same
            contract as the documented jax-vs-numpy stream delta)

Each variant is timed with a forced device-side reduction readback at the
end of a chained loop (bench.py's convention — block_until_ready
under-reports on the remote tunnel).

Usage: python tools/bench_augment.py [--iters 50] [--batch 64]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 128))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.config.presets import setup_compilation_cache
    from demo2_tpu.data.device_cache import apply_augment, draw_aug_params

    setup_compilation_cache()

    h, w = args.size
    b = args.batch
    mean = (0.5, 0.5, 0.5)
    std = (0.5, 0.5, 0.5)
    pad = 10

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (b, 3, h, w, 3), dtype=np.uint8))

    def u8first(u8x, params):
        """flip/pad/crop on uint8, then one f32 affine + erase pass."""
        bb, m, hh, ww, c = u8x.shape
        x = jnp.where(
            params["flip"][..., None, None, None], u8x[:, :, :, ::-1, :], u8x
        )
        p = pad
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        rows = params["crop_top"][..., None] + jnp.arange(hh)
        x = jnp.take_along_axis(x, rows[..., None, None], axis=2)
        cols = params["crop_left"][..., None] + jnp.arange(ww)
        x = jnp.take_along_axis(x, cols[:, :, None, :, None], axis=3)
        xf = x.astype(jnp.float32) / 255.0
        xf = (xf - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
        yy = jnp.arange(hh)[None, None, :, None]
        xx = jnp.arange(ww)[None, None, None, :]
        top = params["erase_top"][..., None, None]
        left = params["erase_left"][..., None, None]
        rect = (
            (yy >= top)
            & (yy < top + params["erase_h"][..., None, None])
            & (xx >= left)
            & (xx < left + params["erase_w"][..., None, None])
            & params["erase"][..., None, None]
        )
        noise = jax.random.normal(params["noise_key"], xf.shape, jnp.float32)
        return jnp.where(rect[..., None], noise, xf)

    def rbg_normal(key, shape):
        """N(0,1) from lax.rng_bit_generator bits via Box-Muller."""
        n = int(np.prod(shape))
        n2 = -(-n // 2) * 2
        kdata = jax.random.key_data(key).astype(jnp.uint32)
        if kdata.size < 4:
            kdata = jnp.tile(kdata, 4 // kdata.size + 1)[:4]
        else:
            kdata = kdata.ravel()[:4]
        _, bits = jax.lax.rng_bit_generator(kdata, (2, n2 // 2), jnp.uint32)
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        u1 = jnp.maximum(u[0], 1e-7)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * np.pi) * u[1]
        z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)])
        return z[:n].reshape(shape)

    def u8first_rbg(u8x, params):
        bb, m, hh, ww, c = u8x.shape
        x = jnp.where(
            params["flip"][..., None, None, None], u8x[:, :, :, ::-1, :], u8x
        )
        p = pad
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        rows = params["crop_top"][..., None] + jnp.arange(hh)
        x = jnp.take_along_axis(x, rows[..., None, None], axis=2)
        cols = params["crop_left"][..., None] + jnp.arange(ww)
        x = jnp.take_along_axis(x, cols[:, :, None, :, None], axis=3)
        xf = x.astype(jnp.float32) / 255.0
        xf = (xf - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
        yy = jnp.arange(hh)[None, None, :, None]
        xx = jnp.arange(ww)[None, None, None, :]
        top = params["erase_top"][..., None, None]
        left = params["erase_left"][..., None, None]
        rect = (
            (yy >= top)
            & (yy < top + params["erase_h"][..., None, None])
            & (xx >= left)
            & (xx < left + params["erase_w"][..., None, None])
            & params["erase"][..., None, None]
        )
        noise = rbg_normal(params["noise_key"], xf.shape)
        return jnp.where(rect[..., None], noise, xf)

    def chain(fn, extra_cast=True):
        """Loop the augment with a data dependency + device-side readback."""

        @jax.jit
        def run(u8x, key, iters_dummy):
            def body(carry, i):
                acc, k = carry
                k, sub = jax.random.split(k)
                params = draw_aug_params(sub, u8x.shape[0], (h, w))
                out = fn(u8x, params)
                if extra_cast:
                    out = out.astype(jnp.bfloat16)
                return (acc + jnp.sum(out[0, 0, 0, 0]).astype(jnp.float32), k), ()

            (acc, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), key), jnp.arange(args.iters)
            )
            return acc

        return run

    def base_fn(u8x, params):
        return apply_augment(u8x, params, mean, std, padding=pad)

    def noise_only(u8x, params):
        return jax.random.normal(
            params["noise_key"], (b, 3, h, w, 3), jnp.float32
        )

    def noise_rbg_only(u8x, params):
        return rbg_normal(params["noise_key"], (b, 3, h, w, 3))

    key = jax.random.PRNGKey(0)

    # Bit-identity check: u8first == base (same params).
    params = draw_aug_params(jax.random.PRNGKey(7), b, (h, w))
    ref = np.asarray(base_fn(u8, params))
    got = np.asarray(u8first(u8, params))
    bit_identical = bool(np.array_equal(ref, got))
    print(f"u8first bit-identical to base: {bit_identical}", file=sys.stderr)

    results = {}
    for name, fn in [
        ("base", base_fn),
        ("u8first", u8first),
        ("noise_threefry", noise_only),
        ("noise_rbg", noise_rbg_only),
        ("u8first_rbg", u8first_rbg),
    ]:
        run = chain(fn)
        _ = float(run(u8, key, 0))  # compile
        t0 = time.perf_counter()
        _ = float(run(u8, key, 0))
        dt = time.perf_counter() - t0
        per = dt / args.iters * 1e3
        results[name] = per
        print(f"{name:16s} {per:7.3f} ms/iter "
              f"({b * 3:d} modal-images)", file=sys.stderr)

    import json

    print(json.dumps({"bit_identical": bit_identical,
                      "ms_per_iter": {k: round(v, 3) for k, v in results.items()},
                      "batch": b, "size": [h, w]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
