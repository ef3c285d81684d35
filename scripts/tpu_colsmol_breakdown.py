#!/usr/bin/env python
"""ColSmol forward component breakdown on the real chip: LM vs vision.

Times the full multimodal forward against a text-only forward of the same
token sequence (no vision tower / connector) with the in-jit chain; the
difference is the vision side. Feeds the VERDICT r3 #2 ablation (where do
the non-attention milliseconds go)."""

from __future__ import annotations

import functools
import os
import sys
import time
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    import jax
    import jax.numpy as jnp

    from multimodal_colpali_tpu.models.registry import load_retriever

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ret = load_retriever("vidore/colSmol-256M")
    from PIL import Image
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (448, 448, 3), np.uint8))
            for _ in range(16)]
    proc = ret.processor.process_images(imgs)
    args = [jnp.asarray(a) for a in ret._batch_args(proc, True)]
    print("arg shapes:", [a.shape for a in args], file=sys.stderr)
    model, params = ret.model, ret.params
    ids, mask = args[0], args[1]
    ids_noimg = jnp.where(ids == model.cfg.image_token_id, 1, ids)

    def fwd_full(params, ids, mask, pix):
        return model.apply({"params": params}, ids, mask, pix)

    def fwd_text(params, ids, mask):
        return model.apply({"params": params}, ids, mask, None)

    def timeit(fn, ops, n=16):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(params, n, *a):
            def body(carry, _):
                x0, acc = carry
                out = fn(params, *(list(a[:-1]) + [x0]))
                s = jnp.sum(out.astype(jnp.float32))
                return (x0 + (s * 0).astype(x0.dtype), acc + s), ()

            (_, acc), _ = jax.lax.scan(body, (a[-1], jnp.float32(0)),
                                       None, length=n)
            return acc

        np.asarray(chain(params, 1, *ops))
        t0 = time.time()
        np.asarray(chain(params, 1, *ops))
        t1 = time.time()
        np.asarray(chain(params, n + 1, *ops))
        t2 = time.time()
        np.asarray(chain(params, n + 1, *ops))
        t3 = time.time()
        return ((t3 - t2) - (t1 - t0)) / n * 1e3

    full_ms = timeit(fwd_full, [ids, mask, args[-1]])
    text_ms = timeit(fwd_text, [ids_noimg, mask])
    print(f"full fwd : {full_ms:.2f} ms/batch16", file=sys.stderr)
    print(f"LM-only  : {text_ms:.2f} ms/batch16 (same seq, no vision)",
          file=sys.stderr)
    print(f"vision+connector ~= {full_ms - text_ms:.2f} ms", file=sys.stderr)
    print("lm seq len:", ids.shape, file=sys.stderr)


if __name__ == "__main__":
    main()
