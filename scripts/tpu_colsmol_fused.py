#!/usr/bin/env python
"""ColSmol-256M embed throughput: fused-layer kernels vs the unfused path.

VERDICT r3 #2 harness. Measures pages/s/chip + MFU with the in-jit chain
(block_until_ready does not sync through the tunnel) for
models/layers.set_fused_layer(False) vs (True) in one process, same
weights, same inputs. Run foreground through the tunnel, <= 600 s staged:

  python scripts/tpu_colsmol_fused.py --mode unfused
  python scripts/tpu_colsmol_fused.py --mode fused
  python scripts/tpu_colsmol_fused.py --mode both
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(name: str, batch: int, n_iters: int, fused: bool,
            flops_per_page_g: float = 0.0) -> dict:
    import jax
    import jax.numpy as jnp

    from multimodal_colpali_tpu.models import layers as L
    from multimodal_colpali_tpu.models.registry import load_retriever

    L.set_fused_layer(fused)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ret = load_retriever(name)
        from PIL import Image
        rng = np.random.default_rng(0)
        imgs = [Image.fromarray(rng.integers(0, 255, (448, 448, 3), np.uint8))
                for _ in range(batch)]
        proc = ret.processor.process_images(imgs)
        args = [jnp.asarray(a) for a in ret._batch_args(proc, True)]
        model, params = ret.model, ret.params

        def fwd(params, *a):
            return model.apply({"params": params}, *a)

        # FLOPs always from the UNFUSED lowering: XLA's cost_analysis does
        # not count Pallas custom-call FLOPs, so the fused variant would
        # report a bogus low MFU. The math is identical either way.
        flops = None
        if flops_per_page_g > 0:
            # staged-window helper: reuse the FLOPs/page from an earlier
            # unfused run (the math is identical) instead of paying an
            # extra unfused compile through the tunnel
            flops = flops_per_page_g * 1e9 * batch
        else:
            try:
                L.set_fused_layer(False)
                cost = (jax.jit(fwd).lower(params, *args).compile()
                        .cost_analysis())
                if cost:
                    c = cost[0] if isinstance(cost, (list, tuple)) else cost
                    flops = float(c.get("flops", 0)) or None
            except Exception as e:  # noqa: BLE001
                log(f"[fused-bench] cost_analysis unavailable: {e}")
            finally:
                L.set_fused_layer(fused)

        pix_idx = len(args) - 1

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(params, n, *a):
            a = list(a)

            def body(carry, _):
                pix, acc = carry
                emb = fwd(params, *(a[:pix_idx] + [pix]))
                s = jnp.sum(emb.astype(jnp.float32))
                pix = pix + (s * 0).astype(pix.dtype)
                return (pix, acc + s), ()

            (pix, acc), _ = jax.lax.scan(
                body, (a[pix_idx], jnp.float32(0)), None, length=n)
            return acc

        t0 = time.time()
        np.asarray(chain(params, 1, *args))
        log(f"[fused-bench] fused={fused} n=1 compiled in {time.time()-t0:.0f}s")
        t0 = time.time()
        np.asarray(chain(params, 1, *args))
        t1 = time.time()
        np.asarray(chain(params, n_iters + 1, *args))
        t2 = time.time()
        np.asarray(chain(params, n_iters + 1, *args))
        t3 = time.time()
        per = max(((t3 - t2) - (t1 - t0)) / n_iters, 1e-9)
        out = {"fused": fused, "pages_per_sec": batch / per,
               "ms_per_batch": per * 1e3}
        if flops:
            out["mfu"] = flops / per / PEAK_BF16
            out["gflop_per_page"] = flops / batch / 1e9
        log(f"[fused-bench] fused={fused} batch={batch}: "
            f"{out['pages_per_sec']:.1f} pages/s"
            + (f", MFU {out['mfu']*100:.1f}%" if flops else ""))
        return out
    finally:
        L.set_fused_layer(None)


def compile_only(name: str, batch: int, n_iters: int, fused: bool,
                 which: str) -> None:
    """AOT-compile measure()'s exact chain executable(s) into the
    persistent cache WITHOUT any device transfer or timed run.

    On degraded-tunnel days the fused whole-layer compile alone can eat
    most of a <=600 s staged window; killed measure() attempts restart
    the compile from zero because nothing lands in the cache until the
    compile finishes. This lowers the IDENTICAL HLO (params are jit
    arguments, so only avals matter) from ShapeDtypeStructs - near-zero
    startup, the whole window goes to the server-side compile, and the
    cached executable makes the subsequent real measure() run cheap.

    ``which`` selects the chain length: "warm" (n=1), "timed"
    (n=n_iters+1), or "both".
    """
    import jax
    import jax.numpy as jnp

    from multimodal_colpali_tpu.models import layers as L
    from multimodal_colpali_tpu.models.registry import load_retriever

    L.set_fused_layer(fused)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ret = load_retriever(name)
        from PIL import Image
        rng = np.random.default_rng(0)
        imgs = [Image.fromarray(rng.integers(0, 255, (448, 448, 3), np.uint8))
                for _ in range(batch)]
        proc = ret.processor.process_images(imgs)
        canon = jax.dtypes.canonicalize_dtype
        avals = [jax.ShapeDtypeStruct(np.shape(a), canon(np.asarray(a).dtype))
                 for a in ret._batch_args(proc, True)]
        p_avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, canon(x.dtype)),
            ret.params)
        model = ret.model

        def fwd(params, *a):
            return model.apply({"params": params}, *a)

        pix_idx = len(avals) - 1

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(params, n, *a):
            a = list(a)

            def body(carry, _):
                pix, acc = carry
                emb = fwd(params, *(a[:pix_idx] + [pix]))
                s = jnp.sum(emb.astype(jnp.float32))
                pix = pix + (s * 0).astype(pix.dtype)
                return (pix, acc + s), ()

            (pix, acc), _ = jax.lax.scan(
                body, (a[pix_idx], jnp.float32(0)), None, length=n)
            return acc

        lengths = {"warm": [1], "timed": [n_iters + 1],
                   "both": [1, n_iters + 1]}[which]
        for n in lengths:
            t0 = time.time()
            chain.lower(p_avals, n, *avals).compile()
            log(f"[fused-bench] compile-only fused={fused} n={n}: "
                f"{time.time()-t0:.0f}s")
    finally:
        L.set_fused_layer(None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["unfused", "fused", "both"])
    ap.add_argument("--model", default="vidore/colSmol-256M")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--compile-only", default=None,
                    choices=["warm", "timed", "both"],
                    help="AOT-compile the chain executable(s) into the "
                         "persistent cache and exit (no transfers, no "
                         "timed run) - staged-window helper")
    ap.add_argument("--flops-per-page", type=float, default=0.0,
                    help="GFLOP/page from an earlier unfused run; skips "
                         "the extra unfused cost_analysis compile "
                         "(staged-window helper; the FLOPs are identical "
                         "fused vs unfused)")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    modes = ([False, True] if args.mode == "both"
             else [args.mode == "fused"])
    if args.compile_only:
        for fused in modes:
            compile_only(args.model, args.batch, args.iters, fused,
                         args.compile_only)
        return
    for fused in modes:
        measure(args.model, args.batch, args.iters, fused,
                flops_per_page_g=args.flops_per_page)


if __name__ == "__main__":
    main()
