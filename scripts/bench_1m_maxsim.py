#!/usr/bin/env python
"""1M-page MaxSim p50 (BASELINE config #5; VERDICT r4 missing #4).

Target: MaxSim top-k p50 < 10 ms over 1,000,000 pages. At ColPali scale
(1030 tokens x 128 dims) the originals are ~135 GB int8 - beyond one
chip's HBM (16 GB), beyond a v5e-8's combined HBM, and beyond this
host's free disk. The production configuration for that scale is the
store's pooled two-stage tier (store/multivector.py on_disk=True, the
reference's Qdrant `on_disk: true` role, functions.py:828-873):

  stage 1 (N-dependent, on chip):   pooled page vectors [1M, 128] bf16
                                    (256 MB HBM) -> coarse_topk
  stage 2 (N-INDEPENDENT):          host memmap gather of the C
                                    candidates' original token vectors
                                    -> exact device rescore

This script measures each component for real at 1M-page scale:
  - stage 1 runs over a REAL [1,000,000 x 128] device array;
  - the gather pool holds N_REAL genuine pages (a memmap row-read
    touches only the C candidate rows, so its cost depends on C and the
    page size, not on N - the 1M-row memmap simply cannot exist on this
    disk, which is the documented substitution);
  - stage 2's rescore runs on the real gathered [C, 1030, 128] batch.

Device stages are timed with the in-jit lax.scan chain (CLAUDE.md:
block_until_ready does not sync through the tunnel; the chain consumes a
full reduction and feeds the carry back). The host->device candidate
transfer cannot be measured representatively through the remote-TPU
tunnel (35-40 ms RT per dispatch is a tunnel artifact, not PCIe); it is
reported as bytes plus a conservative 8 GB/s PCIe-gen3-equivalent
estimate and included in the end-to-end sum.

Writes records/maxsim_1m_r5.json; bench.py folds the headline number.

Usage: python scripts/bench_1m_maxsim.py [--n-pool 1000000]
       [--n-real 20000] [--candidates 128] [--iters 16] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

NT = 1030          # ColPali page tokens
D = 128            # embedding dim
NQ = 24            # query tokens


def log(*a):
    print(*a, flush=True)


def scan_chain_ms(fn, args, iters: int, perturb_idx: int = 0) -> float:
    """Median per-iteration device time of ``fn(*args)`` via an in-jit
    lax.scan whose carry perturbs args[perturb_idx] and consumes a full
    reduction of the outputs (tunnel-safe timing; CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    def chain(reps, *a):
        x0 = a[perturb_idx]

        def body(carry, _):
            x, acc = carry
            aa = list(a)
            aa[perturb_idx] = x
            out = fn(*aa)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))
            return (x + (s * 0).astype(x.dtype), acc + s), ()

        (_, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0)), None,
                                   length=reps)
        return acc

    jfn = jax.jit(chain, static_argnums=0)
    np.asarray(jfn(1, *args))                       # compile
    t0 = time.time(); np.asarray(jfn(1, *args)); t1 = time.time()
    np.asarray(jfn(iters + 1, *args))               # compile long variant
    t2 = time.time(); np.asarray(jfn(iters + 1, *args)); t3 = time.time()
    return max(((t3 - t2) - (t1 - t0)) / iters, 0.0) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pool", type=int, default=1_000_000)
    ap.add_argument("--n-real", type=int, default=20_000)
    ap.add_argument("--candidates", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--out", default=str(REPO / "records" / "maxsim_1m_r5.json"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU shapes (pipeline check only)")
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("MMCP_JAX_PLATFORMS", "cpu")
        args.n_pool, args.n_real, args.candidates, args.iters = 4096, 256, 16, 4

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    import jax
    import jax.numpy as jnp

    from multimodal_colpali_tpu.ops.two_stage import (coarse_topk,
                                                      rescore_candidates)

    backend = jax.default_backend()
    log(f"[1m] backend={backend} n_pool={args.n_pool} n_real={args.n_real} "
        f"C={args.candidates}")

    rng = np.random.default_rng(0)
    C = args.candidates

    # -- genuine gather pool (memmap) ----------------------------------------
    pool_path = Path("/tmp/maxsim_1m_pool.f16")
    shape = (args.n_real, NT, D)
    if (not pool_path.exists()
            or pool_path.stat().st_size != int(np.prod(shape)) * 2):
        log(f"[1m] writing {np.prod(shape) * 2 / 1e9:.1f} GB gather pool ...")
        mm = np.lib.format.open_memmap  # noqa: F841  (plain tofile is fine)
        with open(pool_path, "wb") as f:
            chunk = 1024
            for i in range(0, args.n_real, chunk):
                n = min(chunk, args.n_real - i)
                block = rng.standard_normal((n, NT, D)).astype(np.float16)
                block /= np.maximum(
                    np.linalg.norm(block, axis=-1, keepdims=True), 1e-6)
                block.tofile(f)
    pool = np.memmap(pool_path, dtype=np.float16, mode="r", shape=shape)

    # -- pooled stage-1 index at FULL 1M scale -------------------------------
    # first n_real rows = true pooled vectors of the gather pool (queries
    # derived from real pages then rank real pages on top); the tail is
    # unit-norm noise scaled to 0.9 so synthetic rows lose near-ties
    log("[1m] building pooled index ...")
    pooled_real = np.zeros((args.n_real, D), np.float32)
    for i in range(0, args.n_real, 4096):
        j = min(i + 4096, args.n_real)
        pooled_real[i:j] = np.asarray(pool[i:j], np.float32).mean(axis=1)
    tail = rng.standard_normal((args.n_pool - args.n_real, D)).astype(np.float32)
    tail *= 0.9 * (np.linalg.norm(pooled_real, axis=-1).mean()
                   / np.maximum(np.linalg.norm(tail, axis=-1,
                                               keepdims=True), 1e-6))
    pooled = np.concatenate([pooled_real, tail], axis=0)
    dl = np.full((args.n_pool,), NT, np.int32)

    pooled_j = jnp.asarray(pooled, jnp.bfloat16)
    dl_j = jnp.asarray(dl)
    q_np = (np.asarray(pool[rng.integers(0, args.n_real), :NQ], np.float32)
            + 0.05 * rng.standard_normal((NQ, D)).astype(np.float32))
    q_j = jnp.asarray(q_np, jnp.float32)

    hbm_bytes = pooled_j.size * 2
    log(f"[1m] stage-1 index: {hbm_bytes / 1e6:.0f} MB HBM")

    # -- stage 1 device time --------------------------------------------------
    def s1(q, p, lens):
        return coarse_topk(q, jnp.int32(NQ), p, lens, n_candidates=C)

    stage1_ms = scan_chain_ms(s1, (q_j, pooled_j, dl_j), args.iters)
    log(f"[1m] stage1 coarse_topk over {args.n_pool} pages: "
        f"{stage1_ms:.3f} ms/query (device)")

    # -- stage 2: host gather (genuine memmap row reads) ----------------------
    from multimodal_colpali_tpu.store.multivector import _gather_rows

    cand_host = np.asarray(s1(q_j, pooled_j, dl_j))
    cand_host = np.minimum(cand_host, args.n_real - 1)
    gather_times = []
    for it in range(max(args.iters, 8)):
        idx = rng.integers(0, args.n_real, C)
        t0 = time.time()
        pages = _gather_rows(pool, idx)  # raw f16; device casts in-jit
        gather_times.append(time.time() - t0)
    gather_ms = float(np.median(gather_times) * 1e3)
    bytes_gather = C * NT * D * 2
    log(f"[1m] stage2 gather of C={C} pages ({bytes_gather/1e6:.1f} MB "
        f"f16): {gather_ms:.3f} ms (host memmap, parallel pread)")

    # steady-state serving keeps the hot candidate set in page cache:
    # re-gathering rows already touched above measures the warm path
    warm_times = []
    hot = rng.integers(0, args.n_real, C)
    _gather_rows(pool, hot)  # fault the rows in once
    for it in range(max(args.iters, 8)):
        t0 = time.time()
        _gather_rows(pool, hot)
        warm_times.append(time.time() - t0)
    gather_warm_ms = float(np.median(warm_times) * 1e3)
    log(f"[1m] stage2 gather, warm page cache: {gather_warm_ms:.3f} ms")

    # -- stage 2: exact rescore device time -----------------------------------
    pages_j = jnp.asarray(pages)  # raw f16; rescore casts on device
    lens_j = jnp.full((C,), NT, jnp.int32)

    def s2(q, pg, lens):
        return rescore_candidates(q, jnp.int32(NQ), pg, lens, k=5)

    rescore_ms = scan_chain_ms(s2, (q_j, pages_j, lens_j), args.iters)
    log(f"[1m] stage2 exact rescore [C={C}, {NT}, {D}]: "
        f"{rescore_ms:.3f} ms/query (device)")

    # -- transfer estimate ----------------------------------------------------
    bytes_xfer = C * NT * D * 2  # bf16 candidates up to the device
    xfer_ms = bytes_xfer / 8e9 * 1e3  # conservative 8 GB/s host<->HBM
    total_ms = stage1_ms + gather_ms + xfer_ms + rescore_ms
    total_warm_ms = stage1_ms + gather_warm_ms + xfer_ms + rescore_ms
    log(f"[1m] transfer estimate: {bytes_xfer/1e6:.1f} MB @8 GB/s = "
        f"{xfer_ms:.2f} ms")
    log(f"[1m] END-TO-END p50 ESTIMATE @ {args.n_pool} pages: "
        f"{total_ms:.2f} ms cold / {total_warm_ms:.2f} ms warm "
        f"(target < 10 ms)")

    rec = {
        "backend": backend,
        "n_pool_pages": args.n_pool,
        "n_real_pages": args.n_real,
        "candidates": C,
        "stage1_device_ms": round(stage1_ms, 4),
        "gather_host_ms": round(gather_ms, 4),
        "gather_warm_ms": round(gather_warm_ms, 4),
        "transfer_est_ms": round(xfer_ms, 4),
        "rescore_device_ms": round(rescore_ms, 4),
        "end_to_end_ms": round(total_ms, 4),
        "end_to_end_warm_ms": round(total_warm_ms, 4),
        "hbm_stage1_mb": round(hbm_bytes / 1e6, 1),
        "note": ("stage1 at full N on chip; gather pool holds n_real "
                 "genuine pages (memmap row reads touch only C rows, so "
                 "the cost is N-independent; the 1M-row originals exceed "
                 "this host's disk); transfer estimated at 8 GB/s - the "
                 "remote-TPU tunnel RT is not representative of PCIe"),
    }
    if backend == "tpu" or args.smoke:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        if backend == "tpu":
            with open(args.out, "w") as f:
                json.dump(rec, f, indent=1)
            log(f"[1m] wrote {args.out}")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
