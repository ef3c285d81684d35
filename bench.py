#!/usr/bin/env python
"""Headline benchmark: MaxSim retrieval p50 latency over a large page corpus.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

vs_baseline is measured against the driver-provided target of 10 ms p50
MaxSim top-k (BASELINE.md): vs_baseline = 10 / p50_ms, so > 1.0 beats the
target. Diagnostics (corpus size, exact-scan bandwidth, embed throughput)
go to stderr.

The benchmarked pipeline is the production two-stage path
(ops/two_stage.py): pooled-prefilter matvec over the whole corpus + exact
MaxSim rescore of the oversampled candidates - the same math Qdrant's
quantized scan + rescore performs for the reference (functions.py:897-903).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_colpali_tpu.ops.maxsim import (
        maxsim_scores_pallas, quantize_corpus_int8,
    )
    from multimodal_colpali_tpu.ops.two_stage import pool_corpus, two_stage_maxsim_topk

    backend = jax.default_backend()
    log(f"[bench] backend={backend} devices={jax.devices()}")

    NT, DIM, NQ, K, CAND = 1056, 128, 32, 5, 32
    # Size the corpus to the chip: int8 codes dominate at NT*DIM bytes/page.
    if backend == "tpu":
        candidates_p = (100_000, 75_000, 50_000)
    else:
        candidates_p = (2_000,)

    key = jax.random.PRNGKey(0)

    # Generate the synthetic corpus entirely on device inside one jit:
    # building it in host-visible chunks and concatenating would transiently
    # double the 13.5 GB int8 buffer and OOM a 16 GB chip.
    @functools.partial(jax.jit, static_argnames=("p", "chunk"))
    def gen_corpus(key, p, chunk):
        n_chunks = p // chunk

        def body(i, state):
            codes, scales, pooled = state
            sub = jax.random.normal(jax.random.fold_in(key, i),
                                    (chunk, NT, DIM), dtype=jnp.float32)
            sub = sub / jnp.linalg.norm(sub, axis=-1, keepdims=True)
            absmax = jnp.max(jnp.abs(sub), axis=-1)
            sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
            c = jnp.round(sub / sc[..., None]).astype(jnp.int8)
            pool = jnp.mean(sub, axis=1).astype(jnp.bfloat16)
            start = i * chunk
            codes = jax.lax.dynamic_update_slice(codes, c, (start, 0, 0))
            scales = jax.lax.dynamic_update_slice(
                scales, sc.astype(jnp.bfloat16), (start, 0))
            pooled = jax.lax.dynamic_update_slice(pooled, pool, (start, 0))
            return codes, scales, pooled

        codes = jnp.zeros((p, NT, DIM), jnp.int8)
        scales = jnp.zeros((p, NT), jnp.bfloat16)
        pooled = jnp.zeros((p, DIM), jnp.bfloat16)
        return jax.lax.fori_loop(0, n_chunks, body, (codes, scales, pooled))

    corpus = None
    for P in candidates_p:
        try:
            chunk = 2_000 if backend == "tpu" else 500
            d_int8, d_scale, pooled = gen_corpus(key, P, chunk)
            d_lens = jnp.full((P,), NT, jnp.int32)
            jax.block_until_ready(d_int8)
            corpus = (P, pooled, d_int8, d_scale, d_lens)
            break
        except Exception as e:  # noqa: BLE001 - OOM fallback to smaller corpus
            log(f"[bench] P={P} failed ({type(e).__name__}); trying smaller")
            continue
    if corpus is None:
        print(json.dumps({"metric": "maxsim_two_stage_p50_latency", "value": -1,
                          "unit": "ms", "vs_baseline": 0.0}))
        return
    P, pooled, d_int8, d_scale, d_lens = corpus
    log(f"[bench] corpus: {P} pages x {NT} tokens x {DIM} dims "
        f"(int8 codes {P*NT*DIM/1e9:.1f} GB)")

    q = jax.random.normal(jax.random.PRNGKey(7), (NQ, DIM), dtype=jnp.float32)
    q_len = jnp.int32(22)

    # Chain N queries inside one jit so the remote-dispatch overhead of this
    # environment (~40 ms/call through the tunnel) doesn't pollute the
    # device-side latency measurement.
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(q, q_len, pooled, d_int8, d_scale, d_lens, n):
        def body(carry, i):
            qq, acc = carry
            vals, idx = two_stage_maxsim_topk(
                qq, q_len, pooled, d_int8, d_scale, d_lens,
                k=K, n_candidates=CAND)
            qq = qq + (vals[0] * 0).astype(qq.dtype)  # serialize iterations
            return (qq, acc + vals[0]), idx
        (qq, acc), idxs = jax.lax.scan(body, (q, jnp.float32(0)),
                                       jnp.arange(n))
        return acc, idxs

    # Warm both compile caches.
    np.asarray(chain(q, q_len, pooled, d_int8, d_scale, d_lens, 1)[0])
    t0 = time.time()
    np.asarray(chain(q, q_len, pooled, d_int8, d_scale, d_lens, 1)[0])
    t1 = time.time()
    base = t1 - t0  # one query + dispatch/fetch overhead

    N = 101
    np.asarray(chain(q, q_len, pooled, d_int8, d_scale, d_lens, N)[0])
    t2 = time.time()
    acc, idxs = chain(q, q_len, pooled, d_int8, d_scale, d_lens, N)
    np.asarray(acc)
    t3 = time.time()
    per_query_ms = (t3 - t2 - base) / (N - 1) * 1e3
    per_query_ms = max(per_query_ms, 1e-3)
    log(f"[bench] two-stage p50 ~= {per_query_ms:.3f} ms/query over {P} pages "
        f"(overhead-corrected; raw n=1 incl dispatch: {base*1e3:.1f} ms)")

    # Diagnostic: exact bf16 kernel bandwidth on a slice.
    try:
        p_small = min(4096, P)
        d_small = (d_int8[:p_small].astype(jnp.bfloat16)
                   * d_scale[:p_small][..., None].astype(jnp.bfloat16))
        qq = q[None, ...].astype(jnp.bfloat16)
        np.asarray(maxsim_scores_pallas(qq, d_small, None, d_lens[:p_small]))
        reps = 10
        t4 = time.time()
        for _ in range(reps):
            out = maxsim_scores_pallas(qq, d_small, None, d_lens[:p_small])
        np.asarray(out)
        t5 = time.time()
        gb = p_small * NT * DIM * 2 / 1e9
        log(f"[bench] exact bf16 scan: {(t5-t4)/reps*1e3:.2f} ms / {p_small} pages "
            f"-> {gb*reps/(t5-t4):.0f} GB/s effective")
    except Exception as e:  # noqa: BLE001
        log(f"[bench] exact-scan diagnostic skipped: {e}")

    target_ms = 10.0
    print(json.dumps({
        "metric": f"maxsim_two_stage_p50_latency_{P}_pages",
        "value": round(per_query_ms, 4),
        "unit": "ms",
        "vs_baseline": round(target_ms / per_query_ms, 2),
    }))


if __name__ == "__main__":
    main()
