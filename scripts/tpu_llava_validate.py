"""TPU validation: LLaVA-NeXT-Llama3-8B (the old-model tier's third VLM)
serves on ONE v5e chip.

The reference serves AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B through a vLLM
GPU container (/root/reference/00_run_docker_old_models.sh:41-52). Unlike
Mllama, LLaVA-NeXT merges its image features INTO the prompt (1176 image
tokens at the static square anyres layout), so image requests ride the
normal batcher mm path - prefill through the CLIP tower, decode fully
modality-agnostic.

    python scripts/tpu_llava_validate.py text   # 8B int8 text decode
    python scripts/tpu_llava_validate.py mm     # + one image request

Methodology matches scripts/tpu_mllama_validate.py (dense batcher wall
time over drained tokens; admission timed separately).
"""

import argparse
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp")

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["text", "mm"])
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--max-seq-len", type=int, default=1536)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--model", default="llava-next-llama3-8b")
    args = ap.parse_args()

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.generation.llava_next_mm import (
        LlavaNextMMEngine)
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.models.registry import load_llava_next_mm

    print(f"[llava-tpu] backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg, params, _ = load_llava_next_mm(args.model, weight_dtype="int8")
    _ = np.asarray(params["embed"]["embed_tokens"]["scale"][:4])
    print(f"[llava-tpu] int8 leaf-streamed init: {time.time() - t0:.1f} s",
          flush=True)

    eng = LlamaDecodeEngine(cfg.text, params, dtype=jnp.bfloat16)
    mm = None
    if args.stage == "mm":
        mm = LlavaNextMMEngine(cfg, params, dtype=jnp.bfloat16,
                               vision_dtype="int8")
    bat = ContinuousBatcher(eng, batch_slots=args.slots,
                            max_seq_len=args.max_seq_len, chunk=args.chunk,
                            mm_engine=mm)

    rng = np.random.default_rng(0)
    def prompt(n):
        return [int(x) for x in rng.integers(2, 32000, size=n)]

    sz = cfg.vision.image_size
    pix = (rng.standard_normal((sz, sz, 3)).astype(np.float32)
           if mm is not None else None)

    def submit_all(new):
        futs = [bat.submit(prompt(12), max_new_tokens=new)
                for _ in range(args.slots - (1 if mm is not None else 0))]
        if mm is not None:
            futs.append(bat.submit(
                mm.build_mm_prompt(prompt(12)),
                max_new_tokens=new, pixel_values=pix))
        return futs

    t0 = time.time()
    futs = submit_all(args.chunk)
    bat.drain()
    for f in futs:
        f.result(60)
    print(f"[llava-tpu] warmup (compiles): {time.time() - t0:.1f} s",
          flush=True)

    futs = submit_all(args.new)
    t0 = time.time()
    while not bat._queue.empty():
        bat._admit()
    t_admit = time.time() - t0
    t0 = time.time()
    bat.drain()
    dt = time.time() - t0
    total = sum(len(f.result(60)) for f in futs) - args.slots  # tok0s
    label = "text+1img" if mm is not None else "text"
    print(f"[llava-tpu] {label}: admission {t_admit:.2f} s"
          + (" (incl. the 1176-token anyres prefill through the int8 "
             "CLIP tower)" if mm is not None else "")
          + f"; decode {total} tokens in {dt:.2f} s = "
          f"{total / dt:.1f} tok/s (8B int8, {args.slots} slots, "
          f"chunk {args.chunk}, dense batcher)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
