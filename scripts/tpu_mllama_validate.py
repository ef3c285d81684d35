"""TPU validation: Llama-3.2-11B-Vision (Mllama) serves on ONE v5e chip.

The reference serves AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct through
a vLLM GPU container (/root/reference/00_run_docker_old_models.sh:8-22);
this measures the first-party path at the real size: leaf-streamed int8
random init (the bf16 tree, ~22.8 GB, cannot exist on the 16 GB chip),
text decode through the dense ContinuousBatcher, and an image request
decoding next to text with per-slot cross-KV pools.

Stages (run each as a separate FOREGROUND call through the tunnel; the
persistent compile cache makes re-runs cheap):

    python scripts/tpu_mllama_validate.py text   # init + text decode tok/s
    python scripts/tpu_mllama_validate.py mm     # + one image request mixed in

Timing: the batcher's drain loop syncs tokens off-device every chunk, so
host wall time over the drained tokens is the serving-rate measurement
(the same methodology as the gemma-3 single-chip records in BASELINE.md).
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
    ap.add_argument("--max-seq-len", type=int, default=256)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--model", default="llama-3.2-11b-vision")
    args = ap.parse_args()

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.models.registry import load_mllama_mm

    print(f"[mllama-tpu] backend={jax.default_backend()} "
          f"devices={jax.devices()}", flush=True)
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg, params, _ = load_mllama_mm(args.model, weight_dtype="int8")
    # force materialization of one large leaf (block_until_ready does not
    # sync through the tunnel; a host fetch does)
    _ = np.asarray(params["embed"]["embed_tokens"]["scale"][:4])
    print(f"[mllama-tpu] int8 leaf-streamed init: {time.time() - t0:.1f} s "
          f"({cfg.total_layers}-layer stack, vocab {cfg.text.vocab_size})",
          flush=True)

    eng = LlamaDecodeEngine(cfg.text, params, dtype=jnp.bfloat16)
    mm = None
    if args.stage == "mm":
        from multimodal_colpali_tpu.generation.mllama_mm import MllamaMMEngine

        # int8 vision tower (W8A8): the bf16 ViT-H tree costs ~1.3 GB the
        # 11B budget does not have - the same headroom trick the
        # gemma-3-27b single-chip record uses for its SigLIP tower
        mm = MllamaMMEngine(cfg, params, dtype=jnp.bfloat16,
                            vision_dtype="int8")
    bat = ContinuousBatcher(eng, batch_slots=args.slots,
                            max_seq_len=args.max_seq_len, chunk=args.chunk,
                            mm_engine=mm)

    rng = np.random.default_rng(0)
    def prompt(n):
        return [int(x) for x in rng.integers(2, 32000, size=n)]

    v = cfg.vision
    pix = None
    if mm is not None:
        pix = np.zeros((v.max_num_tiles, v.image_size, v.image_size, 3),
                       np.float32)
        pix[0] = rng.standard_normal(
            (v.image_size, v.image_size, 3)).astype(np.float32)

    # warm: compile prefill (+ mm prefill incl. the ViT-H tower) + decode
    t0 = time.time()
    futs = [bat.submit(prompt(12), max_new_tokens=args.chunk)
            for _ in range(args.slots - (1 if mm is not None else 0))]
    if mm is not None:
        futs.append(bat.submit(
            mm.build_mm_prompt(prompt(12), bos_id=1),
            max_new_tokens=args.chunk, pixel_values=pix))
    bat.drain()
    for f in futs:
        f.result(60)
    print(f"[mllama-tpu] warmup (compiles): {time.time() - t0:.1f} s",
          flush=True)

    # measure: admission (prefill - for the mm stage that includes the
    # ViT-H tower over the 4-tile sequence) separately from decode
    futs = [bat.submit(prompt(12), max_new_tokens=args.new)
            for _ in range(args.slots - (1 if mm is not None else 0))]
    if mm is not None:
        futs.append(bat.submit(
            mm.build_mm_prompt(prompt(12), bos_id=1),
            max_new_tokens=args.new, pixel_values=pix))
    t0 = time.time()
    while not bat._queue.empty():
        bat._admit()
    t_admit = time.time() - t0
    t0 = time.time()
    bat.drain()
    dt = time.time() - t0
    total = sum(len(f.result(60)) for f in futs) - args.slots  # tok0s
    label = "text+1img" if mm is not None else "text"
    print(f"[mllama-tpu] {label}: admission {t_admit:.2f} s"
          + (" (incl. image prefill through the int8 ViT-H tower)"
             if mm is not None else "")
          + f"; decode {total} tokens in {dt:.2f} s = "
          f"{total / dt:.1f} tok/s (11B int8, {args.slots} slots, "
          f"chunk {args.chunk}, dense batcher"
          + (", cross-KV pools" if mm is not None else "") + ")",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
