#!/usr/bin/env python
"""Serve generation from this framework's own TPU decode engine.

The reference boots its generation tier with Docker + vLLM
(reference 00_run_docker_containers.sh:26-39) and every driver then talks
OpenAI protocol to it. This CLI is the TPU-native equivalent of that
bootstrap: it loads a registry model (real checkpoint when
COLPALI_TPU_CKPT_DIR provides one, random weights otherwise), wraps it in
the KV-cache decode engine + continuous batcher, and serves
``/v1/chat/completions`` + ``/health`` - so drivers 02/05 can point their
``--base-url`` here instead of at a remote endpoint.

Example:
  python drivers/07_serve.py --model tiny-colpali --port 8006 --slots 4
"""

from __future__ import annotations

import argparse
import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Serve the TPU generation engine.")
    p.add_argument("--model", default="tiny-colpali",
                   help="Registry model name (its Gemma LM is served).")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8006)
    p.add_argument("--slots", type=int, default=4,
                   help="Continuous-batching slot count.")
    p.add_argument("--max-seq-len", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=8,
                   help="Decode tokens per scheduling point.")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--no-batcher", action="store_true",
                   help="Serve straight from the engine (one request at a time).")
    p.add_argument("--paged", action="store_true",
                   help="Use the paged-KV batcher (shared page pool + "
                        "preemption) instead of dense per-slot caches.")
    p.add_argument("--page-size", type=int, default=16,
                   help="Tokens per KV page (with --paged).")
    p.add_argument("--pool-pages", type=int, default=None,
                   help="Total pages in the shared pool (with --paged); "
                        "default sizes every slot to max-seq-len.")
    p.add_argument("--weight-dtype", default="native",
                   choices=["native", "int8", "int4"],
                   help="Weight-only quantization for the LM (vLLM's "
                        "--quantization role): int8 ~2x decode bandwidth, "
                        "gemma-3-12b fits one v5e chip; int4 (group-wise, "
                        "AWQ/GPTQ-style storage) halves it again - "
                        "gemma-3-27b, the reference's actual generator, "
                        "fits one chip.")
    p.add_argument("--vision-dtype", default="native",
                   choices=["native", "int8"],
                   help="SigLIP tower weights (gemma-3 multimodal only): "
                        "int8 (W8A8) frees ~0.4 GB of HBM - the headroom "
                        "a 27B int4 multimodal server needs on one v5e.")
    p.add_argument("--kv-dtype", default="native", choices=["native", "int8"],
                   help="KV pool storage (with --paged): int8 stores "
                        "absmax-quantized codes + per-token scales, ~halving "
                        "pool HBM (vLLM's kv_cache_dtype role).")
    p.add_argument("--prefix-caching", action="store_true",
                   help="Share identical full prompt pages between requests "
                        "(with --paged; vLLM's automatic prefix caching).")
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="Chunked prefill: text prompts longer than this "
                        "many tokens prefill in segments interleaved with "
                        "decode chunks (0 = off; vLLM's chunked prefill).")
    p.add_argument("--tiles", default="1x1", metavar="RxC",
                   help="Mllama static tile layout per image (e.g. 2x2 "
                        "gives document pages 4x the pixel budget; must "
                        "be one of the checkpoint's supported aspect "
                        "ratios).")
    p.add_argument("--cross-max-images", type=int, default=10, metavar="N",
                   help="Mllama: cross-KV pool rows per slot, in images "
                        "at the static tile layout. Default 10 matches the "
                        "reference's vLLM --limit_mm_per_prompt "
                        "(00_run_docker_old_models.sh); pool cost is "
                        "per-slot and bounded.")
    p.add_argument("--max-queue", type=int, default=0, metavar="N",
                   help="Bound the admission queue: submits past N fail "
                        "fast with HTTP 429 (0 = unbounded).")
    p.add_argument("--admission-timeout", type=float, default=0.0,
                   metavar="SECONDS",
                   help="Per-request admission deadline: a request queued "
                        "longer than this fails with HTTP 504 instead of "
                        "starving (0 = none).")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="Prompt-lookup speculative decoding: verify K "
                        "drafted tokens per slot per forward (greedy slots "
                        "accept; sampled slots advance one). Composes with "
                        "--paged (vLLM's ngram method over PagedAttention).")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax.numpy as jnp

    from multimodal_colpali_tpu.generation.engine import (
        ByteTokenizer, GemmaDecodeEngine, ModuloTokenizer)
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.models.registry import (
        GEMMA3_CONFIGS, load_retriever)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mm_engine = image_pre = None
    from multimodal_colpali_tpu.models.registry import (LLAMA_CONFIGS,
                                                        LLAVA_NEXT_CONFIGS,
                                                        MLLAMA_CONFIGS,
                                                        QWEN2VL_CONFIGS)

    if args.model in QWEN2VL_CONFIGS:
        # the reference's "old models" tier (vLLM containers,
        # 00_run_docker_old_models.sh:24-38): the FULL Qwen2-VL serves
        # first-party - text decodes through the batchers, image prompts
        # prefill through Qwen2VLMMEngine (the ColQwen2 retriever tower +
        # in-jit mrope positions)
        from multimodal_colpali_tpu.generation.engine import Qwen2DecodeEngine
        from multimodal_colpali_tpu.generation.qwen2vl_mm import (
            Qwen2VLImagePreprocessor, Qwen2VLMMEngine)
        from multimodal_colpali_tpu.models.registry import load_qwen2vl_mm

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg_mm, params, tok = load_qwen2vl_mm(args.model, dtype=dtype)
        engine = Qwen2DecodeEngine(cfg_mm.text, params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)
        if args.weight_dtype in ("int8", "int4"):
            # share the quantized embed/LM buffers with the mm engine
            params = {**params, "embed": engine.params["embed"],
                      "language_model": engine.params["language_model"]}
        mm_engine = Qwen2VLMMEngine(cfg_mm, params, dtype=dtype,
                                    vision_dtype=args.vision_dtype)
        image_pre = Qwen2VLImagePreprocessor(cfg_mm)
        if tok is None:
            vocab = cfg_mm.text.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)
    elif args.model in LLAVA_NEXT_CONFIGS:
        # the old-model tier's third VLM (vLLM serves
        # AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B,
        # 00_run_docker_old_models.sh:41-52) - FULL multimodal: the
        # Llama-3 LM decodes through the batchers, image prompts prefill
        # through LlavaNextMMEngine (CLIP ViT-L/14-336 tower + projector
        # + anyres packing)
        from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
        from multimodal_colpali_tpu.generation.llava_next_mm import (
            LlavaNextImagePreprocessor, LlavaNextMMEngine)
        from multimodal_colpali_tpu.models.registry import load_llava_next_mm

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg_mm, params, tok = load_llava_next_mm(
                args.model, dtype=dtype, weight_dtype=args.weight_dtype)
        engine = LlamaDecodeEngine(cfg_mm.text, params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)
        if args.weight_dtype in ("int8", "int4"):
            # share the quantized embed/LM buffers with the mm engine
            params = {**params, "embed": engine.params["embed"],
                      "language_model": engine.params["language_model"]}
        mm_engine = LlavaNextMMEngine(cfg_mm, params, dtype=dtype,
                                      vision_dtype=args.vision_dtype)
        image_pre = LlavaNextImagePreprocessor(cfg_mm)
        if tok is None:
            vocab = cfg_mm.text.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)
    elif args.model in MLLAMA_CONFIGS:
        # the old-model tier's first VLM (vLLM serves
        # AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct,
        # 00_run_docker_old_models.sh:8-22). Text decodes through the
        # batchers (the renumbered self-attention stack IS a plain
        # Llama); image prompts decode with per-step cross-attention -
        # the dense ContinuousBatcher carries per-slot cross-KV pools
        # for that, while --paged/--speculative fall back to the
        # server's bare mm path for images (see bat_mm below).
        from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
        from multimodal_colpali_tpu.generation.mllama_mm import (
            MllamaImagePreprocessor, MllamaMMEngine)
        from multimodal_colpali_tpu.models.registry import load_mllama_mm

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg_mm, params, tok = load_mllama_mm(
                args.model, dtype=dtype, weight_dtype=args.weight_dtype)
        engine = LlamaDecodeEngine(cfg_mm.text, params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)
        if args.weight_dtype in ("int8", "int4"):
            # share the quantized embed/LM buffers with the mm engine
            params = {**params, "embed": engine.params["embed"],
                      "language_model": engine.params["language_model"]}
        tiles = tuple(int(x) for x in args.tiles.lower().split("x"))
        mm_engine = MllamaMMEngine(cfg_mm, params, dtype=dtype,
                                   vision_dtype=args.vision_dtype,
                                   tiles=tiles)
        image_pre = MllamaImagePreprocessor(cfg_mm, tiles=tiles)
        if tok is None:
            vocab = cfg_mm.text.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)
    elif args.model in LLAMA_CONFIGS:
        # a bare Llama LM (LLaVA-NeXT's decoder without the vision tower)
        from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
        from multimodal_colpali_tpu.models.registry import load_llama_lm

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg, params, tok = load_llama_lm(args.model, dtype=dtype)
        engine = LlamaDecodeEngine(cfg, params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)
        if tok is None:
            vocab = cfg.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)
    elif args.model in GEMMA3_CONFIGS:
        # the reference's actual generator class (Gemma-3; vLLM serves
        # google/gemma-3-27b-it over image-context MCQ prompts,
        # 00_run_docker_containers.sh:26-39) - FULL multimodal: the LM
        # decodes through the batchers, image prompts prefill through
        # Gemma3MMEngine (SigLIP tower + avg-pool projector + per-image
        # bidirectional spans)
        from multimodal_colpali_tpu.generation.gemma3_mm import Gemma3MMEngine
        from multimodal_colpali_tpu.models.processing import ImagePreprocessor
        from multimodal_colpali_tpu.models.registry import load_gemma3_mm

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg_mm, params, tok = load_gemma3_mm(
                args.model, dtype=dtype, weight_dtype=args.weight_dtype)
        engine = GemmaDecodeEngine(cfg_mm.text, params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)
        if args.weight_dtype in ("int8", "int4"):
            # share the quantized embed/LM buffers with the mm engine
            # (its GemmaDecodeEngine detects the pre-quantized subtrees)
            params = {**params, "embed": engine.params["embed"],
                      "language_model": engine.params["language_model"]}
        mm_engine = Gemma3MMEngine(cfg_mm, params, dtype=dtype,
                                   vision_dtype=args.vision_dtype)
        image_pre = ImagePreprocessor(cfg_mm.vision.image_size)
        if tok is None:
            vocab = cfg_mm.text.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)
    else:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # random-init warning, no ckpt
            retriever = load_retriever(args.model)
        if retriever.family != "colpali":
            raise SystemExit(
                "serving supports the Gemma-LM (colpali) family, the "
                f"gemma3 LMs ({sorted(GEMMA3_CONFIGS)}), the qwen2-vl "
                f"LMs ({sorted(QWEN2VL_CONFIGS)}) and the llava-next "
                f"VLMs ({sorted(LLAVA_NEXT_CONFIGS)}); {args.model!r} is "
                f"{retriever.family!r}")
        cfg = retriever.model.cfg
        engine = GemmaDecodeEngine(cfg.text, retriever.params, dtype=dtype,
                                   weight_dtype=args.weight_dtype)

        tok = getattr(retriever.processor, "tokenizer", None)
        if tok is None or not hasattr(tok, "decode"):
            # fallback for random-weight serving: ids must fit the model
            # vocab (ByteTokenizer's ids span 0..258)
            vocab = cfg.text.vocab_size
            tok = ByteTokenizer() if vocab >= 259 else ModuloTokenizer(vocab)

        # image-conditioned generation on the same weights (PaliGemma prefix)
        if hasattr(retriever.processor, "image_preprocessor"):
            from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine

            rp = retriever.params
            if args.weight_dtype in ("int8", "int4"):
                rp = {**rp, "embed": engine.params["embed"],
                      "language_model": engine.params["language_model"]}
            mm_engine = PaliGemmaEngine(cfg, rp, dtype=dtype)
            image_pre = retriever.processor.image_preprocessor

    backend = engine
    batcher = None
    if not args.no_batcher:
        # cross-attention decode engines (Mllama) ride EVERY batcher
        # tier: dense/paged carry per-slot cross-KV pools in their
        # decode scans, the speculative tiers inject the same hooks
        # into their verify forwards
        kw = dict(batch_slots=args.slots, max_seq_len=args.max_seq_len,
                  chunk=args.chunk, eos_id=getattr(tok, "eos_id", -1),
                  mm_engine=mm_engine, prefill_chunk=args.prefill_chunk,
                  max_queue=args.max_queue,
                  admission_timeout=args.admission_timeout)
        if getattr(mm_engine, "cross_decode", False):
            kw["cross_max_images"] = args.cross_max_images
        if args.paged:
            if args.speculative:
                from multimodal_colpali_tpu.generation.speculative import (
                    SpeculativePagedContinuousBatcher as PagedCls)

                kw["spec_k"] = args.speculative
            else:
                from multimodal_colpali_tpu.generation.paged import (
                    PagedContinuousBatcher as PagedCls)
            batcher = PagedCls(
                engine, page_size=args.page_size,
                pool_pages=args.pool_pages, kv_dtype=args.kv_dtype,
                prefix_caching=args.prefix_caching,
                **kw).serve()
        elif args.speculative:
            from multimodal_colpali_tpu.generation.speculative import (
                SpeculativeContinuousBatcher)

            batcher = SpeculativeContinuousBatcher(
                engine, spec_k=args.speculative, **kw).serve()
        else:
            batcher = ContinuousBatcher(engine, **kw).serve()
        backend = batcher

    srv = GenerationServer(backend, tok, model_name=args.model,
                           host=args.host, port=args.port,
                           max_new_tokens=args.max_new_tokens,
                           mm_engine=mm_engine,
                           image_preprocessor=image_pre).start()
    print(f"[serve] {args.model} on {srv.base_url} "
          f"(slots={0 if args.no_batcher else args.slots})", flush=True)
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        if batcher is not None:
            batcher.shutdown()


if __name__ == "__main__":
    main()
