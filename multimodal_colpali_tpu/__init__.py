"""TPU-native multi-modal ColPali RAG framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
pkocbek/multi-modal_colpali biomedical RAG pipeline (reference mounted at
/root/reference):

- PDF page rasterization + image preprocessing as a host C++ stage feeding
  fused device preprocessing (replaces poppler/pdf2image + PIL hot path).
- ColPali-family vision-language encoders as JAX bf16 forward passes under
  pjit, emitting multi-vector page embeddings (replaces torch+flash-attn).
- A fused Pallas MaxSim late-interaction scorer with sharded top-k over ICI
  and a two-stage quantized-scan -> exact-rescore pipeline (replaces the
  Qdrant multivector MAX_SIM search on the hot path).
- The reference's public surface (``functions.py`` helpers, drivers 01-06,
  artifact formats) re-exposed on top of the TPU engine.

See SURVEY.md for the structural analysis of the reference and the build plan.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MMCP_JAX_PLATFORMS"):
    # This environment's sitecustomize force-registers a remote TPU backend
    # and overrides JAX_PLATFORMS; MMCP_JAX_PLATFORMS=cpu pins the framework
    # to a platform regardless (tests/CI use it to stay off the tunnel).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MMCP_JAX_PLATFORMS"])

if _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.environ.get(
        "MMCP_COMPILE_CACHE", "1") != "0":
    # Persistent compilation cache. This environment's sitecustomize
    # imports jax at interpreter startup, so env vars set from Python
    # (os.environ.setdefault in a script's main()) are read TOO LATE and
    # the cache silently stays disabled. Setting it through jax.config
    # works regardless of import order. Remote-TPU compiles are minutes
    # long here; the cache is what makes staged re-runs cheap.
    import jax as _jax_cc

    if _jax_cc.config.jax_compilation_cache_dir is None:
        _jax_cc.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.cache/jax_comp")))

if _os.environ.get("MMCP_FUSED_ATTENTION") in ("0", "1"):
    # Fused-attention Pallas kernel for the encoder hot path. Default is
    # auto (on for TPU backends - hardware parity validated by
    # scripts/tpu_validate.py); =1 forces on (CPU interpret testing),
    # =0 forces the einsum path.
    from multimodal_colpali_tpu.models import layers as _layers

    _layers.set_fused_attention(_os.environ["MMCP_FUSED_ATTENTION"] == "1")

if _os.environ.get("MMCP_FUSED_LAYER") in ("0", "1"):
    # Fused transformer-layer Pallas kernels (ops/fused_layer.py) for the
    # small-encoder hot path. Default auto (on for TPU when the layer shape
    # fits VMEM); =1 forces on (interpret mode off-TPU), =0 forces off.
    from multimodal_colpali_tpu.models import layers as _layers2

    _layers2.set_fused_layer(_os.environ["MMCP_FUSED_LAYER"] == "1")

if _os.environ.get("MMCP_FUSED_PARTS"):
    # Which fused sub-kernels the encoder layer uses ("both"/"attn"/"mlp",
    # for hardware A/B isolation). Read ONCE here; invalid values raise
    # instead of silently unfusing.
    from multimodal_colpali_tpu.models import layers as _layers3

    _layers3.set_fused_parts(_os.environ["MMCP_FUSED_PARTS"])

from multimodal_colpali_tpu.documents import Document  # noqa: F401
