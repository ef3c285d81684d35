"""Retriever registry: ``load_retriever(name)`` -> (model, processor).

Keeps the surface of the reference's ``load_retriever``
(01_create_context_qdrant.py:163-205, 05_experiment02.py:331-372) - a
registry keyed by checkpoint name returning an encoder + processor pair -
with a JAX engine underneath.

Checkpoint resolution: if a local directory with the model's safetensors
exists (``$COLPALI_TPU_CKPT_DIR/<name>`` or an explicit path), weights are
ported via hf_import; otherwise the model initializes randomly (useful for
benchmarks and air-gapped runs; a warning is printed once).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.processing import ColPaliProcessor


@dataclasses.dataclass
class Retriever:
    """A late-interaction encoder bound to params, ready to embed.

    ``family`` selects the forward signature: "colpali" models take
    (ids, mask, pixels); "colqwen2" models additionally take mrope
    position_ids, which their processor emits in every batch.
    """

    name: str
    model: Any
    params: Any
    processor: Any
    dtype: Any = jnp.bfloat16
    mesh: Optional[Mesh] = None
    family: str = "colpali"
    quantize: Optional[str] = None   # "int8" -> W8A8 projection matmuls
    device_preprocess: bool = False  # uint8 upload + on-device normalize

    def __post_init__(self):
        if self.device_preprocess:
            import inspect

            sig = inspect.signature(self.processor.process_images)
            if "device_preprocess" not in sig.parameters:
                raise ValueError(
                    f"device_preprocess is not supported by "
                    f"{type(self.processor).__name__} (fixed-resolution "
                    f"ColPali-family processors only)")
            if getattr(self.processor, "dynamic_resolution", False):
                raise ValueError(
                    "device_preprocess requires the fixed square layout; "
                    "disable dynamic_resolution/image splitting")
        self._jit_cache: Dict[Any, Callable] = {}
        import ml_dtypes

        np_dtype = ml_dtypes.bfloat16 if self.dtype == jnp.bfloat16 else np.float32

        def cast_and_put(p):
            # Already device-resident in the serving dtype (device_random_params):
            # round-tripping through the host would re-pay the full transfer.
            if self.mesh is None and isinstance(p, jax.Array) \
                    and p.dtype == jnp.dtype(self.dtype):
                return p
            # Cast on the host first: a 3B model must never exist in fp32 in
            # HBM (fp32 params + bf16 copy would exceed a v5e chip's 16 GB).
            host = np.asarray(p).astype(np_dtype)
            if self.mesh is not None:
                return jax.device_put(host, NamedSharding(self.mesh, P()))
            return jnp.asarray(host)

        self.params = jax.tree.map(cast_and_put, self.params)
        if self.quantize is not None:
            if self.quantize != "int8":
                raise ValueError(
                    f"unknown quantize mode {self.quantize!r}; only 'int8'")
            from multimodal_colpali_tpu.ops.quant import quantize_encoder_params

            # One on-device program: the bf16 tree never bounces to host
            # and is freed once the int8 tree replaces it (transiently both
            # trees are resident - bf16 + int8 of the 3B fits a v5e chip).
            self.params = jax.jit(quantize_encoder_params)(self.params)

    def _apply(self, with_image: bool, grid=None) -> Callable:
        key = (with_image, grid)
        if key not in self._jit_cache:
            if self.family == "colqwen2":
                def fn(params, input_ids, attention_mask, position_ids,
                       pixel_values=None):
                    return self.model.apply(
                        {"params": params}, input_ids, attention_mask,
                        position_ids, pixel_values, grid=grid,
                    )
                n_data = 3 + int(with_image)
                mrope = True
            elif self.family in ("colgranite", "colidefics3") and grid is not None:
                def fn(params, input_ids, attention_mask, pixel_values=None):
                    return self.model.apply(
                        {"params": params}, input_ids, attention_mask,
                        pixel_values, tiles=grid,
                    )
                n_data = 2 + int(with_image)
                mrope = False
            else:
                def fn(params, input_ids, attention_mask, pixel_values=None):
                    pixel_values = self._maybe_device_norm(pixel_values)
                    return self.model.apply(
                        {"params": params}, input_ids, attention_mask, pixel_values
                    )
                n_data = 2 + int(with_image)
                mrope = False
            in_shardings = None
            if self.mesh is not None:
                rep = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                shards = [rep] + [data] * n_data
                if mrope:
                    # position_ids are [3, B, S]: batch axis is dim 1.
                    shards[3] = NamedSharding(self.mesh, P(None, "data"))
                in_shardings = tuple(shards)
            self._jit_cache[key] = jax.jit(
                fn, in_shardings=in_shardings
            ) if in_shardings else jax.jit(fn)
        return self._jit_cache[key]

    def _maybe_device_norm(self, pixel_values):
        """uint8 pixels -> normalized compute-dtype pixels, inside the
        forward jit (ops/preprocess.normalize_images: fused Pallas
        rescale+normalize on TPU). Non-uint8 inputs pass through - the
        host-preprocessed path is unchanged."""
        if pixel_values is None or pixel_values.dtype != jnp.uint8:
            return pixel_values
        from multimodal_colpali_tpu.ops.preprocess import (
            normalize_images, normalize_images_reference)

        pre = self.processor.image_preprocessor
        mean, std = (float(pre.mean),) * 3, (float(pre.std),) * 3
        if jax.default_backend() == "tpu":
            pix = normalize_images(pixel_values, mean, std)
        else:
            pix = normalize_images_reference(pixel_values, mean, std)
        return pix.astype(self.dtype)

    def _batch_args(self, batch: Dict[str, Any], with_image: bool):
        args = [jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"])]
        if self.family == "colqwen2":
            args.append(jnp.asarray(batch["position_ids"]))
        if with_image:
            pv = np.asarray(batch["pixel_values"])
            args.append(jnp.asarray(pv) if pv.dtype == np.uint8
                        else jnp.asarray(pv, self.dtype))
        return args

    def _pad_batch(self, n: int) -> int:
        """Round batch up so it divides the data axis (DP sharding)."""
        if self.mesh is None:
            return n
        d = self.mesh.shape.get("data", 1)
        return ((n + d - 1) // d) * d

    def embed_images(self, images: Sequence[Any], batch_size: int = 32) -> List[np.ndarray]:
        """Embed page images -> list of [n_tokens, dim] float32 arrays.

        Under a dynamic-resolution processor (ColQwen smart grids) images
        are grouped by grid first; each grid gets its own jit cache entry,
        so recompiles are bounded by the number of distinct grids."""
        if getattr(self.processor, "dynamic_resolution", False):
            return self._embed_images_grouped(images, batch_size)
        out: List[np.ndarray] = []
        for start in range(0, len(images), batch_size):
            chunk = list(images[start: start + batch_size])
            n = len(chunk)
            n_pad = self._pad_batch(max(n, 1))
            while len(chunk) < n_pad:
                chunk.append(chunk[-1])
            batch = (self.processor.process_images(chunk, device_preprocess=True)
                     if self.device_preprocess
                     else self.processor.process_images(chunk))
            emb = self._apply(True)(self.params, *self._batch_args(batch, True))
            emb = np.asarray(emb, np.float32)
            mask = batch["attention_mask"]
            for i in range(n):
                out.append(emb[i][mask[i] == 1])
        return out

    def _embed_images_grouped(self, images: Sequence[Any],
                              batch_size: int) -> List[np.ndarray]:
        out: List[Optional[np.ndarray]] = [None] * len(images)
        for grid, idxs in self.processor.group_by_grid(images):
            for start in range(0, len(idxs), batch_size):
                sel = idxs[start: start + batch_size]
                chunk = [images[i] for i in sel]
                n = len(chunk)
                n_pad = self._pad_batch(max(n, 1))
                while len(chunk) < n_pad:
                    chunk.append(chunk[-1])
                batch = self.processor.process_images(chunk, grid=grid)
                emb = self._apply(True, grid)(
                    self.params, *self._batch_args(batch, True))
                emb = np.asarray(emb, np.float32)
                mask = batch["attention_mask"]
                for j, i in enumerate(sel):
                    out[i] = emb[j][mask[j] == 1]
        return list(out)  # original order

    def embed_queries(self, queries: Sequence[str], batch_size: int = 64) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        for start in range(0, len(queries), batch_size):
            chunk = list(queries[start: start + batch_size])
            n = len(chunk)
            n_pad = self._pad_batch(max(n, 1))
            while len(chunk) < n_pad:
                chunk.append(chunk[-1])
            batch = self.processor.process_queries(chunk)
            emb = self._apply(False)(self.params, *self._batch_args(batch, False))
            emb = np.asarray(emb, np.float32)
            mask = batch["attention_mask"]
            for i in range(n):
                out.append(emb[i][mask[i] == 1])
        return out

    # torch-flavored compat: model(**processor.process_images(imgs)) shape.
    def __call__(self, input_ids=None, attention_mask=None, pixel_values=None,
                 position_ids=None, **_):
        batch = {"input_ids": input_ids, "attention_mask": attention_mask,
                 "pixel_values": pixel_values, "position_ids": position_ids}
        with_image = pixel_values is not None
        emb = self._apply(with_image)(self.params, *self._batch_args(batch, with_image))
        return _RetrieverOutput(embeddings=emb)


@dataclasses.dataclass
class _RetrieverOutput:
    embeddings: jax.Array


def _example_inputs(family: str, cfg) -> tuple:
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    if family == "colqwen2":
        pos = jnp.zeros((3, 1, 8), jnp.int32)
        pix = jnp.zeros((1, cfg.grid_h * cfg.grid_w, cfg.vision.patch_dim),
                        jnp.float32)
        return (ids, mask, pos, pix)
    if family == "colflor":
        pix = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        return (ids, mask, pix)
    pix = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                    jnp.float32)
    return (ids, mask, pix)


def fast_random_params(model, cfg, seed: int = 0, family: str = "colpali"):
    """Random parameters via eval_shape + direct NumPy fill.

    Real flax init of a 3B model on this host's single CPU core takes tens of
    minutes; for random-weight runs (benchmarks, air-gapped e2e) the exact
    init distribution is irrelevant, so fill N(0, fan_in^-0.5) directly.

    Norm-weight convention differs per family: Gemma RMSNorm is (1+w) -> w=0;
    Qwen2 RMSNorm and LayerNorms are plain-multiply -> w=1.
    """
    args = _example_inputs(family, cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args)
    )["params"]
    rng = np.random.default_rng(seed)
    # Gemma-style (1+w) RMSNorms exist only in the colpali family.
    gemma_rms_parents = {"input_layernorm", "post_attention_layernorm", "norm"}

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        parent = getattr(path[-2], "key", "") if len(path) > 1 else ""
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name == "weight":
            if family == "colpali" and parent in gemma_rms_parents:
                return np.zeros(s.shape, np.float32)  # (1+w) -> w=0
            return np.ones(s.shape, np.float32)       # plain norms -> 1
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return rng.standard_normal(s.shape, dtype=np.float32) * float(fan_in) ** -0.5

    return jax.tree_util.tree_map_with_path(fill, shapes)


def device_random_params(model, cfg, seed: int = 0, family: str = "colpali",
                         dtype: Any = jnp.bfloat16):
    """``fast_random_params`` materialized ON the accelerator.

    Shapes come from eval_shape (host, cheap); the values are generated by
    ONE jitted program on the device, so only the program - not ~6 GB of
    host-generated weights - crosses the host->device link. Through this
    environment's network TPU tunnel, host init + device_put of a 3B tree
    takes ~10 minutes; this takes seconds. Values differ from
    ``fast_random_params`` (different RNG), which is irrelevant for the
    random-weight runs (benchmarks, air-gapped e2e) both serve.
    """
    args = _example_inputs(family, cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args)
    )["params"]
    gemma_rms_parents = {"input_layernorm", "post_attention_layernorm", "norm"}
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def build(key):
        out = []
        for i, (path, s) in enumerate(flat):
            name = getattr(path[-1], "key", str(path[-1]))
            parent = getattr(path[-2], "key", "") if len(path) > 1 else ""
            if name == "bias":
                out.append(jnp.zeros(s.shape, dtype))
            elif name == "weight":
                if family == "colpali" and parent in gemma_rms_parents:
                    out.append(jnp.zeros(s.shape, dtype))  # (1+w) -> w=0
                else:
                    out.append(jnp.ones(s.shape, dtype))   # plain norms -> 1
            else:
                fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
                k = jax.random.fold_in(key, i)
                out.append((jax.random.normal(k, s.shape, jnp.float32)
                            * float(fan_in) ** -0.5).astype(dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(build)(jax.random.PRNGKey(seed))


# name -> (family, config factory)
RETRIEVER_CONFIGS: Dict[str, tuple] = {
    "vidore/colpali-v1.2": ("colpali", ColPaliModelConfig.colpali_v1_3),
    "vidore/colpali-v1.3": ("colpali", ColPaliModelConfig.colpali_v1_3),
    "vidore/colpali-v1.3-hf": ("colpali", ColPaliModelConfig.colpali_v1_3),
    "vidore/colpali-v1.3-merged": ("colpali", ColPaliModelConfig.colpali_v1_3),
    "tiny-colpali": ("colpali", ColPaliModelConfig.tiny),
}


def _register_qwen():
    from multimodal_colpali_tpu.models.qwen2vl import ColQwen2ModelConfig as QCfg

    RETRIEVER_CONFIGS.update({
        "vidore/colqwen2-v1.0": ("colqwen2", QCfg.colqwen2_v1),
        "vidore/colqwen2.5-v0.2": ("colqwen2", QCfg.colqwen2_5_v0_2),
        "tiny-colqwen2": ("colqwen2", QCfg.tiny),
        "tiny-colqwen2.5": ("colqwen2", QCfg.tiny_25),
    })


def _register_colflor():
    from multimodal_colpali_tpu.models.florence2 import ColFlorModelConfig as FCfg

    RETRIEVER_CONFIGS.update({
        "ahmed-masry/ColFlor": ("colflor", FCfg.colflor),
        "tiny-colflor": ("colflor", FCfg.tiny),
    })


def _register_colidefics3():
    from multimodal_colpali_tpu.models.idefics3 import ColIdefics3ModelConfig as ICfg

    RETRIEVER_CONFIGS.update({
        "vidore/colSmol-256M": ("colidefics3", ICfg.colsmol_256m),
        "vidore/colidefics3-v1.0": ("colidefics3", ICfg.colsmol_256m),
        "tiny-colidefics3": ("colidefics3", ICfg.tiny),
    })


def _register_colgranite():
    from multimodal_colpali_tpu.models.granite import ColGraniteModelConfig as GCfg

    RETRIEVER_CONFIGS.update({
        "ibm-granite/granite-vision-3.3-2b-embedding": ("colgranite", GCfg.granite_vision_3),
        "tiny-colgranite": ("colgranite", GCfg.tiny),
    })


_register_qwen()
_register_colflor()
_register_colidefics3()
_register_colgranite()


def _load_tokenizer_from(ckpt_dir: str) -> Optional[Any]:
    """Load the checkpoint's tokenizer (tokenizer.json via transformers)."""
    try:
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(ckpt_dir)
    except Exception:  # noqa: BLE001 - missing files/offline: fall back
        return None

    class _Wrapped:
        """Adds the special-id attributes the processors expect; decode is
        part of the surface so the generation server can serve real
        checkpoints with their own vocabulary."""

        def __init__(self, t):
            self._t = t
            self.pad_id = t.pad_token_id if t.pad_token_id is not None else 0
            self.bos_id = t.bos_token_id if t.bos_token_id is not None else 2
            self.eos_id = t.eos_token_id if t.eos_token_id is not None else 1
            self.vocab_size = getattr(t, "vocab_size", None)

        def encode(self, text, add_special_tokens=False):
            return self._t.encode(text, add_special_tokens=add_special_tokens)

        def decode(self, ids):
            return self._t.decode(ids, skip_special_tokens=True)

    return _Wrapped(tok)


def _find_checkpoint(name: str, checkpoint_dir: Optional[str]) -> Optional[str]:
    candidates = []
    if checkpoint_dir:
        candidates.append(checkpoint_dir)
    env = os.environ.get("COLPALI_TPU_CKPT_DIR")
    if env:
        candidates.append(os.path.join(env, name.replace("/", "--")))
        candidates.append(os.path.join(env, os.path.basename(name)))
    for c in candidates:
        if c and os.path.isdir(c) and any(
            f.endswith((".safetensors", ".bin")) for f in os.listdir(c)
        ):
            return c
    return None


def load_retriever(
    name: str,
    device: Optional[str] = None,  # accepted for surface parity; unused (jax placement)
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    tokenizer: Optional[Any] = None,
    dtype: Any = jnp.bfloat16,
    seed: int = 0,
    dynamic_resolution: bool = False,
    device_init: Optional[bool] = None,
    quantize: Optional[str] = None,
    device_preprocess: Optional[bool] = None,
) -> Retriever:
    """Load a late-interaction retriever by name (reference surface).

    ``device_init=True`` (or env MMCP_DEVICE_INIT=1) materializes random
    weights on the accelerator (``device_random_params``) instead of the
    host - the only practical way to stand up the 3B flagship through a
    slow host->device link.

    ``dynamic_resolution=True`` enables the family's faithful resolution
    layout (ColQwen smart-resize grids, granite anyres tiles, idefics3
    image splitting); batches are then grouped per layout by the embed
    paths. Families with one fixed layout (ColPali) ignore the flag.

    ``quantize="int8"`` (or env MMCP_QUANTIZE=int8) runs every projection
    /MLP matmul as int8 x int8 -> int32 on the MXU (2x the bf16 compute
    rate on v5e) with dynamic per-token activation scales - the embed
    -throughput analog of vLLM's W8A8 serving quantization. Opt-in:
    embeddings deviate from the bf16 forward by quantization noise
    (ranking stability is tested, exact parity is not preserved)."""
    if name not in RETRIEVER_CONFIGS:
        raise KeyError(
            f"unknown retriever {name!r}; known: {sorted(RETRIEVER_CONFIGS)}"
        )
    family, cfg_factory = RETRIEVER_CONFIGS[name]
    cfg = cfg_factory()
    if family == "colqwen2":
        from multimodal_colpali_tpu.models.processing_qwen2vl import ColQwen2Processor
        from multimodal_colpali_tpu.models.qwen2vl import ColQwen2Model

        model: Any = ColQwen2Model(cfg)
        processor: Any = ColQwen2Processor(
            cfg, tokenizer=tokenizer, dynamic_resolution=dynamic_resolution)
        convert = hf_import.colqwen2_params_from_hf
    elif family == "colflor":
        from multimodal_colpali_tpu.models.florence2 import ColFlorModel
        from multimodal_colpali_tpu.models.processing_florence2 import ColFlorProcessor

        model = ColFlorModel(cfg)
        processor = ColFlorProcessor(cfg, tokenizer=tokenizer)
        convert = hf_import.colflor_params_from_hf
    elif family == "colidefics3":
        from multimodal_colpali_tpu.models.idefics3 import ColIdefics3Model
        from multimodal_colpali_tpu.models.processing_idefics3 import ColIdefics3Processor

        model = ColIdefics3Model(cfg)
        processor = ColIdefics3Processor(
            cfg, tokenizer=tokenizer, image_splitting=dynamic_resolution)
        convert = hf_import.colidefics3_params_from_hf
    elif family == "colgranite":
        from multimodal_colpali_tpu.models.granite import ColGraniteModel
        from multimodal_colpali_tpu.models.processing_granite import ColGraniteProcessor

        model = ColGraniteModel(cfg)
        processor = ColGraniteProcessor(
            cfg, tokenizer=tokenizer, anyres=dynamic_resolution)
        convert = hf_import.colgranite_params_from_hf
    else:
        model = ColPaliModel(cfg)
        processor = ColPaliProcessor(cfg, tokenizer=tokenizer)
        convert = hf_import.colpali_params_from_hf

    ckpt = _find_checkpoint(name, checkpoint_dir)
    if ckpt is not None:
        if tokenizer is None:
            tok = _load_tokenizer_from(ckpt)
            if tok is not None:
                processor.tokenizer = tok
        sd = hf_import.load_state_dict(ckpt)
        params = convert(sd, cfg)
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        if device_init or (device_init is None
                           and os.environ.get("MMCP_DEVICE_INIT") == "1"):
            params = device_random_params(model, cfg, seed, family=family,
                                          dtype=dtype)
        else:
            params = fast_random_params(model, cfg, seed, family=family)
    if quantize is None:
        quantize = os.environ.get("MMCP_QUANTIZE") or None
    if device_preprocess is None:
        device_preprocess = os.environ.get("MMCP_DEVICE_PREPROCESS") == "1"
    return Retriever(
        name=name, model=model, params=params, processor=processor,
        dtype=dtype, mesh=mesh, family=family, quantize=quantize,
        device_preprocess=bool(device_preprocess),
    )


# -- Gemma-3 generator LMs (not retrievers) ----------------------------------
#
# The reference's generation tier serves google/gemma-3-27b-it via vLLM
# (reference 00_run_docker_containers.sh:26-39; this repo's config.py names
# it as the default local model). These load straight into
# GemmaDecodeEngine-compatible param trees - no flax module, no processor.

GEMMA3_CONFIGS: Dict[str, Any] = {}


def _register_gemma3():
    from multimodal_colpali_tpu.models.configs import Gemma3TextConfig

    GEMMA3_CONFIGS.update({
        "google/gemma-3-27b-it": Gemma3TextConfig.gemma3_27b,
        "gemma-3-27b": Gemma3TextConfig.gemma3_27b,
        "google/gemma-3-12b-it": Gemma3TextConfig.gemma3_12b,
        "gemma-3-12b": Gemma3TextConfig.gemma3_12b,
        "google/gemma-3-4b-it": Gemma3TextConfig.gemma3_4b,
        "gemma-3-4b": Gemma3TextConfig.gemma3_4b,
        "google/gemma-3-1b-it": Gemma3TextConfig.gemma3_1b,
        "gemma-3-1b": Gemma3TextConfig.gemma3_1b,
        "tiny-gemma3": Gemma3TextConfig.tiny,
    })


_register_gemma3()


def gemma3_param_shapes(cfg) -> Dict[str, Any]:
    """ShapeDtypeStruct tree matching ``hf_import.gemma3_params_from_hf``."""
    h, hd = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    layer = {
        "self_attn": {
            "q_proj": {"kernel": sds((h, nq * hd), f32)},
            "k_proj": {"kernel": sds((h, nkv * hd), f32)},
            "v_proj": {"kernel": sds((h, nkv * hd), f32)},
            "o_proj": {"kernel": sds((nq * hd, h), f32)},
            "q_norm": {"weight": sds((hd,), f32)},
            "k_norm": {"weight": sds((hd,), f32)},
        },
        "mlp": {
            "gate_proj": {"kernel": sds((h, cfg.intermediate_size), f32)},
            "up_proj": {"kernel": sds((h, cfg.intermediate_size), f32)},
            "down_proj": {"kernel": sds((cfg.intermediate_size, h), f32)},
        },
        "input_layernorm": {"weight": sds((h,), f32)},
        "post_attention_layernorm": {"weight": sds((h,), f32)},
        "pre_feedforward_layernorm": {"weight": sds((h,), f32)},
        "post_feedforward_layernorm": {"weight": sds((h,), f32)},
    }
    language = {f"layers_{i}": layer for i in range(cfg.num_hidden_layers)}
    language["norm"] = {"weight": sds((h,), f32)}
    return {
        "embed": {"embed_tokens": sds((cfg.vocab_size, h), f32)},
        "language_model": language,
    }


def gemma3_random_params(cfg, seed: int = 0, dtype: Any = jnp.float32,
                         device: bool = False):
    """Random Gemma-3 params (Gemma (1+w) RMSNorms -> w=0; kernels
    N(0, fan_in^-0.5)). ``device=True`` materializes them in one jitted
    program on the accelerator (the ``device_random_params`` role - the
    27B tree must never be built on this host's single core)."""
    shapes = gemma3_param_shapes(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    if device:
        def build(key):
            out = []
            for i, (path, s) in enumerate(flat):
                name = getattr(path[-1], "key", str(path[-1]))
                if name == "weight":
                    out.append(jnp.zeros(s.shape, dtype))     # (1+w) -> w=0
                else:
                    fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
                    k = jax.random.fold_in(key, i)
                    out.append((jax.random.normal(k, s.shape, jnp.float32)
                                * float(fan_in) ** -0.5).astype(dtype))
            return jax.tree_util.tree_unflatten(treedef, out)

        return jax.jit(build)(jax.random.PRNGKey(seed))

    rng = np.random.default_rng(seed)
    out = []
    for path, s in flat:
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "weight":
            out.append(np.zeros(s.shape, np.float32))
        else:
            fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
            out.append(rng.standard_normal(s.shape, dtype=np.float32)
                       * float(fan_in) ** -0.5)
    return jax.tree_util.tree_unflatten(treedef, out)


def gemma3_random_params_int8(cfg, seed: int = 0,
                              dtype: Any = jnp.bfloat16,
                              fmt: str = "int8"):
    """Random Gemma-3 params materialized DIRECTLY as weight-only int8
    on the device, one leaf-sized jit at a time, so the bf16 tree never
    exists anywhere: gemma-3-12b is ~23.5 GB in bf16 (cannot live on a
    16 GB v5e) but ~11.8 GB as int8 codes. Peak device footprint is the
    resident int8 tree plus ONE leaf's f32 transient (the embed table,
    ~4 GB for 12B, is generated first while the tree is empty).

    ``fmt="int4"`` packs the projection kernels group-wise int4 instead
    (~half the codes again; the embed table stays int8) - the only way
    gemma-3-27b (~25.6 GB of int8 codes) fits one chip.

    Returns the ``ops/quant.py`` representation the decode engine
    detects as pre-quantized (norm weights stay ``dtype``)."""
    from multimodal_colpali_tpu.ops.quant import (_int4_group_for,
                                                  quantize_embed_int8,
                                                  quantize_int4,
                                                  quantize_int8)

    shapes = gemma3_param_shapes(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    key = jax.random.PRNGKey(seed)
    jits: Dict[Any, Any] = {}

    def build_leaf(shape, axis, i):
        sig = (shape, axis)
        if sig not in jits:
            def f(k):
                fan_in = shape[0] if len(shape) >= 2 else shape[-1]
                w = (jax.random.normal(k, shape, jnp.float32)
                     * float(fan_in) ** -0.5)
                if axis == 1:
                    return quantize_embed_int8(w)
                if fmt == "int4":
                    g = _int4_group_for(shape[0], 256)
                    if g:
                        return quantize_int4(w, group=g)
                return quantize_int8(w, axis=axis)
            jits[sig] = jax.jit(f)
        return jits[sig](jax.random.fold_in(key, i))

    # embed first: its f32 transient is the largest, and the tree is
    # still empty at that point
    order = sorted(
        range(len(flat)),
        key=lambda i: -int(np.prod(flat[i][1].shape)))
    out: List[Any] = [None] * len(flat)
    for i in order:
        path, s = flat[i]
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "weight":
            out[i] = jnp.zeros(s.shape, dtype)          # (1+w) norms
        elif name == "embed_tokens":
            out[i] = build_leaf(s.shape, 1, i)           # scale per row
        else:
            out[i] = build_leaf(s.shape, 0, i)           # scale per col
    return jax.tree_util.tree_unflatten(treedef, out)


def load_gemma3_lm(name: str, checkpoint_dir: Optional[str] = None,
                   dtype: Any = jnp.bfloat16, seed: int = 0,
                   device_init: Optional[bool] = None,
                   weight_dtype: str = "native"):
    """Load a Gemma-3 generator LM by name -> (cfg, params, tokenizer).

    Checkpoint resolution and the random-init fallback mirror
    ``load_retriever``; ``tokenizer`` is None when no checkpoint provides
    one (callers fall back to Byte/ModuloTokenizer)."""
    if name not in GEMMA3_CONFIGS:
        raise KeyError(
            f"unknown gemma3 LM {name!r}; known: {sorted(GEMMA3_CONFIGS)}")
    cfg = GEMMA3_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.gemma3_params_from_hf(sd, cfg)
        # checkpoint int8: the engine quantizes post-load (host RAM holds
        # the tree; only the int8 codes reach the device via the engine)
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        if weight_dtype in ("int8", "int4"):
            # leaf-streamed on-device init: the bf16 tree never exists
            # (the only way a 12B/int8 or 27B/int4 fits a 16 GB chip)
            params = gemma3_random_params_int8(cfg, seed, dtype=dtype,
                                               fmt=weight_dtype)
        else:
            dev = device_init or (device_init is None
                                  and os.environ.get("MMCP_DEVICE_INIT") == "1")
            params = gemma3_random_params(cfg, seed, dtype=dtype,
                                          device=bool(dev))
    return cfg, params, tok


# -- Qwen2-VL generator LMs (the reference's "old models" tier) --------------
#
# The reference also serves three biomed VLMs through vLLM containers
# (00_run_docker_old_models.sh); the Qwen2-VL one
# (AdaptLLM/biomed-Qwen2-VL-2B-Instruct, :24-38) is covered first-party by
# Qwen2DecodeEngine. These resolve to TEXT configs (the decode stack); the
# matching full-model configs below convert complete VL checkpoints.

QWEN2VL_CONFIGS: Dict[str, Any] = {}
_QWEN2VL_FULL: Dict[str, Any] = {}


def _register_qwen2vl():
    from multimodal_colpali_tpu.models.qwen2vl import (ColQwen2ModelConfig,
                                                       Qwen2TextConfig)

    QWEN2VL_CONFIGS.update({
        "AdaptLLM/biomed-Qwen2-VL-2B-Instruct": Qwen2TextConfig.qwen2_vl_2b,
        "Qwen/Qwen2-VL-2B-Instruct": Qwen2TextConfig.qwen2_vl_2b,
        "qwen2-vl-2b": Qwen2TextConfig.qwen2_vl_2b,
        "Qwen/Qwen2-VL-7B-Instruct": Qwen2TextConfig.qwen2_vl_7b,
        "qwen2-vl-7b": Qwen2TextConfig.qwen2_vl_7b,
        "tiny-qwen2vl": Qwen2TextConfig.tiny,
    })
    _QWEN2VL_FULL.update({
        "AdaptLLM/biomed-Qwen2-VL-2B-Instruct": ColQwen2ModelConfig.qwen2_vl_2b,
        "Qwen/Qwen2-VL-2B-Instruct": ColQwen2ModelConfig.qwen2_vl_2b,
        "qwen2-vl-2b": ColQwen2ModelConfig.qwen2_vl_2b,
        "Qwen/Qwen2-VL-7B-Instruct": ColQwen2ModelConfig.qwen2_vl_7b,
        "qwen2-vl-7b": ColQwen2ModelConfig.qwen2_vl_7b,
        "tiny-qwen2vl": ColQwen2ModelConfig.tiny,
    })


_register_qwen2vl()


def qwen2vl_param_shapes(cfg) -> Dict[str, Any]:
    """ShapeDtypeStruct tree matching the LM subtrees of
    ``hf_import.qwen2vl_lm_params_from_hf`` / ``llama_lm_params_from_hf``
    (q/k/v biases only for Qwen2 configs, nested mlp, untied ``lm_head``
    when the config says so)."""
    h, hd = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    biased = getattr(cfg, "is_qwen2", False)

    def proj(shape):
        d = {"kernel": sds(shape, f32)}
        if biased:
            d["bias"] = sds((shape[1],), f32)
        return d

    layer = {
        "self_attn": {
            "q_proj": proj((h, nq * hd)),
            "k_proj": proj((h, nkv * hd)),
            "v_proj": proj((h, nkv * hd)),
            "o_proj": {"kernel": sds((nq * hd, h), f32)},
        },
        "mlp": {
            "gate_proj": {"kernel": sds((h, cfg.intermediate_size), f32)},
            "up_proj": {"kernel": sds((h, cfg.intermediate_size), f32)},
            "down_proj": {"kernel": sds((cfg.intermediate_size, h), f32)},
        },
        "input_layernorm": {"weight": sds((h,), f32)},
        "post_attention_layernorm": {"weight": sds((h,), f32)},
    }
    language = {f"layers_{i}": layer for i in range(cfg.num_hidden_layers)}
    language["norm"] = {"weight": sds((h,), f32)}
    if not cfg.tie_word_embeddings:
        language["lm_head"] = {"kernel": sds((h, cfg.vocab_size), f32)}
    return {
        "embed": {"embed_tokens": sds((cfg.vocab_size, h), f32)},
        "language_model": language,
    }


def qwen2vl_random_params(cfg, seed: int = 0) -> Dict[str, Any]:
    """Random Qwen2 LM params: plain-multiply RMSNorms -> w=1 (NOT the
    Gemma w=0), projection biases -> 0, kernels N(0, fan_in^-0.5)."""
    shapes = qwen2vl_param_shapes(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.default_rng(seed)
    out = []
    for path, s in flat:
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "weight":
            out.append(np.ones(s.shape, np.float32))
        elif name == "bias":
            out.append(np.zeros(s.shape, np.float32))
        else:
            fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
            out.append(rng.standard_normal(s.shape, dtype=np.float32)
                       * float(fan_in) ** -0.5)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_qwen2vl_lm(name: str, checkpoint_dir: Optional[str] = None,
                    dtype: Any = jnp.bfloat16, seed: int = 0):
    """Load a Qwen2-VL generator LM by name -> (text_cfg, params, tok).

    Checkpoint resolution mirrors ``load_gemma3_lm``; a full VL checkpoint
    converts through ``hf_import.qwen2vl_lm_params_from_hf`` (vision tower
    kept in the tree for a future mm engine; the decode engine ignores
    it). Without a checkpoint the LM subtrees are random-initialized
    (2B/7B fit a v5e chip in bf16, so no leaf-streamed builder is
    needed)."""
    if name not in QWEN2VL_CONFIGS:
        raise KeyError(
            f"unknown qwen2-vl LM {name!r}; known: {sorted(QWEN2VL_CONFIGS)}")
    cfg = QWEN2VL_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.qwen2vl_lm_params_from_hf(sd, _QWEN2VL_FULL[name]())
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        params = qwen2vl_random_params(cfg, seed)
    return cfg, params, tok


def qwen2vl_mm_random_params(cfg, seed: int = 0) -> Dict[str, Any]:
    """Random FULL Qwen2-VL params: LM via ``qwen2vl_random_params``,
    vision via the flax tower's eval_shape (RMS/LayerNorm weights -> 1,
    biases -> 0, kernels N(0, fan_in^-0.5))."""
    from multimodal_colpali_tpu.models.qwen2vl import Qwen2VisionTower

    lm = qwen2vl_random_params(cfg.text, seed)
    tower = Qwen2VisionTower(cfg.vision, cfg.grid_h, cfg.grid_w)
    shapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.grid_h * cfg.grid_w, cfg.vision.patch_dim),
                  jnp.float32)))["params"]
    rng = np.random.default_rng(seed + 1)

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name in ("scale",) or (name == "weight" and len(s.shape) == 1):
            return np.ones(s.shape, np.float32)       # norms
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return (rng.standard_normal(s.shape).astype(np.float32)
                * float(fan_in) ** -0.5)

    lm["visual"] = jax.tree_util.tree_map_with_path(fill, shapes)
    return lm


def load_qwen2vl_mm(name: str, checkpoint_dir: Optional[str] = None,
                    dtype: Any = jnp.bfloat16, seed: int = 0):
    """Load the FULL Qwen2-VL generator (vision tower + LM) by name ->
    (model_cfg, params, tokenizer). The model config is the plain-VL
    ColQwen2ModelConfig (``qwen2_vl_2b``/``qwen2_vl_7b``); checkpoints
    convert through the same ``qwen2vl_lm_params_from_hf`` the text
    loader uses (the visual tree is already in it)."""
    if name not in _QWEN2VL_FULL:
        raise KeyError(
            f"unknown qwen2-vl model {name!r}; known: {sorted(_QWEN2VL_FULL)}")
    cfg = _QWEN2VL_FULL[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.qwen2vl_lm_params_from_hf(sd, cfg)
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        params = qwen2vl_mm_random_params(cfg, seed)
    return cfg, params, tok


# -- Llama generator LMs (the reference's "old models" tier, cont.) ----------
#
# AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B (00_run_docker_old_models.sh:41-52)
# carries a Llama-3-8B LM; LlamaDecodeEngine serves it through the same
# batchers (the layer body is the shared Qwen2/Llama engine branch).

LLAMA_CONFIGS: Dict[str, Any] = {}


def _register_llama():
    from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

    LLAMA_CONFIGS.update({
        "AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B": LlamaTextConfig.llama3_8b,
        "meta-llama/Meta-Llama-3-8B-Instruct": LlamaTextConfig.llama3_8b,
        "llama-3-8b": LlamaTextConfig.llama3_8b,
        "tiny-llama": LlamaTextConfig.tiny_lm,
    })


_register_llama()


def load_llama_lm(name: str, checkpoint_dir: Optional[str] = None,
                  dtype: Any = jnp.bfloat16, seed: int = 0):
    """Load a Llama generator LM by name -> (cfg, params, tok). Accepts
    bare Llama checkpoints and LLaVA-NeXT checkpoints (the converter
    strips the nesting; vision subtrees are ignored). Random-init
    fallback reuses the shared shapes/builder (bias-free via the config
    marker)."""
    if name not in LLAMA_CONFIGS:
        raise KeyError(
            f"unknown llama LM {name!r}; known: {sorted(LLAMA_CONFIGS)}")
    cfg = LLAMA_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.llama_lm_params_from_hf(sd, cfg)
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        params = qwen2vl_random_params(cfg, seed)
    return cfg, params, tok


# -- LLaVA-NeXT mm generators (the old-models tier's third VLM) ---------------

LLAVA_NEXT_CONFIGS: Dict[str, Any] = {}


def _register_llava_next():
    from multimodal_colpali_tpu.models.clip import LlavaNextMMConfig

    LLAVA_NEXT_CONFIGS.update({
        "AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B":
            LlavaNextMMConfig.llava_next_llama3_8b,
        "llava-next-llama3-8b": LlavaNextMMConfig.llava_next_llama3_8b,
        "tiny-llava-next": LlavaNextMMConfig.tiny,
    })


_register_llava_next()


def llava_next_random_params(cfg, seed: int = 0) -> Dict[str, Any]:
    """Random FULL LLaVA-NeXT params: Llama LM via the shared builder,
    CLIP tower via the flax module's eval_shape, projector + newline."""
    from multimodal_colpali_tpu.models.clip import ClipFeatureTower

    lm = qwen2vl_random_params(cfg.text, seed)
    tower = ClipFeatureTower(cfg.vision, cfg.vision_feature_layer)
    shapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                  jnp.float32)))["params"]
    rng = np.random.default_rng(seed + 1)

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name in ("scale",) or (name == "weight" and len(s.shape) == 1):
            return np.ones(s.shape, np.float32)       # LayerNorms
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return (rng.standard_normal(s.shape).astype(np.float32)
                * float(fan_in) ** -0.5)

    lm["vision_tower"] = jax.tree_util.tree_map_with_path(fill, shapes)
    v_h, t_h = cfg.vision.hidden_size, cfg.text.hidden_size
    lm["multi_modal_projector"] = {
        "linear_1": {"kernel": rng.standard_normal((v_h, t_h)
                                                   ).astype(np.float32)
                     * float(v_h) ** -0.5,
                     "bias": np.zeros((t_h,), np.float32)},
        "linear_2": {"kernel": rng.standard_normal((t_h, t_h)
                                                   ).astype(np.float32)
                     * float(t_h) ** -0.5,
                     "bias": np.zeros((t_h,), np.float32)},
        "image_newline": rng.standard_normal((t_h,)).astype(np.float32)
        * float(t_h) ** -0.5,
    }
    return lm


def llava_next_random_params_int8(cfg, seed: int = 0,
                                  dtype: Any = jnp.bfloat16,
                                  fmt: str = "int8"):
    """Random FULL LLaVA-NeXT params with the Llama-3-8B LM materialized
    DIRECTLY as weight-only quantized leaves on the device (the 8B f32
    tree would be ~32 GB on this single-core host; leaf-streamed int8 is
    ~8 GB on-chip and never exists in bf16). CLIP tower + projector
    build in one on-device jit at ``dtype``."""
    from multimodal_colpali_tpu.models.clip import ClipFeatureTower
    from multimodal_colpali_tpu.ops.quant import (_int4_group_for,
                                                  quantize_embed_int8,
                                                  quantize_int4,
                                                  quantize_int8)

    shapes = qwen2vl_param_shapes(cfg.text)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    key = jax.random.PRNGKey(seed)
    jits: Dict[Any, Any] = {}

    def build_leaf(shape, axis, i):
        sig = (shape, axis)
        if sig not in jits:
            def f(k):
                fan_in = shape[0] if len(shape) >= 2 else shape[-1]
                w = (jax.random.normal(k, shape, jnp.float32)
                     * float(fan_in) ** -0.5)
                if axis == 1:
                    return quantize_embed_int8(w)
                if fmt == "int4":
                    g = _int4_group_for(shape[0], 256)
                    if g:
                        return quantize_int4(w, group=g)
                return quantize_int8(w, axis=axis)
            jits[sig] = jax.jit(f)
        return jits[sig](jax.random.fold_in(key, i))

    order = sorted(range(len(flat)),
                   key=lambda i: -int(np.prod(flat[i][1].shape)))
    out: List[Any] = [None] * len(flat)
    for i in order:
        path, s = flat[i]
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "weight":
            out[i] = jnp.ones(s.shape, dtype)       # plain-multiply norms
        elif name == "embed_tokens":
            out[i] = build_leaf(s.shape, 1, i)
        else:
            out[i] = build_leaf(s.shape, 0, i)
    params = jax.tree_util.tree_unflatten(treedef, out)

    v = cfg.vision
    tower = ClipFeatureTower(v, cfg.vision_feature_layer)
    vshapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, v.image_size, v.image_size, 3),
                  jnp.float32)))["params"]
    vflat, vtreedef = jax.tree_util.tree_flatten_with_path(vshapes)

    def build_vision(k):
        outs = []
        for i, (path, s) in enumerate(vflat):
            name = getattr(path[-1], "key", str(path[-1]))
            if name == "bias":
                outs.append(jnp.zeros(s.shape, dtype))
            elif name == "weight" and len(s.shape) == 1:
                outs.append(jnp.ones(s.shape, dtype))       # LayerNorms
            else:
                fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
                outs.append((jax.random.normal(jax.random.fold_in(k, i),
                                               s.shape, jnp.float32)
                             * float(fan_in) ** -0.5).astype(dtype))
        return jax.tree_util.tree_unflatten(vtreedef, outs)

    params["vision_tower"] = jax.jit(build_vision)(
        jax.random.fold_in(key, 10_000))
    v_h, t_h = v.hidden_size, cfg.text.hidden_size
    rng = np.random.default_rng(seed + 2)
    params["multi_modal_projector"] = {
        "linear_1": {"kernel": jnp.asarray(
            rng.standard_normal((v_h, t_h)).astype(np.float32)
            * float(v_h) ** -0.5, dtype),
            "bias": jnp.zeros((t_h,), dtype)},
        "linear_2": {"kernel": jnp.asarray(
            rng.standard_normal((t_h, t_h)).astype(np.float32)
            * float(t_h) ** -0.5, dtype),
            "bias": jnp.zeros((t_h,), dtype)},
        "image_newline": jnp.asarray(
            rng.standard_normal((t_h,)).astype(np.float32)
            * float(t_h) ** -0.5, dtype),
    }
    return params


def load_llava_next_mm(name: str, checkpoint_dir: Optional[str] = None,
                       dtype: Any = jnp.bfloat16, seed: int = 0,
                       weight_dtype: str = "native"):
    """Load the FULL LLaVA-NeXT generator (CLIP tower + Llama LM) ->
    (cfg, params, tokenizer). ``weight_dtype`` int8/int4 makes the
    random-init fallback build the 8B LM directly in quantized form on
    the device (checkpoints quantize post-load in the engine)."""
    if name not in LLAVA_NEXT_CONFIGS:
        raise KeyError(
            f"unknown llava-next model {name!r}; known: "
            f"{sorted(LLAVA_NEXT_CONFIGS)}")
    cfg = LLAVA_NEXT_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.llava_next_params_from_hf(sd, cfg)
        rows = int(np.asarray(params["embed"]["embed_tokens"]).shape[0])
        if rows != cfg.text.vocab_size:
            # hf conversions pad the vocab differently; the checkpoint wins
            import dataclasses as _dc

            cfg = _dc.replace(cfg, text=_dc.replace(cfg.text,
                                                    vocab_size=rows))
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        if weight_dtype in ("int8", "int4"):
            # leaf-streamed on-device init: the f32 tree never exists
            params = llava_next_random_params_int8(cfg, seed, dtype=dtype,
                                                   fmt=weight_dtype)
        else:
            params = llava_next_random_params(cfg, seed)
    return cfg, params, tok


# -- Mllama (Llama-3.2-Vision) mm generators ---------------------------------

MLLAMA_CONFIGS: Dict[str, Any] = {}


def _register_mllama():
    from multimodal_colpali_tpu.models.mllama import MllamaMMConfig

    MLLAMA_CONFIGS.update({
        "AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct":
            MllamaMMConfig.llama32_11b_vision,
        "meta-llama/Llama-3.2-11B-Vision-Instruct":
            MllamaMMConfig.llama32_11b_vision,
        "llama-3.2-11b-vision": MllamaMMConfig.llama32_11b_vision,
        "tiny-mllama": MllamaMMConfig.tiny,
    })


_register_mllama()


def mllama_random_params(cfg, seed: int = 0) -> Dict[str, Any]:
    """Random FULL Mllama params: Llama self-attn LM via the shared
    builder (embed table widened to HF's ``vocab_size + 8`` rows - the
    <|image|> marker lives past the lm_head vocab), cross layers, vision
    tower via the flax module's eval_shape, projector."""
    import dataclasses as _dc

    from multimodal_colpali_tpu.models.mllama import MllamaVisionTower

    lm = qwen2vl_random_params(cfg.text, seed)
    rng = np.random.default_rng(seed + 2)
    th = cfg.text.hidden_size
    embed = np.asarray(lm["embed"]["embed_tokens"])
    extra = (rng.standard_normal((8, th)).astype(np.float32)
             * float(th) ** -0.5)
    lm["embed"]["embed_tokens"] = np.concatenate([embed, extra], axis=0)

    kvh = cfg.text.num_key_value_heads * cfg.text.head_dim
    qh = cfg.text.num_attention_heads * cfg.text.head_dim

    def mat(n_in, n_out):
        return (rng.standard_normal((n_in, n_out)).astype(np.float32)
                * float(n_in) ** -0.5)

    cross: Dict[str, Any] = {}
    for g in cfg.cross_attention_layers:
        cross[f"{g}"] = {
            "cross_attn": {
                "q_proj": {"kernel": mat(th, qh)},
                "k_proj": {"kernel": mat(th, kvh)},
                "v_proj": {"kernel": mat(th, kvh)},
                "o_proj": {"kernel": mat(qh, th)},
                "q_norm": {"weight": np.ones((cfg.text.head_dim,),
                                             np.float32)},
                "k_norm": {"weight": np.ones((cfg.text.head_dim,),
                                             np.float32)},
            },
            "input_layernorm": {"weight": np.ones((th,), np.float32)},
            "post_attention_layernorm": {"weight": np.ones((th,),
                                                           np.float32)},
            "mlp": {
                "gate_proj": {"kernel": mat(th, cfg.text.intermediate_size)},
                "up_proj": {"kernel": mat(th, cfg.text.intermediate_size)},
                "down_proj": {"kernel": mat(cfg.text.intermediate_size, th)},
            },
            # nonzero gates so random-weight serving exercises the blocks
            "gate_attn": np.full((1,), 0.25, np.float32),
            "gate_mlp": np.full((1,), 0.25, np.float32),
        }
    lm["cross_layers"] = cross

    c = cfg.vision
    tower = MllamaVisionTower(c)
    shapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, c.max_num_tiles, c.image_size, c.image_size, 3),
                  jnp.float32),
        jnp.ones((1,), jnp.int32),
        jnp.zeros((1, c.max_num_tiles), jnp.int32).at[:, 0].set(1),
    ))["params"]

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name == "weight" and len(s.shape) == 1:
            return np.ones(s.shape, np.float32)       # LayerNorms
        if name.endswith("gate") or name in ("gate_attn", "gate_ffn"):
            return np.full(s.shape, 0.25, np.float32)
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return (rng.standard_normal(s.shape).astype(np.float32)
                * float(fan_in) ** -0.5)

    lm["vision_tower"] = jax.tree_util.tree_map_with_path(fill, shapes)
    lm["multi_modal_projector"] = {
        "kernel": mat(c.output_dim, th),
        "bias": np.zeros((th,), np.float32),
    }
    return lm


def _mllama_cross_shapes(cfg) -> Dict[str, Any]:
    """ShapeDtypeStruct tree matching the ``cross_layers`` subtree of
    ``hf_import.mllama_params_from_hf``."""
    c = cfg.text
    h, hd = c.hidden_size, c.head_dim
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    layer = {
        "cross_attn": {
            "q_proj": {"kernel": sds((h, c.num_attention_heads * hd), f32)},
            "k_proj": {"kernel": sds((h, c.num_key_value_heads * hd), f32)},
            "v_proj": {"kernel": sds((h, c.num_key_value_heads * hd), f32)},
            "o_proj": {"kernel": sds((c.num_attention_heads * hd, h), f32)},
            "q_norm": {"weight": sds((hd,), f32)},
            "k_norm": {"weight": sds((hd,), f32)},
        },
        "input_layernorm": {"weight": sds((h,), f32)},
        "post_attention_layernorm": {"weight": sds((h,), f32)},
        "mlp": {
            "gate_proj": {"kernel": sds((h, c.intermediate_size), f32)},
            "up_proj": {"kernel": sds((h, c.intermediate_size), f32)},
            "down_proj": {"kernel": sds((c.intermediate_size, h), f32)},
        },
        "gate_attn": sds((1,), f32),
        "gate_mlp": sds((1,), f32),
    }
    return {f"{g}": layer for g in cfg.cross_attention_layers}


def mllama_random_params_int8(cfg, seed: int = 0, dtype: Any = jnp.bfloat16,
                              fmt: str = "int8"):
    """Random FULL Mllama params materialized DIRECTLY as weight-only
    quantized leaves on the device, one leaf-sized jit at a time - the
    11B tree is ~22.8 GB in bf16 (cannot live on a 16 GB v5e) but
    ~11.4 GB as int8 codes. Mirrors ``gemma3_random_params_int8``, with
    Llama conventions: plain-multiply norms init to ONE (not the Gemma
    w=0), the embed table carries HF's ``vocab_size + 8`` rows, gates
    init 0.25 so the cross blocks compute nontrivially, and the vision
    tower builds in one on-device jit at ``dtype`` (its int8 form is the
    engine's ``vision_dtype="int8"`` pass)."""
    from multimodal_colpali_tpu.models.mllama import MllamaVisionTower
    from multimodal_colpali_tpu.ops.quant import (_int4_group_for,
                                                  quantize_embed_int8,
                                                  quantize_int4,
                                                  quantize_int8)

    c = cfg.text
    shapes = qwen2vl_param_shapes(c)
    shapes["embed"]["embed_tokens"] = jax.ShapeDtypeStruct(
        (c.vocab_size + 8, c.hidden_size), jnp.float32)
    shapes["cross_layers"] = _mllama_cross_shapes(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    key = jax.random.PRNGKey(seed)
    jits: Dict[Any, Any] = {}

    def build_leaf(shape, axis, i):
        sig = (shape, axis)
        if sig not in jits:
            def f(k):
                fan_in = shape[0] if len(shape) >= 2 else shape[-1]
                w = (jax.random.normal(k, shape, jnp.float32)
                     * float(fan_in) ** -0.5)
                if axis == 1:
                    return quantize_embed_int8(w)
                if fmt == "int4":
                    g = _int4_group_for(shape[0], 256)
                    if g:
                        return quantize_int4(w, group=g)
                return quantize_int8(w, axis=axis)
            jits[sig] = jax.jit(f)
        return jits[sig](jax.random.fold_in(key, i))

    order = sorted(range(len(flat)),
                   key=lambda i: -int(np.prod(flat[i][1].shape)))
    out: List[Any] = [None] * len(flat)
    for i in order:
        path, s = flat[i]
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "weight":
            out[i] = jnp.ones(s.shape, dtype)       # plain-multiply norms
        elif name in ("gate_attn", "gate_mlp"):
            out[i] = jnp.full(s.shape, 0.25, jnp.float32)
        elif name == "embed_tokens":
            out[i] = build_leaf(s.shape, 1, i)       # scale per row
        else:
            out[i] = build_leaf(s.shape, 0, i)       # scale per col
    params = jax.tree_util.tree_unflatten(treedef, out)

    v = cfg.vision
    tower = MllamaVisionTower(v)
    vshapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, v.max_num_tiles, v.image_size, v.image_size, 3),
                  jnp.float32),
        jnp.ones((1,), jnp.int32),
        jnp.zeros((1, v.max_num_tiles), jnp.int32).at[:, 0].set(1),
    ))["params"]
    vflat, vtreedef = jax.tree_util.tree_flatten_with_path(vshapes)

    def build_vision(k):
        outs = []
        for i, (path, s) in enumerate(vflat):
            name = getattr(path[-1], "key", str(path[-1]))
            if name == "bias":
                outs.append(jnp.zeros(s.shape, dtype))
            elif name == "weight" and len(s.shape) == 1:
                outs.append(jnp.ones(s.shape, dtype))       # LayerNorms
            elif name.endswith("gate") or name in ("gate_attn", "gate_ffn"):
                outs.append(jnp.full(s.shape, 0.25, jnp.float32))
            else:
                fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
                outs.append((jax.random.normal(jax.random.fold_in(k, i),
                                               s.shape, jnp.float32)
                             * float(fan_in) ** -0.5).astype(dtype))
        return jax.tree_util.tree_unflatten(vtreedef, outs)

    params["vision_tower"] = jax.jit(build_vision)(
        jax.random.fold_in(key, 10_000))
    th = c.hidden_size
    rng = np.random.default_rng(seed + 2)
    params["multi_modal_projector"] = {
        "kernel": jnp.asarray(
            rng.standard_normal((v.output_dim, th)).astype(np.float32)
            * float(v.output_dim) ** -0.5, dtype),
        "bias": jnp.zeros((th,), dtype),
    }
    return params


def load_mllama_mm(name: str, checkpoint_dir: Optional[str] = None,
                   dtype: Any = jnp.bfloat16, seed: int = 0,
                   weight_dtype: str = "native"):
    """Load the FULL Llama-3.2-Vision generator (tiled ViT tower + cross
    layers + Llama LM) -> (cfg, params, tokenizer). ``weight_dtype``
    int8/int4 makes the random-init fallback build the LM + cross layers
    directly in quantized form on the device (11B cannot exist in bf16
    on one chip; checkpoints quantize post-load in the engine)."""
    if name not in MLLAMA_CONFIGS:
        raise KeyError(
            f"unknown mllama model {name!r}; known: "
            f"{sorted(MLLAMA_CONFIGS)}")
    cfg = MLLAMA_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.mllama_params_from_hf(sd, cfg)
        head = params["language_model"].get("lm_head")
        if head is not None:
            rows = int(np.asarray(head["kernel"]).shape[1])
            if rows != cfg.text.vocab_size:
                import dataclasses as _dc

                cfg = _dc.replace(cfg, text=_dc.replace(cfg.text,
                                                        vocab_size=rows))
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        if weight_dtype in ("int8", "int4"):
            # leaf-streamed on-device init: the bf16 tree never exists
            params = mllama_random_params_int8(cfg, seed, dtype=dtype,
                                               fmt=weight_dtype)
        else:
            params = mllama_random_params(cfg, seed)
    return cfg, params, tok


GEMMA3_MM_CONFIGS: Dict[str, Any] = {}


def _register_gemma3_mm():
    from multimodal_colpali_tpu.models.configs import Gemma3MMConfig

    GEMMA3_MM_CONFIGS.update({
        "google/gemma-3-27b-it": Gemma3MMConfig.gemma3_27b,
        "gemma-3-27b": Gemma3MMConfig.gemma3_27b,
        "google/gemma-3-12b-it": Gemma3MMConfig.gemma3_12b,
        "gemma-3-12b": Gemma3MMConfig.gemma3_12b,
        "google/gemma-3-4b-it": Gemma3MMConfig.gemma3_4b,
        "gemma-3-4b": Gemma3MMConfig.gemma3_4b,
        "tiny-gemma3": Gemma3MMConfig.tiny,
    })


_register_gemma3_mm()


def gemma3_mm_random_params(cfg, seed: int = 0, dtype: Any = jnp.float32,
                            weight_dtype: str = "native"):
    """Random Gemma-3 MM params: language via ``gemma3_random_params``
    (or the leaf-streamed quantized builder for ``weight_dtype`` int8 /
    int4 - a 12B/27B LM must never exist in bf16), vision via the flax
    tower's eval_shape, plus the projector."""
    from multimodal_colpali_tpu.models.siglip import SiglipVisionTower

    if weight_dtype in ("int8", "int4"):
        lang = gemma3_random_params_int8(cfg.text, seed, dtype=dtype,
                                         fmt=weight_dtype)
    else:
        lang = gemma3_random_params(cfg.text, seed, dtype=dtype)
    tower = SiglipVisionTower(cfg.vision)
    shapes = jax.eval_shape(lambda: tower.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                  jnp.float32)))["params"]
    rng = np.random.default_rng(seed + 1)

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name in ("scale",) or (name == "weight" and len(s.shape) == 1):
            return np.ones(s.shape, np.float32)       # LayerNorms
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return (rng.standard_normal(s.shape).astype(np.float32)
                * float(fan_in) ** -0.5)

    vision = jax.tree_util.tree_map_with_path(fill, shapes)
    v_h, t_h = cfg.vision.hidden_size, cfg.text.hidden_size
    proj = {
        "mm_input_projection": rng.standard_normal(
            (v_h, t_h)).astype(np.float32) * float(v_h) ** -0.5,
        "mm_soft_emb_norm": {"weight": np.zeros((v_h,), np.float32)},
    }
    return {
        "embed": lang["embed"],
        "language_model": lang["language_model"],
        "vision_tower": vision,
        "multi_modal_projector": proj,
    }


def load_gemma3_mm(name: str, checkpoint_dir: Optional[str] = None,
                   dtype: Any = jnp.float32, seed: int = 0,
                   weight_dtype: str = "native"):
    """Load the FULL Gemma-3 generator (vision + LM) -> (cfg, params,
    tokenizer). Checkpoint resolution mirrors ``load_retriever``.
    ``weight_dtype`` int8/int4 makes the random-init fallback build the
    LM directly in quantized form on the device (the 12B/27B sizes
    cannot exist in bf16 on one chip; checkpoints quantize post-load in
    the engine as before)."""
    if name not in GEMMA3_MM_CONFIGS:
        raise KeyError(
            f"unknown gemma3 mm model {name!r}; known: "
            f"{sorted(GEMMA3_MM_CONFIGS)}")
    cfg = GEMMA3_MM_CONFIGS[name]()
    ckpt = _find_checkpoint(name, checkpoint_dir)
    tok = None
    if ckpt is not None:
        tok = _load_tokenizer_from(ckpt)
        sd = hf_import.load_state_dict(ckpt)
        params = hf_import.gemma3_mm_params_from_hf(sd, cfg)
    else:
        warnings.warn(
            f"no local checkpoint for {name!r}; using random init "
            f"(set COLPALI_TPU_CKPT_DIR to load real weights)",
            stacklevel=2,
        )
        params = gemma3_mm_random_params(cfg, seed, dtype=dtype,
                                         weight_dtype=weight_dtype)
    return cfg, params, tok
