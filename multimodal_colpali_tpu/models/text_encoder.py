"""Dense text embeddings: bge-base on TPU with the LangChain-style surface.

Replaces the reference's ``HuggingFaceEmbeddings`` (ingest,
01_create_context_qdrant.py:245-249) and ``FastEmbedEmbeddings`` (query
time, 02_experiment01.py:114) with one JAX encoder exposing
``embed_documents``/``embed_query``.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.bert import BertEncoder
from multimodal_colpali_tpu.models.configs import BertConfig
from multimodal_colpali_tpu.models.processing import SimpleTokenizer


class BgeEmbeddings:
    """CLS-pooled, L2-normalized sentence embeddings (bge convention)."""

    def __init__(
        self,
        model_name: str = "BAAI/bge-base-en-v1.5",
        cfg: Optional[BertConfig] = None,
        tokenizer: Optional[Any] = None,
        checkpoint_dir: Optional[str] = None,
        max_length: int = 512,
        dtype: Any = jnp.bfloat16,
        seed: int = 0,
    ):
        self.model_name = model_name
        self.cfg = cfg or BertConfig.bge_base()
        self.max_length = min(max_length, self.cfg.max_position_embeddings)
        self.dtype = dtype
        self.tokenizer = tokenizer or SimpleTokenizer(self.cfg.vocab_size, 0)
        self.model = BertEncoder(self.cfg)

        ckpt = checkpoint_dir or _env_ckpt(model_name)
        if ckpt:
            sd = hf_import.load_state_dict(ckpt)
            params = hf_import.bert_params_from_hf(sd, self.cfg)
        else:
            warnings.warn(
                f"no local checkpoint for {model_name!r}; using random init",
                stacklevel=2,
            )
            params = _fast_bert_params(self.model, self.cfg, seed)
        self.params = jax.tree.map(lambda p: jnp.asarray(np.asarray(p), dtype), params)
        self._fwd = jax.jit(
            lambda p, ids, mask: self.model.apply({"params": p}, ids, mask)
        )

    def _tokenize(self, texts: Sequence[str], bucket: int = 32):
        rows = []
        cls_id, sep_id = 101, 102  # BERT [CLS]/[SEP]
        for t in texts:
            try:
                ids = list(self.tokenizer.encode(t, add_special_tokens=False))
            except TypeError:
                ids = list(self.tokenizer.encode(t))
            ids = [cls_id % self.cfg.vocab_size] + ids[: self.max_length - 2] + [sep_id % self.cfg.vocab_size]
            rows.append(ids)
        max_len = min(((max(len(r) for r in rows) + bucket - 1) // bucket) * bucket,
                      self.max_length)
        input_ids = np.zeros((len(rows), max_len), np.int32)
        mask = np.zeros((len(rows), max_len), np.int32)
        for i, r in enumerate(rows):
            r = r[:max_len]
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return input_ids, mask

    def embed_documents(self, texts: Sequence[str], batch_size: int = 64) -> List[List[float]]:
        out: List[List[float]] = []
        for s in range(0, len(texts), batch_size):
            ids, mask = self._tokenize(texts[s: s + batch_size])
            emb = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out.extend(np.asarray(emb, np.float32).tolist())
        return out

    def embed_query(self, text: str) -> List[float]:
        return self.embed_documents([text])[0]


def _env_ckpt(model_name: str) -> Optional[str]:
    env = os.environ.get("COLPALI_TPU_CKPT_DIR")
    if not env:
        return None
    for cand in (os.path.join(env, model_name.replace("/", "--")),
                 os.path.join(env, os.path.basename(model_name))):
        if os.path.isdir(cand) and any(
            f.endswith((".safetensors", ".bin")) for f in os.listdir(cand)
        ):
            return cand
    return None


def _fast_bert_params(model: BertEncoder, cfg: BertConfig, seed: int):
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids, mask))["params"]
    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "bias":
            return np.zeros(s.shape, np.float32)
        if name == "weight":
            parent = getattr(path[-2], "key", "") if len(path) > 1 else ""
            return (np.ones if "layernorm" in parent else np.zeros)(s.shape).astype(np.float32)
        fan_in = s.shape[0] if len(s.shape) >= 2 else s.shape[-1]
        return rng.standard_normal(s.shape, dtype=np.float32) * float(fan_in) ** -0.5

    return jax.tree_util.tree_map_with_path(fill, shapes)
