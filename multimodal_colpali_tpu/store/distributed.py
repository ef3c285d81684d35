"""Multi-host read-only corpus view: the >single-host store query path.

``MultiVectorStore`` is a single-process host-of-record (mutations touch
host arrays). At pod scale the corpus no longer fits one host, so this view
completes the story (SURVEY §7.7): every process contributes its local page
rows, the view assembles globally page-sharded device arrays
(``parallel.make_global_corpus``), and queries run the sharded kernels -
the all-gathers ride ICI within a slice and DCN across hosts. The reference
scales this axis by pointing qdrant-client at a bigger server
(functions.py:884-929); here the fleet IS the server.

Global page ids are ``process_shard_offset + local_row``; payload/id
resolution stays host-local by design (each process resolves the hits it
owns - metadata never crosses hosts).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh


class DistributedCorpusView:
    """Read-only MaxSim retrieval over process-local page shards.

    Every participating process must construct the view collectively with
    the SAME row count (pad with zero-length pages) and the same options.
    Works single-process too (the mesh shards over local devices), which is
    how the 8-virtual-device tests exercise it.
    """

    def __init__(
        self,
        local_vectors: np.ndarray,          # [P_local, NT, DIM] float
        local_lens: np.ndarray,             # [P_local] int32 (0 = padding)
        mesh: Optional[Mesh] = None,
        axis: str = "corpus",
        prefilter: str = "pooled",
        pooled_centroids: int = 1,
        dtype: Any = jnp.bfloat16,
        normalize: bool = True,
    ):
        from multimodal_colpali_tpu.ops.maxsim import quantize_corpus_int8
        from multimodal_colpali_tpu.ops.two_stage import (
            pool_corpus, pool_corpus_fps)
        from multimodal_colpali_tpu.parallel.mesh import (
            global_corpus_mesh, make_global_corpus)

        if mesh is None:
            mesh = global_corpus_mesh(axis)
        self.mesh = mesh
        self.axis = axis
        self.prefilter = prefilter

        vecs = np.asarray(local_vectors, np.float32)
        lens = np.asarray(local_lens, np.int32)
        if normalize:
            norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-12)
            nt = vecs.shape[1]
            vecs = vecs * (np.arange(nt)[None, :, None] < lens[:, None, None])

        n_dev = len(mesh.devices.reshape(-1))
        per_dev = -(-vecs.shape[0] // (n_dev // jax.process_count()))
        # pad local rows so every device shard is equal
        want_local = per_dev * (n_dev // jax.process_count())
        if vecs.shape[0] < want_local:
            pad = want_local - vecs.shape[0]
            vecs = np.concatenate(
                [vecs, np.zeros((pad,) + vecs.shape[1:], vecs.dtype)])
            lens = np.concatenate([lens, np.zeros(pad, np.int32)])
        self.local_rows = want_local
        self.shard_offset = jax.process_index() * want_local

        import ml_dtypes

        np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32
        self.d = make_global_corpus(vecs.astype(np_dtype), mesh, axis)
        self.d_lens = make_global_corpus(lens, mesh, axis)

        # Stage-1/quantized representations, computed on the LOCAL rows and
        # assembled globally (no process ever materializes the full corpus).
        local_d = jnp.asarray(vecs, dtype)
        local_l = jnp.asarray(lens)
        codes, scales = quantize_corpus_int8(local_d)
        self.d_int8 = make_global_corpus(np.asarray(codes), mesh, axis)
        self.d_scale = make_global_corpus(
            np.asarray(scales, np_dtype), mesh, axis)
        if pooled_centroids > 1:
            pooled = pool_corpus_fps(local_d, local_l, k=pooled_centroids)
        else:
            pooled = pool_corpus(local_d, local_l)
        self.pooled = make_global_corpus(np.asarray(pooled, np_dtype), mesh, axis)

    def __len__(self) -> int:
        return self.d.shape[0]

    def owns(self, global_id: int) -> bool:
        return self.shard_offset <= global_id < self.shard_offset + self.local_rows

    def query(self, query: Any, limit: int = 5,
              oversampling: float = 2.0) -> Tuple[np.ndarray, np.ndarray]:
        """One query's token vectors -> (scores [k], GLOBAL page ids [k]).

        Results are replicated on every process; each resolves the ids it
        owns to its local metadata.
        """
        from multimodal_colpali_tpu.ops.two_stage import (
            sharded_two_stage_maxsim_topk)
        from multimodal_colpali_tpu.ops.topk import sharded_maxsim_topk

        q = np.asarray(query, np.float32)
        q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = min(limit, len(self))
        if self.prefilter == "pooled":
            n_cand = min(max(int(np.ceil(limit * max(oversampling, 1.0))),
                             limit), len(self))
            vals, ids = sharded_two_stage_maxsim_topk(
                self.mesh, self.axis, jnp.asarray(q), jnp.int32(q.shape[0]),
                self.pooled, self.d_int8, self.d_scale, self.d_lens,
                k=k, n_candidates=n_cand, d_full=self.d)
            return np.asarray(vals), np.asarray(ids)
        vals, ids = sharded_maxsim_topk(
            self.mesh, self.axis, jnp.asarray(q[None], self.d.dtype),
            self.d, self.d_lens, k, use_pallas=False)
        return np.asarray(vals[0]), np.asarray(ids[0])
