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

        self.local_real_rows = int(np.asarray(local_lens).shape[0])
        self.real_rows = self.local_real_rows * jax.process_count()

        import ml_dtypes

        np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32
        self.d = make_global_corpus(vecs.astype(np_dtype), mesh, axis)
        self.d_lens = make_global_corpus(lens, mesh, axis)

        # Stage-1/quantized representations derived from the already-sharded
        # global corpus - per-page/elementwise ops, so GSPMD keeps them on
        # the page shards; no process ever materializes a full or even an
        # unsharded-local copy in one device's HBM.
        codes, scales = quantize_corpus_int8(self.d)
        self.d_int8, self.d_scale = codes, scales
        if pooled_centroids > 1:
            self.pooled = pool_corpus_fps(self.d, self.d_lens,
                                          k=pooled_centroids)
        else:
            self.pooled = pool_corpus(self.d, self.d_lens)

    def __len__(self) -> int:
        """Number of REAL pages (per-device padding rows excluded)."""
        return self.real_rows

    def owns(self, global_id: int) -> bool:
        return self.shard_offset <= global_id < self.shard_offset + self.local_rows

    _SCORE_FLOOR = -1e28  # below = masked/padding page

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
        k = min(limit, self.real_rows)
        if self.prefilter == "pooled":
            n_cand = min(max(int(np.ceil(limit * max(oversampling, 1.0))),
                             limit), self.d.shape[0])
            vals, ids = sharded_two_stage_maxsim_topk(
                self.mesh, self.axis, jnp.asarray(q), jnp.int32(q.shape[0]),
                self.pooled, self.d_int8, self.d_scale, self.d_lens,
                k=k, n_candidates=n_cand, d_full=self.d)
            vals, ids = np.asarray(vals), np.asarray(ids)
        else:
            vals, ids = sharded_maxsim_topk(
                self.mesh, self.axis, jnp.asarray(q[None], self.d.dtype),
                self.d, self.d_lens, k, use_pallas=False)
            vals, ids = np.asarray(vals[0]), np.asarray(ids[0])
        keep = vals > self._SCORE_FLOOR  # drop padding/masked pages
        return vals[keep], ids[keep]
