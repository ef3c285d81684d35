"""Dense single-vector store with exact cosine/dot search.

TPU-native replacement for the reference's dense Qdrant collections
(``qdrant_process`` at functions.py:1310-1333: 768-d COSINE, on-disk), used
for the text and multimodal-summary RAG modes.

Design decision (documented for parity reviewers): Qdrant uses HNSW graph
search; on TPU an *exact* ``[B, dim] x [dim, N]`` matmul streams the whole
corpus through the MXU at HBM speed (a 1M x 768 bf16 corpus is 1.5 GB ->
~2 ms), so brute force beats graph traversal while returning exact (not
approximate) neighbours. HNSW is therefore intentionally not reimplemented.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_colpali_tpu.ops import topk as topk_ops
from multimodal_colpali_tpu.store import types as t

_FILTERED = -1e28


class DenseVectorStore:
    """A named collection of single dense vectors with exact top-k search."""

    def __init__(
        self,
        name: str,
        dim: int = 768,
        distance: t.Distance = t.Distance.COSINE,
        dtype: Any = jnp.bfloat16,
        mesh: Optional[Mesh] = None,
        mesh_axis: str = "corpus",
    ):
        self.name = name
        self.dim = dim
        self.distance = distance
        self.dtype = dtype
        self.mesh = mesh
        self.mesh_axis = mesh_axis

        self._vectors = np.zeros((0, dim), dtype=np.float32)
        self._ids: List[Union[int, str]] = []
        self._payloads: List[Dict[str, Any]] = []
        self._id_to_idx: Dict[Union[int, str], int] = {}
        self._device_cache: Optional[jax.Array] = None
        self._dirty = True

    def __len__(self) -> int:
        return len(self._ids)

    def upsert(self, points: Sequence[t.PointStruct]) -> t.UpdateResult:
        new_vecs, new_pts = [], []
        for pt in points:
            vec = np.asarray(pt.vector, dtype=np.float32).reshape(-1)
            if vec.shape[0] != self.dim:
                raise ValueError(f"expected dim {self.dim}, got {vec.shape[0]}")
            if self.distance == t.Distance.COSINE:
                vec = vec / max(np.linalg.norm(vec), 1e-12)
            if pt.id in self._id_to_idx:
                idx = self._id_to_idx[pt.id]
                self._vectors[idx] = vec
                self._payloads[idx] = dict(pt.payload)
            else:
                new_vecs.append(vec)
                new_pts.append(pt)
        if new_vecs:
            base = len(self._ids)
            self._vectors = np.concatenate([self._vectors, np.stack(new_vecs)], axis=0)
            for off, pt in enumerate(new_pts):
                self._ids.append(pt.id)
                self._payloads.append(dict(pt.payload))
                self._id_to_idx[pt.id] = base + off
        self._dirty = True
        return t.UpdateResult()

    def delete(self, ids: Optional[Sequence[Union[int, str]]] = None,
               flt: Optional[t.Filter] = None) -> t.UpdateResult:
        drop = set()
        if ids is not None:
            drop.update(self._id_to_idx[i] for i in ids if i in self._id_to_idx)
        if flt is not None:
            drop.update(i for i, p in enumerate(self._payloads) if flt.matches(p))
        if not drop:
            return t.UpdateResult()
        keep = [i for i in range(len(self._ids)) if i not in drop]
        self._vectors = self._vectors[keep]
        self._ids = [self._ids[i] for i in keep]
        self._payloads = [self._payloads[i] for i in keep]
        self._id_to_idx = {pid: i for i, pid in enumerate(self._ids)}
        self._dirty = True
        return t.UpdateResult()

    def scroll(self, flt: Optional[t.Filter] = None, limit: int = 100,
               offset: int = 0, with_vectors: bool = False) -> Tuple[List[t.Record], Optional[int]]:
        matching = [i for i, p in enumerate(self._payloads) if flt is None or flt.matches(p)]
        window = matching[offset: offset + limit]
        records = [
            t.Record(id=self._ids[i], payload=dict(self._payloads[i]),
                     vector=self._vectors[i].tolist() if with_vectors else None)
            for i in window
        ]
        next_off = offset + limit if offset + limit < len(matching) else None
        return records, next_off

    def count(self, flt: Optional[t.Filter] = None) -> int:
        if flt is None:
            return len(self._ids)
        return sum(1 for p in self._payloads if flt.matches(p))

    def _ensure_device(self) -> jax.Array:
        if self._device_cache is not None and not self._dirty:
            return self._device_cache
        import math
        mult = 8 if self.mesh is None else math.lcm(self.mesh.shape[self.mesh_axis], 8)
        n = self._vectors.shape[0]
        pad = (-n) % mult
        vecs = np.concatenate(
            [self._vectors, np.zeros((pad, self.dim), np.float32)], axis=0
        ) if pad else self._vectors
        if self.mesh is not None:
            d = jax.device_put(
                vecs.astype(self.dtype), NamedSharding(self.mesh, P(self.mesh_axis))
            )
        else:
            d = jnp.asarray(vecs, self.dtype)
        self._device_cache = d
        self._dirty = False
        return d

    def query(
        self,
        query: Any,
        limit: int = 5,
        query_filter: Optional[t.Filter] = None,
        with_vectors: bool = False,
    ) -> t.QueryResponse:
        q = np.asarray(query, dtype=np.float32).reshape(-1)
        if self.distance == t.Distance.COSINE:
            q = q / max(np.linalg.norm(q), 1e-12)
        if len(self._ids) == 0:
            return t.QueryResponse(points=[])
        d = self._ensure_device()

        mask = None
        if query_filter is not None:
            m = np.full(d.shape[0], _FILTERED * 2, np.float32)
            for i, p in enumerate(self._payloads):
                if query_filter.matches(p):
                    m[i] = 0.0
            mask = jnp.asarray(m)
        else:
            # Padded rows must never win.
            m = np.zeros(d.shape[0], np.float32)
            m[len(self._ids):] = _FILTERED * 2
            mask = jnp.asarray(m)

        scores = jnp.einsum(
            "d,nd->n", jnp.asarray(q, self.dtype), d,
            preferred_element_type=jnp.float32,
        ) + mask
        vv, vi = topk_ops.topk_with_stable_ties(scores[None, :], min(limit, d.shape[0]))
        points = []
        for score, idx in zip(np.asarray(vv[0]).tolist(), np.asarray(vi[0]).tolist()):
            if idx >= len(self._ids) or score < _FILTERED:
                continue
            points.append(
                t.ScoredPoint(
                    id=self._ids[idx], score=float(score),
                    payload=dict(self._payloads[idx]),
                    vector=self._vectors[idx].tolist() if with_vectors else None,
                )
            )
        return t.QueryResponse(points=points[:limit])

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        np.savez_compressed(os.path.join(directory, "vectors.npz"), vectors=self._vectors)
        meta = {
            "name": self.name, "dim": self.dim, "distance": self.distance.value,
            "kind": "dense", "ids": self._ids, "payloads": self._payloads,
        }
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, directory: str, mesh: Optional[Mesh] = None,
             mesh_axis: str = "corpus") -> "DenseVectorStore":
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        store = cls(name=meta["name"], dim=meta["dim"],
                    distance=t.Distance(meta["distance"]), mesh=mesh, mesh_axis=mesh_axis)
        store._vectors = np.load(os.path.join(directory, "vectors.npz"))["vectors"]
        store._ids = meta["ids"]
        store._payloads = meta["payloads"]
        store._id_to_idx = {pid: i for i, pid in enumerate(store._ids)}
        return store
