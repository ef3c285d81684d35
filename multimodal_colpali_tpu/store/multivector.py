"""Device-resident multi-vector (late-interaction) page store.

TPU-native replacement for the reference's Qdrant ColPali collections
(created at 01_create_context_qdrant.py:208-222 with 128-d COSINE
multivectors and the MAX_SIM comparator; queried via
``client.query_points`` at functions.py:893-926).

Design:
- **Host of record, device cache.** Upserts/deletes mutate packed NumPy
  arrays + payload dicts on the host; the first query after a mutation
  uploads the corpus to HBM (optionally sharded over a mesh axis so a pod
  slice splits the page axis). Queries then run entirely on device: the
  fused Pallas MaxSim kernel + (sharded) top-k.
- **Filters fold into token counts.** A payload filter produces a boolean
  page mask; masked pages are scored with zero valid tokens, which the
  kernel turns into a ~-1e30 score, so filtering costs nothing on the hot
  path and needs no extra kernel. Results with sentinel scores are dropped.
- **Two-stage quantized search.** With ``quantized=True`` the store also
  keeps an int8 copy with per-token scales; searches run the int8 kernel
  for ``limit * oversampling`` candidates and rescore them with the bf16
  kernel, mirroring Qdrant's scalar-quantization search params
  (``ignore/rescore/oversampling``, reference functions.py:897-903).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_colpali_tpu.ops import maxsim as maxsim_ops
from multimodal_colpali_tpu.ops import topk as topk_ops
from multimodal_colpali_tpu.store import types as t

_FILTERED_SCORE_FLOOR = -1e28  # anything below this is a masked/padded page

_GATHER_WORKERS = int(os.environ.get("MMCP_GATHER_WORKERS", "16"))
_GATHER_POOL = None  # lazily-created shared executor (thread startup ~ms)


def _gather_pool():
    global _GATHER_POOL
    if _GATHER_POOL is None:
        import concurrent.futures as cf
        _GATHER_POOL = cf.ThreadPoolExecutor(
            _GATHER_WORKERS, thread_name_prefix="mmcp-gather")
    return _GATHER_POOL


def _gather_rows(arr: np.ndarray, idx: np.ndarray,
                 dtype: Optional[np.dtype] = None) -> np.ndarray:
    """Gather ``arr[idx]`` with latency hiding for memmapped corpora.

    NumPy fancy indexing on an ``on_disk`` memmap reads the rows
    SERIALLY, and every row is one blocking disk round-trip taken with
    the GIL held (page faults do not release it) - ~0.6 ms/row on this
    class of host, so a 128-candidate gather costs ~80 ms of pure IO
    latency. Production stores issue the candidate reads concurrently
    (Qdrant's on_disk tier does, via mmap readahead + async io); we do
    the same with ``os.pread`` per row on a thread pool - pread releases
    the GIL during the syscall, so the round-trips overlap even on one
    host core. RAM-resident arrays keep the plain fancy-index path.

    ``dtype=None`` (the default) returns the rows in the corpus dtype
    UNCONVERTED: NumPy's float16->float32 astype runs ~70 MB/s on this
    host (scalar half conversion) and would dominate the gather by
    10x+; the device casts for free inside the rescore jit, so callers
    should ship the raw bytes.
    """
    idx = np.asarray(idx)
    if (not isinstance(arr, np.memmap) or arr.filename is None
            or len(idx) < 8):
        out = arr[idx]
        return out if dtype is None else np.asarray(out, dtype=dtype)

    row_elems = int(np.prod(arr.shape[1:], dtype=np.int64))
    row_bytes = row_elems * arr.dtype.itemsize
    raw = np.empty((len(idx), *arr.shape[1:]), arr.dtype)
    fd = os.open(arr.filename, os.O_RDONLY)
    try:
        def read(j: int) -> None:
            off = int(arr.offset) + int(idx[j]) * row_bytes
            buf = os.pread(fd, row_bytes, off)
            raw[j] = np.frombuffer(buf, arr.dtype).reshape(arr.shape[1:])

        list(_gather_pool().map(read, range(len(idx))))
    finally:
        os.close(fd)
    return raw if dtype is None else raw.astype(dtype, copy=False)


class MultiVectorStore:
    """One named collection of multi-vector points with MaxSim search."""

    def __init__(
        self,
        name: str,
        dim: int = 128,
        max_tokens: int = 1056,
        distance: t.Distance = t.Distance.COSINE,
        dtype: Any = jnp.bfloat16,
        quantized: bool = False,
        prefilter: str = "int8",
        pooled_centroids: int = 1,
        on_disk: bool = False,
        mesh: Optional[Mesh] = None,
        mesh_axis: str = "corpus",
    ):
        """``prefilter`` selects the quantized first stage: "int8" scans the
        full int8 token corpus (recall-safe, HBM-bound); "pooled" scans
        pooled page vectors + rescores oversampled candidates exactly from
        the bf16 originals (the <10 ms @1M-pages path; see ops/two_stage).
        ``pooled_centroids > 1`` uses k farthest-point-sampled tokens per
        page for stage 1 - a k-token subsampled MaxSim - which keeps
        minority-topic pages retrievable (better recall on multi-topic
        corpora at k x the - tiny - stage-1 cost).

        ``on_disk=True`` (Qdrant's parameter at reference
        01_create_context_qdrant.py:217) keeps the ORIGINAL token tensors
        off the accelerator: HBM holds only the pooled stage-1 index (~0.25
        GB per million pages) plus token counts, and each query gathers just
        its oversampled candidates from host memory for the exact device
        rescore - so corpora far beyond HBM (the 1M-page-per-chip
        configuration) serve from one chip. Loading a saved on_disk
        collection memory-maps the originals, so even host RAM holds only
        the touched pages. Implies ``prefilter="pooled"``; the mesh path
        keeps originals device-resident and is mutually exclusive."""
        self.name = name
        self.dim = dim
        self.max_tokens = max_tokens
        self.distance = distance
        self.dtype = dtype
        self.quantized = quantized or on_disk
        self.prefilter = "pooled" if on_disk else prefilter
        self.pooled_centroids = pooled_centroids
        self.on_disk = on_disk
        if on_disk and mesh is not None:
            raise ValueError("on_disk and mesh corpus sharding are mutually "
                             "exclusive (shard the host tier instead)")
        self.mesh = mesh
        self.mesh_axis = mesh_axis

        self._vectors = np.zeros((0, max_tokens, dim), dtype=np.float32)
        self._lens = np.zeros((0,), dtype=np.int32)
        self._ids: List[Union[int, str]] = []
        self._payloads: List[Dict[str, Any]] = []
        self._id_to_idx: Dict[Union[int, str], int] = {}

        self._device_cache: Optional[Tuple[jax.Array, jax.Array]] = None
        self._device_cache_int8: Optional[Tuple[jax.Array, jax.Array]] = None
        self._device_cache_pooled: Optional[jax.Array] = None
        self._dirty = True

    # -- mutation ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self._ids)

    def _materialize(self) -> None:
        """Mutations on a memmapped (on_disk-loaded) corpus copy it into
        writable host memory first; save() re-establishes the disk tier."""
        if isinstance(self._vectors, np.memmap) or not self._vectors.flags.writeable:
            self._vectors = np.array(self._vectors)

    def upsert(self, points: Sequence[t.PointStruct]) -> t.UpdateResult:
        self._materialize()
        new_vecs, new_lens, new_rows = [], [], []
        for pt in points:
            vec = np.asarray(pt.vector, dtype=np.float32)
            if vec.ndim != 2 or vec.shape[1] != self.dim:
                raise ValueError(
                    f"multivector point must be [n_tokens, {self.dim}], got {vec.shape}"
                )
            n = min(vec.shape[0], self.max_tokens)
            if self.distance == t.Distance.COSINE:
                norms = np.linalg.norm(vec[:n], axis=-1, keepdims=True)
                vec = vec[:n] / np.maximum(norms, 1e-12)
            else:
                vec = vec[:n]
            padded = np.zeros((self.max_tokens, self.dim), dtype=np.float32)
            padded[:n] = vec
            if pt.id in self._id_to_idx:  # overwrite in place
                idx = self._id_to_idx[pt.id]
                self._vectors[idx] = padded
                self._lens[idx] = n
                self._payloads[idx] = dict(pt.payload)
            else:
                new_vecs.append(padded)
                new_lens.append(n)
                new_rows.append(pt)
        if new_vecs:
            base = len(self._ids)
            self._vectors = np.concatenate([self._vectors, np.stack(new_vecs)], axis=0)
            self._lens = np.concatenate([self._lens, np.asarray(new_lens, np.int32)])
            for off, pt in enumerate(new_rows):
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
        self._materialize()
        self._vectors = self._vectors[keep]
        self._lens = self._lens[keep]
        self._ids = [self._ids[i] for i in keep]
        self._payloads = [self._payloads[i] for i in keep]
        self._id_to_idx = {pid: i for i, pid in enumerate(self._ids)}
        self._dirty = True
        return t.UpdateResult()

    def scroll(self, flt: Optional[t.Filter] = None, limit: int = 100,
               offset: int = 0, with_vectors: bool = False) -> Tuple[List[t.Record], Optional[int]]:
        matching = [
            i for i, p in enumerate(self._payloads) if flt is None or flt.matches(p)
        ]
        window = matching[offset: offset + limit]
        records = [
            t.Record(
                id=self._ids[i],
                payload=dict(self._payloads[i]),
                vector=self._vectors[i, : self._lens[i]].tolist() if with_vectors else None,
            )
            for i in window
        ]
        next_off = offset + limit if offset + limit < len(matching) else None
        return records, next_off

    def count(self, flt: Optional[t.Filter] = None) -> int:
        if flt is None:
            return len(self._ids)
        return sum(1 for p in self._payloads if flt.matches(p))

    # -- device cache ------------------------------------------------------

    def _pad_to_block(self, arr: np.ndarray, mult: int) -> np.ndarray:
        p = arr.shape[0]
        pad = (-p) % mult
        if pad == 0:
            return arr
        return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)

    def _sharding(self, spec: P):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, spec)

    def _ensure_device_on_disk(self) -> Tuple[jax.Array, jax.Array]:
        """on_disk tier: HBM holds ONLY the pooled stage-1 index + lens.

        The pooled vectors are computed by streaming the host corpus through
        the device in bounded chunks - the full token tensor never exists in
        HBM, which is the point of this tier."""
        if self._device_cache_pooled is not None and not self._dirty:
            return self._device_cache_pooled, self._device_cache[1]
        from multimodal_colpali_tpu.ops.two_stage import (
            pool_corpus, pool_corpus_fps)

        # Chunked streaming WITHOUT touching the whole host array at once
        # (it may be a memmap far larger than RAM); only the pooled index
        # and lens are padded, both tiny.
        chunk = 8192
        pooled_parts = []
        n = self._vectors.shape[0]
        for s in range(0, n, chunk):
            dv = jnp.asarray(np.asarray(self._vectors[s: s + chunk],
                                        np.float32), self.dtype)
            dl = jnp.asarray(self._lens[s: s + chunk])
            if self.pooled_centroids > 1:
                pooled_parts.append(np.asarray(pool_corpus_fps(
                    dv, dl, k=self.pooled_centroids)))
            else:
                pooled_parts.append(np.asarray(pool_corpus(dv, dl)))
        pooled_np = (np.concatenate(pooled_parts, axis=0) if pooled_parts
                     else np.zeros((0, self.dim), np.float32))
        self._device_cache_pooled = jnp.asarray(self._pad_to_block(pooled_np, 8))
        dl_all = jnp.asarray(self._pad_to_block(self._lens, 8))
        self._device_cache = (None, dl_all)  # originals stay on host
        self._dirty = False
        return self._device_cache_pooled, dl_all

    def _ensure_device(self) -> Tuple[jax.Array, jax.Array]:
        if self._device_cache is not None and not self._dirty:
            return self._device_cache
        # Pad the page axis to a multiple of the mesh size (even shards) and
        # of 8 (clean kernel page blocks); padded pages have zero tokens.
        import math
        mult = 8 if self.mesh is None else math.lcm(self.mesh.shape[self.mesh_axis], 8)
        vecs = self._pad_to_block(self._vectors, mult)
        lens = self._pad_to_block(self._lens, mult)
        shard_v = self._sharding(P(self.mesh_axis))
        shard_l = self._sharding(P(self.mesh_axis))
        d = jax.device_put(vecs.astype(self.dtype), shard_v) if shard_v else jnp.asarray(vecs, self.dtype)
        dl = jax.device_put(lens, shard_l) if shard_l else jnp.asarray(lens)
        self._device_cache = (d, dl)
        if self.quantized:
            # Derive the quantized/pooled representations from the already
            # device-resident (and mesh-sharded) corpus ``d`` - uploading a
            # second unsharded copy would OOM exactly at the large-corpus
            # configuration these paths exist for.
            dq, ds = maxsim_ops.quantize_corpus_int8(d)
            self._device_cache_int8 = (dq, ds)
            if self.prefilter == "pooled":
                from multimodal_colpali_tpu.ops.two_stage import (
                    pool_corpus, pool_corpus_fps)

                if self.pooled_centroids > 1:
                    pooled = pool_corpus_fps(d, dl, k=self.pooled_centroids)
                else:
                    pooled = pool_corpus(d, dl)
                self._device_cache_pooled = pooled
        self._dirty = False
        return self._device_cache

    # -- search ------------------------------------------------------------

    def _filter_lens(self, dl: jax.Array, flt: Optional[t.Filter]) -> jax.Array:
        if flt is None:
            return dl
        mask = np.zeros(dl.shape[0], dtype=np.int32)
        for i, payload in enumerate(self._payloads):
            if flt.matches(payload):
                mask[i] = 1
        m = jnp.asarray(mask)
        if self.mesh is not None:
            m = jax.device_put(m, self._sharding(P(self.mesh_axis)))
        return dl * m

    def query(
        self,
        query: Any,
        limit: int = 5,
        query_filter: Optional[t.Filter] = None,
        search_params: Optional[t.SearchParams] = None,
        with_vectors: bool = False,
    ) -> t.QueryResponse:
        """MaxSim search for one query (``[n_q_tokens, dim]`` list/array)."""
        q = np.asarray(query, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"query must be [n_tokens, {self.dim}], got {q.shape}")
        if self.distance == t.Distance.COSINE:
            q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        if len(self._ids) == 0:
            return t.QueryResponse(points=[])

        if self.on_disk:
            return self._query_on_disk(q, limit, query_filter, search_params,
                                       with_vectors)

        d, dl = self._ensure_device()
        dl_eff = self._filter_lens(dl, query_filter)
        qj = jnp.asarray(q[None, ...], self.dtype)

        quant = search_params.quantization if search_params else None
        use_two_stage = (
            self.quantized
            and self._device_cache_int8 is not None
            and not (quant and quant.ignore)
        )
        if use_two_stage and self.prefilter == "pooled":
            from multimodal_colpali_tpu.ops.two_stage import (
                sharded_two_stage_maxsim_topk, two_stage_maxsim_topk,
            )

            oversampling = quant.oversampling if quant else 2.0
            n_cand = min(max(int(np.ceil(limit * max(oversampling, 1.0))), limit),
                         d.shape[0])
            dq, ds = self._device_cache_int8
            # Rescore from the bf16 originals (d), matching the int8 path
            # below and Qdrant's rescore-from-originals semantics; the int8
            # codes are only the stage-1/fallback representation.
            if self.mesh is not None:
                vv, vi = sharded_two_stage_maxsim_topk(
                    self.mesh, self.mesh_axis,
                    jnp.asarray(q, jnp.float32), jnp.int32(q.shape[0]),
                    self._device_cache_pooled, dq, ds, dl_eff,
                    k=min(limit, d.shape[0]), n_candidates=n_cand, d_full=d,
                )
            else:
                vv, vi = two_stage_maxsim_topk(
                    jnp.asarray(q, jnp.float32), jnp.int32(q.shape[0]),
                    self._device_cache_pooled, dq, ds, dl_eff,
                    k=min(limit, d.shape[0]), n_candidates=n_cand, d_full=d,
                )
            vals, inds = np.asarray(vv), np.asarray(vi)
        elif use_two_stage:
            oversampling = quant.oversampling if quant else 2.0
            rescore = quant.rescore if quant else True
            n_cand = min(int(np.ceil(limit * max(oversampling, 1.0))), d.shape[0])
            dq, ds = self._device_cache_int8
            approx = maxsim_ops.maxsim_scores_int8_pallas(
                jnp.asarray(q[None, ...], jnp.float32), dq, ds, None, dl_eff,
                interpret=jax.default_backend() != "tpu",
            )
            cv, ci = topk_ops.topk_with_stable_ties(approx, n_cand)
            if rescore:
                cand = jnp.take(d, ci[0], axis=0)
                cand_lens = jnp.take(dl_eff, ci[0])
                exact = maxsim_ops.maxsim_scores(qj, cand, None, cand_lens)
                vv, vi = topk_ops.topk_with_stable_ties(exact, min(limit, n_cand))
                vals = np.asarray(vv[0])
                inds = np.asarray(ci[0])[np.asarray(vi[0])]
            else:
                vals = np.asarray(cv[0][:limit])
                inds = np.asarray(ci[0][:limit])
        elif self.mesh is not None:
            vv, vi = topk_ops.sharded_maxsim_topk(
                self.mesh, self.mesh_axis, qj, d, dl_eff, min(limit, d.shape[0])
            )
            vals, inds = np.asarray(vv[0]), np.asarray(vi[0])
        else:
            scores = maxsim_ops.maxsim_scores(qj, d, None, dl_eff)
            vv, vi = topk_ops.topk_with_stable_ties(scores, min(limit, d.shape[0]))
            vals, inds = np.asarray(vv[0]), np.asarray(vi[0])

        points = []
        for score, idx in zip(vals.tolist(), inds.tolist()):
            if idx >= len(self._ids) or score < _FILTERED_SCORE_FLOOR:
                continue  # padded or filtered-out page
            points.append(
                t.ScoredPoint(
                    id=self._ids[idx],
                    score=float(score),
                    payload=dict(self._payloads[idx]),
                    vector=(
                        self._vectors[idx, : self._lens[idx]].tolist()
                        if with_vectors else None
                    ),
                )
            )
        return t.QueryResponse(points=points[:limit])

    def _query_on_disk(
        self,
        q: np.ndarray,
        limit: int,
        query_filter: Optional[t.Filter],
        search_params: Optional[t.SearchParams],
        with_vectors: bool,
    ) -> t.QueryResponse:
        """Two-stage search with host-resident originals: device pooled
        prefilter -> host gather of the oversampled candidates -> exact
        device rescore. Bit-matches the device-resident pooled path (the
        rescore math is identical; only where the originals live differs).

        ``QuantizationSearchParams.ignore=True`` is honored exactly as on
        the device path: the prefilter is bypassed and the full corpus is
        streamed through the exact scorer. As on the device pooled path,
        ``rescore`` is not consulted (candidates are always rescored from
        the originals)."""
        from multimodal_colpali_tpu.ops.two_stage import (
            coarse_topk, rescore_candidates)

        quant0 = search_params.quantization if search_params else None
        if quant0 is not None and quant0.ignore:
            return self._query_on_disk_exact(q, limit, query_filter,
                                             with_vectors)

        pooled, dl = self._ensure_device_on_disk()
        dl_eff = self._filter_lens(dl, query_filter)
        quant = search_params.quantization if search_params else None
        oversampling = quant.oversampling if quant else 2.0
        p_total = pooled.shape[0]
        n_cand = min(max(int(np.ceil(limit * max(oversampling, 1.0))), limit),
                     p_total)

        cand = np.asarray(coarse_topk(
            jnp.asarray(q, jnp.float32), jnp.int32(q.shape[0]),
            pooled, dl_eff, n_candidates=n_cand))

        # host gather: only the candidates' originals travel to the device
        # (memmap-friendly row indexing when the store was loaded on_disk)
        n_real = len(self._ids)
        safe = np.minimum(cand, max(n_real - 1, 0))
        pages = _gather_rows(self._vectors, safe)  # raw corpus dtype:
        # the device casts inside the rescore jit; host f16->f32/bf16
        # conversion would cost 10x the read itself
        lens = self._lens[safe].astype(np.int32).copy()
        for row, idx in enumerate(cand.tolist()):
            if idx >= n_real or (query_filter is not None
                                 and not query_filter.matches(self._payloads[idx])):
                lens[row] = 0  # padded/filtered candidate scores MASK_VALUE
        vals, order = rescore_candidates(
            jnp.asarray(q, jnp.float32), jnp.int32(q.shape[0]),
            # cast to the store dtype ON DEVICE so scores bit-match the
            # HBM-resident path (which scores in self.dtype)
            jnp.asarray(pages).astype(self.dtype), jnp.asarray(lens),
            k=min(limit, n_cand))
        vals = np.asarray(vals)
        inds = cand[np.asarray(order)]

        points = []
        for score, idx in zip(vals.tolist(), inds.tolist()):
            if idx >= n_real or score < _FILTERED_SCORE_FLOOR:
                continue
            points.append(t.ScoredPoint(
                id=self._ids[idx], score=float(score),
                payload=dict(self._payloads[idx]),
                vector=(self._vectors[idx, : self._lens[idx]].tolist()
                        if with_vectors else None),
            ))
        return t.QueryResponse(points=points[:limit])

    def _query_on_disk_exact(
        self,
        q: np.ndarray,
        limit: int,
        query_filter: Optional[t.Filter],
        with_vectors: bool,
        chunk: int = 2048,
    ) -> t.QueryResponse:
        """Exact full scan over a host-resident corpus: stream memmap
        chunks of originals through the device MaxSim scorer and keep a
        host-side running ranking (score desc, index asc on ties — same
        tie rule as ``topk_with_stable_ties``)."""
        n_real = len(self._ids)
        qj = jnp.asarray(q[None, ...], self.dtype)
        lens_eff = self._lens[:n_real].astype(np.int32).copy()
        if query_filter is not None:
            for i, payload in enumerate(self._payloads):
                if not query_filter.matches(payload):
                    lens_eff[i] = 0
        all_scores = np.empty(n_real, dtype=np.float32)
        for start in range(0, n_real, chunk):
            stop = min(start + chunk, n_real)
            pages = np.asarray(self._vectors[start:stop], dtype=np.float32)
            scores = maxsim_ops.maxsim_scores(
                qj, jnp.asarray(pages, self.dtype), None,
                jnp.asarray(lens_eff[start:stop]))
            all_scores[start:stop] = np.asarray(scores[0], dtype=np.float32)
        k = min(limit, n_real)
        order = np.lexsort((np.arange(n_real), -all_scores))[:k]

        points = []
        for idx in order.tolist():
            score = float(all_scores[idx])
            if score < _FILTERED_SCORE_FLOOR:
                continue
            points.append(t.ScoredPoint(
                id=self._ids[idx], score=score,
                payload=dict(self._payloads[idx]),
                vector=(self._vectors[idx, : self._lens[idx]].tolist()
                        if with_vectors else None),
            ))
        return t.QueryResponse(points=points[:limit])

    # -- persistence -------------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        if self.on_disk:
            # raw .npy so load() can memory-map the originals - the disk
            # file IS the storage tier, not a compressed snapshot of it.
            # Write-to-temp + rename: self._vectors may BE the memmap of
            # the destination file (load -> save round trip); np.save'ing
            # straight over it would truncate the backing file before the
            # data is read out and corrupt the corpus.
            for fname, arr in (("vectors.npy", self._vectors),
                               ("lens.npy", self._lens)):
                dest = os.path.join(directory, fname)
                tmp = dest + ".tmp"
                with open(tmp, "wb") as f:
                    np.save(f, np.ascontiguousarray(arr))
                os.replace(tmp, dest)
        else:
            np.savez_compressed(
                os.path.join(directory, "vectors.npz"),
                vectors=self._vectors, lens=self._lens,
            )
        meta = {
            "name": self.name, "dim": self.dim, "max_tokens": self.max_tokens,
            "distance": self.distance.value, "quantized": self.quantized,
            "prefilter": self.prefilter,
            "pooled_centroids": self.pooled_centroids,
            "on_disk": self.on_disk,
            "dtype": jnp.dtype(self.dtype).name,
            "kind": "multivector",
            "ids": self._ids, "payloads": self._payloads,
        }
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, directory: str, mesh: Optional[Mesh] = None,
             mesh_axis: str = "corpus") -> "MultiVectorStore":
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        store = cls(
            name=meta["name"], dim=meta["dim"], max_tokens=meta["max_tokens"],
            distance=t.Distance(meta["distance"]), quantized=meta["quantized"],
            prefilter=meta.get("prefilter", "int8"),
            pooled_centroids=meta.get("pooled_centroids", 1),
            on_disk=meta.get("on_disk", False),
            dtype=jnp.dtype(meta["dtype"]) if "dtype" in meta else jnp.bfloat16,
            mesh=None if meta.get("on_disk", False) else mesh,
            mesh_axis=mesh_axis,
        )
        if store.on_disk:
            # memory-map: host RAM holds only pages a query actually touches
            store._vectors = np.load(os.path.join(directory, "vectors.npy"),
                                     mmap_mode="r")
            store._lens = np.asarray(
                np.load(os.path.join(directory, "lens.npy")))
        else:
            data = np.load(os.path.join(directory, "vectors.npz"))
            store._vectors = data["vectors"]
            store._lens = data["lens"]
        store._ids = meta["ids"]
        store._payloads = meta["payloads"]
        store._id_to_idx = {pid: i for i, pid in enumerate(store._ids)}
        return store
