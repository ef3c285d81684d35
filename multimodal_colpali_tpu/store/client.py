"""Collection-level client facade over the TPU vector stores.

Shaped like the subset of ``qdrant_client.QdrantClient`` the reference uses
(create/upsert/query_points/scroll/delete/count: functions.py:827-929,
1066-1234, 1310-1333; 01_create_context_qdrant.py:208-222), so pipeline code
written against the reference's vector-store seam ports 1:1, but everything
executes in-process on TPU - there is no server, no REST, no network hop on
the retrieval hot path.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

from jax.sharding import Mesh

from multimodal_colpali_tpu.store import types as t
from multimodal_colpali_tpu.store.dense import DenseVectorStore
from multimodal_colpali_tpu.store.multivector import MultiVectorStore


class VectorClient:
    """In-process vector-database client with optional disk persistence.

    Args:
      path: directory for persistence (collections are saved there on
        ``save()`` and loaded lazily on first access). ``None`` = in-memory.
      mesh: optional device mesh; collections shard their page axis over
        ``mesh_axis`` and queries use the sharded MaxSim+top-k path.
    """

    def __init__(self, path: Optional[str] = None, mesh: Optional[Mesh] = None,
                 mesh_axis: str = "corpus"):
        self.path = path
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._collections: Dict[str, Union[DenseVectorStore, MultiVectorStore]] = {}
        if path:
            os.makedirs(path, exist_ok=True)
            self._load_all()

    # -- collection lifecycle ------------------------------------------------

    def _coll_dir(self, name: str) -> str:
        assert self.path is not None
        return os.path.join(self.path, name)

    def _load_all(self) -> None:
        import json
        for name in sorted(os.listdir(self.path)):
            meta_path = os.path.join(self.path, name, "meta.json")
            if not os.path.exists(meta_path):
                continue
            with open(meta_path) as f:
                kind = json.load(f).get("kind", "dense")
            cls = MultiVectorStore if kind == "multivector" else DenseVectorStore
            self._collections[name] = cls.load(
                os.path.join(self.path, name), mesh=self.mesh, mesh_axis=self.mesh_axis
            )

    def collection_exists(self, collection_name: str) -> bool:
        return collection_name in self._collections

    def create_collection(
        self,
        collection_name: str,
        vectors_config: t.VectorParams,
        quantized: bool = False,
        prefilter: str = "int8",
        max_tokens: int = 1056,
        **_: Any,
    ) -> bool:
        if vectors_config.multivector_config is not None:
            on_disk = bool(getattr(vectors_config, "on_disk", False))
            store: Union[DenseVectorStore, MultiVectorStore] = MultiVectorStore(
                name=collection_name,
                dim=vectors_config.size,
                max_tokens=max_tokens,
                distance=vectors_config.distance,
                quantized=quantized,
                prefilter=prefilter,
                on_disk=on_disk,
                mesh=None if on_disk else self.mesh,
                mesh_axis=self.mesh_axis,
            )
        else:
            store = DenseVectorStore(
                name=collection_name,
                dim=vectors_config.size,
                distance=vectors_config.distance,
                mesh=self.mesh,
                mesh_axis=self.mesh_axis,
            )
        self._collections[collection_name] = store
        return True

    def delete_collection(self, collection_name: str) -> bool:
        self._collections.pop(collection_name, None)
        if self.path:
            shutil.rmtree(self._coll_dir(collection_name), ignore_errors=True)
        return True

    def get_collections(self) -> t.CollectionsResponse:
        return t.CollectionsResponse(
            collections=[t.CollectionDescription(name=n) for n in self._collections]
        )

    def _get(self, name: str) -> Union[DenseVectorStore, MultiVectorStore]:
        if name not in self._collections:
            raise KeyError(f"collection {name!r} does not exist")
        return self._collections[name]

    # -- data plane ------------------------------------------------------------

    def upsert(self, collection_name: str, points: Sequence[t.PointStruct],
               **_: Any) -> t.UpdateResult:
        return self._get(collection_name).upsert(points)

    def query_points(
        self,
        collection_name: str,
        query: Any,
        limit: int = 5,
        query_filter: Optional[t.Filter] = None,
        search_params: Optional[t.SearchParams] = None,
        with_vectors: bool = False,
        **_: Any,
    ) -> t.QueryResponse:
        store = self._get(collection_name)
        if isinstance(store, MultiVectorStore):
            return store.query(query, limit=limit, query_filter=query_filter,
                               search_params=search_params, with_vectors=with_vectors)
        return store.query(query, limit=limit, query_filter=query_filter,
                           with_vectors=with_vectors)

    def scroll(self, collection_name: str, scroll_filter: Optional[t.Filter] = None,
               limit: int = 100, offset: int = 0, with_vectors: bool = False,
               **_: Any) -> Tuple[List[t.Record], Optional[int]]:
        return self._get(collection_name).scroll(
            flt=scroll_filter, limit=limit, offset=offset, with_vectors=with_vectors
        )

    def delete(self, collection_name: str,
               points_selector: Union[Sequence[Union[int, str]], t.Filter,
                                      t.FilterSelector, t.PointIdsList, None] = None,
               **_: Any) -> t.UpdateResult:
        store = self._get(collection_name)
        if isinstance(points_selector, t.FilterSelector):
            return store.delete(flt=points_selector.filter)
        if isinstance(points_selector, t.Filter):
            return store.delete(flt=points_selector)
        if isinstance(points_selector, t.PointIdsList):
            return store.delete(ids=points_selector.points)
        return store.delete(ids=points_selector)

    def count(self, collection_name: str, count_filter: Optional[t.Filter] = None,
              **_: Any) -> t.CountResult:
        return t.CountResult(count=self._get(collection_name).count(count_filter))

    # -- persistence -----------------------------------------------------------

    def save(self) -> None:
        if not self.path:
            raise ValueError("client was created without a persistence path")
        for name, store in self._collections.items():
            store.save(self._coll_dir(name))
