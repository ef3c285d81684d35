from multimodal_colpali_tpu.store.client import VectorClient  # noqa: F401
from multimodal_colpali_tpu.store.dense import DenseVectorStore  # noqa: F401
from multimodal_colpali_tpu.store.multivector import MultiVectorStore  # noqa: F401
from multimodal_colpali_tpu.store.types import (  # noqa: F401
    Distance,
    FieldCondition,
    Filter,
    FilterSelector,
    MatchAny,
    MatchValue,
    PointIdsList,
    MultiVectorComparator,
    MultiVectorConfig,
    PointStruct,
    QuantizationSearchParams,
    QueryResponse,
    Record,
    ScoredPoint,
    SearchParams,
    VectorParams,
)


def __getattr__(name):
    # Lazy: the distributed view initializes device arrays at import users'
    # choosing, not at package import.
    if name == "DistributedCorpusView":
        from multimodal_colpali_tpu.store.distributed import DistributedCorpusView

        return DistributedCorpusView
    raise AttributeError(name)
