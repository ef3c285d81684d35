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
