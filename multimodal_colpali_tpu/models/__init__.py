from multimodal_colpali_tpu.models.bert import BertEncoder  # noqa: F401
from multimodal_colpali_tpu.models.colpali import ColPaliModel  # noqa: F401
from multimodal_colpali_tpu.models.configs import (  # noqa: F401
    BertConfig,
    ColPaliModelConfig,
    GemmaTextConfig,
    SiglipVisionConfig,
)
from multimodal_colpali_tpu.models.processing import (  # noqa: F401
    ColPaliProcessor,
    ImagePreprocessor,
    SimpleTokenizer,
    pad_multivectors,
)
from multimodal_colpali_tpu.models.registry import (  # noqa: F401
    RETRIEVER_CONFIGS,
    Retriever,
    load_retriever,
)
from multimodal_colpali_tpu.models.text_encoder import BgeEmbeddings  # noqa: F401
