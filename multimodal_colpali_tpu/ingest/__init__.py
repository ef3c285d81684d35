from multimodal_colpali_tpu.ingest.chunker import Chunk, HybridChunker  # noqa: F401
from multimodal_colpali_tpu.ingest.pdf_loader import (  # noqa: F401
    check_ocr,
    data_preparation,
    pdf_loader,
)
from multimodal_colpali_tpu.ingest.preprocess import resize_image  # noqa: F401
from multimodal_colpali_tpu.ingest.rasterize import (  # noqa: F401
    PdfDocument,
    convert_pdf_dir_to_images,
    convert_pdfs_to_images,
)
