from .extract import (  # noqa: F401
    EXTRACT_SCHEMA,
    PAGES_SCHEMA,
    assemble_documents,
    extract_documents,
    extract_pages,
)
from . import ann, dedup, multimodal  # noqa: F401
