from .provider import (  # noqa: F401
    EmbeddingProvider,
    HashEmbeddingProvider,
    embed_text_column,
)
