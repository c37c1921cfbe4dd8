from .vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    unit_normalize,
)
