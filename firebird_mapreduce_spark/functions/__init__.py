"""Reusable column-expression builders (all JVM-side built-ins — no Python
UDFs in hot paths).

- ``hashing`` — token shingles, md5-based MinHash arrays, portable SimHash.
- ``vectors`` — double-precision cosine/dot/norm over ``array<float>``.
"""

from .hashing import shingles, simhash16, tokens
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "shingles",
    "simhash16",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
