from harvester_ray.functions.text import (
    TOKEN_RE,
    TOKEN_SQL_RE,
    hash64,
    hash64_bytes,
    normalize_sort_text,
    tokenize,
    tokenize_column,
)
from harvester_ray.functions.codec import (
    varint_decode,
    varint_encode,
)

__all__ = [
    "TOKEN_RE",
    "TOKEN_SQL_RE",
    "hash64",
    "hash64_bytes",
    "normalize_sort_text",
    "tokenize",
    "tokenize_column",
    "varint_decode",
    "varint_encode",
]
