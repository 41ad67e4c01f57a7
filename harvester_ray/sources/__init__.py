from harvester_ray.sources.readers import (
    read_documents,
    read_jsonl_pages,
    read_pages,
    write_jsonl_pages,
)

__all__ = [
    "read_documents",
    "read_jsonl_pages",
    "read_pages",
    "write_jsonl_pages",
]
