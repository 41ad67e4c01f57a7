from harvester_ray.index.build import IndexPaths, build_index, spimi_postings_batch
from harvester_ray.index.query import InvertedIndex, QueryActor

__all__ = [
    "IndexPaths",
    "build_index",
    "spimi_postings_batch",
    "InvertedIndex",
    "QueryActor",
]
