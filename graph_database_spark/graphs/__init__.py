from .pagerank import pagerank, pagerank_batch
from .builder import build_vertices, build_edges

__all__ = ["pagerank", "pagerank_batch", "build_vertices", "build_edges"]
