from .pagerank import pagerank, pagerank_batch
from .builder import assert_unique, build_edges, build_vertices
from .traversal import connected_components, shortest_paths
from .motif import find_motif

__all__ = ["pagerank", "pagerank_batch", "assert_unique", "build_edges",
           "build_vertices", "connected_components", "shortest_paths", "find_motif"]
