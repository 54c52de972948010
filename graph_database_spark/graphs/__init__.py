"""Graph algorithms package.

`graphs.pagerank` is the SUBMODULE (so both `from
graph_database_spark.graphs.pagerank import pagerank` and `import
graph_database_spark.graphs.pagerank as pr` work); the package-level
re-export of the function uses the distinct name `pagerank_scores` so
the submodule attribute is never shadowed (r10 verdict defect #3).
"""

from . import pagerank as pagerank  # the submodule — do not rebind below
from .pagerank import pagerank as pagerank_scores
from .pagerank import pagerank_batch
from .builder import assert_unique, build_edges, build_vertices
from .traversal import connected_components, shortest_paths
from .motif import find_motif

__all__ = ["pagerank", "pagerank_scores", "pagerank_batch",
           "assert_unique", "build_edges", "build_vertices",
           "connected_components", "shortest_paths", "find_motif"]
