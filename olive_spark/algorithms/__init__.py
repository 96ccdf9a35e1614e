"""The reference's example apps, re-expressed on the Pregel core.

PageRank (PageRank.cu), BFS (BFS.cu), SSSP (SSSP.cu) exist in the
reference; connected components and label propagation reuse the same
gather-min skeleton (north rule); triangle counting is the one
algorithm that is NOT gather-apply-scatter — it is a sorted-adjacency
intersection (SURVEY.md §7 M3).
"""

from olive_spark.algorithms.bfs import bfs
from olive_spark.algorithms.cc import connected_components
from olive_spark.algorithms.hits import hits
from olive_spark.algorithms.kcore import kcore
from olive_spark.algorithms.labelprop import label_propagation
from olive_spark.algorithms.pagerank import pagerank, personalized_pagerank
from olive_spark.algorithms.sssp import sssp
from olive_spark.algorithms.triangles import triangle_count

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "bfs",
    "sssp",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "hits",
    "kcore",
]
