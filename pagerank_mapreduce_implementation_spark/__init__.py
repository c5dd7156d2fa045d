"""spark-graft: a PySpark-native graph & text analytics engine.

Brand-new implementation (DataFrame/Catalyst-first) of the query and
data-processing capabilities of ``viseshrp/PageRank-MapReduce-Implementation``
(see SURVEY.md for the full operator inventory with file:line citations),
plus large-scale training-data-pipeline extensions (dedup, similarity
search, multimodal plumbing, text analysis, streaming).
"""

from pagerank_mapreduce_implementation_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
