from pagerank_mapreduce_implementation_spark.plans.iterative import IterationDriver

__all__ = ["IterationDriver"]
