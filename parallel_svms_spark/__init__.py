"""parallel_svms_spark — a PySpark-native analytics + parallel-SVM engine.

Clean-room rebuild of the capabilities of uditapatel/Parallel_SVMs
(a Hadoop-MapReduce parallel-SVM study: Cascade / Bagging / Iterative
SVM over LibSVM), re-expressed Spark-first:

- relational/dataflow operators as thin, *tested* DataFrame functions
  (``operators.relational``, ``operators.partitioning``),
- the partition-grained SVM trainer as ``applyInPandas`` over a numpy
  SMO dual solver (``ml.smo``, ``ml.trainer``),
- the three algorithm drivers as driver-side loops over Spark actions
  (``ml.cascade``, ``ml.bagging``, ``ml.iterative``),
- LLM-data-pipeline extension operators (dedup, similarity search,
  text analysis, event windows, multimodal plumbing) designed for
  100 TB scale (``operators.dedup/similarity/text/events/multimodal``).

Reference citations in docstrings point at /root/reference (read-only).
"""

__version__ = "0.1.0"
