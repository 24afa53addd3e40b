"""katta_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-creates the capabilities of sgroschupf/katta ("Lucene in the cloud":
partitioned inverted-index build + distributed top-k search with globally
consistent scoring) as idiomatic PySpark dataflow:

- index build  -> katta_spark.build   (Katta: IndexerJob.java + shard deploy)
- query top-k  -> katta_spark.query   (Katta: LuceneClient/LuceneServer 2-phase)
- global stats -> broadcast stats table (Katta: DocumentFrequencyWritable)
- oracle       -> katta_spark.oracle  (Katta: LuceneComplianceTest monolithic index)

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior (cited file:line in docstrings).
"""

__version__ = "0.1.0"

from katta_spark.scoring import BM25_B, BM25_K1  # noqa: F401
