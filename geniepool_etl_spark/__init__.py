"""geniepool_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full query and data-processing surface of the reference
genomic data-lake ETL system (see SURVEY.md; reference at
/root/reference/src/main/java/spark/ImportVcfToDataLakeByRanges.java)
with an idiomatic Spark DataFrame architecture, and extends it with the
operators a 100 TB-scale LLM training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
search, text analysis, multimodal column plumbing, and Structured
Streaming over event data.

Design principles (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst plans everything (no RDDs, no driver loops).
- Explicit schemas at every scan (no inference passes over big inputs).
- Broadcast small dimension tables; shuffle-partition discipline on the
  lake write path (``repartition(partition cols)`` + ``maxRecordsPerFile``).
- Python UDFs are a last resort; none are needed for reference parity.
"""

from geniepool_etl_spark.config import MAX_RECORDS_PER_FILE, PARTITION_SIZE
from geniepool_etl_spark.session import get_spark

__all__ = ["PARTITION_SIZE", "MAX_RECORDS_PER_FILE", "get_spark"]

__version__ = "0.1.0"
