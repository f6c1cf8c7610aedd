"""mongodb_cdc_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the MinervaDB/mongodb-cdc reference
(`/root/reference/mongodb-cdc-program.js`, a MongoDB change-data-capture
replication pipeline) as an idiomatic Apache Spark engine:

* batch relational surface (scans, filters, joins, aggregations, windows,
  sorts, set ops, scalar functions) over a star schema,
* CDC-semantic composite operators (upsert-apply, reconciliation diffs,
  window audits, checkpoint-lag health) — batch formulations of the
  reference's runtime behavior,
* a Structured Streaming layer mirroring the reference's actual dataflow
  (change-feed source -> filter -> micro-batch -> idempotent upsert sink
  with native checkpointing),
* LLM-data-pipeline extensions (dedup exact/MinHash/SimHash, similarity
  search, text analysis, multimodal column plumbing).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then as Arrow-vectorized pandas UDFs).
"""

from mongodb_cdc_spark.session import get_spark
from mongodb_cdc_spark.io import load_table, TABLE_NAMES
from mongodb_cdc_spark.registry import QUERIES, ORACLES, query

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "TABLE_NAMES", "QUERIES", "ORACLES", "query"]
