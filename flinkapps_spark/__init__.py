"""flinkapps_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``bigdatalabsg/flinkapps`` (13 Flink streaming/batch jobs; see SURVEY.md)
as an idiomatic Spark engine:

- batch + streaming DataFrame pipelines (Structured Streaming),
- the reference's full operator inventory (sources, filters, projections,
  derivations, windowed/grouped aggregation, SQL surface, sinks),
- plus the large-scale training-data-pipeline operators a 100 TB deployment
  needs: dedup (exact/MinHash-LSH/SimHash/n-gram-Jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy and whole-stage codegen; Python UDFs are avoided in
hot paths (Arrow-batched ``applyInPandas`` only where semantics require).
"""

__version__ = "0.1.0"

from flinkapps_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session", "__version__"]
