"""e_commerce_click_stream_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference clickstream pipeline
(`uncoated-engineering/e-commerce-click-stream`, read-only snapshot at
/root/reference): sessionized clickstream metrics, hourly tumbling-window
aggregates, dashboard KPIs, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
the reference lacks.

Everything is declared through the DataFrame / SQL API so Catalyst owns the
physical plan (pushdown, pruning, AQE, broadcast); Python UDFs appear only
where built-ins genuinely can't express the semantics.
"""

from e_commerce_click_stream_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
