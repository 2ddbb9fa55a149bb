"""aml_feature_store_spark — a PySpark-native analytics / feature-store engine.

Re-expresses the computational surface of the reference AML feature store
(streaming trailing-window features, point-in-time batch features,
statistical/graph/behavioral aggregates, online serving, risk scoring) as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required for 100 TB-scale training-data pipelines.

Design stance (SURVEY.md §7): one shared feature-definition layer compiled
to (a) batch window plans and (b) streaming stateful plans; wide-column
feature tables; everything expressible as DataFrame ops stays JVM-side;
pandas UDFs only where relational formulation is impossible.
"""

__version__ = "0.1.0"
