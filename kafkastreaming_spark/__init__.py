"""kafkastreaming_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Catalyst / Structured
Streaming) engine with the query and data-processing capabilities of the
reference ``BastienBP/kafkaStreaming`` stream-processor category, extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed to scale to 100 TB clusters.

The normative operator contract is SURVEY.md §2; every operator key there
maps to one registered query (``registry.QUERIES``) and, where SQL-
expressible, one DuckDB oracle (``registry.ORACLES``).

NOTE on reference citations: ``/root/reference/`` is an empty directory
(verified — SURVEY.md §0), so docstrings cite SURVEY.md sections instead of
reference file:line.
"""

__version__ = "0.1.0"
