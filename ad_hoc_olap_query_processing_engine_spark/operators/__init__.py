"""Operator library beyond the Phi core: relational completeness
(SURVEY.md §2.3), LLM-data-pipeline ops (dedup, similarity, text analysis,
multimodal plumbing), each registered in ``registry`` with a Spark
implementation and (where SQL-expressible) a DuckDB oracle."""
