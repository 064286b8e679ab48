"""PySpark-native ad-hoc OLAP engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
MF/EMF (Phi-operator) query engine (reference surveyed in /root/repo/SURVEY.md;
semantics from Chatziantoniou & Ross, "Querying Multiple Features of Groups in
Relational Databases", VLDB 1996).

Layout:
  phi/        Phi mini-language parser, logical IR, Spark planner, SQL generator
  sources/    table registry over parquet dirs + the `sales` derivation view
  operators/  relational completeness + LLM-data-pipeline ops (dedup,
              similarity, text analysis, multimodal plumbing)
  functions/  scalar/aggregate helper expressions (built-in F.* compositions)
  plans/      plan-inspection utilities (explain assertions for tests/bench)
  streaming/  Structured Streaming windows over the events table
"""

__version__ = "0.1.0"
