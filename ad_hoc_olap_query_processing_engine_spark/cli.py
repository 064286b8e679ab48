"""Query-file CLI — the reference's front door, Spark-native.

The reference reads a ``~``-separated Φ-spec file, *generates a Java program
per query*, and each program prints an 18-wide column dump plus a
``Total Records : N`` footer (reference: src/AdhocQueryProcessor.java:41-151,
generated printer src/QueryProcessor1.java:305-315). Here the "generated
program" is a Catalyst plan: parse → compile → run, same output format.

Usage:
    python -m ad_hoc_olap_query_processing_engine_spark.cli QUERY_FILE \
        [--sf-dir /root/testdata/sf0.01] [--sql] [--explain] [--limit N]

``--sql`` additionally prints the generated ANSI SQL (the textbook
formulation from phi/sqlgen.py — what the reference's codegen is to Java,
this is to SQL). ``--explain`` prints the physical plan instead of rows.
"""

from __future__ import annotations

import argparse
import sys

from .phi import compile_phi, parse_queries, phi_to_sql
from .sources import catalog


def _print_fixed_width(rows, columns, width: int = 18) -> int:
    """Reference output format: %-18s columns, then the record count
    (reference: src/QueryProcessor1.java:16-36,305-315)."""
    print("".join(f"{c:<{width}}" for c in columns))
    print("-" * (width * len(columns)))
    n = 0
    for row in rows:
        print("".join(f"{'' if v is None else v!s:<{width}}" for v in row))
        n += 1
    print()
    print(f"Total Records : {n}")
    return n


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run Φ (MF/EMF) queries from a spec file")
    ap.add_argument("query_file")
    ap.add_argument("--sf-dir", default=catalog.DEFAULT_SF_DIR)
    ap.add_argument("--sql", action="store_true", help="print generated ANSI SQL")
    ap.add_argument("--explain", action="store_true", help="print physical plan, not rows")
    ap.add_argument("--limit", type=int, default=0, help="cap printed rows (0 = all)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--table",
        default="sales",
        help="run against any registered table (default: the sales view)",
    )
    args = ap.parse_args(argv)

    # read the file before paying JVM startup — missing files fail fast
    with open(args.query_file) as fh:
        text = fh.read()

    from .session import get_spark

    spark = get_spark(app_name="phi-cli", cpus=args.cpus)
    catalog.register_sales_view(spark, args.sf_dir)
    sales = spark.table(args.table)
    queries = parse_queries(text, known_cols=set(sales.columns))
    for i, q in enumerate(queries, start=1):
        print(f"=== Query {i}: select {', '.join(q.select)}")
        if args.sql:
            print(phi_to_sql(q, relation_name=args.table))
            print()
        df = compile_phi(q, sales)
        if args.explain:
            df.explain("formatted")
            continue
        if args.limit:
            df = df.limit(args.limit)
        _print_fixed_width((tuple(r) for r in df.toLocalIterator()), df.columns)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
