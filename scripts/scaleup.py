"""Scale /root/testdata/sf0.1 up K× into an in-repo directory for the sf1
overflow/scale sweep (round-7 verdict ask #3).

The driver ships sf≤0.1 only; the 100 TB design claims rest on plan shape
plus the round-6 overflow audit, which found one REAL sf≥1 int64 ceiling
(rel_share_of_parent).  This script manufactures an sf1-equivalent dataset
by replicating sf0.1 K=10 times with consistent key offsets, so every join
key space stays referentially intact and every additive aggregate grows
~K× — exactly the probe that surfaces latent fixed-point products and
window-state ceilings.  Dims region/nation are fixed (TPC-H semantics);
all other tables offset their synthetic keys by rep·10⁹ (far above any
base key, far below int64 overflow: 9 replicas ⇒ max key < 10¹⁰).

Distribution notes (what replication preserves / changes):
- per-group value DISTRIBUTIONS are preserved exactly; group CARDINALITIES
  over fixed dims (nation, mktsegment, event_type, day) scale K×;
- key-space cardinalities (customers, users, orders, docs) also scale K× —
  per-user/per-order series shapes replicate identically;
- replica 0 is byte-identical to sf0.1, so any sf0.1 result is a subset
  sanity anchor.

Usage: python scripts/scaleup.py [K] [out_dir] [table ...]
  defaults: K=10, out_dir=/root/repo/.scaledata/sf1  (gitignored)
  naming specific tables builds a PARTIAL dir (e.g. documents-only for the
  sf100 dedup probes — 600M-row lineitem would crowd the disk budget for
  nothing; scale_sweep --all-spark-only never opens the oracle views, so a
  partial dir is sufficient there)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000  # per-replica key offset

# table -> columns to offset by rep*OFF (BIGINT synthetic keys only; the
# INTEGER nationkey/label columns reference fixed dims and stay put)
KEYED = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    only = set(sys.argv[3:])
    unknown = only - set(KEYED)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # STREAM large COPYs instead of buffering them (sf100 lesson: with
    # insertion order preserved, DuckDB materialized the whole 600M-row
    # lineitem cross join in memory — >100 GB RSS — before writing a byte;
    # row order inside the output file is irrelevant to every consumer)
    con.sql("SET preserve_insertion_order = false")
    con.sql("SET memory_limit = '24GB'")
    os.makedirs(f"{out}/.duck_tmp", exist_ok=True)
    con.sql(f"SET temp_directory = '{out}/.duck_tmp'")
    for table, keys in KEYED.items():
        if only and table not in only:
            continue
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        # COPY goes to a temp path and renames on success (ADVICE r11):
        # DuckDB writes the destination directly, so a kill mid-write left a
        # non-empty TRUNCATED file the resume skip then trusted forever,
        # poisoning every probe at that scale.  rename() is atomic within
        # the directory, so `dst` either doesn't exist or is complete.
        tmp = f"{out}/.{table}.parquet.tmp"
        if os.path.exists(dst) and os.path.getsize(dst) > 0:
            print(f"{table}: exists, skipped")  # resumable after a kill
            continue
        if os.path.exists(tmp):
            os.remove(tmp)  # leftover from a killed run
        if not keys:  # fixed dims: copy through
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{tmp}' (FORMAT PARQUET)")
        else:
            cols = ", ".join(
                f"{c} + rep * {OFF} AS {c}" if c in keys else c
                for c in [
                    r[0]
                    for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
                ]
            )
            con.sql(
                f"COPY (SELECT {cols} FROM '{src}' "
                f"CROSS JOIN (SELECT UNNEST(RANGE({k})) AS rep) reps) "
                f"TO '{tmp}' (FORMAT PARQUET)"
            )
        # read_parquet(), not the bare-path replacement scan: the tmp name
        # starts with a dot and DuckDB treats dot-files as hidden, so the
        # replacement scan refuses them (CatalogException)
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{tmp}')").fetchone()[0]
        os.rename(tmp, dst)
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
