#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each result
directory written by graft.Verify, run the matching oracle SQL in
DuckDB over the same sf parquet tables and compare (rows, schema,
values, LOGICAL TYPES) with columns sorted by name and rows sorted by
all columns.

The driver's hash is type-aware: identical values hash differently
when DuckDB types an aggregate HUGEINT (uncast sum()) while Spark
emits BIGINT, or INTEGER vs BIGINT. So this gate also DESCRIBEs both
relations and fails on any per-column logical-type mismatch — the
class of bug that cost ts_native_hist_sum/pipe_pack_sequences in r7
and that value-compare alone can never catch.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(round(v, 9))
            else:
                canon_row.append(v)
        out.append(tuple(canon_row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def described_types(con, query):
    """column name -> DuckDB logical type, for an arbitrary query."""
    return {r[0]: r[1]
            for r in con.execute(f"DESCRIBE {query}").fetchall()}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_rel = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = sorted(spark_rel.description and
                            [d[0] for d in spark_rel.description])
        spark_rows = con.execute(
            f"SELECT {', '.join(spark_cols)} FROM '{out_dir}/{name}/*.parquet'"
        ).fetchall()
        if name not in oracle:
            status = "rows-only"
            ok = len(spark_rows) > 0
            detail = f"rows={len(spark_rows)}"
        else:
            try:
                duck_rel = con.execute(oracle[name])
                duck_cols_all = [d[0] for d in duck_rel.description]
                duck_rows_raw = duck_rel.fetchall()
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}")
                n_fail += 1
                continue
            duck_cols = sorted(duck_cols_all)
            idx = [duck_cols_all.index(c) for c in duck_cols]
            duck_rows = [tuple(r[i] for i in idx) for r in duck_rows_raw]
            schema_ok = spark_cols == duck_cols
            spark_types = described_types(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_types = described_types(con, f"({oracle[name]})")
            type_diffs = sorted(
                (c, spark_types.get(c), duck_types.get(c))
                for c in set(spark_types) | set(duck_types)
                if spark_types.get(c) != duck_types.get(c))
            types_ok = not type_diffs
            a, b = canon(spark_rows), canon(duck_rows)
            rows_ok = len(a) == len(b)
            hash_ok = a == b
            ok = schema_ok and rows_ok and hash_ok and types_ok
            status = "oracle"
            detail = (f"rows={len(a)}/{len(b)} schema={schema_ok} "
                      f"values={hash_ok} types={types_ok}")
            if type_diffs:
                detail += " type_diffs=" + "; ".join(
                    f"{c}: spark={s} duck={d}" for c, s, d in type_diffs)
            if not ok and schema_ok and rows_ok:
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        detail += f" first_diff@{i}: spark={x} duck={y}"
                        break
            elif not schema_ok:
                detail += f" spark_cols={spark_cols} duck_cols={duck_cols}"
        if ok:
            n_pass += 1
            print(f"PASS {name} [{status}] {detail}")
        else:
            n_fail += 1
            print(f"FAIL {name} [{status}] {detail}")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
