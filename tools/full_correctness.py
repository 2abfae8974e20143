"""Full-registry driver-sim correctness sweep (r11 advice #4).

The grading driver's CORRECTNESS_r{N}.json covers only the first 50
alphabetical keys; this tool regenerates the SAME per-key record —
rows_match / schema_match / hash_match vs the DuckDB oracle at sf0.01,
in a fresh driver-shaped SparkSession — over the ENTIRE registry, so a
round's correctness claim is backed by a committed artifact instead of
"the pytest sweep was green on my machine".

Usage:
    python tools/full_correctness.py [out.json]
defaults to CORRECTNESS_full_r12.json in the repo root. Exit code 1 if
any oracle key mismatches. Keys without an oracle record err=no_oracle
(the driver contract's rows-only surface).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_full_r12.json",
    )
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.parity import compare_frames

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    failed: list[str] = []
    for i, (k, fn) in enumerate(sorted(qs.items())):
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(pdf)
            if k not in oracles:
                rec["err"] = "no_oracle"
            else:
                ora = con.execute(oracles[k]).fetchdf()
                rec["oracle_rows"] = len(ora)
                rec["rows_match"] = len(pdf) == len(ora)
                try:
                    compare_frames(pdf, ora, key=k)
                    rec["schema_match"] = True
                    rec["hash_match"] = True
                except AssertionError as exc:
                    rec["schema_match"] = sorted(pdf.columns) == sorted(
                        ora.columns
                    )
                    rec["hash_match"] = False
                    rec["err"] = str(exc)[:300]
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        if rec["err"] not in (None, "no_oracle") or rec["hash_match"] is False:
            failed.append(k)
        results[k] = rec
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{len(qs)} swept, {len(failed)} failed",
                  flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    n_oracle = sum(1 for r in results.values() if r["err"] != "no_oracle")
    print(
        f"swept {len(results)} keys ({n_oracle} oracle,"
        f" {len(results) - n_oracle} rows-only) -> {out_path}"
    )
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
