"""Mirror of the driver's correctness gate: run every __spark_entry__
query on Spark and its DuckDB oracle twin side-by-side at sf0.01,
compare row count + sorted-column value multiset.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

import sys

sys.path.insert(0, ".")


import os

# ORACLE_STRICT=1: compare float reprs bit-exactly instead of %.6g —
# the driver's value hash is render-exact, so FP drift that the loose
# form hides WILL fail the driver; all 52 oracles are strict-green as
# of round 2 (keep them that way).
STRICT = os.environ.get("ORACLE_STRICT", "0") == "1"


def normalize(rows, cols):
    """Order-insensitive compare form: per-row dict → sorted col order →
    stringified (float rounding unless ORACLE_STRICT=1)."""
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = repr(v) if STRICT else f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from pdf_extraction_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(
        app_name="oracle_check", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        finally:
            # several operators persist internal frames (semdedup,
            # ppl_buckets, curate_corpus) — drop residue so one query
            # cannot skew the next's memory/runtime across the sweep
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [dict(zip(ocols, r)) for r in res.fetchall()]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"COLS spark={sorted(scols)} duck={sorted(ocols)}"))
            print(f"[FAIL-cols] {name}: spark={sorted(scols)} duck={sorted(ocols)}")
            continue
        sn, on = normalize(srows, scols), normalize(orows, ocols)
        if len(sn) != len(on):
            failures.append((name, f"ROWS spark={len(sn)} duck={len(on)}"))
            print(f"[FAIL-rows] {name}: spark={len(sn)} duck={len(on)}")
            continue
        if sn != on:
            diff_s = [x for x in sn if x not in set(on)][:3]
            diff_o = [x for x in on if x not in set(sn)][:3]
            failures.append((name, f"VALUES spark_only={diff_s} duck_only={diff_o}"))
            print(f"[FAIL-values] {name}:\n  spark_only={diff_s}\n  duck_only={diff_o}")
            continue
        print(f"[OK] {name}: {len(sn)} rows")

    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
