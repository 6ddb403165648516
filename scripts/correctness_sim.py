"""Pre-flight the driver's correctness gate locally.

Runs every `__spark_entry__.queries()` entry at a given sf dir and its
`oracle_sql()` twin in DuckDB over the same parquet tables, then compares
row count, sorted column names, dtype families, and exact sorted-row
values (the driver's hash compare is value-exact after sorting columns by
name, so exact tuple equality here implies hash_match there).

Usage: python scripts/correctness_sim.py [sf_dir]   (default sf0.01)
Exit code 1 if any entry mismatches.
"""

import json
import math
import sys

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    try:  # Decimal, numpy scalars, timestamps -> comparable canonical forms
        import datetime
        import decimal

        import numpy as np

        if isinstance(v, decimal.Decimal):
            return float(v) if v % 1 else int(v)
        if isinstance(v, np.generic):
            return _canon(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_canon(x) for x in v.tolist())
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
    except ImportError:
        pass
    return v


def _rows(cols, records):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in records]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entry_mod
    from mithril_spark.session import get_spark

    spark = get_spark()
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    results, failed = {}, []
    for name, fn in queries.items():
        res = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None}
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_recs = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                res["err"] = "no_oracle"
                res["spark_rows"] = len(s_recs)
            else:
                cur = con.execute(sql)
                o_cols = [d[0] for d in cur.description]
                o_recs = cur.fetchall()
                res["rows_match"] = len(s_recs) == len(o_recs)
                sc, sr = _rows(s_cols, s_recs)
                oc, orr = _rows(o_cols, o_recs)
                res["schema_match"] = sc == oc
                res["hash_match"] = sr == orr
                res["spark_rows"] = len(s_recs)
                res["oracle_rows"] = len(o_recs)
                if not (res["rows_match"] and res["schema_match"]
                        and res["hash_match"]):
                    failed.append(name)
                    if sc != oc:
                        res["schema_diff"] = {"spark": sc, "oracle": oc}
                    else:
                        diff = [(a, b) for a, b in zip(sr, orr) if a != b]
                        res["first_value_diff"] = repr(diff[:2])[:400]
        except Exception as e:  # noqa: BLE001 - report and continue
            res["err"] = f"{type(e).__name__}: {e}"[:300]
            failed.append(name)
        results[name] = res
        ok = ("SKIP(no_oracle)" if res["err"] == "no_oracle" else
              "FAIL" if name in failed else "ok")
        print(f"{name:28s} {ok}", flush=True)

    print(json.dumps(results, indent=1, default=str))
    n_oracled = sum(1 for r in results.values() if r["err"] != "no_oracle")
    print(f"\n{n_oracled - len(failed)}/{n_oracled} oracled entries green; "
          f"{len(failed)} failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
