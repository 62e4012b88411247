#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify's output dir (one parquet dir per query + oracle_sql.json),
runs each oracle in DuckDB against the sf parquet tables, and compares
row counts, column names, and sorted values. Usage:

    python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle output types the driver's typed hasher is known to treat identically
# to the Spark parquet types. Anything else (HUGEINT from integer SUM,
# DECIMAL, UBIGINT, ...) hashes differently even when every value matches —
# exactly what failed q_sessionize/q_pack_assemble in round 11 while this
# replica (fetchall -> Python int) stayed green. List element types count.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "FLOAT", "BOOLEAN", "VARCHAR",
                 "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"}


def type_lint(rel):
    """Return [(col, type)] entries whose type is outside ALLOWED_TYPES."""
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        base = str(typ)
        while base.endswith("[]"):  # allow lists of allowed scalars
            base = base[:-2]
        if base not in ALLOWED_TYPES:
            bad.append((col, str(typ)))
    return bad


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):  # includes numpy.float64 (a float subclass)
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    # Nested containers: normalize numerics RECURSIVELY before
    # stringifying, so a Double inside an array compares by rounded
    # value rather than repr (a formatting difference would false-fail).
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(canon(x)) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon(x)}" for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))) + "}"
    if hasattr(v, "tolist"):  # numpy arrays / scalars from DuckDB LIST results
        return canon(v.tolist())
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = {}
    for name, sql in sorted(oracle.items()):
        entry = {}
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            results[name] = {"error": f"spark result unreadable: {e}"}
            continue
        try:
            ora_rel = con.sql(sql)
            ora_cols = sorted(ora_rel.columns)
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            results[name] = {"error": f"oracle failed: {e}"}
            continue
        entry["rows_match"] = len(spark_rows) == len(ora_rows)
        entry["schema_match"] = spark_cols == ora_cols
        bad_types = type_lint(ora_rel)
        if bad_types:
            entry["oracle_type_lint"] = [f"{c}: {t}" for c, t in bad_types]
        # Per-column oracle-vs-spark type divergence: warning only (the driver
        # tolerates e.g. timestamp precision differences), but it is the first
        # place to look when the driver disagrees with this replica.
        stypes = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        otypes = dict(zip(ora_rel.columns, map(str, ora_rel.types)))
        mism = [f"{c}: spark={stypes[c]} oracle={otypes[c]}"
                for c in stypes if c in otypes and stypes[c] != otypes[c]]
        if mism:
            entry["type_mismatch_warn"] = mism
        if entry["schema_match"]:
            scol = spark_rel.columns
            ocol = ora_rel.columns
            sidx = [scol.index(c) for c in spark_cols]
            oidx = [ocol.index(c) for c in ora_cols]
            key = lambda row: tuple((v is None, str(type(v)), v) for v in row)
            sset = sorted((tuple(canon(r[i]) for i in sidx) for r in spark_rows), key=key)
            oset = sorted((tuple(canon(r[i]) for i in oidx) for r in ora_rows), key=key)
            entry["hash_match"] = sset == oset
            if not entry["hash_match"]:
                diff_a = [r for r in sset if r not in set(oset)][:3]
                diff_b = [r for r in oset if r not in set(sset)][:3]
                entry["spark_only"] = [list(map(str, r)) for r in diff_a]
                entry["oracle_only"] = [list(map(str, r)) for r in diff_b]
        else:
            entry["hash_match"] = False
            entry["spark_cols"] = spark_cols
            entry["oracle_cols"] = ora_cols
        entry["n_rows"] = len(spark_rows)
        results[name] = entry

    # queries without oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(con.sql(f"SELECT * FROM '{p}/*.parquet'").fetchall())
                results[name] = {"rows_only": True, "n_rows": n, "rows_match": n > 0}
            except Exception as e:
                results[name] = {"error": str(e)}

    ok = sum(1 for r in results.values()
             if (r.get("hash_match") or (r.get("rows_only") and r.get("rows_match")))
             and not r.get("oracle_type_lint"))
    bad = {k: v for k, v in results.items()
           if not (v.get("hash_match") or (v.get("rows_only") and v.get("rows_match")))
           or v.get("oracle_type_lint")}
    warns = {k: v["type_mismatch_warn"] for k, v in results.items()
             if v.get("type_mismatch_warn")}
    print(json.dumps(results, indent=1, default=str))
    print(f"\n=== {ok}/{len(results)} queries pass ===")
    if warns:
        print("TYPE WARNINGS (driver may hash these differently):")
        for k in sorted(warns):
            print(f"  {k}: {warns[k]}")
    if bad:
        print("FAILING:", ", ".join(sorted(bad)))
        for k in sorted(bad):
            if bad[k].get("oracle_type_lint"):
                print(f"  {k} oracle_type_lint: {bad[k]['oracle_type_lint']}")
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
