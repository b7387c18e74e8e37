#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables, sorts columns by name and rows by all columns, and compares
values (exact for non-floats; 1e-9 relative tolerance for floats so we
can SEE near-misses — the goal is bit-exact via decimal-cast sums).
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def type_class(t):
    """Collapse a DuckDB type to the class the driver's type-sensitive
    hash distinguishes. HUGEINT is its own class: DuckDB sum(BIGINT)
    returns HUGEINT, which the driver renders differently from Spark's
    int64 even when every value is equal (round-9 lesson: 27 red rows)."""
    s = str(t).upper()
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE") or s.startswith("DECIMAL"):
        return "float"  # driver canonicalization coerces DECIMAL→float
    if s == "DATE" or s.startswith("TIMESTAMP"):
        return "datetime"  # driver coerces DATE→datetime64 (r9: q216 et al green)
    return s


def type_mismatches(con, files, sql):
    """Compare result-parquet column types vs oracle relation types by
    class, WITHOUT fetching data (pandas coercion hides exactly the
    mismatches the driver flags)."""
    got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    exp_rel = con.sql(sql)
    # group by NAME (name -> sorted list of types) and compare per-name
    # type multisets — duplicate column names don't collapse, and a
    # positional zip can't misalign/truncate when the column SETS differ
    # (the old zip silently skipped every same-named column after a
    # set divergence)
    def by_name(rel):
        m = {}
        for n, t in zip(rel.columns, [str(t) for t in rel.types]):
            m.setdefault(n, []).append(t)
        return {n: sorted(ts) for n, ts in m.items()}
    got_t, exp_t = by_name(got_rel), by_name(exp_rel)
    bad = []
    for n in sorted(set(got_t) | set(exp_t)):
        gts, ets = got_t.get(n), exp_t.get(n)
        if gts is None:
            bad.append(f"{n}: oracle-only column (types {ets})")
            continue
        if ets is None:
            bad.append(f"{n}: spark-only column (types {gts})")
            continue
        gcs, ecs = [type_class(t) for t in gts], [type_class(t) for t in ets]
        if gcs != ecs or "hugeint" in gcs or "hugeint" in ecs:
            bad.append(f"{n}: spark={gts} oracle={ets}")
    return bad


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        if af == bf:
            return "exact"
        return "approx" if math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9) else False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cmp_cell(x, y) for x, y in zip(a, b))
    # bool(): numpy scalars compare to numpy.bool_, which is NOT the
    # Python False singleton — `r is False` would silently pass mismatches
    return bool(a == b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted({os.path.basename(os.path.dirname(p)) for p in
                    glob.glob(os.path.join(out_dir, "*", "*.parquet"))})
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-ERROR {e}"
            continue
        tbad = type_mismatches(con, files, oracles[name])
        if tbad:
            results[name] = f"TYPE-MISMATCH {'; '.join(tbad)}"
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH got={len(got)} exp={len(exp)}"
            continue
        bad, approx = [], 0
        for i in range(len(got)):
            for c in got.columns:
                r = cmp_cell(got[c].iloc[i], exp[c].iloc[i])
                if r == "approx":
                    approx += 1
                elif not r:
                    bad.append((i, c, got[c].iloc[i], exp[c].iloc[i]))
        if bad:
            results[name] = f"VALUE-MISMATCH {len(bad)} cells, first={bad[0]}"
        elif approx:
            results[name] = f"APPROX ({approx} cells not bit-exact)"
        else:
            results[name] = "OK"
    missing = sorted(set(oracles) - set(names))
    width = max(len(n) for n in list(results) + missing) if results or missing else 0
    ok = sum(1 for v in results.values() if v == "OK")
    noracle = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    for name in missing:
        print(f"{name:<{width}}  MISSING-RESULT (oracle declared, no parquet)")
    print(f"-- {ok}/{len(results)} OK ({noracle} rows-only), {len(missing)} missing")
    sys.exit(0 if ok + noracle == len(results) and not missing else 1)


if __name__ == "__main__":
    main()
