#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares row count, column names, and a value hash against the Verify dump.

Persists the per-query outcome to CORRECTNESS_FULL.json (summary keys
FIRST, so a tail-truncated capture still carries the headline — the
r9 lesson: the driver's CORRECTNESS_r09.json came back `{}` and the
repo had no local fallback even though every query matched).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [artifactPath]
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
artifact = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_FULL.json"
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(canon(r[i]) for i in order) for r in rows)
    return "\n".join(lines)

import pyarrow as pa

# ---- oracle result-type lint (the q70/q118/q146 class) ----
# DuckDB types sum(int)->HUGEINT and avg/decimal math->DECIMAL; the
# driver's canonicalization diverges from Spark's int64/double on those
# even when every value is identical. Any oracle column typed HUGEINT
# (Spark has no hugeint — always wrong) or DECIMAL where the Spark
# column is integral/float must carry an explicit CAST in the SQL.
# NOTE the con.sql() re-bind is deliberate: the DBAPI cursor's
# description exposes only generic codes ('NUMBER' for HUGEINT, DECIMAL,
# and BIGINT alike — verified against duckdb 1.x), so real type names
# require the relation API; con.sql only BINDS (no execution), which is
# cheap even for the unrolled CTE-chain oracles. A lint-internal error
# is WARNED per query, not failed — the value compare below is the
# actual gate, and a transient type-introspection hiccup must not mark
# a value-matching query red. But a WHOLESALE lint outage (every query
# skipped — e.g. a duckdb API change breaking con.sql across the board)
# would silently disable the only type gate, so that case fails the run
# at the bottom.
lint_skipped = 0

def lint_types(name, sql, spark_schema):
    global lint_skipped
    bad = []
    try:
        rel = con.sql(sql)
        for cname, ts in zip(rel.columns, rel.types):
            ts = str(ts).upper()
            if ts == "HUGEINT":
                bad.append(f"{cname}:HUGEINT (cast to BIGINT in the oracle)")
            elif ts.startswith("DECIMAL") and cname in spark_schema.names:
                st = spark_schema.field(cname).type
                if pa.types.is_integer(st) or pa.types.is_floating(st):
                    bad.append(f"{cname}:{ts} vs spark {st} (cast both sides)")
    except Exception as e:
        lint_skipped += 1
        print(f"WARN {name}: type-lint skipped: {e}")
    return bad

fails = []
detail = {}  # name -> {rows_match, schema_match, hash_match, err}
def record(name, rows=False, schema=False, hsh=False, err=None):
    d = {"rows_match": rows, "schema_match": schema, "hash_match": hsh}
    if err:
        d["err"] = err[:300]
    detail[name] = d

for name, sql in sorted(oracle.items()):
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        fails.append(name)
        record(name, err=f"oracle error: {e}")
        print(f"FAIL {name}: oracle error: {e}")
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append(name)
        record(name, err="no spark output")
        print(f"FAIL {name}: no spark output")
        continue
    t = pq.read_table(files[0])
    lint = lint_types(name, sql, t.schema)
    if lint:
        fails.append(name)
        record(name, err=f"oracle type lint: {'; '.join(lint)}")
        print(f"FAIL {name}: oracle type lint: {'; '.join(lint)}")
        continue
    scols = t.column_names
    srows = [tuple(r[c] for c in scols) for r in t.to_pylist()]
    if sorted(scols) != sorted(ocols):
        fails.append(name)
        record(name, err=f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
        continue
    if len(srows) != len(orows):
        fails.append(name)
        record(name, schema=True,
               err=f"rows spark={len(srows)} oracle={len(orows)}")
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        continue
    sr, orr = table_repr(scols, srows), table_repr(ocols, orows)
    if sr != orr:
        fails.append(name)
        record(name, rows=True, schema=True, err="value mismatch")
        print(f"FAIL {name}: value mismatch")
        sl, ol = sr.split("\n"), orr.split("\n")
        shown = 0
        for a, b in zip(sl, ol):
            if a != b:
                print(f"  spark : {a[:200]}\n  oracle: {b[:200]}")
                shown += 1
                if shown >= 3:
                    break
    else:
        record(name, rows=True, schema=True, hsh=True)
        print(f"OK   {name} ({len(srows)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
# also report rows for no-oracle queries
rows_only = {}
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = d.split("/")[-1]
    if name in oracle:
        continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(pq.read_metadata(f).num_rows for f in files) if files else -1
    rows_only[name] = n
    print(f"INFO {name}: rows-only, {n} rows")

# ---- durable per-query artifact (summary keys FIRST: a truncated tail
# can eat per-query detail but never the headline). A wholesale lint
# outage must be IN the artifact, not only in the exit code: the
# artifact is the stated fallback truth after a lost driver capture, so
# a run this script itself declares an outage (exit 2 below) cannot
# leave behind an all_match=true record. ----
lint_outage = bool(oracle) and lint_skipped == len(oracle)
summary = {
    "n_match": len(oracle) - len(fails),
    "n_total": len(oracle),
    "all_match": not fails and not lint_outage,
    "lint_outage": lint_outage,
    "lint_skipped": lint_skipped,
    "sf_dir": sf_dir,
    "out_dir": out_dir,
    "fails": sorted(fails),
    "queries": {k: detail[k] for k in sorted(detail)},
    "rows_only": rows_only,
}
try:
    with open(artifact, "w") as f:
        json.dump(summary, f)
        f.write("\n")
    print(f"wrote {artifact}")
except Exception as e:
    print(f"WARN: could not write {artifact}: {e}")

if lint_outage:
    # value compares may all be green, but the type gate silently ran on
    # NOTHING — that is an introspection outage, not a pass (and the
    # artifact above already carries all_match=false + lint_outage=true)
    print(f"FAIL: type lint skipped for ALL {lint_skipped} queries — "
          "lint outage, not a pass")
    sys.exit(2)
sys.exit(1 if fails else 0)
