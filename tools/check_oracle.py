#!/usr/bin/env python3
"""Self-check harness mimicking the driver's t2 gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same testdata dir and compare (columns sorted by name, rows sorted,
values hashed). Usage: check_oracle.py <verifyOutDir> <sfDir>"""
import sys, os, json, hashlib, time
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style: repr of float (bitwise-sensitive); keep full precision
        return repr(v)
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(outdir, sfdir):
    con = duckdb.connect()
    # container task limits can fail DuckDB's default one-thread-per-core
    # spawn on big corpora ("Resource temporarily unavailable"); cap it
    con.execute(f"SET threads TO {os.environ.get('ORACLE_THREADS', '8')}")
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleUp corpora are
        # Spark-written part-file directories — glob those
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    timings = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        tbl = pq.read_table(os.path.join(d, files[0]))
        spark_cols = tbl.column_names
        spark_rows = [tuple(r[c] for c in spark_cols) for r in tbl.to_pylist()]
        if name not in oracle:
            # every driver query carries an oracle (p2/q6's tolerance checks
            # were retired with the p2b/q6b audit-twin rows) — a NO-ORACLE
            # line here means a queries/oracleSql entry mismatch to fix
            results[name] = f"NO-ORACLE rows={len(spark_rows)}"
            continue
        t0 = time.time()
        try:
            cur = con.execute(oracle[name])
            duck_cols = [c[0] for c in cur.description]
            duck_rows = cur.fetchall()
            timings[name] = time.time() - t0
            # The driver may materialize oracle results via pandas, where
            # HUGEINT (e.g. sum(INTEGER)) degrades to float64 and DECIMAL to
            # float/object — their string forms then diverge from Spark's
            # (e.g. "3.0" vs "3") even though fetchall() would match. Flag
            # any output column whose declared type is in that class.
            try:
                desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
                risky = [(c, t) for (c, t, *_) in desc
                         if "HUGEINT" in t.upper() or t.upper().startswith("DECIMAL")]
                if risky:
                    results[name] = f"PANDAS-RISK cols={risky} (cast to BIGINT/DOUBLE in the oracle)"
                    continue
            except Exception:
                pass  # DESCRIBE quirk: fall through to the value compare
        except Exception as e:
            results[name] = f"ORACLE-ERROR {str(e)[:120]}"
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            results[name] = f"COLS-MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
            continue
        hs = table_hash(spark_cols, spark_rows)
        hd = table_hash(duck_cols, duck_rows)
        if hs == hd:
            results[name] = f"MATCH rows={len(spark_rows)}"
        elif len(spark_rows) != len(duck_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        else:
            # find first differing line for debugging
            order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            ls = sorted("|".join(norm_cell(r[i]) for i in order) for r in spark_rows)
            od = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
            ld = sorted("|".join(norm_cell(r[i]) for i in od) for r in duck_rows)
            diff = next((i for i, (a, b) in enumerate(zip(ls, ld)) if a != b), -1)
            results[name] = (f"HASH-MISMATCH first-diff@{diff}:\n"
                             f"    spark: {ls[diff][:200]}\n    duck : {ld[diff][:200]}")
    ok = sum(1 for v in results.values() if v.startswith("MATCH"))
    noor = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    bad = len(results) - ok - noor
    for k, v in results.items():
        print(f"{k:24s} {v}")
    if timings:
        worst = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
        print("\n-- slowest DuckDB oracles: " +
              ", ".join(f"{k}={v:.1f}s" for k, v in worst) +
              f"; total={sum(timings.values()):.1f}s")
    print(f"\n== {ok} match, {noor} no-oracle, {bad} BAD of {len(results)}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
