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

def bounded_check(con, name, cols, rows):
    """Tolerance oracle for the two Spark-only sketches (no hash bridge
    exists: DuckDB's approx_quantile is t-digest, its HLL is its own) —
    instead of a standing NO-ORACLE exemption, check the sketch's OWN
    published error contract against exact DuckDB truth:
      - q6 (HLL++, rsd=0.02): estimates within 3*rsd relative error of the
        exact distinct counts; the exact_parts column must match exactly.
      - p2 (KLL/GK, accuracy=1000): each returned quantile is a real data
        value whose rank interval [count(<v), count(<=v)]/n must intersect
        q +/- 1/accuracy; the exact_q50 column must match quantile_cont.
    Returns a BOUNDED-PASS/BOUNDED-FAIL line, or None if the query has no
    tolerance contract registered."""
    ix = {c: i for i, c in enumerate(cols)}
    if name == "q6_approx_distinct":
        truth = {r[0]: (r[1], r[2]) for r in con.execute(
            "SELECT l_returnflag, count(DISTINCT l_partkey),"
            " count(DISTINCT l_orderkey) FROM lineitem GROUP BY 1").fetchall()}
        if set(truth) != {r[ix["l_returnflag"]] for r in rows}:
            return "BOUNDED-FAIL group keys diverge from exact truth"
        worst = 0.0
        for r in rows:
            flag = r[ix["l_returnflag"]]
            ep, eo = truth[flag]
            if r[ix["exact_parts"]] != ep:
                return f"BOUNDED-FAIL exact_parts {r[ix['exact_parts']]} != {ep} ({flag})"
            for a, e in ((r[ix["approx_parts"]], ep), (r[ix["approx_orders"]], eo)):
                rel = abs(a - e) / e
                worst = max(worst, rel)
                if rel > 3 * 0.02:
                    return f"BOUNDED-FAIL rel err {rel:.4f} > 3*rsd=0.06 ({flag})"
        return f"BOUNDED-PASS rows={len(rows)} max_rel_err={worst:.4f} (bound 3*rsd=0.06)"
    if name == "p2_approx_percentiles":
        eps = 1.0 / 1000  # Spark approx_percentile(accuracy=1000): rank err <= 1/accuracy
        worst = 0.0
        for r in rows:
            flag = r[ix["l_returnflag"]]
            dq50 = con.execute(
                "SELECT round(quantile_cont(l_quantity, 0.5), 4) FROM lineitem"
                " WHERE l_returnflag = ?", [flag]).fetchone()[0]
            if float(r[ix["exact_q50"]]) != float(dq50):
                return f"BOUNDED-FAIL exact_q50 {r[ix['exact_q50']]} != {dq50} ({flag})"
            for cname, q, vcol in (
                    ("approx_q25", 0.25, "l_quantity"),
                    ("approx_q50", 0.50, "l_quantity"),
                    ("approx_q75", 0.75, "l_quantity"),
                    ("approx_price_median", 0.50, "l_extendedprice")):
                v = r[ix[cname]]
                n, lo, hi = con.execute(
                    f"SELECT count(*), count(*) FILTER (WHERE {vcol} < ?),"
                    f" count(*) FILTER (WHERE {vcol} <= ?) FROM lineitem"
                    " WHERE l_returnflag = ?", [v, v, flag]).fetchone()
                # the returned value's integer rank interval [lo, hi] must
                # intersect the target window q*n +/- (eps*n + 1): the +1
                # row absorbs the sketch's 1-based rank convention
                # (target rank 1+(n-1)q, not n*q) plus integer rounding —
                # sub-row conventions, not sketch error
                target, bound = q * n, eps * n + 1
                gap = max(lo - (target + bound), (target - bound) - hi, 0.0)
                worst = max(worst, max(lo - target, target - hi, 0.0) / n)
                if gap > 0:
                    return (f"BOUNDED-FAIL {cname}@{flag}: rank interval"
                            f" [{lo},{hi}] misses {target:.1f}+/-{bound:.1f} rows")
        return (f"BOUNDED-PASS rows={len(rows)} max_rank_dev={worst:.4f}"
                f" (bound {eps} + 1 row)")
    return None


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
            try:
                b = bounded_check(con, name, spark_cols, spark_rows)
            except Exception as e:
                b = f"BOUNDED-FAIL harness error: {str(e)[:120]}"
            results[name] = b if b else f"NO-ORACLE rows={len(spark_rows)}"
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
    ok = sum(1 for v in results.values()
             if v.startswith("MATCH") or v.startswith("BOUNDED-PASS"))
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
