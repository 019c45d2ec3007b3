#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>, loads the Spark-written parquet
and runs the matching oracle SQL (from oracle_sql.json) in DuckDB over
the raw tables in <sfDir>; compares schema (column names), row count and
values (exact, plus a 1e-9-relative float fallback so we can tell
"bit-mismatch only" from "wrong answer").

TYPE-STRICT (r10): the driver hashes TYPED arrow values, so an oracle
whose column widens (DuckDB sum(BIGINT) -> HUGEINT/decimal128) fails at
the driver even when every value matches -- and fetchall() coerces that
away, which is exactly how the r9 q_tok_pack slip shipped. So now we
also (a) compare DuckDB-level column types between the engine parquet
and the oracle result, and (b) assert every oracle output column lands
in the portable type set; either mismatch is a red row.
"""
import sys, os, json, math, re, hashlib, pickle
import duckdb

# ---- oracle-result cache -------------------------------------------------
# The sf0.1 sweep is dominated by the n² dedup oracles (q_minhash_lsh
# alone is most of a ~35-minute run). Oracle results are pure functions
# of (oracle SQL, table bytes), so they cache: key = sha256 of the SQL
# plus a fingerprint (size + mtime) of every table parquet in the sf
# dir. Any table regeneration or SQL edit misses; unchanged queries
# replay in milliseconds, making the sf0.1 sweep a per-round habit
# instead of a once-per-round cost. Disable with GRAFT_ORACLE_CACHE=0;
# relocate with GRAFT_ORACLE_CACHE_DIR (default ~/.cache/graft-oracle —
# outside the repo, never committed).
CACHE_ENABLED = os.environ.get("GRAFT_ORACLE_CACHE", "1") != "0"
CACHE_DIR = os.environ.get("GRAFT_ORACLE_CACHE_DIR",
                           os.path.expanduser("~/.cache/graft-oracle"))


def table_fingerprint(sf_dir):
    parts = [os.path.realpath(sf_dir)]
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the
            # ScaleTestdata output shape) — fingerprint the parts
            files = [os.path.join(p, f) for f in sorted(os.listdir(p))
                     if f.endswith(".parquet")]
            size = sum(os.stat(f).st_size for f in files)
            mt = max((os.stat(f).st_mtime_ns for f in files), default=0)
            parts.append(f"{t}:{size}:{mt}")
        elif os.path.exists(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def oracle_result(con, sql, fp):
    """(columns, rows, type-strings) of the oracle SQL — cached.
    Returns (data, from_cache). The duckdb version is part of the key:
    an engine upgrade can change result types (or, worse, fix/introduce
    the exact type-widening drift the type-strict gate watches for), and
    replaying a stale cache across the upgrade would mask it."""
    key = hashlib.sha256(
        f"duckdb={duckdb.__version__}\n{fp}\n{sql}".encode()).hexdigest()
    path = os.path.join(CACHE_DIR, key + ".pkl")
    if CACHE_ENABLED and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f), True
        except Exception:
            pass  # torn/stale cache file: recompute and overwrite
    rel = con.sql(sql)
    data = (rel.columns, rel.fetchall(), [str(t) for t in rel.types])
    if CACHE_ENABLED:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(data, f)
        os.replace(tmp, path)  # atomic: concurrent runs see whole files
    return data, False

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose DuckDB->arrow mapping is unambiguous and matches what
# Spark writes to parquet. An oracle emitting anything else (HUGEINT,
# DECIMAL, UTINYINT, ...) must cast.
PORTABLE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


def norm_type(t):
    s = str(t).upper()
    # engine parquet timestamps read back as TIMESTAMP WITH TIME ZONE
    # under some duckdb versions; the driver's arrow hash treats both as
    # timestamp[us] -- normalize
    return re.sub(r"\s+WITH TIME ZONE$", "", s)


def canon(rows, cols):
    # driver sorts columns by name; we also sort rows for comparison
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def vals_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main(sf_dir, out_dir, json_out=None):
    results = {}
    def record(name, **kw):
        row = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        row.update(kw)
        results[name] = row
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir-style table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_exact = n_cached = 0
    fp = table_fingerprint(sf_dir)
    for name in names:
        # the got-side read itself can fail (a mid-job write failure can
        # leave only _temporary under the dir) — that must be a red row
        # for THIS query, not an abort that loses every remaining row
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = got_rel.columns, got_rel.fetchall()
        except Exception as e:
            print(f"✗ {name:24s} ENGINE OUTPUT MISSING/UNREADABLE: {e}")
            record(name, err=f"output unreadable: {e}")
            continue
        if gcols == ["__graft_failed"]:
            # Verify's one-column marker: the query body threw
            print(f"✗ {name:24s} ENGINE QUERY FAILED (see _failed.json)")
            record(name, err="engine query failed")
            continue
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(grows)} rows")
            record(name, spark_rows=len(grows), err="no oracle (rows-only)")
            continue
        try:
            (ecols, erows, etype_strs), from_cache = \
                oracle_result(con, oracles[name], fp)
            n_cached += int(from_cache)
        except Exception as e:
            print(f"✗ {name:24s} ORACLE SQL ERROR: {e}")
            record(name, err=f"oracle sql error: {e}")
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"✗ {name:24s} SCHEMA got={gc} exp={ec}")
            record(name, spark_rows=len(gr), oracle_rows=len(er),
                   err=f"schema got={gc} exp={ec}")
            continue
        # type strictness: oracle types must be portable AND equal the
        # engine's parquet types column-for-column
        gtypes = {c: norm_type(t) for c, t in zip(gcols, got_rel.types)}
        etypes = {c: norm_type(t) for c, t in zip(ecols, etype_strs)}
        bad_portable = sorted(c for c, t in etypes.items() if t not in PORTABLE)
        if bad_portable:
            print(f"✗ {name:24s} ORACLE NON-PORTABLE TYPES: "
                  + ", ".join(f"{c}:{etypes[c]}" for c in bad_portable))
            record(name, err="oracle non-portable types")
            continue
        bad_types = sorted(c for c in etypes if gtypes.get(c) != etypes[c])
        if bad_types:
            print(f"✗ {name:24s} TYPES "
                  + ", ".join(f"{c} got={gtypes.get(c)} exp={etypes[c]}"
                              for c in bad_types))
            record(name, err="type mismatch")
            continue
        if len(gr) != len(er):
            print(f"✗ {name:24s} ROWS got={len(gr)} exp={len(er)}")
            record(name, schema_match=True, spark_rows=len(gr), oracle_rows=len(er),
                   err="row count mismatch")
            continue
        exact = gr == er
        ok = exact or all(
            all(vals_equal(a, b) for a, b in zip(rg, re))
            for rg, re in zip(gr, er))
        if ok:
            n_pass += 1
            n_exact += int(exact)
            record(name, rows_match=True, schema_match=True, hash_match=exact,
                   spark_rows=len(gr), oracle_rows=len(er))
            print(f"✓ {name:24s} {len(gr)} rows" + ("" if exact else "  (tolerance only!)"))
        else:
            bad = next((rg, re) for rg, re in zip(gr, er)
                       if not all(vals_equal(a, b) for a, b in zip(rg, re)))
            print(f"✗ {name:24s} VALUES e.g. got={bad[0]} exp={bad[1]}")
            record(name, rows_match=True, schema_match=True, spark_rows=len(gr),
                   oracle_rows=len(er), err=f"values differ e.g. got={bad[0]} exp={bad[1]}")
    print(f"-- {n_pass} pass ({n_exact} exact) / {len(names)} queries"
          + (f"  [{n_cached} oracle results from cache]" if n_cached else ""))
    if json_out:
        json.dump(dict(sorted(results.items())), open(json_out, "w"), indent=2, default=str)
        print(f"-- wrote {json_out}")


def prewarm(sf_dir, oracle_json_path):
    """Populate the oracle cache for every SQL in the battery WITHOUT
    needing engine outputs.

    The duckdb version is part of the cache key (correctly -- an engine
    upgrade can change result types), so every duckdb bump cold-starts
    the full sf0.1 sweep (~22 min measured at r13). This mode replays
    just the oracle side, so the cold start can be paid EARLY and in
    parallel -- e.g. kicked off against the committed oracle_sql.json
    while the Spark Verify run is still producing engine outputs, or at
    sf0.001 first for a fast smoke of the new duckdb's SQL surface.

    Usage: python3 tools/compare.py --prewarm <sfDir> <oracle_sql.json>
    """
    import time
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir-style table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(oracle_json_path))
    fp = table_fingerprint(sf_dir)
    t0 = time.time()
    n_hit = n_err = 0
    for name in sorted(oracles):
        s = time.time()
        try:
            _, cached = oracle_result(con, oracles[name], fp)
        except Exception as e:
            n_err += 1
            print(f"✗ {name:24s} ORACLE SQL ERROR: {e}")
            continue
        n_hit += int(cached)
        if not cached:
            print(f"  {name:24s} {time.time() - s:6.1f}s")
    print(f"-- prewarmed {len(oracles) - n_hit - n_err} oracles at {sf_dir} "
          f"in {time.time() - t0:.1f}s ({n_hit} already cached, {n_err} errors)")
    return 1 if n_err else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: compare.py <sf_dir> <out_dir> [report.json]\n"
              "       compare.py --prewarm <sf_dir> <oracle_sql.json>",
              file=sys.stderr)
        sys.exit(2)
    if sys.argv[1] == "--prewarm":
        if len(sys.argv) < 4:
            print("usage: compare.py --prewarm <sf_dir> <oracle_sql.json>",
                  file=sys.stderr)
            sys.exit(2)
        sys.exit(prewarm(sys.argv[2], sys.argv[3]))
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
