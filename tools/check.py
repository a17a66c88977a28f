#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with each testdata table
registered as a view. Compares schema (column names, sorted), row count,
and a value hash (columns sorted by name, rows in emitted order, values
canonicalized). Dev tool only — NOT part of the library.
"""
import sys, json, glob, math, hashlib, datetime
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: all queries are bit-identical across engines (verified
        # at sf0.01); keep it strict so rounding drift is caught early
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(canon(r[i]) for i in order) + "\n").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            scols = [d[0] for d in sdesc]
            srows = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
            odesc = con.execute(f"DESCRIBE {sql}").fetchall()
            ocols = [d[0] for d in odesc]
            orows = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        # The driver canonicalizes by DuckDB-declared type, so an oracle
        # column that lands as HUGEINT/DECIMAL hash-mismatches a Spark
        # BIGINT/DOUBLE even when every Python-level value is identical
        # (the r4 q_seq_pack class of bug). Catch it locally.
        bad_types = [f"{d[0]}:{d[1]}" for d in odesc
                     if "HUGEINT" in d[1] or d[1].startswith("DECIMAL")]
        if bad_types:
            problems.append("oracle non-portable column types (CAST them): "
                            + ", ".join(bad_types))
        stypes = {d[0]: d[1] for d in sdesc}
        otypes = {d[0]: d[1] for d in odesc}
        for c in sorted(set(stypes) & set(otypes)):
            if stypes[c] != otypes[c]:
                print(f"WARN {name}: column {c} type spark={stypes[c]} oracle={otypes[c]}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems and table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("hash mismatch")
            for i, (a, b) in enumerate(zip(srows, orows)):
                sa = [canon(a[j]) for j in sorted(range(len(scols)), key=lambda k: scols[k])]
                sb = [canon(b[j]) for j in sorted(range(len(ocols)), key=lambda k: ocols[k])]
                if sa != sb:
                    problems.append(f"  first diff row {i}: spark={sa} oracle={sb}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
