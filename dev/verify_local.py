#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev feedback loop only;
NOT part of the library). Usage:
    python3 dev/verify_local.py /tmp/verify_out [sfdir]
after running:  sbt "runMain graft.Verify <sfdir> /tmp/verify_out"
Compares each <name>.parquet against the DuckDB oracle in oracle_sql.json:
schema (column names sorted), row count, and value-by-value equality after
sorting rows by all columns.
"""
import sys, os, json, glob
import duckdb

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        grel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        got = grel.df()
        if name not in oracles:
            ok = len(got) > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows-only check, {len(got)} rows")
            n_rowsonly += ok; n_fail += (not ok); continue
        try:
            erel = con.sql(oracles[name])
            exp = erel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} vs oracle {ecols}"); n_fail += 1; continue
        # The driver's hash is TYPE-sensitive at pandas-value granularity
        # (round-8 casualties: DuckDB window sum(BIGINT) -> HUGEINT lands in
        # pandas as float64, so 123 hashes as "123.0" vs Spark's "123";
        # int32-vs-int64 width differences DO pass the driver — q16 etc. were
        # green). Compare numpy dtype KIND per column: i/u equivalent ints,
        # f floats, O objects, M datetimes, b bools.
        def kind(s):
            k = s.dtype.kind
            return "i" if k in ("i", "u") else k
        dbad = [(c, str(got[c].dtype), str(exp[c].dtype))
                for c in gcols if kind(got[c]) != kind(exp[c])]
        if dbad:
            print(f"FAIL {name}: dtype-kind mismatch {dbad} (spark vs oracle)")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs oracle {len(exp)}"); n_fail += 1; continue
        g = got[gcols].sort_values(gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(ecols, kind="mergesort").reset_index(drop=True)
        mismatch = None
        for c in gcols:
            gv, ev = g[c], e[c]
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, gv.iloc[i], ev.iloc[i])
                break
        if mismatch:
            c, i, gvv, evv = mismatch
            print(f"FAIL {name}: col {c} row {i}: got={gvv!r} oracle={evv!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows"); n_pass += 1
    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail "
          f"(of {len(names)} queries) ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
