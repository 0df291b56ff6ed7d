#!/usr/bin/env python3
"""Dev-side oracle compare: runs each oracle_sql.json query in DuckDB over
the sf parquet tables and value-compares against the Verify parquet dumps.
Mirrors the driver's CORRECTNESS check closely enough for iteration."""
import duckdb, pandas as pd, json, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
sql = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
fails = 0
for name, q in sorted(sql.items()):
    try:
        got = pd.read_parquet(f"{out}/{name}").sort_index(axis=1)
        want = con.execute(q).df().sort_index(axis=1)
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1
            continue
        # normalize timestamp/date representations to datetime64[us]
        import datetime
        for df in (got, want):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64"):
                    df[c] = df[c].astype("datetime64[us]")
                elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], datetime.date):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if got.equals(want):
            print(f"OK   {name} ({len(got)} rows)")
        else:
            print(f"FAIL {name}: values differ (rows {len(got)} vs {len(want)})")
            diffmask = ~(got == want).all(axis=1) if len(got) == len(want) else None
            if diffmask is not None and diffmask.any():
                print("  got :", got[diffmask].head(3).to_dict("records"))
                print("  want:", want[diffmask].head(3).to_dict("records"))
            else:
                print("  got :", got.head(3).to_dict("records"))
                print("  want:", want.head(3).to_dict("records"))
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1
print(f"\n{len(sql) - fails}/{len(sql)} matched")
sys.exit(1 if fails else 0)
