"""Driver-contract validator: replicates the round driver's correctness
gate locally — ray.init, entry(), then every queries()[name] at sf0.01
compared against oracle_sql()[name] in DuckDB (rows + canonicalized value
equality). Run: python tools/validate_driver.py [sf_dir]  (~2-3 min at the
default sf0.01, 32 CPUs; pass /root/testdata/sf0.1 for the big contract).
"""
import sys, time
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False)
sys.path.insert(0, "/root/repo")
import __ray_entry__ as em
import duckdb, pandas as pd

t0 = time.time()
res = em.entry()
try:
    n = res.count()
except AttributeError:
    n = len(res)
print(f"entry(): {n} rows in {time.time()-t0:.1f}s")

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

qs = em.queries(); os_ = em.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        r = fn(sf)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        elif not isinstance(r, pd.DataFrame):
            r = pd.DataFrame(r)
        nr = len(r)
        if name in os_:
            o = con.execute(os_[name]).df()
            ok = canon(r).equals(canon(o))
            status = "HASH-OK" if ok else "HASH-FAIL"
            if not ok:
                fails.append(name)
        else:
            status = "rows-only"
        print(f"{name}: {nr} rows {status} {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
print("FAILS:", fails)
ray.shutdown()
