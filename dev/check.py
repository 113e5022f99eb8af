#!/usr/bin/env python3
"""Dev-loop correctness harness (mimics the driver's oracle compare).

Usage: python3 dev/check.py <verifyOutDir> <sfDir> [--staged-pairs <parquetDir>]
       python3 dev/check.py --bench-diff <oldBench.json> <newBench.json> [maxRatio]
       python3 dev/check.py --scale-check <smallSfBench.json> <bigSfBench.json> [maxRatio]

--staged-pairs (sf0.1 replay only — NEVER for the sf0.01 gate): registers
the engine-persisted confirmed-pair parquet as the `staged_pairs` DuckDB
view and overlays oracle_sql_staged.json variants, so the cascade oracles
skip only the quadratic from-raw candidate join (see StagedOracles.scala).

Reads oracle_sql.json from the verify output dir, registers each testdata
parquet as a DuckDB view, runs each oracle, and compares with the
Spark-written parquet result THE WAY THE DRIVER DOES:

  - the SPARK side is read via pyarrow/pandas (NOT DuckDB) — so parquet
    decimals arrive as decimal.Decimal objects and arrays as numpy arrays,
    exactly as the driver sees them;
  - the ORACLE side is the DuckDB result converted to pandas (decimals →
    float64);
  - both sides: columns sorted by name, rows sorted by all columns
    (sort_values — crashes on unhashable array cells, as the driver does),
    then every cell stringified and hashed.

Reports rows/schema/hash per query like CORRECTNESS_r{N}.json. NOT part of
the library — local dev only.
"""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def read_spark(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet under {path}")
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def canon(df):
    df = df[sorted(df.columns)]
    # the driver's sort_values raises TypeError on array-typed cells —
    # intentionally not caught here so the dev loop reproduces that failure
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def df_hash(df):
    # to_csv, not per-cell str(): pandas' CSV writer normalizes
    # all-midnight datetime64 columns to bare dates, which is how a
    # date-typed Spark column and a timestamp-typed oracle column end up
    # representation-equal
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main(out_dir, sf_dir, staged_pairs=None, oracle_timeout=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if staged_pairs:
        # sf0.1 staged-replay mode (round 15): register the engine-persisted
        # confirmed-pair parquet and overlay the staged oracle variants
        # (quadratic candidate scan swapped for the staged read; pair
        # precision + all downstream logic still re-derived from raw by
        # DuckDB — see StagedOracles.scala). sf0.01 runs MUST NOT pass this
        # flag: from-raw is the hard gate there.
        con.execute("CREATE VIEW staged_pairs AS SELECT * FROM "
                    f"read_parquet('{staged_pairs}/*.parquet')")
        staged = json.load(open(f"{out_dir}/oracle_sql_staged.json"))
        overlaid = sorted(set(staged) & set(oracles))
        oracles.update({k: v for k, v in staged.items() if k in oracles})
        print(f"== staged-replay mode: {len(overlaid)} oracle(s) overlaid: "
              f"{', '.join(overlaid)} ==")
    def run_oracle(sql):
        # optional per-oracle wall-clock cap (broad sf0.1 passes): a from-raw
        # quadratic replay must register as ORACLE-BOUND, not hang the pass.
        if not oracle_timeout:
            return con.execute(sql).df()
        import threading
        box = {}
        def work():
            try:
                box["df"] = con.execute(sql).df()
            except Exception as e:
                box["err"] = e
        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(oracle_timeout)
        if t.is_alive():
            con.interrupt()
            t.join(30)
            raise TimeoutError(f"oracle exceeded {oracle_timeout}s")
        if "err" in box:
            raise box["err"]
        return box["df"]

    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(run_oracle(sql))
            got = canon(read_spark(f"{out_dir}/{name}"))
        except TimeoutError as e:
            print(f"SKIP {name}: {e} (oracle-bound at this SF)")
            n_skip += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: exec error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(want.columns)}"
                  f" spark={list(got.columns)}")
            ok = False
        elif len(want) != len(got):
            print(f"FAIL {name}: row count: oracle={len(want)} spark={len(got)}")
            ok = False
        else:
            for cn in want.columns:
                if str(want[cn].dtype) != str(got[cn].dtype):
                    print(f"  WARN {name}.{cn}: oracle dtype {want[cn].dtype}"
                          f" vs spark {got[cn].dtype}")
            hw, hg = df_hash(want), df_hash(got)
            if hw != hg:
                # locate first cell diff for the report
                bad = None
                for ri in range(len(want)):
                    for cn in want.columns:
                        a, b = want[cn].iloc[ri], got[cn].iloc[ri]
                        if str(a) != str(b):
                            bad = (ri, cn, a, b)
                            break
                    if bad:
                        break
                if bad:
                    ri, cn, a, b = bad
                    print(f"FAIL {name}: hash mismatch; first diff row {ri} "
                          f"col {cn}: oracle={a!r} ({type(a).__name__}) "
                          f"spark={b!r} ({type(b).__name__})")
                else:
                    print(f"FAIL {name}: hash mismatch (no cell-level diff "
                          f"found — ordering?)")
                ok = False
        if ok:
            print(f"PASS {name} ({len(want)} rows, {len(want.columns)} cols)")
            n_pass += 1
        else:
            n_fail += 1
    skip_note = f" / {n_skip} oracle-bound skip" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip_note} ==")
    return 1 if n_fail else 0


def bench_diff(old_path, new_path, max_ratio=2.0):
    """Flag per-query time regressions between two BENCH_r{N}.json rounds.

    Sub-100ms queries are noise-dominated (JVM scheduling jitter exceeds
    the signal), so a floor of 0.1s is applied to the old time before the
    ratio test. Returns nonzero if any query regressed > max_ratio.
    """
    # driver-side BENCH_r{N}.json wraps the bench stdout tail (possibly
    # truncated at the FRONT) in a "tail" string — load_bench_queries
    # recovers what survives
    old = load_bench_queries(old_path)
    new = load_bench_queries(new_path)
    bad = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            print(f"  NEW  {name}: {t_new:.2f}s (no prior round)")
            continue
        ratio = t_new / max(t_old, 0.1)
        if ratio > max_ratio:
            print(f"REGRESS {name}: {t_old:.2f}s -> {t_new:.2f}s ({ratio:.1f}x)")
            bad.append(name)
    gone = sorted(set(old) - set(new))
    for name in gone:
        print(f"  GONE {name} (was {old[name]:.2f}s)")
    print(f"== {len(bad)} regression(s) > {max_ratio}x over {len(new)} queries ==")
    return 1 if bad else 0


def load_bench_queries(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    import re
    pairs = re.findall(r'"(q[0-9][0-9a-z_]*)":([0-9.]+)', d.get("tail", ""))
    return {k: float(v) for k, v in pairs}


def scale_check(small_path, big_path, max_ratio=15.0):
    """Flag SUPERLINEAR queries between two bench runs at different SFs.

    For a 10x data-size step, a linear operator lands well under 10x
    (fixed per-query overhead dominates small-SF runs); > max_ratio
    (default 15x) marks work growing faster than the data — the scale
    smell the plan audits exist to catch. Sub-0.2s small-SF times are
    floored (those queries are pure overhead at the small scale, so their
    ratio is meaningless noise). Returns nonzero if any query exceeds the
    threshold.
    """
    small = load_bench_queries(small_path)
    big = load_bench_queries(big_path)
    bad = []
    for name, t_big in sorted(big.items()):
        t_small = small.get(name)
        if t_small is None:
            print(f"  MISSING {name}: not in small-SF bench")
            continue
        ratio = t_big / max(t_small, 0.2)
        flag = "SUPERLINEAR" if ratio > max_ratio else "ok"
        print(f"  {flag:>11} {name:<28} {t_small:6.2f}s -> {t_big:6.2f}s ({ratio:4.1f}x)")
        if ratio > max_ratio:
            bad.append(name)
    print(f"== {len(bad)} superlinear querie(s) > {max_ratio}x over {len(big)} ==")
    return 1 if bad else 0


if __name__ == "__main__":
    if sys.argv[1] == "--bench-diff":
        ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
        sys.exit(bench_diff(sys.argv[2], sys.argv[3], ratio))
    if sys.argv[1] == "--scale-check":
        ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 15.0
        sys.exit(scale_check(sys.argv[2], sys.argv[3], ratio))
    staged = None
    timeout = None
    argv = list(sys.argv[1:])
    if "--staged-pairs" in argv:
        i = argv.index("--staged-pairs")
        staged = argv[i + 1]
        del argv[i:i + 2]
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = float(argv[i + 1])
        del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], staged_pairs=staged,
                  oracle_timeout=timeout))
