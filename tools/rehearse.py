#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/rehearse.py [sfDir] [outDir] [--skip-verify] [keys...]

1. runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-verify)
2. loads <outDir>/oracle_sql.json
3. for each key: registers the sfDir parquet tables as DuckDB views,
   runs the oracle SQL, reads the Spark result parquet, and compares
   (columns sorted by name, rows compared as values).

Exit code 0 iff every key matches.

Memory: the DuckDB oracle harness is capped at REHEARSE_MEM (default
48GB) with spill to /tmp/duckdb_spill. r14 measured the beam-pair
oracles (llm_ann_beam / llm_ann_beam_recall) needing ~110GB at sf1
under the then-constant IvfK=4 (the in-cell pair join was n^2/4).
MEASURED CLOSED in r16: with the corpus-scaled quantizer (cells ~500)
both beam oracles pass at sf1 under the 48GB default with ZERO spill
(~9-17GB RSS, 153s + 97s) — no env var needed at any graded scale.
The cap bounds ONLY the oracle side, never the graded Spark run.
"""
import json, subprocess, sys, glob, os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # decimals arrive as objects (Decimal) — compare as strings of
        # normalized value; floats as floats
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df.reset_index(drop=True)


# The driver's hasher canonicalizes int widths and date/timestamp across
# engines but NOT decimal/hugeint/int8 — identical values in those types
# still fail hash_match (round-1 lesson: 23 keys failed with bitwise-equal
# values). Gate on the output SCHEMA, not just values.
BANNED_TYPES = ("DECIMAL", "HUGEINT", "TINYINT")


def schema_violations(con, files, sql):
    bad = []
    for col, typ in [r[:2] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]:
        if any(b in typ.upper() for b in BANNED_TYPES):
            bad.append(f"spark:{col}:{typ}")
    for col, typ in [r[:2] for r in con.execute(f"DESCRIBE {sql}").fetchall()]:
        if any(b in typ.upper() for b in BANNED_TYPES):
            bad.append(f"oracle:{col}:{typ}")
    return bad


def compare(name, spark_df, oracle_df):
    ok = True
    if list(spark_df.columns) != list(oracle_df.columns):
        print(f"  [{name}] COLUMN MISMATCH spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}")
        return False
    if len(spark_df) != len(oracle_df):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}")
        return False
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
        else:
            eq = (a.to_numpy() == b.to_numpy()) | (a.isna().to_numpy() & b.isna().to_numpy())
        if not eq.all():
            bad = np.where(~eq)[0][:5]
            ok = False
            print(f"  [{name}] VALUE MISMATCH col={c} rows={bad.tolist()}")
            for i in bad:
                print(f"     row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
    return ok


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_verify = "--skip-verify" in sys.argv
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if not skip_verify:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
        if r.returncode != 0:
            print("VERIFY FAILED:\n" + tail)
            sys.exit(2)
        for line in (r.stdout + r.stderr).splitlines():
            if "[verify]" in line:
                print(line)

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    con = duckdb.connect()
    # Scale-run hygiene (learned at sf1): an oracle that needs to spill
    # must spill to /tmp, not the repo cwd, and must hit DuckDB's
    # limit well before machine memory exhausts — the sf1 run pinned
    # 100 GiB, filled the disk with cwd spill files, and took out two
    # innocent subsequent keys. The limit only bounds the ORACLE harness;
    # it never affects the graded Spark side.
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('REHEARSE_MEM', '48GB')}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[{name}] NO SPARK OUTPUT")
            n_bad += 1
            continue
        try:
            viols = schema_violations(con, files, sql)
            spark_df = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            oracle_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[{name}] ERROR: {e}")
            n_bad += 1
            continue
        if viols:
            print(f"[{name}] BANNED OUTPUT TYPE (driver hash cannot canonicalize): {viols}")
            n_bad += 1
            continue
        if compare(name, spark_df, oracle_df):
            n_ok += 1
            print(f"[{name}] OK ({len(spark_df)} rows)")
        else:
            n_bad += 1
    # keys in queries but not oracle get only a rows>0 check from driver
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
