#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables and diff values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # normalize timestamp precisions
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list,)) else v)
    return df


def strict_frame(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's view of a frame: every cell stringified, rows sorted
    by the stringified values. NO numeric tolerance — -0.0 vs 0.0, "3"
    vs "3.0", 1e-12 drift all differ here exactly as they do in the
    driver's hash (the r6/r7 q_embed_pca_cov failures were invisible to
    an atol-based compare)."""
    s = df.astype(str)
    if len(s.columns):
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"QUERY_FAILED       {name} (no parquet written)")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        if name not in oracles:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            n_rows_only += 1
            print(f"{status:18s} {name} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ORACLE_ERR         {name}: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"SCHEMA_MISMATCH    {name}: spark={list(g.columns)} duck={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"ROWCOUNT_MISMATCH  {name}: spark={len(g)} duck={len(x)}")
            n_fail += 1
            continue
        # The driver's compare is a strict stringify-hash: a column that
        # is int64 on one side and float64 on the other (e.g. DuckDB
        # HUGEINT -> pandas float) stringifies differently ("3" vs
        # "3.0") even when values are equal — flag it as a failure here
        # so it can't pass locally and fail driver-side.
        dtype_mismatch = [
            c for c in g.columns
            if (pd.api.types.is_float_dtype(g[c])
                != pd.api.types.is_float_dtype(x[c]))
        ]
        if dtype_mismatch:
            print(f"DTYPE_MISMATCH     {name}: "
                  + ", ".join(f"{c}: spark={g[c].dtype} duck={x[c].dtype}"
                              for c in dtype_mismatch))
            n_fail += 1
            continue
        float_cols = [c for c in g.columns
                      if pd.api.types.is_float_dtype(g[c])]
        if float_cols:
            print(f"FLOAT_COLS         {name}: {float_cols} "
                  "(driver hashes strictly; prefer integer encodings)")
        # Pass criterion = the driver's strict stringify-hash. The
        # tolerant numeric diff below is DIAGNOSTIC ONLY (it classifies
        # a strict failure as drift vs formatting/signed-zero); it can
        # never turn a strict mismatch into a pass.
        gs, xs = strict_frame(g), strict_frame(x)
        if gs.equals(xs):
            print(f"PASS               {name} rows={len(g)}")
            n_pass += 1
            continue
        diff = gs.to_numpy() != xs.to_numpy()
        ncell = int(diff.sum())
        numerically_equal = True
        try:
            gn = g.sort_values(by=list(g.columns)).reset_index(drop=True)
            xn = x.sort_values(by=list(x.columns)).reset_index(drop=True)
            pd.testing.assert_frame_equal(gn, xn, check_dtype=False,
                                          check_exact=False,
                                          rtol=1e-9, atol=1e-9)
        except Exception:
            numerically_equal = False
        kind = ("STRICT_ONLY (formatting/signed-zero; values equal "
                "within 1e-9)" if numerically_equal else "VALUE")
        rows, cols = diff.nonzero()
        examples = "; ".join(
            f"[{r},{gs.columns[c]}] spark={gs.iat[r, c]!r} "
            f"duck={xs.iat[r, c]!r}"
            for r, c in list(zip(rows, cols))[:3])
        print(f"HASH_MISMATCH      {name}: {ncell} cells, {kind}: "
              f"{examples}")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
