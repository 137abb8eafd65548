#!/usr/bin/env python3
"""Rerun-stability check: diff two graft.Verify output dirs per query.

The driver reruns Verify every round; any nondeterministic cell (tie
order, temp path, unseeded hash) flaps the board even when both runs
are individually 'correct'. Run Verify twice into two dirs, then:

    python3 tools/rerun_check.py <dirA> <dirB>

Exit 0 = every query's sorted row set is byte-identical across runs.
"""
import os
import sys

import pandas as pd


def _cell(v):
    # dicts (parquet structs) must keep VALUES, not just keys; nested
    # lists flatten to tuples so the string form is deterministic
    if isinstance(v, dict):
        return tuple(sorted((k, _cell(x)) for k, x in v.items()))
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return tuple(_cell(x) for x in v)
    return v


def canon(df: pd.DataFrame) -> pd.Series:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        # .apply over zero rows returns a DataFrame; sort_values would
        # then need a 'by' — an empty result is simply an empty series
        return pd.Series([], dtype=str)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(_cell)
    return (df.astype(str)
            .apply(lambda r: "|".join(r), axis=1)
            .sort_values()
            .reset_index(drop=True))


def main() -> int:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    unstable = []
    n = 0
    # union of both listings: a query written by only ONE run (the
    # other crashed before writing it) is itself an instability
    for q in sorted(set(os.listdir(a_dir)) | set(os.listdir(b_dir))):
        if not q.startswith("q_"):
            continue
        n += 1
        try:
            sa = canon(pd.read_parquet(os.path.join(a_dir, q)))
            sb = canon(pd.read_parquet(os.path.join(b_dir, q)))
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            unstable.append((q, f"read: {e}"))
            continue
        if len(sa) != len(sb):
            unstable.append((q, f"rows {len(sa)} vs {len(sb)}"))
        elif not sa.equals(sb):
            first = next(i for i in range(len(sa)) if sa[i] != sb[i])
            unstable.append((q, f"row {first}: {sa[first][:80]!r} vs "
                                f"{sb[first][:80]!r}"))
    for q, why in unstable:
        print(f"UNSTABLE  {q}: {why}")
    print(f"== {n} queries, {len(unstable)} unstable ==")
    return 1 if unstable else 0


if __name__ == "__main__":
    sys.exit(main())
