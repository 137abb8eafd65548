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


def canon(df: pd.DataFrame) -> pd.Series:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v)
                if hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                else v)
    return (df.astype(str)
            .apply(lambda r: "|".join(r), axis=1)
            .sort_values()
            .reset_index(drop=True))


def main() -> int:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    unstable = []
    n = 0
    for q in sorted(os.listdir(a_dir)):
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
