"""Grading-window invariant check (one command for the per-round rule).

Since r8 the 50-slot driver window is ALL oracle-bearing (the rows-only
priority slot retired when every rows-only entry got its observation).
Run after ANY registry change:

    python tools/window_check.py            # prints window, exits 1 on violation
    python tools/window_check.py name1 ...  # also assert these are IN the window
"""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

q, o = E.queries(), E.oracle_sql()
w = list(q)[:50]
oracled = [n for n in w if n in o]
print(f"registry: {len(q)} entries / {len(o)} oracled")
print(f"window: {len(oracled)}/50 oracle-bearing")
bad = [n for n in w if n not in o]
for i, n in enumerate(w):
    print(f"{i:2d} {n}")
rc = 0
if bad:
    print(f"VIOLATION: non-oracle entries in window: {bad}")
    rc = 1
missing = [n for n in sys.argv[1:] if n not in w]
if missing:
    print(f"VIOLATION: expected in window but absent: {missing}")
    rc = 1
sys.exit(rc)
