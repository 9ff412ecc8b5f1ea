"""r11 (VERDICT r10 directive 8): sweep EVERY registry entry's physical
plan for duplicated Python-evaluation nodes (ArrowEvalPython /
MapInPandas / BatchEvalPython / MapInArrow ...) — the guide §4.4
cloning signature the r10 bench-set sweep caught twice (IVF assign,
LSH buckets). Parses explain('formatted') detail blocks: two nodes of
the same kind whose id-stripped Arguments are identical mean the SAME
kernel is evaluated twice in one plan. Construction-only."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

from iceberg_geospatial_api_server_spark.session import get_spark

spark = get_spark(app_name="kernel_dup_sweep", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
from iceberg_geospatial_api_server_spark.plans.explain import formatted_plan

PYNODES = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
           "MapInArrow", "PythonMapInArrow", "FlatMapGroupsInPandas")
HEAD = re.compile(r"^\(\d+\) (" + "|".join(PYNODES) + r")\b")
STRIP = re.compile(r"#\d+L?")

qs = E.queries()
flagged = {}
for name, fn in qs.items():
    try:
        df = fn(spark, SF_DIR)
        plan = formatted_plan(df)
    except Exception as exc:
        print(f"{name:34s} ERROR {exc!r}"[:200], flush=True)
        continue
    sigs = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        m = HEAD.match(line)
        if not m:
            continue
        args = ""
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].startswith("Arguments"):
                args = lines[j]
                break
            if HEAD.match(lines[j]) or not lines[j].strip():
                break
        sigs.append(STRIP.sub("#", m.group(1) + " " + args)[:220])
    dups = sorted({s for s in sigs if sigs.count(s) > 1})
    tag = "DUP" if dups else ("py" if sigs else "-")
    print(f"{name:34s} {tag:3s} {len(sigs)}", flush=True)
    if dups:
        flagged[name] = dups
    spark.catalog.clearCache()

print("\n=== flagged ===")
for n, d in flagged.items():
    print(n)
    for s in d:
        print("   ", s)
print(f"total flagged: {len(flagged)}")
