"""Spot-measure a subset of bench queries at sf0.1 (warm pool, noop
write, clearCache between reps, min of 2-3).

NOT byte-identical to bench.py's protocol by design: every rep here
rebuilds the DataFrame inside the timer (bench.py builds lazy entries
once and has a host-noise guard), so probe numbers include 0.1-0.35s
of py4j construction per query and run systematically ABOVE the
recorded artifact — compare probes to probes, artifacts to artifacts.
Usage: python tools/perf_probe.py name1 name2 ... [--duckdb]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    from iceberg_geospatial_api_server_spark.session import get_spark

    spark = get_spark(app_name="perf_probe", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, SF_DIR).collect()
    spark.range(0, CPUS, 1, CPUS).mapInPandas(lambda it: it, "id long").collect()

    def time_once(fn) -> float:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for name in names:
        run = lambda: qs[name](spark, SF_DIR).write.format(  # noqa: E731
            "noop"
        ).mode("overwrite").save()
        samples = [time_once(run), time_once(run)]
        if max(samples) > 1.5 * min(samples):
            samples.append(time_once(run))
        print(f"{name}: min={min(samples):.3f}s  samples="
              f"{[round(s, 3) for s in samples]}")

    if "--duckdb" in sys.argv:
        import duckdb

        from iceberg_geospatial_api_server_spark.sources.tables import (
            TABLE_NAMES,
        )

        con = duckdb.connect()
        con.execute(f"SET threads={CPUS}")
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        oracles = entry_mod.oracle_sql()
        for name in names:
            if name not in oracles:
                continue
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                samples.append(time.perf_counter() - t0)
            print(f"duckdb {name}: min={min(samples):.3f}s")


if __name__ == "__main__":
    main()
