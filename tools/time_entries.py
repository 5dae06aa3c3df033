"""Isolated per-entry timing: warmed median-of-3 with the bench's sink rules.

Usage: python tools/time_entries.py name1 name2 ...
Prints one line per entry: name, min, median, max (seconds), sink.

Methodology matches bench.py (tables cached up front, gc between runs,
noop sink for LARGE_RESULT entries, collect otherwise) but isolates the
named entries so a measurement is not a function of suite position.
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LARGE_RESULT  # noqa: E402
from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.session import (  # noqa: E402
    get_spark,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (  # noqa: E402
    load_tables,
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ftdw-time-entries")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.cache().count()

    def run_once(name: str) -> float:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        if name in LARGE_RESULT:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        gc.collect()
        return dt

    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        run_once(name)  # warm
        ts = [run_once(name) for _ in range(3)]
        print(
            f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f}"
            f" max={max(ts):.3f} sink="
            f"{'noop' if name in LARGE_RESULT else 'collect'}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
