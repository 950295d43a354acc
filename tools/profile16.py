"""Profile the weak headline queries on the 16x replica: steady time +
formatted plan. Usage: python tools/profile16.py [query ...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ranger_spark.queries import load_all
from ranger_spark.session import get_spark

SF16 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchcache",
    "sf0.1_x16",
)

def steady(run, warm=3, timed=3):
    for _ in range(warm):
        run()
    best = float("inf")
    for _ in range(timed):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best

def main():
    names = sys.argv[1:] or [
        "q5_region_revenue",
        "agg_minmax_countd",
        "date_extract",
        "dedup_exact",
        "in_subquery",
        "q1_pricing_summary",
    ]
    registry = load_all()
    spark = get_spark("profile16")
    for n in names:
        df = registry[n].builder(spark, SF16)
        def run():
            df.write.format("noop").mode("overwrite").save()
        t = steady(run)
        print(f"=== {n}: {t:.3f}s ===")
        if os.environ.get("EXPLAIN", "1") == "1":
            df.explain("formatted")
    spark.stop()

if __name__ == "__main__":
    main()
