"""Isolated per-query timing probe: reuse plan_capture_r20's
builders, time the noop sink N times for the named queries only.

Usage: python tools/probe_r20.py <runs> <query> [query...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1])
NAMES = sys.argv[2:]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from polaroam_spark import get_spark

spark = get_spark(app_name="probe")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em  # noqa: F401

# import builders from plan_capture_r20 without executing its capture
# loop: exec the file up to the capture loop and take its builders
# dict (the ADVICE r19 fix: point at the sibling that actually
# exists, and no dead env vars)
import importlib.util

spec = importlib.util.spec_from_file_location(
    "plan_capture_mod",
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plan_capture_r20.py"
    ),
)


def load_builders():
    src = open(spec.origin).read()
    cut = src.index("os.makedirs(OUT_DIR")
    g = {"__file__": spec.origin, "__name__": "plan_capture_mod"}
    import sys as _s
    _s.argv = ["plan_capture_r20.py", "probe"]
    exec(src[:cut], g)
    return g["builders"]


builders = load_builders()


def run(df):
    df.write.format("noop").mode("overwrite").save()


for name in NAMES:
    fn = builders[name]
    spark.sparkContext.setJobDescription(f"probe:{name}")
    times = []
    for i in range(RUNS):
        em._MATERIALIZED_MEDIANS.clear()
        spark.catalog.clearCache()
        try:
            from polaroam_spark import unpersist_caches

            unpersist_caches()
        except Exception:
            pass
        t0 = time.time()
        run(fn())
        times.append(round(time.time() - t0, 3))
    print(f"{name}: {times} median={sorted(times)[len(times)//2]}")
    spark.sparkContext.setJobDescription(None)
