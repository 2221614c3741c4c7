"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement — this file holds the guide-§1 instrumentation that does not
belong in the driver-timed harness):

* ``--profile [query ...]``  — run each headline query ``--runs`` times in one
  session with ``collect()`` (the frozen bench's methodology) and print
  cold/warm walls per query, so steady-state cost separates from first-run
  codegen/JIT warmup.  Jobs are labelled (guide §1.5).
* ``--noop [query ...]``     — same but with the noop sink (guide §1.4):
  times the computation, not result serialization.
* ``--plans <tag> [query ...]`` — write ``plans/r07/<query>_<tag>.txt`` with
  ``explain("formatted")`` for each query (judge-checkable plan evidence).

Defaults to the frozen HEADLINE list from bench.py.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from bench import HEADLINE  # noqa: E402  (frozen list, single source of truth)


def _spark():
    from ingestr_spark.session import get_spark

    return get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": os.environ.get("BX_UI", "false")},
    )


def main() -> None:
    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    mode = args[0] if args else "--profile"
    rest = args[1:]
    runs = int(os.environ.get("BX_RUNS", "3"))

    qs = entry_mod.queries()
    if mode == "--plans":
        tag, names = rest[0], (rest[1:] or HEADLINE)
    else:
        names = rest or HEADLINE

    spark = _spark()
    if mode == "--plans":
        os.makedirs(f"{REPO}/plans/r07", exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{REPO}/plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(plan)
            print(f"wrote plans/r07/{name}_{tag}.txt")
        spark.stop()
        return

    out: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if mode == "--noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(f"{name}: {walls}  min={min(walls)}", flush=True)
    print("TOTAL_MIN", round(sum(min(w) for w in out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
