"""Print the formatted physical plans of the engine's headline queries.

Companion to tests/test_plans.py (which ASSERTS the load-bearing plan
properties) — this prints the full `explain("formatted")` output so a
reviewer can read the actual plans without wiring a notebook:

    python3 tools/plan_audit.py                 # all audited queries, sf0.01
    python3 tools/plan_audit.py rollup_tiers asof_nearest_daily

What to look for (the properties the tests pin):

* rollups: `HashAggregate` x2 around exactly one `Exchange hashpartitioning`
  (partial -> final), `ReadSchema` without `tokens` when stats are unused,
  `PushedFilters` reaching the parquet scan;
* gap-fill/climatology/bias joins and the per-key min/max join-backs:
  `BroadcastHashJoin` on the tiny side;
* as-of: window specs keyed by (source, _chunk), never the bare hot key;
* dedup/similarity: no `CartesianProduct`/`BroadcastNestedLoopJoin` anywhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "rollup_tiers",
    "rollup_cascades",
    "rollup_skew",
    "gapfill_methods_1d",
    "asof_nearest_daily",
    "embedding_neardup_pair",
    "minhash_pairs",
    "top3_docs_per_source",
    "norm_to_max_lineitem",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    names = sys.argv[1:] or AUDITED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = entry.queries()
    for name in names:
        print(f"\n{'=' * 78}\n## {name}\n{'=' * 78}")
        df = qs[name](spark, sf_dir)
        df.explain("formatted")


if __name__ == "__main__":
    main()
