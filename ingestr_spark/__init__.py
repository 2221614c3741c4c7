"""ingestr_spark — a PySpark-native time-series rollup / downsample / retention engine.

A brand-new engine (NOT a port) with the query semantics of geco-bern/ingestr
(calendar-bucketed rollups, date-spine gap-fill with LOCF + linear
interpolation, per-key time-series construction, QC/outlier filtering — see
/root/reference R/ingest_bysite.R, R/init_dates_dataframe.R,
R/gapfill_interpol.R for the studied semantics), operating over tables of
pre-tokenized training sequences ``(doc_id, tokens array<int>, n_tok, source,
ts)`` and designed for 10^12-sequence scale:

* declarative DataFrame plans (Catalyst handles pushdown / pruning / join
  strategy; AQE handles skew and partition coalescing),
* explicit repartitioning by (source, time-bucket) before grouped stages,
* salting for hot sources with algebraic (integer) partial aggregates,
* delta-of-delta + Gorilla XOR compression of rolled-up points,
* tiered retention raw→1h→1d→1mo with checkpoint/resume manifests.
"""

__version__ = "0.1.0"

from ingestr_spark.session import get_spark  # noqa: F401
