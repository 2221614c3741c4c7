"""DuckDB oracle SQL mirroring each engine query bit-for-bit.

The correctness driver runs each ``queries()`` entry on Spark and the
matching SQL here on DuckDB over the same parquet views, then compares
row-count + schema + order-insensitive value hash. Rules used throughout to
make the comparison exact:

* all float outputs derive from INTEGER sums (avg = CAST(sum AS DOUBLE)/n)
  or are ROUND(x, 6)-ed on both sides when a true double sum is unavoidable;
* DuckDB HUGEINT sums are cast to BIGINT to match Spark's LongType;
* buckets are returned as DATE (d/w/mo tiers) or epoch-second BIGINT (1h);
* every computed column carries the same alias on both sides.
"""

from __future__ import annotations

from ingestr_spark.datagen import TOKENS_CTE

# ---- shared aggregate fragment over the tok CTE --------------------------

def _tier_select(bucket_sql: str, bucket_alias: str = "bucket") -> str:
    return f"""
SELECT
  source,
  {bucket_sql} AS {bucket_alias},
  COUNT(*)                                   AS n_seq,
  CAST(SUM(n_tok) AS BIGINT)                 AS sum_n_tok,
  MIN(n_tok)                                 AS min_n_tok,
  MAX(n_tok)                                 AS max_n_tok,
  CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_sum,
  MIN(list_min(tokens))                      AS tok_min,
  MAX(list_max(tokens))                      AS tok_max,
  CAST(SUM(CASE WHEN qc IN (0,1) THEN 1 ELSE 0 END) AS BIGINT) AS qc_ok_cnt,
  CAST(SUM(n_tok) AS DOUBLE) / COUNT(*)      AS avg_n_tok,
  CAST(SUM(CASE WHEN qc IN (0,1) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS qc_frac
FROM tok
GROUP BY 1, 2
"""


ROLLUP_1H = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(epoch(date_trunc('hour', ts)) AS BIGINT)", "bucket_epoch")}
"""

ROLLUP_1D = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(date_trunc('day', ts) AS DATE)")}
"""

ROLLUP_1W = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(date_trunc('week', ts) AS DATE)")}
"""

# monthly tier: anchored to the 15th (R/init_dates_dataframe.R:73-78)
ROLLUP_1MO = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(date_trunc('month', ts) + INTERVAL 14 DAY AS DATE)")}
"""

ROLLUP_1Y = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(date_trunc('year', ts) AS DATE)")}
"""

TOKENS_INVARIANT = f"""WITH {TOKENS_CTE}
SELECT
  doc_id_str AS doc_id,
  source,
  n_tok,
  CAST(list_sum(tokens) AS BIGINT) AS tok_checksum,
  tokens[1]     AS tok_first,
  tokens[n_tok] AS tok_last,
  CAST(len(tokens) AS INT) AS tok_len
FROM tok
"""

# ---- gap-fill oracles ------------------------------------------------------

_DAILY_TIER_CTE = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         COUNT(*) AS n_seq, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM tok GROUP BY 1, 2
),
bounds AS (SELECT source, MIN(bucket) AS lo, MAX(bucket) AS hi FROM tier GROUP BY 1),
spine AS (
  SELECT source, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS bucket
  FROM bounds
),
joined AS (
  SELECT s.source, s.bucket, t.n_seq, t.sum_n_tok,
         t.n_seq IS NULL AS gap
  FROM spine s LEFT JOIN tier t USING (source, bucket)
)
"""

GAPFILL_LOCF_1D = f"""{_DAILY_TIER_CTE}
SELECT source, bucket, gap,
  last_value(sum_n_tok IGNORE NULLS) OVER (
    PARTITION BY source ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_n_tok,
  last_value(n_seq IGNORE NULLS) OVER (
    PARTITION BY source ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_seq
FROM joined
"""

GAPFILL_ZERO_1D = f"""{_DAILY_TIER_CTE}
SELECT source, bucket, gap,
  COALESCE(sum_n_tok, 0) AS sum_n_tok,
  COALESCE(n_seq, 0) AS n_seq
FROM joined
"""

# linear interpolation with head/tail nearest extension, identical operation
# order to operators/gapfill.py::interpolate_linear (BIGINT axis seconds,
# double blend) so the doubles match bit-for-bit.
GAPFILL_LINEAR_1D = f"""{_DAILY_TIER_CTE},
w AS (
  SELECT source, bucket, gap,
    CAST(epoch(CAST(bucket AS TIMESTAMP)) AS BIGINT) AS t,
    CAST(sum_n_tok AS DOUBLE) AS v,
    last_value(CAST(sum_n_tok AS DOUBLE) IGNORE NULLS) OVER (
      PARTITION BY source ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN sum_n_tok IS NOT NULL
               THEN CAST(epoch(CAST(bucket AS TIMESTAMP)) AS BIGINT) END IGNORE NULLS) OVER (
      PARTITION BY source ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(CAST(sum_n_tok AS DOUBLE) IGNORE NULLS) OVER (
      PARTITION BY source ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN sum_n_tok IS NOT NULL
               THEN CAST(epoch(CAST(bucket AS TIMESTAMP)) AS BIGINT) END IGNORE NULLS) OVER (
      PARTITION BY source ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM joined
)
SELECT source, bucket, gap,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NOT NULL AND nv IS NOT NULL
         THEN pv + (nv - pv) * (t - pt) / (nt - pt)
       WHEN pv IS NOT NULL THEN pv
       ELSE nv END AS sum_n_tok
FROM w
"""

# ---- events-table oracles --------------------------------------------------

EVENTS_ROLLUP_1H = """
SELECT event_type,
  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 6) AS sum_value,
  ROUND(MIN(value), 6) AS min_value,
  ROUND(MAX(value), 6) AS max_value
FROM events
GROUP BY 1, 2
"""

IQR_OUTLIER_EVENTS = """
WITH fences AS (
  SELECT event_type,
    quantile_cont(value, 0.25) AS q1,
    quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type,
  COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN e.value < f.q1 - 1.5*(f.q3 - f.q1)
                  OR e.value > f.q3 + 1.5*(f.q3 - f.q1)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
FROM events e JOIN fences f USING (event_type)
GROUP BY 1
"""

# ---- cleaning / climatology / bias-correction oracles -----------------------

CLIM_MONTHLY = f"""WITH {TOKENS_CTE}
SELECT source, month(ts) AS moy, AVG(n_tok) AS n_tok_clim
FROM tok GROUP BY 1, 2
"""

# bias correction J3: v * clim_ref/clim_obs per (source, month-of-year);
# ref climatology from qc-good rows only. n_tok is integer-valued so every
# sum/avg is exact and order-independent; the double division+multiplication
# has identical operand order in operators/met.py::bias_correct_monthly.
BIAS_CORRECT_TOKENS = f"""WITH {TOKENS_CTE},
obs AS (SELECT source, month(ts) AS moy, AVG(n_tok) AS c FROM tok GROUP BY 1, 2),
refc AS (SELECT source, month(ts) AS moy, AVG(n_tok) AS c
         FROM tok WHERE qc IN (0, 1) GROUP BY 1, 2)
SELECT t.doc_id_str AS doc_id,
       CAST(t.ts AS DATE) AS date,
       CASE WHEN r.c IS NOT NULL AND o.c IS NOT NULL
            THEN CAST(t.n_tok AS DOUBLE) * r.c / o.c
            ELSE CAST(t.n_tok AS DOUBLE) END AS v
FROM tok t
LEFT JOIN obs o  ON t.source = o.source AND month(t.ts) = o.moy
LEFT JOIN refc r ON t.source = r.source AND month(t.ts) = r.moy
"""

QC_CODE_NULLIFY_1D = f"""WITH {TOKENS_CTE}
SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
  CAST(SUM(CASE WHEN qc <= 1 THEN n_tok END) AS BIGINT) AS sum_n_tok_clean,
  COUNT(*) AS n_seq
FROM tok GROUP BY 1, 2
"""

EVENTS_DAILY_MINMAX = """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS date,
  MIN(value) AS min_value, MAX(value) AS max_value,
  CAST(SUM(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS good_frac,
  COUNT(*) AS n
FROM events GROUP BY 1, 2
"""

REPEATED_VALUE_LINEITEM = """
WITH c AS (
  SELECT l_returnflag, l_quantity,
         COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) AS cnt
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN cnt > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_nullified
FROM c GROUP BY 1
"""

NORM_TO_MAX_LINEITEM = """
WITH m AS (
  SELECT l_returnflag, MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
  (l.l_quantity - m.lo) / (m.hi - m.lo) AS qnorm
FROM lineitem l JOIN m USING (l_returnflag)
"""
