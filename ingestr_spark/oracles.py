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

# reference weekly definition: lubridate::week 7-day blocks from Jan 1
# (R/get_obs_bysite_fluxnet.R:397-400); bucket = first day of the block
ROLLUP_1W_REF = f"""WITH {TOKENS_CTE}
{_tier_select("CAST(date_trunc('year', ts) + INTERVAL (((dayofyear(ts) - 1) // 7) * 7) DAY AS DATE)")}
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

# ---- dedup / similarity / text-analysis oracles ------------------------------

from ingestr_spark.datagen import EXACTDUP_CTE, NEARDUP_CTE  # noqa: E402

_V = 50257
_SH = f"""
sh AS (
  SELECT id,
         unnest(list_distinct(list_transform(range(1, len(tokens) - 1), i ->
             CAST(tokens[i] AS BIGINT) * {_V * _V}
           + CAST(tokens[i + 1] AS BIGINT) * {_V}
           + tokens[i + 2]))) AS shingle
  FROM tokd
)
"""

_MH_A = [31, 331, 3331, 33331, 2857, 28571, 5923, 59233]
_MH_B = [7, 77, 777, 7777, 1213, 12131, 2399, 23993]
_SIG_COLS = ",\n  ".join(
    f"MIN((shingle * {_MH_A[i]} + {_MH_B[i]}) % 1000000007) AS mh{i}" for i in range(8)
)
_SIG = f"sig AS (SELECT id, {_SIG_COLS} FROM sh GROUP BY id)"

_BANDS = "\nUNION\n".join(
    f"""SELECT l.id AS id_a, r.id AS id_b
FROM (SELECT id, CAST(mh{2*b} AS VARCHAR) || '_' || CAST(mh{2*b+1} AS VARCHAR) AS bucket FROM sig) l
JOIN (SELECT id, CAST(mh{2*b} AS VARCHAR) || '_' || CAST(mh{2*b+1} AS VARCHAR) AS bucket FROM sig) r
  USING (bucket) WHERE l.id < r.id"""
    for b in range(4)
)

MINHASH_PAIRS = f"""WITH {NEARDUP_CTE}, {_SH}, {_SIG},
cand AS ({_BANDS})
SELECT c.id_a, c.id_b,
  (( CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END
   + CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
   + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
   + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END
   + CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END
   + CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END
   + CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END
   + CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) / 8.0) AS est_jaccard
FROM cand c JOIN sig a ON c.id_a = a.id JOIN sig b ON c.id_b = b.id
WHERE (( CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END
   + CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
   + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
   + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END
   + CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END
   + CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END
   + CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END
   + CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) / 8.0) >= 0.5
"""

NGRAM_JACCARD_PAIRS = f"""WITH {NEARDUP_CTE}, {_SH},
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT l.id AS id_a, r.id AS id_b, COUNT(*) AS n_inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.n_inter AS BIGINT) AS n_inter,
       sa.sz AS sz_a, sb.sz AS sz_b,
       CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.id JOIN sizes sb ON i.id_b = sb.id
WHERE CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) >= 0.5
"""

_SIMHASH_SUMS = ",\n  ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(16)
)
_SIMHASH_FP = " + ".join(f"CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END" for b in range(16))

SIMHASH_FP = f"""WITH {NEARDUP_CTE},
t AS (SELECT id, unnest(tokens) AS tok FROM tokd),
h AS (SELECT id, (CAST(tok AS BIGINT) * 2654435761 + 40503) % 2147483648 AS h FROM t),
s AS (SELECT id, {_SIMHASH_SUMS} FROM h GROUP BY id)
SELECT id, CAST({_SIMHASH_FP} AS INT) AS simhash FROM s
"""

DEDUP_EXACT_FP = f"""WITH {EXACTDUP_CTE},
fp AS (
  SELECT id,
         list_reduce(list_prepend(CAST(0 AS BIGINT), tokens),
                     (a, x) -> (a * 31 + x) % 1000000000039) AS fp
  FROM dupd
)
SELECT fp, MIN(id) AS id FROM fp GROUP BY fp
"""

TOKEN_FINGERPRINT = f"""WITH {NEARDUP_CTE}
SELECT id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), tokens),
                   (a, x) -> (a * 31 + x) % 1000000000039) AS fp
FROM tokd
"""

_QEMB = """
q AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
  FROM embeddings
),
n AS (
  SELECT id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
  FROM q
)
"""

EMBEDDING_NEARDUP = f"""WITH {_QEMB},
p AS (
  SELECT l.id AS id_a, r.id AS id_b,
    CAST(list_sum(list_transform(range(1, len(l.q) + 1), i -> l.q[i] * r.q[i])) AS DOUBLE)
      / sqrt(CAST(l.nrm AS DOUBLE) * CAST(r.nrm AS DOUBLE)) AS cosine
  FROM n l JOIN n r ON l.id < r.id
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.4
"""

# Oracle for the LSH near-dup path is the EXACT all-pairs join over the
# derived planted-near-dup table (NEARDUP_EMB_CTE): the oracle may be O(n²)
# at sf0.01 — the engine must not be. A pytest separately asserts the Spark
# plan has no CartesianProduct and that LSH recall vs brute force is 1.0.
from ingestr_spark.datagen import NEARDUP_EMB_CTE  # noqa: E402

EMBEDDING_NEARDUP_LSH = f"""WITH {NEARDUP_EMB_CTE.strip().rstrip()},
n2 AS (
  SELECT id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
  FROM nde
),
p2 AS (
  SELECT l.id AS id_a, r.id AS id_b,
    CAST(list_sum(list_transform(range(1, len(l.q) + 1), i -> l.q[i] * r.q[i])) AS DOUBLE)
      / sqrt(CAST(l.nrm AS DOUBLE) * CAST(r.nrm AS DOUBLE)) AS cosine
  FROM n2 l JOIN n2 r ON l.id < r.id
)
SELECT id_a, id_b, cosine FROM p2 WHERE cosine >= 0.95
"""

ANN_TOPK = f"""WITH {_QEMB},
scored AS (
  SELECT qr.id AS query_id, c.id AS vec_id,
    CAST(list_sum(list_transform(range(1, len(c.q) + 1), i -> c.q[i] * qr.q[i])) AS DOUBLE)
      / sqrt(CAST(c.nrm AS DOUBLE) * CAST(qr.nrm AS DOUBLE)) AS cosine
  FROM n c JOIN n qr ON qr.id < 10 AND c.id <> qr.id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

# LSH ANN path (the 10^9-vector route): the DuckDB oracle mirrors the FULL
# algorithm — quantization, the quadratic-mix hyperplane sign sketch
# (similarity.py weights, pure integer arithmetic so both engines compute
# identical buckets), Hamming-1 multiprobe, exact rescoring, top-k. This is
# a self-consistency oracle: it proves the bucketing is engine- and
# partitioning-independent; recall vs brute force is the separate pytest.
ANN_TOPK_LSH = f"""WITH {_QEMB},
nb AS (
  SELECT id, q, nrm,
    CAST(list_sum(list_transform(range(0, 8), p ->
      CASE WHEN list_sum(list_transform(range(1, len(q) + 1), i ->
        q[i] * ((CAST(p*len(q)+i AS BIGINT)*CAST(p*len(q)+i AS BIGINT)*3571
                 + CAST(p*len(q)+i AS BIGINT)*8191) % 4001 - 2000)
      )) > 0 THEN 2**p ELSE 0 END)) AS INT) AS bucket
  FROM n
),
probes AS (
  SELECT id, q, nrm,
         unnest(list_prepend(bucket,
           list_transform(range(0, 8),
                          b -> CAST(xor(bucket::BIGINT, CAST(2**b AS BIGINT)) AS INT)))) AS bucket
  FROM nb WHERE id < 10
),
cand AS (
  SELECT DISTINCT pr.id AS query_id, c.id AS vec_id,
    CAST(list_sum(list_transform(range(1, len(c.q) + 1), i -> c.q[i] * pr.q[i])) AS DOUBLE)
      / sqrt(CAST(c.nrm AS DOUBLE) * CAST(pr.nrm AS DOUBLE)) AS cosine
  FROM nb c JOIN probes pr ON c.bucket = pr.bucket AND c.id <> pr.id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

TEXT_STATS = r"""
WITH s AS (
  SELECT doc_id, text, lang,
    len(regexp_extract_all(text, '\b(the|and|of|to|is|was|that)\b')) AS s_en,
    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein)\b')) AS s_de,
    len(regexp_extract_all(text, '\b(el|la|los|las|es|una|que|para)\b')) AS s_es,
    len(regexp_extract_all(text, '\b(le|la|les|est|une|dans|pour|avec)\b')) AS s_fr,
    len(regexp_extract_all(text, '[一-鿿]')) * 3 AS s_zh,
    len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
    len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}\-]')) AS n_punct,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws,
    length(text) AS n_chars
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'en'
       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'de'
       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'es'
       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'fr'
       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'zh'
       ELSE 'und' END AS lang_pred,
  CAST(n_words AS INT) AS n_words,
  CAST(n_bpe AS INT) AS n_bpe,
  CAST(n_ws AS INT) AS n_ws,
  (CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END
   + CASE WHEN CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) <= 0.1 THEN 0.3 ELSE 0.0 END
   + CASE WHEN CAST(n_words AS DOUBLE) / greatest(n_ws, 1) >= 0.8 THEN 0.3 ELSE 0.0 END) AS quality
FROM s
"""

# ---- bitfield QC / reshape / tsutil oracles ---------------------------------

# 16-bit QC word derived from id; mod13q1-style rules: bits0-1 in {0,1},
# bits2-5 < 12. Mirrors operators/bitqc.py::qc_bitfield_nullify.
_BITQC_MOD13Q1 = f"""WITH {TOKENS_CTE},
w AS (
  SELECT source, n_tok,
         (id * 40503) % 65536 AS qcw
  FROM tok
),
f AS (
  SELECT source, n_tok,
         ((qcw >> 0) & 3) IN (0, 1) AND ((qcw >> 2) & 15) < 12 AS ok
  FROM w
)
SELECT source,
  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_nulled,
  CAST(SUM(CASE WHEN ok THEN n_tok END) AS BIGINT) AS sum_n_tok_kept
FROM f GROUP BY 1
"""

# the reference's REAL bundled MCD15A3H point-extraction CSV (read-only):
# the faithful 8-bit rule (bit 0 MODLAND good, bits 3-4 CloudState clear,
# bits 5-7 SCF_QC in {0,1} — R/gapfill_interpol.R:155-225) applied to the
# actual FparLai_QC words, aggregated per year. This is bit arithmetic over
# real reference data on both engines. The rows are baked into the SQL as
# VALUES literals (read here, driver-side, when this module loads) so the
# oracle needs NO filesystem access from DuckDB — the driver's connection
# may restrict external file reads.
GEE_SUBSET_CSV = "/root/reference/inst/extdata/CH-Lae_MCD15A3H_gee_subset.csv"


def _gee_subset_values_sql() -> str:
    import csv

    def _cell(v: str) -> str:
        # NA / non-integer Fpar cells become SQL NULL — the counting SQL
        # below mirrors the Spark side, which treats a QC-passing row with
        # NULL Fpar as nulled, so parity holds regardless of cell contents
        # (ADVICE r4: the old silent read_csv fallback masked this)
        try:
            return str(int(v))
        except (TypeError, ValueError):
            return "NULL"

    try:
        with open(GEE_SUBSET_CSV) as fh:
            rows = list(csv.DictReader(fh))
        vals = ", ".join(
            f"(DATE '{r['date']}', {_cell(r['Fpar'])}, {int(r['FparLai_QC'])})"
            for r in rows
        )
    except Exception as e:
        # reference tree absent or the FILE itself unreadable: degrade to a
        # direct-scan form so importing this module never crashes — but
        # LOUDLY, because the degraded path has not been parity-checked
        # against the Spark reader on arbitrary contents
        import warnings

        warnings.warn(
            f"GEE oracle falling back to direct read_csv scan ({e!r}); "
            "NULL-Fpar parity depends on DuckDB's CSV inference here",
            RuntimeWarning,
            stacklevel=2,
        )
        return f"SELECT * FROM read_csv('{GEE_SUBSET_CSV}', header=true)"
    return f"SELECT * FROM (VALUES {vals}) t(date, Fpar, FparLai_QC)"


_BITQC_MCD15A3H_REAL = f"""
SELECT CAST(extract(year FROM date) AS VARCHAR) AS source,
  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_nulled,
  CAST(SUM(CASE WHEN kept THEN Fpar END) AS BIGINT) AS sum_n_tok_kept
FROM (
  -- kept == post-nullify Fpar IS NOT NULL on the Spark side: QC pass AND
  -- the original cell non-NULL (a QC-passing NULL-Fpar row counts as
  -- nulled there, so it must here too)
  SELECT date, Fpar,
    ((FparLai_QC >> 0) & 1) = 0 AND ((FparLai_QC >> 3) & 3) = 0
      AND ((FparLai_QC >> 5) & 7) IN (0, 1) AND Fpar IS NOT NULL AS kept
  FROM ({_gee_subset_values_sql()})
) GROUP BY 1
"""

BITQC_FILTER = f"""
SELECT 'mod13q1' AS profile, * FROM ({_BITQC_MOD13Q1})
UNION ALL
SELECT 'mcd15a3h_real' AS profile, * FROM ({_BITQC_MCD15A3H_REAL})
"""

PIVOT_EVENTS_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS date,
  count(*) FILTER (event_type = 'click')    AS click,
  count(*) FILTER (event_type = 'error')    AS error,
  count(*) FILTER (event_type = 'purchase') AS purchase,
  count(*) FILTER (event_type = 'signup')   AS signup,
  count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY 1
"""

SAMPLING_PERIOD_TOKENS = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket
  FROM tok GROUP BY 1, 2
),
g AS (
  SELECT source,
         date_diff('day', lag(bucket) OVER (PARTITION BY source ORDER BY bucket), bucket) AS gap
  FROM tier
)
SELECT source, CAST(MIN(gap) AS INT) AS period_days FROM g GROUP BY 1
"""

DEPTH_WEIGHTED_LINEITEM = """
WITH t AS (
  SELECT l_orderkey,
         SUM(l_quantity * l_linenumber) AS num,
         SUM(l_linenumber) AS den
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey, ROUND(num / den, 6) AS l_quantity FROM t
"""

# ---- downscale (step) + monthly-grain gap-fill oracles -----------------------

# G7 step method: monthly mean repeated over the month's days, only for
# (source, year) groups with all 12 months present (the kernel's contract).
DOWNSCALE_STEP = f"""WITH {TOKENS_CTE},
m AS (
  SELECT source, CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS moy,
         CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS v
  FROM tok GROUP BY 1, 2, 3
),
fully AS (SELECT source, y FROM m GROUP BY 1, 2 HAVING COUNT(*) = 12),
days AS (
  SELECT f.source, f.y,
         CAST(unnest(generate_series(make_date(f.y, 1, 1), make_date(f.y, 12, 31),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM fully f
)
SELECT d.source AS sitename, d.date, mm.v
FROM days d JOIN m mm
  ON mm.source = d.source AND mm.y = year(d.date) AND mm.moy = month(d.date)
"""

# G7 polynom downscaling: the quadratic-blend kernel
# (R/ingest_globalfields.R:1538-1626) ported formula-for-formula with the
# SAME left-associative IEEE operand order as downscale.monthly2daily (which
# writes every power as an explicit product for this reason) — bit-exact
# match, not tolerance. Boundary values: lag/lead over the full per-site
# monthly series (cross-year), falling back to same-year Dec/Jan like the
# kernel's mval_prev/mval_next defaults.
DOWNSCALE_POLYNOM = f"""WITH {TOKENS_CTE},
m AS (
  SELECT source, CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS moy,
         CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS v
  FROM tok GROUP BY 1, 2, 3
),
fully AS (SELECT source, y FROM m GROUP BY 1, 2 HAVING COUNT(*) = 12),
mm AS (
  SELECT m.*,
    LAG(v)  OVER (PARTITION BY source ORDER BY y, moy) AS pv,
    LEAD(v) OVER (PARTITION BY source ORDER BY y, moy) AS nv,
    LAG(v)  OVER (PARTITION BY source, y ORDER BY moy) AS prev_in_year,
    LEAD(v) OVER (PARTITION BY source, y ORDER BY moy) AS next_in_year,
    FIRST_VALUE(v) OVER (PARTITION BY source, y ORDER BY moy) AS jan_v,
    LAST_VALUE(v)  OVER (PARTITION BY source, y ORDER BY moy
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS dec_v
  FROM m
),
c1 AS (
  SELECT source, y, moy, v,
    CAST(day(last_day(make_date(y, moy, 1))) AS DOUBLE) AS dt,
    CASE WHEN moy = 1  THEN 31.0
         ELSE CAST(day(last_day(make_date(y, moy - 1, 1))) AS DOUBLE) END AS dtold,
    CASE WHEN moy = 12 THEN 31.0
         ELSE CAST(day(last_day(make_date(y, moy + 1, 1))) AS DOUBLE) END AS dtnew,
    CASE WHEN moy = 1  THEN COALESCE(pv, dec_v) ELSE prev_in_year END AS lastv,
    CASE WHEN moy = 12 THEN COALESCE(nv, jan_v) ELSE next_in_year END AS nxt,
    0.5 + CAST(dayofyear(make_date(y, moy, 1)) - 1 AS DOUBLE) AS startt
  FROM mm JOIN fully USING (source, y)
),
c2 AS (
  SELECT *, startt + dt AS endt,
    (v * dt + lastv * dtold) / (dt + dtold) AS starttemp,
    (nxt * dtnew + v * dt) / (dtnew + dt) AS endtemp
  FROM c1
),
c3 AS (
  SELECT *,
    endtemp - starttemp AS delta,
    endt * endt - startt * startt AS d2t,
    endt * endt * endt - startt * startt * startt AS d3t
  FROM c2
),
c4 AS (
  SELECT *,
    (v * dt - delta * d2t / dt / 2.0 - starttemp * dt + delta * startt) /
    (d3t / 3.0 - d2t * d2t / dt / 2.0 - dt * (startt * startt) + startt * d2t) AS ca
  FROM c3
),
c5 AS (SELECT *, delta / dt - ca * (startt + endt) AS cb FROM c4),
c6 AS (SELECT *, starttemp - ca * (startt * startt) - cb * startt AS cc FROM c5),
dd AS (
  SELECT source, ca, cb, cc,
    CAST(unnest(generate_series(make_date(y, moy, 1),
                                last_day(make_date(y, moy, 1)),
                                INTERVAL 1 DAY)) AS DATE) AS date
  FROM c6
)
SELECT source AS sitename, date,
  ca * (CAST(dayofyear(date) AS DOUBLE) * CAST(dayofyear(date) AS DOUBLE))
    + cb * CAST(dayofyear(date) AS DOUBLE) + cc AS v
FROM dd
"""

# G3/G4/G5 smoother exactness oracles: each kernel must reproduce a series
# it can represent exactly — Savitzky-Golay (poly=3) an exact cubic, LOESS
# (local quadratic) and the Reinsch spline (zero second difference -> zero
# roughness penalty) an exact line. The oracle is the closed-form series
# itself; both sides round to 4 decimals (kernel FP noise ~1e-9).
_SMOOTH_SERIES = """
s AS (SELECT DISTINCT source FROM tok),
sd AS (SELECT source, unnest(range(1, 62)) AS d FROM s)
"""

SMOOTH_SGOLAY_CUBIC = f"""WITH {TOKENS_CTE}, {_SMOOTH_SERIES}
SELECT source, CAST(DATE '2022-01-01' + INTERVAL (d) DAY AS DATE) AS bucket,
       round(CAST(d*d*d - 7*d*d + length(source)*d + 3*length(source) AS DOUBLE), 4) AS v_sg
FROM sd
"""

SMOOTH_ALL_LINEAR = f"""WITH {TOKENS_CTE}, {_SMOOTH_SERIES}
SELECT source, CAST(DATE '2022-01-01' + INTERVAL (d) DAY AS DATE) AS bucket,
       round(CAST(length(source)*d + 7 AS DOUBLE), 4) AS v_lo,
       round(CAST(length(source)*d + 7 AS DOUBLE), 4) AS v_sp,
       round(CAST(length(source)*d + 7 AS DOUBLE), 4) AS v_sg
FROM sd
"""

# monthly tier (anchored 15th) LOCF over a per-source monthly spine
GAPFILL_LOCF_1MO = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('month', ts) + INTERVAL 14 DAY AS DATE) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM tok GROUP BY 1, 2
),
bounds AS (SELECT source, MIN(bucket) AS lo, MAX(bucket) AS hi FROM tier GROUP BY 1),
spine AS (
  SELECT source, CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS bucket
  FROM bounds
),
joined AS (
  SELECT s.source, s.bucket, t.sum_n_tok, t.sum_n_tok IS NULL AS gap
  FROM spine s LEFT JOIN tier t USING (source, bucket)
)
SELECT source, bucket, gap,
  last_value(sum_n_tok IGNORE NULLS) OVER (
    PARTITION BY source ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_n_tok
FROM joined
"""

# ---- semi-structured props extraction ---------------------------------------
# regexp-based field extraction (portable across engines; Spark side also
# demonstrates get_json_object, compared via the regexp column)
JSON_PROPS_EVENTS = r"""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
  MIN(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS min_k,
  MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS max_k
FROM events GROUP BY 1
"""

# ---- sessionization / distinct / pushdown extras -----------------------------

SESSIONS_EVENTS = """
WITH s AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM s
),
per_session AS (
  SELECT user_id, session_idx, COUNT(*) AS cnt FROM g GROUP BY 1, 2
)
SELECT user_id,
  COUNT(*) AS n_sessions,
  CAST(SUM(cnt) AS BIGINT) AS n_events,
  CAST(MAX(cnt) AS BIGINT) AS max_session_events
FROM per_session GROUP BY 1
"""

DISTINCT_USERS_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS date,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_events
FROM events GROUP BY 1
"""

ROLLUP_1D_HOT = f"""WITH {TOKENS_CTE}
SELECT CAST(date_trunc('day', ts) AS DATE) AS bucket,
  COUNT(*) AS n_seq, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
FROM tok WHERE source = 'hot' GROUP BY 1
"""

# ---- as-of join oracle (DuckDB native ASOF LEFT JOIN) ------------------------
# left = every sequence row; right = daily sums of qc==0 rows only (sparse),
# so non-covered days genuinely carry forward from the previous observed day.
ASOF_DAILY_STATE = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS day_sum
  FROM tok WHERE qc = 0 GROUP BY 1, 2
)
SELECT l.doc_id_str AS doc_id, l.source, l.ts, r.day_sum
FROM tok l ASOF LEFT JOIN tier r
  ON l.source = r.source AND l.ts >= r.bucket
"""

# 1-D nearest-key join (J7 find_closest analog): nearest qc-good daily sum in
# EITHER direction, ties to the earlier bucket. The oracle is a correlated
# subquery (fine at sf0.01; the engine runs two chunked as-of passes).
NEAREST_DAILY_STATE = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS day_sum
  FROM tok WHERE qc = 0 GROUP BY 1, 2
)
SELECT l.doc_id_str AS doc_id, l.source,
  (SELECT r.day_sum FROM tier r WHERE r.source = l.source
     ORDER BY abs(epoch(r.bucket) - epoch(l.ts)), r.bucket LIMIT 1) AS day_sum,
  (SELECT CAST(abs(epoch(r.bucket) - epoch(l.ts)) AS BIGINT) FROM tier r
     WHERE r.source = l.source
     ORDER BY abs(epoch(r.bucket) - epoch(l.ts)), r.bucket LIMIT 1) AS nearest_dist
FROM tok l
"""

# ---- semi-join restriction / lag-fill / top-k ranks ---------------------------

# P11 semi-join through the oracle: keep only events on busy days (>=350
# events), then aggregate the kept rows per type.
BUSY_DAYS_SEMIJOIN = """
WITH busy AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events GROUP BY 1 HAVING COUNT(*) >= 350
)
SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(e.value), 6) AS sum_value
FROM events e
WHERE CAST(date_trunc('day', e.ts) AS DATE) IN (SELECT d FROM busy)
GROUP BY 1
"""

# W1 lag-cascade over spine gaps: nulls take the nearest of the previous 2
# values (not full LOCF - beyond 2 buckets stays null)
GAPFILL_LAG2_1D = f"""{_DAILY_TIER_CTE}
SELECT source, bucket, gap,
  COALESCE(sum_n_tok,
           lag(sum_n_tok, 1) OVER w,
           lag(sum_n_tok, 2) OVER w) AS sum_n_tok
FROM joined
WINDOW w AS (PARTITION BY source ORDER BY bucket)
"""

# R6/top-k: 3 longest sequences per source, deterministic tiebreak on id
TOP3_DOCS_PER_SOURCE = f"""WITH {TOKENS_CTE},
r AS (
  SELECT source, doc_id_str AS doc_id, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok DESC, id ASC) AS rank
  FROM tok
)
SELECT source, doc_id, n_tok, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
"""

# noleap spine day counts per source (D1 noleap semantics through the oracle)
NOLEAP_SPINE_DAYS = f"""WITH {TOKENS_CTE},
b AS (
  SELECT source, MIN(CAST(date_trunc('day', ts) AS DATE)) AS lo,
                 MAX(CAST(date_trunc('day', ts) AS DATE)) AS hi
  FROM tok GROUP BY 1
),
s AS (
  SELECT source, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
)
SELECT source, COUNT(*) AS n_days
FROM s WHERE NOT (month(d) = 2 AND day(d) = 29)
GROUP BY 1
"""


# G8 stored-golden oracle for the seeded stochastic precip generator
# (R/ingest_globalfields.R:1397-1517 semantics; DETERMINISM SPEC: seed =
# blake2b(key, year), downscale.py docstring). The generator is not
# SQL-expressible, so the oracle is a STORED GOLDEN: the exact 365 daily
# values for (source='hot', year=2023), produced once by the generator
# itself under its declared seed spec and frozen as integer MICRO-UNITS
# (round(prec * 1e6) — integers dodge cross-engine float-literal ulps).
# One golden per testdata scale factor, selected by a fingerprint of the
# input (sum(n_chars) over documents), so the oracle is valid at sf0.001,
# sf0.01, and sf0.1. Regressions in the kernel, the seeding, or the
# renormalization all break the hash; conservation/determinism properties
# are separately pytest-verified (test_downscale).
DOWNSCALE_PREC_GOLDEN = """
WITH g(k, d, p) AS (VALUES
  (1485576, DATE '2023-01-01', CAST(181936652 AS BIGINT)),
  (1485576, DATE '2023-01-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-03', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-05', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-07', CAST(6695774 AS BIGINT)),
  (1485576, DATE '2023-01-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-09', CAST(47238601 AS BIGINT)),
  (1485576, DATE '2023-01-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-12', CAST(26001388 AS BIGINT)),
  (1485576, DATE '2023-01-13', CAST(240830750 AS BIGINT)),
  (1485576, DATE '2023-01-14', CAST(443658127 AS BIGINT)),
  (1485576, DATE '2023-01-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-16', CAST(220393152 AS BIGINT)),
  (1485576, DATE '2023-01-17', CAST(9907738 AS BIGINT)),
  (1485576, DATE '2023-01-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-19', CAST(94794636 AS BIGINT)),
  (1485576, DATE '2023-01-20', CAST(56287838 AS BIGINT)),
  (1485576, DATE '2023-01-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-22', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-24', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-25', CAST(46955957 AS BIGINT)),
  (1485576, DATE '2023-01-26', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-01-29', CAST(80633061 AS BIGINT)),
  (1485576, DATE '2023-01-30', CAST(108666326 AS BIGINT)),
  (1485576, DATE '2023-01-31', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-01', CAST(41248653 AS BIGINT)),
  (1485576, DATE '2023-02-02', CAST(199050157 AS BIGINT)),
  (1485576, DATE '2023-02-03', CAST(6572062 AS BIGINT)),
  (1485576, DATE '2023-02-04', CAST(27450657 AS BIGINT)),
  (1485576, DATE '2023-02-05', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-07', CAST(197547805 AS BIGINT)),
  (1485576, DATE '2023-02-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-09', CAST(28684786 AS BIGINT)),
  (1485576, DATE '2023-02-10', CAST(17648850 AS BIGINT)),
  (1485576, DATE '2023-02-11', CAST(5279524 AS BIGINT)),
  (1485576, DATE '2023-02-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-13', CAST(30840950 AS BIGINT)),
  (1485576, DATE '2023-02-14', CAST(43970966 AS BIGINT)),
  (1485576, DATE '2023-02-15', CAST(28227098 AS BIGINT)),
  (1485576, DATE '2023-02-16', CAST(32120625 AS BIGINT)),
  (1485576, DATE '2023-02-17', CAST(21512250 AS BIGINT)),
  (1485576, DATE '2023-02-18', CAST(89410268 AS BIGINT)),
  (1485576, DATE '2023-02-19', CAST(5052018 AS BIGINT)),
  (1485576, DATE '2023-02-20', CAST(22492680 AS BIGINT)),
  (1485576, DATE '2023-02-21', CAST(286699691 AS BIGINT)),
  (1485576, DATE '2023-02-22', CAST(11428166 AS BIGINT)),
  (1485576, DATE '2023-02-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-24', CAST(148672125 AS BIGINT)),
  (1485576, DATE '2023-02-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-02-26', CAST(3367873 AS BIGINT)),
  (1485576, DATE '2023-02-27', CAST(1822799 AS BIGINT)),
  (1485576, DATE '2023-02-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-03', CAST(67968161 AS BIGINT)),
  (1485576, DATE '2023-03-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-05', CAST(32575385 AS BIGINT)),
  (1485576, DATE '2023-03-06', CAST(156990680 AS BIGINT)),
  (1485576, DATE '2023-03-07', CAST(5062452 AS BIGINT)),
  (1485576, DATE '2023-03-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-09', CAST(1906945 AS BIGINT)),
  (1485576, DATE '2023-03-10', CAST(6072019 AS BIGINT)),
  (1485576, DATE '2023-03-11', CAST(182961361 AS BIGINT)),
  (1485576, DATE '2023-03-12', CAST(3522362 AS BIGINT)),
  (1485576, DATE '2023-03-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-14', CAST(468877708 AS BIGINT)),
  (1485576, DATE '2023-03-15', CAST(738086191 AS BIGINT)),
  (1485576, DATE '2023-03-16', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-19', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-20', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-22', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-24', CAST(5939911 AS BIGINT)),
  (1485576, DATE '2023-03-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-26', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-27', CAST(8349061 AS BIGINT)),
  (1485576, DATE '2023-03-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-29', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-03-31', CAST(40467763 AS BIGINT)),
  (1485576, DATE '2023-04-01', CAST(98662436 AS BIGINT)),
  (1485576, DATE '2023-04-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-03', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-05', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-06', CAST(746131 AS BIGINT)),
  (1485576, DATE '2023-04-07', CAST(24001345 AS BIGINT)),
  (1485576, DATE '2023-04-08', CAST(46489439 AS BIGINT)),
  (1485576, DATE '2023-04-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-10', CAST(47236808 AS BIGINT)),
  (1485576, DATE '2023-04-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-13', CAST(15528215 AS BIGINT)),
  (1485576, DATE '2023-04-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-15', CAST(6959659 AS BIGINT)),
  (1485576, DATE '2023-04-16', CAST(3186857 AS BIGINT)),
  (1485576, DATE '2023-04-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-19', CAST(119745128 AS BIGINT)),
  (1485576, DATE '2023-04-20', CAST(6703016 AS BIGINT)),
  (1485576, DATE '2023-04-21', CAST(83403468 AS BIGINT)),
  (1485576, DATE '2023-04-22', CAST(207690425 AS BIGINT)),
  (1485576, DATE '2023-04-23', CAST(38457387 AS BIGINT)),
  (1485576, DATE '2023-04-24', CAST(110868217 AS BIGINT)),
  (1485576, DATE '2023-04-25', CAST(13515801 AS BIGINT)),
  (1485576, DATE '2023-04-26', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-04-28', CAST(86711880 AS BIGINT)),
  (1485576, DATE '2023-04-29', CAST(186773788 AS BIGINT)),
  (1485576, DATE '2023-04-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-01', CAST(25698127 AS BIGINT)),
  (1485576, DATE '2023-05-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-03', CAST(126736378 AS BIGINT)),
  (1485576, DATE '2023-05-04', CAST(483109682 AS BIGINT)),
  (1485576, DATE '2023-05-05', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-06', CAST(60556082 AS BIGINT)),
  (1485576, DATE '2023-05-07', CAST(66267233 AS BIGINT)),
  (1485576, DATE '2023-05-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-12', CAST(110776731 AS BIGINT)),
  (1485576, DATE '2023-05-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-16', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-19', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-20', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-22', CAST(27520156 AS BIGINT)),
  (1485576, DATE '2023-05-23', CAST(64919931 AS BIGINT)),
  (1485576, DATE '2023-05-24', CAST(18367614 AS BIGINT)),
  (1485576, DATE '2023-05-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-26', CAST(344069462 AS BIGINT)),
  (1485576, DATE '2023-05-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-05-28', CAST(106668436 AS BIGINT)),
  (1485576, DATE '2023-05-29', CAST(37852142 AS BIGINT)),
  (1485576, DATE '2023-05-30', CAST(105292186 AS BIGINT)),
  (1485576, DATE '2023-05-31', CAST(50405842 AS BIGINT)),
  (1485576, DATE '2023-06-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-02', CAST(21047056 AS BIGINT)),
  (1485576, DATE '2023-06-03', CAST(107893196 AS BIGINT)),
  (1485576, DATE '2023-06-04', CAST(63709582 AS BIGINT)),
  (1485576, DATE '2023-06-05', CAST(111667363 AS BIGINT)),
  (1485576, DATE '2023-06-06', CAST(357612631 AS BIGINT)),
  (1485576, DATE '2023-06-07', CAST(39359040 AS BIGINT)),
  (1485576, DATE '2023-06-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-11', CAST(9593604 AS BIGINT)),
  (1485576, DATE '2023-06-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-13', CAST(52607402 AS BIGINT)),
  (1485576, DATE '2023-06-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-16', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-19', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-20', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-21', CAST(95808250 AS BIGINT)),
  (1485576, DATE '2023-06-22', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-24', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-25', CAST(41569943 AS BIGINT)),
  (1485576, DATE '2023-06-26', CAST(29496546 AS BIGINT)),
  (1485576, DATE '2023-06-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-06-29', CAST(13520446 AS BIGINT)),
  (1485576, DATE '2023-06-30', CAST(86954943 AS BIGINT)),
  (1485576, DATE '2023-07-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-03', CAST(101705 AS BIGINT)),
  (1485576, DATE '2023-07-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-05', CAST(85787930 AS BIGINT)),
  (1485576, DATE '2023-07-06', CAST(9616930 AS BIGINT)),
  (1485576, DATE '2023-07-07', CAST(68199566 AS BIGINT)),
  (1485576, DATE '2023-07-08', CAST(4915185 AS BIGINT)),
  (1485576, DATE '2023-07-09', CAST(84438452 AS BIGINT)),
  (1485576, DATE '2023-07-10', CAST(469866352 AS BIGINT)),
  (1485576, DATE '2023-07-11', CAST(230208358 AS BIGINT)),
  (1485576, DATE '2023-07-12', CAST(148073799 AS BIGINT)),
  (1485576, DATE '2023-07-13', CAST(47143046 AS BIGINT)),
  (1485576, DATE '2023-07-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-15', CAST(98737637 AS BIGINT)),
  (1485576, DATE '2023-07-16', CAST(7953289 AS BIGINT)),
  (1485576, DATE '2023-07-17', CAST(153090448 AS BIGINT)),
  (1485576, DATE '2023-07-18', CAST(10722163 AS BIGINT)),
  (1485576, DATE '2023-07-19', CAST(4962487 AS BIGINT)),
  (1485576, DATE '2023-07-20', CAST(8804020 AS BIGINT)),
  (1485576, DATE '2023-07-21', CAST(150119 AS BIGINT)),
  (1485576, DATE '2023-07-22', CAST(105154953 AS BIGINT)),
  (1485576, DATE '2023-07-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-24', CAST(151966388 AS BIGINT)),
  (1485576, DATE '2023-07-25', CAST(5214516 AS BIGINT)),
  (1485576, DATE '2023-07-26', CAST(106427906 AS BIGINT)),
  (1485576, DATE '2023-07-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-29', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-07-31', CAST(31044752 AS BIGINT)),
  (1485576, DATE '2023-08-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-03', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-04', CAST(24101226 AS BIGINT)),
  (1485576, DATE '2023-08-05', CAST(110495873 AS BIGINT)),
  (1485576, DATE '2023-08-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-07', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-08', CAST(79498573 AS BIGINT)),
  (1485576, DATE '2023-08-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-11', CAST(61182968 AS BIGINT)),
  (1485576, DATE '2023-08-12', CAST(165937786 AS BIGINT)),
  (1485576, DATE '2023-08-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-16', CAST(83966274 AS BIGINT)),
  (1485576, DATE '2023-08-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-18', CAST(134107267 AS BIGINT)),
  (1485576, DATE '2023-08-19', CAST(25341762 AS BIGINT)),
  (1485576, DATE '2023-08-20', CAST(7990506 AS BIGINT)),
  (1485576, DATE '2023-08-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-22', CAST(30780365 AS BIGINT)),
  (1485576, DATE '2023-08-23', CAST(15878104 AS BIGINT)),
  (1485576, DATE '2023-08-24', CAST(267785262 AS BIGINT)),
  (1485576, DATE '2023-08-25', CAST(250364329 AS BIGINT)),
  (1485576, DATE '2023-08-26', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-08-29', CAST(105168830 AS BIGINT)),
  (1485576, DATE '2023-08-30', CAST(53340126 AS BIGINT)),
  (1485576, DATE '2023-08-31', CAST(41520750 AS BIGINT)),
  (1485576, DATE '2023-09-01', CAST(133929710 AS BIGINT)),
  (1485576, DATE '2023-09-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-03', CAST(41015666 AS BIGINT)),
  (1485576, DATE '2023-09-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-05', CAST(19747589 AS BIGINT)),
  (1485576, DATE '2023-09-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-07', CAST(191077456 AS BIGINT)),
  (1485576, DATE '2023-09-08', CAST(75732720 AS BIGINT)),
  (1485576, DATE '2023-09-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-13', CAST(68588422 AS BIGINT)),
  (1485576, DATE '2023-09-14', CAST(246132730 AS BIGINT)),
  (1485576, DATE '2023-09-15', CAST(68601817 AS BIGINT)),
  (1485576, DATE '2023-09-16', CAST(74933800 AS BIGINT)),
  (1485576, DATE '2023-09-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-19', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-20', CAST(62784778 AS BIGINT)),
  (1485576, DATE '2023-09-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-22', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-09-23', CAST(7139506 AS BIGINT)),
  (1485576, DATE '2023-09-24', CAST(22612407 AS BIGINT)),
  (1485576, DATE '2023-09-25', CAST(745776 AS BIGINT)),
  (1485576, DATE '2023-09-26', CAST(4779036 AS BIGINT)),
  (1485576, DATE '2023-09-27', CAST(58629821 AS BIGINT)),
  (1485576, DATE '2023-09-28', CAST(60585536 AS BIGINT)),
  (1485576, DATE '2023-09-29', CAST(122323229 AS BIGINT)),
  (1485576, DATE '2023-09-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-03', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-04', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-05', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-07', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-09', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-12', CAST(499653794 AS BIGINT)),
  (1485576, DATE '2023-10-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-16', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-17', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-19', CAST(11943107 AS BIGINT)),
  (1485576, DATE '2023-10-20', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-22', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-23', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-24', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-26', CAST(781203099 AS BIGINT)),
  (1485576, DATE '2023-10-27', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-28', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-29', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-10-31', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-01', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-02', CAST(7120845 AS BIGINT)),
  (1485576, DATE '2023-11-03', CAST(7722592 AS BIGINT)),
  (1485576, DATE '2023-11-04', CAST(310884179 AS BIGINT)),
  (1485576, DATE '2023-11-05', CAST(13536935 AS BIGINT)),
  (1485576, DATE '2023-11-06', CAST(155601493 AS BIGINT)),
  (1485576, DATE '2023-11-07', CAST(109103834 AS BIGINT)),
  (1485576, DATE '2023-11-08', CAST(243280599 AS BIGINT)),
  (1485576, DATE '2023-11-09', CAST(7145849 AS BIGINT)),
  (1485576, DATE '2023-11-10', CAST(116674139 AS BIGINT)),
  (1485576, DATE '2023-11-11', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-16', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-17', CAST(27472443 AS BIGINT)),
  (1485576, DATE '2023-11-18', CAST(21703473 AS BIGINT)),
  (1485576, DATE '2023-11-19', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-20', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-21', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-22', CAST(50898733 AS BIGINT)),
  (1485576, DATE '2023-11-23', CAST(110731964 AS BIGINT)),
  (1485576, DATE '2023-11-24', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-26', CAST(117808509 AS BIGINT)),
  (1485576, DATE '2023-11-27', CAST(75757524 AS BIGINT)),
  (1485576, DATE '2023-11-28', CAST(49876889 AS BIGINT)),
  (1485576, DATE '2023-11-29', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-11-30', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-01', CAST(105252806 AS BIGINT)),
  (1485576, DATE '2023-12-02', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-03', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-04', CAST(196408368 AS BIGINT)),
  (1485576, DATE '2023-12-05', CAST(176854247 AS BIGINT)),
  (1485576, DATE '2023-12-06', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-07', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-08', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-09', CAST(310889232 AS BIGINT)),
  (1485576, DATE '2023-12-10', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-11', CAST(4452630 AS BIGINT)),
  (1485576, DATE '2023-12-12', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-13', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-14', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-15', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-16', CAST(95219987 AS BIGINT)),
  (1485576, DATE '2023-12-17', CAST(128614534 AS BIGINT)),
  (1485576, DATE '2023-12-18', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-19', CAST(177514740 AS BIGINT)),
  (1485576, DATE '2023-12-20', CAST(14706584 AS BIGINT)),
  (1485576, DATE '2023-12-21', CAST(46362268 AS BIGINT)),
  (1485576, DATE '2023-12-22', CAST(146714477 AS BIGINT)),
  (1485576, DATE '2023-12-23', CAST(5567932 AS BIGINT)),
  (1485576, DATE '2023-12-24', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-25', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-26', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-27', CAST(44355013 AS BIGINT)),
  (1485576, DATE '2023-12-28', CAST(91927468 AS BIGINT)),
  (1485576, DATE '2023-12-29', CAST(0 AS BIGINT)),
  (1485576, DATE '2023-12-30', CAST(68319717 AS BIGINT)),
  (1485576, DATE '2023-12-31', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-01', CAST(32513995 AS BIGINT)),
  (149174, DATE '2023-01-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-13', CAST(43038990 AS BIGINT)),
  (149174, DATE '2023-01-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-16', CAST(39386576 AS BIGINT)),
  (149174, DATE '2023-01-17', CAST(1770617 AS BIGINT)),
  (149174, DATE '2023-01-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-19', CAST(16940799 AS BIGINT)),
  (149174, DATE '2023-01-20', CAST(10059229 AS BIGINT)),
  (149174, DATE '2023-01-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-01-29', CAST(14409977 AS BIGINT)),
  (149174, DATE '2023-01-30', CAST(19419816 AS BIGINT)),
  (149174, DATE '2023-01-31', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-04', CAST(6787185 AS BIGINT)),
  (149174, DATE '2023-02-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-07', CAST(48843766 AS BIGINT)),
  (149174, DATE '2023-02-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-10', CAST(4363685 AS BIGINT)),
  (149174, DATE '2023-02-11', CAST(1305364 AS BIGINT)),
  (149174, DATE '2023-02-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-02-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-11', CAST(43831278 AS BIGINT)),
  (149174, DATE '2023-03-12', CAST(843837 AS BIGINT)),
  (149174, DATE '2023-03-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-14', CAST(112327046 AS BIGINT)),
  (149174, DATE '2023-03-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-24', CAST(1422999 AS BIGINT)),
  (149174, DATE '2023-03-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-27', CAST(2000149 AS BIGINT)),
  (149174, DATE '2023-03-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-03-31', CAST(9694691 AS BIGINT)),
  (149174, DATE '2023-04-01', CAST(77142153 AS BIGINT)),
  (149174, DATE '2023-04-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-13', CAST(12141195 AS BIGINT)),
  (149174, DATE '2023-04-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-15', CAST(5441616 AS BIGINT)),
  (149174, DATE '2023-04-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-23', CAST(30069049 AS BIGINT)),
  (149174, DATE '2023-04-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-25', CAST(10567730 AS BIGINT)),
  (149174, DATE '2023-04-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-28', CAST(67798256 AS BIGINT)),
  (149174, DATE '2023-04-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-04-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-03', CAST(8572700 AS BIGINT)),
  (149174, DATE '2023-05-04', CAST(32678496 AS BIGINT)),
  (149174, DATE '2023-05-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-26', CAST(23273540 AS BIGINT)),
  (149174, DATE '2023-05-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-28', CAST(7215264 AS BIGINT)),
  (149174, DATE '2023-05-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-05-31', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-02', CAST(5357969 AS BIGINT)),
  (149174, DATE '2023-06-03', CAST(27466474 AS BIGINT)),
  (149174, DATE '2023-06-04', CAST(16218609 AS BIGINT)),
  (149174, DATE '2023-06-05', CAST(28427267 AS BIGINT)),
  (149174, DATE '2023-06-06', CAST(91037788 AS BIGINT)),
  (149174, DATE '2023-06-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-13', CAST(13392316 AS BIGINT)),
  (149174, DATE '2023-06-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-21', CAST(24389997 AS BIGINT)),
  (149174, DATE '2023-06-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-25', CAST(10582500 AS BIGINT)),
  (149174, DATE '2023-06-26', CAST(7508964 AS BIGINT)),
  (149174, DATE '2023-06-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-06-29', CAST(3441913 AS BIGINT)),
  (149174, DATE '2023-06-30', CAST(22136203 AS BIGINT)),
  (149174, DATE '2023-07-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-05', CAST(34478861 AS BIGINT)),
  (149174, DATE '2023-07-06', CAST(3865122 AS BIGINT)),
  (149174, DATE '2023-07-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-17', CAST(61528287 AS BIGINT)),
  (149174, DATE '2023-07-18', CAST(4309324 AS BIGINT)),
  (149174, DATE '2023-07-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-20', CAST(3538407 AS BIGINT)),
  (149174, DATE '2023-07-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-07-31', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-04', CAST(3171530 AS BIGINT)),
  (149174, DATE '2023-08-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-08', CAST(10461383 AS BIGINT)),
  (149174, DATE '2023-08-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-11', CAST(8051194 AS BIGINT)),
  (149174, DATE '2023-08-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-16', CAST(11049297 AS BIGINT)),
  (149174, DATE '2023-08-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-22', CAST(4050452 AS BIGINT)),
  (149174, DATE '2023-08-23', CAST(2089433 AS BIGINT)),
  (149174, DATE '2023-08-24', CAST(35238421 AS BIGINT)),
  (149174, DATE '2023-08-25', CAST(32945964 AS BIGINT)),
  (149174, DATE '2023-08-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-08-29', CAST(13839385 AS BIGINT)),
  (149174, DATE '2023-08-30', CAST(7019138 AS BIGINT)),
  (149174, DATE '2023-08-31', CAST(5463802 AS BIGINT)),
  (149174, DATE '2023-09-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-07', CAST(33831736 AS BIGINT)),
  (149174, DATE '2023-09-08', CAST(13409062 AS BIGINT)),
  (149174, DATE '2023-09-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-13', CAST(12144109 AS BIGINT)),
  (149174, DATE '2023-09-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-15', CAST(12146480 AS BIGINT)),
  (149174, DATE '2023-09-16', CAST(13267607 AS BIGINT)),
  (149174, DATE '2023-09-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-20', CAST(11116529 AS BIGINT)),
  (149174, DATE '2023-09-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-09-25', CAST(132045 AS BIGINT)),
  (149174, DATE '2023-09-26', CAST(846165 AS BIGINT)),
  (149174, DATE '2023-09-27', CAST(10380862 AS BIGINT)),
  (149174, DATE '2023-09-28', CAST(10727136 AS BIGINT)),
  (149174, DATE '2023-09-29', CAST(21658270 AS BIGINT)),
  (149174, DATE '2023-09-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-12', CAST(42161292 AS BIGINT)),
  (149174, DATE '2023-10-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-22', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-26', CAST(65918708 AS BIGINT)),
  (149174, DATE '2023-10-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-10-31', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-04', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-05', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-09', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-10', CAST(90182566 AS BIGINT)),
  (149174, DATE '2023-11-11', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-16', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-17', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-18', CAST(16775568 AS BIGINT)),
  (149174, DATE '2023-11-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-22', CAST(39341866 AS BIGINT)),
  (149174, DATE '2023-11-23', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-11-30', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-01', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-02', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-03', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-04', CAST(32294396 AS BIGINT)),
  (149174, DATE '2023-12-05', CAST(29079215 AS BIGINT)),
  (149174, DATE '2023-12-06', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-07', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-08', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-09', CAST(51117883 AS BIGINT)),
  (149174, DATE '2023-12-10', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-11', CAST(732123 AS BIGINT)),
  (149174, DATE '2023-12-12', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-13', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-14', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-15', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-16', CAST(15656522 AS BIGINT)),
  (149174, DATE '2023-12-17', CAST(21147412 AS BIGINT)),
  (149174, DATE '2023-12-18', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-19', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-20', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-21', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-22', CAST(24123491 AS BIGINT)),
  (149174, DATE '2023-12-23', CAST(915506 AS BIGINT)),
  (149174, DATE '2023-12-24', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-25', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-26', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-27', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-28', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-29', CAST(0 AS BIGINT)),
  (149174, DATE '2023-12-30', CAST(11233452 AS BIGINT)),
  (149174, DATE '2023-12-31', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-01', CAST(19514990 AS BIGINT)),
  (153156, DATE '2023-01-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-13', CAST(25832121 AS BIGINT)),
  (153156, DATE '2023-01-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-16', CAST(23639932 AS BIGINT)),
  (153156, DATE '2023-01-17', CAST(1062729 AS BIGINT)),
  (153156, DATE '2023-01-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-19', CAST(10167915 AS BIGINT)),
  (153156, DATE '2023-01-20', CAST(6037577 AS BIGINT)),
  (153156, DATE '2023-01-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-01-29', CAST(8648908 AS BIGINT)),
  (153156, DATE '2023-01-30', CAST(11655828 AS BIGINT)),
  (153156, DATE '2023-01-31', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-01', CAST(9619105 AS BIGINT)),
  (153156, DATE '2023-02-02', CAST(46418108 AS BIGINT)),
  (153156, DATE '2023-02-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-04', CAST(6401440 AS BIGINT)),
  (153156, DATE '2023-02-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-07', CAST(46067763 AS BIGINT)),
  (153156, DATE '2023-02-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-10', CAST(4115677 AS BIGINT)),
  (153156, DATE '2023-02-11', CAST(1231175 AS BIGINT)),
  (153156, DATE '2023-02-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-13', CAST(7192049 AS BIGINT)),
  (153156, DATE '2023-02-14', CAST(10253943 AS BIGINT)),
  (153156, DATE '2023-02-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-17', CAST(5016615 AS BIGINT)),
  (153156, DATE '2023-02-18', CAST(20850300 AS BIGINT)),
  (153156, DATE '2023-02-19', CAST(1178121 AS BIGINT)),
  (153156, DATE '2023-02-20', CAST(5245249 AS BIGINT)),
  (153156, DATE '2023-02-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-02-26', CAST(785381 AS BIGINT)),
  (153156, DATE '2023-02-27', CAST(425073 AS BIGINT)),
  (153156, DATE '2023-02-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-11', CAST(28846485 AS BIGINT)),
  (153156, DATE '2023-03-12', CAST(555351 AS BIGINT)),
  (153156, DATE '2023-03-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-14', CAST(73925302 AS BIGINT)),
  (153156, DATE '2023-03-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-24', CAST(936512 AS BIGINT)),
  (153156, DATE '2023-03-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-27', CAST(1316349 AS BIGINT)),
  (153156, DATE '2023-03-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-03-31', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-15', CAST(7311132 AS BIGINT)),
  (153156, DATE '2023-04-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-23', CAST(40399542 AS BIGINT)),
  (153156, DATE '2023-04-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-25', CAST(14198369 AS BIGINT)),
  (153156, DATE '2023-04-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-28', CAST(91090957 AS BIGINT)),
  (153156, DATE '2023-04-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-04-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-01', CAST(2236024 AS BIGINT)),
  (153156, DATE '2023-05-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-03', CAST(11027479 AS BIGINT)),
  (153156, DATE '2023-05-04', CAST(42035931 AS BIGINT)),
  (153156, DATE '2023-05-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-12', CAST(9638811 AS BIGINT)),
  (153156, DATE '2023-05-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-22', CAST(2394561 AS BIGINT)),
  (153156, DATE '2023-05-23', CAST(5648758 AS BIGINT)),
  (153156, DATE '2023-05-24', CAST(1598187 AS BIGINT)),
  (153156, DATE '2023-05-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-26', CAST(29937881 AS BIGINT)),
  (153156, DATE '2023-05-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-05-28', CAST(9281344 AS BIGINT)),
  (153156, DATE '2023-05-29', CAST(3293559 AS BIGINT)),
  (153156, DATE '2023-05-30', CAST(9161595 AS BIGINT)),
  (153156, DATE '2023-05-31', CAST(4385870 AS BIGINT)),
  (153156, DATE '2023-06-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-02', CAST(2188236 AS BIGINT)),
  (153156, DATE '2023-06-03', CAST(11217518 AS BIGINT)),
  (153156, DATE '2023-06-04', CAST(6623804 AS BIGINT)),
  (153156, DATE '2023-06-05', CAST(11609913 AS BIGINT)),
  (153156, DATE '2023-06-06', CAST(37180529 AS BIGINT)),
  (153156, DATE '2023-06-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-06-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-05', CAST(31475407 AS BIGINT)),
  (153156, DATE '2023-07-06', CAST(3528431 AS BIGINT)),
  (153156, DATE '2023-07-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-15', CAST(36226626 AS BIGINT)),
  (153156, DATE '2023-07-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-17', CAST(56168556 AS BIGINT)),
  (153156, DATE '2023-07-18', CAST(3933938 AS BIGINT)),
  (153156, DATE '2023-07-19', CAST(1820726 AS BIGINT)),
  (153156, DATE '2023-07-20', CAST(3230176 AS BIGINT)),
  (153156, DATE '2023-07-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-24', CAST(55756140 AS BIGINT)),
  (153156, DATE '2023-07-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-07-31', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-04', CAST(2212320 AS BIGINT)),
  (153156, DATE '2023-08-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-08', CAST(7297399 AS BIGINT)),
  (153156, DATE '2023-08-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-11', CAST(5616158 AS BIGINT)),
  (153156, DATE '2023-08-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-16', CAST(7707502 AS BIGINT)),
  (153156, DATE '2023-08-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-22', CAST(2825417 AS BIGINT)),
  (153156, DATE '2023-08-23', CAST(1457496 AS BIGINT)),
  (153156, DATE '2023-08-24', CAST(24580767 AS BIGINT)),
  (153156, DATE '2023-08-25', CAST(22981650 AS BIGINT)),
  (153156, DATE '2023-08-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-08-29', CAST(9653744 AS BIGINT)),
  (153156, DATE '2023-08-30', CAST(4896241 AS BIGINT)),
  (153156, DATE '2023-08-31', CAST(3811307 AS BIGINT)),
  (153156, DATE '2023-09-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-07', CAST(35697011 AS BIGINT)),
  (153156, DATE '2023-09-08', CAST(14148355 AS BIGINT)),
  (153156, DATE '2023-09-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-13', CAST(12813661 AS BIGINT)),
  (153156, DATE '2023-09-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-15', CAST(12816163 AS BIGINT)),
  (153156, DATE '2023-09-16', CAST(13999102 AS BIGINT)),
  (153156, DATE '2023-09-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-20', CAST(11729426 AS BIGINT)),
  (153156, DATE '2023-09-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-09-25', CAST(139326 AS BIGINT)),
  (153156, DATE '2023-09-26', CAST(892818 AS BIGINT)),
  (153156, DATE '2023-09-27', CAST(10953199 AS BIGINT)),
  (153156, DATE '2023-09-28', CAST(11318565 AS BIGINT)),
  (153156, DATE '2023-09-29', CAST(22852375 AS BIGINT)),
  (153156, DATE '2023-09-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-12', CAST(70201205 AS BIGINT)),
  (153156, DATE '2023-10-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-22', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-26', CAST(109758795 AS BIGINT)),
  (153156, DATE '2023-10-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-10-31', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-04', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-05', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-09', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-11', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-16', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-17', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-22', CAST(118100000 AS BIGINT)),
  (153156, DATE '2023-11-23', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-11-30', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-01', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-02', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-03', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-04', CAST(34762846 AS BIGINT)),
  (153156, DATE '2023-12-05', CAST(31301909 AS BIGINT)),
  (153156, DATE '2023-12-06', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-07', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-08', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-09', CAST(55025123 AS BIGINT)),
  (153156, DATE '2023-12-10', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-11', CAST(788083 AS BIGINT)),
  (153156, DATE '2023-12-12', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-13', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-14', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-15', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-16', CAST(16853242 AS BIGINT)),
  (153156, DATE '2023-12-17', CAST(22763833 AS BIGINT)),
  (153156, DATE '2023-12-18', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-19', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-20', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-21', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-22', CAST(25967390 AS BIGINT)),
  (153156, DATE '2023-12-23', CAST(985483 AS BIGINT)),
  (153156, DATE '2023-12-24', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-25', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-26', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-27', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-28', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-29', CAST(0 AS BIGINT)),
  (153156, DATE '2023-12-30', CAST(12092091 AS BIGINT)),
  (153156, DATE '2023-12-31', CAST(0 AS BIGINT))
)
SELECT 'hot' AS sitename, d AS date, p AS prec_micro
FROM g WHERE k = (SELECT SUM(n_chars) FROM documents)
"""


# ---- round-2 oracle batch: previously pytest-only SURVEY rows ----------------

# P4 composite GPP cleaning, step-for-step: qc-fraction nullify -> NT/DT
# residual quantile consistency (same residual column for both series) ->
# Tukey IQR per series, in the same order as clean.clean_gpp.
CLEAN_GPP_TOKENS = f"""WITH {TOKENS_CTE},
base AS (
  SELECT source,
         CAST(n_tok AS DOUBLE) AS nt,
         CAST(n_tok + (id % 21) - 10 AS DOUBLE) AS dt,
         ((id*7) % 100) / 100.0 AS ntq,
         ((id*13) % 100) / 100.0 AS dtq
  FROM tok
),
s1 AS (
  SELECT source,
         CASE WHEN ntq < 0.8 THEN NULL ELSE nt END AS nt,
         CASE WHEN dtq < 0.8 THEN NULL ELSE dt END AS dt
  FROM base
),
s2 AS (SELECT *, nt - dt AS res FROM s1),
rq AS (SELECT source, quantile_cont(res, 0.025) AS rlo, quantile_cont(res, 0.975) AS rhi
       FROM s2 GROUP BY 1),
s3 AS (
  SELECT s2.source,
         CASE WHEN s2.res < rq.rlo OR s2.res > rq.rhi THEN NULL ELSE s2.nt END AS nt,
         CASE WHEN s2.res < rq.rlo OR s2.res > rq.rhi THEN NULL ELSE s2.dt END AS dt
  FROM s2 JOIN rq USING (source)
),
f1 AS (SELECT source, quantile_cont(nt, 0.25) AS q1, quantile_cont(nt, 0.75) AS q3
       FROM s3 GROUP BY 1),
s4 AS (
  SELECT s3.source,
         CASE WHEN s3.nt < f1.q1 - 1.5*(f1.q3 - f1.q1)
                OR s3.nt > f1.q3 + 1.5*(f1.q3 - f1.q1) THEN NULL ELSE s3.nt END AS nt,
         s3.dt
  FROM s3 JOIN f1 USING (source)
),
f2 AS (SELECT source, quantile_cont(dt, 0.25) AS q1, quantile_cont(dt, 0.75) AS q3
       FROM s4 GROUP BY 1),
s5 AS (
  SELECT s4.source, s4.nt,
         CASE WHEN s4.dt < f2.q1 - 1.5*(f2.q3 - f2.q1)
                OR s4.dt > f2.q3 + 1.5*(f2.q3 - f2.q1) THEN NULL ELSE s4.dt END AS dt
  FROM s4 JOIN f2 USING (source)
)
SELECT source,
  CAST(SUM(CASE WHEN nt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nt_null,
  CAST(SUM(CASE WHEN dt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dt_null,
  CAST(SUM(nt) AS BIGINT) AS sum_nt,
  CAST(SUM(dt) AS BIGINT) AS sum_dt
FROM s5 GROUP BY 1
"""

DAYTIME_DAILY_EVENTS = """
WITH f AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS date, value,
         CAST(event_id % 4 AS INT) AS qcc
  FROM events WHERE value > 0
)
SELECT event_type, date,
  round(AVG(value), 6) AS value_mean,
  round(SUM(CASE WHEN qcc IN (0, 1) THEN 1 ELSE 0 END) / COUNT(*), 6) AS good_frac
FROM f GROUP BY 1, 2
"""

ANTI_JOIN_EVENTS = """
WITH failed AS (
  SELECT user_id FROM events WHERE event_type = 'error'
  GROUP BY 1 HAVING COUNT(*) >= 12
)
SELECT event_type, COUNT(*) AS n, round(SUM(value), 6) AS sum_value
FROM events e ANTI JOIN failed f ON e.user_id = f.user_id
GROUP BY 1
"""

CROSS_PIXEL_EVENTS = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS date, round(AVG(value), 6) AS value
FROM events WHERE CAST(user_id % 10 AS INT) IN (1, 3, 5) GROUP BY 1
"""

DOY_CLIM_FILL_1D = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM tok WHERE qc <= 1 GROUP BY 1, 2
),
bounds AS (SELECT source, MIN(bucket) AS lo, MAX(bucket) AS hi FROM tier GROUP BY 1),
spine AS (
  SELECT source, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS bucket
  FROM bounds
),
j AS (
  SELECT s.source, s.bucket, t.sum_n_tok
  FROM spine s LEFT JOIN tier t USING (source, bucket)
),
clim AS (
  SELECT source, dayofyear(bucket) AS doy, AVG(sum_n_tok) AS clim
  FROM j GROUP BY 1, 2
)
SELECT j.source, j.bucket,
       CAST(COALESCE(CAST(j.sum_n_tok AS DOUBLE), c.clim) AS DOUBLE) AS v
FROM j JOIN clim c ON c.source = j.source AND c.doy = dayofyear(j.bucket)
"""

MEAN_SCALING_TOKENS = f"""WITH {TOKENS_CTE},
m AS (SELECT source, AVG(CAST(n_tok AS DOUBLE)) AS mean FROM tok GROUP BY 1)
SELECT t.doc_id_str AS doc_id, CAST(t.n_tok AS DOUBLE) * 100.0 / m.mean AS v
FROM tok t JOIN m USING (source)
"""

COMPLETENESS_TOKENS = f"""WITH {TOKENS_CTE},
b AS (
  SELECT source,
         CASE WHEN qc <= 1 THEN n_tok END AS a,
         CASE WHEN id % 5 <> 0 THEN n_tok END AS b
  FROM tok
)
SELECT source, COUNT(a) AS n_a, COUNT(b) AS n_b,
       (COUNT(a) >= 20 AND COUNT(b) >= 20) AS keep
FROM b GROUP BY 1
"""

PATCH_DEC30_TIER = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS date,
         CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM tok GROUP BY 1, 2
),
lastrow AS (
  SELECT source, date, sum_n_tok FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY date DESC) AS rn FROM tier
  ) WHERE rn = 1 AND month(date) = 12 AND day(date) = 30
),
patched AS (
  SELECT source, date, sum_n_tok FROM tier
  UNION ALL
  SELECT source, CAST(date + INTERVAL 1 DAY AS DATE), sum_n_tok FROM lastrow
)
SELECT source, COUNT(*) AS n_rows, MAX(date) AS max_date,
       CAST(SUM(sum_n_tok) AS BIGINT) AS total
FROM patched GROUP BY 1
"""

UNPIVOT_TIER_LONG = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok, COUNT(*) AS n_seq
  FROM tok GROUP BY 1, 2
),
long AS (
  SELECT source, bucket, 'sum_n_tok' AS name, sum_n_tok AS value FROM tier
  UNION ALL
  SELECT source, bucket, 'n_seq' AS name, n_seq AS value FROM tier
)
SELECT source, name, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS total
FROM long GROUP BY 1, 2
"""

RECONSTRUCT_HOURLY_TIER = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS date, COUNT(*) AS n_seq
  FROM tok GROUP BY 1, 2
),
idx AS (
  SELECT source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY date) AS row_idx
  FROM tier
)
SELECT source, CAST(row_idx % 24 AS INT) AS hod, COUNT(*) AS n
FROM idx GROUP BY 1, 2
"""

# F1/F2/F3/F5 scalar functions: formulas mirrored with the SAME operand order
# as functions/calc.py (constants computed as the same IEEE expressions);
# rounded to 4 decimals since JVM vs libm transcendentals can differ ~1 ulp.
MET_FUNCTIONS_TOKENS = f"""WITH {TOKENS_CTE},
b AS (
  SELECT doc_id_str AS doc_id,
    CAST(id % 3000 AS DOUBLE) AS elv,
    CAST(n_tok % 40 AS DOUBLE) AS tc,
    0.001 + (id % 10) / 1000.0 AS qair,
    CAST((id % 120) - 60 AS DOUBLE) AS lat,
    CAST(dayofyear(ts) AS DOUBLE) AS doy
  FROM tok
),
p AS (SELECT *, 101325.0 * pow(1.0 - 0.0065 * elv / 298.15,
                               9.80665 * 0.028963 / (8.3145 * 0.0065)) AS patm FROM b),
e AS (SELECT *, qair / (1.0 - qair) AS wair,
             8.3143 / 18.02 AS rv, 8.3143 / 28.963 AS rd FROM p),
v AS (SELECT *, patm * wair * rv / (rd + wair * rv) AS eact FROM e),
w AS (SELECT *, 611.0 * exp(17.27 * tc / (tc + 237.3)) AS es FROM v),
g AS (SELECT *, 23.45 * sin(6.283185307179586 * (284.0 + doy) / 365.0) AS decl FROM w),
x1 AS (SELECT *, greatest(-1.0, least(1.0,
          -tan(lat * 0.017453292519943295) * tan(decl * 0.017453292519943295))) AS x FROM g),
f AS (SELECT *, sqrt(1.0 - x * x) / (2.0 * acos(x)) AS frac FROM x1)
SELECT doc_id,
  round(patm, 4) AS patm,
  round(eact, 4) AS vp,
  round(greatest(0.0, es - eact), 4) AS vpd,
  round((tc + 5.0) * (0.5 + frac) + (tc - 5.0) * (0.5 - frac), 4) AS tgrowth
FROM f
"""


SCALE_FACTOR_DIM = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         CAST(SUM(n_tok) AS DOUBLE) AS v
  FROM tok GROUP BY 1, 2
),
banded AS (SELECT *, CAST(dayofweek(bucket) + 1 AS INT) AS band FROM tier),
factors AS (
  SELECT DISTINCT band, 1.0 + band / 10.0 AS scale_factor
  FROM banded WHERE band <= 5
)
SELECT b.source, b.bucket, b.v * COALESCE(f.scale_factor, 1.0) AS v
FROM banded b LEFT JOIN factors f USING (band)
"""

UNION_WITH_ID = f"""WITH {TOKENS_CTE},
u AS (
  SELECT 'good' AS part, source, n_tok FROM tok WHERE qc <= 1
  UNION ALL
  SELECT 'bad'  AS part, source, n_tok FROM tok WHERE qc > 1
)
SELECT part, source, COUNT(*) AS n, CAST(SUM(n_tok) AS BIGINT) AS total
FROM u GROUP BY 1, 2
"""

EXPAND_GRID_MONTHS = f"""WITH {TOKENS_CTE},
grid AS (
  SELECT y.year, m.moy
  FROM (SELECT unnest(range(2022, 2025)) AS year) y,
       (SELECT unnest(range(1, 13)) AS moy) m
),
cells AS (
  SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS moy, COUNT(*) AS n
  FROM tok GROUP BY 1, 2
)
SELECT CAST(g.year AS INT) AS year, CAST(g.moy AS INT) AS moy,
       COALESCE(c.n, 0) AS n
FROM grid g LEFT JOIN cells c ON c.year = g.year AND c.moy = g.moy
"""

# Round-5 registry fold (VERDICT r4 #7): R1 pivot_longer and R5 expand.grid
# share one slot. UNION ALL BY NAME — the grid rows carry NULL
# (source, name, total) and the long rows NULL (year, moy) on BOTH engines.
RESHAPE_LONG_GRID = f"""
SELECT 'long' AS probe, * FROM ({UNPIVOT_TIER_LONG})
UNION ALL BY NAME
SELECT 'grid' AS probe, * FROM ({EXPAND_GRID_MONTHS})
"""

NEST_TOKENS = f"""WITH {TOKENS_CTE},
tier AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         CAST(SUM(n_tok) AS BIGINT) AS v
  FROM tok GROUP BY 1, 2
)
SELECT source,
  CAST(COUNT(*) AS INT) AS n_days,
  MIN(bucket) AS first_bucket,
  arg_max(v, bucket) AS last_v
FROM tier GROUP BY 1
"""


# Connected-component dedup: cluster near-dup pairs and elect the min id as
# the representative. The oracle computes EXACT transitive closure with a
# recursive CTE (fine at sf0.01; the engine runs O(diameter) rounds of
# min-label propagation). Pairs = the same MinHash-LSH pairs as
# MINHASH_PAIRS (est_jaccard >= 0.5).
_MH_MATCHES = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(8)
)

DEDUP_CLUSTER_REPS = f"""WITH RECURSIVE {NEARDUP_CTE}, {_SH}, {_SIG},
cand AS ({_BANDS}),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
  WHERE (({_MH_MATCHES}) / 8.0) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
ids AS (SELECT DISTINCT id FROM tokd),
reach AS (
  SELECT id, id AS r FROM ids
  UNION
  SELECT e.dst AS id, rc.r FROM reach rc JOIN edges e ON e.src = rc.id
)
SELECT id, MIN(r) AS rep FROM reach GROUP BY id
"""


# Codec round trip, driver-visible: the Spark side packs the daily tier into
# delta-of-delta + Gorilla chunks and decodes them back; the oracle is the
# PLAIN tier — it never sees the codec, so any bit drift breaks the hash.
CODEC_ROUNDTRIP_1D = f"""WITH {TOKENS_CTE}
SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
       CAST(SUM(n_tok) AS DOUBLE) AS v
FROM tok GROUP BY 1, 2
"""


# Multimodal plumbing, driver-visible: the deterministic fake decoder is
# byte statistics over a constant-length payload ('PAYLOAD:' + sha256 hex,
# 72 bytes -> 16 np.array_split chunk means / 255), which DuckDB can
# reproduce character-for-character (ascii() sums over fixed substring
# boundaries). Proves the mapInPandas batch path end-to-end; the real
# decoder stays an honest NotImplementedError (no PIL/ffmpeg here).
MULTIMODAL_FEATURES = """
WITH m AS (
  SELECT printf('m-%09d', CAST(r.range AS BIGINT)) AS media_id,
         'image' AS kind,
         'PAYLOAD:' || sha256(CAST(r.range AS VARCHAR)) AS s
  FROM range(500) r
)
SELECT media_id, kind,
  (CAST((ascii(substring(s, 1, 1)) + ascii(substring(s, 2, 1)) + ascii(substring(s, 3, 1)) + ascii(substring(s, 4, 1)) + ascii(substring(s, 5, 1))) AS DOUBLE) / 5) / 255.0 AS f0,
  (CAST((ascii(substring(s, 6, 1)) + ascii(substring(s, 7, 1)) + ascii(substring(s, 8, 1)) + ascii(substring(s, 9, 1)) + ascii(substring(s, 10, 1))) AS DOUBLE) / 5) / 255.0 AS f1,
  (CAST((ascii(substring(s, 11, 1)) + ascii(substring(s, 12, 1)) + ascii(substring(s, 13, 1)) + ascii(substring(s, 14, 1)) + ascii(substring(s, 15, 1))) AS DOUBLE) / 5) / 255.0 AS f2,
  (CAST((ascii(substring(s, 16, 1)) + ascii(substring(s, 17, 1)) + ascii(substring(s, 18, 1)) + ascii(substring(s, 19, 1)) + ascii(substring(s, 20, 1))) AS DOUBLE) / 5) / 255.0 AS f3,
  (CAST((ascii(substring(s, 21, 1)) + ascii(substring(s, 22, 1)) + ascii(substring(s, 23, 1)) + ascii(substring(s, 24, 1)) + ascii(substring(s, 25, 1))) AS DOUBLE) / 5) / 255.0 AS f4,
  (CAST((ascii(substring(s, 26, 1)) + ascii(substring(s, 27, 1)) + ascii(substring(s, 28, 1)) + ascii(substring(s, 29, 1)) + ascii(substring(s, 30, 1))) AS DOUBLE) / 5) / 255.0 AS f5,
  (CAST((ascii(substring(s, 31, 1)) + ascii(substring(s, 32, 1)) + ascii(substring(s, 33, 1)) + ascii(substring(s, 34, 1)) + ascii(substring(s, 35, 1))) AS DOUBLE) / 5) / 255.0 AS f6,
  (CAST((ascii(substring(s, 36, 1)) + ascii(substring(s, 37, 1)) + ascii(substring(s, 38, 1)) + ascii(substring(s, 39, 1)) + ascii(substring(s, 40, 1))) AS DOUBLE) / 5) / 255.0 AS f7,
  (CAST((ascii(substring(s, 41, 1)) + ascii(substring(s, 42, 1)) + ascii(substring(s, 43, 1)) + ascii(substring(s, 44, 1))) AS DOUBLE) / 4) / 255.0 AS f8,
  (CAST((ascii(substring(s, 45, 1)) + ascii(substring(s, 46, 1)) + ascii(substring(s, 47, 1)) + ascii(substring(s, 48, 1))) AS DOUBLE) / 4) / 255.0 AS f9,
  (CAST((ascii(substring(s, 49, 1)) + ascii(substring(s, 50, 1)) + ascii(substring(s, 51, 1)) + ascii(substring(s, 52, 1))) AS DOUBLE) / 4) / 255.0 AS f10,
  (CAST((ascii(substring(s, 53, 1)) + ascii(substring(s, 54, 1)) + ascii(substring(s, 55, 1)) + ascii(substring(s, 56, 1))) AS DOUBLE) / 4) / 255.0 AS f11,
  (CAST((ascii(substring(s, 57, 1)) + ascii(substring(s, 58, 1)) + ascii(substring(s, 59, 1)) + ascii(substring(s, 60, 1))) AS DOUBLE) / 4) / 255.0 AS f12,
  (CAST((ascii(substring(s, 61, 1)) + ascii(substring(s, 62, 1)) + ascii(substring(s, 63, 1)) + ascii(substring(s, 64, 1))) AS DOUBLE) / 4) / 255.0 AS f13,
  (CAST((ascii(substring(s, 65, 1)) + ascii(substring(s, 66, 1)) + ascii(substring(s, 67, 1)) + ascii(substring(s, 68, 1))) AS DOUBLE) / 4) / 255.0 AS f14,
  (CAST((ascii(substring(s, 69, 1)) + ascii(substring(s, 70, 1)) + ascii(substring(s, 71, 1)) + ascii(substring(s, 72, 1))) AS DOUBLE) / 4) / 255.0 AS f15
FROM m
"""


# =============================================================================
# Round-3 composites: the driver records at most ~50 queries, so every
# operator's oracle is packed into <=50 registered entries. Each composite
# below REUSES the standalone oracle strings verbatim (DuckDB allows CTEs in
# subqueries), so the per-operator mirrors stay in lockstep — a composite is
# a union-with-tag (same-schema operators) or a key join (per-row operators),
# never a weaker check.
# =============================================================================

def _epoch_tier(tag: str, sql: str) -> str:
    """Wrap a DATE-bucket tier oracle into (tier, source, bucket_epoch, accs)."""
    return f"""SELECT '{tag}' AS tier, source,
  CAST(epoch(CAST(bucket AS TIMESTAMP)) AS BIGINT) AS bucket_epoch,
  n_seq, sum_n_tok, min_n_tok, max_n_tok, tok_sum, tok_min, tok_max,
  qc_ok_cnt, avg_n_tok, qc_frac
FROM ({sql})"""


ROLLUP_TIERS = f"""
SELECT '1h' AS tier, * FROM ({ROLLUP_1H})
UNION ALL {_epoch_tier('1d', ROLLUP_1D)}
UNION ALL {_epoch_tier('1w', ROLLUP_1W)}
UNION ALL {_epoch_tier('1w_ref', ROLLUP_1W_REF)}
"""

ROLLUP_CASCADES = f"""
SELECT '1mo' AS tier, * FROM ({ROLLUP_1MO})
UNION ALL SELECT '1y' AS tier, * FROM ({ROLLUP_1Y})
UNION ALL SELECT '1w' AS tier, * FROM ({ROLLUP_1W})
"""

# salted two-phase agg == plain rollup; hot = pushdown path (filter before
# rollup on the Spark side), full accumulator schema for both
ROLLUP_SKEW = f"""
SELECT 'salted' AS path, * FROM ({ROLLUP_1D})
UNION ALL
SELECT 'hot' AS path, * FROM ({ROLLUP_1D}) WHERE source = 'hot'
"""

GAPFILL_METHODS_1D = f"""
SELECT l.source, l.bucket, l.gap,
       l.sum_n_tok AS locf_sum,  l.n_seq AS locf_nseq,
       z.sum_n_tok AS zero_sum,  z.n_seq AS zero_nseq,
       i.sum_n_tok AS lin_sum,
       g.sum_n_tok AS lag2_sum
FROM ({GAPFILL_LOCF_1D}) l
JOIN ({GAPFILL_ZERO_1D}) z ON z.source = l.source AND z.bucket = l.bucket
JOIN ({GAPFILL_LINEAR_1D}) i ON i.source = l.source AND i.bucket = l.bucket
JOIN ({GAPFILL_LAG2_1D}) g ON g.source = l.source AND g.bucket = l.bucket
"""

# Round-5 registry fold (VERDICT r4 #7): the monthly-grain LOCF query rides
# along as a second tag so its registry slot is freed. UNION ALL BY NAME —
# columns absent from a side are NULL on BOTH engines, so the value compare
# is unaffected; each half's SQL is the per-operator mirror verbatim.
GAPFILL_METHODS = f"""
SELECT '1d' AS grain, * FROM ({GAPFILL_METHODS_1D})
UNION ALL BY NAME
SELECT '1mo' AS grain, source, bucket, gap, sum_n_tok AS locf_sum
FROM ({GAPFILL_LOCF_1MO})
"""

FINGERPRINTS_TOKENS = f"""
SELECT a.id, a.fp, b.simhash
FROM ({TOKEN_FINGERPRINT}) a JOIN ({SIMHASH_FP}) b ON b.id = a.id
"""

EMBEDDING_NEARDUP_PAIR = f"""
SELECT 'exact' AS method, * FROM ({EMBEDDING_NEARDUP})
UNION ALL
SELECT 'lsh' AS method, * FROM ({EMBEDDING_NEARDUP_LSH})
"""

ANN_TOPK_BOTH = f"""
SELECT 'brute' AS method, * FROM ({ANN_TOPK})
UNION ALL
SELECT 'lsh' AS method, * FROM ({ANN_TOPK_LSH})
"""


def _ivf_assign(src: str, cen: str, out_cols: str = "id, q") -> str:
    """One unrolled Lloyd ASSIGNMENT step: per row, the argmin-L2 cell
    against the current centroid table (ties → smaller cell index). The
    distance is a pure int64 sum of squares — order-independent, so SUM
    over any evaluation order matches Spark's left-to-right fold exactly
    (similarity.py::_centroid_dist_structs)."""
    return f"""
  SELECT {out_cols}, cell FROM (
    SELECT t.*, s.ci AS cell,
      ROW_NUMBER() OVER (PARTITION BY t.id ORDER BY
        list_sum(list_transform(range(1, len(t.q) + 1),
                 i -> (t.q[i] - s.c[i]) * (t.q[i] - s.c[i]))) ASC,
        s.ci ASC) AS rn
    FROM {src} t CROSS JOIN {cen} s
  ) WHERE rn = 1
"""


def _ivf_update(assigned: str, cen: str) -> str:
    """One unrolled Lloyd UPDATE step: new centroid component =
    sum(x) div count per (cell, dim) — TRUNCATED integer division (DuckDB
    ``//``; Spark mirrors with abs-based truncation), empty cells keep the
    previous centroid (LEFT JOIN + COALESCE)."""
    return f"""
  SELECT s.ci, list(
      COALESCE(CASE WHEN u.s >= 0 THEN u.s // u.cnt
                    ELSE -((-u.s) // u.cnt) END,
               s.c[j.i]) ORDER BY j.i) AS c
  FROM {cen} s
  CROSS JOIN range(1, 65) j(i)
  LEFT JOIN (
    SELECT a.cell, j2.i AS dim, SUM(a.q[j2.i]) AS s, COUNT(*) AS cnt
    FROM {assigned} a, range(1, 65) j2(i)
    GROUP BY a.cell, j2.i
  ) u ON u.cell = s.ci AND u.dim = j.i
  GROUP BY s.ci
"""


# IVF ANN path: the FULL deterministic chain — seed centroids = quantized
# vectors of the 16 smallest ids, exactly 2 Lloyd iterations (assignment =
# exact int64 argmin-L2, update = truncated-div integer mean, empty cells
# keep their centroid), final assignment, nprobe=4 probe cells per query,
# exact integer-cosine rescore, two-phase-equal top-5. Every intermediate is
# integer (the r4 change that made this mirror possible: float centroid
# means would differ in summation order between engines), so both engines
# compute IDENTICAL cells, probes, and candidates; the only floats are the
# final cosines, whose operand order is mirrored exactly.
# Spark: ingestr_spark/operators/similarity.py::ivf_build/ivf_topk.
ANN_TOPK_IVF = f"""WITH {_QEMB},
seed AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) AS INT) - 1 AS ci, q AS c
  FROM q ORDER BY id LIMIT 16
),
a1 AS ({_ivf_assign('q', 'seed')}),
c1 AS ({_ivf_update('a1', 'seed')}),
a2 AS ({_ivf_assign('q', 'c1', 'id, q')}),
c2 AS ({_ivf_update('a2', 'c1')}),
af AS ({_ivf_assign('n', 'c2', 'id, q, nrm')}),
probes AS (
  SELECT id AS query_id, q AS qq, nrm AS qq_nrm, cell FROM (
    SELECT t.id, t.q, t.nrm, s.ci AS cell,
      ROW_NUMBER() OVER (PARTITION BY t.id ORDER BY
        list_sum(list_transform(range(1, len(t.q) + 1),
                 i -> (t.q[i] - s.c[i]) * (t.q[i] - s.c[i]))) ASC,
        s.ci ASC) AS rn
    FROM n t CROSS JOIN c2 s WHERE t.id < 10
  ) WHERE rn <= 4
),
cand AS (
  SELECT DISTINCT pr.query_id, c.id AS vec_id,
    CAST(list_sum(list_transform(range(1, len(c.q) + 1), i -> c.q[i] * pr.qq[i])) AS DOUBLE)
      / sqrt(CAST(c.nrm AS DOUBLE) * CAST(pr.qq_nrm AS DOUBLE)) AS cosine
  FROM af c JOIN probes pr ON c.cell = pr.cell AND c.id <> pr.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""

DOWNSCALE_MONTHLY_DAILY = f"""
SELECT s.sitename, s.date, s.v AS v_step, p.v AS v_poly
FROM ({DOWNSCALE_STEP}) s
JOIN ({DOWNSCALE_POLYNOM}) p ON p.sitename = s.sitename AND p.date = s.date
"""

SMOOTH_METHODS = f"""
SELECT 'cubic' AS series, source, bucket,
       CAST(NULL AS DOUBLE) AS v_lo, CAST(NULL AS DOUBLE) AS v_sp, v_sg
FROM ({SMOOTH_SGOLAY_CUBIC})
UNION ALL
SELECT 'linear' AS series, source, bucket, v_lo, v_sp, v_sg
FROM ({SMOOTH_ALL_LINEAR})
"""

ASOF_NEAREST_DAILY = f"""
SELECT a.doc_id, a.source, a.day_sum AS asof_day_sum,
       b.day_sum AS near_day_sum, b.nearest_dist
FROM ({ASOF_DAILY_STATE}) a
JOIN ({NEAREST_DAILY_STATE}) b ON b.doc_id = a.doc_id
"""

FILTERED_EVENTS_AGG = f"""
SELECT 'busy_semi' AS rule, * FROM ({BUSY_DAYS_SEMIJOIN})
UNION ALL
SELECT 'anti_failed' AS rule, * FROM ({ANTI_JOIN_EVENTS})
"""

DOY_SCALE_FILL = f"""
SELECT 'doy_clim' AS path, * FROM ({DOY_CLIM_FILL_1D})
UNION ALL
SELECT 'scale_dim' AS path, * FROM ({SCALE_FACTOR_DIM})
"""

# per-source wide audit: D1 noleap spine + W5 Dec-30 patch + P4 GPP cleaning
# aggregates + A12 completeness + R4 nest probes + R3 union_with_id pivoted
SOURCE_AUDIT_COMPOSITE = f"""
SELECT n.source, n.n_days,
       p.n_rows AS patch_n_rows, p.max_date AS patch_max_date,
       p.total AS patch_total,
       g.n_nt_null, g.n_dt_null, g.sum_nt, g.sum_dt,
       c.n_a, c.n_b, c.keep,
       t.n_days AS nest_n_days, t.first_bucket, t.last_v,
       u.n_good, u.tot_good, u.n_bad, u.tot_bad
FROM ({NOLEAP_SPINE_DAYS}) n
JOIN ({PATCH_DEC30_TIER}) p ON p.source = n.source
JOIN ({CLEAN_GPP_TOKENS}) g ON g.source = n.source
JOIN ({COMPLETENESS_TOKENS}) c ON c.source = n.source
JOIN ({NEST_TOKENS}) t ON t.source = n.source
JOIN (
  SELECT source,
    CAST(COALESCE(SUM(CASE WHEN part = 'good' THEN n END), 0) AS BIGINT) AS n_good,
    CAST(COALESCE(SUM(CASE WHEN part = 'good' THEN total END), 0) AS BIGINT) AS tot_good,
    CAST(COALESCE(SUM(CASE WHEN part = 'bad' THEN n END), 0) AS BIGINT) AS n_bad,
    CAST(COALESCE(SUM(CASE WHEN part = 'bad' THEN total END), 0) AS BIGINT) AS tot_bad
  FROM ({UNION_WITH_ID}) GROUP BY source
) u ON u.source = n.source
"""


# ---- F4 calc_daily_solar (SPLASH) oracle ------------------------------------
# Mirrors functions/solar.py operand-for-operand. Scalar subexpressions that
# solar.py folds in PYTHON (xlam, the anomaly coefficients, the radiation /
# ppfd prefactors) are computed HERE with the same Python expressions and
# injected as repr() literals — shortest-repr doubles parse back to the
# identical bits in DuckDB. Column-level transcendentals (JVM StrictMath-ish
# vs libm, ~1 ulp apart) are absorbed by round(…, 4-6); ra is reported in
# MJ/m² so 1-ulp jitter sits ~1e-13 below the rounding grid.
import math as _math  # noqa: E402

from ingestr_spark.functions import solar as _sol  # noqa: E402

_S_PIR = _sol.PIR
_S_KE = _sol.ECCEN
_S_XEE = _S_KE ** 2
_S_XEC = _S_KE ** 3
_S_XSE = _math.sqrt(1 - _S_XEE)
_S_KOM = _sol.OMEGA
_S_XLAM = 2.0 * (
    (_S_KE / 2.0 + _S_XEC / 8.0) * (1 + _S_XSE) * _math.sin(_S_KOM * _S_PIR)
    - _S_XEE / 4.0 * (0.5 + _S_XSE) * _math.sin(2 * _S_KOM * _S_PIR)
    + _S_XEC / 8.0 * (1.0 / 3.0 + _S_XSE) * _math.sin(3 * _S_KOM * _S_PIR)
) / _S_PIR
_S_C1 = 2.0 * _S_KE - _S_XEC / 4.0
_S_C2 = 5.0 / 4.0 * _S_XEE
_S_C3 = 13.0 / 12.0 * _S_XEC
_S_RHO_NUM = 1 - _S_KE ** 2
_S_SINKEPS = _math.sin(_sol.OBLIQ * _S_PIR)
_S_RA = (86400.0 / _math.pi) * _sol.KGSC
_S_PPFD = 1e-6 * _sol.KF_FEC * (1 - _sol.KALB_VIS)

SOLAR_FUNCTIONS_TOKENS = f"""WITH {TOKENS_CTE},
b AS (
  SELECT doc_id_str AS doc_id,
    CAST(id % 3000 AS DOUBLE) AS elv,
    (id % 100) / 100.0 AS sf,
    CAST((id % 120) - 60 AS DOUBLE) AS lat,
    CAST(dayofyear(ts) AS DOUBLE) AS doy
  FROM tok
),
s1 AS (
  SELECT *, ({_S_XLAM!r} + ((doy - 80.0) * (360.0 / 365.0))) - {_S_KOM!r} AS anm
  FROM b
),
s2 AS (SELECT *, anm * {_S_PIR!r} AS ranm FROM s1),
s3 AS (
  SELECT *, ((ranm + ({_S_C1!r} * sin(ranm))) + ({_S_C2!r} * sin(2.0 * ranm)))
            + ({_S_C3!r} * sin(3.0 * ranm)) AS ranv
  FROM s2
),
s4 AS (SELECT *, (ranv / {_S_PIR!r}) + {_S_KOM!r} AS tls0 FROM s3),
s5 AS (
  SELECT *, CASE WHEN tls0 < 0 THEN tls0 + 360 WHEN tls0 > 360 THEN tls0 - 360
                 ELSE tls0 END AS lam
  FROM s4
),
s6 AS (
  SELECT *, CASE WHEN lam - {_S_KOM!r} < 0 THEN (lam - {_S_KOM!r}) + 360
                 ELSE lam - {_S_KOM!r} END AS nu
  FROM s5
),
s7 AS (
  SELECT *, {_S_RHO_NUM!r} / (1 + ({_S_KE!r} * cos(nu * {_S_PIR!r}))) AS rho,
            asin(sin(lam * {_S_PIR!r}) * {_S_SINKEPS!r}) / {_S_PIR!r} AS delta
  FROM s6
),
s8 AS (
  SELECT *, pow(1 / rho, 2) AS dr,
            sin(delta * {_S_PIR!r}) * sin(lat * {_S_PIR!r}) AS ru,
            cos(delta * {_S_PIR!r}) * cos(lat * {_S_PIR!r}) AS rv
  FROM s7
),
s9 AS (
  SELECT *, CASE WHEN ru / rv >= 1.0 THEN 180.0
                 WHEN ru / rv <= -1.0 THEN 0.0
                 ELSE acos(-(ru / rv)) / {_S_PIR!r} END AS hs
  FROM s8
),
s10 AS (
  SELECT *, ({_S_RA!r} * dr) * (((ru * {_S_PIR!r}) * hs)
                                + (rv * sin(hs * {_S_PIR!r}))) AS ra,
            (0.25 + (0.5 * sf)) * (1 + (2.67e-05 * elv)) AS tau
  FROM s9
)
SELECT doc_id,
  round(dr, 6) AS dr,
  round(delta, 4) AS delta_deg,
  round(hs, 4) AS hs_deg,
  round(ra / 1000000.0, 4) AS ra_mj_m2,
  tau,
  round(({_S_PPFD!r} * tau) * ra, 4) AS ppfd
FROM s10
"""

# F1/F2/F3/F5 + F4 + J5/A10 in one doc_id-keyed join
SCALAR_FUNCTIONS_TOKENS = f"""
SELECT m.doc_id, m.patm, m.vp, m.vpd, m.tgrowth,
       s.dr, s.delta_deg, s.hs_deg, s.ra_mj_m2, s.tau, s.ppfd,
       x.v AS v_scaled
FROM ({MET_FUNCTIONS_TOKENS}) m
JOIN ({SOLAR_FUNCTIONS_TOKENS}) s ON s.doc_id = m.doc_id
JOIN ({MEAN_SCALING_TOKENS}) x ON x.doc_id = m.doc_id
"""


# ---- REAL WAV/PCM16 decode oracle --------------------------------------------
# The Spark side writes genuine RIFF/WAVE payloads (multimodal.synth_wav_media)
# and parses them back with the real byte-level decoder
# (multimodal.decode_wav via extract_wav_stats). The oracle recomputes the
# statistics from the generative sample formula — so the writer, the
# container round-trip, and the parser are all hash-checked. All outputs are
# integers (duration in exact integer microseconds): no float crosses engines.
MULTIMODAL_REAL_WAV = """
WITH m AS (
  SELECT CAST(r.range AS BIGINT) AS rid,
         CAST(800 + (r.range % 5) * 160 AS BIGINT) AS n
  FROM range(500) r
),
x AS (SELECT rid, n, unnest(range(n)) AS i FROM m),
v AS (
  SELECT rid, n, ((rid * 7919 + i * 104729) % 65536) - 32768 AS amp
  FROM x
)
SELECT printf('m-%09d', rid) AS media_id,
  16000 AS sample_rate,
  1 AS n_channels,
  16 AS bits,
  CAST(n AS INT) AS n_samples,
  CAST(n * 1000000 // 16000 AS BIGINT) AS duration_us,
  CAST(SUM(amp) AS BIGINT) AS amp_sum,
  CAST(SUM(amp * amp) AS BIGINT) AS amp_sumsq,
  CAST(MIN(amp) AS INT) AS amp_min,
  CAST(MAX(amp) AS INT) AS amp_max,
  TRUE AS decode_ok
FROM v GROUP BY rid, n
"""


# ---- REAL PPM (P6) image decode oracle ----------------------------------------
# Spark writes genuine binary PPM payloads (multimodal.synth_ppm_media) and
# parses them back with the real Netpbm parser (multimodal.decode_ppm via
# extract_image_stats); the oracle recomputes the exact per-channel integer
# statistics from the generative pixel formula
# (r*31 + pixel_index*7 + channel*11) % 256. All-integer outputs.
MULTIMODAL_REAL_PPM = """
WITH m AS (
  SELECT CAST(r.range AS BIGINT) AS rid,
         CAST(8 + (r.range % 4) * 4 AS BIGINT) AS w,
         CAST(6 + (r.range % 3) * 4 AS BIGINT) AS h
  FROM range(500) r
),
x AS (SELECT rid, w, h, unnest(range(w * h * 3)) AS i FROM m),
v AS (
  SELECT rid, w, h, CAST(i % 3 AS INT) AS c,
         (rid * 31 + (i // 3) * 7 + (i % 3) * 11) % 256 AS px
  FROM x
)
SELECT printf('m-%09d', rid) AS media_id,
  CAST(w AS INT) AS width,
  CAST(h AS INT) AS height,
  CAST(w * h AS INT) AS n_px,
  CAST(SUM(CASE WHEN c = 0 THEN px END) AS BIGINT) AS r_sum,
  CAST(SUM(CASE WHEN c = 1 THEN px END) AS BIGINT) AS g_sum,
  CAST(SUM(CASE WHEN c = 2 THEN px END) AS BIGINT) AS b_sum,
  CAST(MIN(px) AS INT) AS px_min,
  CAST(MAX(px) AS INT) AS px_max,
  TRUE AS decode_ok
FROM v GROUP BY rid, w, h

UNION ALL

-- PNG half of the mixed-format image query (r4): the Spark side decodes a
-- REAL zlib-DEFLATE PNG (all five filter types across rows); the oracle
-- recomputes the same integer stats from the generative pixel formula
-- (multimodal.synth_png_media)
SELECT printf('p-%09d', rid) AS media_id,
  CAST(w AS INT) AS width,
  CAST(h AS INT) AS height,
  CAST(w * h AS INT) AS n_px,
  CAST(SUM(CASE WHEN c = 0 THEN px END) AS BIGINT) AS r_sum,
  CAST(SUM(CASE WHEN c = 1 THEN px END) AS BIGINT) AS g_sum,
  CAST(SUM(CASE WHEN c = 2 THEN px END) AS BIGINT) AS b_sum,
  CAST(MIN(px) AS INT) AS px_min,
  CAST(MAX(px) AS INT) AS px_max,
  TRUE AS decode_ok
FROM (
  SELECT rid, w, h, CAST(i % 3 AS INT) AS c,
         (rid * 37 + (i // 3) * 13 + (i % 3) * 5) % 256 AS px
  FROM (
    SELECT rid, w, h, unnest(range(w * h * 3)) AS i FROM (
      SELECT CAST(r.range AS BIGINT) AS rid,
             CAST(5 + (r.range % 5) * 3 AS BIGINT) AS w,
             CAST(4 + (r.range % 4) * 3 AS BIGINT) AS h
      FROM range(300) r
    )
  )
) GROUP BY rid, w, h
"""

# Round-5 registry fold (VERDICT r4 #7): one multimodal slot instead of two.
# UNION ALL BY NAME gives NULLs for the columns the other modality lacks on
# BOTH engines; each half is the per-modality mirror verbatim.
MULTIMODAL_REAL = f"""
SELECT 'wav' AS kind, * FROM ({MULTIMODAL_REAL_WAV})
UNION ALL BY NAME
SELECT 'img' AS kind, * FROM ({MULTIMODAL_REAL_PPM})
"""


# S3 raster bilinear point extraction (r4): cell values are pure integer
# formula; fx/fy and the 4-term weighted sum use IDENTICAL IEEE operand
# order on both engines (floor/div/sub/mul/add only — exact mirror class).
# Any corner outside the 100x80 grid -> NULL, like terra's NA.
# Spark: ingestr_spark/operators/raster.py::extract_points_bilinear.
def _raster_bilinear_sql(nbands: int) -> str:
    """Bilinear-extraction mirror parameterized by band count (r5: the
    time-axis path extracts over a 12-band grid whose band index maps to a
    monthly date, like the reference's get_time=TRUE band-name unpivot,
    R/ingest_globalfields.R:1226-1280)."""
    return f"""
WITH pts AS (
  SELECT printf('pt-%04d', i) AS sitename,
         CAST(i * 731 % 5210 AS DOUBLE) / 100.0 AS lon,
         CAST(i * 389 % 4120 AS DOUBLE) / 100.0 AS lat
  FROM (SELECT unnest(range(200)) AS i)
),
p2 AS (
  SELECT sitename, lon, lat,
    CAST(floor((lon - 0.25) / 0.5) AS INT) AS ix0,
    CAST(floor((lat - 0.25) / 0.5) AS INT) AS iy0,
    (lon - 0.25) / 0.5 - CAST(floor((lon - 0.25) / 0.5) AS INT) AS fx,
    (lat - 0.25) / 0.5 - CAST(floor((lat - 0.25) / 0.5) AS INT) AS fy
  FROM pts
),
c AS (
  SELECT p2.*, CAST(b.range AS INT) AS band,
    (ix0     BETWEEN 0 AND 99) AND (iy0     BETWEEN 0 AND 79) AS in0,
    (ix0 + 1 BETWEEN 0 AND 99) AND (iy0     BETWEEN 0 AND 79) AS in1,
    (ix0     BETWEEN 0 AND 99) AND (iy0 + 1 BETWEEN 0 AND 79) AS in2,
    (ix0 + 1 BETWEEN 0 AND 99) AND (iy0 + 1 BETWEEN 0 AND 79) AS in3
  FROM p2 CROSS JOIN range({nbands}) b
)
SELECT sitename, lon, lat, band,
  -- a missing corner only invalidates the point when its weight is
  -- NONZERO (edge half-cell semantics, matching the Spark operator):
  -- off-grid corners fold in as 0
  CASE WHEN (in0 OR (1 - fx) * (1 - fy) = 0)
        AND (in1 OR fx * (1 - fy) = 0)
        AND (in2 OR (1 - fx) * fy = 0)
        AND (in3 OR fx * fy = 0) THEN
      (CASE WHEN in0 THEN (band * 7 + ix0 * 13 + iy0 * 17) % 1000 ELSE 0 END) * (1 - fx) * (1 - fy)
    + (CASE WHEN in1 THEN (band * 7 + (ix0 + 1) * 13 + iy0 * 17) % 1000 ELSE 0 END) * fx * (1 - fy)
    + (CASE WHEN in2 THEN (band * 7 + ix0 * 13 + (iy0 + 1) * 17) % 1000 ELSE 0 END) * (1 - fx) * fy
    + (CASE WHEN in3 THEN (band * 7 + (ix0 + 1) * 13 + (iy0 + 1) * 17) % 1000 ELSE 0 END) * fx * fy
  END AS value
FROM c
"""


RASTER_BILINEAR = _raster_bilinear_sql(2)

# r5 (VERDICT r4 #6): the reference's get_time=TRUE path — band index
# carries a date axis (band b of the 12-band grid ↔ the 15th of month
# b+1), unpivoted into a per-(point, date) extraction. Same bilinear
# mirror, plus the band→date dimension join both engines express as
# make_date.
RASTER_BILINEAR_TIME = f"""
SELECT sitename, lon, lat, band,
       CAST(make_date(2022, band + 1, 15) AS VARCHAR) AS date, value
FROM ({_raster_bilinear_sql(12)})
"""

RASTER_BILINEAR_COMPOSITE = f"""
SELECT 'plain' AS mode, * FROM ({RASTER_BILINEAR})
UNION ALL BY NAME
SELECT 'time' AS mode, * FROM ({RASTER_BILINEAR_TIME})
"""


# exact type-1 quantiles of n_tok per source (r4): the counting method
# mirrored operator-for-operator — per-(source, value) counts, cumulative
# window ordered by value, threshold ceil(q*n) with IDENTICAL operand order
# (double multiply, ceil to integer, integer compare on both engines).
# Spark: ingestr_spark/operators/quantiles.py::exact_quantiles.
QUANTILES_NTOK = f"""WITH {TOKENS_CTE},
c AS (SELECT source, n_tok AS v, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
w AS (
  SELECT source, v,
         CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM c
),
e AS (
  SELECT w.*, q FROM w
  CROSS JOIN (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q)
)
SELECT source, q, CAST(MIN(v) AS INT) AS quantile, CAST(MAX(n) AS BIGINT) AS n
FROM e
WHERE cum >= CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT)
GROUP BY source, q
"""

# r5 (VERDICT r4 #3): the weight_col variant over a value-histogram tier
# (per-(source, n_tok) row counts = the rolled-up form a retention store
# keeps), mirrored step-for-step: cnt = SUM(weight) instead of COUNT(*);
# everything downstream is the same counting SQL. Must equal the raw path.
QUANTILES_NTOK_WEIGHTED = f"""WITH {TOKENS_CTE},
tier AS (SELECT source, n_tok, CAST(COUNT(*) AS BIGINT) AS n_seq
         FROM tok GROUP BY 1, 2),
c AS (SELECT source, n_tok AS v, CAST(SUM(n_seq) AS BIGINT) AS cnt
      FROM tier GROUP BY 1, 2),
w AS (
  SELECT source, v,
         CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM c
),
e AS (
  SELECT w.*, q FROM w
  CROSS JOIN (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q)
)
SELECT source, q, CAST(MIN(v) AS INT) AS quantile, CAST(MAX(n) AS BIGINT) AS n
FROM e
WHERE cum >= CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT)
GROUP BY source, q
"""

QUANTILES_NTOK_COMPOSITE = f"""
SELECT 'raw' AS path, * FROM ({QUANTILES_NTOK})
UNION ALL
SELECT 'weighted' AS path, * FROM ({QUANTILES_NTOK_WEIGHTED})
"""

# ---- snapshot time travel + incremental scan (r5) ---------------------------
# Mirrors __spark_entry__.q_store_incremental_scan's deterministic split:
# mid = the middle month (0-based index len//2 of the sorted distinct
# months); batch 1 = months before mid plus EVEN ids inside it. Probe 'v1'
# = the 1d tier over batch 1 alone (what a reader pinned to snapshot v1
# must see); probe 'changes' = the FULL 1d tier restricted to the months
# the incremental merge re-pointed (all later months, plus mid iff it has
# odd-id rows) — the merge algebra guarantees re-pointed months equal the
# full recompute, so the oracle never needs the store. Probe 'compacted'
# (r5) = the full 1d tier over ALL months — the Spark side reads it through
# the post-rewrite_data_files snapshot (every month re-pointed at a single
# coalesced file), so a compaction that dropped/duplicated/reordered any
# row hash-mismatches here. DATE month keys, integer accumulator sums
# (repo exactness rules).
STORE_INCREMENTAL_SCAN = f"""WITH {TOKENS_CTE},
tm AS (SELECT *, CAST(date_trunc('month', ts) AS DATE) AS m FROM tok),
months AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn, COUNT(*) OVER () AS c
  FROM (SELECT DISTINCT m FROM tm)
),
mid AS (SELECT m FROM months WHERE rn = c // 2 + 1),
b1 AS (
  SELECT * FROM tm
  WHERE m < (SELECT m FROM mid)
     OR (m = (SELECT m FROM mid) AND id % 2 = 0)
),
t1 AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         COUNT(*) AS n_seq, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM b1 GROUP BY 1, 2
),
tfull AS (
  SELECT source, CAST(date_trunc('day', ts) AS DATE) AS bucket,
         COUNT(*) AS n_seq, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok
  FROM tm GROUP BY 1, 2
),
chm AS (
  SELECT m FROM months WHERE m > (SELECT m FROM mid)
  UNION ALL
  SELECT m FROM mid
  WHERE EXISTS (SELECT 1 FROM tm
                WHERE tm.m = (SELECT m FROM mid) AND tm.id % 2 = 1)
)
SELECT 'v1' AS probe,
       CAST(date_trunc('month', bucket) AS DATE) AS p_month,
       COUNT(*) AS n_rows,
       CAST(SUM(n_seq) AS BIGINT) AS sum_n_seq,
       CAST(SUM(sum_n_tok) AS BIGINT) AS sum_n_tok
FROM t1 GROUP BY 2
UNION ALL
SELECT 'changes' AS probe,
       CAST(date_trunc('month', bucket) AS DATE) AS p_month,
       COUNT(*) AS n_rows,
       CAST(SUM(n_seq) AS BIGINT) AS sum_n_seq,
       CAST(SUM(sum_n_tok) AS BIGINT) AS sum_n_tok
FROM tfull
WHERE CAST(date_trunc('month', bucket) AS DATE) IN (SELECT m FROM chm)
GROUP BY 2
UNION ALL
SELECT 'compacted' AS probe,
       CAST(date_trunc('month', bucket) AS DATE) AS p_month,
       COUNT(*) AS n_rows,
       CAST(SUM(n_seq) AS BIGINT) AS sum_n_seq,
       CAST(SUM(sum_n_tok) AS BIGINT) AS sum_n_tok
FROM tfull GROUP BY 2
UNION ALL
SELECT 'manifest' AS probe, p_month,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(sum_n_seq) AS BIGINT) AS sum_n_seq,
       CAST(NULL AS BIGINT) AS sum_n_tok
FROM (
  SELECT CAST(date_trunc('month', bucket) AS DATE) AS p_month,
         COUNT(*) AS n_rows, CAST(SUM(n_seq) AS BIGINT) AS sum_n_seq
  FROM t1 GROUP BY 1
  UNION ALL
  SELECT CAST(date_trunc('month', bucket) AS DATE) AS p_month,
         COUNT(*) AS n_rows, CAST(SUM(n_seq) AS BIGINT) AS sum_n_seq
  FROM tfull
  WHERE CAST(date_trunc('month', bucket) AS DATE) IN (SELECT m FROM chm)
  GROUP BY 1
) GROUP BY 2
"""

# ---- Structured Streaming parity (r5; session leg r6) -----------------------
# Batch mirror of __spark_entry__.q_streaming_windows: the streaming
# tumbling/sliding event-time window aggregates over `events`, recomputed
# declaratively. Sliding semantics: an event at t belongs to every window
# start s with s <= t < s + 1h and s on a 30-min boundary — i.e. floor30(t)
# and floor30(t) - 30min. Session semantics (F.session_window, gap 30min):
# a new session starts when the gap to the previous event is >= the gap
# (Spark merges iff next_start < prev_end = prev_ts + gap), compared in
# EXACT integer MICROSECONDS (epoch_us — a double epoch() could flip a
# borderline gap by one ulp); session end = last event + gap; epoch-second
# keys via floor division, matching Spark's timestamp->long floorDiv.
# Integer accumulators; columns absent from a probe are NULL on both
# engines. Probe column sets: tumbling/sliding carry event_type +
# sum_user_id; session carries user_id + session_end_epoch.
STREAMING_WINDOWS = """WITH f30 AS (
  SELECT *,
         date_trunc('hour', ts)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                  ELSE INTERVAL 0 MINUTE END AS w0
  FROM events
),
sess_flag AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess_grp AS (
  SELECT user_id, ts, event_id,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sid
  FROM sess_flag
),
locf_src AS (
  -- locf_state mirror (r6): same deterministic null derivation as the
  -- stream side (event_id % 7); ordering ties broken by (exact event
  -- time, event_id), exactly the applyInPandasWithState sort; timestamps
  -- floored to whole epoch seconds BEFORE differencing on both engines
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
    CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS DOUBLE) ELSE value END AS v
  FROM events
),
locf AS (
  SELECT event_type, event_id,
    CAST(ts_us // 1000000 AS BIGINT) AS ts_epoch,
    last_value(v IGNORE NULLS) OVER w AS val_locf,
    CAST(v IS NULL AS BIGINT) AS filled_int,
    CAST(ts_us // 1000000 - (lag(ts_us) OVER w) // 1000000 AS BIGINT)
      AS gap_seconds
  FROM locf_src
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT 'tumbling' AS probe,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id,
       CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS BIGINT) AS session_end_epoch,
       CAST(NULL AS BIGINT) AS event_id,
       CAST(NULL AS BIGINT) AS ts_epoch,
       CAST(NULL AS DOUBLE) AS val_locf,
       CAST(NULL AS BIGINT) AS filled_int,
       CAST(NULL AS BIGINT) AS gap_seconds
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS probe,
       CAST(epoch(win_start) AS BIGINT) AS win_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id,
       CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS BIGINT) AS session_end_epoch,
       CAST(NULL AS BIGINT) AS event_id,
       CAST(NULL AS BIGINT) AS ts_epoch,
       CAST(NULL AS DOUBLE) AS val_locf,
       CAST(NULL AS BIGINT) AS filled_int,
       CAST(NULL AS BIGINT) AS gap_seconds
FROM (
  SELECT w0 AS win_start, * FROM f30
  UNION ALL
  SELECT w0 - INTERVAL 30 MINUTE AS win_start, * FROM f30
) GROUP BY 2, 3
UNION ALL
SELECT 'session' AS probe,
       CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS win_epoch,
       CAST(NULL AS VARCHAR) AS event_type,
       COUNT(*) AS n_events,
       CAST(NULL AS BIGINT) AS sum_user_id,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id,
       user_id,
       CAST((epoch_us(MAX(ts)) + 1800000000) // 1000000 AS BIGINT)
         AS session_end_epoch,
       CAST(NULL AS BIGINT) AS event_id,
       CAST(NULL AS BIGINT) AS ts_epoch,
       CAST(NULL AS DOUBLE) AS val_locf,
       CAST(NULL AS BIGINT) AS filled_int,
       CAST(NULL AS BIGINT) AS gap_seconds
FROM sess_grp GROUP BY user_id, sid
UNION ALL
SELECT 'locf_state' AS probe,
       CAST(NULL AS BIGINT) AS win_epoch,
       event_type,
       CAST(NULL AS BIGINT) AS n_events,
       CAST(NULL AS BIGINT) AS sum_user_id,
       CAST(NULL AS BIGINT) AS min_event_id,
       CAST(NULL AS BIGINT) AS max_event_id,
       CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS BIGINT) AS session_end_epoch,
       event_id, ts_epoch, val_locf, filled_int, gap_seconds
FROM locf
"""
