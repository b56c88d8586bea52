"""DuckDB oracle SQL twins for every oracle-checkable query in
``__spark_entry__.queries()``.

Each string is the ANSI-SQL equivalent of the corresponding Spark
DataFrame program, runnable by DuckDB over the pre-registered testdata
views. Cross-engine determinism rules (pinned by tools/check_oracle.py):

- Money/value aggregates: DECIMAL casts before summing (exact +
  associative — double sums differ in last ulps between engines).
- Chained decimal multiplies re-cast intermediates (Spark silently
  rescales past precision 38; DuckDB errors).
- Java-style rounding is ``floor(x + 0.5)``; double→bigint casts are
  never raw (Spark truncates, DuckDB rounds).
- Epoch-nanos arithmetic uses integer division (`div` / `//`), since
  nanos exceed double's 53-bit mantissa.
- Cosine similarities: both engines compute sequential double dot
  products that differ by ≤1 ulp → outputs rounded to 6 decimals.
- DuckDB BIGINT aggregates (SUM, len, row_number) are cast to match
  Spark's output types.
- KNOWN CROSS-ENGINE BOUNDARY — unicode case mapping: Spark lowercases
  with Java's full (language-aware) mapping, DuckDB with utf8proc's
  simple fold. They agree on ASCII and accented Latin (café, naïve) but
  DIVERGE on e.g. dotted capital İ (Java: i + combining dot; DuckDB: i)
  and Greek final sigma (Java: context-aware ς; DuckDB: σ). No oracle
  rewrite can reconcile this without changing operator semantics;
  testdata and the fuzz corpora stay inside the agreeing subset, and
  tests/test_differential_fuzz.py::test_unicode_case_boundary pins the
  divergence so a change in either engine is noticed.
"""

from __future__ import annotations

from kafka_streams_spark.operators.text import BPE_ISH_REGEX, STOPWORDS
from kafka_streams_spark.sources.testdata import PAYMENTS_FROM_EVENTS_SQL

# --------------------------------------------------------------------------
# payments (reference-parity pipeline)
# --------------------------------------------------------------------------

_P = f"WITH payments AS ({PAYMENTS_FROM_EVENTS_SQL})"
_FILTERED = "SELECT * FROM payments WHERE rails IN ('BANK_RAILS_FOO', 'BANK_RAILS_BAR')"
_FX = """
SELECT key, paymentId,
       CAST(FLOOR(amount * 0.8 + 0.5) AS BIGINT) AS amount,
       'GBP' AS currency, toAccount, fromAccount, rails
FROM usd
"""
_MERGED_CTES = f"""
filtered AS ({_FILTERED}),
gbp AS (SELECT * FROM filtered WHERE currency = 'GBP'),
usd AS (SELECT * FROM filtered WHERE currency = 'USD'),
fx AS ({_FX}),
merged AS (SELECT * FROM gbp UNION ALL SELECT * FROM fx)
"""

PAYMENT_ORACLES = {
    "payments_source": f"{_P} SELECT * FROM payments",
    "payments_filter_rails": f"{_P}, filtered AS ({_FILTERED}) SELECT * FROM filtered",
    "payments_branch_gbp": (
        f"{_P}, filtered AS ({_FILTERED}) SELECT * FROM filtered WHERE currency = 'GBP'"
    ),
    "payments_branch_usd": (
        f"{_P}, filtered AS ({_FILTERED}) SELECT * FROM filtered WHERE currency = 'USD'"
    ),
    "payments_fx_convert": (
        f"{_P}, filtered AS ({_FILTERED}), "
        f"usd AS (SELECT * FROM filtered WHERE currency = 'USD') {_FX}"
    ),
    "payments_merged": f"{_P}, {_MERGED_CTES} SELECT * FROM merged",
    "payments_rails_foo": (
        f"{_P}, {_MERGED_CTES} SELECT * FROM merged WHERE rails = 'BANK_RAILS_FOO'"
    ),
    "payments_rails_bar": (
        f"{_P}, {_MERGED_CTES} SELECT * FROM merged WHERE rails = 'BANK_RAILS_BAR'"
    ),
    "payments_balances": (
        f"{_P}, {_MERGED_CTES} "
        "SELECT fromAccount, CAST(SUM(amount) AS BIGINT) AS balance "
        "FROM merged GROUP BY fromAccount"
    ),
}

# The DSL facade and the SQL surface build the same topology; the same
# oracle proves all three author-forms agree.
PAYMENT_ORACLES["dsl_balances"] = PAYMENT_ORACLES["payments_balances"]
PAYMENT_ORACLES["sql_balances"] = PAYMENT_ORACLES["payments_balances"]

# §2.4 facade names count/reduce over the same merged stream (r10):
# count per account, and reduce = value-typed fold (sum) keeping the
# value column's own name per Kafka Streams reduce semantics.
PAYMENT_ORACLES["dsl_count"] = (
    f"{_P}, {_MERGED_CTES} "
    "SELECT fromAccount, count(*) AS n_payments FROM merged GROUP BY fromAccount"
)
PAYMENT_ORACLES["dsl_reduce"] = (
    f"{_P}, {_MERGED_CTES} "
    "SELECT fromAccount, CAST(SUM(amount) AS BIGINT) AS amount "
    "FROM merged GROUP BY fromAccount"
)

# --------------------------------------------------------------------------
# relational analytics
# --------------------------------------------------------------------------

_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)

# Final money/measure outputs are scaled BIGINT, never DECIMAL — see
# operators/analytics.py module docstring (DECIMAL round-trips as
# decimal.Decimal on the Spark side but float64 from DuckDB's fetchdf,
# and trailing-zero values then canonicalize differently). Scaling is
# applied per row, before the SUM, mirroring the Spark plans.
_DISC_X10K = f"CAST({_DISC_PRICE} * 10000 AS BIGINT)"


def _cents_sql(col: str) -> str:
    return f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"

ANALYTICS_ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q10_returned_revenue": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS revenue_x10k
        FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue_x10k DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": f"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_X10K}
                             ELSE 0 END) AS BIGINT) AS promo_revenue_x10k,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS total_revenue_x10k
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    "q18_large_orders": f"""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               {_cents_sql('o_totalprice')} AS o_totalprice_cents,
               total_qty_x100
        FROM (SELECT l_orderkey,
                     CAST(SUM({_cents_sql('l_quantity')}) AS BIGINT) AS total_qty_x100
              FROM lineitem GROUP BY l_orderkey HAVING total_qty_x100 > 30000) big
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice_cents DESC, o_orderkey
        LIMIT 100
    """,
    "daily_revenue_window": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS o_date,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents,
                   datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_nr
            FROM orders GROUP BY 1, 3
        )
        SELECT strftime(o_date, '%Y-%m-%d') AS o_date, revenue_cents,
               CAST(SUM(revenue_cents) OVER (ORDER BY day_nr
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_cents,
               CAST(SUM(revenue_cents) OVER (ORDER BY day_nr
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7_cents
        FROM daily
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM({_cents_sql('l_quantity')}) AS BIGINT) AS sum_qty_x100,
               CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS sum_base_price_cents,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS sum_disc_price_x10k,
               CAST(SUM(CAST(CAST({_DISC_PRICE} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS sum_charge_x1m,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS revenue_x10k,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_x10k DESC, l_orderkey
        LIMIT 10
    """,
    "q5_regional_revenue": f"""
        SELECT n_name,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS revenue_x10k
        FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "top_orders_per_customer": f"""
        SELECT o_custkey, o_orderkey,
               {_cents_sql('o_totalprice')} AS o_totalprice_cents,
               CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    "order_count_by_status": """
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        FROM orders GROUP BY o_orderstatus
    """,
    "events_hourly": f"""
        SELECT epoch_ns(ts) // 3600000000000 AS epoch_hour, event_type,
               count(*) AS n_events,
               CAST(SUM({_cents_sql('value')}) AS BIGINT) AS total_value_cents
        FROM events GROUP BY 1, 2
    """,
    # r10: the DSL facade's windowed_by(...).count() at the same grain —
    # the windowed-aggregation §2.4 name, driver-checked like
    # dsl_balances checks aggregate(). NULL-timestamp rows are DROPPED:
    # Spark's window() plans an isnotnull(ts) filter (no window exists
    # for a null event time), matching Kafka Streams' drop of records
    # with invalid timestamps in windowed processing — unlike the raw
    # integer-grain events_hourly above, which keeps the NULL group.
    "dsl_windowed_count": """
        SELECT epoch_ns(ts) // 3600000000000 AS epoch_hour, event_type,
               count(*) AS n_events
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    "sessionize_events": """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tsn
                   FROM events WHERE ts IS NOT NULL),
        lagd AS (
            SELECT event_id, user_id, tsn,
                   CASE WHEN tsn - lag(tsn) OVER w > 1800000000000
                        THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
        ),
        sess AS (
            SELECT *, CAST(SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY tsn, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM lagd
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(event_id) AS first_event, max(event_id) AS last_event,
               (max(tsn) - min(tsn)) // 1000000 AS duration_ms
        FROM sess GROUP BY user_id, session_seq
    """,
    "distinct_users_by_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS revenue_x10k
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "rollup_orders": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "cube_events": """
        SELECT event_type, user_bucket, count(*) AS n_events
        FROM (SELECT event_type, user_id % 10 AS user_bucket FROM events)
        GROUP BY CUBE(event_type, user_bucket)
    """,
    "customers_with_orders": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "price_quantiles": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.5)  AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75,
               quantile_cont(l_extendedprice, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag
    """,
    "orders_enriched": f"""
        SELECT o_orderkey, o_custkey,
               {_cents_sql('o_totalprice')} AS o_totalprice_cents,
               c_name, n_name
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
    """,
    # DuckDB's native ASOF JOIN is the oracle for our union-sort-carry
    # formulation (operators/asof.py). ts compared as epoch nanos (exact
    # integers) on both sides.
    "asof_purchase_click": """
        WITH p AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        c0 AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id AS click_id, value
            FROM events WHERE event_type = 'click'
        ),
        -- tie rule: duplicate (user, ts) right rows resolve to the
        -- LARGEST payload struct (click_id, value) — mirroring the
        -- engine's deterministic struct-max orderBy; DuckDB's native
        -- ASOF picks an arbitrary row on ties, so dedupe first
        c AS (
            SELECT user_id, ts_us, click_id, value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, ts_us
                    ORDER BY click_id DESC, value DESC) AS rn
                FROM c0
            ) WHERE rn = 1
        )
        SELECT p.event_id, p.user_id, p.ts_us,
               c.click_id AS click_id_asof, c.value AS value_asof
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
    "pivot_events": """
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'view')     AS view,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'error')    AS error
        FROM events GROUP BY user_id
    """,
}

# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

# The oracle tokenizer splits on the EXPLICIT ASCII class — RE2's \s
# is [ \t\n\f\r] WITHOUT \x0b (vertical tab), while Java's \s (the
# engine's `tokens` expression) and Python's closures include it; a
# bare '\s+' here silently tokenized "a\x0bb" as one word (r8
# divergence find, pinned by the fuzz corpus's \x0b documents).
_WS_RE2 = r"[ \t\n\x0B\x0C\r]+"
_TOKS = rf"list_filter(string_split_regex(lower(text), '{_WS_RE2}'), x -> x != '')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_STOP_EN = _sql_list(STOPWORDS["en"])

TEXT_ORACLES = {
    # corpus_drift between the md5-bucket halves (< '80' vs >= '80'):
    # exact integer-arithmetic TVD — per-token |cnt_a*T_b - cnt_b*T_a|
    # summed as BIGINT, one scalar division at the end. ln/pow-free, so
    # no rounding pin is needed anywhere except the final 9-dp display.
    "corpus_drift": f"""
        WITH da AS (SELECT text FROM documents
                    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'),
        db AS (SELECT text FROM documents
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '80'),
        ca AS (SELECT tok, count(*) AS cnt_a
               FROM (SELECT unnest({_TOKS}) AS tok FROM da) GROUP BY tok),
        cb AS (SELECT tok, count(*) AS cnt_b
               FROM (SELECT unnest({_TOKS}) AS tok FROM db) GROUP BY tok),
        j AS (
            SELECT coalesce(ca.tok, cb.tok) AS tok,
                   coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
            FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
        ),
        t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS ta,
                     CAST(SUM(cnt_b) AS BIGINT) AS tb FROM j),
        -- coalesce(…, 0) mirrors the Spark side's empty-corpus edge: a
        -- token-less side leaves j with zero rows, where a bare global
        -- aggregate is NULL — the contract is counts 0, tvd NULL.
        agg AS (
            SELECT CAST(coalesce(max(ta), 0) AS BIGINT) AS n_tokens_a,
                   CAST(coalesce(max(tb), 0) AS BIGINT) AS n_tokens_b,
                   CAST(coalesce(SUM(CASE WHEN cnt_a > 0 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS vocab_a,
                   CAST(coalesce(SUM(CASE WHEN cnt_b > 0 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS vocab_b,
                   CAST(coalesce(SUM(CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS shared_vocab,
                   CAST(coalesce(SUM(ABS(cnt_a * tb - cnt_b * ta)), 0) AS BIGINT) AS numer
            FROM j CROSS JOIN t
        )
        SELECT n_tokens_a, n_tokens_b, vocab_a, vocab_b, shared_vocab,
               ROUND(CAST(numer AS DOUBLE)
                     / (2.0 * NULLIF(n_tokens_a, 0) * NULLIF(n_tokens_b, 0)),
                     9) AS tvd
        FROM agg
    """,
    # explicit whitespace class (Java \s includes \x0B, RE2 does not)
    "normalize_text": r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')
                   AS norm_text
        FROM documents
    """,
    # decontaminate_exact: the benchmark set is 60-char substrings of
    # the md5-bucket < '08' docs (guaranteed-contained probes), checked
    # against the WHOLE corpus — flags docs containing any benchmark
    # text verbatim.
    "decontaminate_exact": """
        WITH bench AS (
            SELECT DISTINCT substring(text, 10, 60) AS b FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '08'
              AND length(substring(text, 10, 60)) >= 30
        ),
        hits AS (
            SELECT d.doc_id, count(*) AS n_bench_hits
            FROM documents d CROSS JOIN bench
            WHERE contains(d.text, bench.b)
            GROUP BY d.doc_id
        )
        SELECT d.doc_id,
               coalesce(h.n_bench_hits, 0) AS n_bench_hits,
               coalesce(h.n_bench_hits, 0) >= 1 AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    # quality_calibrated: percent_rank of the quality score within each
    # source, unique (quality, doc_id) ordering → exact (rank-1)/(n-1)
    # rational arithmetic; 9-dp rounding is display-only.
    "quality_calibrated": f"""
        WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
        s AS (
            SELECT doc_id, source,
                   len(toks) AS n_words,
                   CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
                   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                       / greatest(len(list_distinct(toks)), 1) AS stopword_ratio
            FROM t
        ),
        q AS (
            SELECT doc_id, source,
                   ((CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN chars_per_word >= 3 AND chars_per_word <= 12 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
            FROM s
        )
        SELECT doc_id, source, quality,
               ROUND(percent_rank() OVER (PARTITION BY source
                                          ORDER BY quality, doc_id), 9) AS pct_rank
        FROM q
    """,
    # length_outliers(k=3, stratum=source): |n_chars - median| > 3*MAD.
    # Integer inputs put the exact median/MAD on a .0/.5 grid, so every
    # comparison operand is an exact double — bit-deterministic without
    # any rounding pin.
    "length_outliers": """
        WITH med AS (
            SELECT source, median(n_chars) AS med FROM documents GROUP BY source
        ),
        mad AS (
            SELECT d.source, median(abs(d.n_chars - med.med)) AS mad
            FROM documents d JOIN med ON d.source = med.source
            GROUP BY d.source
        )
        SELECT doc_id, d.source, CAST(n_chars AS BIGINT) AS n_chars, med.med AS med, mad.mad AS mad
        FROM documents d
             JOIN med ON d.source = med.source
             JOIN mad ON d.source = mad.source
        WHERE abs(d.n_chars - med.med) > 3.0 * mad.mad
    """,
    # Winnowing (k=5, window=4) with the md5_60 gram hash: first 15 hex
    # chars of md5 as a 60-bit big-endian integer — bit-identical to
    # Spark's conv(substring(md5(g),1,15),16,10). 1-based i here mirrors
    # the 0-based posexplode: full windows are i <= n-window+1, plus the
    # pos-0 window short docs keep. coalesce: array_to_string([]) is
    # NULL in DuckDB but concat_ws is '' in Spark.
    "winnowing_fingerprints": rf"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (
            SELECT doc_id, i,
                   greatest(len(toks) - 4, 1) AS n,
                   CAST(concat('0x', substr(md5(coalesce(
                        array_to_string(toks[i:i+4], ' '), '')), 1, 15))
                        AS BIGINT) AS h
            FROM t, unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS u(i)
            WHERE len(toks) >= 1  -- blank docs emit no fingerprints
        ),
        w AS (
            SELECT doc_id, i, n,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g
        )
        SELECT DISTINCT doc_id, fp AS fingerprint FROM w
        WHERE i <= n - 3 OR i = 1
    """,
    # substring_overlap_pairs (md5_60, min_shared=2): the winnowing CTE
    # above, self-joined on fingerprint value — pairs sharing >= 2
    # selected fingerprints. Same detection guarantee as the Spark side;
    # no max_bucket cap, so the sets are exactly equal.
    "substring_overlap_pairs": rf"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (
            SELECT doc_id, i,
                   greatest(len(toks) - 4, 1) AS n,
                   CAST(concat('0x', substr(md5(coalesce(
                        array_to_string(toks[i:i+4], ' '), '')), 1, 15))
                        AS BIGINT) AS h
            FROM t, unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS u(i)
            WHERE len(toks) >= 1  -- blank docs emit no fingerprints
        ),
        w AS (
            SELECT doc_id, i, n,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g
        ),
        fps AS (
            SELECT DISTINCT doc_id, fp FROM w
            WHERE i <= n - 3 OR i = 1
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS n_shared_fps
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    "top_tokens": f"""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    # C4-style corpus line dedup: non-blank lines keep only their first
    # (doc, pos) occurrence; reassembly order by position. rn=1 covers
    # both unique lines and first-of-duplicates; 1-based i here vs the
    # 0-based posexplode only affects internal ordering, which agrees.
    "dedup_lines": """
        WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
                   FROM documents),
        l AS (
            SELECT doc_id, i AS pos, ls[i] AS ln
            FROM t, unnest(range(1, len(ls) + 1)) AS u(i)
            WHERE trim(ls[i], ' ') != ''
        ),
        r AS (
            SELECT doc_id, pos, ln,
                   row_number() OVER (PARTITION BY ln ORDER BY doc_id, pos) AS rn
            FROM l
        )
        SELECT doc_id,
               string_agg(ln, chr(10) ORDER BY pos) AS text,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM r WHERE rn = 1
        GROUP BY doc_id
        UNION ALL
        -- content-less docs (NULL/blank text) are KEPT, not deleted
        -- (the engine's r10 fix); trim(' ') matches Spark's trim(),
        -- which strips SPACES only — same dialect as the line filter
        SELECT doc_id, '' AS text, CAST(0 AS BIGINT) AS n_lines
        FROM t
        WHERE len(list_filter(ls, x -> trim(x, ' ') != '')) = 0
    """,
    # Add-one-smoothed corpus unigram LM: p(tok) = (n+1)/(T+|V|); per-doc
    # mean log10 over token OCCURRENCES (not distinct tokens). Docs with
    # zero tokens drop out (unnest), mirroring Spark's explode.
    "lm_unigram_score": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        v AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
        tot AS (SELECT sum(n) AS t, count(*) AS vsz FROM v)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(log10((n + 1.0) / (t + vsz))), 6) AS avg_logprob
        FROM tok JOIN v USING (tok), tot
        GROUP BY doc_id
    """,
    # Okapi BM25 for the fixed 3-term contract query; the rounded score
    # is what's ranked so the top-20 cut is engine-reproducible.
    "bm25_search": f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(len(t)) AS avgdl FROM tok),
        tf AS (
            SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM tok)
            WHERE term IN ('spark', 'join', 'window')
            GROUP BY doc_id, term
        ),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        SELECT doc_id,
               round(sum(log10(1 + (n_docs - df + 0.5) / (df + 0.5))
                         * tf * (1.2 + 1.0)
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
        FROM tf JOIN dft USING (term), stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20
    """,
    # DSIR importance weights: hashed-bigram (md5_32 % 4096) bucket
    # counts, add-one smoothing both sides, per-occurrence log10 ratio.
    # Target slice = doc_id md5-bucket < '30'; base = the full corpus.
    "dsir_logratio": f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        nb AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS b
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                                             i -> t[i] || ' ' || t[i+1])) AS g
                FROM tok WHERE len(t) >= 2
            )
        ),
        base AS (SELECT b, count(*) AS rn FROM nb GROUP BY b),
        tgt AS (
            SELECT b, count(*) AS tn FROM nb
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '30'
            GROUP BY b
        ),
        stats AS (
            SELECT base.b, rn, coalesce(tn, 0) AS tn,
                   (SELECT sum(rn) FROM base) AS r_tot,
                   (SELECT coalesce(sum(tn), 0) FROM tgt) AS t_tot
            FROM base LEFT JOIN tgt USING (b)
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
               round(sum(log10((tn + 1.0) / (t_tot + 4096))
                         - log10((rn + 1.0) / (r_tot + 4096))), 6) AS logratio
        FROM nb JOIN stats USING (b)
        GROUP BY doc_id
    """,
    # Bigram conditional LM: p(w2|w1) = (c(w1 w2)+1)/(c1(w1)+|V|), c1 =
    # occurrences as bigram context, |V| = distinct unigram vocab.
    "lm_bigram_score": f"""
        WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        vsz AS (SELECT count(DISTINCT u) AS v
                FROM (SELECT unnest(t) AS u FROM tok)),
        ng AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS g
            FROM tok WHERE len(t) >= 2
        ),
        gc AS (SELECT g, count(*) AS cg FROM ng GROUP BY g),
        cc AS (SELECT split_part(g, ' ', 1) AS w1, sum(cg) AS cw
               FROM gc GROUP BY w1)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(log10((cg + 1.0) / (cw + v))), 6) AS avg_logprob
        FROM ng JOIN gc USING (g)
             JOIN cc ON split_part(ng.g, ' ', 1) = cc.w1, vsz
        GROUP BY doc_id
    """,
    "corpus_stats": f"""
        WITH v AS (
            SELECT tok, count(*) AS n
            FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
            GROUP BY tok
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
               CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct_tokens,
               CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_hapax,
               CAST(coalesce(max(n), 0) AS BIGINT) AS top_token_freq
        FROM v
    """,
    "ngram_counts": f"""
        WITH t AS (SELECT {_TOKS} AS toks FROM documents),
        g AS (
            SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1])) AS gram
            FROM t WHERE len(toks) >= 2
        )
        SELECT gram, count(*) AS n_occurrences
        FROM g GROUP BY gram
        ORDER BY n_occurrences DESC, gram
        LIMIT 30
    """,
    "doc_length_buckets": """
        SELECT CAST(floor(n_chars / 200) AS BIGINT) AS bucket,
               count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY 1
    """,
    "tf_idf_top_terms": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY ALL),
        d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, term,
                   round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tf_idf
            FROM tf JOIN d USING (term), n
        )
        SELECT doc_id, term, tf_idf, CAST(rk AS INTEGER) AS rk
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tf_idf DESC, term) AS rk
              FROM scored)
        WHERE rk <= 3
    """,
    "repetition_stats": f"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN len(lines) > 0
                        THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                        ELSE 0.0 END AS dup_line_ratio,
                   toks
            FROM (SELECT doc_id,
                         -- blank-line rule on the explicit ASCII set
                         -- (space, tab, VT, FF, CR), the closure's
                         -- strip uses the same chars (r8 _WS_ASCII
                         -- convention; bare trim() strips spaces only)
                         list_filter(string_split(coalesce(text, ''), chr(10)),
                                     x -> trim(x, ' ' || chr(9) || chr(11)
                                                   || chr(12) || chr(13)) != '') AS lines,
                         coalesce({_TOKS}, []) AS toks
                  FROM documents)
        ),
        ex AS (
            SELECT doc_id, dup_line_ratio,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1])) AS gram
            FROM base WHERE len(toks) >= 2
        ),
        pg AS (SELECT doc_id, dup_line_ratio, gram, count(*) AS c FROM ex GROUP BY ALL)
        SELECT doc_id, dup_line_ratio,
               CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_fraction
        FROM pg GROUP BY doc_id, dup_line_ratio
        UNION ALL
        SELECT doc_id, dup_line_ratio, 0.0 AS top_bigram_fraction
        FROM base WHERE len(toks) < 2
    """,
    "pii_scan": """
        SELECT doc_id, emails, urls, ipv4s,
               (emails > 0 OR urls > 0 OR ipv4s > 0) AS has_pii
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS emails,
                   CAST(len(regexp_extract_all(text,
                       'https?://[^ \\t\\n\\x0B\\f\\r]+')) AS INTEGER) AS urls,
                   CAST(len(regexp_extract_all(text,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INTEGER) AS ipv4s
            FROM documents
        )
    """,
    # Redaction order pinned: emails → urls → ipv4s (chained global
    # replaces); n_redactions counts over the ORIGINAL text.
    "pii_redact": """
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       'https?://[^ \\t\\n\\x0B\\f\\r]+', '<URL>', 'g'),
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                   '<IP>', 'g') AS text,
               CAST(len(regexp_extract_all(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+'))
                    + len(regexp_extract_all(text,
                          '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                    AS BIGINT) AS n_redactions
        FROM documents
    """,
    "doc_stats": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len(toks) AS INTEGER) AS n_words,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS INTEGER) AS n_tokens_bpe,
               CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS punct_ratio,
               CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                   / greatest(len(list_distinct(toks)), 1) AS stopword_ratio
        FROM t
    """,
    "quality_score": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
        s AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
                   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                       / greatest(len(list_distinct(toks)), 1) AS stopword_ratio
            FROM t
        )
        SELECT doc_id,
               ((CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN chars_per_word >= 3 AND chars_per_word <= 12 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
        FROM s
    """,
    "language_id": f"""
        WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
        h AS (
            SELECT doc_id,
                   {", ".join(
                       f"CAST(len(list_intersect(toks, {_sql_list(ws)})) AS INTEGER) AS hits_{lang}"
                       for lang, ws in STOPWORDS.items()
                   )}
            FROM t
        )
        SELECT doc_id,
               CASE WHEN greatest({", ".join(f"hits_{lang}" for lang in STOPWORDS)}) = 0 THEN 'und'
                    {" ".join(
                        f"WHEN hits_{lang} = greatest({', '.join(f'hits_{x}' for x in STOPWORDS)}) THEN '{lang}'"
                        for lang in STOPWORDS
                    )}
                    ELSE 'und'
               END AS lang_guess
        FROM h
    """,
    "fingerprint": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               md5(coalesce(array_to_string(toks, ' '), '')) AS exact_md5,
               md5(coalesce(array_to_string(list_sort(list_distinct(toks)), ' '), '')) AS bag_md5
        FROM t
    """,
    "curate_corpus": f"""
        WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
        s AS (
            SELECT doc_id, source, toks,
                   len(toks) AS n_words,
                   CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
                   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                       / greatest(len(list_distinct(toks)), 1) AS stopword_ratio,
                   (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
                    OR len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+')) > 0
                    OR len(regexp_extract_all(text, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) > 0)
                       AS has_pii,
                   md5(coalesce(array_to_string(toks, ' '), '')) AS exact_md5,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS INTEGER) AS n_tokens_bpe
            FROM t
        ),
        gated AS (
            SELECT doc_id, source, n_tokens_bpe, exact_md5,
                   ((CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN chars_per_word >= 3 AND chars_per_word <= 12 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
            FROM s WHERE NOT has_pii
        )
        SELECT doc_id, source, n_tokens_bpe, quality
        FROM (SELECT *, row_number() OVER (PARTITION BY exact_md5 ORDER BY doc_id) AS rn
              FROM gated WHERE quality >= 0.75)
        WHERE rn = 1
    """,
    # Gopher rule gate (arXiv 2112.11446 Table A1 subset): every ratio
    # is a single int/int double division — IEEE-identical cross-engine,
    # no rounding pin needed.
    "gopher_quality": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                          string_split(text, chr(10)) AS lines
                   FROM documents),
        s AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   CAST(length(regexp_replace(text, '[ \t\n\x0B\x0C\r]+', '', 'g')) AS DOUBLE)
                       / greatest(len(toks), 1) AS mean_word_len,
                   CAST(length(text) - length(replace(text, '#', ''))
                        + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
                       / greatest(len(toks), 1) AS symbol_ratio,
                   CAST(len(list_filter(lines, l ->
                            starts_with(ltrim(l, ' '), '- ')
                            OR starts_with(ltrim(l, ' '), '* ')
                            OR starts_with(ltrim(l, ' '), '•'))) AS DOUBLE)
                       / greatest(len(lines), 1) AS bullet_line_ratio,
                   CAST(len(list_filter(lines, l ->
                            ends_with(rtrim(l, ' '), '...')
                            OR ends_with(rtrim(l, ' '), '…'))) AS DOUBLE)
                       / greatest(len(lines), 1) AS ellipsis_line_ratio,
                   CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                        AS DOUBLE) / greatest(len(toks), 1) AS alpha_word_ratio,
                   CAST(len(list_intersect(list_distinct(toks), {_STOP_EN}))
                        AS BIGINT) AS stop_hits
            FROM t
        )
        SELECT *,
               (n_words BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3.0 AND 10.0)
               AND symbol_ratio <= 0.1
               AND bullet_line_ratio <= 0.9
               AND ellipsis_line_ratio <= 0.3
               AND alpha_word_ratio >= 0.8
               AND stop_hits >= 2 AS passes_gopher
        FROM s
    """,
    # C4 cleaning (arXiv 1910.10683 §2.2), contract parameters: the
    # word-count rule at ≥60 words/line, punctuation rule off (testdata
    # is single-line unpunctuated; the punct/javascript/lorem rules are
    # pinned by the crafted-docs unit test).
    "c4_clean": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS lines
            FROM documents
            WHERE NOT contains(lower(text), 'lorem ipsum')
              AND NOT contains(text, '{{')
        ),
        k AS (
            SELECT doc_id, lines,
                   list_filter(lines, l ->
                       len(list_filter(string_split_regex(trim(l, ' '), '[ \t\n\x0B\x0C\r]+'),
                                       x -> x != '')) >= 60
                       AND NOT contains(lower(l), 'javascript')) AS kept
            FROM t
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_lines_kept,
               array_to_string(kept, chr(10)) AS text_clean
        FROM k WHERE len(kept) >= 1
    """,
    # Count-min sketch counters: md5_32('<j>:' || tok) % w hash rows —
    # the same md5_32 family as MinHash/DSIR, bit-identical both engines.
    "cms_sketch": f"""
        WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
        probes AS (
            SELECT CAST(j AS INTEGER) AS row_idx,
                   CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', tok)),
                                            1, 8)) AS BIGINT) % 256 AS bucket
            FROM tok, (SELECT unnest(range(4)) AS j)
        )
        SELECT row_idx, bucket, count(*) AS counter
        FROM probes GROUP BY row_idx, bucket
    """,
    "cms_estimates": f"""
        WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
        sk AS (
            SELECT row_idx, bucket, count(*) AS counter FROM (
                SELECT CAST(j AS INTEGER) AS row_idx,
                       CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', tok)),
                                                1, 8)) AS BIGINT) % 256 AS bucket
                FROM tok, (SELECT unnest(range(4)) AS j)
            ) GROUP BY row_idx, bucket
        ),
        terms AS (SELECT unnest(['the', 'spark', 'join', 'window', 'quantum']) AS token),
        tp AS (
            SELECT token, CAST(j AS INTEGER) AS row_idx,
                   CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', token)),
                                            1, 8)) AS BIGINT) % 256 AS bucket
            FROM terms, (SELECT unnest(range(4)) AS j)
        ),
        est AS (
            SELECT token, min(coalesce(counter, 0)) AS cms_count
            FROM tp LEFT JOIN sk USING (row_idx, bucket)
            GROUP BY token
        ),
        ex AS (
            SELECT tok AS token, count(*) AS exact_count FROM tok
            WHERE tok IN ('the', 'spark', 'join', 'window', 'quantum')
            GROUP BY tok
        )
        SELECT token, cms_count,
               CAST(coalesce(exact_count, 0) AS BIGINT) AS exact_count
        FROM est LEFT JOIN ex USING (token)
    """,
    # Feature-hashing BoW embedding: signed md5_32 hash kernel, summed
    # per (doc, bucket), L2-normalized. Contract emits NONZERO
    # components as scalar rows (the same posexplode rule as emb_*).
    # Every value is int/√int — deterministic, no rounding pin.
    "hashed_bow": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        h AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h32
              FROM tok),
        b AS (SELECT doc_id, (h32 // 2) % 64 AS bucket,
                     CASE WHEN h32 % 2 = 0 THEN 1 ELSE -1 END AS sgn
              FROM h),
        s AS (SELECT doc_id, bucket, sum(sgn) AS v FROM b GROUP BY doc_id, bucket),
        n AS (SELECT doc_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm
              FROM s GROUP BY doc_id)
        SELECT s.doc_id, CAST(bucket AS INTEGER) AS pos,
               CAST(v AS DOUBLE) / nrm AS value
        FROM s JOIN n USING (doc_id)
        WHERE v != 0
    """,
    # Zipf fit over the top-100 tokens: closed-form least squares of
    # log10(freq) on log10(rank); deterministic (freq desc, token)
    # ranking; 6-dp round absorbs summation-order ulps.
    "zipf_fit": f"""
        WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
        f AS (SELECT tok, count(*) AS f FROM tok GROUP BY tok
              ORDER BY f DESC, tok LIMIT 100),
        r AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM f),
        xy AS (SELECT log10(CAST(r AS DOUBLE)) AS x,
                      log10(CAST(f AS DOUBLE)) AS y FROM r),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        SELECT CAST(n AS BIGINT) AS n_ranked_tokens,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
                   AS intercept
        FROM s
    """,
    # Sentence segmentation: `[^.!?]+[.!?]*` extraction (the lookbehind-
    # free formulation — portable to RE2 engines), trimmed, empties
    # dropped, 0-based index.
    "split_sentences": """
        WITH s AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_extract_all(text, '[^.!?]+[.!?]*'),
                       x -> trim(x, ' ')), x -> x != '') AS sents
            FROM documents
        )
        SELECT doc_id,
               CAST(generate_subscripts(sents, 1) - 1 AS INTEGER) AS sent_idx,
               unnest(sents) AS sentence
        FROM s
    """,
    # CCNet terciles: the lm_unigram_score CTEs, then ntile(3) per lang
    # over the deterministic (rounded score desc, doc_id) order.
    "ccnet_buckets": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        v AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
        tot AS (SELECT sum(n) AS t, count(*) AS vsz FROM v),
        scored AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(log10((n + 1.0) / (t + vsz))), 6) AS avg_logprob
            FROM tok JOIN v USING (tok), tot
            GROUP BY doc_id
        ),
        b AS (
            SELECT s.doc_id, d.lang, s.n_tokens, s.avg_logprob,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.avg_logprob DESC, s.doc_id) AS t3
            FROM scored s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, lang, n_tokens, avg_logprob,
               CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket
        FROM b
    """,
    # hashed_bow → knn composition around doc 0. Every float stage
    # replays Spark's arithmetic exactly: unit vectors from int sums,
    # knn's SECOND normalize (÷‖u‖, which is 1±ulp — not skippable),
    # and pos-ORDERED dot/norm sums, which equal Spark's sequential
    # array folds bitwise because the skipped zero terms are exact
    # no-ops. Ranking is on the 6-dp rounded cosine with id tiebreak —
    # the knn_batch contract rule.
    "knn_text_vec0": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        hh AS (SELECT doc_id,
                      CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h32
               FROM tok),
        bk AS (SELECT doc_id, (h32 // 2) % 64 AS pos,
                      CASE WHEN h32 % 2 = 0 THEN 1 ELSE -1 END AS sgn
               FROM hh),
        sm AS (SELECT doc_id, pos, sum(sgn) AS v FROM bk GROUP BY doc_id, pos),
        n1 AS (SELECT doc_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm
               FROM sm GROUP BY doc_id),
        comp AS (SELECT sm.doc_id, pos, CAST(v AS DOUBLE) / nrm AS u
                 FROM sm JOIN n1 USING (doc_id) WHERE nrm > 0 AND v != 0),
        n2 AS (SELECT doc_id, sqrt(sum(u * u ORDER BY pos)) AS nrm2
               FROM comp GROUP BY doc_id),
        unit AS (SELECT c.doc_id, pos, u / nrm2 AS u
                 FROM comp c JOIN n2 USING (doc_id)),
        q AS (SELECT pos, u AS qu FROM unit WHERE doc_id = 0),
        cs AS (SELECT u.doc_id, sum(u.u * q.qu ORDER BY u.pos) AS c
               FROM unit u JOIN q USING (pos) GROUP BY u.doc_id),
        scored AS (
            SELECT d.doc_id AS vec_id,
                   round(coalesce(cs.c, 0.0), 6) AS cosine_sim
            FROM (SELECT DISTINCT doc_id FROM comp) d
            LEFT JOIN cs ON cs.doc_id = d.doc_id
        ),
        ranked AS (
            SELECT CAST(0 AS BIGINT) AS query_id, vec_id, cosine_sim,
                   CAST(row_number() OVER (ORDER BY cosine_sim DESC, vec_id)
                        AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 10
    """,
}

# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------


def _shingle_cte(n: int) -> str:
    # ZERO-token docs: the Arrow shingler emits the whole-doc shingle
    # for any doc of <= n tokens, which for an empty/blank doc is ''.
    # The slice form alone loses those docs (t[1:..] of an empty list is
    # NULL, which list_distinct silently drops — found by the
    # differential fuzz corpus, tests/test_differential_fuzz.py), so
    # the empty case is pinned to [''] explicitly.
    off = n - 1
    return f"""
    toks AS (SELECT doc_id, source, coalesce({_TOKS}, []) AS t FROM documents),
    sh AS (
        SELECT doc_id, source,
               CASE WHEN len(t) = 0 THEN [''] ELSE
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - {off}, 1)),
                       i -> array_to_string(t[i:i+{off}], ' ')))
               END AS shingles
        FROM toks
    )
    """


def _jaccard_pairs_sql(n: int, threshold: float) -> str:
    return f"""
    WITH {_shingle_cte(n)}
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
               (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
        FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    ) WHERE jaccard >= {threshold}
    """


_CURATE_FUZZY_SQL = f"""
    WITH RECURSIVE {_shingle_cte(1)},
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                   (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))) AS jaccard
            FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        ) WHERE jaccard >= 0.8
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    cnodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM cnodes
        UNION
        SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
    ),
    losers AS (
        SELECT node AS doc_id FROM reach GROUP BY node
        HAVING min(label) != node
    ),
    kept AS (
        SELECT d.* FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
    ),
    kt AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM kept),
    ks AS (
        SELECT doc_id, source, toks,
               len(toks) AS n_words,
               CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS punct_ratio,
               CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                   / greatest(len(list_distinct(toks)), 1) AS stopword_ratio,
               (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
                OR len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+')) > 0
                OR len(regexp_extract_all(text, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) > 0)
                   AS has_pii,
               md5(coalesce(array_to_string(toks, ' '), '')) AS exact_md5,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS INTEGER) AS n_tokens_bpe
        FROM kt
    ),
    gated AS (
        SELECT doc_id, source, n_tokens_bpe, exact_md5,
               ((CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN chars_per_word >= 3 AND chars_per_word <= 12 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
        FROM ks WHERE NOT has_pii
    )
    SELECT doc_id, source, n_tokens_bpe, quality
    FROM (SELECT *, row_number() OVER (PARTITION BY exact_md5 ORDER BY doc_id) AS rn
          FROM gated WHERE quality >= 0.75)
    WHERE rn = 1
"""

# MinHash md5_32 twin: deterministic banding reproduced end-to-end.
# Shingle hash = first 8 hex chars of md5 (32-bit, same rule family as
# winnowing/simhash); the 64 affine remixes use the engine's own
# deterministic coefficients (imported, not re-derived); band keys are
# concatenated sig tuples, so bucket equality IS tuple equality and the
# candidate set is exactly "pairs sharing >= 1 band", verified here with
# an OR-of-32-band-equalities join; exact jaccard filters candidates.
# Shared CTE chain — shingles → md5_32 shingle hashes → 64 affine-min
# signatures → concatenated band tuples → candidate pairs. ONE
# definition: _minhash_lsh_sql and _minhash_estimate_sql both compose
# it, so the banding arithmetic cannot desynchronize between oracles.
def _minhash_sig_cand_ctes(num_hashes: int, bands: int) -> str:
    from kafka_streams_spark.operators.dedup import MINHASH_PRIME, _minhash_coeffs

    coeffs = _minhash_coeffs(num_hashes)
    r = num_hashes // bands
    mins = ",\n               ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_keys = ",\n               ".join(
        "concat_ws('_', " + ", ".join(f"mh{b * r + i}" for i in range(r)) + f") AS b{b}"
        for b in range(bands)
    )
    any_band = "\n                OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""{_shingle_cte(3)},
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        h AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h32
            FROM ex
        ),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM h GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id,
               {band_keys}
            FROM sig
        ),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.doc_id < b.doc_id
             AND ({any_band})
        )"""


def _minhash_lsh_sql(threshold: float = 0.5, num_hashes: int = 64, bands: int = 32) -> str:
    return f"""
        WITH {_minhash_sig_cand_ctes(num_hashes, bands)}
        SELECT id_a, id_b, jaccard FROM (
            SELECT c.id_a, c.id_b,
                   CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
                   (len(x.shingles) + len(y.shingles)
                    - len(list_intersect(x.shingles, y.shingles))) AS jaccard
            FROM cand c
            JOIN sh x ON x.doc_id = c.id_a
            JOIN sh y ON y.doc_id = c.id_b
        ) WHERE jaccard >= {threshold}
    """


def _minhash_estimate_sql(num_hashes: int = 64, bands: int = 32) -> str:
    eq_sum = "\n                 + ".join(
        f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
        WITH {_minhash_sig_cand_ctes(num_hashes, bands)}
        SELECT id_a, id_b, est_jaccard, jaccard,
               abs(est_jaccard - jaccard) AS abs_err
        FROM (
            SELECT c.id_a, c.id_b,
                   ({eq_sum}) / {num_hashes}.0 AS est_jaccard,
                   CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                   (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
            FROM cand c
            JOIN sig x ON x.doc_id = c.id_a
            JOIN sig y ON y.doc_id = c.id_b
            JOIN sh sa ON sa.doc_id = c.id_a
            JOIN sh sb ON sb.doc_id = c.id_b
        )
    """


# Shared CTE chain for the incremental fuzzy gate: the md5_32 banding
# of _minhash_lsh_sql with candidates joined NEW side × EXISTING side
# only (split on the md5 id bucket), ending at `matched` (new-side doc
# ids with a verified near-dup in the existing corpus). ONE definition
# — both the dedup_incremental_fuzzy and curate_increment oracles
# compose it, so the banding arithmetic cannot desynchronize.
def _minhash_incremental_ctes(
    threshold: float, num_hashes: int, bands: int, split_hex: str
) -> str:
    from kafka_streams_spark.operators.dedup import MINHASH_PRIME, _minhash_coeffs

    coeffs = _minhash_coeffs(num_hashes)
    r = num_hashes // bands
    mins = ",\n               ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_keys = ",\n               ".join(
        "concat_ws('_', " + ", ".join(f"mh{b * r + i}" for i in range(r)) + f") AS b{b}"
        for b in range(bands)
    )
    any_band = "\n                OR ".join(f"n.b{b} = e.b{b}" for b in range(bands))
    return f"""{_shingle_cte(3)},
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        h AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h32
            FROM ex
        ),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM h GROUP BY doc_id
        ),
        bandt AS (
            SELECT doc_id,
               {band_keys}
            FROM sig
        ),
        newb AS (SELECT * FROM bandt
                 WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{split_hex}'),
        exb AS (SELECT * FROM bandt
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{split_hex}'),
        cand AS (
            SELECT DISTINCT n.doc_id AS new_id, e.doc_id AS ex_id
            FROM newb n JOIN exb e
              ON ({any_band})
        ),
        matched AS (
            SELECT DISTINCT c.new_id FROM cand c
            JOIN sh x ON x.doc_id = c.new_id
            JOIN sh y ON y.doc_id = c.ex_id
            WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
                  (len(x.shingles) + len(y.shingles)
                   - len(list_intersect(x.shingles, y.shingles))) >= {threshold}
        )"""


def _stop_band_cap_sql(
    budget: int,
    num_hashes: int = 64,
    bands: int = 32,
    split_hex: str = "80",
) -> str:
    """Oracle for the r10 banded-join pricing audit (dedup.py
    band_pair_price + stop_band_cap_for_budget): same md5_32 signature
    and band-key arithmetic as the incremental CTEs, band columns
    unpivoted to (doc_id, band_idx, band_hash) rows, new×existing
    occupancy counts per key, then the occupancy-histogram cumulative
    sum with the gap-exact lead(occ)-1 cap — the max_df_for_budget
    read-off shape."""
    from kafka_streams_spark.operators.dedup import MINHASH_PRIME, _minhash_coeffs

    coeffs = _minhash_coeffs(num_hashes)
    r = num_hashes // bands
    mins = ",\n               ".join(
        f"min(({a} * h32 + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_keys = ",\n               ".join(
        "concat_ws('_', " + ", ".join(f"mh{b * r + i}" for i in range(r)) + f") AS b{b}"
        for b in range(bands)
    )
    unpivot = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, b{b} AS band_hash FROM bandt"
        for b in range(bands)
    )
    return f"""
    WITH {_shingle_cte(3)},
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    h AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h32
        FROM ex
    ),
    sig AS (
        SELECT doc_id,
           {mins}
        FROM h GROUP BY doc_id
    ),
    bandt AS (
        SELECT doc_id,
           {band_keys}
        FROM sig
    ),
    bandl AS ({unpivot}),
    nocc AS (SELECT band_idx, band_hash, count(*) AS n_new FROM bandl
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{split_hex}'
             GROUP BY band_idx, band_hash),
    eocc AS (SELECT band_idx, band_hash, count(*) AS n_ex FROM bandl
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{split_hex}'
             GROUP BY band_idx, band_hash),
    priced AS (
        SELECT n.n_new + COALESCE(e.n_ex, 0) AS occupancy,
               n.n_new * COALESCE(e.n_ex, 0) AS price
        FROM nocc n LEFT JOIN eocc e USING (band_idx, band_hash)
    ),
    per AS (SELECT occupancy, sum(price) AS pairs FROM priced GROUP BY occupancy),
    cum AS (SELECT pairs, sum(pairs) OVER (ORDER BY occupancy) AS cum,
                   COALESCE(lead(occupancy) OVER (ORDER BY occupancy) - 1,
                            occupancy) AS cap
            FROM per)
    SELECT CAST(COALESCE(sum(pairs), 0) AS BIGINT) AS priced_pairs,
           CAST(COALESCE(max(CASE WHEN cum <= {budget} THEN cap END), 0)
                AS BIGINT) AS stop_band_occupancy,
           CAST(COALESCE(max(CASE WHEN cum <= {budget} THEN cum END), 0)
                AS BIGINT) AS admitted_pairs
    FROM cum
    """


def _minhash_incremental_sql(
    threshold: float = 0.5, num_hashes: int = 64, bands: int = 32,
    split_hex: str = "20",
) -> str:
    return f"""
        WITH {_minhash_incremental_ctes(threshold, num_hashes, bands, split_hex)}
        SELECT d.doc_id, d.source FROM documents d
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) >= '{split_hex}'
          AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.new_id = d.doc_id)
    """


# curate_increment: the full recurring-crawl composition — exact gate
# (anti-join on md5(text) + min-id winner within the increment), fuzzy
# gate (the _minhash_incremental_sql machinery; matched-vs-existing is
# per-doc independent, so computing it over ALL new docs and
# intersecting with the exact survivors equals running it on the
# survivors), then the curate_corpus gates over the kept set.
def _curate_increment_sql(
    threshold: float = 0.5, num_hashes: int = 64, bands: int = 32,
    split_hex: str = "20", min_quality: float = 0.75,
) -> str:
    return f"""
        WITH {_minhash_incremental_ctes(threshold, num_hashes, bands, split_hex)},
        nw AS (
            SELECT doc_id, source, text, md5(coalesce(text, '')) AS hh FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{split_hex}'
        ),
        exh AS (
            SELECT DISTINCT md5(coalesce(text, '')) AS hh FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{split_hex}'
        ),
        fresh AS (
            SELECT doc_id, source, text FROM (
                SELECT f.doc_id, f.source, f.text,
                       row_number() OVER (PARTITION BY f.hh ORDER BY f.doc_id) AS rn
                FROM nw f ANTI JOIN exh USING (hh)
            ) WHERE rn = 1
        ),
        kept AS (
            SELECT k.* FROM fresh k
            WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.new_id = k.doc_id)
        ),
        kt AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM kept),
        ks AS (
            SELECT doc_id, source, toks,
                   len(toks) AS n_words,
                   CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS chars_per_word,
                   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                       / greatest(len(list_distinct(toks)), 1) AS stopword_ratio,
                   (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
                    OR len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+')) > 0
                    OR len(regexp_extract_all(text, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) > 0)
                       AS has_pii,
                   md5(coalesce(array_to_string(toks, ' '), '')) AS exact_md5,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS INTEGER) AS n_tokens_bpe
            FROM kt
        ),
        gated AS (
            SELECT doc_id, source, n_tokens_bpe, exact_md5,
                   ((CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN chars_per_word >= 3 AND chars_per_word <= 12 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
            FROM ks WHERE NOT has_pii
        )
        SELECT doc_id, source, n_tokens_bpe, quality
        FROM (SELECT *, row_number() OVER (PARTITION BY exact_md5 ORDER BY doc_id) AS rn
              FROM gated WHERE quality >= {min_quality})
        WHERE rn = 1
    """


# SimHash md5_60 twin: per-token 60-bit hash (15 hex chars of md5, the
# same rule as winnowing_fingerprints), ±1 votes per bit, sign vector
# packed into a BIGINT. The 60 conditional sums / shift-adds are
# generated here rather than hand-written. The oracle verifies the
# LSH output against a plain all-pairs hamming filter — pigeonhole
# chunking is exact, so the two formulations are equal by construction.
_SIMHASH60_SUMS = ",\n               ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(60)
)
_SIMHASH60_SIG = "\n             + ".join(
    f"(CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) << {i} ELSE 0 END)"
    for i in range(60)
)

DEDUP_ORACLES = {
    "dedup_minhash_lsh": _minhash_lsh_sql(threshold=0.5),
    "minhash_jaccard_est": _minhash_estimate_sql(),
    # idf-weighted Jaccard (n=1, source-blocked): posting-list pair
    # sums; w_s = log10(N/df_s); ROUNDED value carries the threshold.
    "weighted_jaccard": f"""
        WITH {_shingle_cte(1)},
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        dfs AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        w AS (SELECT s, log10(n / df) AS w FROM dfs, nd),
        pw AS (SELECT doc_id, source, ex.s, w FROM ex JOIN w USING (s)),
        tot AS (SELECT doc_id, sum(w) AS tw FROM pw GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w) AS iw
            FROM pw a JOIN pw b
              ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, weighted_jaccard FROM (
            SELECT id_a, id_b,
                   round(iw / (ta.tw + tb.tw - iw), 6) AS weighted_jaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = id_a
            JOIN tot tb ON tb.doc_id = id_b
        ) WHERE weighted_jaccard >= 0.2
    """,
    # Posting-pair pre-flight (dedup.py posting_pair_stats): exact
    # candidate-pair count of the (shingle, source)-clustered self-join
    # that prices the weighted_jaccard contract. top_shingle tie-break
    # mirrors Spark's max(struct(cnt, s)): count, then shingle string.
    # NULL-source groups can never pair in the plain-equality block
    # join, so they price as 0 pairs (still counted in n_postings /
    # n_groups / max_posting) — the join_size_audit NULL-key split.
    "posting_pair_stats": f"""
        WITH {_shingle_cte(1)},
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        occ AS (SELECT s, source, count(*) AS cnt FROM ex GROUP BY s, source)
        SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_postings,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(COALESCE(sum(CASE WHEN source IS NOT NULL
                                      THEN cnt * (cnt - 1) // 2
                                      ELSE 0 END), 0) AS BIGINT)
                   AS n_candidate_pairs,
               CAST(COALESCE(max(cnt), 0) AS BIGINT) AS max_posting,
               (SELECT s FROM occ ORDER BY cnt DESC, s DESC LIMIT 1)
                   AS top_shingle
        FROM occ
    """,
    # Stop-shingle weighted Jaccard (dedup.py weighted_jaccard_pairs
    # max_df): postings with global df > 350 leave BEFORE weighting —
    # weights, totals, and overlap over the survivors only.
    "weighted_jaccard_capped": f"""
        WITH {_shingle_cte(1)},
        ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
        dfs AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
        keep AS (SELECT s, df FROM dfs WHERE df <= 350),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        w AS (SELECT s, log10(n / df) AS w FROM keep, nd),
        pw AS (SELECT doc_id, source, ex.s, w FROM ex JOIN w USING (s)),
        tot AS (SELECT doc_id, sum(w) AS tw FROM pw GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w) AS iw
            FROM pw a JOIN pw b
              ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, weighted_jaccard FROM (
            SELECT id_a, id_b,
                   round(iw / (ta.tw + tb.tw - iw), 6) AS weighted_jaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = id_a
            JOIN tot tb ON tb.doc_id = id_b
        ) WHERE weighted_jaccard >= 0.2
    """,
    "dedup_incremental_fuzzy": _minhash_incremental_sql(threshold=0.5),
    # The indexed twin gates against a PERSISTED signature table
    # (write_minhash_index) instead of recomputing the existing side's
    # signatures — outputs must be IDENTICAL, so the oracle is the same
    # SQL (the oracle always computes signatures inline; the index is a
    # Spark-side execution strategy, not a semantics change).
    "dedup_incremental_fuzzy_indexed": _minhash_incremental_sql(threshold=0.5),
    "curate_increment": _curate_increment_sql(threshold=0.5),
    "dedup_simhash": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
            FROM tok
        ),
        b AS (
            SELECT doc_id,
               {_SIMHASH60_SUMS}
            FROM h GROUP BY doc_id
        ),
        s AS (
            SELECT doc_id,
               {_SIMHASH60_SIG} AS simhash
            FROM b
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    # Bloom-gated incremental dedup: the Bloom pre-filter has no false
    # negatives, so the oracle is the SAME plain anti-join the exact
    # form uses — only the contract's corpus split ('40') differs from
    # dedup_incremental's ('20') so the two queries aren't one query.
    "dedup_incremental_bloom": """
        WITH nw AS (
            SELECT doc_id, source, md5(coalesce(text, '')) AS h FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '40'
        ),
        ex AS (
            SELECT DISTINCT md5(coalesce(text, '')) AS h FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        ),
        fresh AS (SELECT nw.* FROM nw ANTI JOIN ex USING (h))
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM fresh
        ) WHERE rn = 1
    """,
    # Same existing/new split as decontaminate: doc_id md5-bucket < '20'
    # is the curated corpus, the rest the increment. Counts are over the
    # ORIGINAL text for all three patterns (matches pii_redact).
    "dedup_incremental": """
        WITH nw AS (
            SELECT doc_id, source, md5(coalesce(text, '')) AS h FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '20'
        ),
        ex AS (
            SELECT DISTINCT md5(coalesce(text, '')) AS h FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        ),
        fresh AS (SELECT nw.* FROM nw ANTI JOIN ex USING (h))
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM fresh
        ) WHERE rn = 1
    """,
    "dedup_exact": """
        SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count
        FROM documents GROUP BY text
    """,
    "dedup_exact_rows": """
        SELECT * FROM documents
        QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
    # Asymmetric containment pairs: |A∩B| / min(|A|,|B|) over distinct
    # unigram shingles, source-blocked, 0.8 threshold, 6-dp output.
    "containment_pairs": f"""
        WITH {_shingle_cte(1)}
        SELECT id_a, id_b, round(containment, 6) AS containment FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CASE WHEN least(len(a.shingles), len(b.shingles)) = 0 THEN 0.0
                        ELSE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                             / least(len(a.shingles), len(b.shingles))
                   END AS containment
            FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        ) WHERE containment >= 0.8
    """,
    "dedup_token_jaccard": _jaccard_pairs_sql(1, 0.8),
    # prefix-filtered AllPairs twin — identical output by construction,
    # checked against the same SQL
    "dedup_token_jaccard_prefix": _jaccard_pairs_sql(1, 0.8),
    "dedup_ngram_jaccard": _jaccard_pairs_sql(2, 0.5),
    "curate_corpus_fuzzy": _CURATE_FUZZY_SQL,
    # Benchmark split = md5-bucket hash sample (same predicate as
    # hash_sample_docs); n_overlap counts DISTINCT shared 3-grams.
    "decontaminate": f"""
        WITH {_shingle_cte(3)},
        bench AS (
            SELECT DISTINCT unnest(shingles) AS s FROM sh
            WHERE substring(md5('hash_sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '10'
        ),
        train AS (
            SELECT doc_id, shingles FROM sh
            WHERE substring(md5('hash_sample:' || CAST(doc_id AS VARCHAR)), 1, 2) >= '10'
        ),
        expl AS (SELECT doc_id, unnest(shingles) AS s FROM train),
        ov AS (
            SELECT doc_id, count(*) AS n_overlap
            FROM expl JOIN bench USING (s) GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
               COALESCE(ov.n_overlap, 0) >= 1 AS contaminated
        FROM train t LEFT JOIN ov ON t.doc_id = ov.doc_id
    """,
}

# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

# Hyperplane-LSH twins: the signatures are DETERMINISTIC (seed-42
# Gaussian planes, generated by the engine's own random_hyperplanes and
# embedded here as literals), so the banded candidate set — pairs
# colliding in >= 1 table's sign-bit bucket — is reproducible in SQL:
# per table, bucket = Σ_p (dot(v, plane_tp) >= 0) << p. The only
# cross-engine risk is a sign flip on a dot within ~1 ulp of zero
# (numpy BLAS vs DuckDB sequential summation); no such dot exists in
# the fixed testdata, and the oracle gate at sf0.01 would catch one.
def _lsh_bucket_sql(n_planes: int, n_tables: int, dim: int, seed: int = 42) -> str:
    from kafka_streams_spark.operators.similarity import random_hyperplanes

    buckets = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        buckets.append(f"({bits}) AS t{t}")
    return ",\n               ".join(buckets)


def _emb_lsh_pairs_cte(threshold: float, n_planes: int, n_tables: int, dim: int) -> str:
    any_table = " OR ".join(f"a.t{t} = b.t{t}" for t in range(n_tables))
    return f"""
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (
            SELECT vec_id, v,
               {_lsh_bucket_sql(n_planes, n_tables, dim)}
            FROM e
        ),
        lsh_pairs AS (
            SELECT id_a, id_b, sim FROM (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(a.v, b.v) AS sim
                FROM sig a JOIN sig b
                  ON a.vec_id < b.vec_id AND ({any_table})
            ) WHERE sim >= {threshold}
        )
    """


def _knn_lsh_sql(
    query_id: int, k: int, n_planes: int, dim: int, multiprobe_hamming: int
) -> str:
    from kafka_streams_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, 42)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM sig WHERE vec_id = {query_id})
        SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine_sim
        FROM sig, q
        WHERE bit_count(xor(CAST(bucket AS BIGINT), CAST(qb AS BIGINT))) <= {multiprobe_hamming}
        ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
        LIMIT {k}
    """


SIMILARITY_ORACLES = {
    # Single-table hyperplane LSH top-k with multiprobe: deterministic
    # seed-42 planes embedded as literals; the probe set is the exact
    # bit_count(xor) <= h predicate the Spark plan uses; ranking matches
    # the knn contract order (ROUNDED 6-dp cosine desc, id tiebreak).
    "knn_lsh_vec0": _knn_lsh_sql(
        query_id=0, k=10, n_planes=6, dim=64, multiprobe_hamming=2
    ),
    # Label-cell IVF: centroids = per-label means (6-dp, matching
    # label_centroids), probe = top-2 cells by (centroid cosine desc,
    # label asc), exact rescore within the probed cells only. Fully
    # deterministic — no learned index.
    "knn_ivf_label_vec0": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        ex AS (SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM e),
        cm AS (SELECT label, pos, round(avg(x), 6) AS m FROM ex GROUP BY label, pos),
        cent AS (SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY label),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        pc AS (SELECT label, list_cosine_similarity(c, qv) AS cs FROM cent, q),
        probe AS (
            SELECT label FROM (
                SELECT label, row_number() OVER (ORDER BY cs DESC, label) AS r
                FROM pc
            ) WHERE r <= 2
        )
        SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine_sim
        FROM e JOIN probe USING (label), q
        ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
        LIMIT 10
    """,
    "emb_near_dup_lsh": f"""
        WITH {_emb_lsh_pairs_cte(0.3, 4, 8, 64)}
        SELECT id_a, id_b, round(sim, 6) AS cosine_sim FROM lsh_pairs
    """,
    "dedup_clusters_lsh": f"""
        WITH RECURSIVE {_emb_lsh_pairs_cte(0.3, 4, 8, 64)},
        edges AS (SELECT id_a AS src, id_b AS dst FROM lsh_pairs
                  UNION SELECT id_b, id_a FROM lsh_pairs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
        )
        SELECT node, CAST(min(label) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """,
    # int8 affine quantization codes; rounding is java-round
    # (floor(x+0.5)), arithmetic order pinned to match the Spark
    # expression term-for-term ((x-mn)/range*254.0+0.5).
    "emb_quantize_int8": """
        WITH ex AS (
            SELECT vec_id,
                   unnest(range(len(embedding))) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        per_dim AS (
            SELECT pos, min(x) AS mn, max(x) AS mx
            FROM ex GROUP BY pos
        )
        SELECT ex.vec_id,
               CAST(ex.pos AS INT) AS pos,
               CAST(floor((ex.x - per_dim.mn)
                          / (CASE WHEN per_dim.mx > per_dim.mn
                                  THEN per_dim.mx - per_dim.mn ELSE 1.0 END)
                          * 254.0 + 0.5) AS INT) - 127 AS code
        FROM ex JOIN per_dim USING (pos)
    """,
    # per-vector symmetric int8 (the ANN-on-codes path; uniform scale
    # cancels in cosine). Raw array_max scale is emitted; zero vectors
    # quantize against a safe 1.0.
    "emb_quantize_sym": """
        WITH scaled AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
            FROM embeddings
        ),
        ex AS (
            SELECT vec_id, scale,
                   unnest(range(len(embedding))) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM scaled
        )
        SELECT vec_id, scale,
               CAST(pos AS INT) AS pos,
               CAST(floor(x / (CASE WHEN scale > 0 THEN scale ELSE 1.0 END)
                          * 127.0 + 0.5) AS INT) AS code
        FROM ex
    """,
    # Bench/train split mirrors _q_decontaminate_emb (vec_id md5-bucket
    # < '20' is the benchmark). Max is order-insensitive; score rounded
    # to 6 dp on both sides before the threshold compare.
    "decontaminate_emb": """
        WITH bench AS (
            SELECT CAST(embedding AS DOUBLE[]) AS bvec FROM embeddings
            WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) < '20'
        ),
        train AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) >= '20'
        ),
        m AS (
            SELECT t.vec_id,
                   round(max(list_cosine_similarity(t.v, b.bvec)), 6)
                       AS max_benchmark_cosine
            FROM train t CROSS JOIN bench b
            GROUP BY t.vec_id
        )
        SELECT vec_id, max_benchmark_cosine,
               max_benchmark_cosine >= 0.3 AS contaminated
        FROM m
    """,
    # Ranks by ROUNDED similarity with id tiebreak — mirrors
    # knn_batch_to_ids' contract order exactly (raw-double ordering is
    # ulp-unstable across engines).
    "knn_batch": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
            FROM embeddings WHERE vec_id IN (0, 1, 2)
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6)
                       AS cosine_sim
            FROM embeddings e CROSS JOIN q
        ),
        ranked AS (
            SELECT query_id, vec_id, cosine_sim,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine_sim DESC, vec_id) AS INT)
                       AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 10
    """,
    "knn_vec0": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 6) AS cosine_sim
        FROM embeddings, q
        ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 6) DESC, vec_id
        LIMIT 10
    """,
    "emb_label_centroids": """
        WITH ex AS (
            SELECT label,
                   unnest(range(len(embedding))) AS pos,
                   unnest(embedding) AS x
            FROM embeddings
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(pos AS INT) AS pos,
               round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val
        FROM ex GROUP BY label, pos
    """,
    # Matryoshka truncation to 16 dims: prefix slice, re-normalized —
    # emb_normalize's oracle over embedding[1:16].
    "emb_truncate": """
        WITH n AS (
            SELECT vec_id, embedding[1:16] AS pre,
                   sqrt(list_sum(list_transform(
                       embedding[1:16], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
            WHERE len(embedding) >= 16
        ),
        ex AS (
            SELECT vec_id, nrm,
                   unnest(range(len(pre))) AS pos,
                   CAST(unnest(pre) AS DOUBLE) AS x
            FROM n WHERE nrm > 0
        )
        SELECT vec_id, CAST(pos AS INT) AS pos, round(x / nrm, 6) + 0.0 AS unit_val
        FROM ex
    """,
    "emb_normalize": """
        WITH n AS (
            SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(
                       embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings
        ),
        ex AS (
            SELECT vec_id, nrm,
                   unnest(range(len(embedding))) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM n WHERE nrm > 0
        )
        SELECT vec_id, CAST(pos AS INT) AS pos, round(x / nrm, 6) + 0.0 AS unit_val
        FROM ex
    """,
    "dedup_clusters": """
        WITH RECURSIVE
        e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        ),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, label) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
        )
        SELECT node, CAST(min(label) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """,
    "emb_near_dup_exact": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT id_a, id_b, round(sim, 6) AS cosine_sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_cosine_similarity(a.v, b.v) AS sim
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE sim >= 0.3
    """,
    # SemDeDup survivors: drop every vector with cosine ≥ 0.3 to a
    # lower-id vector in its label cell (same pair stage as
    # emb_near_dup_exact; min-id winner per edge).
    "semdedup": """
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        )
        SELECT vec_id, label FROM e
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
}

# --------------------------------------------------------------------------
# multimodal (deterministic fake codec — md5/sha256/ascii, SQL-expressible)
# --------------------------------------------------------------------------

MULTIMODAL_ORACLES = {
    "media_image_features": """
        WITH m AS (
            SELECT range AS media_id,
                   'media-payload-' || sha256(CAST(range AS VARCHAR)) AS s
            FROM range(200)
        ), h AS (SELECT media_id, md5(s) AS hh, length(s) AS n_bytes FROM m)
        SELECT media_id,
               CAST(1 + (ascii(substring(hh, 1, 1)) * 256 + ascii(substring(hh, 2, 1))) % 1024 AS INTEGER) AS width,
               CAST(1 + (ascii(substring(hh, 3, 1)) * 256 + ascii(substring(hh, 4, 1))) % 1024 AS INTEGER) AS height,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               substring(hh, 1, 16) AS feature_hex
        FROM h
    """,
    "media_audio_features": """
        WITH m AS (
            SELECT range AS media_id,
                   'media-payload-' || sha256(CAST(range AS VARCHAR)) AS s
            FROM range(200)
        ), h AS (SELECT media_id, md5(s) AS hh, length(s) AS n_bytes FROM m),
        r AS (
            SELECT media_id, hh, n_bytes,
                   CASE ascii(substring(hh, 5, 1)) % 4
                        WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 22050 ELSE 44100 END AS sr
            FROM h
        )
        SELECT media_id,
               CAST(sr AS INTEGER) AS sample_rate,
               CAST(n_bytes * 100 AS BIGINT) AS n_samples,
               CAST((n_bytes * 100 * 1000) // sr AS BIGINT) AS duration_ms,
               substring(hh, 17, 16) AS loudness_hex
        FROM r
    """,
    "media_resize": """
        WITH m AS (
            SELECT range AS media_id,
                   'media-payload-' || sha256(CAST(range AS VARCHAR)) AS s
            FROM range(200)
        ), h AS (SELECT media_id, md5(s) AS hh FROM m)
        SELECT media_id,
               CAST(LEAST(1 + (ascii(substring(hh, 1, 1)) * 256 + ascii(substring(hh, 2, 1))) % 1024, 256) AS INTEGER) AS width,
               CAST(LEAST(1 + (ascii(substring(hh, 3, 1)) * 256 + ascii(substring(hh, 4, 1))) % 1024, 256) AS INTEGER) AS height,
               hh AS payload_ascii
        FROM h
    """,
    "media_video_frames": """
        WITH m AS (
            SELECT range AS media_id,
                   'media-payload-' || sha256(CAST(range AS VARCHAR)) AS s
            FROM range(200)
        )
        SELECT media_id,
               CAST(f AS INTEGER) AS frame_idx,
               md5(substring(s, CAST(f AS INTEGER) * 10 + 1, 10)) AS frame_md5
        FROM (
            SELECT media_id, s,
                   -- ceil: tail bytes form a frame too (r10 fix,
                   -- lockstep with the engine)
                   unnest(generate_series(0,
                       CAST(ceil(length(s) / 10.0) AS INTEGER) - 1)) AS f
            FROM m
        )
    """,
}


# --------------------------------------------------------------------------
# sampling / sharding (operators/sampling.py) + hopping windows
# --------------------------------------------------------------------------

SAMPLING_ORACLES = {
    # assign_splits(test_256=13, val_256=26) → hex boundaries '0d'/'1a'
    "assign_splits_docs": """
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
    """,
    # reservoir_sample(k=50, stratum=lang, weight=n_chars): top-50 per
    # lang by the Efraimidis–Spirakis priority u^(1/w), u from md5 (the
    # same uniform_unit arithmetic as temperature_mix), priority rounded
    # to 9 dp on BOTH sides (pow is not correctly rounded), id tiebreak.
    # The Spark side computes this as a salted two-phase top-k; the
    # results are equal by construction (a global top-k row is a top-k
    # row of its salt group), so the oracle is the plain one-window form.
    "reservoir_sample_docs": """
        WITH p AS (
            -- nonpositive weight => priority 0 (the operator's explicit
            -- E-S w->0+ limit; without the guard DuckDB's 1/0 feeds POW
            -- a NULL/inf and the row diverges — caught by the fuzz
            -- corpus, which has empty docs with n_chars = 0)
            SELECT doc_id, lang,
                   CASE WHEN n_chars > 0 THEN
                       ROUND(POW(COALESCE(
                                     CAST(('0x' || substring(md5('reservoir:' || CAST(doc_id AS VARCHAR)), 1, 8))
                                          AS BIGINT) / 4294967296.0, 0.0),
                                 1.0 / n_chars), 9)
                   ELSE 0.0 END AS priority
            FROM documents
        )
        SELECT doc_id, lang, priority, rk FROM (
            SELECT doc_id, lang, priority,
                   CAST(row_number() OVER (PARTITION BY lang
                                           ORDER BY priority DESC, doc_id)
                        AS BIGINT) AS rk
            FROM p
        ) WHERE rk <= 50
    """,
    # hash_sample(rate_256=32) → threshold '20'; lowercase-hex strings
    # order like their numeric values, so the predicate is portable.
    "domain_stats": """
        WITH d AS (
            SELECT doc_id,
                   lower(unnest(regexp_extract_all(text, 'https?://([^/ \\t\\n\\x0B\\f\\r]+)', 1)))
                       AS domain
            FROM documents
        )
        SELECT domain,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_urls
        FROM d GROUP BY domain
    """,
    "hash_sample_docs": """
        SELECT doc_id, source FROM documents
        WHERE substr(md5('hash_sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '20'
    """,
    # keep_rate rounded to 9 dp on BOTH sides (pow is not correctly
    # rounded; see temperature_mix) so the boundary predicate is
    # bit-identical cross-engine.
    "temperature_mix_docs": """
        WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        m AS (SELECT min(n_s) AS n_min FROM c),
        r AS (
            SELECT source,
                   ROUND(LEAST(1.0, POW(CAST(n_s AS DOUBLE) / n_min, 1.0/2.0 - 1.0)), 9)
                       AS keep_rate
            FROM c, m
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN r ON d.source IS NOT DISTINCT FROM r.source
        WHERE COALESCE(
                  CAST(('0x' || substring(md5('temperature:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0, 0.0) < keep_rate
    """,
    # Shares/budget literals mirror _MIX_SHARES/_MIX_BUDGET in
    # __spark_entry__.py; per-source token sums use the BPE-ish
    # segmentation — the SAME budget currency as pack_token_shards /
    # pack_sequences (r10 review fix: the whitespace count silently
    # converted currencies mid-pipeline); 9-dp rate rounding pins the
    # keep boundary.
    "token_budget_mix": f"""
        WITH c AS (
            SELECT source, sum(len(regexp_extract_all(text, '{BPE_ISH_REGEX}'))) AS tok_s
            FROM documents WHERE source IN ('src1', 'src2', 'src3')
            GROUP BY source
        ),
        r AS (
            SELECT source,
                   ROUND(LEAST(1.0,
                       5000.0 * CASE source WHEN 'src1' THEN 0.5
                                            WHEN 'src2' THEN 0.3
                                            ELSE 0.2 END
                       / tok_s), 9) AS keep_rate
            FROM c
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN r USING (source)
        WHERE COALESCE(
                  CAST(('0x' || substring(md5('budget_mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0, 0.0) < keep_rate
    """,
    # Rates/epochs literals mirror _STRAT_RATES/_EPOCHS in
    # __spark_entry__.py verbatim; the uniform-[0,1) value is the same
    # first-8-hex-chars-of-md5 arithmetic as temperature_mix.
    "stratified_sample_docs": """
        SELECT doc_id, lang FROM documents
        WHERE COALESCE(
                  CAST(('0x' || substring(md5('stratified:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0, 0.0)
              < CASE lang WHEN 'de' THEN 1.0 WHEN 'en' THEN 0.5
                          WHEN 'zh' THEN 0.25 ELSE 1.0 END
    """,
    "upsample_epochs_docs": """
        WITH d AS (
            SELECT doc_id, source,
                   CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
                               WHEN 'src2' THEN 0.0 ELSE 1.0 END AS e,
                   COALESCE(
                       CAST(('0x' || substring(md5('epochs:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       / 4294967296.0, 0.0) AS u
            FROM documents
        ),
        n AS (
            SELECT doc_id, source,
                   CAST(floor(e) AS INT)
                       + CASE WHEN u < e - floor(e) THEN 1 ELSE 0 END AS n_copies
            FROM d
        )
        SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_idx
        FROM n WHERE n_copies >= 1
    """,
    "shuffle_shards_docs": """
        WITH h AS (
            SELECT doc_id,
                   CAST(CAST(('0x' || substring(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 8 AS INT) AS shard_id,
                   md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS hh
            FROM documents
        )
        SELECT doc_id, shard_id,
               CAST(row_number() OVER (PARTITION BY shard_id ORDER BY hh, doc_id)
                    AS BIGINT) AS shard_pos
        FROM h
    """,
    # chunk k covers tokens [k*stride, k*stride + chunk) with
    # chunk=16, overlap=4, stride=12; DuckDB list slices are 1-based
    # inclusive, Spark's slice(start, length) 1-based — both clamp.
    "chunk_documents": """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\x0C\r]+'),
                               x -> x != '') AS toks
            FROM documents
        ),
        n AS (
            SELECT doc_id, toks, len(toks) AS n_tok,
                   1 + CAST(ceil(GREATEST(len(toks) - 16, 0) / 12.0) AS INTEGER)
                       AS n_chunks
            FROM t
        )
        SELECT doc_id,
               CAST(k AS INTEGER) AS chunk_idx,
               coalesce(array_to_string(toks[k*12 + 1 : k*12 + 16], ' '), '') AS chunk_text,
               CAST(len(toks[k*12 + 1 : k*12 + 16]) AS INTEGER) AS n_tokens
        FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS k)
    """,
    # pack_sequences(seq_len=512): documents laid end-to-end per source,
    # split across fixed 512-token sequences — pure integer arithmetic
    # on the running token sum.
    "pack_sequences": f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS BIGINT) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n,
                   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        ),
        -- windowed SUM is HUGEINT in DuckDB; generate_series needs BIGINT
        d AS (SELECT doc_id, source, n, CAST(cum AS BIGINT) AS cum,
                     CAST(cum - n AS BIGINT) AS lo
              FROM c WHERE n > 0),
        e AS (
            SELECT doc_id, source, n, lo,
                   unnest(generate_series(lo // 512, (cum - 1) // 512)) AS seq_id
            FROM d
        )
        SELECT doc_id, source, CAST(seq_id AS BIGINT) AS seq_id,
               CAST(greatest(0, seq_id * 512 - lo) AS BIGINT) AS doc_start,
               CAST(least(n, (seq_id + 1) * 512 - lo)
                    - greatest(0, seq_id * 512 - lo) AS BIGINT) AS n_tokens_in_seq,
               CAST(greatest(0, lo - seq_id * 512) AS BIGINT) AS seq_off
        FROM e
    """,
    "pack_token_shards": f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS INTEGER)
                       AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST((cum - n_tokens) // 4000 AS BIGINT) AS shard_id
        FROM c
    """,
    "events_hopping": f"""
        SELECT (epoch_ns(ts) // 900000000000 - k) * 900000000000 AS win_start_ns,
               event_type,
               count(*) AS n_events,
               CAST(SUM({_cents_sql('value')}) AS BIGINT) AS total_value_cents
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
        WHERE ts IS NOT NULL  -- r10: NULL-ts is out-of-contract for a window
        GROUP BY 1, 2
    """,
    # interval join: clicks in the 30 min before each purchase, same user.
    # The Spark side buckets to avoid the loop join; the oracle is the
    # plain inequality join it must agree with.
    "events_attribution": f"""
        WITH p AS (
            SELECT event_id, user_id, epoch_ns(ts) AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, epoch_ns(ts) AS c_ts, value
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               count(*) AS n_clicks,
               CAST(SUM({_cents_sql('value')}) AS BIGINT) AS click_value_cents
        FROM p JOIN c ON p.user_id = c.user_id
                     AND c.c_ts BETWEEN p.p_ts - 1800000000000 AND p.p_ts
        GROUP BY 1, 2
    """,
    # paragraph-level duplication: non-overlapping 16-token chunks
    # (chunk_documents oracle with stride == chunk), grouped by chunk
    # TEXT (the Spark side groups by xxhash64 of the text — identical
    # modulo 64-bit collisions, which the fixed corpus doesn't have).
    "chunk_dup_stats": """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\x0B\x0C\r]+'),
                               x -> x != '') AS toks
            FROM documents
        ),
        n AS (
            SELECT doc_id, toks,
                   1 + CAST(ceil(GREATEST(len(toks) - 16, 0) / 16.0) AS INTEGER)
                       AS n_chunks
            FROM t
        ),
        ch AS (
            SELECT doc_id,
                   coalesce(array_to_string(toks[k*16 + 1 : k*16 + 16], ' '), '') AS chunk_text
            FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS k)
        ),
        cnt AS (SELECT chunk_text, count(*) AS n FROM ch GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_chunks,
               CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               CAST(floor(1000.0 * SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END)
                          / count(*)) AS BIGINT) AS dup_per_mille
        FROM ch JOIN cnt USING (chunk_text)
        GROUP BY doc_id
    """,
    # single-pass column profile; min/max cast to VARCHAR after the
    # native-type aggregate, NULLs excluded from distinct counts.
    "profile_documents": """
        SELECT 'doc_id' AS col_name, count(*) AS n_rows,
               CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT doc_id) AS n_distinct,
               CAST(min(doc_id) AS VARCHAR) AS min_str,
               CAST(max(doc_id) AS VARCHAR) AS max_str
        FROM documents
        UNION ALL
        SELECT 'lang', count(*),
               CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT lang),
               CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'source', count(*),
               CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT source),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', count(*),
               CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT n_chars),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents
    """,
}


# --------------------------------------------------------------------------
# TPC-H remainder (adapted to the no-partsupp schema; see
# operators/analytics.py for the shape-preservation notes)
# --------------------------------------------------------------------------

TPCH_EXTRA_ORACLES = {
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS revenue_x10k
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        WITH agg AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_DISC_X10K}
                                 ELSE 0 END) AS BIGINT) AS nation_volume_x10k,
                   CAST(SUM({_DISC_X10K}) AS BIGINT) AS total_volume_x10k
            FROM lineitem
                 JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation cn ON c_nationkey = cn.n_nationkey
                 JOIN region ON cn.n_regionkey = r_regionkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY 1
        )
        SELECT o_year, nation_volume_x10k, total_volume_x10k,
               CAST(nation_volume_x10k AS DOUBLE) / CAST(total_volume_x10k AS DOUBLE) AS mkt_share
        FROM agg
    """,
    "q9_profit_by_nation_year": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({_DISC_X10K}) AS BIGINT) AS sum_profit_x10k
        FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": f"""
        WITH per_part AS (
            SELECT l_partkey, CAST(SUM({_DISC_X10K}) AS BIGINT) AS part_value_x10k
            FROM lineitem GROUP BY l_partkey
        ),
        total AS (
            SELECT CAST(SUM(part_value_x10k) AS DOUBLE) / count(*) * 1.5 AS threshold
            FROM per_part
        )
        SELECT l_partkey, part_value_x10k
        FROM per_part CROSS JOIN total
        WHERE CAST(part_value_x10k AS DOUBLE) > threshold
    """,
    "q12_ship_delay": """
        SELECT CASE WHEN o_orderdate IS NULL OR l_shipdate IS NULL THEN 'unknown'
                    WHEN datediff('day', o_orderdate, l_shipdate) > 90 THEN '90+'
                    WHEN datediff('day', o_orderdate, l_shipdate) > 30 THEN '31-90'
                    ELSE '0-30' END AS delay_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, CAST(SUM({_DISC_X10K}) AS BIGINT) AS total_revenue_x10k
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_x10k
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue_x10k = (SELECT max(total_revenue_x10k) FROM rev)
    """,
    "q16_part_variety": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        GROUP BY 1, 2, 3
    """,
    "q17_small_quantity_revenue": f"""
        WITH branded AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#11'
        ),
        per_part AS (
            SELECT l_partkey AS avg_partkey, avg(l_quantity) AS avg_qty
            FROM branded GROUP BY 1
        )
        SELECT CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT)
                   AS small_qty_revenue_cents,
               count(*) AS n_lines
        FROM branded JOIN per_part ON l_partkey = avg_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q19_discounted_revenue": f"""
        SELECT CAST(SUM({_DISC_X10K}) AS BIGINT) AS revenue_x10k
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_heavy_suppliers": f"""
        SELECT s_suppkey, s_name, {_cents_sql('s_acctbal')} AS s_acctbal_cents
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
        )
    """,
    "q21_waiting_suppliers": """
        WITH losf AS (
            SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        per_os AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                            THEN 1 ELSE 0 END) AS was_late
            FROM losf GROUP BY 1, 2
        ),
        per_o AS (
            SELECT l_orderkey, count(*) AS n_supp, SUM(was_late) AS n_late
            FROM per_os GROUP BY 1
        )
        SELECT s_name, count(*) AS numwait
        FROM per_os
             JOIN per_o USING (l_orderkey)
             JOIN supplier ON l_suppkey = s_suppkey
        WHERE per_os.was_late = 1 AND per_o.n_supp > 1 AND per_o.n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q22_prospect_customers": f"""
        WITH threshold AS (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*) AS DOUBLE) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name, count(*) AS numcust,
               CAST(SUM({_cents_sql('c_acctbal')}) AS BIGINT) AS total_acctbal_cents
        FROM customer CROSS JOIN threshold
             JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY n_name
    """,
    "q2_cheapest_supplier": f"""
        WITH offers AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS best_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'LARGE'
            GROUP BY 1, 2
        ),
        part_min AS (
            SELECT l_partkey, min(best_price) AS min_price
            FROM offers GROUP BY 1
        )
        SELECT p_partkey, p_name, s_suppkey, s_name,
               {_cents_sql('best_price')} AS best_price_cents
        FROM offers
             JOIN part_min USING (l_partkey)
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
        WHERE best_price = min_price
    """,
    "funnel_conversions": """
        WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
        s1 AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN tsn END) AS t1
            FROM e GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, s1.t1,
                   min(CASE WHEN event_type = 'click' AND tsn > t1 THEN tsn END) AS t2
            FROM e JOIN s1 USING (user_id) GROUP BY e.user_id, s1.t1
        ),
        s3 AS (
            SELECT e.user_id, s2.t1, s2.t2,
                   min(CASE WHEN event_type = 'purchase' AND tsn > t2 THEN tsn END) AS t3
            FROM e JOIN s2 USING (user_id) GROUP BY e.user_id, s2.t1, s2.t2
        )
        SELECT count(t1) AS n_step1, count(t2) AS n_step2, count(t3) AS n_step3
        FROM s3
    """,
    "cohort_retention": """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn FROM events),
        first_seen AS (
            SELECT user_id, min(tsn) // 604800000000000 AS cohort_week
            FROM e GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, tsn // 604800000000000 AS week FROM e
        )
        SELECT cohort_week, week - cohort_week AS week_offset,
               count(DISTINCT user_id) AS n_users
        FROM activity JOIN first_seen USING (user_id)
        GROUP BY 1, 2
    """,
}


# --------------------------------------------------------------------------
# round-5 wave: corpus audits (registered behind the round-4 evidence
# window — __spark_entry__._ROUND5_QUEUE). Post-dict assignments so
# dedup_cluster_sizes can wrap the dedup_clusters recursive CTE.
# --------------------------------------------------------------------------

TEXT_ORACLES["ngram_novelty"] = f"""
    WITH {_shingle_cte(3)},
    g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
    freq AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty
    FROM g JOIN freq USING (gram)
    GROUP BY doc_id
"""

TEXT_ORACLES["corpus_overlap"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    a AS (SELECT DISTINCT unnest(t) AS gram FROM toks
          WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'),
    b AS (SELECT DISTINCT unnest(t) AS gram FROM toks
          WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '80'),
    j AS (SELECT a.gram AS ga, b.gram AS gb
          FROM a FULL OUTER JOIN b ON a.gram = b.gram),
    c AS (SELECT
            CAST(COALESCE(sum(CASE WHEN ga IS NOT NULL THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_grams_a,
            CAST(COALESCE(sum(CASE WHEN gb IS NOT NULL THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_grams_b,
            CAST(COALESCE(sum(CASE WHEN ga IS NOT NULL AND gb IS NOT NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shared
          FROM j)
    SELECT n_grams_a, n_grams_b, n_shared,
           CASE WHEN n_grams_a + n_grams_b - n_shared = 0 THEN 1.0
                ELSE CAST(n_shared AS DOUBLE)
                     / CAST(n_grams_a + n_grams_b - n_shared AS DOUBLE)
           END AS overlap_jaccard
    FROM c
"""

# Mirror of the `decontaminate` oracle with the roles swapped: score
# each benchmark item (md5 bucket < '10') against the distinct 3-gram
# set of the training remainder.
DEDUP_ORACLES["contamination_report"] = f"""
    WITH {_shingle_cte(3)},
    bench AS (SELECT doc_id, shingles FROM sh
              WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'),
    train AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
              WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '10'),
    expl AS (SELECT doc_id, unnest(shingles) AS s FROM bench)
    SELECT expl.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked,
           CAST(sum(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS leak_share
    FROM expl LEFT JOIN train ON expl.s = train.s
    GROUP BY expl.doc_id
"""

# Exact media dedup over the synthesized fixture: payload string keyed
# on media_id % 120 (the duplicate-injecting fixture), min-id winner.
MULTIMODAL_ORACLES["media_dedup"] = """
    WITH m AS (
        SELECT range AS media_id,
               'media-payload-' || sha256(CAST(range % 120 AS VARCHAR)) AS s
        FROM range(200)
    )
    SELECT md5(s) AS payload_md5,
           CAST(min(media_id) AS BIGINT) AS media_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM m GROUP BY md5(s)
"""

# Perceptual near-dup media: md5_60 pHash (fake codec) brute-force
# hamming join — the O(n^2) oracle the pigeonhole banding must equal.
MULTIMODAL_ORACLES["media_near_dup"] = """
    WITH m AS (
        SELECT range AS media_id,
               'media-payload-' || sha256(CAST(range % 120 AS VARCHAR)) AS s
        FROM range(200)
    ),
    p AS (
        SELECT media_id,
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS phash
        FROM m
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM p a JOIN p b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 8
"""

# LSH bucket-occupancy audit: sign-bit buckets from the same literal
# seed-42 planes as emb_near_dup_lsh; tables unpivot via UNION ALL.
SIMILARITY_ORACLES["lsh_bucket_stats"] = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sig AS (
        SELECT vec_id,
               {_lsh_bucket_sql(6, 8, 64)}
        FROM e
    ),
    k AS (
        {" UNION ALL ".join(
            f"SELECT CAST({t} AS INTEGER) AS lsh_table, t{t} AS bucket FROM sig"
            for t in range(8)
        )}
    ),
    occ AS (SELECT lsh_table, bucket, count(*) AS n FROM k GROUP BY 1, 2)
    SELECT lsh_table,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidate_pairs
    FROM occ GROUP BY lsh_table
"""

# Declared-vs-guessed language confusion matrix: the language_id guess
# expression verbatim, cross-tabbed against the lang metadata column.
TEXT_ORACLES["language_confusion"] = f"""
    WITH t AS (SELECT lang, list_distinct({_TOKS}) AS toks FROM documents),
    h AS (
        SELECT lang,
               {", ".join(
                   f"CAST(len(list_intersect(toks, {_sql_list(ws)})) AS INTEGER) AS hits_{lang}"
                   for lang, ws in STOPWORDS.items()
               )}
        FROM t
    ),
    g AS (
        SELECT lang,
               CASE WHEN greatest({", ".join(f"hits_{lang}" for lang in STOPWORDS)}) = 0 THEN 'und'
                    {" ".join(
                        f"WHEN hits_{lang} = greatest({', '.join(f'hits_{x}' for x in STOPWORDS)}) THEN '{lang}'"
                        for lang in STOPWORDS
                    )}
                    ELSE 'und'
               END AS lang_guess
        FROM h
    ),
    c AS (SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
          FROM g GROUP BY 1, 2)
    SELECT lang, lang_guess, n_docs,
           CAST(n_docs AS DOUBLE)
               / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
               AS share_of_declared
    FROM c
"""

SAMPLING_ORACLES["shard_skew_report"] = f"""
    WITH packed AS ({SAMPLING_ORACLES["pack_token_shards"]}),
    loads AS (
        SELECT source, shard_id, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        FROM packed GROUP BY source, shard_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_shards,
           CAST(min(shard_tokens) AS BIGINT) AS min_shard_tokens,
           CAST(max(shard_tokens) AS BIGINT) AS max_shard_tokens,
           CAST(sum(shard_tokens) AS BIGINT) AS total_tokens
    FROM loads GROUP BY source
"""

ANALYTICS_ORACLES["event_transitions"] = """
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts), event_id)
                   AS next_event_type
        FROM events WHERE ts IS NOT NULL
    ),
    c AS (SELECT event_type, next_event_type,
                 CAST(count(*) AS BIGINT) AS n_transitions
          FROM seq WHERE next_event_type IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, next_event_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / CAST(sum(n_transitions) OVER (PARTITION BY event_type)
                      AS DOUBLE) AS prob
    FROM c
"""

ANALYTICS_ORACLES["rfm_scores"] = f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(max(epoch_ns(ts)) AS BIGINT) AS recency_ns,
               CAST(count(*) AS BIGINT) AS frequency,
               COALESCE(CAST(SUM({_cents_sql('value')}) AS BIGINT), 0)
                   AS monetary_cents
        FROM events
        WHERE user_id IS NOT NULL  -- anonymous events: out-of-contract (r7)
        GROUP BY user_id
        HAVING max(epoch_ns(ts)) IS NOT NULL  -- r10: no recency, no rank
    )
    SELECT user_id, recency_ns, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY recency_ns, user_id) AS INTEGER)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INTEGER)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS INTEGER)
               AS m_score
    FROM per_user
"""

# Exact-substring span removal, k=5 token grams: occurrences whose gram
# has a lower-id owner are covered intervals [pos, pos+4]; the classic
# running-max window merge, positional anti-join, ordered string_agg
# reassembly — the same algorithm as the Spark windows, step for step.
DEDUP_ORACLES["dedup_spans"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    grams AS (
        SELECT doc_id, i AS pos, md5(array_to_string(tk[i:i+4], ' ')) AS gram
        FROM t, unnest(generate_series(1, len(tk) - 4)) AS g(i)
        WHERE len(tk) >= 5
    ),
    firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
    dup AS (SELECT doc_id, pos FROM grams JOIN firsts USING (gram)
            WHERE doc_id > first_doc),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 4) OVER w IS NULL
                    OR pos > max(pos + 4) OVER w + 1
                    THEN 1 ELSE 0 END AS newg
        FROM dup
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    grouped AS (SELECT doc_id, pos,
                       sum(newg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                FROM flagged),
    merged AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 4 AS e
               FROM grouped GROUP BY doc_id, grp),
    toks_pos AS (SELECT doc_id, i, tk[i] AS tok
                 FROM t, unnest(generate_series(1, len(tk))) AS g(i)),
    kept AS (
        SELECT tp.doc_id, tp.i, tp.tok
        FROM toks_pos tp
        WHERE NOT EXISTS (SELECT 1 FROM merged m
                          WHERE m.doc_id = tp.doc_id
                            AND tp.i BETWEEN m.s AND m.e)
    ),
    agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CASE WHEN t.tk IS NULL THEN NULL
                ELSE COALESCE(agg.text_clean, '') END AS text_clean,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(t.tk) - COALESCE(agg.n_kept, 0) AS BIGINT)
               AS n_tokens_removed
    FROM t LEFT JOIN agg USING (doc_id)
"""

SIMILARITY_ORACLES["dedup_cluster_sizes"] = f"""
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM (
        SELECT cluster_id, count(*) AS cluster_size
        FROM ({SIMILARITY_ORACLES["dedup_clusters"]})
        GROUP BY cluster_id
    )
    GROUP BY cluster_size
"""

# Gopher metrics verbatim from the gopher_quality oracle; C4 survival at
# the c4_clean contract parameters (word rule >= 60, punctuation rule
# off); composite quality verbatim from the quality_score oracle.
TEXT_ORACLES["gate_agreement"] = f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                      string_split(text, chr(10)) AS lines
               FROM documents),
    s AS (
        SELECT
            CAST(len(toks) AS BIGINT) AS n_words,
            CAST(length(regexp_replace(text, '[ \t\n\x0B\x0C\r]+', '', 'g')) AS DOUBLE)
                / greatest(len(toks), 1) AS mean_word_len,
            CAST(length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
                / greatest(len(toks), 1) AS symbol_ratio,
            CAST(len(list_filter(lines, l ->
                     starts_with(ltrim(l, ' '), '- ')
                     OR starts_with(ltrim(l, ' '), '* ')
                     OR starts_with(ltrim(l, ' '), '•'))) AS DOUBLE)
                / greatest(len(lines), 1) AS bullet_line_ratio,
            CAST(len(list_filter(lines, l ->
                     ends_with(rtrim(l, ' '), '...')
                     OR ends_with(rtrim(l, ' '), '…'))) AS DOUBLE)
                / greatest(len(lines), 1) AS ellipsis_line_ratio,
            CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                 AS DOUBLE) / greatest(len(toks), 1) AS alpha_word_ratio,
            CAST(len(list_intersect(list_distinct(toks), {_STOP_EN}))
                 AS BIGINT) AS stop_hits,
            (NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{{')
             AND len(list_filter(lines, l ->
                   len(list_filter(string_split_regex(trim(l, ' '), '[ \t\n\x0B\x0C\r]+'),
                                   x -> x != '')) >= 60
                   AND NOT contains(lower(l), 'javascript'))) >= 1)
                AS passes_c4,
            ((CASE WHEN len(toks) >= 10 AND len(toks) <= 100000
                   THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) >= 3
                    AND CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) <= 12
                   THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                         AS DOUBLE) / greatest(length(text), 1) <= 0.2
                   THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(len(list_intersect(toks, {_STOP_EN})) AS DOUBLE)
                        / greatest(len(list_distinct(toks)), 1) > 0
                   THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
        FROM t
    ),
    f AS (
        SELECT
            (n_words BETWEEN 50 AND 100000)
            AND (mean_word_len BETWEEN 3.0 AND 10.0)
            AND symbol_ratio <= 0.1
            AND bullet_line_ratio <= 0.9
            AND ellipsis_line_ratio <= 0.3
            AND alpha_word_ratio >= 0.8
            AND stop_hits >= 2 AS passes_gopher,
            passes_c4,
            quality >= 0.5 AS passes_quality
        FROM s
    )
    SELECT passes_gopher, passes_c4, passes_quality,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE)
               AS share
    FROM f GROUP BY 1, 2, 3
"""


# Delta-ingest span removal: NEW docs (md5 bucket < '20') lose every
# k=5 gram occurrence whose gram exists anywhere in the EXISTING corpus
# (bucket >= '20'); merge + cut identical to dedup_spans.
DEDUP_ORACLES["dedup_spans_incremental"] = f"""
    WITH nt AS (SELECT doc_id, {_TOKS} AS tk FROM documents
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'),
    et AS (SELECT doc_id, {_TOKS} AS tk FROM documents
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '20'),
    ngrams AS (
        SELECT doc_id, i AS pos, md5(array_to_string(tk[i:i+4], ' ')) AS gram
        FROM nt, unnest(generate_series(1, len(tk) - 4)) AS g(i)
        WHERE len(tk) >= 5
    ),
    egrams AS (
        SELECT DISTINCT md5(array_to_string(tk[i:i+4], ' ')) AS gram
        FROM et, unnest(generate_series(1, len(tk) - 4)) AS g(i)
        WHERE len(tk) >= 5
    ),
    dup AS (SELECT doc_id, pos FROM ngrams
            WHERE gram IN (SELECT gram FROM egrams)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 4) OVER w IS NULL
                    OR pos > max(pos + 4) OVER w + 1
                    THEN 1 ELSE 0 END AS newg
        FROM dup
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    grouped AS (SELECT doc_id, pos,
                       sum(newg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                FROM flagged),
    merged AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 4 AS e
               FROM grouped GROUP BY doc_id, grp),
    toks_pos AS (SELECT doc_id, i, tk[i] AS tok
                 FROM nt, unnest(generate_series(1, len(tk))) AS g(i)),
    kept AS (
        SELECT tp.doc_id, tp.i, tp.tok
        FROM toks_pos tp
        WHERE NOT EXISTS (SELECT 1 FROM merged m
                          WHERE m.doc_id = tp.doc_id
                            AND tp.i BETWEEN m.s AND m.e)
    ),
    agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CASE WHEN t.tk IS NULL THEN NULL
                ELSE COALESCE(agg.text_clean, '') END AS text_clean,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(t.tk) - COALESCE(agg.n_kept, 0) AS BIGINT)
               AS n_tokens_removed
    FROM nt t LEFT JOIN agg USING (doc_id)
"""

# Semi-structured extraction: json_extract == from_json on an explicit
# schema; all outputs exact integers. The json_valid guard reproduces
# from_json's quarantine semantics (malformed payloads → NULL, counted
# in n_null_props) — unguarded, DuckDB raises on the first bad row
# instead of diverging loudly.
ANALYTICS_ORACLES["events_props_profile"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_props,
           CAST(COALESCE(sum(k), 0) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM (SELECT event_type,
                 CASE WHEN props IS NOT NULL AND json_valid(props)
                      THEN CAST(json_extract(props, '$.k') AS BIGINT)
                 END AS k
          FROM events)
    GROUP BY event_type
"""

# PQ with exact label-centroid codebooks: the whole compressed-domain
# search — scaled-int quantization, java-round centroid means, per-
# subspace argmin codes (label-rank tiebreak), ADC bigint ranking — is
# integer-exact, so this reproduces the Spark plan bit-for-bit.
# m=4 subspaces over dim 64 => dsub=16; centroid index = label rank.
_PQ_LABEL_CTE = """
    e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS xi
        FROM embeddings
    ),
    ex AS (SELECT label, unnest(range(1, len(xi) + 1)) AS pos,
                  unnest(xi) AS x
           FROM e),
    cm AS (SELECT label, pos,
                  CAST(floor((2.0 * sum(x) + count(*))
                             / (2.0 * count(*))) AS BIGINT) AS m
           FROM ex GROUP BY label, pos),
    cent AS (SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY label),
    subs AS (SELECT unnest(range(4)) AS sub),
    dists AS (
        SELECT e.vec_id, cent.label, subs.sub,
               list_sum(list_transform(range(1, 17),
                   i -> (xi[sub * 16 + i] - c[sub * 16 + i])
                        * (xi[sub * 16 + i] - c[sub * 16 + i]))) AS d
        FROM e, cent, subs
    ),
    codes AS (
        SELECT vec_id, sub, label AS code_label FROM (
            SELECT vec_id, sub, label,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, label) AS r
            FROM dists
        ) WHERE r = 1
    ),
    q AS (SELECT xi AS qx FROM e WHERE vec_id = 0),
    pq AS (
        SELECT cd.vec_id,
               CAST(sum(list_sum(list_transform(range(1, 17),
                   i -> (qx[cd.sub * 16 + i] - ct.c[cd.sub * 16 + i])
                        * (qx[cd.sub * 16 + i] - ct.c[cd.sub * 16 + i]))))
                    AS BIGINT) AS pq_dist
        FROM codes cd JOIN cent ct ON cd.code_label = ct.label, q
        GROUP BY cd.vec_id
    )
"""

SIMILARITY_ORACLES["knn_pq_label_vec0"] = f"""
    WITH {_PQ_LABEL_CTE.strip()}
    SELECT vec_id, pq_dist FROM pq
    ORDER BY pq_dist, vec_id
    LIMIT 10
"""

# Two-stage ANN: integer-exact ADC shortlist (top-100), exact cosine
# re-rank on the shortlist only — the knn contract ranking (raw cosine
# desc, id tiebreak, 6-dp output).
SIMILARITY_ORACLES["knn_pq_rerank_vec0"] = f"""
    WITH {_PQ_LABEL_CTE.strip()},
    short AS (SELECT vec_id FROM pq ORDER BY pq_dist, vec_id LIMIT 100),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id = 0)
    SELECT e2.vec_id,
           round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]),
                                        qv.v), 6) AS cosine_sim
    FROM embeddings e2 JOIN short USING (vec_id), qv
    ORDER BY round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]), qv.v), 6)
             DESC, e2.vec_id
    LIMIT 10
"""

# PQ quantization-error audit: ADC distance vs exact int squared
# distance for the top-k ADC candidates — all integer arithmetic.
SIMILARITY_ORACLES["pq_error_vec0"] = f"""
    WITH {_PQ_LABEL_CTE.strip()},
    cand AS (SELECT vec_id, pq_dist FROM pq ORDER BY pq_dist, vec_id LIMIT 50),
    exact AS (
        SELECT e.vec_id,
               CAST(list_sum(list_transform(range(1, len(e.xi) + 1),
                   i -> (e.xi[i] - q.qx[i]) * (e.xi[i] - q.qx[i])))
                    AS BIGINT) AS exact_dist
        FROM e JOIN cand ON e.vec_id = cand.vec_id, q
    )
    SELECT cand.vec_id, cand.pq_dist, exact.exact_dist,
           CAST(cand.pq_dist - exact.exact_dist AS BIGINT) AS err
    FROM cand JOIN exact ON cand.vec_id = exact.vec_id
"""

# IVF-PQ: the full composition oracle — float-centroid cell probing
# (the knn_ivf_label CTEs), integer-exact PQ encoding + ADC restricted
# to the probed cells, exact cosine re-rank of the shortlist. Every
# stage is the already-pinned twin of its Spark half.
SIMILARITY_ORACLES["knn_ivfpq_vec0"] = f"""
    WITH {_PQ_LABEL_CTE.strip()},
    fe AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    fex AS (SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM fe),
    fcm AS (SELECT label, pos, round(avg(x), 6) AS m FROM fex GROUP BY label, pos),
    fcent AS (SELECT label, list(m ORDER BY pos) AS c FROM fcm GROUP BY label),
    fq AS (SELECT v AS qv FROM fe WHERE vec_id = 0),
    pc AS (SELECT label, list_cosine_similarity(c, qv) AS cs FROM fcent, fq),
    probe AS (
        SELECT label FROM (
            SELECT label, row_number() OVER (ORDER BY cs DESC, label) AS r
            FROM pc
        ) WHERE r <= 2
    ),
    short AS (
        SELECT pq.vec_id FROM pq
             JOIN fe ON pq.vec_id = fe.vec_id
             JOIN probe ON fe.label = probe.label
        ORDER BY pq_dist, pq.vec_id
        LIMIT 100
    )
    SELECT e2.vec_id,
           round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]),
                                        fq.qv), 6) AS cosine_sim
    FROM embeddings e2 JOIN short USING (vec_id), fq
    ORDER BY round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]), fq.qv), 6)
             DESC, e2.vec_id
    LIMIT 10
"""

# Native-session-window sessionization: the gaps-and-islands CTE is the
# SQL twin of Spark's SessionWindow merge rule — boundary-INCLUSIVE
# (diff <= gap merges; empirically pinned), end = last event + gap.
ANALYTICS_ORACLES["events_session_native"] = """
    WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
               FROM events WHERE ts IS NOT NULL),
    lagd AS (
        SELECT event_id, user_id, us,
               CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY us, event_id
            ROWS UNBOUNDED PRECEDING) AS seq
        FROM lagd
    )
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           min(event_id) AS first_event
    FROM sess GROUP BY user_id, seq
"""

# OOV vs the corpus's own top-1000 vocabulary; vocab tiebreak (count
# desc, token asc) pinned on both engines, zeros kept via the doc spine.
TEXT_ORACLES["oov_rate"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS n FROM tok GROUP BY tok
            ORDER BY n DESC, tok LIMIT 1000
        )
    ),
    per AS (
        SELECT t.doc_id, count(*) AS n_tokens,
               sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""

# Exact dedup on the normalize_text canon, keyed by SHA-256 of the
# normalized text (both engines emit lowercase hex).
TEXT_ORACLES["dedup_normalized"] = r"""
    SELECT sha256(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
               AS norm_hash,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1
"""

# Exact integer-scaled second-moment (Gram) table: PQ_SCALE quantization
# makes every sum order-independent int64 arithmetic, so the unnest
# self-join reproduces the Arrow partial-Gram path bit-for-bit.
SIMILARITY_ORACLES["emb_gram"] = """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS xi
        FROM embeddings
    ),
    ex AS (SELECT vec_id, unnest(range(1, len(xi) + 1)) AS pos,
                  unnest(xi) AS x
           FROM e)
    SELECT CAST(a.pos - 1 AS INTEGER) AS dim_i,
           CAST(b.pos - 1 AS INTEGER) AS dim_j,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a.x) AS BIGINT) AS sum_i,
           CAST(sum(b.x) AS BIGINT) AS sum_j,
           CAST(sum(a.x * b.x) AS BIGINT) AS sum_prod
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
    GROUP BY 1, 2
"""

# Per-label median/MAD gate on exact int-scaled squared norms — the
# length_outliers determinism argument: int inputs put median/MAD on a
# .0/.5 grid, every comparison operand exact.
SIMILARITY_ORACLES["emb_norm_outliers"] = """
    WITH sq AS (
        SELECT vec_id, label,
               CAST(list_sum(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                        * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)))
                    AS BIGINT) AS sqnorm
        FROM embeddings
    ),
    med AS (SELECT label, median(sqnorm) AS med FROM sq GROUP BY label),
    mad AS (
        SELECT s.label, median(abs(s.sqnorm - med.med)) AS mad
        FROM sq s JOIN med ON s.label = med.label
        GROUP BY s.label
    )
    SELECT s.vec_id, s.label, s.sqnorm, med.med AS med, mad.mad AS mad
    FROM sq s
         JOIN med ON s.label = med.label
         JOIN mad ON s.label = mad.label
    WHERE abs(CAST(s.sqnorm AS DOUBLE) - med.med) > 3.0 * mad.mad
"""

def _knn_recall_sql(
    query_id: int, k: int, n_planes: int, dim: int, multiprobe_hamming: int
) -> str:
    """Recall@k audit twin: |LSH top-k ∩ exact top-k| with the same
    literal seed-42 planes, probe predicate, and ranking order as the
    knn_lsh_vec0 / knn_vec0 oracles it composes."""
    from kafka_streams_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, 42)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM sig WHERE vec_id = {query_id}),
        exact AS (
            SELECT vec_id FROM e, q
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        ),
        approx AS (
            SELECT vec_id FROM sig, q
            WHERE bit_count(xor(CAST(bucket AS BIGINT), CAST(qb AS BIGINT)))
                      <= {multiprobe_hamming}
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        )
        SELECT {query_id} AS query_id, {k} AS k,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM approx WHERE vec_id IN (SELECT vec_id FROM exact)
    """


def _knn_lsh_mt_sql(
    query_id: int, k: int, n_planes: int, n_tables: int, dim: int, seed: int = 42
) -> str:
    """Multi-table LSH twin: one bucket expression per table (literal
    seed+t planes), candidacy = exact-bucket match in ANY table, exact
    cosine re-rank under the knn contract order."""
    from kafka_streams_spark.operators.similarity import random_hyperplanes

    def bucket(table_seed: int) -> str:
        planes = random_hyperplanes(dim, n_planes, table_seed)
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    bcols = ", ".join(f"({bucket(seed + t)}) AS b{t}" for t in range(n_tables))
    qcols = ", ".join(f"b{t} AS qb{t}" for t in range(n_tables))
    anymatch = " OR ".join(f"b{t} = qb{t}" for t in range(n_tables))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (SELECT vec_id, v, {bcols} FROM e),
        q AS (SELECT v AS qv, {qcols} FROM sig WHERE vec_id = {query_id})
        SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine_sim
        FROM sig, q
        WHERE {anymatch}
        ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
        LIMIT {k}
    """


SIMILARITY_ORACLES["knn_lsh_mt_vec0"] = _knn_lsh_mt_sql(
    query_id=0, k=10, n_planes=4, n_tables=4, dim=64
)

def _knn_recall_mt_sql(
    query_id: int, k: int, n_planes: int, n_tables: int, dim: int, seed: int = 42
) -> str:
    """Multitable recall twin: |multitable top-k ∩ exact top-k|."""
    from kafka_streams_spark.operators.similarity import random_hyperplanes

    def bucket(table_seed: int) -> str:
        planes = random_hyperplanes(dim, n_planes, table_seed)
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    bcols = ", ".join(f"({bucket(seed + t)}) AS b{t}" for t in range(n_tables))
    qcols = ", ".join(f"b{t} AS qb{t}" for t in range(n_tables))
    anymatch = " OR ".join(f"b{t} = qb{t}" for t in range(n_tables))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sig AS (SELECT vec_id, v, {bcols} FROM e),
        q AS (SELECT v AS qv, {qcols} FROM sig WHERE vec_id = {query_id}),
        exact AS (
            SELECT vec_id FROM e, (SELECT v AS qv FROM e WHERE vec_id = {query_id})
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        ),
        approx AS (
            SELECT vec_id FROM sig, q
            WHERE {anymatch}
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        )
        SELECT {query_id} AS query_id, {k} AS k,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM approx WHERE vec_id IN (SELECT vec_id FROM exact)
    """


SIMILARITY_ORACLES["knn_recall_mt_vec0"] = _knn_recall_mt_sql(
    query_id=0, k=10, n_planes=4, n_tables=4, dim=64
)


SIMILARITY_ORACLES["knn_recall_vec0"] = _knn_recall_sql(
    query_id=0, k=10, n_planes=6, dim=64, multiprobe_hamming=2
)

# Per-dimension exact drift sums between the md5-bucket slices — both
# sides are the gram diagonal, reproduced by unnest + int64 sums.
SIMILARITY_ORACLES["emb_drift"] = """
    WITH e AS (
        SELECT vec_id,
               substring(md5(CAST(vec_id AS VARCHAR)), 1, 2) AS bkt,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS xi
        FROM embeddings
    ),
    ex AS (SELECT bkt, unnest(range(1, len(xi) + 1)) AS pos1, unnest(xi) AS x
           FROM e),
    sa AS (SELECT pos1 - 1 AS pos, count(*) AS n_a, sum(x) AS sum_a,
                  sum(x * x) AS sumsq_a
           FROM ex WHERE bkt < '20' GROUP BY 1),
    sb AS (SELECT pos1 - 1 AS pos, count(*) AS n_b, sum(x) AS sum_b,
                  sum(x * x) AS sumsq_b
           FROM ex WHERE bkt >= '20' GROUP BY 1)
    SELECT CAST(COALESCE(sa.pos, sb.pos) AS INTEGER) AS pos,
           CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(sum_a, 0) AS BIGINT) AS sum_a,
           CAST(COALESCE(sumsq_a, 0) AS BIGINT) AS sumsq_a,
           CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
           CAST(COALESCE(sum_b, 0) AS BIGINT) AS sum_b,
           CAST(COALESCE(sumsq_b, 0) AS BIGINT) AS sumsq_b
    FROM sa FULL OUTER JOIN sb ON sa.pos = sb.pos
"""

# C4-style blocklist gate: token-level membership on the frozen
# placeholder list, exploded count + any-hit flag.
TEXT_ORACLES["badword_filter"] = f"""
    SELECT doc_id,
           CAST(len(list_filter({_TOKS},
               t -> list_contains(['badword', 'slur1', 'slur2', 'obscene1'], t)))
               AS BIGINT) AS n_badwords,
           len(list_filter({_TOKS},
               t -> list_contains(['badword', 'slur1', 'slur2', 'obscene1'], t))) > 0
               AS "drop"
    FROM documents
"""

# One-row embedding integrity profile: NULL / ragged / NaN / Inf /
# all-zero counts, exact integers over one scan.
SIMILARITY_ORACLES["emb_profile"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(min(len(embedding)) AS BIGINT) AS dim_min,
           CAST(max(len(embedding)) AS BIGINT) AS dim_max,
           CAST(sum(CASE WHEN embedding IS NOT NULL AND len(list_filter(
                   embedding, x -> isnan(CAST(x AS DOUBLE)))) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_with_nan,
           CAST(sum(CASE WHEN embedding IS NOT NULL AND len(list_filter(
                   embedding, x -> isinf(CAST(x AS DOUBLE)))) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_with_inf,
           CAST(sum(CASE WHEN embedding IS NOT NULL AND len(list_filter(
                   embedding, x -> CAST(x AS DOUBLE) != 0.0)) = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
    FROM embeddings
"""

# Per-type hourly-rate anomalies: integer hourly counts put median/MAD
# on the .0/.5 grid — flag comparison bit-deterministic.
ANALYTICS_ORACLES["events_rate_anomaly"] = """
    WITH c AS (
        SELECT event_type, epoch_ns(ts) // 3600000000000 AS epoch_hour,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, median(n_events) AS med FROM c GROUP BY event_type),
    mad AS (
        SELECT c.event_type, median(abs(c.n_events - med.med)) AS mad
        FROM c JOIN med ON c.event_type = med.event_type
        GROUP BY c.event_type
    )
    SELECT c.event_type, c.epoch_hour, c.n_events, med.med AS med, mad.mad AS mad
    FROM c
         JOIN med ON c.event_type = med.event_type
         JOIN mad ON c.event_type = mad.event_type
    WHERE abs(CAST(c.n_events AS DOUBLE) - med.med) > 3.0 * mad.mad
"""

# Id-level corpus version diff: digests compared, bodies never shuffled.
# Twin splits documents by the md5-bucket rule (old = bucket >= '20',
# new = bucket < '80' — overlapping slices so all four statuses occur)
# and perturbs nothing: see the contract wrapper for the slice spec.
TEXT_ORACLES["corpus_diff"] = """
    WITH o AS (SELECT doc_id, md5(text) AS ho, 1 AS po FROM documents
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '20'),
    n AS (SELECT doc_id, md5(text || CASE WHEN doc_id % 7 = 0 THEN 'x' ELSE '' END) AS hn,
                 1 AS pn
          FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80')
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.po IS NULL THEN 'added'
                WHEN n.pn IS NULL THEN 'removed'
                WHEN o.ho IS DISTINCT FROM n.hn THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""

# One-row release scorecard: the gate_agreement flag expressions
# re-aggregated as pass counts, plus blocklist and PII gates.
TEXT_ORACLES["corpus_scorecard"] = f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                      string_split(text, chr(10)) AS lines
               FROM documents),
    s AS (
        SELECT
            CAST(len(toks) AS BIGINT) AS n_words,
            CAST(length(regexp_replace(text, '[ \t\n\x0B\x0C\r]+', '', 'g')) AS DOUBLE)
                / greatest(len(toks), 1) AS mean_word_len,
            CAST(length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
                / greatest(len(toks), 1) AS symbol_ratio,
            CAST(len(list_filter(lines, l ->
                     starts_with(ltrim(l, ' '), '- ')
                     OR starts_with(ltrim(l, ' '), '* ')
                     OR starts_with(ltrim(l, ' '), '•'))) AS DOUBLE)
                / greatest(len(lines), 1) AS bullet_line_ratio,
            CAST(len(list_filter(lines, l ->
                     ends_with(rtrim(l, ' '), '...')
                     OR ends_with(rtrim(l, ' '), '…'))) AS DOUBLE)
                / greatest(len(lines), 1) AS ellipsis_line_ratio,
            CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                 AS DOUBLE) / greatest(len(toks), 1) AS alpha_word_ratio,
            CAST(len(list_intersect(list_distinct(toks), {_STOP_EN}))
                 AS BIGINT) AS stop_hits,
            (NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{{')
             AND len(list_filter(lines, l ->
                   len(list_filter(string_split_regex(trim(l, ' '), '[ \t\n\x0B\x0C\r]+'),
                                   x -> x != '')) >= 3
                   AND NOT contains(lower(l), 'javascript')
                   AND (ends_with(trim(l, ' '), '.') OR ends_with(trim(l, ' '), '!')
                        OR ends_with(trim(l, ' '), '?')
                        OR ends_with(trim(l, ' '), '"')))) >= 1)
                AS passes_c4,
            len(list_filter(toks, x -> list_contains(
                ['badword', 'slur1', 'slur2', 'obscene1'], x))) = 0
                AS badword_free,
            (len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) = 0
             AND len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+')) = 0
             AND len(regexp_extract_all(text,
                 '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) = 0)
                AS pii_free
        FROM t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN (n_words BETWEEN 50 AND 100000)
                AND (mean_word_len BETWEEN 3.0 AND 10.0)
                AND symbol_ratio <= 0.1
                AND bullet_line_ratio <= 0.9
                AND ellipsis_line_ratio <= 0.3
                AND alpha_word_ratio >= 0.8
                AND stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
           CAST(sum(CASE WHEN passes_c4 THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_pass,
           -- NULL text is badword/PII free (flag NULL only for NULL
           -- text; coalesce TRUE mirrors the engine's coalesce(t, ''))
           CAST(sum(CASE WHEN coalesce(badword_free, TRUE) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_badword_free,
           CAST(sum(CASE WHEN coalesce(pii_free, TRUE) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pii_free
    FROM s
"""

# Dead hours: generate_series spine per type minus observed hours.
ANALYTICS_ORACLES["events_dead_hours"] = """
    WITH o AS (SELECT DISTINCT event_type,
                      epoch_ns(ts) // 3600000000000 AS epoch_hour
               FROM events),
    r AS (SELECT event_type, min(epoch_hour) AS h0, max(epoch_hour) AS h1
          FROM o GROUP BY event_type),
    spine AS (SELECT event_type, unnest(generate_series(h0, h1)) AS epoch_hour
              FROM r)
    SELECT s.event_type, CAST(s.epoch_hour AS BIGINT) AS epoch_hour
    FROM spine s LEFT JOIN o
         ON s.event_type = o.event_type AND s.epoch_hour = o.epoch_hour
    WHERE o.event_type IS NULL
"""

SIMILARITY_ORACLES["knn_recall_ivfpq_vec0"] = f"""
    WITH {_PQ_LABEL_CTE.strip()},
    fe AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    fex AS (SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM fe),
    fcm AS (SELECT label, pos, round(avg(x), 6) AS m FROM fex GROUP BY label, pos),
    fcent AS (SELECT label, list(m ORDER BY pos) AS c FROM fcm GROUP BY label),
    fq AS (SELECT v AS qv FROM fe WHERE vec_id = 0),
    pc AS (SELECT label, list_cosine_similarity(c, qv) AS cs FROM fcent, fq),
    probe AS (
        SELECT label FROM (
            SELECT label, row_number() OVER (ORDER BY cs DESC, label) AS r
            FROM pc
        ) WHERE r <= 2
    ),
    short AS (
        SELECT pq.vec_id FROM pq
             JOIN fe ON pq.vec_id = fe.vec_id
             JOIN probe ON fe.label = probe.label
        ORDER BY pq_dist, pq.vec_id
        LIMIT 100
    ),
    approx AS (
        SELECT e2.vec_id
        FROM embeddings e2 JOIN short USING (vec_id), fq
        ORDER BY round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]), fq.qv), 6)
                 DESC, e2.vec_id
        LIMIT 10
    ),
    exact AS (
        SELECT vec_id FROM fe, fq
        ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
        LIMIT 10
    )
    SELECT 0 AS query_id, 10 AS k, CAST(count(*) AS BIGINT) AS n_hits
    FROM approx WHERE vec_id IN (SELECT vec_id FROM exact)
"""


# Binary (sign-bit) quantization family: signatures are pure int64
# shift/sum expressions both sides; the hamming ANN + near-dup + recall
# contracts brute-force their shortlists in DuckDB.
_BSIG = """
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 61),
                i -> CASE WHEN embedding[i] > 0
                     THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))
           AS BIGINT) AS bsig
    FROM embeddings
"""

SIMILARITY_ORACLES["emb_binarize"] = _BSIG

SIMILARITY_ORACLES["knn_hamming_vec0"] = f"""
    WITH s AS ({_BSIG}),
    q AS (SELECT bsig AS qsig FROM s WHERE vec_id = 0),
    short AS (
        SELECT s.vec_id, bit_count(xor(s.bsig, q.qsig)) AS hamming
        FROM s, q
        ORDER BY hamming, s.vec_id
        LIMIT 100
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(short.hamming AS INTEGER) AS hamming,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qvec), 6)
               AS cosine_sim
    FROM embeddings e JOIN short ON e.vec_id = short.vec_id, qv
    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qvec), 6)
             DESC, e.vec_id
    LIMIT 10
"""

SIMILARITY_ORACLES["knn_recall_hamming_vec0"] = f"""
    WITH approx AS (
        SELECT vec_id FROM ({SIMILARITY_ORACLES["knn_hamming_vec0"]})
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id = 0),
    exact AS (
        SELECT vec_id
        FROM embeddings, qv
        ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 6)
                 DESC, vec_id
        LIMIT 10
    )
    SELECT 0 AS query_id, 10 AS k, CAST(count(*) AS BIGINT) AS n_hits
    FROM approx WHERE vec_id IN (SELECT vec_id FROM exact)
"""

SIMILARITY_ORACLES["emb_near_dup_hamming"] = f"""
    WITH s AS ({_BSIG}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(bit_count(xor(sa.bsig, sb.bsig)) AS INTEGER) AS hamming,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
         JOIN s sa ON sa.vec_id = a.vec_id
         JOIN s sb ON sb.vec_id = b.vec_id
    WHERE bit_count(xor(sa.bsig, sb.bsig)) <= 16
      AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.2
"""

# Pigeonhole bucket-occupancy pre-flight at the emb_near_dup_hamming
# contract config: 17 chunks over 60 bits (the first 60%17=9 chunks are
# 4 bits wide, the rest 3), occupancy + exact candidate-pair counts.
SIMILARITY_ORACLES["hamming_bucket_stats"] = f"""
    WITH s AS ({_BSIG}),
    w AS (
        SELECT i AS chunk_idx,
               CASE WHEN i < 9 THEN 4 ELSE 3 END AS width,
               CASE WHEN i < 9 THEN i * 4 ELSE 36 + (i - 9) * 3 END AS off
        FROM unnest(range(0, 17)) AS t(i)
    ),
    k AS (
        SELECT w.chunk_idx,
               (s.bsig >> w.off) & ((1::BIGINT << w.width) - 1) AS chunk_val
        FROM s, w
    ),
    occ AS (
        SELECT chunk_idx, chunk_val, count(*) AS n
        FROM k GROUP BY chunk_idx, chunk_val
    )
    SELECT CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidate_pairs
    FROM occ GROUP BY chunk_idx
"""

# Mean-recall pre-flight over the probe sample (0, 7, 23): UNION ALL
# of the single-probe audit, ordered by query_id.
SIMILARITY_ORACLES["knn_recall_hamming_multi"] = " UNION ALL ".join(
    f"""SELECT * FROM (\n    WITH s AS ({_BSIG}),\n    q AS (SELECT bsig AS qsig FROM s WHERE vec_id = {qid}),\n    short AS (\n        SELECT s.vec_id, bit_count(xor(s.bsig, q.qsig)) AS hamming\n        FROM s, q\n        ORDER BY hamming, s.vec_id\n        LIMIT 100\n    ),\n    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec\n           FROM embeddings WHERE vec_id = {qid}),\n    approx AS (\n        SELECT e.vec_id\n        FROM embeddings e JOIN short ON e.vec_id = short.vec_id, qv\n        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qvec), 6)\n                 DESC, e.vec_id\n        LIMIT 10\n    ),\n    exact AS (\n        SELECT vec_id FROM embeddings, qv\n        ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 6)\n                 DESC, vec_id\n        LIMIT 10\n    )\n    SELECT {qid} AS query_id, 10 AS k, CAST(count(*) AS BIGINT) AS n_hits\n    FROM approx WHERE vec_id IN (SELECT vec_id FROM exact)\n)"""
    for qid in (0, 7, 23)
) + " ORDER BY query_id"

SIMILARITY_ORACLES["knn_hamming_batch"] = f"""
    WITH s AS ({_BSIG}),
    q AS (SELECT vec_id AS query_id, bsig AS qsig FROM s WHERE vec_id IN (0, 7, 23)),
    scored AS (
        SELECT q.query_id, s.vec_id,
               bit_count(xor(s.bsig, q.qsig)) AS hamming,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY bit_count(xor(s.bsig, q.qsig)), s.vec_id)
                   AS sr
        FROM s, q
    ),
    short AS (SELECT query_id, vec_id, hamming FROM scored WHERE sr <= 100),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id IN (0, 7, 23)),
    rescored AS (
        SELECT short.query_id, e.vec_id,
               CAST(short.hamming AS INTEGER) AS hamming,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qvec), 6)
                   AS cosine_sim
        FROM embeddings e
             JOIN short ON e.vec_id = short.vec_id
             JOIN qv ON qv.query_id = short.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, hamming, cosine_sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC, vec_id)
                    AS INTEGER) AS rank
        FROM rescored
    )
    SELECT query_id, vec_id, hamming, cosine_sim, rank FROM ranked WHERE rank <= 10
"""

# Exact integer cell centroids: java-round of per-(label, dim) means of
# the scaled ints — the pq_label_codebooks convention over IVF cells.
SIMILARITY_ORACLES["ivf_centroids_int"] = """
    WITH ex AS (
        SELECT label, i - 1 AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(floor((2 * sum(x) + count(*)) / (2 * count(*))) AS BIGINT) AS cm
    FROM ex GROUP BY label, pos
"""

# BPE first-round pair statistic (operators/tokenizer.py
# bpe_pair_counts): weighted adjacent initial-symbol pairs over the
# top-V word table — one merge round's argmax statistic as a
# first-class audit (full training is oracled below).
TEXT_ORACLES["bpe_pair_counts"] = f"""
    WITH w AS (
        SELECT word, CAST(count(*) AS BIGINT) AS wn
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        GROUP BY word ORDER BY wn DESC, word LIMIT 1000
    ),
    s AS (SELECT wn, list_append(string_split(word, ''), '</w>') AS syms FROM w),
    p AS (
        SELECT wn, syms[i] AS sym_a, syms[i + 1] AS sym_b
        FROM s, unnest(range(1, len(syms))) AS u(i)
    )
    SELECT sym_a, sym_b, CAST(sum(wn) AS BIGINT) AS n
    FROM p GROUP BY sym_a, sym_b
    ORDER BY n DESC, sym_a, sym_b LIMIT 20
"""


def _bpe_cte(top_words: int, n_merges: int) -> str:
    """The FULL BPE train+apply chain in DuckDB SQL (r7 verdict item 4:
    these contracts were rows-only; the bounded merge loop IS
    SQL-expressible, so now they hash-check).

    Training is a recursive CTE whose single-row state carries every
    top-V word's symbol sequence; each step's merge is the argmax pair
    by (summed count DESC, sym_a, sym_b) — a correlated scalar subquery
    unnesting the state — matching tokenizer.train_bpe_reference's
    ``min((-count, pair))`` exactly (two-column order == Python tuple
    compare; stop when the best count < 2 or after n_merges rounds).
    Applying a merge is leftmost-non-overlapping replace on a
    chr(31)-wrapped rendering of the sequence (each symbol wrapped in
    its own separators, so adjacent matches never share a boundary
    character) — provably the same rewrite as the reference's in-round
    scan loop.

    Encoding then folds the learned merges over every DISTINCT corpus
    word with a second recursive CTE (one replace round per merge
    rank). The Spark side encodes with the GPT-2 merge-RANK walk
    (tokenizer.bpe_apply); rank-walk == in-rank-order sequential
    replace for any trained merge list, because a merge's output symbol
    can only appear in higher-ranked merges — so agreement here is a
    genuine cross-algorithm differential check, not a replay. Merge
    pairs travel as 'a<chr30>b' strings and symbols are wrapped in
    chr(31): a corpus word CONTAINING chr(30)/chr(31) would corrupt
    the encoding (neither tokenizer splits the C1 separators — the
    ASCII whitespace class is [ \\t\\n\\x0b\\x0c\\x0d]), so texts with
    raw 0x1E/0x1F bytes are out of this contract's domain — strip them
    in normalize_text first (the driver and fuzz corpora contain
    none). MATERIALIZED CTEs matter: DuckDB re-executes
    plain CTEs per reference, and ``mt`` is referenced in every
    encoding round (60 s -> 1.5 s at sf0.01)."""
    return rf"""
    wc AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT {top_words}
    ),
    init AS (
        SELECT 0 AS it,
               list(struct_pack(
                   syms := list_append(string_split(word, ''), '</w>'),
                   n := n)) AS seqs,
               CAST([] AS VARCHAR[]) AS merges
        FROM wc
    ),
    trainer(it, seqs, merges) AS (
        SELECT * FROM init
        UNION ALL
        SELECT it + 1,
               list_transform(seqs, s -> struct_pack(
                   syms := string_split(
                       substr(
                           replace(
                               chr(31) || array_to_string(s.syms, chr(31) || chr(31)) || chr(31),
                               chr(31) || split_part(p, chr(30), 1) || chr(31)
                                   || chr(31) || split_part(p, chr(30), 2) || chr(31),
                               chr(31) || split_part(p, chr(30), 1)
                                   || split_part(p, chr(30), 2) || chr(31)
                           ),
                           2,
                           length(replace(
                               chr(31) || array_to_string(s.syms, chr(31) || chr(31)) || chr(31),
                               chr(31) || split_part(p, chr(30), 1) || chr(31)
                                   || chr(31) || split_part(p, chr(30), 2) || chr(31),
                               chr(31) || split_part(p, chr(30), 1)
                                   || split_part(p, chr(30), 2) || chr(31)
                           )) - 2
                       ),
                       chr(31) || chr(31)
                   ),
                   n := s.n)),
               list_append(merges, p)
        FROM (
            SELECT t.*,
                   (SELECT pa || chr(30) || pb
                    FROM (SELECT z.s.syms[i] AS pa, z.s.syms[i + 1] AS pb,
                                 z.s.n AS wn
                          FROM unnest(t.seqs) AS z(s),
                               unnest(range(1, len(z.s.syms))) AS r(i))
                    GROUP BY pa, pb HAVING sum(wn) >= 2
                    ORDER BY sum(wn) DESC, pa, pb LIMIT 1) AS p
            FROM trainer AS t
            WHERE t.it < {n_merges}
        )
        WHERE p IS NOT NULL
    ),
    mt AS MATERIALIZED (SELECT merges FROM trainer ORDER BY it DESC LIMIT 1),
    docw AS MATERIALIZED (
        SELECT doc_id, unnest({_TOKS}) AS word FROM documents
    ),
    vocab AS (SELECT DISTINCT word FROM docw),
    enc(word, wstr, mi) AS (
        SELECT word,
               chr(31) || array_to_string(
                   list_append(string_split(word, ''), '</w>'),
                   chr(31) || chr(31)
               ) || chr(31),
               0
        FROM vocab
        UNION ALL
        SELECT word,
               replace(wstr,
                       chr(31) || split_part(mt.merges[mi + 1], chr(30), 1) || chr(31)
                           || chr(31) || split_part(mt.merges[mi + 1], chr(30), 2) || chr(31),
                       chr(31) || split_part(mt.merges[mi + 1], chr(30), 1)
                           || split_part(mt.merges[mi + 1], chr(30), 2) || chr(31)),
               mi + 1
        FROM enc, mt
        WHERE mi < len(mt.merges)
    ),
    encoded AS MATERIALIZED (
        SELECT word,
               string_split(substr(wstr, 2, length(wstr) - 2),
                            chr(31) || chr(31)) AS pieces
        FROM enc, mt WHERE mi = len(mt.merges)
    )"""


# Per-doc token budget of the trained tokenizer: word/piece counts +
# fertility; docs with no words (NULL/empty text) report 0/0/0.0.
TEXT_ORACLES["bpe_token_stats"] = f"""
    WITH RECURSIVE {_bpe_cte(1000, 50)},
    perdoc AS (
        SELECT doc_id, count(*) AS nw, sum(len(pieces)) AS np
        FROM docw JOIN encoded USING (word) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.nw, 0) AS BIGINT) AS n_words,
           CAST(coalesce(p.np, 0) AS BIGINT) AS n_pieces,
           CAST(coalesce(p.np, 0) AS DOUBLE)
               / greatest(coalesce(p.nw, 0), 1) AS fertility
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""

# Corpus piece-frequency top-30 of the trained tokenizer.
TEXT_ORACLES["bpe_piece_counts"] = f"""
    WITH RECURSIVE {_bpe_cte(1000, 50)}
    SELECT piece, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(e.pieces) AS piece FROM docw JOIN encoded e USING (word))
    GROUP BY piece ORDER BY n DESC, piece LIMIT 30
"""

# Stratified doc-length histogram: shared 64-char grid per source.
TEXT_ORACLES["length_histogram_by_source"] = """
    SELECT source,
           ((c - ((c % 6400 + 6400) % 6400)) // 6400) AS bucket,
           CAST(count(*) AS BIGINT) AS counter
    FROM (SELECT source,
                 CAST(floor(length(text) * 100 + 0.5) AS BIGINT) AS c
          FROM documents WHERE text IS NOT NULL)
    GROUP BY 1, 2
"""

# Per-stratum quantiles off the stratified histogram (upper-edge rule
# per source).
TEXT_ORACLES["length_quantiles_by_source"] = f"""
    WITH h AS ({TEXT_ORACLES["length_histogram_by_source"]}),
    n AS (SELECT source, sum(counter) AS n FROM h GROUP BY source),
    c AS (SELECT source, bucket,
                 sum(counter) OVER (PARTITION BY source ORDER BY bucket) AS cum
          FROM h),
    q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    SELECT c.source, q, CAST((min(bucket) + 1) * 6400 AS DOUBLE) / 100.0 AS est
    FROM c JOIN n ON c.source = n.source, q
    WHERE cum >= greatest(1, ceil(q * n.n))
    GROUP BY c.source, q
"""

# PMI collocations over adjacent bigrams: rounded-pmi ranking with
# (tok_a, tok_b) tiebreak so the top-k cut is engine-reproducible.
TEXT_ORACLES["collocations"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    big_all AS (
        SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b,
               CAST(count(*) AS BIGINT) AS n_pair
        FROM t, unnest(range(1, len(toks))) AS u(i)
        GROUP BY 1, 2
    ),
    big AS (SELECT * FROM big_all WHERE n_pair >= 5),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
    ),
    tot AS (SELECT sum(n_tok) AS t FROM uni),
    -- p(ab) normalizes over ALL bigram occurrences (Church & Hanks),
    -- not just the pairs that survived min_count (r7 self-review fix)
    totp AS (SELECT sum(n_pair) AS tp FROM big_all)
    SELECT tok_a, tok_b, n_pair,
           round(ln((n_pair / tp) / ((a.n_tok / t) * (b.n_tok / t))), 6) AS pmi
    FROM big
         JOIN uni a ON a.tok = big.tok_a
         JOIN uni b ON b.tok = big.tok_b, tot, totp
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 20
"""

# Flesch reading ease with the same cheap heuristics as the operator:
# [.!?]+ sentence runs (min 1), per-word [aeiouy]+ syllable groups
# (min 1 per word).
TEXT_ORACLES["readability"] = f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
                   AS n_sentences,
               CASE WHEN toks IS NULL THEN NULL
                    ELSE CAST(coalesce(list_sum(list_transform(toks,
                         w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0)
                    AS BIGINT) END AS n_syllables
        FROM t
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (greatest(n_words, 1) / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (n_syllables
                           / CAST(greatest(n_words, 1) AS DOUBLE)), 6) AS flesch
    FROM s
"""

# Frequency-threshold boilerplate stripping (text.py remove_boilerplate):
# a non-blank line in >= 2 distinct docs is removed everywhere; every doc
# keeps a row (string_agg over the CASE skips removed/blank lines, the
# 1-row-per-doc GROUP BY keeps fully-stripped docs with '' text).
# NULL text coalesces to '' before the split — string_split(NULL) is
# NULL and the unnest would emit no row, dropping the doc (round-7
# advice fix, mirrored in the operator).
TEXT_ORACLES["remove_boilerplate"] = """
    WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
               FROM documents),
    l AS (
        SELECT doc_id, i AS pos, ls[i] AS ln
        FROM t, unnest(range(1, len(ls) + 1)) AS u(i)
    ),
    b AS (
        SELECT ln FROM l WHERE trim(ln, ' ') != ''
        GROUP BY ln HAVING count(DISTINCT doc_id) >= 2
    ),
    f AS (
        SELECT doc_id, pos, ln,
               trim(ln, ' ') != '' AND ln NOT IN (SELECT ln FROM b) AS kept,
               trim(ln, ' ') != '' AND ln IN (SELECT ln FROM b) AS removed
        FROM l
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN kept THEN ln END, chr(10) ORDER BY pos), '') AS text,
           CAST(coalesce(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(CASE WHEN removed THEN 1 END), 0) AS BIGINT) AS n_removed
    FROM f
    GROUP BY doc_id
"""

# Mergeable fixed-bin histogram sketch + quantile read-off
# (operators/profiling.py value_histogram / histogram_quantiles).
# Bucketing is FLOOR division in int64: DuckDB's `//` truncates toward
# zero on integers (-7//2 = -3, verified), so the non-negative-remainder
# form mirrors Spark's pmod+div exactly for negative cents too.
ANALYTICS_ORACLES["price_histogram"] = """
    SELECT ((c - ((c % 1000000 + 1000000) % 1000000)) // 1000000) AS bucket,
           CAST(count(*) AS BIGINT) AS counter
    FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders WHERE o_totalprice IS NOT NULL)
    GROUP BY 1
"""

ANALYTICS_ORACLES["price_quantiles_hist"] = f"""
    WITH h AS ({ANALYTICS_ORACLES["price_histogram"]}),
    n AS (SELECT sum(counter) AS n FROM h),
    c AS (SELECT bucket, sum(counter) OVER (ORDER BY bucket) AS cum FROM h),
    q AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
    SELECT q, CAST((min(bucket) + 1) * 1000000 AS DOUBLE) / 100.0 AS est
    FROM c, n, q
    WHERE cum >= greatest(1, ceil(q * n))
    GROUP BY q
"""

# Bottom-k rank sketch (profiling.py rank_sketch): deterministic
# KMV-family quantile sketch for unbounded ranges — md5 hash selection
# reproduces exactly in DuckDB, so unlike KLL/GK the sketch itself is
# hash-checked. Sample = k hash-smallest (h, value) rows + one exact
# count row (NULL-h sentinel).
ANALYTICS_ORACLES["price_rank_sketch"] = """
    WITH v AS (
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h,
               CAST(o_totalprice AS DOUBLE) AS value
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    s AS (SELECT h, value, CAST(NULL AS BIGINT) AS n
          FROM v ORDER BY h, value LIMIT 256),
    c AS (SELECT CAST(NULL AS BIGINT) AS h, CAST(NULL AS DOUBLE) AS value,
                 CAST(count(*) AS BIGINT) AS n
          FROM v)
    SELECT * FROM s UNION ALL SELECT * FROM c
"""

ANALYTICS_ORACLES["price_rank_quantiles"] = """
    WITH v AS (
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h,
               CAST(o_totalprice AS DOUBLE) AS value
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    s AS (SELECT h, value FROM v ORDER BY h, value LIMIT 256),
    r AS (SELECT value, h, row_number() OVER (ORDER BY value, h) AS rn FROM s),
    kq AS (SELECT count(*) AS kk FROM s),
    q AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
    SELECT q, min(value) AS est
    FROM r, kq, q
    WHERE rn >= least(kk, greatest(1, ceil(q * kk)))
    GROUP BY q
"""

# Stratified rank sketch (profiling.py rank_sketch_grouped): the
# per-group twin of price_rank_sketch — bottom-k md5-selected
# (h, value) rows PER SOURCE plus one per-source exact-count row.
TEXT_ORACLES["length_rank_sketch_by_source"] = """
    WITH v AS (
        SELECT source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h,
               CAST(length(text) AS DOUBLE) AS value
        FROM documents
        WHERE length(text) IS NOT NULL AND doc_id IS NOT NULL
    ),
    r AS (SELECT source, h, value,
                 row_number() OVER (PARTITION BY source ORDER BY h, value)
                     AS rn
          FROM v),
    s AS (SELECT source, h, value, CAST(NULL AS BIGINT) AS n
          FROM r WHERE rn <= 16),
    c AS (SELECT source, CAST(NULL AS BIGINT) AS h,
                 CAST(NULL AS DOUBLE) AS value,
                 CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY source)
    SELECT * FROM s UNION ALL SELECT * FROM c
"""

TEXT_ORACLES["length_rank_quantiles_by_source"] = """
    WITH v AS (
        SELECT source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h,
               CAST(length(text) AS DOUBLE) AS value
        FROM documents
        WHERE length(text) IS NOT NULL AND doc_id IS NOT NULL
    ),
    b AS (SELECT source, h, value,
                 row_number() OVER (PARTITION BY source ORDER BY h, value)
                     AS rn
          FROM v),
    s AS (SELECT source, h, value FROM b WHERE rn <= 16),
    r AS (SELECT source, value, h,
                 row_number() OVER (PARTITION BY source ORDER BY value, h)
                     AS vr
          FROM s),
    kq AS (SELECT source, count(*) AS kk FROM s GROUP BY source),
    q AS (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q)
    SELECT r.source, q, min(value) AS est
    FROM r JOIN kq ON r.source = kq.source, q
    WHERE vr >= least(kk, greatest(1, ceil(q * kk)))
    GROUP BY r.source, q
"""

# knn_auto (similarity.py): the production ANN chooser's dispatch
# decision, differentially checked — the twin composes the ALREADY
# ORACLE-CHECKED audit and top-k queries of the contract ladder
# (single-table LSH, then binary hamming) as CTEs, derives the route
# with the same >= ceil(0.8*k) rule, and selects the routed path's
# top-k ids. Spark picks the route driver-side from 1-row audits;
# DuckDB derives it in SQL — agreement checks the dispatch itself.
SIMILARITY_ORACLES["knn_auto_vec0"] = f"""
    WITH s_audit AS ({SIMILARITY_ORACLES["knn_recall_vec0"]}),
    h_audit AS ({SIMILARITY_ORACLES["knn_recall_hamming_vec0"]}),
    pick AS (SELECT CASE
        WHEN (SELECT n_hits FROM s_audit) >= 8 THEN 'single'
        WHEN (SELECT n_hits FROM h_audit) >= 8 THEN 'hamming'
        ELSE 'exact' END AS route),
    single_k AS ({SIMILARITY_ORACLES["knn_lsh_vec0"]}),
    ham_k AS ({SIMILARITY_ORACLES["knn_hamming_vec0"]}),
    exact_k AS ({SIMILARITY_ORACLES["knn_vec0"]})
    SELECT route, vec_id FROM single_k, pick WHERE route = 'single'
    UNION ALL
    SELECT route, vec_id FROM ham_k, pick WHERE route = 'hamming'
    UNION ALL
    SELECT route, vec_id FROM exact_k, pick WHERE route = 'exact'
"""

# KMV (k-minimum-values) distinct estimator (profiling.py
# distinct_kmv): the oracle-checked companion to the rows-only HLL++
# contract. Same md5->int64 mapping as the rank sketch; the estimate
# read-off (k-1)*2^60/h_k is IEEE double arithmetic on both engines
# ((k-1)*2^60 is exactly representable — k-1 carries the only
# significant bits), so even the ESTIMATE branch hash-matches.
ANALYTICS_ORACLES["users_kmv_by_type"] = """
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h),
    b AS (SELECT event_type, h FROM r WHERE rn <= 64),
    a AS (SELECT event_type, count(*) AS kk, max(h) AS hk
          FROM b GROUP BY event_type)
    SELECT event_type,
           CAST(CASE WHEN kk < 64 THEN kk
                ELSE floor(63 * 1152921504606846976.0 / hk) END
                AS BIGINT) AS n_distinct_est,
           CAST(kk AS BIGINT) AS sample_k
    FROM a
"""

# KMV set-overlap twin of corpus_overlap (profiling.py
# corpus_overlap_kmv), same md5-bucket corpus split but on 2-gram
# shingles (916 distinct vs the 31-word vocabulary — the k=256
# estimation branch fires at every scale): bottom-256 shingle hashes
# per side, bottom-256 of their union, Venn read-off. The
# union-sample membership flags are exact (bottom-k(A∪B) ⊆
# bottom-k(A) ∪ bottom-k(B) — see the operator docstring), so the
# whole 1-row estimate is deterministic.
# Join pre-flight audit (profiling.py join_size_audit): exact inner
# equi-join cardinality + hot-key share from per-key count profiles.
# NULL keys never equi-join, so they are excluded from the key figures
# but counted in n_rows_*. top_key tie-break mirrors Spark's
# max(struct(c, k)): largest (contribution, key-string) pair.
TPCH_EXTRA_ORACLES["orders_lineitem_join_audit"] = """
    WITH pa AS (SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS ca
                FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
    pb AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS cb
           FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
    contrib AS (SELECT pa.k, CAST(ca * cb AS BIGINT) AS c
                FROM pa JOIN pb ON pa.k = pb.k),
    joined AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS join_rows,
                      CAST(count(*) AS BIGINT) AS n_shared_keys
               FROM contrib),
    top AS (SELECT c AS top_c, k AS top_k FROM contrib
            ORDER BY c DESC, k DESC LIMIT 1),
    ta AS (SELECT CAST(count(*) AS BIGINT) AS n_rows_a,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys_a
           FROM orders),
    tb AS (SELECT CAST(count(*) AS BIGINT) AS n_rows_b,
                  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys_b
           FROM lineitem)
    SELECT n_rows_a, n_rows_b, n_keys_a, n_keys_b, n_shared_keys,
           join_rows,
           CASE WHEN join_rows > 0 THEN (SELECT top_k FROM top) END
               AS top_key,
           CASE WHEN join_rows > 0
                THEN CAST((SELECT top_c FROM top) AS DOUBLE)
                     / CAST(join_rows AS DOUBLE)
                ELSE 0.0 END AS top_key_share
    FROM ta, tb, joined
"""

# Greedy k-center traversal (similarity.py kcenter_select): r7 verdict
# item 4 follow-through — the bounded sequential argmax is a recursive
# CTE whose one-row state carries the picked centers (the BPE
# recursive-trainer pattern); each round's farthest point is a
# correlated scalar subquery ranking on the ROUNDED min-squared-
# distance (the r8 rounded-rank policy), id tiebreak, seed = min id.
def _kc_sqd(alias: str) -> str:
    """Squared L2 between ``alias.v`` and a picked struct's ``p.v`` —
    shared by every k-center recursive-CTE twin."""
    return (
        f"list_sum(list_transform(list_zip({alias}.v, p.v), "
        "z -> (z[1] - z[2]) * (z[1] - z[2])))"
    )


_KC_SQD = _kc_sqd("e")
SIMILARITY_ORACLES["emb_kcenter"] = f"""
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sel(r, picked) AS (
        SELECT 1,
               (SELECT list(struct_pack(r := 1, id := vec_id,
                                        d := CAST(0.0 AS DOUBLE), v := v))
                FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1))
        UNION ALL
        SELECT r + 1, list_append(picked, pick)
        FROM (
            SELECT s.r, s.picked,
                   (SELECT struct_pack(
                        r := s.r + 1,
                        id := e.vec_id,
                        d := round(sqrt(list_min(list_transform(s.picked,
                            p -> {_KC_SQD}))), 6),
                        v := e.v)
                    FROM e
                    WHERE NOT list_contains(
                        list_transform(s.picked, p -> p.id), e.vec_id)
                    ORDER BY round(list_min(list_transform(s.picked,
                                 p -> {_KC_SQD})), 6) DESC,
                             e.vec_id
                    LIMIT 1) AS pick
            FROM sel AS s
            WHERE s.r < 8
        )
        WHERE pick IS NOT NULL
    )
    SELECT CAST(p.r AS INTEGER) AS rank, p.id AS vec_id, p.d AS center_dist
    FROM (SELECT picked FROM sel ORDER BY r DESC LIMIT 1),
         unnest(picked) AS u(p)
"""

# Two-stage scalable k-center (similarity.py kcenter_select_scalable,
# r8 verdict item 4): replay BOTH stages — the per-block greedy
# traversals (one recursive CTE whose state is one row PER BLOCK, each
# carrying its picked list; block = md5-prefix of the id mod 4, the
# engine's hash) and the final exact traversal over the pooled
# candidates (the emb_kcenter CTE, FROM the pool). Every argmax ranks
# on the rounded-6dp squared distance with min-id tiebreak, so the
# cross-engine check covers the block assignment, both traversal
# stages, and the pool handoff.
SIMILARITY_ORACLES["emb_kcenter_scalable"] = f"""
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))
                    AS INT) % 4 AS blk
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    bsel(blk, r, picked) AS (
        SELECT b.blk, 1,
               (SELECT list(struct_pack(id := s.vec_id, v := s.v))
                FROM (SELECT vec_id, v FROM e
                      WHERE e.blk = b.blk ORDER BY vec_id LIMIT 1) s)
        FROM (SELECT DISTINCT blk FROM e) b
        UNION ALL
        SELECT blk, r + 1, list_append(picked, pick)
        FROM (
            SELECT s.blk, s.r, s.picked,
                   (SELECT struct_pack(id := e2.vec_id, v := e2.v)
                    FROM e e2
                    WHERE e2.blk = s.blk AND NOT list_contains(
                        list_transform(s.picked, p -> p.id), e2.vec_id)
                    ORDER BY round(list_min(list_transform(s.picked,
                                 p -> {_kc_sqd("e2")})), 6) DESC,
                             e2.vec_id
                    LIMIT 1) AS pick
            FROM bsel AS s
            WHERE s.r < 8
        )
        WHERE pick IS NOT NULL
    ),
    pool AS MATERIALIZED (
        SELECT p.id AS vec_id, p.v AS v
        FROM (SELECT blk, picked,
                     row_number() OVER (PARTITION BY blk ORDER BY r DESC)
                         AS rn
              FROM bsel) b,
             unnest(picked) AS u(p)
        WHERE rn = 1
    ),
    sel(r, picked) AS (
        SELECT 1,
               (SELECT list(struct_pack(r := 1, id := vec_id,
                                        d := CAST(0.0 AS DOUBLE), v := v))
                FROM (SELECT vec_id, v FROM pool ORDER BY vec_id LIMIT 1))
        UNION ALL
        SELECT r + 1, list_append(picked, pick)
        FROM (
            SELECT s.r, s.picked,
                   (SELECT struct_pack(
                        r := s.r + 1,
                        id := e.vec_id,
                        d := round(sqrt(list_min(list_transform(s.picked,
                            p -> {_KC_SQD}))), 6),
                        v := e.v)
                    FROM pool e
                    WHERE NOT list_contains(
                        list_transform(s.picked, p -> p.id), e.vec_id)
                    ORDER BY round(list_min(list_transform(s.picked,
                                 p -> {_KC_SQD})), 6) DESC,
                             e.vec_id
                    LIMIT 1) AS pick
            FROM sel AS s
            WHERE s.r < 8
        )
        WHERE pick IS NOT NULL
    )
    SELECT CAST(p.r AS INTEGER) AS rank, p.id AS vec_id, p.d AS center_dist
    FROM (SELECT picked FROM sel ORDER BY r DESC LIMIT 1),
         unnest(picked) AS u(p)
"""

# auto_join route derivation (profiling.py auto_join): the router's
# CASE over the same audit aggregates, first match wins —
# broadcast_b (n_rows_b fits) / broadcast_a (inner, n_rows_a fits) /
# salted (top_key_share >= 0.5 AND n_rows_b * salt_buckets <= n_rows_a
# — the r9 replication-affordability gate) / shuffle. The route column
# makes the dispatch decision itself part of the hash check; the join
# output is route-independent by construction.
TPCH_EXTRA_ORACLES["orders_customer_auto_join"] = """
    WITH pa AS (SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS ca
                FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
    pb AS (SELECT CAST(c_custkey AS VARCHAR) AS k, count(*) AS cb
           FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1),
    contrib AS (SELECT pa.k, CAST(ca * cb AS BIGINT) AS c
                FROM pa JOIN pb ON pa.k = pb.k),
    joined AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS join_rows
               FROM contrib),
    top AS (SELECT c AS top_c FROM contrib ORDER BY c DESC, k DESC LIMIT 1),
    audit AS (SELECT (SELECT count(*) FROM orders) AS n_rows_a,
                     (SELECT count(*) FROM customer) AS n_rows_b,
                     (SELECT join_rows FROM joined) AS join_rows),
    route AS (SELECT CASE
                  WHEN n_rows_b <= 1000000 THEN 'broadcast_b'
                  WHEN n_rows_a <= 1000000 THEN 'broadcast_a'
                  WHEN join_rows > 0
                       AND CAST((SELECT top_c FROM top) AS DOUBLE)
                           / CAST(join_rows AS DOUBLE) >= 0.5
                       AND n_rows_b * 8 <= n_rows_a THEN 'salted'
                  ELSE 'shuffle' END AS route
              FROM audit)
    SELECT route, o_custkey, o_orderkey, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey, route
"""

TEXT_ORACLES["vocab_overlap_kmv"] = f"""
    WITH {_shingle_cte(2)},
    ga AS (SELECT DISTINCT
               CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
           FROM (SELECT unnest(shingles) AS g FROM sh
                 WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80')),
    gb AS (SELECT DISTINCT
               CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
           FROM (SELECT unnest(shingles) AS g FROM sh
                 WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '80')),
    sa AS (SELECT h FROM ga ORDER BY h LIMIT 256),
    sb AS (SELECT h FROM gb ORDER BY h LIMIT 256),
    u AS (SELECT COALESCE(sa.h, sb.h) AS h,
                 sa.h IS NOT NULL AS in_a, sb.h IS NOT NULL AS in_b
          FROM sa FULL OUTER JOIN sb ON sa.h = sb.h),
    s AS (SELECT * FROM u ORDER BY h LIMIT 256),
    agg AS (SELECT count(*) AS kk, max(h) AS hk,
                   COALESCE(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 0)
                       AS n_both
            FROM s),
    est AS (SELECT kk, n_both,
                   CAST(CASE WHEN kk < 256 THEN kk
                        ELSE floor(255 * 1152921504606846976.0 / hk) END
                        AS BIGINT) AS n_union_est
            FROM agg)
    SELECT n_union_est,
           CAST(floor(CASE WHEN kk = 0 THEN 0.0
                      ELSE CAST(n_both AS DOUBLE) * CAST(n_union_est AS DOUBLE)
                           / CAST(kk AS DOUBLE) END) AS BIGINT) AS n_shared_est,
           CASE WHEN kk = 0 THEN 1.0
                ELSE CAST(n_both AS DOUBLE) / CAST(kk AS DOUBLE)
           END AS jaccard_est,
           CAST(kk AS BIGINT) AS sample_k
    FROM est
"""

# Stop-shingle cap sizing (dedup.py max_df_for_budget): the largest
# df cap whose surviving posting groups emit <= the pair budget —
# cumulative sum over the posting-length histogram, NULL-block groups
# priced 0 (the r9 posting_pair_stats convention). budget=500 pinned
# in the contract. The cap is exact across histogram gaps (r10 advice
# fix): the boundary row reports lead(cnt)-1 — the largest cap that
# admits the same groups — falling back to the max observed length at
# the histogram's top.
DEDUP_ORACLES["max_df_for_budget"] = f"""
    WITH {_shingle_cte(1)},
    ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
    occ AS (SELECT s, source, count(*) AS cnt FROM ex GROUP BY s, source),
    per AS (SELECT cnt,
                   CAST(COALESCE(sum(CASE WHEN source IS NOT NULL
                                          THEN cnt * (cnt - 1) // 2
                                          ELSE 0 END), 0) AS BIGINT) AS pairs
            FROM occ GROUP BY cnt),
    cum AS (SELECT cnt, sum(pairs) OVER (ORDER BY cnt) AS cum,
                   COALESCE(lead(cnt) OVER (ORDER BY cnt) - 1, cnt) AS cap
            FROM per)
    SELECT CAST(COALESCE(max(CASE WHEN cum <= 500 THEN cap END), 0)
                AS BIGINT) AS max_df,
           CAST(COALESCE(max(CASE WHEN cum <= 500 THEN cum END), 0)
                AS BIGINT) AS n_candidate_pairs
    FROM cum
"""

# r10: the banded-join pricing audit the streaming split assigner
# consults per micro-batch, as a batch contract — budget 400 pinned
# (scale-sensitive on purpose: fits at sf0.001, prices out at sf0.01).
DEDUP_ORACLES["stop_band_cap"] = _stop_band_cap_sql(400)

# Incremental leakage-safe splits (sampling.py
# leakage_safe_splits_incremental): existing corpus (md5 < '80') holds
# the legacy plain-hash assignment; new docs adopt their cluster's
# min-id existing member's split (arg_min ≡ Spark min(struct(id,
# split))), flag cross-split merges, and hash-assign fresh clusters on
# COALESCE(cluster_id, doc_id) — the assign_splits CASE.
SAMPLING_ORACLES["leakage_safe_splits_incr"] = f"""
    WITH RECURSIVE
    p AS MATERIALIZED (SELECT id_a, id_b FROM ({_minhash_lsh_sql(0.5)})),
    edges AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
    ),
    cc AS (SELECT node, CAST(min(label) AS BIGINT) AS cluster_id
           FROM reach GROUP BY node),
    exs AS (
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
                        THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                        THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
    ),
    adopt AS (
        SELECT cc.cluster_id,
               arg_min(e.split, e.doc_id) AS a_split,
               count(DISTINCT e.split) > 1 AS conflict
        FROM exs e JOIN cc ON cc.node = e.doc_id
        GROUP BY cc.cluster_id
    ),
    keyed AS (
        SELECT n.doc_id, a.a_split, a.conflict,
               COALESCE(cc.cluster_id, n.doc_id) AS hk
        FROM (SELECT doc_id FROM documents
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '80') n
        LEFT JOIN cc ON cc.node = n.doc_id
        LEFT JOIN adopt a ON a.cluster_id = cc.cluster_id
    )
    SELECT doc_id,
           COALESCE(a_split,
               CASE WHEN substr(md5(CAST(hk AS VARCHAR)), 1, 2) < '0d'
                        THEN 'test'
                    WHEN substr(md5(CAST(hk AS VARCHAR)), 1, 2) < '1a'
                        THEN 'val'
                    ELSE 'train' END) AS split,
           COALESCE(conflict, FALSE) AS leak_conflict
    FROM keyed
"""

# Per-group cap (sampling.py cap_per_group): winners by md5(id) rank
# with id tiebreak inside each source — the same deterministic order on
# both engines, so the kept SET (not just its size) hash-matches.
SAMPLING_ORACLES["cap_per_source"] = """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        FROM documents)
    WHERE r <= 30
"""

# Leakage-safe splits (sampling.py leakage_safe_splits): the full
# composition replayed — seed-42 md5_32 MinHash banding pairs (the
# dedup_minhash_lsh oracle, nested as a subquery), the recursive-CTE
# min-label fixpoint (the dedup_clusters pattern), then assign_splits'
# md5-bucket CASE applied to the cluster-or-self split key. Checks that
# every near-dup cluster lands in ONE split in BOTH engines.
SAMPLING_ORACLES["leakage_safe_splits_docs"] = f"""
    WITH RECURSIVE
    p AS MATERIALIZED (SELECT id_a, id_b FROM ({_minhash_lsh_sql(0.5)})),
    edges AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
    ),
    cc AS (SELECT node, CAST(min(label) AS BIGINT) AS cluster_id
           FROM reach GROUP BY node),
    keyed AS (
        SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS split_key
        FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    )
    SELECT doc_id, split_key,
           CASE WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < '0d'
                    THEN 'test'
                WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < '1a'
                    THEN 'val'
                ELSE 'train' END AS split
    FROM keyed
"""

# Quality-aware cluster survivorship (dedup.py keep_best_per_cluster):
# the full composition replayed — seed-42 md5_32 MinHash banding pairs
# (the dedup_minhash_lsh oracle, nested), the recursive-CTE min-label
# fixpoint (the dedup_clusters pattern), then an argmax winner per
# cluster by (quality DESC, doc_id ASC) — row_number here, max_by on a
# (quality, -id) struct on the Spark side: identical deterministic
# order. Singletons (no cluster row) keep themselves via the LEFT
# join's NULL.
DEDUP_ORACLES["dedup_keep_best"] = f"""
    WITH RECURSIVE
    p AS MATERIALIZED (SELECT id_a, id_b FROM ({_minhash_lsh_sql(0.5)})),
    edges AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT ed.dst, r.label FROM reach r JOIN edges ed ON r.node = ed.src
    ),
    cc AS (SELECT node, CAST(min(label) AS BIGINT) AS cluster_id
           FROM reach GROUP BY node),
    q AS MATERIALIZED ({TEXT_ORACLES["quality_score"]}),
    w AS (
        SELECT cc.cluster_id, q.doc_id,
               row_number() OVER (
                   PARTITION BY cc.cluster_id
                   ORDER BY q.quality DESC, q.doc_id) AS r
        FROM cc JOIN q ON q.doc_id = cc.node
    ),
    keep AS (SELECT cluster_id, doc_id AS keep_id FROM w WHERE r = 1)
    SELECT d.doc_id,
           COALESCE(cc.cluster_id, CAST(d.doc_id AS BIGINT)) AS cluster_id,
           q.quality,
           (cc.cluster_id IS NULL OR keep.keep_id = d.doc_id) AS kept
    FROM documents d
    LEFT JOIN cc ON cc.node = d.doc_id
    LEFT JOIN q ON q.doc_id = d.doc_id
    LEFT JOIN keep ON keep.cluster_id = cc.cluster_id
"""

ALL_ORACLES = {
    **PAYMENT_ORACLES,
    **ANALYTICS_ORACLES,
    **TPCH_EXTRA_ORACLES,
    **TEXT_ORACLES,
    **DEDUP_ORACLES,
    **SIMILARITY_ORACLES,
    **MULTIMODAL_ORACLES,
    **SAMPLING_ORACLES,
}
