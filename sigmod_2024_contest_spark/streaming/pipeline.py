"""Structured Streaming pipeline over the events stream table.

The reference is a one-shot batch engine (SURVEY §2.9: streaming
"entirely absent"), so this module is pure Spark-first surface: the
operators a continuous ingestion pipeline needs, written once against
the unbounded-table model so the SAME function body serves batch
DataFrames and streaming DataFrames (the core Structured Streaming
contract). Batch runs register in the query registry with DuckDB
oracles; streaming runs are exercised in tests via file-source →
memory-sink with watermarks.

Money-valued doubles are aggregated as integer cents so oracle
comparisons never hash floats.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)
WINDOW = "5 minutes"
SESSION_GAP = "5 minutes"
WATERMARK = "10 minutes"
TS_FMT = "yyyy-MM-dd HH:mm:ss"
_CENTS = "CAST(round(value * 100) AS BIGINT)"


def stream_events(spark: SparkSession, events_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of events parquet (the test
    stand-in for Kafka/Kinesis; swap the reader, keep the plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(events_dir)
    )


# ---------------------------------------------------------------------------
# Tumbling-window aggregation (watermark + windowed agg)
# ---------------------------------------------------------------------------


def windowed_event_counts(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """(win_start, event_type, n_events, sum_value_cents): tumbling
    window per event type. On a streaming input the watermark bounds
    state and admits ≤10 min late data; on a batch input the watermark
    is a no-op and the result is exact — one body, both worlds."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", WATERMARK)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr(_CENTS)).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("win_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value_cents").cast("long").alias("sum_value_cents"),
        )
    )


WINDOWED_COUNTS_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*)::BIGINT AS n_events,
       sum({_CENTS})::BIGINT AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Session windows (gap-based)
# ---------------------------------------------------------------------------


def sessionized(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """(user_id, sess_start, n_events, sum_value_cents): session
    windows per user — events closer than ``gap`` merge. Streaming uses
    Spark's native session_window state merging; the DuckDB oracle is
    the classic gaps-and-islands rewrite (lag → flag → running sum),
    which also documents the exact merge semantics: a gap ≥ the
    threshold starts a new session."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", WATERMARK)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr(_CENTS)).alias("sum_value_cents"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("sess_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value_cents").cast("long").alias("sum_value_cents"),
        )
    )


SESSIONIZED_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '{SESSION_GAP}' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
       count(*)::BIGINT AS n_events,
       sum({_CENTS})::BIGINT AS sum_value_cents
FROM sess GROUP BY user_id, sess_id
"""


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user running totals
# (applyInPandasWithState — the reference has no analogue; SURVEY §2.9)
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = "user_id long, n_events long, total_cents long"
_STATE_SCHEMA = "n long, cents long"


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Streaming: per-user lifetime totals maintained in keyed state,
    emitted every micro-batch (update mode). The custom-stateful-op
    pattern (applyInPandasWithState) for logic windows can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pd.Series(pdf["value"]).mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, RUNNING_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch semantics of user_totals_stateful's final state —
    what the stream converges to once all input is processed."""
    return events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.expr(_CENTS)).cast("long").alias("total_cents"),
    )


USER_TOTALS_SQL = f"""
SELECT user_id, count(*)::BIGINT AS n_events, sum({_CENTS})::BIGINT AS total_cents
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Stream-stream join: click → purchase attribution
# ---------------------------------------------------------------------------

ATTRIBUTION_WINDOW = "30 minutes"


def click_attribution(
    clicks_src: DataFrame, purchases_src: DataFrame, window: str = ATTRIBUTION_WINDOW
) -> DataFrame:
    """(purch_id, click_id, user_id, lag_us): every click by the same
    user within ``window`` before (or at) a purchase — the canonical
    stream-stream JOIN surface. On streaming inputs both sides carry
    watermarks and the event-time range condition bounds join state
    (Spark drops a buffered click once no future purchase can reach
    it); on batch inputs the same body is a plain range join. Lag is
    exact microseconds so both engines emit identical integers.

    At 100 TB the join state is what matters: per user only
    ``window``+watermark of clicks is ever buffered, independent of
    stream length — the state-bounded shape, not a growing cache."""
    c = clicks_src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases_src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purch_id"),
        F.col("ts").alias("purch_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", WATERMARK)
    if p.isStreaming:
        p = p.withWatermark("purch_ts", WATERMARK)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purch_ts"))
        & (F.col("click_ts") >= F.col("purch_ts") - F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond).select(
        "purch_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("purch_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


CLICK_ATTRIBUTION_SQL = f"""
SELECT p.event_id AS purch_id, c.event_id AS click_id, p.user_id,
       (epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS lag_us
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '{ATTRIBUTION_WINDOW}'
"""


# ---------------------------------------------------------------------------
# Streaming funnel — keyed state over ordered step timestamps
# ---------------------------------------------------------------------------

FUNNEL_STATE_CAP = 128
_FUNNEL_RESULT_SCHEMA = "user_id long, steps_completed long, completed boolean"
_FUNNEL_STATE_SCHEMA = "t1s array<long>, t2s array<long>, t3s array<long>"


def funnel_stateful(events: DataFrame, within_s: int | None = None) -> DataFrame:
    """Streaming twin of :func:`..operators.relational.event_funnel`:
    per-user strict-order funnel maintained in keyed state, emitted
    every micro-batch (update mode).

    State is the EARLIEST ``FUNNEL_STATE_CAP`` timestamps per step
    (ns, full Spark precision), not a monotone cursor — so the funnel
    resolve (first step-k strictly after step k-1) is recomputed
    exactly per emission and the result is ARRIVAL-ORDER INDEPENDENT:
    a late-arriving earlier view correctly revises t1 and everything
    downstream. Exact equality with the batch operator holds whenever
    no user exceeds the cap in any step (the cap bounds state at 3·cap
    longs per user; beyond it the earliest-kept prefix still resolves
    correctly unless the true tk is evicted). The window compare
    truncates to epoch ms exactly like the batch side's
    ``unix_millis``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.relational import FUNNEL_STEPS, FUNNEL_WITHIN_S

    win_ms = (FUNNEL_WITHIN_S if within_s is None else int(within_s)) * 1000
    steps = FUNNEL_STEPS

    def fn(key, pdfs, state):
        lists = [list(x) for x in state.get] if state.exists else [[], [], []]
        for pdf in pdfs:
            ns = pd.to_datetime(pdf["ts"]).astype("int64")
            for t, typ in zip(ns, pdf["event_type"]):
                for i, s in enumerate(steps):
                    if typ == s:
                        lists[i].append(int(t))
        lists = [sorted(set(l))[:FUNNEL_STATE_CAP] for l in lists]
        state.update(tuple(lists))
        t1 = lists[0][0] if lists[0] else None
        t2 = next((t for t in lists[1] if t > t1), None) if t1 is not None else None
        t3 = next((t for t in lists[2] if t > t2), None) if t2 is not None else None
        n_steps = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        completed = t3 is not None and (t3 // 1_000_000 - t1 // 1_000_000) <= win_ms
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "steps_completed": [n_steps],
                "completed": [bool(completed)],
            }
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            _FUNNEL_RESULT_SCHEMA,
            _FUNNEL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming deduplication (watermarked dropDuplicates)
# ---------------------------------------------------------------------------

# The dedup horizon must COVER the key's time span plus arrival slack:
# a daily key recurs for up to 24h of event time, so a 10-minute
# watermark would evict its state mid-day and re-emit the key. 48h =
# key span + a full day of late-arrival slack; streaming state holds
# only the distinct keys of the last 48 event-time hours.
DEDUP_WATERMARK = "48 hours"


def events_daily_dedup(events: DataFrame, watermark: str = DEDUP_WATERMARK) -> DataFrame:
    """(user_id, event_type, day): the first occurrence of each
    (user, type, day) key — idempotent-ingestion dedup, the canonical
    watermark + dropDuplicates pattern.

    One body, both worlds: on a batch input dropDuplicates is an exact
    DISTINCT (the key columns ARE the output, so which physical row
    survives is unobservable — that is what makes the op deterministic
    and oracle-hashable); on a streaming input the same key set goes
    through ``dropDuplicatesWithinWatermark`` — plain streaming
    dropDuplicates only evicts state when the event-time column is one
    of the dedup keys, which a day-granularity key is not, so the
    WithinWatermark variant is the bounded-state form: per-key state
    lives one watermark interval past the key's last event."""
    keyed = events.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "ts",
    )
    if keyed.isStreaming:
        dd = keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type", "day"]
        )
    else:
        dd = keyed.dropDuplicates(["user_id", "event_type", "day"])
    return dd.select("user_id", "event_type", "day")


EVENTS_DAILY_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day
FROM events
"""


# ---------------------------------------------------------------------------
# Streaming near-duplicate detection (stateful MinHash-LSH)
# ---------------------------------------------------------------------------

# Production bound on band-bucket state: a bucket holding more docs
# than this is a degenerate signature (near-identical boilerplate at
# corpus scale); later arrivals still pair against the retained
# prefix, mirroring the batch path's hot-shingle df cap. None = exact
# (the parity-test config).
NEAR_DUP_BUCKET_CAP = 256

_NEAR_DUP_OUT_SCHEMA = "d1 long, d2 long, jaccard_ppm long"
# per-bucket state: docs seen + their shingle-key sets, flattened
# (skeys of docs[i] = flat[offs[i]:offs[i+1]]; offs has len(docs)+1
# entries) — flat arrays avoid nested-array state encoders.
_NEAR_DUP_STATE_SCHEMA = (
    "docs array<long>, offs array<long>, flat array<long>, capped array<long>"
)


def stream_near_dup_pairs(
    docs: DataFrame,
    tau_ppm: int | None = None,
    bucket_cap: int | None = NEAR_DUP_BUCKET_CAP,
) -> DataFrame:
    """(d1, d2, jaccard_ppm): streaming twin of
    :func:`..operators.dedup.minhash_lsh_pairs` — near-duplicate PAIRS
    over a document stream, the streaming-ingest dedup a training-data
    pipeline runs before anything else touches a new crawl drop.

    Same candidate generator as batch (``_shingle_table`` minhashes →
    ``band_sigs`` — shared code, cannot drift), but the band-bucket
    "self-join" becomes KEYED STATE: each (band, sig) bucket remembers
    the docs it has seen (ids + exact shingle-key sets), and every new
    arrival verifies exact Jaccard against the bucket's residents —
    so a pair is emitted exactly once, by whichever band bucket and
    micro-batch sees its second member first, regardless of arrival
    order (the pair SET is arrival-order independent; ties inside one
    batch resolve by doc_id order). Duplicate emissions can only come
    from the same pair colliding in MULTIPLE bands — exactly the
    multiplicity the batch op removes with ``.distinct()``; consumers
    (and the parity test) distinct on (d1, d2) the same way.

    100 TB posture: state is per-bucket and bounded — bucket occupancy
    is the LSH collision count (uniform by construction, capped by
    ``bucket_cap`` against degenerate signatures), and each resident
    stores its distinct shingle keys (the verify side of the batch op
    holds the same sets in its join). No corpus-sized shuffle ever
    happens; the only wide exchange is the groupBy on (band, sig),
    identical to the batch candidate join's key.

    Cap semantics (explicit accepted loss): an arrival to a FULL
    bucket pairs against the residents and within its own micro-batch,
    but is not retained as a resident — a near-duplicate of it landing
    in this bucket in a LATER micro-batch will not pair here (it can
    still pair through any of its other n_bands-1 buckets). What a
    full bucket DOES remember is the capped doc's id (ids only, no
    shingle sets — state growth per capped doc is one long), so a
    checkpoint replay re-delivering a capped doc is recognized and
    skipped instead of re-verifying and re-emitting its pairs — the
    <= n_bands emission bound holds in capped mode too (test-pinned
    by ``test_stream_near_dup_pairs_capped_replay``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import JACCARD_TAU_PPM, _shingle_table, band_sigs

    tau = JACCARD_TAU_PPM if tau_ppm is None else int(tau_ppm)
    sigs = band_sigs(_shingle_table(docs), with_skeys=True)

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            docs_l, offs, flat, capped = (list(x) for x in state.get)
        else:
            docs_l, offs, flat, capped = [], [0], [], []
        seen = {int(d): (offs[i], offs[i + 1]) for i, d in enumerate(docs_l)}
        sets = {d: frozenset(flat[lo:hi]) for d, (lo, hi) in seen.items()}
        capped_ids = set(int(c) for c in capped)
        out_d1, out_d2, out_j = [], [], []
        arrivals = []
        for pdf in pdfs:
            for doc_id, skeys in zip(pdf["doc_id"], pdf["skeys"]):
                arrivals.append((int(doc_id), frozenset(int(k) for k in skeys)))
        arrivals.sort(key=lambda t: t[0])
        for doc_id, ks in arrivals:
            if doc_id in sets or doc_id in capped_ids:
                continue  # replayed doc: already seen (resident or capped)
            for other, os_ in sets.items():
                inter = len(ks & os_)
                un = len(ks) + len(os_) - inter
                if un and inter * 1_000_000 >= tau * un:
                    lo, hi = (doc_id, other) if doc_id < other else (other, doc_id)
                    out_d1.append(lo)
                    out_d2.append(hi)
                    # same IEEE-double floor as the batch op's
                    # floor(inter/un * 1e6) — integer // can differ by
                    # one ulp-case and break exact parity
                    out_j.append(int(math.floor(inter / un * 1e6)))
            if bucket_cap is None or len(docs_l) < bucket_cap:
                docs_l.append(doc_id)
                flat.extend(sorted(ks))
                offs.append(len(flat))
            else:
                capped.append(doc_id)  # remember the id so replays skip
                capped_ids.add(doc_id)
            sets[doc_id] = ks  # still pairs within this batch even if capped
        state.update((docs_l, offs, flat, capped))
        if out_d1:
            yield pd.DataFrame({"d1": out_d1, "d2": out_d2, "jaccard_ppm": out_j})

    return sigs.groupBy("band", "sig").applyInPandasWithState(
        fn,
        _NEAR_DUP_OUT_SCHEMA,
        _NEAR_DUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
