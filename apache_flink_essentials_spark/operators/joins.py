"""Multi-stream operators (SURVEY §2.3): union / window join / interval join
/ connect.

Reference sites: MultipleStreams.scala — union (:19-33), window join
(:36-57), interval join (:61-103), connect+CoProcessFunction (:106-145).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_streams(*dfs: DataFrame) -> DataFrame:
    """J1 ≙ ``stream.union(other)`` (MultipleStreams.scala:29).

    ``unionByName`` so column order can't silently mis-align; purely
    narrow — no shuffle, each input's partitions pass through.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def window_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    size: str,
    projection: Sequence[Column] | None = None,
    epoch_bounds: bool = True,
    keep_event_times: bool = True,
) -> DataFrame:
    """J2 ≙ windowed equi-join (MultipleStreams.scala:36-57): pairs with equal
    key whose timestamps fall in the same tumbling window.

    ``keep_event_times=False`` drops the raw timestamp columns from the join
    inputs — REQUIRED for the streaming form: Structured Streaming allows at
    most one event-time column per stream side, and the window column
    already carries it.

    Idiomatic Spark: assign the window column on BOTH sides, then equi-join
    on (key, window). Because both join keys are equi-keys, Catalyst plans a
    hash join (broadcast or shuffled, AQE's choice) — never a nested-loop
    over the time condition. At scale both sides shuffle once on
    (key, window); with a skewed key AQE's skew-join splits it.

    The reference uses processing-time windows here; we take the event-time
    columns (deterministic, oracle-checkable) — pass ingest-time columns for
    the processing-time behavior.
    """
    lw = left.withColumn("window", F.window(F.col(left_ts), size))
    rw = right.withColumn("window", F.window(F.col(right_ts), size))
    l_cols = [c for c in left.columns if c != key and (keep_event_times or c != left_ts)]
    r_cols = [c for c in right.columns if c != key and (keep_event_times or c != right_ts)]
    # disambiguate all non-key columns
    lsel = [F.col(key).alias(key), F.col("window").alias("window")] + [
        F.col(c).alias(f"l_{c}") for c in l_cols
    ]
    rsel = [F.col(key).alias(key), F.col("window").alias("window")] + [
        F.col(c).alias(f"r_{c}") for c in r_cols
    ]
    joined = lw.select(*lsel).join(rw.select(*rsel), on=[key, "window"], how="inner")
    start = F.col("window.start").cast("long") if epoch_bounds else F.col("window.start")
    out = joined.withColumn("window_start", start).drop("window")
    if projection is not None:
        out = out.select(*projection)
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    lower_exclusive: bool = True,
    upper_exclusive: bool = True,
    how: str = "inner",
) -> DataFrame:
    """J3 ≙ keyed interval (band) join (MultipleStreams.scala:61-103):
    pairs with equal key where lower < tL − tR < upper (bounds exclusive per
    ``lowerBoundExclusive``/``upperBoundExclusive``, :88-89).

    ``how``: ``"inner"`` (reference semantics) or ``"left_outer"`` — keep
    unmatched left rows with null right columns (the "clicks that never
    converted" form). In the streaming twin an outer join additionally
    requires watermarks on BOTH sides; Spark emits the null-extended rows
    once the watermark passes the band's upper bound (state GC point), the
    exact analog of Flink's interval-join cleanup timers.

    ``lower``/``upper`` are SQL interval strings, e.g. ``"2 seconds"`` with
    sign conveyed by the reference semantics: between(-2s, 2s) ⇒
    lower="-2 seconds", upper="2 seconds".

    Physical plan: the equi-key dominates — Catalyst plans SMJ/shuffled-hash
    on ``key`` with the band predicate as a post-join filter, so the
    nested-loop is confined to same-key groups (exactly Flink's per-key
    buffer probe). The streaming form is the same expression over two
    watermarked streams (stream-stream join); see streaming/README in
    streaming/__init__.py.
    """
    lo_op = ">" if lower_exclusive else ">="
    hi_op = "<" if upper_exclusive else "<="
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    # Band condition lower < tL - tR < upper, expressed as timestamp
    # comparisons (tL > tR + lower) so both sides stay interval-typed.
    band_lo = F.expr(f"l_{left_ts} {lo_op} r_{right_ts} + interval '{lower}'")
    band_hi = F.expr(f"l_{left_ts} {hi_op} r_{right_ts} + interval '{upper}'")
    cond = (F.col(f"l_{key}") == F.col(f"r_{key}")) & band_lo & band_hi
    return l.join(r, cond, how)


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    lower_exclusive: bool = True,
    upper_exclusive: bool = True,
) -> DataFrame:
    """J3 with a bucketed-time physical strategy — identical semantics to
    ``interval_join``, different plan shape for scale.

    ``interval_join`` plans equi-join-on-key + band filter: fine when keys
    are selective, quadratic inside a hot key. This variant adds a coarse
    time bucket (size = band width) to the join key: left rows join on
    (key, bucket(t_l)); right rows replicate into the ≤2 buckets their match
    window can span. The join is then a pure hash equi-join on
    (key, bucket) — per-bucket work is bounded by bucket occupancy, not key
    cardinality — with the exact band predicate as a residual filter.

    This is the SCALING.md §joins 'bucketed-time co-partition' optimization;
    equivalence with interval_join is pinned by tests.
    """
    width_us = int(round((upper_seconds - lower_seconds) * 1_000_000))
    assert width_us > 0, "upper must exceed lower"
    lo_op = ">" if lower_exclusive else ">="
    hi_op = "<" if upper_exclusive else "<="
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]).withColumn(
        "_l_bucket", F.floor(F.unix_micros(F.col(f"l_{left_ts}")) / width_us)
    )
    lower_us = int(round(lower_seconds * 1_000_000))
    r_base = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    # left matches lie in (t_r + lower, t_r + upper): width = bucket size ⇒
    # the window spans at most 2 buckets starting at bucket(t_r + lower)
    start_bucket = F.floor(
        (F.unix_micros(F.col(f"r_{right_ts}")) + F.lit(lower_us)) / width_us
    )
    r = r_base.withColumn(
        "_r_bucket", F.explode(F.array(start_bucket, start_bucket + 1))
    )
    band_lo = F.expr(
        f"l_{left_ts} {lo_op} r_{right_ts} + interval '{lower_seconds} seconds'"
    )
    band_hi = F.expr(
        f"l_{left_ts} {hi_op} r_{right_ts} + interval '{upper_seconds} seconds'"
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col("_l_bucket") == F.col("_r_bucket"))  # both become equi-keys
        & band_lo
        & band_hi
    )
    return l.join(r, cond, "inner").drop("_l_bucket", "_r_bucket")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join (each left row matched to the LATEST right row at-or-before
    its timestamp; optional tolerance). Not in the reference, but the natural
    completion of its interval join for time-series enrichment.

    Implementation: band-join candidates then keep rank-1 per left row —
    equi-key shuffle + per-key sort, no global sort.
    """
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]).withColumn(
        "_l_id", F.monotonically_increasing_id()
    )
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (F.col(f"l_{key}") == F.col(f"r_{key}")) & (
        F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}")
    )
    if tolerance:
        cond = cond & F.expr(f"r_{right_ts} >= l_{left_ts} - interval '{tolerance}'")
    joined = l.join(r, cond, "left")
    w = Window.partitionBy("_l_id").orderBy(F.desc(f"r_{right_ts}"))
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_l_id")
    )


def connect_ratio(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_tag: str = "left",
    right_tag: str = "right",
    tiebreak: Sequence[str] = (),
    ratio_alias: str = "ratio",
) -> DataFrame:
    """J4 ≙ connect + CoProcessFunction (MultipleStreams.scala:106-145): two
    heterogeneous streams through one stateful operator keeping running
    counts of each side and emitting their ratio per record.

    Batch form: normalize both sides to (ts, side), union, then cumulative
    counts over the event-time total order — the deterministic replay of the
    reference's arrival-order state machine (the reference forces
    parallelism 1, :115-116; a total order is the batch equivalent).

    Scale note: a single global running ratio is inherently order-sequential
    (exactly why the reference pins parallelism 1). The window here is
    un-partitioned by necessity; for keyed variants partition the window by
    key and it scales. Streaming true-arrival-order form:
    streaming/stateful.py::connect_count_ratio_stream.
    """
    tb = [F.col(c) for c in tiebreak]
    l = left.select(F.col(left_ts).alias("ts"), F.lit(left_tag).alias("side"), *tb)
    r = right.select(F.col(right_ts).alias("ts"), F.lit(right_tag).alias("side"), *tb)
    both = l.unionByName(r)
    order = [F.col("ts")] + [F.col(c) for c in tiebreak] + [F.col("side")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted = both.withColumn(
        "left_count", F.sum(F.when(F.col("side") == left_tag, 1).otherwise(0)).over(w)
    ).withColumn(
        "right_count", F.sum(F.when(F.col("side") == right_tag, 1).otherwise(0)).over(w)
    )
    return counted.withColumn(
        ratio_alias,
        F.when(F.col("right_count") > 0, F.col("left_count") / F.col("right_count")),
    ).withColumn(
        # the reference's exact output formula (MultipleStreams.scala:129):
        # left share as a percentage of all events seen so far
        "left_pct",
        F.col("left_count") * 100.0 / (F.col("left_count") + F.col("right_count")),
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (band) join: tag each fact row with the band whose
    ``[lo, hi)`` interval contains ``value_col``. Extends the reference's
    equi-only join surface (MultipleStreams.scala:36-57) with the
    non-equi banding every metrics pipeline needs (histogram tiers,
    SLA buckets, price bands).

    The band table is tiny by construction, so the plan MUST be a
    BroadcastNestedLoopJoin — each fact partition scans the broadcast
    band list in place; no shuffle of the fact side, no cartesian
    exchange. At 100 TB the fact side streams through unchanged; cost is
    |facts| × |bands| comparisons, which for ≤100 bands is cheaper than
    one exchange. For band tables too big to broadcast, sort both sides
    and use `as_of_join` on ``lo`` plus a ``hi`` filter instead.
    """
    b = F.broadcast(bands)
    v = facts[value_col]
    return facts.join(b, (v >= b[lo_col]) & (v < b[hi_col]), "left")


def _deletion_variants(col: str) -> "F.Column":
    """All single-character-deletion variants of lower(col), plus the value
    itself — pure JVM expressions (transform + sequence + substring), no
    Python. Two strings within edit distance 1 ALWAYS share a variant:
    equal → the identity variant; substitution at i → both delete i;
    insert/delete → deleting the extra char reproduces the shorter string."""
    lc = f"lower({col})"
    return F.expr(
        f"array_union(array({lc}), transform(sequence(1, length({lc})), "
        f"i -> concat(substring({lc}, 1, i-1), "
        f"substring({lc}, i+1, length({lc})))))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    block_chars: int = 4,
    method: str = "auto",
    length_bucket: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Blocked edit-distance (Levenshtein) join — the entity-resolution
    primitive for typo-level matching (names, SKUs, addresses). NEVER an
    all-pairs comparison. Match semantics (independent of method): lower-
    cased ``block_chars`` prefixes are equal AND levenshtein ≤
    ``max_distance``. A prefix block cannot miss matches whose first
    ``block_chars`` characters already differ — callers wanting prefix-typo
    tolerance should pass a coarser blocking (shorter prefix, phonetic key)
    and pay the larger blocks.

    Methods:
      * ``"neighborhood"`` (auto-chosen when ``max_distance <= 1``): the
        deletion-neighborhood candidate join. Each DISTINCT value explodes
        to its ≤ len+1 single-deletion variants (JVM expressions); the
        equi-join runs on the variant; exact levenshtein verifies. Total
        candidates are O(n · len · alphabet) — LINEAR in n, immune to hot
        prefix blocks (the TPC-H "Customer#0000…" shared-prefix case that
        makes prefix blocking go m²). Row multiplicity is restored by
        joining matched VALUE pairs back to both inputs, so duplicate
        input rows multiply exactly as in the blocked method.
      * ``"block"`` (auto for ``max_distance > 1``): prefix equi-join with
        in-block Levenshtein — Σ block_l×block_r cost, same model (and
        same skew caveat) as the LSH bucket join in dedup. Two skew
        controls for 100 TB:
          - ``length_bucket``: compound block key (prefix, length bucket).
            EXACT — a match has length difference ≤ max_distance, and the
            shorter side probes every bucket its admissible lengths touch,
            so no pair is lost; a hot prefix block splits by length.
          - ``max_block_size``: drop blocks whose side exceeds the cap
            (mirrors dedup's ``max_bucket_size``). RECALL TRADE-OFF,
            documented: oversized blocks are degenerate keys (empty
            strings, boilerplate prefixes) better handled upstream.
    """
    if method == "auto":
        method = "neighborhood" if max_distance <= 1 else "block"
    if method == "neighborhood":
        if max_distance > 1:
            raise ValueError(
                "neighborhood method covers max_distance <= 1; use "
                "method='block' for larger distances"
            )
        return _fuzzy_join_neighborhood(
            left, right, left_col, right_col, max_distance, block_chars
        )

    l = left.select(
        F.lower(F.substring(F.col(left_col), 1, block_chars)).alias("_blk"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
    )
    r = right.select(
        F.lower(F.substring(F.col(right_col), 1, block_chars)).alias("_blk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    join_keys = ["_blk"]
    if length_bucket is not None:
        # right side sits in its own bucket; left probes every bucket its
        # admissible match lengths (len ± max_distance) overlap → exact
        ln_l = F.length(F.col(f"l_{left_col}"))
        l = l.withColumn(
            "_lb",
            F.explode(
                F.sequence(
                    F.floor((ln_l - F.lit(max_distance)) / F.lit(length_bucket)),
                    F.floor((ln_l + F.lit(max_distance)) / F.lit(length_bucket)),
                )
            ),
        )
        r = r.withColumn(
            "_lb", F.floor(F.length(F.col(f"r_{right_col}")) / F.lit(length_bucket))
        )
        join_keys.append("_lb")
    if max_block_size is not None:
        oversized = (
            l.groupBy(join_keys).count()
            .filter(F.col("count") > max_block_size)
            .select(*join_keys)
            .unionByName(
                r.groupBy(join_keys).count()
                .filter(F.col("count") > max_block_size)
                .select(*join_keys)
            )
            .distinct()
        )
        # hot-key list is tiny by construction → broadcast anti-joins, no
        # extra shuffle of the data sides
        l = l.join(F.broadcast(oversized), join_keys, "left_anti")
        r = r.join(F.broadcast(oversized), join_keys, "left_anti")
    return (
        l.join(r, join_keys)
        # banded DP: O(len·max_distance) per comparison, -1 when exceeded
        .withColumn(
            "distance",
            F.levenshtein(
                F.lower(F.col(f"l_{left_col}")),
                F.lower(F.col(f"r_{right_col}")),
                max_distance,
            ),
        )
        .filter(F.col("distance") >= 0)
        .drop(*join_keys)
    )


def _fuzzy_join_neighborhood(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int,
    block_chars: int,
) -> DataFrame:
    """Deletion-neighborhood candidate generation at VALUE granularity:
    distinct values → deletion variants → candidate equi-join on
    (variant-hash, block prefix) → thresholded-levenshtein verify →
    pair-level dedup → join back to both inputs to restore row
    multiplicity.

    Plan-shape choices (each measured, not guessed):
      * The block prefix is PART OF THE JOIN KEY, not a post-join filter —
        matching pairs must share it by contract, so cross-prefix
        candidates are pruned before they are ever materialized (on TPC-H
        names this cuts candidates ~4×: a shared variant admits any
        same-length substitution, the prefix admits only suffix typos).
      * Variants shuffle as xxhash64 LONGS, not strings — 8 bytes per key
        instead of ~len bytes; hash collisions are harmless because the
        levenshtein verification is exact.
      * ``levenshtein(l, r, threshold)`` bounds the DP band — O(len·d)
        per comparison instead of O(len²) — and candidates are deduped
        AFTER verification (survivors are far fewer than candidates, and
        duplicate verifications of a pair are cheaper than a pre-verify
        shuffle of the full candidate set).
    """
    lv = left.select(F.col(left_col).alias("_vl")).distinct()
    rv = right.select(F.col(right_col).alias("_vr")).distinct()
    lx = lv.select(
        "_vl",
        F.lower(F.substring(F.col("_vl"), 1, block_chars)).alias("_pfx"),
        F.explode(_deletion_variants("_vl")).alias("_var"),
    ).select("_vl", "_pfx", F.xxhash64("_var").alias("_vh"))
    rx = rv.select(
        "_vr",
        F.lower(F.substring(F.col("_vr"), 1, block_chars)).alias("_pfx"),
        F.explode(_deletion_variants("_vr")).alias("_var"),
    ).select("_vr", "_pfx", F.xxhash64("_var").alias("_vh"))
    # Explicit-count repartition on the join keys: the explode multiplies
    # rows ~len× AFTER the distincts' map stats are taken, and the join
    # fans out further, so AQE (which coalesces on pre-explode BYTES)
    # under-parallelizes this join badly — measured 3.7× slower on
    # local[32] when left to a coalesced single partition. The exchange is
    # not extra work at scale: it IS the join's own key exchange, just
    # with an explicit partition count AQE won't coalesce away.
    n_part = int(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    lx = lx.repartition(n_part, "_vh", "_pfx")
    rx = rx.repartition(n_part, "_vh", "_pfx")
    pairs = (
        lx.join(rx, ["_vh", "_pfx"])
        .select("_vl", "_vr")
        # cheap length gate first; banded levenshtein returns -1 when the
        # distance exceeds max_distance, else the exact distance
        .filter(F.abs(F.length("_vl") - F.length("_vr")) <= max_distance)
        .withColumn(
            "distance",
            F.levenshtein(F.lower("_vl"), F.lower("_vr"), max_distance),
        )
        .filter(F.col("distance") >= 0)
        .dropDuplicates(["_vl", "_vr"])
    )
    l = left.select(*[F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    return (
        l.join(pairs, l[f"l_{left_col}"] == pairs["_vl"])
        .join(r, pairs["_vr"] == r[f"r_{right_col}"])
        .drop("_vl", "_vr")
    )


def bloom_semi_filter(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
    df_col: str | None = None,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join prefilter: drop ``df`` rows whose ``df_col``
    cannot possibly appear in ``keys.key_col`` — NO false negatives, a
    tunable false-positive rate — without shuffling ``df`` at all. This is
    the join-pruning pattern Spark's AQE applies internally
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`), surfaced as an
    explicit operator so a 100 TB pipeline can pre-drop the big side
    BEFORE an expensive downstream join/agg, persist the filtered result,
    or ship the filter to another system (the bits are plain BIGINTs from
    deterministic md5 arithmetic — engine-portable, oracle-checkable,
    unlike the JVM's internal BloomFilterImpl).

    Build: each key sets ``k_hashes`` bits of an ``m_bits`` array packed
    into ``m_bits/32`` 32-bit-per-BIGINT words (31 is the max shift —
    DuckDB range-checks ``1 << 63``, so sign-bit packing is not portable) — per-probe (word, mask) rows hash-agg
    to ``bit_or`` words (map-side combined; the shuffle carries at most
    the WORD TABLE, not the keys). The word table collects to the driver
    (bounded by construction: ``m_bits/32`` longs — 16 KB at the 2^16
    default — the `kmeans centroids` collect class, independent of data
    size) and inlines into the probe expression as one array literal, so
    the probe side is a pure scan-stage projection: k shifts + ANDs per
    row inside codegen, zero shuffle, zero join.

    Probe bit ``s``: ONE ``md5(cast(value as string))`` digest per row;
    ``h_s`` is the ``s``-th disjoint 8-hex-char slice of that digest mod
    ``m_bits`` (so ``k_hashes <= 4`` — 32 hex chars / 8). The test is
    ``(words[h_s div 32] >> (h_s % 32)) & 1`` for all s. One digest
    instead of k independent md5 evaluations cuts the per-row probe cost
    ~k×; the slices are independent uniform hashes because md5 output
    bits are pairwise independent for this purpose.
    """
    arr_sql, checks = _bloom_build(
        keys, key_col, df_col or key_col, m_bits, k_hashes
    )
    return (
        df.withColumn("_bloom_words", F.expr(arr_sql))
        .filter(checks)
        .drop("_bloom_words")
    )


def bloom_anti_join(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
    df_col: str | None = None,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """EXACT left-anti join with a bloom fast-path: a row that fails the
    bloom probe is DEFINITELY absent from ``keys`` (a bloom has no false
    negatives), so it passes the anti join straight out of the scan
    stage; only the bloom-passing sliver — true matches plus the FP
    rate — goes through the real anti join. Semantics are exactly
    ``df ANTI JOIN keys`` for ANY ``m_bits``/``k_hashes`` (the dial
    trades the sliver's size, never correctness), which is why this
    operator's oracle row is the plain ANSI anti join.

    At 100 TB this is the decontamination shape (benchmark-overlap
    removal, `dedup_contamination`): the contaminated fraction is tiny,
    so ~(1 − fpr) of the corpus never shuffles and the anti join's
    build side stays the same small keys table. ONE word table serves
    both branches (single bounded driver collect); the split is one
    boolean column computed in the scan, so the input is read once per
    branch with no exchange before the union.
    """
    df_col = df_col or key_col
    arr_sql, checks = _bloom_build(keys, key_col, df_col, m_bits, k_hashes)
    tagged = (
        df.withColumn("_bloom_words", F.expr(arr_sql))
        .withColumn("_bloom_hit", F.expr(checks))
        .drop("_bloom_words")
    )
    # NULL-key rows produce a NULL probe predicate; a true LEFT ANTI
    # JOIN keeps them (NULL never equals any key), so route them to the
    # definite-out branch via coalesce(false) rather than losing them to
    # both filters.
    hit = F.coalesce(F.col("_bloom_hit"), F.lit(False))
    definite_out = tagged.filter(~hit).drop("_bloom_hit")
    suspects = tagged.filter(hit).drop("_bloom_hit")
    cleaned = suspects.join(
        keys.select(F.col(key_col).alias("__bloom_k")),
        F.col(df_col) == F.col("__bloom_k"),
        "left_anti",
    )
    return definite_out.unionByName(cleaned)


def _bloom_build(
    keys: DataFrame,
    key_col: str,
    df_col: str,
    m_bits: int,
    k_hashes: int,
) -> tuple[str, str]:
    """Build the bloom word table (bounded driver collect) and return the
    (array-literal SQL, probe-predicate SQL) pair both bloom operators
    share. The predicate references the array as ``_bloom_words``.

    ONE md5 digest per row: bit position ``s`` reads hex chars
    ``[1+8s, 8+8s]`` of ``md5(cast(value as string))`` — disjoint
    slices of a single digest instead of ``k`` independent md5 calls,
    so the per-row probe is one hash + k (substring, conv, shift, AND)
    chains, all inside whole-stage codegen. 32 hex chars cap
    ``k_hashes`` at 4.
    """
    if not 1 <= k_hashes <= 4:
        raise ValueError(
            f"k_hashes must be in [1, 4] (one md5 digest = 4 disjoint"
            f" 8-hex slices); got {k_hashes}"
        )
    nwords = m_bits // 32
    slice_h = [
        f"(cast(conv(substring(_dig, {1 + 8 * s}, 8), 16, 10) as bigint)"
        f" % {m_bits})"
        for s in range(k_hashes)
    ]
    probes = keys.selectExpr(
        f"md5(cast(`{key_col}` as string)) AS _dig"
    ).selectExpr(
        f"explode(array({', '.join(slice_h)})) AS _h",
    ).selectExpr(
        # integer `div`, never cast(double as int): Spark truncates that
        # cast while DuckDB rounds it — the one arithmetic op the two
        # engines genuinely disagree on
        "cast(_h div 32 as int) AS _word",
        "shiftleft(cast(1 as bigint), cast(_h % 32 as int)) AS _mask",
    )
    words = {
        r["_word"]: r["_w"]
        for r in probes.groupBy("_word")
        .agg(F.expr("bit_or(_mask)").alias("_w"))
        .collect()
    }
    # The word table inlines as ONE BINARY literal (X'..', 4 bytes per
    # 32-bit word), NOT an array(...) of nwords literals: a binary is a
    # single Literal NODE regardless of length, while a 4096-element
    # CreateArray is a 4096-node expression tree that predicate pushdown
    # then clones into every probe conjunct — measured ~0.45 s of
    # DRIVER-side analysis/optimizer walk per clone per action at
    # m=2^17, which no executor parallelism can hide. (A hex STRING
    # literal is also one node but UTF8String.substring is O(position) —
    # measured 80 s at sf0.1; binary substring is an O(1) byte slice.)
    # Word lookup: hex(substring(words, w*4+1, 4)) → conv → bigint
    # (words carry bits 0..31 only, so 4 bytes are lossless).
    hexstr = "".join(f"{words.get(i, 0):08x}" for i in range(nwords))
    arr_sql = f"X'{hexstr}'"
    dig = f"md5(cast(`{df_col}` as string))"
    h = (
        f"(cast(conv(substring({dig}, {{p}}, 8), 16, 10) as bigint)"
        f" % {m_bits})"
    )
    word = (
        "cast(conv(hex(substring(_bloom_words,"
        " cast({h} div 32 as int) * 4 + 1, 4)), 16, 10) as bigint)"
    )
    checks = " AND ".join(
        "(shiftright("
        + word.format(h=h.format(p=1 + 8 * s))
        + f", cast({h.format(p=1 + 8 * s)} % 32 as int)) & 1) = 1"
        for s in range(k_hashes)
    )
    return arr_sql, checks


def fs_match_weights(
    records: DataFrame,
    candidates: DataFrame,
    id_col: str,
    fields: dict[str, tuple[Column, float, float]],
    t_match_micro: int,
    t_nonmatch_micro: int,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA '69) over a
    candidate-pair table: each comparison field contributes
    ``log2(m/u)`` on agreement and ``log2((1-m)/(1-u))`` on disagreement
    (m = P(agree | same entity), u = P(agree | different)); pairs
    classify as match / possible / nonmatch by thresholding the summed
    weight. The m/u probabilities are caller-supplied constants (in
    production EM-estimated offline — Winkler's method — and frozen into
    the job exactly like this), so the per-field weights bake into the
    plan as INTEGER MICRO-LOG LITERALS: no engine-side log, exact bigint
    sums, fully oracle-checkable (the Benford-literal discipline).

    ``fields``: out_name → (agreement Column over the ``_a_``/``_b_``
    prefixed attribute pair, m, u).

    Scale: candidates carry only id pairs (the blocked fuzzy join
    upstream bounds them); the two attribute attachments are key-equi
    joins that broadcast when the record side is dimension-sized; the
    scoring itself is a pure projection — no shuffle beyond the joins.
    """
    import math

    # fields' agreement expressions reference `_a_<col>` / `_b_<col>`;
    # attach every record attribute under both prefixes
    attrs = [c for c in records.columns if c != id_col]
    a = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_a_{c}") for c in attrs],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in attrs],
    )
    j = candidates.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
    # two-stage projection: materialize each agreement flag ONCE, then
    # derive the weights from the flags — guarantees a single evaluation
    # of expensive comparators (the banded levenshtein is the ER hot
    # loop) instead of leaning on codegen subexpression elimination to
    # dedup the flag and its weight CASE
    flags = j.select(
        "id_a",
        "id_b",
        *[
            agree_expr.cast("int").alias(f"agree_{name}")
            for name, (agree_expr, m, u) in fields.items()
        ],
    )
    total = F.lit(0).cast("bigint")
    for name, (agree_expr, m, u) in fields.items():
        w_agree = round(math.log2(m / u) * 1e6)
        w_dis = round(math.log2((1 - m) / (1 - u)) * 1e6)
        total = total + F.when(
            F.col(f"agree_{name}") == 1, F.lit(w_agree)
        ).otherwise(F.lit(w_dis))
    out = flags.select(
        "id_a", "id_b",
        *[f"agree_{name}" for name in fields],
        total.alias("weight_micro"),
    )
    return out.select(
        "*",
        F.when(F.col("weight_micro") >= t_match_micro, F.lit("match"))
        .when(F.col("weight_micro") <= t_nonmatch_micro, F.lit("nonmatch"))
        .otherwise(F.lit("possible"))
        .alias("label"),
    ).orderBy("id_a", "id_b")


def blocking_audit(
    df: DataFrame, schemes: "list[tuple[str, Column]]"
) -> DataFrame:
    """Blocking-scheme quality audit for entity resolution → one row
    per scheme ``(scheme, n_records, n_blocks, candidate_pairs,
    reduction_ratio, max_block, max_block_pair_share)``: how many
    comparisons does each candidate blocking key buy, and does one hot
    block dominate them — the sizing read run BEFORE any
    :func:`fuzzy_join` / Fellegi-Sunter pass, since the pair budget
    (``Σ C(b,2)``), not the record count, is what an ER job actually
    pays (the Christen '12 survey's reduction-ratio metric, public
    textbook).

    Portability: block sizes and pair counts are exact BIGINTs
    (``b·(b−1) div 2`` per block); the ratios are fixed-order rationals
    of exact integers, unrounded. Domain bound: per-block C(b,2) must
    fit BIGINT → b < ~4.3·10⁹ rows in one block (you have a different
    problem first).

    Scale: ONE hash-agg per scheme over the scan (map-side combined to
    |blocks| rows) + a one-row rollup each; schemes union at one row
    apiece. No pairs are ever materialized — that is the point.
    """
    outs = []
    for name, key in schemes:
        blocks = (
            df.where(key.isNotNull())
            .groupBy(key.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_b"))
        )
        pair = F.expr("_b * (_b - 1) div 2")
        outs.append(
            blocks.agg(
                F.sum("_b").alias("n_records"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum(pair).alias("candidate_pairs"),
                F.max("_b").alias("max_block"),
                F.max(pair).alias("_max_pairs"),
            ).select(
                F.lit(name).alias("scheme"),
                "n_records",
                "n_blocks",
                "candidate_pairs",
                (
                    F.lit(1.0)
                    - F.col("candidate_pairs").cast("double")
                    / F.expr(
                        "(n_records * (n_records - 1) div 2)"
                    ).cast("double")
                ).alias("reduction_ratio"),
                "max_block",
                F.when(
                    F.col("candidate_pairs") > 0,
                    F.col("_max_pairs") / F.col("candidate_pairs"),
                ).otherwise(F.lit(0.0)).alias("max_block_pair_share"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("scheme")


def golden_record(
    members: DataFrame,
    component_col: str,
    id_col: str,
    first_by_rep: "dict[str, str]",
    modal: "dict[str, str]",
    maxed: "dict[str, str]",
) -> DataFrame:
    """Survivorship: collapse each matched-entity cluster into ONE golden
    row — the step after `fs_match_weights` (score pairs) and connected
    components (form clusters). ``members`` is the cluster assignment
    joined back to the source attributes; per component the output
    carries ``n_members``, ``rep_id`` (min id), and three survivorship
    rules:

      * ``first_by_rep``: out_col → attr taken from the representative
        (min-id) row — the deterministic "keep the oldest record" rule;
      * ``modal``: out_col → attr by majority vote, ties to the smallest
        value — the consensus rule for low-cardinality fields;
      * ``maxed``: out_col → attr's max — the "best known value" rule
        for monotone fields (latest balance, newest timestamp).

    Determinism: every rule is a total-order pick (min_by on id /
    (count DESC, value ASC) vote / max) over exact values — no floats
    created, engine-portable.

    Scale: one hash agg per modal attribute on (component, value) plus
    ONE final agg on component (min_by/max_by carry the rep picks —
    no window sort, no self-join); modal votes join back at |components|
    cardinality. All shuffles keyed by component.
    """
    comp = F.col(component_col)
    base_agg = members.groupBy(comp.alias("component")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("rep_id"),
        *[
            F.min_by(F.col(attr), F.col(id_col)).alias(out)
            for out, attr in first_by_rep.items()
        ],
        *[F.max(F.col(attr)).alias(out) for out, attr in maxed.items()],
    )
    from pyspark.sql.window import Window

    out = base_agg
    for out_col, attr in modal.items():
        # (votes DESC, value ASC) rank over the per-component vote table
        # — NOT max_by over (votes, -value): arithmetic negation only
        # orders numerics, and the typical modal survivorship target is
        # a low-cardinality STRING, where -col is NULL (or an ANSI
        # error) and ties would go nondeterministic. row_number over the
        # vote table orders any comparable type, at |component × value|
        # cardinality.
        w = (
            Window.partitionBy("component")
            .orderBy(F.desc("_votes"), F.asc(attr))
        )
        votes = (
            members.groupBy(comp.alias("component"), F.col(attr))
            .agg(F.count(F.lit(1)).alias("_votes"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("component", F.col(attr).alias(out_col))
        )
        out = out.join(votes, "component")
    return out.orderBy("component")


def threshold_sweep(
    weights: DataFrame,
    score_col: str,
    thresholds: "list[int]",
) -> DataFrame:
    """Operating-curve sweep over a scored pair table → one row per
    threshold ``(threshold_micro, n_pairs, n_above, frac_above)``: how
    many candidate pairs survive each cut. The calibration read run
    BEFORE freezing a Fellegi-Sunter match threshold — the knee of this
    curve is where the 'possible' band should sit.

    Shape: the scored relation collapses FIRST to a (score, count)
    aggregate — the distinct-score table is bounded by the comparison-
    vector space (2^fields), so the threshold grid multiplies a
    TINY relation, never the pair table. Counts are BIGINTs and
    ``frac_above`` an int/int rational (portable); thresholds are
    integer micro-units so every comparison is exact.
    """
    sc = (
        weights.groupBy(F.col(score_col).alias("_w"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    grid = F.explode(
        F.array(*[F.lit(int(t)).cast("long") for t in thresholds])
    ).alias("threshold_micro")
    return (
        sc.select(grid, "_w", "_c")
        .groupBy("threshold_micro")
        .agg(
            F.sum("_c").cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("_w") >= F.col("threshold_micro"),
                         F.col("_c")).otherwise(0))
            .cast("long").alias("n_above"),
        )
        .select(
            "threshold_micro", "n_pairs", "n_above",
            (F.col("n_above") / F.col("n_pairs")).alias("frac_above"),
        )
        .orderBy("threshold_micro")
    )
