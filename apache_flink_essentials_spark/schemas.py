"""Static schemas — the engine's analog of the reference's case-class model.

The reference infers schemas from Scala case classes via implicit
``TypeInformation`` (SURVEY §1.2; reference ``generators/Gaming.scala:8-68``,
``generators/Shopping.scala:13-30,156-166``). Our engine declares them as
explicit ``StructType``s: fixed schemas, sealed-trait hierarchies flattened
to a discriminator ``event_type`` column with nullable subtype columns
(SURVEY §1.4 mapping table).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Gaming domain (reference generators/Gaming.scala:8-68) ----------------
# sealed trait ServerEvent {eventTime, getId} + 6 subtypes → one flat schema
# with event_type discriminator. UUID → string, Vector[UUID] → array<string>,
# GameType enum → string (validated domain).

GAME_TYPES = ["OneVsOne", "TwoVsTwo", "ThreeVsThree", "FourVsFour"]

SERVER_EVENT_TYPES = [
    "PlayerRegistered",
    "PlayerOnline",
    "PlayerIsLookingForAGame",
    "PlayerOffline",
    "GameStarted",
    "GameFinished",
]

SERVER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("player_id", T.StringType(), True),
        T.StructField("nickname", T.StringType(), True),
        T.StructField("game_id", T.StringType(), True),
        T.StructField("player_ids", T.ArrayType(T.StringType()), True),
        T.StructField("map_id", T.StringType(), True),
        T.StructField("region_id", T.StringType(), True),
        T.StructField("game_type", T.StringType(), True),
    ]
)

# --- Shopping domain (reference generators/Shopping.scala:13-30,72-113) ----
# sealed trait ShoppingCartEvent {userId, time}; Add/Removed subtypes share
# shape → single schema + event_type ∈ {add, removed}; optional source_id
# mirrors the sourceId SKU prefix at Shopping.scala:83-84.

SHOPPING_CART_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("source_id", T.StringType(), True),
    ]
)

# CatalogEvent / ProductDetailsViewed (Shopping.scala:156-166)
CATALOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("product_id", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
    ]
)

# FizzBuzzResult (reference DataStreams.scala:34)
FIZZBUZZ_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("output", T.StringType(), False),
    ]
)

# --- Driver-provided fixture tables (TESTDATA.md / FIXTURES.md §A) ---------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

# Multimodal column convention (north-star, SURVEY §2.10): opaque binary
# payload + typed metadata struct. The decode/feature UDFs live in
# operators/multimodal.py; this is the wire schema they agree on.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]

ALL_TABLES = TPCH_TABLES + ["events", "documents", "embeddings"]
