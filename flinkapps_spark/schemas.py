"""Schema universe: reference entities + driver test tables.

The reference declares five case-class record types in
``entities/model.scala`` (reference entities/model.scala:5-62) and one
anonymous (name, score) row (reference source/flinkStreamTable.scala:61-65).
All are row-oriented fixed schemas; here they are Spark ``StructType``s.

CSV wire format: the reference parses value-only CSV strings positionally
with split+cast (reference source/flinkStreamProcessing.scala:107-115); the
matching declarative parse/serialize expressions live in
``operators/projections.py``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference entities (entities/model.scala) -----------------------------

# dailyPrices (entities/model.scala:5-14). trdate stays a *string* date on
# purpose — the reference casts at query time (flinkTableManipulation.scala:115).
DAILY_PRICES = T.StructType([
    T.StructField("xchange", T.StringType()),
    T.StructField("symbol", T.StringType()),
    T.StructField("trdate", T.StringType()),
    T.StructField("open", T.FloatType()),
    T.StructField("high", T.FloatType()),
    T.StructField("low", T.FloatType()),
    T.StructField("close", T.FloatType()),
    T.StructField("volume", T.IntegerType()),
    T.StructField("adj_close", T.FloatType()),
])

# sensorReading (entities/model.scala:38-42)
SENSOR_READING = T.StructType([
    T.StructField("sensorId", T.StringType()),
    T.StructField("sensorTStamp", T.LongType()),
    T.StructField("sensorTemp", T.FloatType()),
])

# atmlog (entities/model.scala:16-23) — declared by the reference, unused.
ATM_LOG = T.StructType([
    T.StructField("tran_id", T.StringType()),
    T.StructField("tran_dt", T.StringType()),
    T.StructField("area", T.StringType()),
    T.StructField("latitude", T.FloatType()),
    T.StructField("longitude", T.FloatType()),
    T.StructField("tran_typ", T.StringType()),
    T.StructField("tran_amt", T.FloatType()),
])

# Student (entities/model.scala:25-29) — declared by the reference, unused.
STUDENT = T.StructType([
    T.StructField("stuid", T.IntegerType()),
    T.StructField("stuname", T.StringType()),
    T.StructField("stuaddr", T.StringType()),
    T.StructField("stusex", T.StringType()),
])

# Book2 (entities/model.scala:31-36) / local Book (flinkTableJDBC02.scala:59-64)
BOOK = T.StructType([
    T.StructField("bookId", T.LongType()),
    T.StructField("bookTitle", T.StringType()),
    T.StructField("bookAuthor", T.StringType()),
    T.StructField("bookYear", T.IntegerType()),
])

# anonymous Row(name, score) (flinkStreamTable.scala:61-65)
NAME_SCORE = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("score", T.IntegerType()),
])

# customers demo rows (flinkTableManipulation.scala:178-185, commented demo)
CUSTOMERS_DEMO = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("date_of_birth", T.DateType()),
    T.StructField("street", T.StringType()),
    T.StructField("zip_code", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("gender", T.StringType()),
    T.StructField("has_newsletter", T.BooleanType()),
    T.StructField("visits", T.IntegerType()),
    T.StructField("points", T.IntegerType()),
    T.StructField("level", T.IntegerType()),
])

# --- driver test tables (/root/testdata/sf*/; TESTDATA.md) ------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# columns stored as parquet TIMESTAMP(NANOS,...) that Spark must read as
# long (spark.sql.legacy.parquet.nanosAsLong) and convert to micros.
NANOS_TS_COLUMNS = {"events": ["ts"]}
