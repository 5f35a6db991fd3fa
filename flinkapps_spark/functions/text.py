"""String/text scalar functions (SURVEY §2.5 F5, §2.8 UDF surface).

- ``tokenize``: the word-count tokenizer (reference source/flinkStarter.scala:14-18):
  lowercase, split on non-word runs, drop empties — expressed with built-in
  functions so it stays inside whole-stage codegen (no Python UDF).
- ``normalize_address``: the one UDF in the reference
  (AddressNormalizer, reference source/flinkTableManipulation.scala:255-266):
  uppercase, non-word→space, collapse whitespace, trim — again pure builtins.
- ``word_code``: a deterministic 31-base polynomial string hash (mod 2^31)
  used by the fingerprint/MinHash/SimHash operators.  Defined over code
  points so the *identical* arithmetic is expressible in ANSI SQL for the
  DuckDB oracles (list_reduce over characters) — unlike Spark's murmur3
  ``hash()`` which no other engine reproduces.
- ``register_function``: the engine's UDF registration hook (§2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

WORD_SPLIT_PATTERN = "\\W+"
# 2^31-ish modulus for the polynomial hash; small enough that products with
# base 31 stay exact in 64-bit integer arithmetic on both engines.
HASH_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)


def tokenize(col: Column | str) -> Column:
    """R7: lowercase + extract \\w+ runs → array of non-empty words.

    regexp_extract_all('\\w+') ≡ split('\\W+') minus empties (verified on
    fixtures), but single-pass and lambda-free — stays in codegen with no
    interpreted higher-order filter.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("\\w+"), 0)


def normalize_address(street: Column, zip_code: Column, city: Column) -> Column:
    """F8: AddressNormalizer semantics, builtin-only (no UDF needed)."""
    joined = F.concat_ws(", ", street, zip_code, city)
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.upper(joined), "\\W", " "), "\\s+", " "))


def word_code(col: Column | str, base: int = 31) -> Column:
    """Deterministic poly-``base`` hash of a string → int in [0, 2^31-1).

    fold over characters: acc = (acc*base + codepoint(ch)) % (2^31-1).
    Mirrors exactly in DuckDB:
      list_reduce([0] || list_transform(string_split(w,''), c -> ascii(c)),
                  (a, b) -> (a*base + b) % 2147483647)
    A second base (e.g. 37) gives an INDEPENDENT hash family over the
    same modulus — used to widen SimHash signatures portably.

    WARNING: never pass this function itself to a higher-order function
    (``F.transform(arr, word_code)``) — pyspark inspects the callable's
    arity, sees (col, base), and binds the element INDEX to ``base``.
    Always wrap: ``F.transform(arr, lambda w: word_code(w))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: F.length(ch) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % HASH_MOD,
    ).cast("long")


def register_function(spark: SparkSession, name: str, fn, return_type) -> None:
    """§2.8: user scalar-function registration hook (Python UDF).

    Prefer builtin expressions; this exists for API parity with the
    reference's ScalarFunction registration
    (reference source/flinkTableManipulation.scala:219-222).
    """
    spark.udf.register(name, fn, return_type)
