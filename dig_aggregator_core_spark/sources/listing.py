"""DataFrame-native input discovery: the scale path for the engine's
listing + glob-match step (SURVEY.md §2.1 S1-S2, §2.2 P5-P8).

Driver-side listing (plans/context.local_lister) mirrors the reference's
S3 LIST exactly and is fine for metadata-sized input sets. When the input
catalog itself is large (millions of objects), the same match/capture
semantics run fully in Spark: keys as a DataFrame, glob matching as
compiled-regex `rlike` columns, captures as `regexp_extract` — this module
provides that form.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.glob import Glob
from ..functions.paths import basename_col, dirname_col
from ..plans.inputs import Source


def inputs_df(
    spark: SparkSession, listing: list[tuple[str, datetime]]
) -> DataFrame:
    """A listing as an inputs DataFrame (key, version, basename, dirname)."""
    df = spark.createDataFrame(listing, "key string, version timestamp")
    return df.select(
        "key",
        "version",
        basename_col(F.col("key")).alias("basename"),
        dirname_col(F.col("key")).alias("dirname"),
    )


def match_source(df: DataFrame, source: Source) -> DataFrame:
    """Filter an inputs DataFrame to rows matching a Source: full basename
    glob match AND partial prefix glob match (Input.scala:48-50), as two
    rlike predicates — pure Catalyst, no Python per row."""
    return df.filter(
        F.col("basename").rlike(source.basename_glob.regex(partial=False))
        & F.col("dirname").rlike(source.prefix_glob.regex(partial=True))
    )


def extract_captures(df: DataFrame, source: Source, names: list[str]) -> DataFrame:
    """Add capture columns from the source's globs (Input.scala:58-62 as
    regexp_extract): prefix captures first, then basename captures."""
    import re

    p_rx = source.prefix_glob.regex(partial=True)
    b_rx = source.basename_glob.regex(partial=True)
    # actual group count, not "(" occurrences: "(" / ")" are valid glob
    # literals (Glob.scala validChar) and appear re.escape'd in the regex
    n_prefix = re.compile(p_rx).groups
    cols = list(df.columns)
    out = df
    for idx, name in enumerate(names, start=1):
        if idx <= n_prefix:
            out = out.withColumn(
                name, F.regexp_extract(F.col("dirname"), p_rx, idx)
            )
        else:
            out = out.withColumn(
                name,
                F.regexp_extract(F.col("basename"), b_rx, idx - n_prefix),
            )
    return out.select(*cols, *names)
