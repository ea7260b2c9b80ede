"""S2/W1: newest-version-per-article filename dedup.

The reference builds a dict[id → (max_version, filename)] over eLife
filenames like ``elife-47612-v2.xml``
(/root/reference/elife_crawler.py:219-234); here it is a window arg-max
that runs BEFORE any payload parse, so each article's bytes are read and
parsed exactly once (the reference's own manual optimization, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILENAME_RX = r"^([a-z]+)-(\d+)-v(\d+)\.xml$"


def latest_versions(files: DataFrame, path_col: str = "path") -> DataFrame:
    """files(path, …) → winners only, with article_id and version columns.

    Non-matching filenames (wrong extension, no -vN suffix) are dropped,
    mirroring the reference's extension filter (elife_crawler.py:222-224).
    """
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    tagged = (
        files.withColumn("_base", base)
        .withColumn("article_id", F.regexp_extract("_base", FILENAME_RX, 2))
        .withColumn("version", F.regexp_extract("_base", FILENAME_RX, 3).cast("int"))
        .filter(F.col("article_id") != "")
    )
    w = Window.partitionBy("article_id").orderBy(F.desc("version"), F.desc(path_col))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_base")
    )
