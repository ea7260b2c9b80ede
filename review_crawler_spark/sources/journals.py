"""Journals dimension loader — tolerant of the reference's dirty JSON.

The reference ships ``scraped/mdpi/journals.json`` (391-line abbrev→title
map) with a syntax error at line 184 (``"insects": "Insects"=,``) that makes
strict ``json.loads`` fail — SURVEY.md §1.1 flags it as dirty input to
handle, not to crash on. The loader tries strict JSON first and falls back
to a line-wise ``"key": "value"`` extraction that survives that class of
corruption, then materializes a broadcast-ready dimension (J6).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from ..schemas import JOURNALS_SCHEMA

_PAIR_RX = re.compile(r'"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"')


def parse_journals_text(text: str) -> list[tuple[str, str]]:
    """abbrev→title pairs; strict JSON fast path, regex salvage fallback.

    The salvage pass keeps every well-formed ``"k": "v"`` pair on any line,
    which recovers all 390 clean entries plus the corrupted one (whose pair
    is intact — only the trailing ``=,`` is junk).
    """
    try:
        data = json.loads(text)
        return sorted((str(k), str(v)) for k, v in data.items())
    except json.JSONDecodeError:
        pairs: dict[str, str] = {}
        for m in _PAIR_RX.finditer(text):
            pairs[m.group(1)] = m.group(2)
        return sorted(pairs.items())


def journals_dim(spark: SparkSession, text: str) -> DataFrame:
    """Dirty-tolerant journals dimension, ready for broadcast equi-joins."""
    return spark.createDataFrame(parse_journals_text(text), JOURNALS_SCHEMA)


def synthetic_journals_json(n: int = 40, corrupt_line: int = 17) -> str:
    """A synthetic journals.json exhibiting the reference file's exact
    corruption class (``"k": "V"=,`` mid-file)."""
    lines = ["{"]
    for i in range(n):
        sep = "," if i < n - 1 else ""
        if i == corrupt_line:
            lines.append(f'    "journal{i}": "Journal {i}"={sep}')
        else:
            lines.append(f'    "journal{i}": "Journal {i}"{sep}')
    lines.append("}")
    return "\n".join(lines)
