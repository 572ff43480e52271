"""The reference's deterministic response parser (M6/M7) as an
Arrow-batched pandas UDF.

`textops.parse_model_response` reproduces byte-for-byte the
reference's primary parser (core/page_processor.py:1088-1155: strip,
un-fence ``` blocks, json.loads -> content/text field, marker/skip-line
fallback). This module lifts that pure function onto columns so it can
run where the reference ran it — per page, at scale — while the same
function remains the pytest oracle.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..textops import (
    join_content_blocks,
    legacy_delimiter_parse,
    parse_model_response,
    parse_with_mode,
)


@pandas_udf("string")
def parse_response_udf(raw: pd.Series) -> pd.Series:
    return raw.map(parse_model_response)


def parse_response(col: Column) -> Column:
    """Column wrapper: parse a raw model-response column into text."""
    return parse_response_udf(col)


@pandas_udf("string")
def parse_mode_udf(raw: pd.Series) -> pd.Series:
    return raw.map(lambda s: parse_with_mode(s)[0])


def parse_mode(col: Column) -> Column:
    """M5 response validation as data: 'empty' | 'json' | 'fallback'
    (which branch of the reference's validator a response would take)."""
    return parse_mode_udf(col)


@pandas_udf("string")
def legacy_parse_udf(raw: pd.Series) -> pd.Series:
    return raw.map(legacy_delimiter_parse)


def legacy_parse(col: Column) -> Column:
    """The oldest delimiter-cut parse variant (reference
    main.py:649-656) as a column."""
    return legacy_parse_udf(col)


@pandas_udf("string")
def join_blocks_udf(raw_json: pd.Series) -> pd.Series:
    def one(s):
        if s is None:
            return None
        try:
            data = json.loads(s)
        except (ValueError, TypeError):
            return None
        return join_content_blocks(data)

    return raw_json.map(one)


def join_blocks(col: Column) -> Column:
    """M8 multi-block content joining (reference
    task_manager.py:1946-1959) over a JSON-encoded content field."""
    return join_blocks_udf(col)
