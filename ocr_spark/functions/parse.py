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

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..textops import parse_model_response


@pandas_udf("string")
def parse_response_udf(raw: pd.Series) -> pd.Series:
    return raw.map(parse_model_response)


def parse_response(col: Column) -> Column:
    """Column wrapper: parse a raw model-response column into text."""
    return parse_response_udf(col)
