"""Arrow-vectorized grok UDF (no `from __future__ import annotations`
here — pyspark infers the pandas UDF eval type from real type hints)."""

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_erda_info_udf(pattern: str):
    pat = re.compile(pattern)

    @pandas_udf("level string, request_id string")
    def _extract(s: pd.Series) -> pd.DataFrame:
        ext = s.str.extract(pat)
        return pd.DataFrame({"level": ext[0].fillna(""), "request_id": ext[3].fillna("")})

    return _extract
