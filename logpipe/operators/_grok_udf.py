"""Arrow-vectorized grok UDF (no `from __future__ import annotations`
here — pyspark infers the pandas UDF eval type from real type hints)."""

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_erda_info_udf(pattern: str):
    # re.ASCII pins \w to [0-9A-Za-z_], matching java.util.regex and
    # the reference's Go RE2; Python's default Unicode \w would accept
    # e.g. "é" as a service-name char where the JVM variant does not
    # (same divergence class the pyref oracle fixed in round 9).
    # Python's default `.` (excludes only \n) already matches the
    # (?d)-pinned JVM side — see operators.parse._java.
    pat = re.compile(pattern, re.ASCII)

    @pandas_udf("level string, request_id string")
    def _extract(s: pd.Series) -> pd.DataFrame:
        ext = s.str.extract(pat)
        return pd.DataFrame({"level": ext[0].fillna(""), "request_id": ext[3].fillna("")})

    return _extract
