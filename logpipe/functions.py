"""Scalar function layer (SURVEY.md §2.5 'String/date/JSON scalar
functions') — the out_erda plugin's helper functions as columnar
expressions.

- basic_auth_header: base64("user:pass") Authorization value
  (out_erda/helps.go:73-76 + remote.go:70-75).
- host_join_path: URL join with slash normalization
  (out_erda/remote.go:164-166, tested by remote_test.go:65-91:
  trailing host slashes and leading path slashes collapse to one).
- rfc3339_to_unix_nanos: record-time parsing, RFC3339Nano -> epoch
  nanos (helps.go:52-63, outerda.go:113). Spark timestamps hold
  micros, so nanos beyond micro precision truncate (documented
  deviation: the reference keeps full nanos).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def basic_auth_header(user: Column, password: Column) -> Column:
    return F.concat(
        F.lit("Basic "),
        F.base64(F.encode(F.concat(user, F.lit(":"), password), "utf-8")),
    )


def host_join_path(host: Column, path: Column) -> Column:
    return F.concat(
        F.regexp_replace(host, "/+$", ""),
        F.lit("/"),
        F.regexp_replace(path, "^/+", ""),
    )


def rfc3339_to_unix_nanos(s: Column) -> Column:
    ts = F.to_timestamp(
        F.regexp_replace(s, r"(\.\d{6})\d*", "$1"), "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]X"
    )
    return F.unix_micros(ts) * F.lit(1000)
