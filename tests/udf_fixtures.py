"""Importable UDF fixtures for the config-path ZetaUDF SPI tests."""

import pandas as pd


def double_len(s: pd.Series) -> pd.Series:
    """Plain pandas-Series callable — run_job wraps it as a pandas_udf."""
    return (s.str.len() * 2).astype("int64")
