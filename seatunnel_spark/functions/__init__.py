from seatunnel_spark.functions.sql_engine import ZetaSqlError, zeta_sql_transform
from seatunnel_spark.functions.zeta import ALL_ZETA_FUNCTIONS, rewrite_zeta_expr

__all__ = ["ZetaSqlError", "zeta_sql_transform", "ALL_ZETA_FUNCTIONS", "rewrite_zeta_expr"]
