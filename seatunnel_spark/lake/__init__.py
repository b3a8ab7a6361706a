from seatunnel_spark.lake.table import LakeTable
from seatunnel_spark.lake.merge import merge_into

__all__ = ["LakeTable", "merge_into"]
