"""Warehouse catalog: named LakeTables under one root directory.

The reference resolves sink tables through catalog/factory plumbing
(seatunnel-api table/catalog/*). Here a catalog is a directory of table
directories; the atomic unit stays the per-table metadata CAS, so catalog
operations need no extra locking.
"""

from __future__ import annotations

import os
import shutil

from seatunnel_spark.lake.table import LakeTable


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.warehouse, name)

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if LakeTable.exists(os.path.join(self.warehouse, d))
        )

    def table_exists(self, name: str) -> bool:
        return LakeTable.exists(self._path(name))

    def create_table(self, name: str, fields, key, num_buckets: int = 16,
                     save_mode: str = "error_if_exists") -> LakeTable:
        return LakeTable.create(self._path(name), fields, key,
                                num_buckets=num_buckets, save_mode=save_mode)

    def load_table(self, name: str) -> LakeTable:
        if not self.table_exists(name):
            raise FileNotFoundError(f"no such table: {name}")
        return LakeTable.load(self._path(name))

    def drop_table(self, name: str) -> None:
        if not self.table_exists(name):
            raise FileNotFoundError(f"no such table: {name}")
        shutil.rmtree(self._path(name))
