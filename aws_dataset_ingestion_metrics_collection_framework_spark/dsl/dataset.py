"""Dataset — a named table in a lake catalog.

API parity with ref:dataquality/dataset.py:3-18: fields ``catalog``,
``database``, ``table``, ``alias`` (alias defaults to the table name).
In this engine a Dataset resolves to a registered temp view / catalog table
that ``spark.sql`` can reference by ``alias``.
"""

from __future__ import annotations


class Dataset:
    """A single dataset in the lake catalog."""

    catalog: str
    database: str
    table: str
    alias: str

    def __init__(self, database: str, table: str, alias: str = "", catalog: str = ""):
        self.database = database
        self.table = table
        self.catalog = catalog
        self.alias = alias if alias else table

    def qualified_name(self) -> str:
        """``database.table`` (engine extension; the reference keeps the pair
        separate and lets Glue resolve it)."""
        return f"{self.database}.{self.table}" if self.database else self.table

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Dataset(database={self.database!r}, table={self.table!r}, "
            f"alias={self.alias!r}, catalog={self.catalog!r})"
        )
