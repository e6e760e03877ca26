"""Content-addressed store as a native Spark data source (DataSource V2,
Python API — Spark 4's `pyspark.sql.datasource`).

The reference mounts content-addressed inputs into jobs: a StorageSpec
lists CIDs, the api-copy driver fetches each into a local cache keyed by
CID and bind-mounts it (`pkg/storage/types.go:23-42`,
`pkg/storage/ipfs_apicopy/storage.go:87-143`). This module restates that
plane as a first-class Spark source instead of an engine-side staging step:

- the "store" is a directory of immutable blobs, each named by the
  md5 hex of its content (the CID analog);
- a read "mounts" a list of addresses (`addresses` option = the
  StorageSpec's CID list); each address becomes ONE InputPartition, so a
  1000-address mount reads 1000-way parallel on a cluster — the
  partition-granular restatement of the reference's one-mount-per-replica;
- content addressing makes reads VERIFIABLE: every partition re-hashes
  the bytes it read and fails loudly on a mismatch (the property the
  reference's whole design leans on — an address can't silently point at
  different data);
- a missing address fails at PLANNING time (the HasStorageLocally probe,
  `pkg/storage/ipfs_apicopy/storage.go:60-64`), not mid-job on one task.

Records are JSONL lines; the fixed schema is
(address string, line_no int, value string) — payload interpretation
belongs to the query, exactly like the reference's opaque mounted files.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def store_put(root: str, content: bytes) -> str:
    """Write `content` into the store, returning its address (md5 hex).
    Idempotent: identical content maps to the same blob (CID pinning)."""
    addr = hashlib.md5(content).hexdigest()
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, addr)
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(content)
        os.replace(tmp, path)  # atomic publish — readers never see partials
    return addr


def store_size(root: str, addr: str) -> int:
    """GetVolumeSize analog (`pkg/storage/ipfs_apicopy/storage.go:67-85`)."""
    return os.stat(os.path.join(root, addr)).st_size


class ContentStoreDataSource(DataSource):
    """`spark.read.format("contentstore").option("path", root)
    .option("addresses", "h1,h2,...").load()`"""

    @classmethod
    def name(cls) -> str:
        return "contentstore"

    def schema(self) -> str:
        return "address string, line_no int, value string"

    def reader(self, schema) -> "ContentStoreReader":
        return ContentStoreReader(self.options)


class ContentStoreReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        raw = options.get("addresses", "")
        self.addresses = [a for a in raw.split(",") if a]
        if not self.root:
            raise ValueError("contentstore requires option 'path'")
        if not self.addresses:
            raise ValueError("contentstore requires option 'addresses'")
        # Planning-time locality probe: every mounted address must exist
        # before any task launches (HasStorageLocally).
        missing = [a for a in self.addresses
                   if not os.path.exists(os.path.join(self.root, a))]
        if missing:
            raise FileNotFoundError(
                f"addresses not in store {self.root!r}: {missing}")

    def partitions(self):
        # one partition per address: the mount is the unit of parallelism
        return [InputPartition(a) for a in self.addresses]

    def read(self, partition):
        import hashlib as _hashlib  # executor-side; no module deps

        addr = partition.value
        with open(os.path.join(self.root, addr), "rb") as f:
            content = f.read()
        actual = _hashlib.md5(content).hexdigest()
        if actual != addr:
            # Verified read: the content no longer matches its address —
            # the store was corrupted/tampered. Failing the task is the
            # only correct outcome for a content-addressed read.
            raise IOError(
                f"content integrity failure for {addr}: hash {actual}")
        for i, line in enumerate(content.decode("utf-8").splitlines()):
            yield (addr, i, line)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(ContentStoreDataSource)


def read_addresses(spark, root: str, addresses: list[str]):
    """Convenience mount: the PrepareStorage verb."""
    register(spark)
    return (spark.read.format("contentstore")
            .option("path", root)
            .option("addresses", ",".join(addresses))
            .load())


def store_put_json_rows(root: str, rows: list[dict]) -> str:
    """Serialize rows to canonical JSONL and store them; returns the
    address. The writer-side half of a round-trip test."""
    content = "\n".join(
        json.dumps(r, sort_keys=True) for r in rows).encode("utf-8")
    return store_put(root, content)
