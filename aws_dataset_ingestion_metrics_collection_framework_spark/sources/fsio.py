"""Scheme-aware tiny-file IO for job metadata (bookmarks, snapshot
markers) — the glue that makes `sources/bookmarks.py` and
`streaming/cdc.py` work when the lake lives on an object store.

The reference keeps this state in S3 + Glue (its add-partition lambda and
centralized-resources stack); engine-side the equivalent is: marker and
bookmark files live BESIDE the data, addressed by the same URI scheme as
the data itself. Two paths:

- **plain local paths** (no ``scheme://``): direct ``os``/``open`` IO —
  the fast path for tests and single-node runs, no JVM round-trips;
- **URI paths** (``file://``, ``hdfs://``, ``s3a://``, ...): the Hadoop
  FileSystem API via ``spark._jvm`` — the SAME FileSystem instances (and
  credentials/config) Spark's own reads and writes resolve, so wherever
  `spark.read.parquet` works, the marker IO works.

Commit protocol: write to ``<path>.tmp`` then rename onto ``<path>``,
via ``FileContext.rename(OVERWRITE)`` — atomic on HDFS and local file
systems. On S3 a rename is copy+delete (not atomic), but each marker is
a single tiny object and S3 PUTs are atomic per-object with
read-after-write consistency, so the worst case under a concurrent
reader is the PREVIOUS marker value — exactly the at-least-once contract
the callers already document.

These helpers are for KILOBYTE job metadata only (one JSON/string file
per job or snapshot) — never row data; row data goes through Spark
readers/writers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession


def has_scheme(path: str) -> bool:
    """True for URI-style paths that must go through Hadoop FileSystem."""
    return "://" in path


def urljoin(path: str, *parts: str) -> str:
    """Path join that never mangles URI schemes (os.path.join on Windows
    or with absolute parts is wrong for URIs; '/' is correct for both
    POSIX local paths and Hadoop URIs)."""
    if not has_scheme(path):
        return os.path.join(path, *parts)
    return "/".join([path.rstrip("/")] + [p.strip("/") for p in parts])


def _require_spark(spark: SparkSession | None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "URI-scheme marker paths need an active SparkSession to reach "
            "the Hadoop FileSystem API; start the session first (plain "
            "local paths work without one)."
        )
    return spark


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(path: str, spark: SparkSession | None = None) -> bool:
    if not has_scheme(path):
        return os.path.exists(path)
    fs, jpath, _ = _fs(_require_spark(spark), path)
    return fs.exists(jpath)


def is_dir(path: str, spark: SparkSession | None = None) -> bool:
    if not has_scheme(path):
        return os.path.isdir(path)
    fs, jpath, _ = _fs(_require_spark(spark), path)
    return fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory()


def list_names(path: str, spark: SparkSession | None = None) -> list[str]:
    """Child entry names of a directory ([] when absent)."""
    if not has_scheme(path):
        return os.listdir(path) if os.path.isdir(path) else []
    fs, jpath, _ = _fs(_require_spark(spark), path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def read_text(path: str, spark: SparkSession | None = None) -> str | None:
    """File contents as UTF-8, or None when the file does not exist."""
    if not has_scheme(path):
        if not os.path.exists(path):
            return None
        with open(path, "r", encoding="utf-8") as fh:
            return fh.read()
    spark = _require_spark(spark)
    fs, jpath, jvm = _fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(
    path: str, text: str, spark: SparkSession | None = None
) -> None:
    """Write-tmp-then-rename commit of a small text file (see module
    docstring for the per-filesystem atomicity contract)."""
    if not has_scheme(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    spark = _require_spark(spark)
    fs, jpath, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        # FileContext.rename(OVERWRITE): atomic replace on HDFS/local.
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jpath.toUri(), spark._jsc.hadoopConfiguration()
        )
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        ctx.rename(tmp, jpath, overwrite)
    except Exception:
        # Filesystems without a FileContext binding (some object-store
        # connectors): fall back to delete+rename — a tiny non-atomic
        # window in which the marker is absent; readers treat absent as
        # "no bookmark yet", i.e. replay, never skip.
        if fs.exists(jpath):
            fs.delete(jpath, False)
        if not fs.rename(tmp, jpath):
            raise IOError(f"rename {path}.tmp -> {path} failed")


def create_text_exclusive(
    path: str, text: str, spark: SparkSession | None = None
) -> bool:
    """Atomically create ``path`` with ``text`` ONLY if it does not exist;
    returns True when this call won the create, False when the file was
    already there. Unlike :func:`write_text_atomic` (replace semantics)
    this is the mutual-exclusion primitive — exactly one of N concurrent
    callers gets True, because the create itself is the check: POSIX
    ``O_CREAT|O_EXCL`` locally, ``FileSystem.create(path,
    overwrite=false)`` on Hadoop (throws ``FileAlreadyExistsException``
    when present — atomic on HDFS; object stores without atomic create
    degrade to check-then-act, same as every other marker there).
    Used for writer leases (streaming/ann_ingest.py's ``_ingest_owner``)
    where losing the race must be an observable refusal, not a silent
    second writer."""
    if not has_scheme(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(text)
        return True
    spark = _require_spark(spark)
    fs, jpath, _ = _fs(spark, path)
    try:
        out = fs.create(jpath, False)
    except Exception:
        # FileAlreadyExistsException (py4j-wrapped): lost the race.
        return False
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def write_json_dir(
    path: str,
    record: dict,
    mode: str = "error",
    spark: SparkSession | None = None,
) -> None:
    """Write a ONE-record JSON-lines "directory dataset" — the exact layout
    ``df.coalesce(1).write.json(path)`` produces (``part-00000*.json`` +
    ``_SUCCESS``) — without running a Spark job. Index manifests are a few
    hundred bytes; a distributed write for them is pure fixed overhead
    (one job + committer listing/renames per call, and the matching
    ``spark.read.json`` pays TWO jobs: schema inference + fetch). The tree
    stays readable by ``spark.read.json`` and by every pre-existing index
    (both directions are JSON lines), and the same scheme dispatch as the
    rest of this module keeps it working on any Hadoop filesystem.

    ``mode`` mirrors ``DataFrameWriter.mode``: ``error``/``errorifexists``
    refuses an existing ``path``, ``overwrite`` replaces it, ``ignore``
    returns silently when present, ``append`` adds another part file.
    """
    if mode in ("error", "errorifexists"):
        if exists(path, spark=spark):
            raise OSError(
                f"write_json_dir: destination already exists: {path} "
                "(PATH_ALREADY_EXISTS; pass mode='overwrite' to replace)"
            )
    elif mode == "ignore":
        if exists(path, spark=spark):
            return
    elif mode == "overwrite":
        delete(path, spark=spark)
    elif mode != "append":
        raise ValueError(f"write_json_dir: unsupported mode {mode!r}")
    n_parts = sum(
        1 for n in list_names(path, spark=spark) if not n.startswith(("_", "."))
    )
    part = urljoin(path, f"part-{n_parts:05d}.json")
    write_text_atomic(part, json.dumps(record) + "\n", spark=spark)
    write_text_atomic(urljoin(path, "_SUCCESS"), "", spark=spark)


def read_json_dir(path: str, spark: SparkSession | None = None) -> dict | None:
    """First record of a JSON-lines directory dataset (a
    :func:`write_json_dir` tree, or one written by
    ``df.write.json(path)``) — the no-Spark-job twin of
    ``spark.read.json(path).first()``. Returns the record as a dict
    (``rec["field"]`` access, exactly how every manifest consumer reads
    its Row today), or None when data files exist but hold no records —
    the same shape ``.first()`` gives on an empty dataset. A missing
    directory raises with ``PATH_NOT_FOUND`` in the message (matching
    Spark's error class for a missing read path)."""
    names = sorted(
        n for n in list_names(path, spark=spark) if not n.startswith(("_", "."))
    )
    if not names:
        if not exists(path, spark=spark):
            raise FileNotFoundError(
                f"[PATH_NOT_FOUND] read_json_dir: path does not exist: {path}"
            )
        raise ValueError(f"read_json_dir: no data files under {path}")
    for name in names:
        text = read_text(urljoin(path, name), spark=spark) or ""
        for line in text.splitlines():
            line = line.strip()
            if line:
                return json.loads(line)
    return None


def rename(src: str, dst: str, spark: SparkSession | None = None) -> None:
    """Rename/move ``src`` to ``dst`` (directory or file). Refuses when
    ``dst`` already exists — checked explicitly on EVERY filesystem,
    because the two underlying primitives would otherwise diverge
    silently: POSIX ``rename`` replaces an existing file, while Hadoop's
    ``FileSystem.rename`` moves ``src`` INTO an existing ``dst``
    directory (returning true — silent nesting, not an error). Callers
    sequencing a swap must delete the destination first; for
    replace-a-file semantics use :func:`write_text_atomic`'s
    FileContext(OVERWRITE) path instead. The exists-check-then-rename
    pair is not atomic — these helpers serve single-writer maintenance
    protocols (the swap/lease discipline), not concurrent writers."""
    if exists(dst, spark=spark):
        raise OSError(
            f"rename refused: destination exists: {dst} (delete it first)"
        )
    if not has_scheme(src):
        os.rename(src, dst)
        return
    fs, jsrc, jvm = _fs(_require_spark(spark), src)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise OSError(f"rename refused: {src} -> {dst}")


def delete(
    path: str, recursive: bool = True, spark: SparkSession | None = None
) -> None:
    if not has_scheme(path):
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, jpath, _ = _fs(_require_spark(spark), path)
    if fs.exists(jpath):
        fs.delete(jpath, recursive)
