"""Tiny Hadoop-FileSystem wrappers for driver-side metadata I/O.

Spark writes its data (parquet epochs, checkpoints) through the Hadoop
FileSystem API, so any *driver-side bookkeeping files that live next to
that data* (manifests, commit markers) must go through the same API —
posix `open`/`os.replace` silently does the wrong thing the moment the
store root is `hdfs://`, `s3a://` or any other non-local URI (ADVICE r4:
the SignatureStore manifest previously diverged from its own parquet files
on shared storage).

These helpers resolve the FileSystem *from the path's own scheme* via the
active Hadoop configuration, so `file:`, `hdfs:`, `s3a:` (and bare local
paths) all route correctly. They are for small metadata blobs only —
manifest-sized JSON, not data.

Atomicity note: `write_text` writes to a `.tmp` sibling then
delete+rename. On HDFS rename is atomic but the delete+rename pair is
not — a crash in the gap loses the destination. Callers that need
crash-consistency must therefore make the file *recoverable from the data
layout itself* (the SignatureStore rebuilds its manifest from `_SUCCESS`
markers when the manifest is absent) rather than lean on the rename.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    fs.mkdirs(p)


def read_text(spark: SparkSession, path: str) -> str:
    fs, p, jvm = _fs(spark, path)
    stream = fs.open(p)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        # hadoop IOUtils ships with every Spark distribution
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
        return baos.toString("UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """tmp-write + delete + rename (see module docstring for the atomicity
    contract — pair this with a recovery path, not blind trust).

    Hadoop FileSystem signals most failures by RETURNING FALSE rather than
    throwing — a silently-failed manifest commit would leave the caller
    believing an epoch committed, so false results raise here."""
    fs, p, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p) and not fs.delete(p, False):
        raise IOError(f"hfs.write_text: delete of existing {path} failed")
    if not fs.rename(tmp, p):
        raise IOError(f"hfs.write_text: rename {path}.tmp -> {path} failed")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete a file/dir; False when absent. Raises on a reported failure
    (Hadoop returns false for 'existed but could not delete' too — callers
    that must distinguish should check exists() first, as ours do)."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return False
    if not fs.delete(p, recursive):
        raise IOError(f"hfs.delete: delete of {path} failed")
    return True


def list_names(spark: SparkSession, dir_path: str) -> list[str]:
    """Child names of a directory ([] when absent)."""
    fs, p, _ = _fs(spark, dir_path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]
