"""`warclite` — a record-oriented corpus container as a native Spark
Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The training-data world moves corpora as record containers (WARC,
tar-of-docs, ...): a header per record, an opaque binary payload, and
file-level statistics for data skipping. This module implements a
minimal such format END TO END as a first-class `spark.read.format(...)`
/ `df.write.format(...)` source — reader, writer, partition planning,
and source-level filter pushdown — so the engine's §2.1 surface covers
"bring your own container format", not just the built-in file sources.

Format (one `part-*.wlc` file per write task):
    WLC1 <n_records> <min_doc_id> <max_doc_id>\\n     file header
    <doc_id>\\t<mime>\\t<payload_len>\\n<payload>\\n    per record

Scale design:
- one InputPartition per FILE (the Hadoop-split unit) — a 1000-file
  corpus reads with 1000-way parallelism, no driver-side data motion;
- `pushFilters` accepts doc_id comparisons and prunes WHOLE FILES via
  the header's min/max before any payload byte is read — the same
  manifest-skipping contract Iceberg/Delta data files have (q123's
  z-order stats, enforced at the source boundary). All filters are
  also returned as unhandled so Spark re-applies them row-level —
  pushdown here is a pruning optimization, never a correctness
  dependency;
- the writer emits one file per partition with a commit message per
  task; an aborted task leaves only an uncommitted temp file.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
    ]
)

_MAGIC = b"WLC1"


def write_wlc_file(path: str, records: list[tuple[int, str, bytes]]) -> None:
    """Write one .wlc file (helper shared by the writer and tests)."""
    ids = [r[0] for r in records]
    mn = min(ids) if ids else 0
    mx = max(ids) if ids else -1
    with open(path, "wb") as f:
        f.write(b"%s %d %d %d\n" % (_MAGIC, len(records), mn, mx))
        for doc_id, mime, payload in records:
            f.write(b"%d\t%s\t%d\n" % (doc_id, mime.encode("utf-8"), len(payload)))
            f.write(payload)
            f.write(b"\n")


def read_wlc_header(path: str) -> tuple[int, int, int]:
    """(n_records, min_doc_id, max_doc_id) from a file header only."""
    with open(path, "rb") as f:
        line = f.readline()
    parts = line.split()
    if len(parts) != 4 or parts[0] != _MAGIC:
        raise ValueError(f"{path}: not a WLC1 file")
    return int(parts[1]), int(parts[2]), int(parts[3])


def read_wlc_records(path: str) -> Iterator[tuple[int, str, bytes]]:
    with open(path, "rb") as f:
        header = f.readline()
        if not header.startswith(_MAGIC):
            raise ValueError(f"{path}: not a WLC1 file")
        n = int(header.split()[1])
        for _ in range(n):
            meta = f.readline()
            doc_id_b, mime_b, ln_b = meta.rstrip(b"\n").split(b"\t")
            payload = f.read(int(ln_b))
            if f.read(1) != b"\n":
                raise ValueError(f"{path}: corrupt record terminator (doc {int(doc_id_b)})")
            yield int(doc_id_b), mime_b.decode("utf-8"), payload


@dataclass
class _FilePartition(InputPartition):
    path: str


def _file_range_survives(filters: list[Filter], mn: int, mx: int) -> bool:
    """Can any doc_id in [mn, mx] satisfy all pushed doc_id filters?"""
    for f in filters:
        v = f.value
        if isinstance(f, EqualTo) and not (mn <= v <= mx):
            return False
        if isinstance(f, GreaterThan) and not (mx > v):
            return False
        if isinstance(f, GreaterThanOrEqual) and not (mx >= v):
            return False
        if isinstance(f, LessThan) and not (mn < v):
            return False
        if isinstance(f, LessThanOrEqual) and not (mn <= v):
            return False
    return True


class WarcLiteReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warclite requires a path")
        self.dir = path
        self.doc_filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep doc_id comparison filters for FILE pruning; hand every
        filter back as unhandled so Spark still applies them row-level
        (source pruning is an optimization, never a correctness
        dependency)."""
        for f in filters:
            if (
                isinstance(
                    f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
                )
                and f.attribute == ("doc_id",)
                and isinstance(f.value, int)
            ):
                self.doc_filters.append(f)
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            os.path.join(self.dir, n) for n in os.listdir(self.dir) if n.endswith(".wlc")
        )
        out = []
        for p in files:
            n, mn, mx = read_wlc_header(p)
            if n == 0:
                continue
            if self.doc_filters and not _file_range_survives(self.doc_filters, mn, mx):
                continue  # whole-file skip from header stats alone
            out.append(_FilePartition(p))
        return out

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from read_wlc_records(partition.path)


@dataclass
class _WlcCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_records: int


class WarcLiteWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warclite requires a path")
        self.dir = path
        self.overwrite = overwrite

    def write(self, iterator) -> _WlcCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-part-{pid:05d}.wlc")
        final = os.path.join(self.dir, f"part-{pid:05d}.wlc")
        records = [
            (int(row["doc_id"]), str(row["mime"]), bytes(row["content"])) for row in iterator
        ]
        write_wlc_file(tmp, records)
        return _WlcCommit(tmp_path=tmp, final_path=final, n_records=len(records))

    def commit(self, messages) -> None:
        finals = {m.final_path for m in messages}
        if self.overwrite and os.path.isdir(self.dir):
            # a previous write with MORE partitions must not leave stale
            # part files behind the new dataset
            for n in os.listdir(self.dir):
                p = os.path.join(self.dir, n)
                if n.endswith(".wlc") and not n.startswith("_tmp-") and p not in finals:
                    os.remove(p)
        for m in messages:
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class WarcLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> WarcLiteReader:
        return WarcLiteReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcLiteWriter:
        return WarcLiteWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> "WarcLiteStreamReader":
        return WarcLiteStreamReader(self.options)


class WarcLiteReaderNoPushdown(WarcLiteReader):
    """Reader variant WITHOUT pushFilters, for sessions where
    spark.sql.python.filterPushdown.enabled cannot be turned on.

    Spark 4 raises DATA_SOURCE_PUSHDOWN_DISABLED when a reader merely
    *implements* pushFilters while the conf is false, so the fallback
    must drop the method, not just skip the pruning.  Restoring the base
    DataSourceReader attribute makes `type(reader).pushFilters is
    DataSourceReader.pushFilters` true, which is how Spark detects
    "not implemented".  File pruning is lost; correctness is not (the
    reader always hands every filter back for row-level evaluation).
    """

    pushFilters = DataSourceReader.pushFilters


class WarcLiteDataSourceNoPushdown(WarcLiteDataSource):
    def reader(self, schema: StructType) -> WarcLiteReader:
        return WarcLiteReaderNoPushdown(self.options)


def register(spark) -> type:
    """Register the source on a session: spark.read.format('warclite').

    Works on VANILLA sessions (e.g. the correctness driver's), not just
    ones built by session.get_spark(): the reader's pushFilters requires
    spark.sql.python.filterPushdown.enabled, which is a runtime SQL conf,
    so set it here; if the session refuses (conf locked), register the
    no-pushdown reader variant instead — same results, no file pruning.

    SESSION-WIDE effect (deliberate): the conf must still be true when
    the query EXECUTES, so it cannot be set-and-restored here — enabling
    it also enables filter pushdown for every other Python data source
    on the session (the conf's default is false only because the feature
    is new; pushdown is semantics-preserving by contract). An operator
    who explicitly launched the session with the conf set to false keeps
    that choice: we detect a launch-time setting via SparkConf and
    register the no-pushdown variant instead of overriding.
    """
    # Ship this module BY VALUE inside the pickled DataSource command:
    # cloudpickle normally pickles a module-level class by REFERENCE,
    # which makes every Python worker re-import this package — and a
    # driver running from a foreign cwd (the correctness harness runs
    # from /tmp with only driver-side sys.path injection) has no way to
    # put the repo on the workers' import path after the JVM is up.
    # By-value registration is safe here because warclite.py is
    # self-contained (stdlib + pyspark only); on a real cluster the
    # same call is a no-op in effect since --py-files ships the package
    # anyway. (Observed failure without this: PYTHON_DATA_SOURCE_ERROR
    # / ModuleNotFoundError in write_into_data_source.py read_command.)
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: fall back to by-reference (cwd-dependent)

    conf_key = "spark.sql.python.filterPushdown.enabled"
    # An explicit operator opt-out is honored whether it was set at
    # launch (SparkConf) or at runtime (spark.conf.set before
    # register()), and case-insensitively — 'False' means false
    # (ADVICE r8).
    opted_out = False
    try:
        launch_time = spark.sparkContext.getConf().get(conf_key, None)
        if launch_time is not None and launch_time.lower() == "false":
            opted_out = True
    except Exception:
        pass
    try:
        runtime = spark.conf.get(conf_key, None)
        if runtime is not None and runtime.lower() == "false":
            opted_out = True
    except Exception:
        pass
    if opted_out:
        enabled = False  # explicit operator choice — honor it
    else:
        try:
            spark.conf.set(conf_key, "true")
            enabled = spark.conf.get(conf_key) == "true"
        except Exception:
            enabled = False
    chosen = WarcLiteDataSource if enabled else WarcLiteDataSourceNoPushdown
    spark.dataSource.register(chosen)
    return chosen


# ---------------------------------------------------------------------------
# Streaming reader: the crawl-increment ingest shape — new .wlc files
# landing in the directory become micro-batches. Offsets are the set of
# already-ingested file names, so a restart from checkpoint resumes
# exactly where the last run stopped and readBetweenOffsets replays any
# batch deterministically (exactly-once with an idempotent sink).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class WarcLiteStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warclite requires a path")
        self.dir = path

    def _files(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(n for n in os.listdir(self.dir) if n.endswith(".wlc"))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [n for n in self._files() if n not in seen]
        rows = []
        for n in new:
            rows.extend(read_wlc_records(os.path.join(self.dir, n)))
        end = {"seen": sorted(seen | set(new))}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        for n in replay:
            yield from read_wlc_records(os.path.join(self.dir, n))

    def commit(self, end: dict) -> None:
        pass  # source files are immutable; nothing to clean up


def compact(spark, src_dir: str, dst_dir: str, target_files: int) -> None:
    """Compact a warclite directory (the small-files problem): read all
    records, range-cluster by doc_id, rewrite as `target_files` files.

    repartitionByRange gives each output file a NARROW, near-disjoint
    doc_id span, so the header min/max stats prune harder after
    compaction than before — compaction improves both open() overhead
    AND data skipping, exactly like OPTIMIZE on a lakehouse table
    (q123's z-order is the multi-column version of the same idea)."""
    register(spark)
    df = spark.read.format("warclite").load(src_dir)
    (
        df.repartitionByRange(target_files, "doc_id")
        .write.format("warclite")
        .mode("overwrite")
        .save(dst_dir)
    )
