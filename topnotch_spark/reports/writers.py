"""Report writers: ordered sections, single flush per plan.

Reference semantics (tnengine/TnWriter.scala): each command appends a
section; ``write_report(key)`` renders the JSON array of sections once.
Sinks: file (local or any Hadoop-FS URI — the reference's HDFS writer,
default dir ``topnotch/``), REST PUT. The reference's HBase sink needs an
HBase client that is not a public dependency of this engine — documented
as unsupported; selecting it raises.
"""

from __future__ import annotations

import json
import os


class _SectionedWriter:
    def __init__(self) -> None:
        self.sections: list = []

    def add_section(self, section) -> None:
        self.sections.append(section)

    def merged(self) -> str:
        return json.dumps(self.sections, indent=2, default=str)

    def write_report(self, key: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class FileWriter(_SectionedWriter):
    """Local-file or Hadoop-FS report sink (reference TnHDFSWriter,
    TnWriter.scala:65-80). ``dest`` defaults to ``topnotch/``."""

    def __init__(self, dest: str | None = None, spark=None):
        super().__init__()
        self.dest = dest or "topnotch/"
        self.spark = spark

    def write_report(self, key: str) -> None:
        payload = self.merged()
        if "://" in self.dest and self.spark is not None:
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            path = jvm.org.apache.hadoop.fs.Path(self.dest, key)
            fs = path.getFileSystem(conf)
            out = fs.create(path, True)
            try:
                out.write(bytearray(payload.encode("utf-8")))
            finally:
                out.close()
            return
        os.makedirs(self.dest, exist_ok=True)
        with open(os.path.join(self.dest, key), "w", encoding="utf-8") as f:
            f.write(payload)


class RESTWriter(_SectionedWriter):
    """PUT the merged report to ``dest/key`` (reference TnRESTWriter,
    TnWriter.scala:115-137), with bounded retry AND a per-attempt
    timeout (topnotch_spark.net.http_request_with_retry): a report PUT
    is the LAST action of a plan run, so a transient endpoint hiccup
    (refused connection during a rolling deploy, a 503) would otherwise
    throw away the whole run's results — and a HUNG endpoint (accepts,
    never answers) would block the run forever without the timeout,
    with the retry never engaging because nothing raises. ``retries``
    extra attempts, exponential backoff + deterministic jitter seeded
    from the report key; client errors (4xx) never retry."""

    def __init__(
        self,
        dest: str,
        retries: int = 2,
        backoff_base_s: float = 0.5,
        timeout_s: float = 30.0,
    ):
        super().__init__()
        self.dest = dest if dest.endswith("/") else dest + "/"
        self.retries = max(0, int(retries))
        self.backoff_base_s = backoff_base_s
        self.timeout_s = timeout_s

    def write_report(self, key: str) -> None:
        from topnotch_spark.net import http_request_with_retry

        http_request_with_retry(
            self.dest + key,
            data=self.merged().encode("utf-8"),
            method="PUT",
            headers={
                "Accept": "application/json",
                "Content-Type": "application/json",
            },
            retries=self.retries,
            backoff_base_s=self.backoff_base_s,
            timeout_s=self.timeout_s,
            jitter_key=key,
        )


def get_writer(root: dict, spark=None) -> _SectionedWriter:
    """Pick the writer from the plan's ``io`` namespace
    (reference: TnEngine.scala:272-283). Default: file writer."""
    io = root.get("io", {})
    kind = io.get("writer")
    if kind in (None, "hdfs"):
        return FileWriter(io.get("dest"), spark=spark)
    if kind == "rest":
        return RESTWriter(
            io["dest"],
            retries=io.get("retries", 2),
            backoff_base_s=io.get("backoffBaseS", 0.5),
            timeout_s=io.get("timeoutS", 30.0),
        )
    if kind == "hbase":
        raise NotImplementedError(
            "HBase report sink is not supported in topnotch_spark "
            "(no public HBase client dependency); use 'hdfs' or 'rest'."
        )
    raise ValueError(f"Unknown report writer: {kind!r}")
