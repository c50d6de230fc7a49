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
import urllib.request


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
    TnWriter.scala:115-137), with bounded retry: a report PUT is the
    LAST action of a plan run, so a transient endpoint hiccup (refused
    connection during a rolling deploy, a 503) would otherwise throw
    away the whole run's results. ``retries`` extra attempts with
    exponential backoff + deterministic jitter (seeded from the report
    key — reproducible, no RNG state); client errors (4xx) never
    retry — the payload will not get better."""

    def __init__(
        self,
        dest: str,
        retries: int = 2,
        backoff_base_s: float = 0.5,
    ):
        super().__init__()
        self.dest = dest if dest.endswith("/") else dest + "/"
        self.retries = max(0, int(retries))
        self.backoff_base_s = backoff_base_s

    def write_report(self, key: str) -> None:
        import time
        import urllib.error

        payload = self.merged().encode("utf-8")
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            if attempt:
                # exponential backoff with ±25% deterministic jitter
                # (md5 of key+attempt), so simultaneous writers from a
                # fleet of plan runs do not re-collide in lockstep
                import hashlib

                h = hashlib.md5(f"{key}:{attempt}".encode()).digest()[0]
                jitter = 0.75 + 0.5 * (h / 255.0)
                time.sleep(
                    self.backoff_base_s * (2 ** (attempt - 1)) * jitter
                )
            req = urllib.request.Request(
                self.dest + key,
                data=payload,
                method="PUT",
                headers={
                    "Accept": "application/json",
                    "Content-Type": "application/json",
                },
            )
            try:
                urllib.request.urlopen(req)  # noqa: S310 — user endpoint
                return
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:
                    raise  # client error: retrying cannot help
                last = e
            except (urllib.error.URLError, OSError) as e:
                last = e
        assert last is not None
        raise last


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
        )
    if kind == "hbase":
        raise NotImplementedError(
            "HBase report sink is not supported in topnotch_spark "
            "(no public HBase client dependency); use 'hdfs' or 'rest'."
        )
    raise ValueError(f"Unknown report writer: {kind!r}")
