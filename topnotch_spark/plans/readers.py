"""Plan/config readers: local file (with referrer-relative resolution,
package-resource fallback) and REST GET. ``${var}`` substitution from a CLI
dictionary happens on the raw text before JSON parse.

Reference semantics: tnengine/TnReader.scala — literal ``${name}`` →
value replacement (:30-37); file resolution order is referrer-relative
path, then bare filename in CWD, then classpath (:92-118); each parsed AST
gets a ``path`` key so nested configs resolve relative to their referrer
(:93, :101).
"""

from __future__ import annotations

import json
import os
import urllib.error
from pathlib import PurePosixPath


def _read_package_resource(config_path: str) -> str | None:
    """Classpath analog of TnReader.scala:104-118: the JVM resolves
    ``configPath`` against the classpath root, letting plans ship inside
    jars. The Python equivalent is a resource inside an installed package:
    ``a/b/plan.json`` is tried as package ``a.b`` + resource ``plan.json``,
    longest package prefix first. Returns the text, or None if no package
    owns the path.

    ``resources.files`` IMPORTS the named package — which runs arbitrary
    top-level code for whatever happens to share a typo'd path's first
    segment (``scripts/plan.json`` would import a ``scripts`` module
    from sys.path). Only already-imported packages and the engine's own
    namespace are eligible, and any import-time failure is treated as
    "no such resource" rather than propagated as a confusing error."""
    import sys
    from importlib import resources

    parts = PurePosixPath(config_path.lstrip("/")).parts
    for split in range(len(parts) - 1, 0, -1):
        pkg = ".".join(parts[:split])
        if pkg not in sys.modules and not pkg.startswith("topnotch_spark"):
            continue
        try:
            node = resources.files(pkg)
        except Exception:  # unimportable/broken module ⇒ not a resource root
            continue
        for p in parts[split:]:
            node = node / p
        if node.is_file():
            return node.read_text(encoding="utf-8")
    return None


def replace_variables(text: str, variables: dict[str, str] | None) -> str:
    for name, value in (variables or {}).items():
        text = text.replace("${%s}" % name, value)
    return text


class FileReader:
    def __init__(self, variables: dict[str, str] | None = None):
        self.variables = variables or {}

    def read_configuration(self, config_path: str, referrer: dict | None = None) -> dict:
        candidates = []
        if referrer is not None and referrer.get("path"):
            candidates.append(os.path.join(referrer["path"], config_path))
        candidates.append(config_path)
        candidates.append(os.path.basename(config_path))
        for cand in candidates:
            if os.path.isfile(cand):
                with open(cand, encoding="utf-8") as f:
                    obj = json.loads(replace_variables(f.read(), self.variables))
                obj.setdefault("path", os.path.dirname(os.path.abspath(cand)))
                return obj
        # last resort: a resource bundled inside an installed package —
        # the reference's classpath lookup (TnReader.scala:104-118),
        # which sets path="/" so nested refs resolve from the root.
        text = _read_package_resource(config_path)
        if text is not None:
            obj = json.loads(replace_variables(text, self.variables))
            obj.setdefault("path", "/")
            return obj
        raise FileNotFoundError(f"Can't find file {config_path}.")


class RESTReader:
    """Plan-server GET (reference TnReader.scala REST path) with the same
    bounded retry/backoff/timeout envelope as the report writer
    (topnotch_spark.net.http_request_with_retry): a plan fetched from a
    plan server mid-rolling-deploy (refused connection, 503) retries
    instead of failing the run before it starts; 4xx (plan genuinely
    absent) raises immediately."""

    def __init__(
        self,
        base_url: str,
        variables: dict[str, str] | None = None,
        retries: int = 2,
        backoff_base_s: float = 0.5,
        timeout_s: float = 30.0,
    ):
        self.base_url = base_url if base_url.endswith("/") else base_url + "/"
        self.variables = variables or {}
        self.retries = max(0, int(retries))
        self.backoff_base_s = backoff_base_s
        self.timeout_s = timeout_s

    def read_configuration(self, config_path: str, referrer: dict | None = None) -> dict:
        from topnotch_spark.net import http_request_with_retry

        url = self.base_url + config_path.lstrip("/")
        try:
            body = http_request_with_retry(
                url,
                retries=self.retries,
                backoff_base_s=self.backoff_base_s,
                timeout_s=self.timeout_s,
                jitter_key=config_path,
            )
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500:  # plan genuinely absent on the server
                raise ValueError(
                    f"Cant find configurations at {config_path}."
                ) from e
            raise  # 5xx survived the retries: a server problem, say so
        return json.loads(replace_variables(body.decode("utf-8"), self.variables))
