"""Structured metrics logging.

The reference logs with bare `print(..., flush=True)` everywhere (SURVEY.md
§5 observability); here training metrics go to a JSONL stream (one object per
event) next to the Python logger, so dashboards/parsers get machine-readable
history without scraping stdout.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

log = logging.getLogger("orbit2_tpu")


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, event: str, **fields: Any):
        record: Dict[str, Any] = {"event": event, "time": time.time(), **fields}
        if self._fh:
            self._fh.write(json.dumps(record, default=float) + "\n")
        if self.echo:
            log.info("%s %s", event,
                     " ".join(f"{k}={v}" for k, v in fields.items()))
        return record

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
