"""OTel-lite tracing + structured JSON logging (reference parity:
src/utils/tracing/tracer.py, src/utils/tracing/decorators.py,
src/utils/logging/formatters.py).

The reference initializes the OpenTelemetry SDK with OTLP exporters and
wraps operations in spans via ``trace_function``; its logs are JSON
records carrying the active trace context. That SDK isn't available
here, and a Spark driver often can't run an exporter sidecar anyway —
so this is the same *surface* with an in-process implementation:

- :class:`Tracer` — ``with tracer.span("reconcile", table="orders"):``
  creates a span with ids, parent linkage (thread-local context stack),
  wall-time, attributes, and OK/ERROR status; finished spans collect in
  a bounded ring and render as JSON lines (one span per line — the
  shape an OTLP collector or log shipper ingests).
- :func:`trace_function` — decorator parity with the reference
  (src/utils/tracing/decorators.py:13): wraps a callable in a span
  named after it.
- :class:`JSONLogFormatter` — structured logs
  (src/utils/logging/formatters.py JSONFormatter): timestamp, level,
  logger, message, extras, and the ACTIVE trace/span ids, so logs
  correlate with spans exactly as the reference's do.

Driver-side only: spans time orchestration phases (reconcile, CDC
apply), never per-row work — zero cost on the data path at 100 TB.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import uuid
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

_local = threading.local()


def _ctx_stack() -> list["Span"]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def current_span() -> "Span | None":
    stack = _ctx_stack()
    return stack[-1] if stack else None


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_id: str | None
    start_ns: int
    attributes: dict[str, Any] = field(default_factory=dict)
    end_ns: int | None = None
    status: str = "OK"
    error: str | None = None

    @property
    def duration_ms(self) -> float | None:
        if self.end_ns is None:
            return None
        return (self.end_ns - self.start_ns) / 1e6

    def set_attribute(self, key: str, value: Any) -> None:
        self.attributes[key] = value

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "parent_id": self.parent_id,
            "start_unix_ns": self.start_ns,
            "duration_ms": self.duration_ms,
            "status": self.status,
            **({"error": self.error} if self.error else {}),
            "attributes": self.attributes,
        }


class _SpanContext:
    def __init__(self, tracer: "Tracer", span: Span):
        self._tracer = tracer
        self.span = span

    def __enter__(self) -> Span:
        _ctx_stack().append(self.span)
        return self.span

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.span.end_ns = time.time_ns()
        if exc is not None:
            self.span.status = "ERROR"
            self.span.error = f"{exc_type.__name__}: {exc}"[:500]
        stack = _ctx_stack()
        if stack and stack[-1] is self.span:
            stack.pop()
        self._tracer._finish(self.span)
        return False  # never swallow


class Tracer:
    """In-process tracer: span context managers, bounded span buffer,
    JSON-lines export. Disable like the reference (OTEL_SDK_DISABLED)
    to make ``span()`` a timing-only no-op that records nothing."""

    def __init__(self, service_name: str = "sqlserver-pg-cdc-spark",
                 max_spans: int = 10_000):
        self.service_name = service_name
        self.finished: deque[Span] = deque(maxlen=max_spans)
        self._lock = threading.Lock()
        self._flush_lock = threading.Lock()  # serializes flush_otlp
        self.disabled = os.getenv("OTEL_SDK_DISABLED", "").lower() == "true"

    def span(self, name: str, **attributes: Any) -> _SpanContext:
        parent = current_span()
        s = Span(
            name=name,
            trace_id=parent.trace_id if parent else uuid.uuid4().hex,
            span_id=uuid.uuid4().hex[:16],
            parent_id=parent.span_id if parent else None,
            start_ns=time.time_ns(),
            attributes={"service.name": self.service_name, **attributes},
        )
        return _SpanContext(self, s)

    def _finish(self, span: Span) -> None:
        if self.disabled:
            return
        with self._lock:
            self.finished.append(span)

    def export_json_lines(self) -> Iterator[str]:
        with self._lock:
            spans = list(self.finished)
        for s in spans:
            yield json.dumps(s.to_dict(), separators=(",", ":"), default=str)

    def clear(self) -> None:
        with self._lock:
            self.finished.clear()


def _otlp_attr_value(v: Any) -> dict[str, Any]:
    """One attribute value in the OTLP JSON mapping
    (opentelemetry-proto common/v1: AnyValue)."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}  # int64s are strings in OTLP JSON
    if isinstance(v, float):
        return {"doubleValue": v}
    return {"stringValue": str(v)}


class OtlpHttpExporter:
    """OTLP/HTTP traces exporter, stdlib-only (urllib): POSTs finished
    spans to ``{endpoint}/v1/traces`` in the OTLP JSON encoding — the
    wire format any OpenTelemetry collector ingests. This closes the
    reference-parity gap honestly: the reference configures the OTel SDK
    with OTLP exporters (src/utils/tracing/tracer.py); here the same
    wire protocol is spoken without the SDK dependency.

    Endpoint resolution follows the standard env vars:
    ``OTEL_EXPORTER_OTLP_ENDPOINT`` (default http://localhost:4318) and
    ``OTEL_EXPORTER_OTLP_HEADERS`` ("k=v,k2=v2"). Export is best-effort
    and driver-side only — a failed POST never disturbs the pipeline."""

    def __init__(
        self,
        endpoint: str | None = None,
        headers: dict[str, str] | None = None,
        timeout_s: float = 5.0,
    ):
        self.endpoint = (
            endpoint
            or os.getenv("OTEL_EXPORTER_OTLP_ENDPOINT")
            or "http://localhost:4318"
        ).rstrip("/")
        hdrs = dict(headers or {})
        env_hdrs = os.getenv("OTEL_EXPORTER_OTLP_HEADERS", "")
        for part in env_hdrs.split(","):
            if "=" in part:
                k, _, v = part.partition("=")
                hdrs.setdefault(k.strip(), v.strip())
        self.headers = hdrs
        self.timeout_s = timeout_s

    def encode(self, spans: list[Span], service_name: str) -> dict[str, Any]:
        """The OTLP JSON request body (ExportTraceServiceRequest)."""
        out_spans = []
        for s in spans:
            attrs = [
                {"key": k, "value": _otlp_attr_value(v)}
                for k, v in s.attributes.items()
                if k != "service.name"  # resource-level, not span-level
            ]
            span_json: dict[str, Any] = {
                "traceId": s.trace_id,  # 32 hex chars (uuid4().hex)
                "spanId": s.span_id,    # 16 hex chars
                "name": s.name,
                "kind": 1,  # SPAN_KIND_INTERNAL
                "startTimeUnixNano": str(s.start_ns),
                "endTimeUnixNano": str(s.end_ns or s.start_ns),
                "attributes": attrs,
                "status": (
                    {"code": 2, "message": s.error or ""}
                    if s.status == "ERROR"
                    else {"code": 1}
                ),
            }
            if s.parent_id:
                span_json["parentSpanId"] = s.parent_id
            out_spans.append(span_json)
        return {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {
                                "key": "service.name",
                                "value": {"stringValue": service_name},
                            }
                        ]
                    },
                    "scopeSpans": [
                        {
                            "scope": {"name": service_name},
                            "spans": out_spans,
                        }
                    ],
                }
            ]
        }

    def export(self, spans: list[Span], service_name: str) -> bool:
        """POST one OTLP JSON batch; True iff the collector accepted it
        (HTTP 2xx). Never raises — wire export is best-effort."""
        import urllib.error
        import urllib.request

        if not spans:
            return True
        body = json.dumps(
            self.encode(spans, service_name), separators=(",", ":"),
            default=str,
        ).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/v1/traces",
            data=body,
            headers={"Content-Type": "application/json", **self.headers},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return 200 <= resp.status < 300
        except (urllib.error.URLError, OSError, ValueError):
            return False


def flush_otlp(
    tracer: "Tracer | None" = None, exporter: OtlpHttpExporter | None = None
) -> bool:
    """Ship the tracer's finished spans over OTLP/HTTP; the buffer is
    cleared only on an accepted export (a down collector keeps spans in
    the bounded ring for the next flush)."""
    t = tracer or _tracer
    ex = exporter or OtlpHttpExporter()
    # one flusher at a time: two concurrent flushers would each pop
    # their snapshot's length, dropping spans only one of them exported
    with t._flush_lock:
        with t._lock:
            spans = list(t.finished)
        ok = ex.export(spans, t.service_name)
        if ok:
            exported = {id(s) for s in spans}  # spans list keeps them alive
            with t._lock:
                # pop by IDENTITY, not by count: if ring eviction ran
                # mid-flight the evicted spans were exported ones (the
                # deque evicts oldest-first), so the surviving prefix of
                # exported spans is exactly what should be removed —
                # newer, unexported spans stay for the next flush
                while t.finished and id(t.finished[0]) in exported:
                    t.finished.popleft()
    return ok


_tracer = Tracer()


def get_tracer() -> Tracer:
    """Global tracer, reference-style module singleton
    (src/utils/tracing/tracer.py `_tracer`)."""
    return _tracer


def trace_function(
    operation_name: str | None = None, **default_attributes: Any
) -> Callable:
    """Decorator parity with the reference's ``trace_function``
    (src/utils/tracing/decorators.py:13): run the callable inside a
    span named ``operation_name`` (default: qualified function name)."""

    def decorator(func: Callable) -> Callable:
        import functools

        name = operation_name or func.__qualname__

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with _tracer.span(name, **default_attributes):
                return func(*args, **kwargs)

        return wrapper

    return decorator


class JSONLogFormatter(logging.Formatter):
    """Structured JSON log lines with trace correlation (reference
    src/utils/logging/formatters.py JSONFormatter): standard fields plus
    any ``extra=`` dict keys, plus the active span's trace/span ids."""

    _RESERVED = frozenset(
        logging.LogRecord(None, 0, "", 0, "", (), None).__dict__
    ) | {"message", "asctime", "taskName"}

    def __init__(self, app_name: str = "sqlserver-pg-cdc-spark"):
        super().__init__()
        self.app_name = app_name

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "timestamp": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(record.created)
            )
            + f".{int(record.msecs):03d}Z",
            "level": record.levelname,
            "logger": record.name,
            "app": self.app_name,
            "message": record.getMessage(),
        }
        span = current_span()
        if span is not None:
            out["trace_id"] = span.trace_id
            out["span_id"] = span.span_id
        for k, v in record.__dict__.items():
            if k not in self._RESERVED and not k.startswith("_"):
                out[k] = v
        if record.exc_info:
            out["exception"] = self.formatException(record.exc_info)[:2000]
        return json.dumps(out, separators=(",", ":"), default=str)


def configure_json_logging(
    logger_name: str = "sqlserver_pg_cdc_spark", level: int = logging.INFO
) -> logging.Logger:
    """Attach a JSON-formatted stream handler (idempotent), reference
    src/utils/logging/config.py surface."""
    logger = logging.getLogger(logger_name)
    if not any(
        isinstance(h.formatter, JSONLogFormatter) for h in logger.handlers
    ):
        handler = logging.StreamHandler()
        handler.setFormatter(JSONLogFormatter())
        logger.addHandler(handler)
    # don't propagate to the root handler — a basicConfig'd root would
    # print a plain-text duplicate of every JSON line
    logger.propagate = False
    logger.setLevel(level)
    return logger
