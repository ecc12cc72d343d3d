"""OTel-lite tracing shim + structured JSON logging (reference parity:
src/utils/tracing/tracer.py, decorators.py; src/utils/logging/formatters.py)."""

import json
import logging

import pytest

from sqlserver_pg_cdc_spark.tracing import (
    JSONLogFormatter,
    Tracer,
    current_span,
    get_tracer,
    trace_function,
)


def test_span_nesting_and_ids():
    tr = Tracer()
    with tr.span("outer", table="orders") as outer:
        assert current_span() is outer
        with tr.span("inner") as inner:
            assert inner.trace_id == outer.trace_id  # same trace
            assert inner.parent_id == outer.span_id
    assert current_span() is None
    spans = [json.loads(line) for line in tr.export_json_lines()]
    names = [s["name"] for s in spans]
    assert names == ["inner", "outer"]  # inner finishes first
    assert all(s["duration_ms"] >= 0 for s in spans)
    assert spans[1]["attributes"]["table"] == "orders"
    assert spans[1]["parent_id"] is None


def test_span_error_status_propagates_exception():
    tr = Tracer()
    with pytest.raises(ValueError):
        with tr.span("boom"):
            raise ValueError("nope")
    (span,) = [json.loads(line) for line in tr.export_json_lines()]
    assert span["status"] == "ERROR"
    assert "ValueError" in span["error"]


def test_trace_function_decorator():
    tr = get_tracer()
    tr.clear()

    @trace_function(operation_name="my_op", table="t1")
    def work(x):
        return x + 1

    assert work(1) == 2
    spans = [json.loads(line) for line in tr.export_json_lines()]
    assert spans[-1]["name"] == "my_op"
    assert spans[-1]["attributes"]["table"] == "t1"
    tr.clear()


def test_json_log_formatter_trace_correlation():
    tr = get_tracer()
    fmt = JSONLogFormatter()
    logger = logging.getLogger("test.tracing")
    rec = logger.makeRecord(
        "test.tracing", logging.INFO, __file__, 1, "applied %d rows", (42,),
        None, extra={"table": "orders"},
    )
    with tr.span("apply") as span:
        line = json.loads(fmt.format(rec))
    assert line["message"] == "applied 42 rows"
    assert line["level"] == "INFO"
    assert line["table"] == "orders"
    assert line["trace_id"] == span.trace_id
    assert line["span_id"] == span.span_id
    assert line["timestamp"].endswith("Z")
    tr.clear()


def test_disabled_tracer_records_nothing(monkeypatch):
    monkeypatch.setenv("OTEL_SDK_DISABLED", "true")
    tr = Tracer()
    with tr.span("invisible"):
        pass
    assert list(tr.export_json_lines()) == []


def test_reconcile_table_emits_phase_spans(spark):
    from sqlserver_pg_cdc_spark.runner import reconcile_table

    tr = get_tracer()
    tr.clear()
    df = spark.range(10).withColumnRenamed("id", "pk")
    res = reconcile_table(df, df, "t", pk_cols=["pk"], validate_checksums=True)
    assert res["status"] == "MATCH"
    spans = [json.loads(line) for line in tr.export_json_lines()]
    names = {s["name"] for s in spans}
    assert {"reconcile_table", "count_comparison", "checksum_comparison"} <= names
    root = [s for s in spans if s["name"] == "reconcile_table"][0]
    children = [s for s in spans if s["parent_id"] == root["span_id"]]
    assert len(children) >= 2
    tr.clear()
