"""Reconciliation reporting (reference A5-A8, report/generator.py and
report/formatters.py).

Driver-side assembly over per-table result dicts — this data is tiny
(one record per table), so plain Python is the right altitude; the heavy
lifting (counts, checksums, diffs) already happened distributed.
"""

from __future__ import annotations

import csv
import datetime as _dt
import io
import json
from typing import Any

ROW_COUNT_MISMATCH = "ROW_COUNT_MISMATCH"
CHECKSUM_MISMATCH = "CHECKSUM_MISMATCH"


def _now_iso() -> str:
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


def calculate_severity(source_count: int, difference: int) -> str:
    """Severity buckets (generator.py:178-202): <0.1% LOW, <1% MEDIUM,
    <10% HIGH, else CRITICAL; empty source special-cased."""
    if source_count == 0:
        return "LOW" if difference == 0 else "CRITICAL"
    pct = (difference / source_count) * 100
    if pct < 0.1:
        return "LOW"
    if pct < 1.0:
        return "MEDIUM"
    if pct < 10.0:
        return "HIGH"
    return "CRITICAL"


def generate_report(comparison_results: list[dict[str, Any]]) -> dict[str, Any]:
    """Roll per-table comparison results into one report dict with the
    reference's exact shape: status PASS/FAIL/NO_DATA, matched/mismatched
    counts, discrepancy records, summary, recommendations, row totals."""
    if not comparison_results:
        return {
            "status": "NO_DATA",
            "total_tables": 0,
            "tables_matched": 0,
            "tables_mismatched": 0,
            "discrepancies": [],
            "summary": "No comparison data available",
            "recommendations": [],
            "timestamp": _now_iso(),
            "source_total_rows": 0,
            "target_total_rows": 0,
        }

    matched = mismatched = 0
    src_rows = tgt_rows = 0
    discrepancies: list[dict[str, Any]] = []

    for r in comparison_results:
        src_rows += r.get("source_count", 0)
        tgt_rows += r.get("target_count", 0)
        counts_ok = r.get("match", False)
        checksum_ok = r.get("checksum_match", True)
        if counts_ok and checksum_ok:
            matched += 1
            continue
        mismatched += 1
        if not counts_ok:
            diff = r.get("difference", 0)
            discrepancies.append(
                {
                    "table": r["table"],
                    "issue_type": ROW_COUNT_MISMATCH,
                    "severity": calculate_severity(r.get("source_count", 0), abs(diff)),
                    "details": {
                        "source_count": r.get("source_count", 0),
                        "target_count": r.get("target_count", 0),
                        "missing_rows": abs(diff) if diff < 0 else 0,
                        "extra_rows": diff if diff > 0 else 0,
                    },
                    "timestamp": r.get("timestamp", _now_iso()),
                }
            )
        if not checksum_ok:
            discrepancies.append(
                {
                    "table": r["table"],
                    "issue_type": CHECKSUM_MISMATCH,
                    "severity": "CRITICAL",
                    "details": {
                        "source_checksum": r.get("source_checksum", ""),
                        "target_checksum": r.get("target_checksum", ""),
                        "description": "Data corruption or modification detected",
                    },
                    "timestamp": r.get("timestamp", _now_iso()),
                }
            )

    total = len(comparison_results)
    if mismatched == 0:
        summary = f"All {total} tables passed reconciliation. Data is consistent."
    else:
        summary = (
            f"Reconciliation found discrepancies in {mismatched} of {total} tables. "
            f"{matched} tables are consistent."
        )

    return {
        "status": "PASS" if mismatched == 0 else "FAIL",
        "total_tables": total,
        "tables_matched": matched,
        "tables_mismatched": mismatched,
        "discrepancies": discrepancies,
        "summary": summary,
        "recommendations": _recommendations(discrepancies),
        "timestamp": _now_iso(),
        "source_total_rows": src_rows,
        "target_total_rows": tgt_rows,
    }


def _recommendations(discrepancies: list[dict[str, Any]]) -> list[str]:
    """Rule set mirrors generator.py:226-304: missing rows -> replication
    lag, extra rows -> duplicates, checksum -> corruption, >5 issues ->
    full resync."""
    if not discrepancies:
        return [
            "Data is consistent. Continue monitoring replication lag and pipeline health."
        ]
    recs: list[str] = []
    count_issues = [d for d in discrepancies if d["issue_type"] == ROW_COUNT_MISMATCH]
    missing = sum(d["details"].get("missing_rows", 0) for d in count_issues)
    extra = sum(d["details"].get("extra_rows", 0) for d in count_issues)
    if missing > 0:
        recs.append(
            f"Target is missing {missing} rows. Check replication lag and "
            "connector/stream status."
        )
    if extra > 0:
        recs.append(
            f"Target has {extra} extra rows. Investigate duplicate inserts or "
            "data quality issues."
        )
    checksum_issues = [d for d in discrepancies if d["issue_type"] == CHECKSUM_MISMATCH]
    if checksum_issues:
        recs.append(
            f"Data corruption detected in {len(checksum_issues)} table(s). "
            "Run a row-level diff to identify the records."
        )
    if len(discrepancies) > 5:
        recs.append(
            "Multiple tables affected. Consider pausing replication and "
            "performing a full resync."
        )
    return recs


# ---------------------------------------------------------------------------
# formatters (reference report/formatters.py:13-110)
# ---------------------------------------------------------------------------


def export_report_json(report: dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=str)


def report_to_csv(report: dict[str, Any]) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["table", "issue_type", "severity", "details", "timestamp"])
    for d in report.get("discrepancies", []):
        w.writerow(
            [d["table"], d["issue_type"], d["severity"], json.dumps(d["details"]), d["timestamp"]]
        )
    return buf.getvalue()


def export_report_csv(report: dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        f.write(report_to_csv(report))


def format_report_console(report: dict[str, Any]) -> str:
    lines = [
        "=" * 60,
        "RECONCILIATION REPORT",
        "=" * 60,
        f"Status:   {report['status']}",
        f"Summary:  {report['summary']}",
        f"Tables:   {report['tables_matched']}/{report['total_tables']} matched",
        f"Rows:     source={report['source_total_rows']} target={report['target_total_rows']}",
    ]
    if report["discrepancies"]:
        lines.append("-" * 60)
        for d in report["discrepancies"]:
            lines.append(f"  [{d['severity']:8s}] {d['table']}: {d['issue_type']}")
    if report["recommendations"]:
        lines.append("-" * 60)
        lines.extend(f"  * {r}" for r in report["recommendations"])
    lines.append("=" * 60)
    return "\n".join(lines)
