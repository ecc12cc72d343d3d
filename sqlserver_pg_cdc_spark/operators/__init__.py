"""Operator surface of the engine (one import per capability family)."""

from sqlserver_pg_cdc_spark.operators.checksum import (  # noqa: F401
    incremental_checksum,
    ordered_checksum,
    ordered_checksum_df,
    table_checksum,
)
from sqlserver_pg_cdc_spark.operators.counts import compare_counts, get_row_count  # noqa: F401
from sqlserver_pg_cdc_spark.operators.diff import diff_tables  # noqa: F401
from sqlserver_pg_cdc_spark.operators.repair import generate_repair_script  # noqa: F401
from sqlserver_pg_cdc_spark.operators.report import (  # noqa: F401
    calculate_severity,
    export_report_csv,
    export_report_json,
    format_report_console,
    generate_report,
)
