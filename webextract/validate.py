"""Post-extraction validation — warnings as data (F15-F18).

Re-expresses the reference's ``validate_extracted_data``
(ocr-ai-service/app/services/ai_service.py:275-306): per extracted field
it checks required-presence (F17, :286-288), date format (F15, :291-293,
an ANCHORED ``re.match`` — hence the leading ``^`` in the rlike), numeric
parseability (F16, :296-300 ``float(value)`` → castable-to-double; the
documented divergence is Python-only spellings like ``1_0`` that
``float()`` accepts and SQL casts don't — impossible outputs for the
digit-run regexes that produce NUMERIC values), and the low-confidence
threshold (F18, :303-304 with settings.MIN_CONFIDENCE_SCORE = 0.7).

The reference returns a dict of message strings; at table scale warnings
are ROWS — one per (url, field, warning kind) — so they can be grouped,
joined back, or filtered like any other data. Everything here is pure
Catalyst (explode + filters over the spans column): zero Python, fully
whole-stage-codegen'd, and exactly replayable as the DuckDB oracle SQL in
__spark_entry__ (query ``extract_field_warnings``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MIN_CONFIDENCE = 0.7  # reference settings.py:43 MIN_CONFIDENCE_SCORE

DATE_VALID_RE = r"^\d{1,2}[/\-]\d{1,2}[/\-]\d{4}"  # ai_service.py:292 (re.match)

MISSING_REQUIRED = "missing_required"
BAD_DATE_FORMAT = "bad_date_format"
BAD_NUMERIC = "bad_numeric"
LOW_CONFIDENCE = "low_confidence"


def field_warnings(extracted: DataFrame,
                   min_confidence: float = MIN_CONFIDENCE) -> DataFrame:
    """extracted(url, spans, ...) → one row per (url, field, warning):
    columns url, field_name, warning, value, field_confidence."""
    s = extracted.select("url", F.explode("spans").alias("s")).select(
        "url",
        F.col("s.name").alias("field_name"),
        F.col("s.value").alias("value"),
        F.col("s.field_type").alias("field_type"),
        F.col("s.confidence").alias("field_confidence"),
        F.col("s.is_required").alias("is_required"),
    )
    has_value = F.trim(F.col("value")) != ""
    checks = F.array(
        F.when(F.col("is_required") & ~has_value, F.lit(MISSING_REQUIRED)),
        F.when((F.col("field_type") == "DATE") & has_value
               & ~F.col("value").rlike(DATE_VALID_RE), F.lit(BAD_DATE_FORMAT)),
        # try_cast, not cast: Spark 4 ANSI mode makes a plain cast THROW on
        # malformed input instead of yielding NULL (DuckDB twin: TRY_CAST)
        F.when((F.col("field_type") == "NUMERIC") & has_value
               & F.col("value").try_cast("double").isNull(), F.lit(BAD_NUMERIC)),
        F.when(F.col("field_confidence") < min_confidence, F.lit(LOW_CONFIDENCE)),
    )
    return s.select(
        "url", "field_name", "value", "field_confidence",
        F.explode(F.filter(checks, lambda c: c.isNotNull())).alias("warning"),
    )
