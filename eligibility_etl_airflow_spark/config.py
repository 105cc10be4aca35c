"""Deterministic anchors and engine constants.

The reference's extraction predicates are relative to ``GETDATE()``
(sql/eligibility_enhanced.sql:72-75, sql/resubmission.sql:7) — untestable
against static data. The engine parameterizes "now" (SURVEY.md §7.8): every
time-window operator takes an anchor timestamp; these constants are the
anchors for the driver's frozen testdata (TESTDATA.md, seed 42).
"""

# Just past max(o_orderdate) == 2001-08-01 across all scale factors.
ORDERS_ANCHOR = "2001-08-02 00:00:00"

# Just past max(events.ts) == 2024-01-30 23:59 across all scale factors.
EVENTS_ANCHOR = "2024-01-31 00:00:00"

# The reference extracts a 270-minute sliding window every 240 minutes
# (30-min overlap, eligibility_enhanced.sql:75). Orders data spans years,
# so the batch-twin queries scale minutes -> days: 270-day window.
RECENT_WINDOW_DAYS = 270

# Tables the driver pre-registers for the DuckDB oracle.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
